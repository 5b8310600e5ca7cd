"""Optimizer: AdamW with per-group learning rates, full-model clipping, warmup
multistep schedule and gradient accumulation.

Behavioral parity target: reference projects/HIPIE/train_net.py:166-244 —
  * param groups: backbone x0.1, sampling_offsets/reference_points x0.1, text
    encoder LANG_LR, VL fusion layers VL_LR, base LR for the rest;
  * full-model grad-norm clip 0.1 applied at accumulation boundaries
    (SOLVER.ACC_ITER wrapper);
  * WarmupMultiStepLR (detectron2/solver/lr_scheduler.py).

TPU-native: optax.multi_transform over path-derived labels + clip_by_global_norm
+ optax.MultiSteps, all inside the jitted train step.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import optax

from hipie_tpu.config import SolverConfig


# stem + res2 are frozen in the reference (FREEZE_AT=2); their forward uses
# stop_gradient (models/backbone/resnet.py) and the optimizer must also skip
# them entirely — reference excludes requires_grad=False params from the param
# groups (train_net.py:166-244), so they get neither updates nor weight decay.
_FROZEN_STAGE_RE = re.compile(r"/(stem_conv1|res2_\d+)(_norm)?/")


def _label_for_path(path: str, frozen_prefixes=()) -> str:
    if any(path.startswith(p) for p in frozen_prefixes) or _FROZEN_STAGE_RE.search(path):
        return "frozen"
    if "text_encoder" in path:
        return "lang"
    # the scanned encoder stores the VL-fusion block under .../encoder/vl_layer/
    if re.search(r"/(vl_layer|vl_layers_\d+)/", path):
        return "vl"
    if "backbone/" in path and "mask_dino" not in path:
        return "backbone"
    if "sampling_offsets" in path or "bg_query_refs" in path \
            or "reference_points" in path:
        return "offsets"
    return "base"


def _path_str(kp) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)


def frozen_prefixes(params) -> Tuple[str, ...]:
    """Module prefixes of FrozenBatchNorm instances (detected by their
    running_mean leaf): ALL their params (weight/bias/running_*) are frozen
    buffers in the reference and must never be updated or decayed."""
    prefixes = []
    def visit(kp, _):
        p = _path_str(kp)
        if p.endswith("/running_mean"):
            prefixes.append(p[: -len("running_mean")])
    jax.tree_util.tree_map_with_path(visit, params)
    return tuple(prefixes)


def param_labels(params) -> Any:
    fz = frozen_prefixes(params)
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: _label_for_path(_path_str(kp), fz), params)


def lr_schedule(cfg: SolverConfig, base: float):
    # d2 WarmupMultiStepLR: linear warmup STARTING at warmup_factor (1e-3),
    # never 0 (detectron2/solver/lr_scheduler.py), then multistep decay.
    warmup_factor = 1e-3

    def fn(step):
        import jax.numpy as jnp
        if cfg.warmup_iters > 0:
            alpha = jnp.clip(step / cfg.warmup_iters, 0.0, 1.0)
            warm = jnp.where(step >= cfg.warmup_iters, 1.0,
                             warmup_factor * (1 - alpha) + alpha)
        else:
            warm = 1.0
        decay = 1.0
        for s in cfg.lr_decay_steps:
            decay = decay * jnp.where(step >= s, cfg.lr_decay_gamma, 1.0)
        return base * warm * decay
    return fn


def build_optimizer(cfg: SolverConfig, params) -> optax.GradientTransformation:
    mu_dtype = getattr(cfg, "mu_dtype", "float32")

    def adamw(base_lr):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8,
                                mu_dtype=mu_dtype),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(lr_schedule(cfg, base_lr)),
        )

    groups = {
        "base": adamw(cfg.base_lr),
        "backbone": adamw(cfg.base_lr * cfg.backbone_lr_mult),
        "offsets": adamw(cfg.base_lr * cfg.offsets_lr_mult),
        "lang": adamw(cfg.lang_lr),
        "vl": adamw(cfg.vl_lr),
        # frozen params (FrozenBN buffers, stem/res2): no update, no decay.
        "frozen": optax.set_to_zero(),
    }
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.multi_transform(groups, param_labels(params)),
    )
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx
