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
from typing import Any, Dict

import jax
import optax

from hipie_tpu.config import SolverConfig


def _label_for_path(path: str) -> str:
    if "text_encoder" in path:
        return "lang"
    if re.search(r"/vl_layers_\d+/", path):
        return "vl"
    if "backbone/" in path and "mask_dino" not in path:
        return "backbone"
    if "sampling_offsets" in path or "bg_query_refs" in path \
            or "reference_points" in path:
        return "offsets"
    return "base"


def param_labels(params) -> Any:
    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: _label_for_path(path_str(kp)), params)


def lr_schedule(cfg: SolverConfig, base: float):
    def fn(step):
        import jax.numpy as jnp
        warm = jnp.clip(step / max(cfg.warmup_iters, 1), 0.0, 1.0)
        decay = 1.0
        for s in cfg.lr_decay_steps:
            decay = decay * jnp.where(step >= s, cfg.lr_decay_gamma, 1.0)
        return base * warm * decay
    return fn


def build_optimizer(cfg: SolverConfig, params) -> optax.GradientTransformation:
    def adamw(base_lr):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_learning_rate(lr_schedule(cfg, base_lr)),
        )

    groups = {
        "base": adamw(cfg.base_lr),
        "backbone": adamw(cfg.base_lr * cfg.backbone_lr_mult),
        "offsets": adamw(cfg.base_lr * cfg.offsets_lr_mult),
        "lang": adamw(cfg.lang_lr),
        "vl": adamw(cfg.vl_lr),
    }
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.clip_norm),
        optax.multi_transform(groups, param_labels(params)),
    )
    if cfg.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx
