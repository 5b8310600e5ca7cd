"""Checkpointing: orbax save/restore of the TrainState + torch-ckpt import.

Behavioral parity target: detectron2 DetectionCheckpointer
(checkpoint/detection_checkpoint.py:15; engine/defaults.py:400-418
resume_or_load restoring model + iteration + optimizer state; PeriodicCheckpointer
with `last_checkpoint` pointer; .pth/.pkl interop with shape-mismatch skipping).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state, step: int, name: str = "",
                    update_marker: bool = True):
    """Save under model_{step} (or `name`). Writes to a temporary sibling and
    atomically renames over any existing destination, so a crash or preemption
    mid-save never destroys the previous checkpoint (notably model_best, which
    is re-saved under the same name)."""
    import shutil

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name or f"model_{step:07d}")
    tmp = f"{path}.tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    _ckptr().save(os.path.abspath(tmp), {
        "params": state.params, "opt_state": state.opt_state,
        "step": np.asarray(step)})
    if os.path.exists(path):
        old = f"{path}.old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)
    if update_marker:
        with open(os.path.join(directory, "last_checkpoint"), "w") as f:
            f.write(os.path.basename(path))
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    marker = os.path.join(directory, "last_checkpoint")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        path = os.path.join(directory, f.read().strip())
    if os.path.exists(path):
        return path
    # Crash-window recovery: save_checkpoint's overwrite is two renames
    # (path -> path.old, tmp -> path); dying between them leaves the previous
    # snapshot intact under .old (or the new one complete under .tmp with the
    # orbax commit marker) while the marker still names `path`.
    for alt in (f"{path}.old", f"{path}.tmp"):
        if os.path.exists(alt):
            print(f"[checkpoint] {path} missing (interrupted save); "
                  f"resuming from {alt}")
            return alt
    return None


def restore_checkpoint(path: str, state):
    # restore against the live state's tree as the target so orbax rebuilds
    # the exact pytree structure — without it, optax NamedTuple states (e.g.
    # multi_transform's MultiTransformState) come back as plain dicts and the
    # optimizer crashes on the first resumed step.
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": np.asarray(0)}
    restored = _ckptr().restore(os.path.abspath(path), item=target)
    return state._replace(
        params=restored["params"], opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]))


def resume_or_load(directory: str, state, weights_path: Optional[str] = None,
                   resume: bool = True, cfg=None):
    """detectron2 resume_or_load semantics: resume from the run dir if possible,
    else load initial weights (torch .pth converted, or an orbax tree)."""
    if resume:
        last = latest_checkpoint(directory)
        if last is not None:
            return restore_checkpoint(last, state), True
    if weights_path:
        if weights_path.endswith((".pth", ".pkl")):
            state = state._replace(
                params=load_torch_weights(weights_path, state.params, cfg=cfg))
        else:
            restored = _ckptr().restore(os.path.abspath(weights_path))
            params = restored.get("params", restored)
            state = state._replace(params=merge_matching(state.params, params))
    return state, False


def merge_matching(params, loaded):
    """Copy loaded leaves whose path+shape match; skip mismatches with a note
    (detectron2's shape-mismatch skipping)."""
    flat_p = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    out = {}
    skipped = []
    for k, v in flat_p.items():
        if k in flat_l and tuple(flat_l[k].shape) == tuple(v.shape):
            out[k] = flat_l[k]
        else:
            out[k] = v
            if k in flat_l:
                skipped.append(k)
    if skipped:
        print(f"[checkpoint] skipped {len(skipped)} shape-mismatched tensors")
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [out[k] for k, _ in
                                                  jax.tree_util.tree_flatten_with_path(params)[0]])


def load_torch_weights(path: str, params, cfg=None):
    """Convert a reference HIPIE .pth into the hipie_tpu param tree.

    Routes through the FULL checkpoint converter
    (hipie_tpu/utils/hipie_converter.convert_hipie_checkpoint) and merges with
    shape checking (merge_matching) — unmapped tensors keep their initialized
    values and are reported. Conversion failures raise: silently training from
    random init when the user pointed at real weights is never correct.
    """
    from hipie_tpu.utils.converter import load_torch_checkpoint
    from hipie_tpu.utils.hipie_converter import convert_hipie_checkpoint

    if cfg is None:
        raise ValueError(
            "load_torch_weights needs the HIPIEConfig to map a .pth checkpoint; "
            "pass cfg= (resume_or_load forwards it).")
    sd = load_torch_checkpoint(path)
    converted = convert_hipie_checkpoint(sd, cfg)
    return merge_matching(params, converted)
