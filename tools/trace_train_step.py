"""Capture a jax.profiler trace of one smoke-config train step on the TPU and
print the top HLO ops by device time (parsed from the perfetto JSON trace)."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.profile_train_step import make_batch


def main():
    import jax
    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from hipie_tpu.config import apply_overrides, load_config
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.train.step import create_train_state, make_train_step

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "smoke_tiny_coco.yaml"))
    for kv in sys.argv[1:]:
        k, v = kv.split("=", 1)
        cfg = apply_overrides(cfg, {k: json.loads(v)})
    model = HIPIEModel(cfg.model)
    rng = np.random.RandomState(0)
    batch = make_batch(cfg, rng)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg, tx)

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = step(state, batch, key)
    _ = float(np.asarray(m["total_loss"]))
    print(f"compile+first: {time.perf_counter() - t0:.0f}s", flush=True)

    b2 = make_batch(cfg, np.random.RandomState(7))
    outdir = "/tmp/train_trace"
    os.system(f"rm -rf {outdir}")
    with jax.profiler.trace(outdir):
        key, k = jax.random.split(key)
        state, m = step(state, b2, k)
        _ = float(np.asarray(m["total_loss"]))

    from tools.trace_common import print_scope_rollup, print_top_device_ops
    print_top_device_ops(outdir)
    print_scope_rollup(outdir, [
        "crit_fg", "crit_bg_lang", "crit_bg", "crit_enc", "crit_gt_dn",
        "crit_maskdino_dn", "crit_maskdino_interm", "crit_maskdino",
        "transpose", "backward"])


if __name__ == "__main__":
    main()
