"""Capture a jax.profiler trace of the ViT-H panoptic inference step (the
bench.py workload) and print the top HLO ops by device time."""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from hipie_tpu.models.hipie import HIPIEModel, hipie_inference
    from hipie_tpu.models.postprocess import ClassMaps
    from hipie_tpu.presets import vit_huge_coco_panoptic

    size = int(os.environ.get("BENCH_SIZE", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))

    cfg = vit_huge_coco_panoptic()
    L = cfg.model.text.max_query_len
    model = HIPIEModel(cfg.model)
    images = jnp.full((batch, size, size, 3), 127.0, jnp.float32)
    pad = jnp.zeros((batch, size, size), bool)
    ids = jnp.asarray((np.arange(L) % 1000 + 999)[None].repeat(batch, 0),
                      jnp.int32)
    am = jnp.ones((batch, L), jnp.int32)
    sizes = jnp.asarray([[size, size]] * batch, jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad, ids, am,
                                 sizes)

    C = 133
    mw = np.zeros((C, L), np.float32)
    tm = np.zeros((C, L), bool)
    for c in range(C):
        mw[c, (c % (L - 2)) + 1] = 1.0
        tm[c, (c % (L - 2)) + 1] = True
    maps = ClassMaps(jnp.asarray(mw), jnp.asarray(tm),
                     jnp.asarray(np.arange(C) < 80))

    @jax.jit
    def fn(params, images, pad, ids, am, sizes):
        out = model.apply(params, images, pad, ids, am, sizes)
        return hipie_inference(out, maps, cfg.test, cfg.model,
                               pad_mask_s4=pad[0][::4, ::4])

    def force(res):
        return float(np.asarray(jax.tree_util.tree_leaves(res)[0].sum()))

    force(fn(params, images, pad, ids, am, sizes))

    rng = np.random.RandomState(int(__import__("time").time()) % 100000)
    im2 = jnp.asarray(
        rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32))
    # per-run dir (batch + pid): never clobber a previous capture — an earlier
    # session lost a trace to the old rm -rf when two captures overlapped.
    outdir = os.environ.get(
        "TRACE_DIR", f"/tmp/infer_trace_b{batch}_{os.getpid()}")
    os.system(f"rm -rf {outdir}")
    print("trace dir:", outdir, flush=True)
    with jax.profiler.trace(outdir):
        force(fn(params, im2, pad, ids, am, sizes))

    from tools.trace_common import print_top_device_ops
    print_top_device_ops(outdir)


if __name__ == "__main__":
    main()
