"""Microbenchmark for MSDA gather formulations at encoder scale (the hot op).

Run on the real TPU:  python tools/microbench_msda.py [variant ...]

Timing notes (tunneled device): jax.block_until_ready does NOT synchronize on
this platform — every measurement must force a host transfer (device_get of a
scalar). Per-call RPC overhead is ~5-30 ms, so each variant is chained K times
inside ONE jit (scan over K distinct per-"layer" values) and we report per-layer
time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import numpy as np
import jax

from hipie_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp

from hipie_tpu.ops.ms_deform_attn import ms_deform_attn_jnp

SHAPES = ((128, 128), (64, 64), (32, 32), (16, 16))
B, M, D, L, P = 1, 8, 32, 4, 4
S = sum(h * w for h, w in SHAPES)
Q = S
K = 8   # chained layers per jit call


def make_inputs(seed):
    rng = np.random.RandomState(seed)
    value = jnp.asarray(rng.randn(K, B, S, M, D).astype(np.float32))
    loc = jnp.asarray(rng.uniform(0, 1, (K, B, Q, M, L, P, 2)).astype(np.float32))
    w = rng.uniform(0, 1, (K, B, Q, M, L, P)).astype(np.float32)
    w /= w.sum(axis=(-1, -2), keepdims=True)
    return value, loc, jnp.asarray(w)


def chain(single):
    """Wrap a single-layer op into a scan over K (value, loc, w) slices."""
    def f(value, loc, w):
        def body(acc, xs):
            v, l, ww = xs
            out = single(v, l, ww)
            return acc + out.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, 0.0, (value, loc, w))
        return acc
    return jax.jit(f)


def timeit(name, fn, n=3):
    ins = [make_inputs(i) for i in range(n)]
    _ = jax.device_get(fn(*ins[0]))
    t0 = time.perf_counter()
    for x in ins:
        _ = jax.device_get(fn(*x))
    dt = (time.perf_counter() - t0) / (n * K) * 1000
    rows = B * M * Q * L * P
    print(f"{name:34s} {dt:8.2f} ms/layer   {rows / dt * 1e-6:8.1f} Mrows/s")
    return dt


def main(which):
    print("device:", jax.devices()[0], f" S={S} Q={Q} rows/layer={B*M*Q*L*P/1e6:.2f}M")

    variants = {
        "quad_fp32": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "quad")),
        "quad_bf16": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "quad_bf16")),
        "corner4": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "corner4")),
        "flat_bf16": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "flat_bf16")),
        "flat_fp32": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "flat")),
        "flat2_bf16": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "flat2_bf16")),
        "flat2_fp32": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "flat2")),
        "flat3_bf16": chain(lambda v, l, w: ms_deform_attn_jnp(v, SHAPES, l, w, "flat3_bf16")),
    }

    names = which or list(variants)
    for name in names:
        try:
            timeit(name, variants[name])
        except Exception as e:  # keep going if a variant is missing
            print(f"{name:34s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main(sys.argv[1:])
