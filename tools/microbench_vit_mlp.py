"""Isolate the ViT-H MLP block on the TPU: where does the ~30% matmul-rate
gap (67 vs 134 TF/s observed in the round-3 full-program trace) come from?

Cases: bare fc1->gelu->fc2 chain at ViT-H global-block shapes (B*heads
folded out; tokens 4096, dim 1280, hidden 5120, bf16), with exact vs tanh
GELU, with/without LayerNorm + residual (the full block tail), and the
matmuls alone. Chained iterations inside one jit (tunnel RPC amortization,
PERFORMANCE.md methodology); distinct inputs per iteration.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from flax import linen as nn

T, D, HID = 4096, 1280, 5120
CHAIN = 8          # iterations fused inside one jit


def bench(tag, step_fn, x0, params, flops_per_iter):
    @jax.jit
    def chained(x, params):
        def body(x, _):
            return step_fn(x, params), None
        x, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return x

    r = chained(x0, params)
    _ = np.asarray(r[0, :2].astype(jnp.float32))     # force (tunnel)
    times = []
    for i in range(3):
        xi = x0 + jnp.asarray(np.float32(i + 1) / 100).astype(x0.dtype)
        t0 = time.perf_counter()
        r = chained(xi, params)
        _ = np.asarray(r[0, :2].astype(jnp.float32))
        times.append(time.perf_counter() - t0)
    dt = min(times) / CHAIN
    print(f"{tag:34s} {dt * 1e3:8.3f} ms/iter  {flops_per_iter / dt / 1e12:7.1f} TF/s",
          flush=True)


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(T, D).astype(np.float32) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(D, HID).astype(np.float32) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((HID,), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(HID, D).astype(np.float32) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((D,), jnp.bfloat16)
    ln_s = jnp.ones((D,), jnp.bfloat16)
    ln_b = jnp.zeros((D,), jnp.bfloat16)
    params = (w1, b1, w2, b2, ln_s, ln_b)
    mm_flops = 2 * T * D * HID * 2          # fc1 + fc2

    def matmuls_only(x, p):
        w1, b1, w2, b2, *_ = p
        y = x @ w1 + b1
        y = y @ w2 + b2
        return (x + y) * jnp.bfloat16(0.5)   # keep the chain bounded

    def mlp_exact(x, p):
        w1, b1, w2, b2, *_ = p
        y = nn.gelu(x @ w1 + b1, approximate=False)
        return (x + (y @ w2 + b2)) * jnp.bfloat16(0.5)

    def mlp_tanh(x, p):
        w1, b1, w2, b2, *_ = p
        y = nn.gelu(x @ w1 + b1, approximate=True)
        return (x + (y @ w2 + b2)) * jnp.bfloat16(0.5)

    def block_tail_exact(x, p):
        w1, b1, w2, b2, s, b = p
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16).apply(
            {"params": {"scale": s, "bias": b}}, x)
        y = nn.gelu(y @ w1 + b1, approximate=False)
        return (x + (y @ w2 + b2)) * jnp.bfloat16(0.5)

    bench("matmuls only (fc1+fc2)", matmuls_only, x, params, mm_flops)
    bench("mlp gelu exact", mlp_exact, x, params, mm_flops)
    bench("mlp gelu tanh", mlp_tanh, x, params, mm_flops)
    bench("LN + mlp gelu exact (block tail)", block_tail_exact, x, params, mm_flops)


if __name__ == "__main__":
    main()
