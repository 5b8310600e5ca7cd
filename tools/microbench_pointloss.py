"""Microbenchmarks isolating the train-step mask-loss suspects on the TPU.

Suspects (from profile_train_step ablations: full 32.6 s, no_maskdino 11.9 s,
no_unc 26.4 s at 256^2/B2):
  1. jnp.take backward = XLA scatter-add transpose (7.5M rows/criterion layer)
  2. jax.lax.top_k over (200, 37632) for uncertainty selection
  3. auction Hungarian while_loop at (300, 100)

Each case times fwd and fwd+grad separately with distinct inputs per iter and
a forced host transfer (tunnel: block_until_ready does not sync).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(tag, fn, inputs, iters=4):
    fn(*inputs[0])  # compile
    outs = []
    t0 = time.perf_counter()
    for i in range(iters):
        o = fn(*inputs[i % len(inputs)])
        outs.append(float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:44s} {dt * 1000:9.1f} ms", flush=True)
    return dt


def main(hw: int = 64, g: int = 200):
    G, P = g, 37632            # B*K rows, num_points*oversample
    H = W = hw                 # stride-4 masks (64: 256^2 crop, 256: 1024^2)
    rng = np.random.RandomState(0)
    masks_np = [rng.rand(G, H, W).astype(np.float32) for _ in range(4)]
    coords_np = [rng.rand(G, P, 2).astype(np.float32) for _ in range(4)]

    from hipie_tpu.losses.point_features import point_sample

    @jax.jit
    def ps_fwd(m, c):
        return point_sample(m, c).sum()

    @jax.jit
    def ps_grad(m, c):
        return jax.grad(lambda mm: point_sample(mm, c).sum())(m)

    inputs = [(jnp.asarray(m), jnp.asarray(c))
              for m, c in zip(masks_np, coords_np)]
    timeit("point_sample fwd (200x37632 from 64^2)", ps_fwd, inputs)
    timeit("point_sample fwd+grad(masks)", ps_grad, inputs)

    # raw scatter-add transpose cost in isolation
    rows_np = [rng.randint(0, G * (H + 1) * (W + 1), (G * P,)).astype(np.int32)
               for _ in range(4)]
    vals_np = [rng.rand(G * P, 4).astype(np.float32) for _ in range(4)]

    @jax.jit
    def take_grad(rows, vals):
        tab = jnp.zeros((G * (H + 1) * (W + 1), 4), jnp.float32)
        return jax.grad(
            lambda t: (jnp.take(t, rows, axis=0) * vals).sum())(tab)

    timeit("jnp.take scatter transpose (7.5M rows)", take_grad,
           [(jnp.asarray(r), jnp.asarray(v))
            for r, v in zip(rows_np, vals_np)])

    # top_k vs approx_max_k vs sort for the uncertainty pick
    unc_np = [rng.rand(G, P).astype(np.float32) for _ in range(4)]
    k = int(0.75 * 12544)

    @jax.jit
    def topk(u):
        return jax.lax.top_k(u, k)[1].sum()

    @jax.jit
    def approx(u):
        return jax.lax.approx_max_k(u, k)[1].sum()

    unc_in = [(jnp.asarray(u),) for u in unc_np]
    timeit(f"top_k k={k} of (200, {P})", topk, unc_in)
    timeit(f"approx_max_k k={k} of (200, {P})", approx, unc_in)

    # auction assignment at MaskDINO match shapes
    from hipie_tpu.losses.matcher import auction_assignment

    cost_np = [rng.rand(2, 300, 100).astype(np.float32) for _ in range(4)]

    gv = jnp.ones((2, 100), bool)

    @jax.jit
    def auction(c):
        return jax.vmap(auction_assignment)(c, gv).sum()

    timeit("auction (B2, 300x100)", auction,
           [(jnp.asarray(c),) for c in cost_np])

    # fused loss-shaped case: uncertainty coords + pair sample + focal+dice grad
    from hipie_tpu.losses.point_features import (
        point_sample_pair, uncertain_point_coords)

    gt_np = [(rng.rand(G, H, W) > 0.5).astype(np.float32) for _ in range(4)]

    @jax.jit
    def mask_loss_grad(m, g, key):
        def f(mm):
            coords = uncertain_point_coords(
                key, jax.lax.stop_gradient(mm), 12544, 3.0, 0.75)
            lo, la = point_sample_pair(mm, g, coords)
            p = jax.nn.sigmoid(lo)
            return ((p - la) ** 2).mean()
        return jax.grad(f)(m)

    timeit("full mask-loss layer fwd+grad", mask_loss_grad,
           [(jnp.asarray(m), jnp.asarray(g), jax.random.PRNGKey(i))
            for i, (m, g) in enumerate(zip(masks_np, gt_np))])

    # dynamic-conv mask build for the selected K slots (one criterion layer)
    from hipie_tpu.models.mask_head import (
        dynamic_conv_param_sizes, dynamic_mask_with_coords)

    B = 2 if G >= 200 else 1
    if G % B != 0:
        G += B - G % B   # keep B*K == G so this case benches the same rows
    K = G // B
    h8, w8 = H // 2, W // 2            # stride-8 feature grid for stride-4 out
    wn, bn = dynamic_conv_param_sizes(8, 8, 3, True)
    npar = sum(wn) + sum(bn)
    feats_np = [rng.rand(B, h8, w8, 8).astype(np.float32) for _ in range(4)]
    ctrl_np = [rng.rand(B, K, npar).astype(np.float32) for _ in range(4)]
    refs_np = [rng.rand(B, K, 2).astype(np.float32) * (H * 4) for _ in range(4)]

    @jax.jit
    def dyn_mask_grad(f, c, r):
        # grad w.r.t. (feats, controller) both: in training the criterion
        # backward also flows into mask_feats through the dynamic conv.
        def body(ff, cc):
            return dynamic_mask_with_coords(ff, r, cc, wn, bn, 8).sum()
        return jax.grad(body, argnums=(0, 1))(f, c)

    timeit(f"dynamic-conv mask build+grad (B{B} K{K} {H}^2)", dyn_mask_grad,
           [(jnp.asarray(f), jnp.asarray(c), jnp.asarray(r))
            for f, c, r in zip(feats_np, ctrl_np, refs_np)])


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=64,
                    help="mask side (64 = 256^2 crop, 256 = prod 1024^2)")
    ap.add_argument("--g", type=int, default=200,
                    help="mask rows B*K (prod1024 B1 K100 -> 100)")
    args = ap.parse_args()
    main(hw=args.hw, g=args.g)
