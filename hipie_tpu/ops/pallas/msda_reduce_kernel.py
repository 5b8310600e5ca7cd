"""Fused weighted segment-reduce for the MSDA quad-gather formulation.

The XLA reduce in ops/ms_deform_attn.py (_flat_quad_attn*) expands the
per-row corner weights (rows, 4) -> (rows, 4D) with an MXU one-hot matmul,
MATERIALIZES the (rows, 4D) weighted-rows tensor in HBM (~713 MB at encoder
scale), then segment-sums it with a second one-hot matmul (~180 GF executed
for what is arithmetically a 0.36 GF reduction). This kernel does

    out[seg, :] = sum_{r in seg} g[seg*K + r, :] * cw_expand[seg*K + r, :]

in ONE read pass over the gathered rows: corner-expansion happens in VMEM
via a tiny (4 -> 4D) one-hot dot per block, the K-row segment sum is a
sublane-reshape + VPU reduce, and nothing but the (segments, 4D) result is
written back. Traffic drops from ~3 passes over the rows to ~1.

Reference being replaced: the CUDA kernel's per-thread accumulation loop in
ms_deform_im2col_cuda.cuh (each thread sums its L*P*4 corner contributions
in registers) — this is the TPU-block equivalent of that accumulation.

Row order contract: rows are (b, q, m, l, p, corner-packed-in-lanes) so a
segment (one (b, q, m)) is K = L*P CONSECUTIVE rows and the caller gets
(B, Q, M, 4, D) without any Q<->M transpose (the (b, m, q) order the older
formulations used forced two big relayout copies per layer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(g_ref, cw_ref, o_ref, *, k: int, d: int):
    tr = g_ref.shape[0]
    tq = tr // k
    # corner one-hot: e[c, lane] = 1 where lane // d == c   (4, 4d)
    lane = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * d), 1) // d
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (4, 4 * d), 0)
    e = (lane == c_iota).astype(g_ref.dtype)
    # f32 path: precision=HIGHEST — the MXU's default (single bf16 pass)
    # would truncate the f32 corner weights to ~3 decimal digits before the
    # one-hot expand (measured 1.8e-2 abs error at encoder scale on real TPU;
    # interpret mode computed in full f32 and hid it). With the exact bf16x3
    # decomposition the 0/1 expand is exact; the matmul is tiny (TR,4)@(4,4d).
    # bf16 path: default precision — Mosaic rejects fp32 contract precision
    # on bf16 operands ("Bad lhs type"), and bf16 inputs are already exact
    # under the single pass.
    prec = (jax.lax.Precision.HIGHEST
            if cw_ref.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    cwmat = jax.lax.dot_general(
        cw_ref[:], e, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec)                                   # (TR, 4d) f32 acc
    gw = g_ref[:].astype(jnp.float32) * cwmat
    o_ref[:] = jnp.sum(gw.reshape(tq, k, 4 * d), axis=1)


def msda_weighted_segment_sum(g: jnp.ndarray, cw: jnp.ndarray, k: int,
                              block_rows: int = 8192,
                              interpret: bool = False) -> jnp.ndarray:
    """g: (N, 4d) gathered corner-packed rows; cw: (N, 4) per-corner weights
    (bilinear * attention, zeroed out-of-range). N must be a multiple of k.
    Returns (N // k, 4d) float32: per-segment weighted sums (corners still
    packed in lanes; caller reshapes (.., 4, d) and sums the corner axis).

    interpret=True runs the Pallas kernel body in interpret mode on any
    backend (test hook — the default non-TPU path below never executes the
    kernel, so tests use this to cover the block/grid logic off-TPU).
    """
    n, fd = g.shape
    d = fd // 4
    assert n % k == 0, (n, k)
    if jax.default_backend() != "tpu" and not interpret:
        gw = g.astype(jnp.float32) * jnp.repeat(cw.astype(jnp.float32), d, 1)
        return jnp.sum(gw.reshape(n // k, k, fd), axis=1)

    tr = min(block_rows, n)
    tr -= tr % k
    pad = (-n) % tr
    if pad:
        g = jnp.pad(g, ((0, pad), (0, 0)))
        cw = jnp.pad(cw, ((0, pad), (0, 0)))
    np_ = n + pad
    tq = tr // k
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, d=d),
        grid=(np_ // tr,),
        in_specs=[
            pl.BlockSpec((tr, fd), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tq, fd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_ // k, fd), jnp.float32),
        interpret=interpret,
    )(g, cw)
    return out[: n // k]
