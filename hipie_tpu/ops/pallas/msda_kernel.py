"""Fused Pallas TPU kernel for multi-scale deformable attention (forward).

Replaces the reference CUDA kernel
(projects/HIPIE/hipie/models/deformable_detr/ops/src/cuda/ms_deform_im2col_cuda.cuh)
for inference-hot shapes. One grid step processes one (batch, head) pair with the
full flattened value slab resident in VMEM; the 4-corner bilinear gather +
attention-weighted reduce over levels and points happens entirely on-chip, so no
(B, M, Q, P, D) intermediates ever touch HBM (the XLA formulation in
hipie_tpu/ops/ms_deform_attn.py materializes them between fusions).

The gather itself is a one-hot MXU contraction per level (this Mosaic toolchain
only lowers arbitrary row gathers that way — probed: jnp.take/advanced indexing
fail with 'Shape mismatch in input, indices and output'). Backward is served by
the XLA formulation (forward-only kernel wrapped in a custom_vjp whose bwd
recomputes via the jnp path).

STATUS: numerically verified in interpret mode (tests/test_pallas_msda.py); the
remote TPU compile service in this environment kills/hangs on the kernel at
encoder scale, so the default compute path remains the XLA gather formulation
(hipie_tpu/ops/ms_deform_attn.py), which profiles HBM-bandwidth-bound as
expected for a pure gather op. Revisit with direct-toolchain access.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hipie_tpu.ops.ms_deform_attn import ms_deform_attn_jnp

Shapes = Tuple[Tuple[int, int], ...]


def _msda_kernel(value_ref, loc_ref, w_ref, out_ref, *, spatial_shapes: Shapes):
    """value (S, D); loc (Q, L, P, 2); w (Q, L, P); out (Q, D).

    Mosaic (this TPU toolchain) lowers arbitrary row gathers only as one-hot
    matmuls, so each level builds a sparse combination matrix
    W[q, s] = sum_{p, corner} coeff * [s == idx] on the VPU and contracts it with
    the level's value slab on the MXU. All intermediates stay in VMEM.
    """
    v = value_ref[:].astype(jnp.float32)
    loc = loc_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    q, L, p, _ = loc.shape
    d = v.shape[-1]

    acc = jnp.zeros((q, d), jnp.float32)
    start = 0
    for lvl, (h, wd) in enumerate(spatial_shapes):
        s_l = h * wd
        x = loc[:, lvl, :, 0] * wd - 0.5           # (Q, P)
        y = loc[:, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        wl = w[:, lvl]                              # (Q, P)
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (1, s_l), 1)

        comb = jnp.zeros((q, s_l), jnp.float32)
        for dy, dx, cw in ((0, 0, (1 - ly) * (1 - lx)), (0, 1, (1 - ly) * lx),
                           (1, 0, ly * (1 - lx)), (1, 1, ly * lx)):
            yi = y0i + dy
            xi = x0i + dx
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < wd)
            idx = jnp.clip(yi, 0, h - 1) * wd + jnp.clip(xi, 0, wd - 1)
            coeff = cw * valid.astype(jnp.float32) * wl     # (Q, P)
            for pi in range(p):
                onehot = (idx[:, pi][:, None] == iota_s).astype(jnp.float32)
                comb = comb + coeff[:, pi][:, None] * onehot
        v_l = v[start:start + s_l, :]      # static per-level slice
        acc = acc + jnp.dot(comb, v_l, preferred_element_type=jnp.float32)
        start += s_l
    out_ref[:] = acc


def _msda_pallas_fwd(value, spatial_shapes, loc, w, interpret=False,
                     q_tile: int = 128):
    b, s, m, d = value.shape
    q = loc.shape[1]
    L, p = loc.shape[3], loc.shape[4]
    # pad queries to a tile multiple (static).
    q_pad = (q_tile - q % q_tile) % q_tile
    if q_pad:
        loc = jnp.pad(loc, ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)))
    qp = q + q_pad
    # (B, S, M, D) -> (B*M, S, D); locs (B, Q, M, L, P, 2) -> (B*M, Q, L, P, 2)
    v = jnp.transpose(value, (0, 2, 1, 3)).reshape(b * m, s, d)
    lc = jnp.transpose(loc, (0, 2, 1, 3, 4, 5)).reshape(b * m, qp, L, p, 2)
    ww = jnp.transpose(w, (0, 2, 1, 3, 4)).reshape(b * m, qp, L, p)

    out = pl.pallas_call(
        functools.partial(_msda_kernel, spatial_shapes=spatial_shapes),
        grid=(b * m, qp // q_tile),
        in_specs=[
            pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, q_tile, L, p, 2), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, q_tile, L, p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, q_tile, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * m, qp, d), jnp.float32),
        interpret=interpret,
    )(v, lc, ww)
    out = out.reshape(b, m, qp, d)[:, :, :q]
    out = out.transpose(0, 2, 1, 3).reshape(b, q, m * d)
    return out.astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes: Shapes, sampling_locations,
                          attention_weights):
    return _msda_pallas_fwd(value, spatial_shapes, sampling_locations,
                            attention_weights)


def _fwd(value, spatial_shapes, loc, w):
    return _msda_pallas_fwd(value, spatial_shapes, loc, w), (value, loc, w)


def _bwd(spatial_shapes, res, g):
    value, loc, w = res
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_jnp(v, spatial_shapes, l, a), value, loc, w)
    return vjp(g)


ms_deform_attn_pallas.defvjp(_fwd, _bwd)


def ms_deform_attn_pallas_interpret(value, spatial_shapes, loc, w):
    """Interpreter-mode variant for CPU correctness tests."""
    return _msda_pallas_fwd(value, spatial_shapes, loc, w, interpret=True)
