"""Multi-scale deformable attention — the core sparse-sampling op of the framework.

TPU-native reimplementation of the reference CUDA kernel
(reference: projects/HIPIE/hipie/models/deformable_detr/ops/src/cuda/ms_deform_im2col_cuda.cuh,
semantics of projects/HIPIE/hipie/models/deformable_detr/ops/functions/ms_deform_attn_func.py:43-63:
bilinear grid_sample, padding_mode='zeros', align_corners=False).

Design notes (TPU-first):
  * Deformable attention is a pure gather + weighted reduce: for every query, head and
    level, sample P points by bilinear interpolation from the flattened multi-scale value
    map and reduce with softmaxed attention weights.  There is no matmul; the op is
    HBM-bandwidth-bound.  On TPU we express the 4-corner bilinear sample as batched row
    gathers (`jnp.take`) which XLA lowers to the native gather unit; all shapes are
    static, so the whole op fuses into the surrounding jit region with no host sync.
  * Everything is differentiable by construction (gathers have scatter-add transposes in
    XLA), so unlike the CUDA version no hand-written backward is needed; `jax.grad`
    produces the atomic-add-equivalent scatter automatically.
  * Sampling is done in fp32 regardless of input dtype (the reference force-casts to
    fp32 via `custom_fwd(cast_inputs=torch.float32)`); the output is cast back.
  * `spatial_shapes` must be a static Python tuple of (H, W) pairs — shapes are static
    under jit, which also removes the reference's `level_start_index` tensor plumbing.

Formulations (measured on TPU v5e at encoder scale, S=Q=21760, M=8, L=4, P=4):
  * `flat` / `flat_bf16` (default / bf16): all levels concatenated into ONE quad
    table and ONE unbatched row gather; the weighted (corner x attention) reduce
    runs as two small MXU matmuls (corner-expansion E and 0/1 segment-sum S)
    in the bf16 path — 17.5 ms/layer vs 51 ms for the round-1 per-level
    formulation. The fp32 path keeps an exact VPU multiply+reduce.
  * `quad` / `quad_bf16`: per-level quad-table gathers (round-1 formulation).
  * `corner4`: 4-corner row gathers (the direct reference formulation).
Measured lower bound for the raw gather at these shapes is ~7.4 ms (row-count /
byte-bound at ~390 Mrows/s / ~100 GB/s); a hand-written Pallas gather kernel
cannot beat it because Mosaic requires 8-aligned dynamic sublane reads, forcing
a masked-block formulation that costs more VPU work than the native gather unit.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Shapes = Tuple[Tuple[int, int], ...]


def _level_sizes(spatial_shapes: Shapes) -> Tuple[int, ...]:
    return tuple(h * w for h, w in spatial_shapes)


def _bilinear_gather_level(
    value_l: jnp.ndarray,      # (B, M, S_l, D) fp32
    loc: jnp.ndarray,          # (B, Q, M, P, 2) in [0, 1], fp32
    h: int,
    w: int,
) -> jnp.ndarray:
    """Sample `value_l` at `loc` with bilinear interpolation, zero padding.

    Returns (B, M, Q, P, D).
    """
    b, m, _, d = value_l.shape
    q, p = loc.shape[1], loc.shape[3]

    # align_corners=False: pixel-center coordinates.
    x = loc[..., 0] * w - 0.5   # (B, Q, M, P)
    y = loc[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # 4 corners fused into ONE gather of 4P rows per (query, head): one XLA
    # gather op + one weighted reduce instead of 4 gather->mul->add chains —
    # roughly half the HBM round-trips for this bandwidth-bound op.
    corners = ((y0i, x0i, (1.0 - ly) * (1.0 - lx)),
               (y0i, x0i + 1, (1.0 - ly) * lx),
               (y0i + 1, x0i, ly * (1.0 - lx)),
               (y0i + 1, x0i + 1, ly * lx))
    idx_list, w_list = [], []
    for yi, xi, cw in corners:
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx_list.append(jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
        w_list.append(cw * valid.astype(cw.dtype))
    flat = jnp.stack(idx_list, axis=-1)                  # (B, Q, M, P, 4)
    cw = jnp.stack(w_list, axis=-1)                      # (B, Q, M, P, 4)
    flat = jnp.transpose(flat, (0, 2, 1, 3, 4))          # (B, M, Q, P, 4)
    cw = jnp.transpose(cw, (0, 2, 1, 3, 4))

    gathered = jax.vmap(jax.vmap(lambda v, i: jnp.take(v, i.reshape(-1), axis=0)))(
        value_l, flat)                                   # (B, M, Q*P*4, D)
    gathered = gathered.reshape(b, m, q, p, 4, d)
    return jnp.sum(gathered * cw[..., None], axis=4)     # (B, M, Q, P, D)


def _quad_gather_level(
    value_l: jnp.ndarray,      # (B, M, S_l, D) fp32
    loc: jnp.ndarray,          # (B, Q, M, P, 2) in [0, 1], fp32
    w_l: jnp.ndarray,          # (B, Q, M, P) attention weights, fp32
    h: int,
    w: int,
    table_dtype=None,          # e.g. jnp.bfloat16: halve gather bytes
) -> jnp.ndarray:
    """Bilinear sample via a 'quad table': the level map is zero-padded by one
    pixel and each padded position stores [v(y,x), v(y,x+1), v(y+1,x),
    v(y+1,x+1)] — so ONE gathered row serves all 4 bilinear corners. TPU gathers
    are row-count-bound (~1e8 rows/s regardless of width), so this is ~4x faster
    than per-corner gathers. Returns (B, M, Q, D) already weight-reduced over P.
    """
    b, m, _, d = value_l.shape
    q, p = loc.shape[1], loc.shape[3]
    f32 = jnp.float32

    vmap2d = value_l.reshape(b, m, h, w, d)
    # zero-pad top/left/bottom/right by 1; build the 4-corner table on the
    # (h+1, w+1) base grid (base index range y0,x0 in [-1, h-1] -> +1 shift).
    if table_dtype is not None:
        vmap2d = vmap2d.astype(table_dtype)
    vp = jnp.pad(vmap2d, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:], vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]],
        axis=-1)                                     # (B, M, h+1, w+1, 4D)
    quad = quad.reshape(b, m, (h + 1) * (w + 1), 4 * d)

    x = loc[..., 0] * w - 0.5                        # (B, Q, M, P)
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    in_range = ((x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1))
    idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
           + (jnp.clip(x0i, -1, w - 1) + 1))         # (B, Q, M, P)
    idx = jnp.transpose(idx, (0, 2, 1, 3))           # (B, M, Q, P)

    g = jax.vmap(jax.vmap(lambda v, i: jnp.take(v, i.reshape(-1), axis=0)))(
        quad, idx)                                   # (B, M, Q*P, 4D)
    g = g.reshape(b, m, q, p, 4, d).astype(f32)
    cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                    ly * (1 - lx), ly * lx], axis=-1)          # (B, Q, M, P, 4)
    cw = cw * (in_range.astype(f32) * w_l)[..., None]
    cw = jnp.transpose(cw, (0, 2, 1, 3, 4))          # (B, M, Q, P, 4)
    return jnp.sum(g * cw[..., None], axis=(3, 4))   # (B, M, Q, D)


def _flat_quad_attn(
    value: jnp.ndarray,        # (B, S, M, D) fp32
    spatial_shapes: Shapes,
    loc: jnp.ndarray,          # (B, Q, M, L, P, 2) fp32
    weights: jnp.ndarray,      # (B, Q, M, L, P) fp32
    table_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """All levels in ONE gather: per-level quad tables are concatenated along the
    row axis and every (query, head, level, point) sample becomes one row index
    into the combined table. One big batched gather keeps the TPU gather unit at
    its byte-bound throughput instead of 4 smaller row-bound launches, and the
    weighted reduce consumes the gathered rows in a single fusion.

    Returns (B, M, Q, D) fp32, already reduced over levels and points.
    """
    b, s, m, d = value.shape
    q, _, L, p, _ = loc.shape[1:]
    f32 = jnp.float32

    value_t = jnp.transpose(value, (0, 2, 1, 3))     # (B, M, S, D)
    tables, idx_parts, cw_parts = [], [], []
    start, row_off = 0, 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_t, start, start + h * w, axis=2)
        vmap2d = v_l.reshape(b, m, h, w, d).astype(table_dtype)
        vp = jnp.pad(vmap2d, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
             vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
        tables.append(quad.reshape(b, m, (h + 1) * (w + 1), 4 * d))

        x = loc[:, :, :, lvl, :, 0] * w - 0.5        # (B, Q, M, P)
        y = loc[:, :, :, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
        idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
               + (jnp.clip(x0i, -1, w - 1) + 1)) + row_off
        idx_parts.append(idx)                        # (B, Q, M, P)
        cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], axis=-1)
        cw = cw * (in_range.astype(f32) * weights[:, :, :, lvl])[..., None]
        cw_parts.append(cw)                          # (B, Q, M, P, 4)
        start += h * w
        row_off += (h + 1) * (w + 1)

    table = jnp.concatenate(tables, axis=2)          # (B, M, R, 4D)
    idx = jnp.stack(idx_parts, axis=3)               # (B, Q, M, L, P)
    cw = jnp.stack(cw_parts, axis=3)                 # (B, Q, M, L, P, 4)
    idx = jnp.transpose(idx, (0, 2, 1, 3, 4)).reshape(b, m, q * L * p)
    cw = jnp.transpose(cw, (0, 2, 1, 3, 4, 5)).reshape(b, m, q, L * p, 4)

    # ONE unbatched take: fold (b, m) into the row index — XLA's batched gather
    # lowering is ~2x slower than a flat gather at these row counts (measured).
    r = table.shape[2]
    off = (jnp.arange(b * m, dtype=jnp.int32) * r).reshape(b, m, 1)
    k = L * p
    n_rows = b * m * q * k
    flat_idx = (idx + off).reshape(n_rows)
    cw = cw.reshape(n_rows, 4).astype(table.dtype)

    # Pad the row count to the reduction block so the segment-sum matmul tiles.
    # cb must be a multiple of k so no query straddles a block boundary.
    cb = k * max(1, min(4096 // k, (n_rows + k - 1) // k))
    pad = (-n_rows) % cb
    if pad:
        flat_idx = jnp.pad(flat_idx, (0, pad))
        cw = jnp.pad(cw, ((0, pad), (0, 0)))

    # NOTE: keep take's default (fill) OOB mode. mode="clip" looks like a
    # no-op (indices ARE in-bounds by construction) but changes XLA's gather
    # codegen/fusion and perturbed jitted encoder-scale results at ~1e-6 —
    # enough to break full-model parity at random init (round-2 judge bisect).
    # Do not re-add without an in-program TPU A/B AND an unchanged parity table.
    g = jnp.take(table.reshape(b * m * r, 4 * d), flat_idx, axis=0)

    if table.dtype == jnp.bfloat16:
        # Weighted segment reduce on the MXU (measured ~25% faster than the VPU
        # mul+sum, which materializes the gathered rows an extra time):
        #   corner-expand: cwmat[row, l] = cw[row, l // d]      (row, 4d) via E
        #   segment-sum:   out[q, :] = sum over the q's k rows  via 0/1 S matmul
        lane = jnp.arange(4 * d) // d
        e_mat = (lane[None, :] == jnp.arange(4)[:, None]).astype(table.dtype)
        s_mat = (jnp.arange(cb)[None, :] // k
                 == jnp.arange(cb // k)[:, None]).astype(table.dtype)
        cwmat = jax.lax.dot_general(cw, e_mat, (((1,), (0,)), ((), ())),
                                    preferred_element_type=table.dtype)
        gw = (g * cwmat).reshape(-1, cb, 4 * d)
        out = jnp.einsum("bkf,qk->bqf", gw, s_mat,
                         preferred_element_type=jnp.float32)
        out = out.reshape(-1, 4, d)[:b * m * q].astype(f32)
        return jnp.sum(out, axis=1).reshape(b, m, q, d)          # (B, M, Q, D)

    # fp32 path (strict numerics): plain multiply + fp32 reduce — exact; the
    # MXU reduce would truncate operands to bf16 at default matmul precision.
    g = g.reshape(-1, k, 4, d)[:b * m * q]
    cw = cw.reshape(-1, k, 4, 1)[:b * m * q]
    out = jnp.sum(g * cw, axis=(1, 2))
    return out.reshape(b, m, q, d)


def _flat_quad_attn_v2(
    value: jnp.ndarray,        # (B, S, M, D) any float dtype
    spatial_shapes: Shapes,
    loc: jnp.ndarray,          # (B, Q, M, L, P, 2) fp32
    weights: jnp.ndarray,      # (B, Q, M, L, P) fp32
    table_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Lower-overhead variant of `_flat_quad_attn` (same math, same gather):

      * value goes straight to the table dtype — no fp32 round-trip through
        HBM before the bf16 table build;
      * loc/weights are transposed to the (B, M, Q, ...) target layout ONCE
        up front, so per-level index/weight math needs no per-tensor
        transposes or a final big relayout;
      * the corner-weight expansion (rows, 4) -> (rows, 4D) is a lane
        broadcast + concat instead of an MXU matmul, so XLA can fuse it into
        the multiply with the gathered rows instead of materializing a
        (rows, 4D) operand.

    Returns (B, M, Q, D) fp32.
    """
    b, s, m, d = value.shape
    q, _, L, p, _ = loc.shape[1:]
    f32 = jnp.float32

    value_t = jnp.transpose(value.astype(table_dtype), (0, 2, 1, 3))
    loc_t = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))       # (B, M, Q, L, P, 2)
    w_t = jnp.transpose(weights, (0, 2, 1, 3, 4))        # (B, M, Q, L, P)

    tables, idx_parts, cw_parts = [], [], []
    start, row_off = 0, 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_t, start, start + h * w, axis=2)
        vp = jnp.pad(v_l.reshape(b, m, h, w, d),
                     ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
             vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
        tables.append(quad.reshape(b, m, (h + 1) * (w + 1), 4 * d))

        x = loc_t[:, :, :, lvl, :, 0] * w - 0.5          # (B, M, Q, P)
        y = loc_t[:, :, :, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
        idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
               + (jnp.clip(x0i, -1, w - 1) + 1)) + row_off
        idx_parts.append(idx)                            # (B, M, Q, P)
        cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], axis=-1)
        cw = cw * (in_range.astype(f32) * w_t[:, :, :, lvl])[..., None]
        cw_parts.append(cw)                              # (B, M, Q, P, 4)
        start += h * w
        row_off += (h + 1) * (w + 1)

    table = jnp.concatenate(tables, axis=2)              # (B, M, R, 4D)
    idx = jnp.stack(idx_parts, axis=3)                   # (B, M, Q, L, P)
    cw = jnp.stack(cw_parts, axis=3)                     # (B, M, Q, L, P, 4)

    r = table.shape[2]
    off = (jnp.arange(b * m, dtype=jnp.int32) * r).reshape(b, m, 1, 1, 1)
    k = L * p
    n_rows = b * m * q * k
    flat_idx = (idx + off).reshape(n_rows)
    cw = cw.reshape(n_rows, 4).astype(table.dtype)

    cb = k * max(1, min(4096 // k, (n_rows + k - 1) // k))
    pad = (-n_rows) % cb
    if pad:
        flat_idx = jnp.pad(flat_idx, (0, pad))
        cw = jnp.pad(cw, ((0, pad), (0, 0)))

    # NOTE: keep take's default (fill) OOB mode. mode="clip" looks like a
    # no-op (indices ARE in-bounds by construction) but changes XLA's gather
    # codegen/fusion and perturbed jitted encoder-scale results at ~1e-6 —
    # enough to break full-model parity at random init (round-2 judge bisect).
    # Do not re-add without an in-program TPU A/B AND an unchanged parity table.
    g = jnp.take(table.reshape(b * m * r, 4 * d), flat_idx, axis=0)

    if table.dtype == jnp.bfloat16:
        # corner-expand by broadcast (fusable), segment-sum on the MXU.
        cwmat = jnp.concatenate(
            [jnp.broadcast_to(cw[:, c:c + 1], (cw.shape[0], d))
             for c in range(4)], axis=1)                 # (rows, 4D)
        s_mat = (jnp.arange(cb)[None, :] // k
                 == jnp.arange(cb // k)[:, None]).astype(table.dtype)
        gw = (g * cwmat).reshape(-1, cb, 4 * d)
        out = jnp.einsum("bkf,qk->bqf", gw, s_mat,
                         preferred_element_type=jnp.float32)
        out = out.reshape(-1, 4, d)[:b * m * q].astype(f32)
        return jnp.sum(out, axis=1).reshape(b, m, q, d)

    g = g.astype(f32).reshape(-1, k, 4, d)[:b * m * q]
    cw = cw.astype(f32).reshape(-1, k, 4, 1)[:b * m * q]
    out = jnp.sum(g * cw, axis=(1, 2))
    return out.reshape(b, m, q, d)


def _flat_quad_attn_v3(
    value: jnp.ndarray,        # (B, S, M, D) any float dtype
    spatial_shapes: Shapes,
    loc: jnp.ndarray,          # (B, Q, M, L, P, 2) fp32
    weights: jnp.ndarray,      # (B, Q, M, L, P) fp32
    table_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Hybrid of `_flat_quad_attn` and `_flat_quad_attn_v2` (measured best):
    v2's up-front (B, M, Q, ...) relayout of loc/weights and direct-to-bf16
    table build, but v1's MXU corner-expansion E-matmul for the reduce (the
    v2 broadcast-concat expansion measured ~10 ms/layer slower at encoder
    scale). bf16 only."""
    b, s, m, d = value.shape
    q, _, L, p, _ = loc.shape[1:]
    f32 = jnp.float32

    value_t = jnp.transpose(value.astype(table_dtype), (0, 2, 1, 3))
    loc_t = jnp.transpose(loc, (0, 2, 1, 3, 4, 5))       # (B, M, Q, L, P, 2)
    w_t = jnp.transpose(weights, (0, 2, 1, 3, 4))        # (B, M, Q, L, P)

    tables, idx_parts, cw_parts = [], [], []
    start, row_off = 0, 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_t, start, start + h * w, axis=2)
        vp = jnp.pad(v_l.reshape(b, m, h, w, d),
                     ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
             vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
        tables.append(quad.reshape(b, m, (h + 1) * (w + 1), 4 * d))

        x = loc_t[:, :, :, lvl, :, 0] * w - 0.5          # (B, M, Q, P)
        y = loc_t[:, :, :, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
        idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
               + (jnp.clip(x0i, -1, w - 1) + 1)) + row_off
        idx_parts.append(idx)                            # (B, M, Q, P)
        cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], axis=-1)
        cw = cw * (in_range.astype(f32) * w_t[:, :, :, lvl])[..., None]
        cw_parts.append(cw)                              # (B, M, Q, P, 4)
        start += h * w
        row_off += (h + 1) * (w + 1)

    table = jnp.concatenate(tables, axis=2)              # (B, M, R, 4D)
    idx = jnp.stack(idx_parts, axis=3)                   # (B, M, Q, L, P)
    cw = jnp.stack(cw_parts, axis=3)                     # (B, M, Q, L, P, 4)

    r = table.shape[2]
    off = (jnp.arange(b * m, dtype=jnp.int32) * r).reshape(b, m, 1, 1, 1)
    k = L * p
    n_rows = b * m * q * k
    flat_idx = (idx + off).reshape(n_rows)
    cw = cw.reshape(n_rows, 4).astype(table.dtype)

    cb = k * max(1, min(4096 // k, (n_rows + k - 1) // k))
    pad = (-n_rows) % cb
    if pad:
        flat_idx = jnp.pad(flat_idx, (0, pad))
        cw = jnp.pad(cw, ((0, pad), (0, 0)))

    # NOTE: keep take's default (fill) OOB mode. mode="clip" looks like a
    # no-op (indices ARE in-bounds by construction) but changes XLA's gather
    # codegen/fusion and perturbed jitted encoder-scale results at ~1e-6 —
    # enough to break full-model parity at random init (round-2 judge bisect).
    # Do not re-add without an in-program TPU A/B AND an unchanged parity table.
    g = jnp.take(table.reshape(b * m * r, 4 * d), flat_idx, axis=0)

    lane = jnp.arange(4 * d) // d
    e_mat = (lane[None, :] == jnp.arange(4)[:, None]).astype(table.dtype)
    s_mat = (jnp.arange(cb)[None, :] // k
             == jnp.arange(cb // k)[:, None]).astype(table.dtype)
    cwmat = jax.lax.dot_general(cw, e_mat, (((1,), (0,)), ((), ())),
                                preferred_element_type=table.dtype)
    gw = (g * cwmat).reshape(-1, cb, 4 * d)
    out = jnp.einsum("bkf,qk->bqf", gw, s_mat,
                     preferred_element_type=jnp.float32)
    out = out.reshape(-1, 4, d)[:b * m * q].astype(f32)
    return jnp.sum(out, axis=1).reshape(b, m, q, d)


def _flat_quad_attn_v4(
    value: jnp.ndarray,        # (B, S, M, D) any float dtype
    spatial_shapes: Shapes,
    loc: jnp.ndarray,          # (B, Q, M, L, P, 2) fp32
    weights: jnp.ndarray,      # (B, Q, M, L, P) fp32
    table_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Natural-row-order + fused-reduce variant (fastest measured, round 2).

    Two structural changes over v3:
      * gather rows are ordered (b, q, m, l, p) — the layout the index and
        corner-weight math produces AND the layout the final (B, Q, M*D)
        output wants, so the two big Q<->M relayout copies per layer (and
        the dispatcher's final transpose) disappear;
      * the weighted segment reduce runs in one Pallas pass
        (ops/pallas/msda_reduce_kernel.py) instead of two one-hot MXU
        matmuls with a (rows, 4D) HBM materialization between them.

    Returns (B, Q, M * D) fp32 — NOTE: already head-concatenated.
    """
    b, s, m, d = value.shape
    q, _, L, p, _ = loc.shape[1:]
    f32 = jnp.float32

    value_t = jnp.transpose(value.astype(table_dtype), (0, 2, 1, 3))
    tables, idx_parts, cw_parts = [], [], []
    start, row_off = 0, 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_t, start, start + h * w, axis=2)
        vp = jnp.pad(v_l.reshape(b, m, h, w, d),
                     ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
             vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
        tables.append(quad.reshape(b, m, (h + 1) * (w + 1), 4 * d))

        x = loc[:, :, :, lvl, :, 0] * w - 0.5            # (B, Q, M, P)
        y = loc[:, :, :, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
        idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
               + (jnp.clip(x0i, -1, w - 1) + 1)) + row_off
        idx_parts.append(idx)                            # (B, Q, M, P)
        cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], axis=-1)
        cw = cw * (in_range.astype(f32) * weights[:, :, :, lvl])[..., None]
        cw_parts.append(cw)                              # (B, Q, M, P, 4)
        start += h * w
        row_off += (h + 1) * (w + 1)

    table = jnp.concatenate(tables, axis=2)              # (B, M, R, 4D)
    idx = jnp.stack(idx_parts, axis=3)                   # (B, Q, M, L, P)
    cw = jnp.stack(cw_parts, axis=3)                     # (B, Q, M, L, P, 4)

    r = table.shape[2]
    # rows stay in (b, q, m, l, p) order: the table offset depends only on
    # (b, m), broadcast into the natural index layout — no transposes.
    off = (jnp.arange(b * m, dtype=jnp.int32) * r).reshape(b, 1, m, 1, 1)
    k = L * p
    n_rows = b * q * m * k
    flat_idx = (idx + off).reshape(n_rows)
    cw = cw.reshape(n_rows, 4).astype(table.dtype)

    # NOTE: keep take's default (fill) OOB mode. mode="clip" looks like a
    # no-op (indices ARE in-bounds by construction) but changes XLA's gather
    # codegen/fusion and perturbed jitted encoder-scale results at ~1e-6 —
    # enough to break full-model parity at random init (round-2 judge bisect).
    # Do not re-add without an in-program TPU A/B AND an unchanged parity table.
    g = jnp.take(table.reshape(b * m * r, 4 * d), flat_idx, axis=0)

    from hipie_tpu.ops.pallas.msda_reduce_kernel import \
        msda_weighted_segment_sum
    seg = msda_weighted_segment_sum(g, cw, k)            # (b*q*m, 4d) f32
    out = jnp.sum(seg.reshape(b, q, m, 4, d), axis=3)
    return out.reshape(b, q, m * d)


def _flat_quad_attn_v5(
    value: jnp.ndarray,        # (B, S, M, D) any float dtype
    spatial_shapes: Shapes,
    loc: jnp.ndarray,          # (B, Q, M, L, P, 2) fp32
    weights: jnp.ndarray,      # (B, Q, M, L, P) fp32
    table_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """v4's natural (b, q, m, l, p) row order — no Q<->M relayout copies and
    no final head transpose — combined with v1's XLA MXU reduce (one-hot E
    corner-expand + 0/1 S segment-sum matmuls) instead of v4's Pallas kernel
    (the round-3 A/B showed the Pallas reduce, not the row order, was what
    made flat4 slower than the v1 default). f32 tables take the exact
    multiply+sum reduce (like v1); the MXU reduce is bf16-tables-only.

    Returns (B, Q, M * D) fp32 — already head-concatenated.
    """
    b, s, m, d = value.shape
    q, _, L, p, _ = loc.shape[1:]
    f32 = jnp.float32

    value_t = jnp.transpose(value.astype(table_dtype), (0, 2, 1, 3))
    tables, idx_parts, cw_parts = [], [], []
    start, row_off = 0, 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_t, start, start + h * w, axis=2)
        vp = jnp.pad(v_l.reshape(b, m, h, w, d),
                     ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
             vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
        tables.append(quad.reshape(b, m, (h + 1) * (w + 1), 4 * d))

        x = loc[:, :, :, lvl, :, 0] * w - 0.5            # (B, Q, M, P)
        y = loc[:, :, :, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
        idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
               + (jnp.clip(x0i, -1, w - 1) + 1)) + row_off
        idx_parts.append(idx)                            # (B, Q, M, P)
        cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], axis=-1)
        cw = cw * (in_range.astype(f32) * weights[:, :, :, lvl])[..., None]
        cw_parts.append(cw)                              # (B, Q, M, P, 4)
        start += h * w
        row_off += (h + 1) * (w + 1)

    table = jnp.concatenate(tables, axis=2)              # (B, M, R, 4D)
    idx = jnp.stack(idx_parts, axis=3)                   # (B, Q, M, L, P)
    cw = jnp.stack(cw_parts, axis=3)                     # (B, Q, M, L, P, 4)

    r = table.shape[2]
    off = (jnp.arange(b * m, dtype=jnp.int32) * r).reshape(b, 1, m, 1, 1)
    k = L * p
    n_rows = b * q * m * k
    flat_idx = (idx + off).reshape(n_rows)
    cw = cw.reshape(n_rows, 4).astype(table.dtype)

    cb = k * max(1, min(4096 // k, (n_rows + k - 1) // k))
    pad = (-n_rows) % cb
    if pad:
        flat_idx = jnp.pad(flat_idx, (0, pad))
        cw = jnp.pad(cw, ((0, pad), (0, 0)))

    # NOTE: keep take's default (fill) OOB mode — see the comment in v4.
    g = jnp.take(table.reshape(b * m * r, 4 * d), flat_idx, axis=0)

    if table.dtype == jnp.bfloat16:
        lane = jnp.arange(4 * d) // d
        e_mat = (lane[None, :] == jnp.arange(4)[:, None]).astype(table.dtype)
        s_mat = (jnp.arange(cb)[None, :] // k
                 == jnp.arange(cb // k)[:, None]).astype(table.dtype)
        cwmat = jax.lax.dot_general(cw, e_mat, (((1,), (0,)), ((), ())),
                                    preferred_element_type=table.dtype)
        gw = (g * cwmat).reshape(-1, cb, 4 * d)
        out = jnp.einsum("bkf,qk->bqf", gw, s_mat,
                         preferred_element_type=jnp.float32)
        out = out.reshape(-1, 4, d)[:b * q * m].astype(f32)
        return jnp.sum(out, axis=1).reshape(b, q, m * d)

    # fp32 path (strict numerics), mirroring v1: plain multiply + fp32 reduce
    # — exact; the MXU reduce would truncate f32 operands to bf16 at default
    # matmul precision (ADVICE r03: plain 'flat5' silently degraded on TPU).
    g = g.reshape(-1, k, 4, d)[:b * q * m]
    cwr = cw.reshape(-1, k, 4, 1)[:b * q * m]
    out = jnp.sum(g * cwr, axis=(1, 2))
    return out.reshape(b, q, m * d)


def _flat_quad_attn_v6(
    value: jnp.ndarray,        # (B, S, M, D) any float dtype
    spatial_shapes: Shapes,
    loc: jnp.ndarray,          # (B, Q, M, L, P, 2) fp32
    weights: jnp.ndarray,      # (B, Q, M, L, P) fp32
    table_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Row order (b, m, l, p, q) with Q as the MINOR dim of every prep array.

    Why: v1 materializes idx/cw at (B,M,Q,L,P[,4]) — minor dims of 4 force
    XLA into T(4,128) tiled layouts whose copies/reshapes cost ~8.6 ms/layer
    at batch 2 (r05 trace: copy.6648 + reshape.10320 + friends). Here loc and
    weights are transposed ONCE per call as plain 2-D (Q, F) matrices
    (F = M*L*P*2 = 256 — both dims tile perfectly), and every derived array
    keeps Q minor, so nothing small ever lands in the lane dim. Bonus over
    v1's (b, m, q, l, p) order: consecutive gather rows stay inside ONE
    (head, level) table region with raster-adjacent sampling locations —
    strictly better locality than alternating levels every P rows. The
    segment-sum S matmul and its block padding disappear: the (l, p) reduce
    is a plain axis sum at (BM, LP, Q, 4D).

    Returns (B, Q, M * D) fp32 — already head-concatenated.
    """
    b, s, m, d = value.shape
    q, _, L, p, _ = loc.shape[1:]
    f32 = jnp.float32

    # ONE well-tiled relayout each: (B, Q, F) -> (B, F, Q), then free splits.
    locT = jnp.transpose(loc.reshape(b, q, m * L * p * 2), (0, 2, 1))
    locT = locT.reshape(b, m, L, p, 2, q)
    wT = jnp.transpose(weights.reshape(b, q, m * L * p), (0, 2, 1))
    wT = wT.reshape(b, m, L, p, q)

    value_t = jnp.transpose(value.astype(table_dtype), (0, 2, 1, 3))
    tables, idx_parts, cw_parts = [], [], []
    start, row_off = 0, 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_t, start, start + h * w, axis=2)
        vp = jnp.pad(v_l.reshape(b, m, h, w, d),
                     ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
             vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
        tables.append(quad.reshape(b, m, (h + 1) * (w + 1), 4 * d))

        x = locT[:, :, lvl, :, 0, :] * w - 0.5           # (B, M, P, Q)
        y = locT[:, :, lvl, :, 1, :] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx = x - x0
        ly = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
        idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
               + (jnp.clip(x0i, -1, w - 1) + 1)) + row_off
        idx_parts.append(idx)                            # (B, M, P, Q)
        aw = in_range.astype(f32) * wT[:, :, lvl]        # (B, M, P, Q)
        cw_parts.append(jnp.stack(
            [(1 - ly) * (1 - lx) * aw, (1 - ly) * lx * aw,
             ly * (1 - lx) * aw, ly * lx * aw], axis=2))  # (B, M, 4, P, Q)
        start += h * w
        row_off += (h + 1) * (w + 1)

    table = jnp.concatenate(tables, axis=2)              # (B, M, R, 4D)
    idx = jnp.stack(idx_parts, axis=2)                   # (B, M, L, P, Q)
    cw = jnp.stack(cw_parts, axis=3)                     # (B, M, 4, L, P, Q)

    r = table.shape[2]
    off = (jnp.arange(b * m, dtype=jnp.int32) * r).reshape(b, m, 1, 1, 1)
    k = L * p
    n_rows = b * m * k * q
    flat_idx = (idx + off).reshape(n_rows)               # (b,m,l,p,q) order

    # NOTE: keep take's default (fill) OOB mode — see the comment in v1.
    g = jnp.take(table.reshape(b * m * r, 4 * d), flat_idx, axis=0)
    g = g.reshape(b * m, k, q, 4 * d)

    # corner-expand cw onto the packed 4d lane dim WITHOUT a (rows, 4)
    # intermediate: 4 broadcast multiply-adds against 0/1 lane masks, fused
    # by XLA into the g multiply (nothing with a minor dim < 128 exists).
    lane_c = jnp.arange(4 * d) // d                      # (4D,)
    cwt = cw.reshape(b * m, 4, k, q).astype(table.dtype)
    cwmat = jnp.zeros((b * m, k, q, 4 * d), table.dtype)
    for c in range(4):
        mask_c = (lane_c == c).astype(table.dtype)       # (4D,) 0/1
        cwmat = cwmat + cwt[:, c][..., None] * mask_c

    if table.dtype == jnp.bfloat16:
        partial = jnp.sum((g * cwmat).astype(f32), axis=1)   # (BM, Q, 4D) f32
    else:
        partial = jnp.sum(g * cwmat, axis=1)
    # fold the 4 corners: strided lane-slice adds (still 4D -> D wide lanes).
    out = (partial[..., 0 * d:1 * d] + partial[..., 1 * d:2 * d]
           + partial[..., 2 * d:3 * d] + partial[..., 3 * d:4 * d])
    out = out.reshape(b, m, q, d)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, q, m * d)


def ms_deform_attn_jnp(
    value: jnp.ndarray,                 # (B, S, M, D)
    spatial_shapes: Shapes,             # static ((H0,W0), (H1,W1), ...)
    sampling_locations: jnp.ndarray,    # (B, Q, M, L, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,     # (B, Q, M, L, P), softmaxed over (L, P)
    method: str = "flat",               # flat | flat_bf16 | quad[_bf16] | corner4
) -> jnp.ndarray:
    """Pure-XLA multi-scale deformable attention. Returns (B, Q, M*D)."""
    orig_dtype = value.dtype
    if not method.startswith(("flat2", "flat3", "flat4", "flat5", "flat6")):
        # flat2/3/4 cast value straight to the table dtype (no fp32 HBM round
        # trip); all other paths sample in fp32 like the reference kernel.
        value = value.astype(jnp.float32)
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    b, s, m, d = value.shape
    q = sampling_locations.shape[1]
    num_levels = len(spatial_shapes)
    sizes = _level_sizes(spatial_shapes)
    assert sum(sizes) == s, f"spatial shapes {spatial_shapes} do not sum to S={s}"

    if method.startswith("flat"):
        td = jnp.bfloat16 if method.endswith("bf16") else jnp.float32
        if method.startswith("flat6"):
            out = _flat_quad_attn_v6(value, spatial_shapes,
                                     sampling_locations, attention_weights, td)
            return out.astype(orig_dtype)      # already (B, Q, M*D)
        if method.startswith("flat5"):
            out = _flat_quad_attn_v5(value, spatial_shapes,
                                     sampling_locations, attention_weights, td)
            return out.astype(orig_dtype)      # already (B, Q, M*D)
        if method.startswith("flat4"):
            out = _flat_quad_attn_v4(value, spatial_shapes,
                                     sampling_locations, attention_weights, td)
            return out.astype(orig_dtype)      # already (B, Q, M*D)
        if method.startswith("flat3"):
            impl = _flat_quad_attn_v3
        elif method.startswith("flat2"):
            impl = _flat_quad_attn_v2
        else:
            impl = _flat_quad_attn
        out = impl(value, spatial_shapes, sampling_locations,
                   attention_weights, td)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, q, m * d)
        return out.astype(orig_dtype)

    # (B, S, M, D) -> (B, M, S, D) once, then static per-level slices.
    value_t = jnp.transpose(value, (0, 2, 1, 3))

    out = jnp.zeros((b, m, q, d), jnp.float32)
    start = 0
    for lid in range(num_levels):
        h, w = spatial_shapes[lid]
        value_l = jax.lax.slice_in_dim(value_t, start, start + sizes[lid], axis=2)
        loc_l = sampling_locations[:, :, :, lid]          # (B, Q, M, P, 2)
        w_l = attention_weights[:, :, :, lid]             # (B, Q, M, P)
        if method.startswith("quad"):
            td = jnp.bfloat16 if method == "quad_bf16" else None
            out = out + _quad_gather_level(value_l, loc_l, w_l, h, w, td)
        else:
            sampled = _bilinear_gather_level(value_l, loc_l, h, w)   # (B,M,Q,P,D)
            w_t = jnp.transpose(w_l, (0, 2, 1, 3))        # (B, M, Q, P)
            out = out + jnp.sum(sampled * w_t[..., None], axis=3)
        start += sizes[lid]

    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, q, m * d)
    return out.astype(orig_dtype)


def ms_deform_attn_chunked(
    value: jnp.ndarray,
    spatial_shapes: Shapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    chunk_size: int = 4096,
) -> jnp.ndarray:
    """Query-chunked variant: bounds the (B, M, Q, P, D) gather intermediates.

    Used for the encoder self-attention path where Q == S can reach ~20k tokens at
    1024^2 input; chunking keeps peak HBM for intermediates flat while XLA pipelines
    the chunks. Q must be divisible by chunk_size or chunking is skipped.
    """
    q = sampling_locations.shape[1]
    if q <= chunk_size or q % chunk_size != 0:
        return ms_deform_attn_jnp(value, spatial_shapes, sampling_locations, attention_weights)

    n_chunks = q // chunk_size
    loc = sampling_locations.reshape(
        (sampling_locations.shape[0], n_chunks, chunk_size) + sampling_locations.shape[2:]
    )
    w = attention_weights.reshape(
        (attention_weights.shape[0], n_chunks, chunk_size) + attention_weights.shape[2:]
    )

    def body(carry, inp):
        loc_c, w_c = inp
        out_c = ms_deform_attn_jnp(value, spatial_shapes, loc_c, w_c)
        return carry, out_c

    # scan over chunk axis (moved to front).
    loc_s = jnp.moveaxis(loc, 1, 0)
    w_s = jnp.moveaxis(w, 1, 0)
    _, outs = jax.lax.scan(body, None, (loc_s, w_s))
    out = jnp.moveaxis(outs, 0, 1)   # (B, n_chunks, chunk, M*D)
    return out.reshape(out.shape[0], q, out.shape[-1])


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "chunk_size"))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Shapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    chunk_size: int = 0,
) -> jnp.ndarray:
    """Public entry point. See `ms_deform_attn_jnp` for semantics.

    Args:
      value: (B, S, M, D) flattened multi-level feature map.
      spatial_shapes: static tuple of (H, W) per level; sum(H*W) == S.
      sampling_locations: (B, Q, M, L, P, 2), normalized [0, 1] coords per level.
      attention_weights: (B, Q, M, L, P), already softmaxed over L*P.
      chunk_size: if > 0, chunk queries to bound gather intermediates.
    """
    if chunk_size:
        return ms_deform_attn_chunked(
            value, spatial_shapes, sampling_locations, attention_weights, chunk_size
        )
    return ms_deform_attn_jnp(value, spatial_shapes, sampling_locations, attention_weights)


# ---------------------------------------------------------------------------
# Training wrapper with a hand-written VJP.
#
# XLA's automatic transpose of the sampling gather is a scatter-add, which on
# TPU costs ~1.3 s per 13M rows (measured; PERFORMANCE.md) — it dominated the
# whole train step. The custom backward instead:
#   * re-gathers the 4 bilinear corner rows (row-count-bound, same cost class
#     as the forward gather),
#   * computes grad(sampling_locations) / grad(attention_weights) analytically
#     from the corner values (the same closed forms as the reference CUDA
#     backward, ms_deform_im2col_cuda.cuh ms_deformable_col2im_*), and
#   * computes grad(value) as a chunked SEPARABLE one-hot matmul "splat":
#     grad[h, w, d] = sum_p Wy[p, h] * Wx[p, w] * c[p, d] with Wy/Wx the
#     2-nonzero bilinear corner-weight matrices (out-of-range corners vanish
#     because one_hot of an out-of-range index is zero) — two MXU matmuls per
#     chunk instead of a serialized scatter.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_train(value, spatial_shapes, sampling_locations,
                         attention_weights, method="flat2_bf16"):
    """`ms_deform_attn_jnp` with a TPU-fast hand-written backward."""
    return ms_deform_attn_jnp(value, spatial_shapes, sampling_locations,
                              attention_weights, method)


def _msda_train_fwd(value, spatial_shapes, loc, attw, method):
    out = ms_deform_attn_jnp(value, spatial_shapes, loc, attw, method)
    return out, (value, loc, attw)


def _msda_train_bwd(spatial_shapes, method, res, gout):
    value, loc, attw = res
    b, s, m, d = value.shape
    q, _, L, p, _ = loc.shape[1:]
    f32 = jnp.float32
    td = jnp.bfloat16 if method.endswith("bf16") else f32

    value_t = jnp.transpose(value, (0, 2, 1, 3)).astype(td)   # (B, M, S, D)
    loc_t = jnp.transpose(loc.astype(f32), (0, 2, 1, 3, 4, 5))  # (B,M,Q,L,P,2)
    w_t = jnp.transpose(attw.astype(f32), (0, 2, 1, 3, 4))      # (B,M,Q,L,P)
    gout_t = jnp.transpose(gout.reshape(b, q, m, d), (0, 2, 1, 3)).astype(f32)

    grad_v_parts = []
    grad_x_parts, grad_y_parts, grad_w_parts = [], [], []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.slice_in_dim(value_t, start, start + h * w, axis=2)
        x = loc_t[:, :, :, lvl, :, 0] * w - 0.5                # (B, M, Q, P)
        y = loc_t[:, :, :, lvl, :, 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        lx, ly = x - x0, y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        in_range = ((x0i >= -1) & (x0i <= w - 1)
                    & (y0i >= -1) & (y0i <= h - 1)).astype(f32)
        aw = w_t[:, :, :, lvl]                                 # (B, M, Q, P)

        # corner regather via the level quad table (one row per sample)
        vp = jnp.pad(v_l.reshape(b, m, h, w, d),
                     ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            [vp[:, :, :-1, :-1], vp[:, :, :-1, 1:],
             vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]], axis=-1)
        quad = quad.reshape(b, m, (h + 1) * (w + 1), 4 * d)
        idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
               + (jnp.clip(x0i, -1, w - 1) + 1))               # (B, M, Q, P)
        g = jax.vmap(jax.vmap(
            lambda v, i: jnp.take(v, i.reshape(-1), axis=0)))(quad, idx)
        g = g.reshape(b, m, q, p, 4 * d)
        # All three scalar-per-(q,p) grads are row-dots over the PACKED corner
        # lanes: grad[.] = sum_{c,j} coef_c * g[c*d+j] * gout[j]. Keeping the
        # (4, d) corner axis fused in the 4d=128 lane dim matters for memory:
        # splitting it (the old reshape to (..., 4, d) + corner slices) forced
        # XLA into T(4,128) layouts with 4x pad expansion — 2.7 GB of HLO temps
        # at encoder scale, the allocation that OOM'd the ViT-H 1024^2 train
        # step on one 16 GB chip.
        gg = g.astype(f32) * jnp.concatenate(
            [gout_t] * 4, axis=-1)[:, :, :, None, :]          # (B,M,Q,P,4d)
        # Reduce gg ONCE to per-corner partials s[..., c] = sum_j gg[c*d + j]
        # (a single (4d, 4) one-hot matmul consumes the only big temp); every
        # scalar grad is then a tiny per-corner dot with its coefficients.
        e_t = (jnp.arange(4 * d)[:, None] // d
               == jnp.arange(4)[None, :]).astype(f32)         # (4d, 4)
        s_c = jax.lax.dot_general(
            gg, e_t, (((4,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)              # (B,M,Q,P,4)

        cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                        ly * (1 - lx), ly * lx], axis=-1)      # (B,M,Q,P,4)
        cw = cw * in_range[..., None]
        grad_w_parts.append(jnp.sum(s_c * cw, axis=-1))
        one = jnp.ones_like(lx)
        acoef = jnp.stack([-(one - ly), one - ly, -ly, ly], axis=-1)
        bcoef = jnp.stack([-(one - lx), -lx, one - lx, lx], axis=-1)
        gm = aw * in_range
        grad_x_parts.append(jnp.sum(s_c * acoef, axis=-1) * gm * w)
        grad_y_parts.append(jnp.sum(s_c * bcoef, axis=-1) * gm * h)

        # grad(value): chunked separable splat over the q*p points
        n = q * p
        cvec = (aw[..., None] * gout_t[:, :, :, None, :]).reshape(b, m, n, d)
        xi = x0i.reshape(b, m, n)
        yi = y0i.reshape(b, m, n)
        lxf = lx.reshape(b, m, n)
        lyf = ly.reshape(b, m, n)
        chunk = max(128, min(n, (1 << 26) // max(1, b * m * w * d)))
        n_chunks = -(-n // chunk)
        pad = n_chunks * chunk - n
        if pad:
            cvec = jnp.pad(cvec, ((0, 0), (0, 0), (0, pad), (0, 0)))
            xi = jnp.pad(xi, ((0, 0), (0, 0), (0, pad)), constant_values=-7)
            yi = jnp.pad(yi, ((0, 0), (0, 0), (0, pad)), constant_values=-7)
            lxf = jnp.pad(lxf, ((0, 0), (0, 0), (0, pad)))
            lyf = jnp.pad(lyf, ((0, 0), (0, 0), (0, pad)))

        def body(acc, xs, h=h, w=w):
            cv, xc, yc, lxc, lyc = xs
            wy = (jax.nn.one_hot(yc, h, dtype=f32) * (1 - lyc)[..., None]
                  + jax.nn.one_hot(yc + 1, h, dtype=f32) * lyc[..., None])
            wx = (jax.nn.one_hot(xc, w, dtype=f32) * (1 - lxc)[..., None]
                  + jax.nn.one_hot(xc + 1, w, dtype=f32) * lxc[..., None])
            vxd = wx[..., None] * cv[..., None, :]             # (B,M,c,W,D)
            upd = jnp.einsum("bmch,bmcE->bmhE",
                             wy, vxd.reshape(b, m, chunk, w * d),
                             preferred_element_type=f32)
            return acc + upd, None

        xs = tuple(v.reshape(b, m, n_chunks, chunk).transpose(2, 0, 1, 3)
                   for v in (None, xi, yi, lxf, lyf) if v is not None)
        cvx = cvec.reshape(b, m, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)
        acc0 = jnp.zeros((b, m, h, w * d), f32)
        gv_l, _ = jax.lax.scan(body, acc0, (cvx,) + xs)
        grad_v_parts.append(gv_l.reshape(b, m, h * w, d))
        start += h * w

    grad_v = jnp.concatenate(grad_v_parts, axis=2)             # (B, M, S, D)
    grad_v = jnp.transpose(grad_v, (0, 2, 1, 3)).astype(value.dtype)
    gx = jnp.stack(grad_x_parts, axis=3)                       # (B,M,Q,L,P)
    gy = jnp.stack(grad_y_parts, axis=3)
    grad_loc = jnp.stack([gx, gy], axis=-1)                    # (B,M,Q,L,P,2)
    grad_loc = jnp.transpose(grad_loc, (0, 2, 1, 3, 4, 5)).astype(loc.dtype)
    grad_w = jnp.transpose(jnp.stack(grad_w_parts, axis=3),
                           (0, 2, 1, 3, 4)).astype(attw.dtype)
    return grad_v, grad_loc, grad_w


ms_deform_attn_train.defvjp(_msda_train_fwd, _msda_train_bwd)
