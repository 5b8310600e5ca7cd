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

A Pallas kernel (`hipie_tpu/ops/pallas/msda_kernel.py`) provides a fused VMEM-resident
variant for hot inference shapes; this module is the reference implementation and the
autodiff path, and the public entry point `ms_deform_attn` dispatches between them.
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


def ms_deform_attn_jnp(
    value: jnp.ndarray,                 # (B, S, M, D)
    spatial_shapes: Shapes,             # static ((H0,W0), (H1,W1), ...)
    sampling_locations: jnp.ndarray,    # (B, Q, M, L, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,     # (B, Q, M, L, P), softmaxed over (L, P)
    method: str = "quad",               # quad | corner4 (reference formulation)
) -> jnp.ndarray:
    """Pure-XLA multi-scale deformable attention. Returns (B, Q, M*D)."""
    orig_dtype = value.dtype
    value = value.astype(jnp.float32)
    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    b, s, m, d = value.shape
    q = sampling_locations.shape[1]
    num_levels = len(spatial_shapes)
    sizes = _level_sizes(spatial_shapes)
    assert sum(sizes) == s, f"spatial shapes {spatial_shapes} do not sum to S={s}"

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


@functools.partial(jax.jit, static_argnames=("spatial_shapes", "chunk_size", "use_pallas"))
def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Shapes,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    *,
    chunk_size: int = 0,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Public entry point. See `ms_deform_attn_jnp` for semantics.

    Args:
      value: (B, S, M, D) flattened multi-level feature map.
      spatial_shapes: static tuple of (H, W) per level; sum(H*W) == S.
      sampling_locations: (B, Q, M, L, P, 2), normalized [0, 1] coords per level.
      attention_weights: (B, Q, M, L, P), already softmaxed over L*P.
      chunk_size: if > 0, chunk queries to bound gather intermediates.
      use_pallas: route to the fused Pallas kernel (forward-optimized).
    """
    if use_pallas:
        from hipie_tpu.ops.pallas.msda_kernel import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if chunk_size:
        return ms_deform_attn_chunked(
            value, spatial_shapes, sampling_locations, attention_weights, chunk_size
        )
    return ms_deform_attn_jnp(value, spatial_shapes, sampling_locations, attention_weights)
