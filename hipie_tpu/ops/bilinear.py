"""Bilinear point sampling with a TPU-fast custom VJP.

`bilinear_sample(images, coords)` matches F.grid_sample(align_corners=False,
padding_mode='zeros') with grid = 2*coords - 1 (the point_rend / MSDA sampling
convention; reference projects/HIPIE/hipie/models/deformable_detr/ops/
functions/ms_deform_attn_func.py:43-63 and detectron2/projects/point_rend/
point_features.py point_sample).

Why a custom VJP: the forward is a row gather (fast native gather unit,
~390 Mrows/s on v5e), but XLA's automatic transpose of a gather is a
scatter-add, which on TPU serializes into ~1.3 s per 13M rows (measured,
PERFORMANCE.md) — it dominated the whole train step. The hand-written
backward instead computes

    grad_img[g, y, x] = sum_p Wy[g, p, y] * Wx[g, p, x] * gout[g, p]

as two chunked MXU matmuls, where Wy/Wx are the one-hot(y0)/(y0+1) bilinear
corner-weight matrices (exactly 2 nonzeros per point per axis; out-of-range
corners vanish because one_hot of an out-of-range index is the zero vector,
reproducing zero-padding semantics). ~15 ms instead of ~1.3 s at the mask-loss
shapes. The coordinate gradient is analytic (re-gathers the 4 corners).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _corner_setup(coords, h, w):
    """coords (G, P, 2) in [0,1] -> x0/y0 (int), lx/ly fractions, fp32."""
    x = coords[..., 0].astype(jnp.float32) * w - 0.5
    y = coords[..., 1].astype(jnp.float32) * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    return (x0.astype(jnp.int32), y0.astype(jnp.int32),
            (x - x0), (y - y0))


def _gather_fwd(images, coords):
    """Quad-table row-gather forward: (G, H, W), (G, P, 2) -> (G, P) fp32.

    bf16 inputs keep a bf16 quad table (the gather is HBM-bandwidth-bound, so
    halving row bytes ~halves the gather time); the 4-corner reduce is always
    f32, so the only precision loss is the bf16 quantization of the table
    values the caller opted into."""
    g, h, w = images.shape
    p = coords.shape[1]
    tdt = jnp.bfloat16 if images.dtype == jnp.bfloat16 else jnp.float32
    mp = jnp.pad(images.astype(tdt), ((0, 0), (1, 1), (1, 1)))
    table = jnp.stack(
        [mp[:, :-1, :-1], mp[:, :-1, 1:], mp[:, 1:, :-1], mp[:, 1:, 1:]],
        axis=-1).reshape(g * (h + 1) * (w + 1), 4)
    x0i, y0i, lx, ly = _corner_setup(coords, h, w)
    in_range = (x0i >= -1) & (x0i <= w - 1) & (y0i >= -1) & (y0i <= h - 1)
    idx = ((jnp.clip(y0i, -1, h - 1) + 1) * (w + 1)
           + (jnp.clip(x0i, -1, w - 1) + 1))
    rows = (idx + (jnp.arange(g, dtype=jnp.int32)
                   * (h + 1) * (w + 1))[:, None]).reshape(-1)
    gathered = jnp.take(table, rows, axis=0).reshape(g, p, 4)
    cw = jnp.stack([(1 - ly) * (1 - lx), (1 - ly) * lx,
                    ly * (1 - lx), ly * lx], axis=-1)
    cw = cw * in_range[..., None].astype(jnp.float32)
    return jnp.sum(gathered * cw, axis=-1), (gathered, lx, ly, in_range)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bilinear_sample(images: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (G, H, W) images at (G, P, 2) normalized (x, y) -> (G, P) fp32."""
    out, _ = _gather_fwd(images, coords)
    return out


def _fwd(images, coords):
    out, _ = _gather_fwd(images, coords)
    # residuals: inputs only (re-gather in bwd; cheaper than saving (G,P,4))
    return out, (images, coords)


def _splat(gout, coords, h, w, chunk_elems=1 << 27, op_dtype=jnp.float32):
    """grad wrt images: (G, P) cotangent -> (G, H, W) via chunked MXU matmuls.

    op_dtype=bfloat16 runs the one-hot operands and the einsum in bf16 with an
    f32 accumulator: the one-hots are exact in bf16, so the only loss is ~0.4%
    relative error on the lx/ly corner weights and the cotangent — acceptable
    for Monte-Carlo mask-loss gradients, ~2x the f32 MXU rate and half the
    HBM bytes of the (G, chunk, H/W) one-hot operands."""
    g, p = gout.shape
    x0i, y0i, lx, ly = _corner_setup(coords, h, w)
    # chunk P so the (G, chunk, H) one-hot operand stays ~0.5 GB
    chunk = max(128, min(p, chunk_elems // max(1, g * h)))
    n_chunks = -(-p // chunk)
    pad = n_chunks * chunk - p
    if pad:
        gout = jnp.pad(gout, ((0, 0), (0, pad)))
        x0i = jnp.pad(x0i, ((0, 0), (0, pad)), constant_values=-7)
        y0i = jnp.pad(y0i, ((0, 0), (0, pad)), constant_values=-7)
        lx = jnp.pad(lx, ((0, 0), (0, pad)))
        ly = jnp.pad(ly, ((0, 0), (0, pad)))

    def body(acc, xs):
        go, xc, yc, lxc, lyc = xs          # (G, chunk) each
        lxc = lxc.astype(op_dtype)
        lyc = lyc.astype(op_dtype)
        wy = (jax.nn.one_hot(yc, h, dtype=op_dtype) * (1 - lyc)[..., None]
              + jax.nn.one_hot(yc + 1, h, dtype=op_dtype) * lyc[..., None])
        wx = (jax.nn.one_hot(xc, w, dtype=op_dtype) * (1 - lxc)[..., None]
              + jax.nn.one_hot(xc + 1, w, dtype=op_dtype) * lxc[..., None])
        a = wy * go.astype(op_dtype)[..., None]    # (G, chunk, H)
        return acc + jnp.einsum("gph,gpw->ghw", a, wx,
                                preferred_element_type=jnp.float32), None

    xs = tuple(v.reshape(g, n_chunks, chunk).transpose(1, 0, 2)
               for v in (gout, x0i, y0i, lx, ly))
    acc0 = jnp.zeros((g, h, w), jnp.float32)
    grad, _ = jax.lax.scan(body, acc0, xs)
    return grad


def _make_bwd(op_dtype):
    def _bwd(res, gout):
        images, coords = res
        g, h, w = images.shape
        gout = gout.astype(jnp.float32)
        grad_img = _splat(gout, coords, h, w, op_dtype=op_dtype).astype(
            images.dtype)

        # analytic coordinate gradient (re-gather the 4 corners); XLA DCEs
        # this whole block when the coords cotangent is unused (the mask-loss
        # coords come from rng + stop-gradient picks).
        _, (gathered, lx, ly, in_range) = _gather_fwd(images, coords)
        v00, v01, v10, v11 = (gathered[..., 0], gathered[..., 1],
                              gathered[..., 2], gathered[..., 3])
        dx = ((1 - ly) * (v01 - v00) + ly * (v11 - v10)) * w
        dy = ((1 - lx) * (v10 - v00) + lx * (v11 - v01)) * h
        m = in_range.astype(jnp.float32) * gout
        grad_coords = jnp.stack([dx * m, dy * m], axis=-1).astype(coords.dtype)
        return grad_img, grad_coords
    return _bwd


bilinear_sample.defvjp(_fwd, _make_bwd(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def bilinear_sample_fastgrad(images: jnp.ndarray,
                             coords: jnp.ndarray) -> jnp.ndarray:
    """bilinear_sample with a bf16-operand splat backward.

    Identical FORWARD values to bilinear_sample; the image gradient is the
    same chunked-matmul splat with bf16 one-hot/weight operands (f32
    accumulation). Used by the point-sampled mask losses, where the gradient
    is already a 12544-point Monte-Carlo estimate."""
    out, _ = _gather_fwd(images, coords)
    return out


bilinear_sample_fastgrad.defvjp(_fwd, _make_bwd(jnp.bfloat16))
