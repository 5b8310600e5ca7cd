"""Pallas MSDA kernel vs the pure-jnp reference (interpret mode on CPU) — the
reference's ops/test.py methodology (SURVEY.md §4.1) applied to the TPU kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("d", [16, 32])
def test_pallas_msda_matches_jnp(d):
    from hipie_tpu.ops.ms_deform_attn import ms_deform_attn_jnp
    from hipie_tpu.ops.pallas.msda_kernel import ms_deform_attn_pallas_interpret

    rng = np.random.RandomState(0)
    shapes = ((8, 8), (4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    B, M, Q, L, P = 2, 2, 12, 3, 4
    v = jnp.asarray(rng.randn(B, S, M, d).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, Q, M, L, P, 2).astype(np.float32) * 1.2 - 0.1)
    w = rng.rand(B, Q, M, L, P).astype(np.float32)
    w = jnp.asarray(w / w.sum((-1, -2), keepdims=True))

    ref = ms_deform_attn_jnp(v, shapes, loc, w)
    got = ms_deform_attn_pallas_interpret(v, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pallas_msda_custom_vjp_grad():
    from hipie_tpu.ops.ms_deform_attn import ms_deform_attn_jnp
    from hipie_tpu.ops.pallas import msda_kernel

    rng = np.random.RandomState(1)
    shapes = ((4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    B, M, D, Q, L, P = 1, 2, 8, 5, 2, 2
    v = jnp.asarray(rng.randn(B, S, M, D).astype(np.float32))
    loc = jnp.asarray(rng.rand(B, Q, M, L, P, 2).astype(np.float32))
    w = rng.rand(B, Q, M, L, P).astype(np.float32)
    w = jnp.asarray(w / w.sum((-1, -2), keepdims=True))

    # the custom_vjp backward is defined via the jnp path; compare grads.
    import functools

    fwd_interp = functools.partial(msda_kernel._msda_pallas_fwd, interpret=True)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
    def op(v_, s_, l_, w_):
        return fwd_interp(v_, s_, l_, w_)

    op.defvjp(lambda v_, s_, l_, w_: (fwd_interp(v_, s_, l_, w_), (v_, l_, w_)),
              functools.partial(msda_kernel._bwd))

    g_ref = jax.grad(lambda v_: jnp.sum(
        ms_deform_attn_jnp(v_, shapes, loc, w) ** 2))(v)
    g_got = jax.grad(lambda v_: jnp.sum(op(v_, shapes, loc, w) ** 2))(v)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), atol=1e-4)
