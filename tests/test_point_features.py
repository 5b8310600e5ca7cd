"""point_sample parity vs torch F.grid_sample (the reference's implementation
substrate: detectron2 point_features.py point_sample wraps grid_sample with
grid = 2*coords - 1, align_corners=False, zeros padding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hipie_tpu.losses.point_features import (point_sample, point_sample_pair,
                                             uncertain_point_coords)

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def torch_point_sample(masks, coords):
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(masks).float().unsqueeze(1)          # (N, 1, H, W)
    g = torch.from_numpy(coords).float().unsqueeze(2) * 2 - 1  # (N, P, 1, 2)
    out = F.grid_sample(t, g, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    return out.squeeze(1).squeeze(-1).numpy()                  # (N, P)


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_grid_sample(seed):
    rng = np.random.RandomState(seed)
    masks = rng.randn(5, 13, 17).astype(np.float32)
    # include out-of-range coords to exercise zero padding
    coords = rng.uniform(-0.2, 1.2, (5, 37, 2)).astype(np.float32)
    got = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))
    want = torch_point_sample(masks, coords)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_bool_masks_and_batch_dims():
    rng = np.random.RandomState(3)
    masks = rng.rand(2, 4, 8, 8) > 0.5
    coords = rng.uniform(0, 1, (2, 4, 11, 2)).astype(np.float32)
    got = np.asarray(point_sample(jnp.asarray(masks), jnp.asarray(coords)))
    want = torch_point_sample(
        masks.reshape(8, 8, 8).astype(np.float32),
        coords.reshape(8, 11, 2)).reshape(2, 4, 11)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pair_matches_two_calls():
    rng = np.random.RandomState(4)
    a = rng.randn(6, 16, 16).astype(np.float32)
    b = (rng.rand(6, 16, 16) > 0.5).astype(np.float32)
    coords = rng.uniform(0, 1, (6, 33, 2)).astype(np.float32)
    pa, pb = point_sample_pair(jnp.asarray(a), jnp.asarray(b),
                               jnp.asarray(coords))
    np.testing.assert_allclose(
        np.asarray(pa),
        np.asarray(point_sample(jnp.asarray(a), jnp.asarray(coords))),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pb),
        np.asarray(point_sample(jnp.asarray(b), jnp.asarray(coords))),
        rtol=1e-6)


def test_point_sample_grad():
    rng = np.random.RandomState(5)
    masks = jnp.asarray(rng.randn(2, 8, 8).astype(np.float32))
    coords = jnp.asarray(rng.uniform(0, 1, (2, 9, 2)).astype(np.float32))

    def f(m):
        return point_sample(m, coords).sum()

    g = jax.grad(f)(masks)
    eps = 1e-3
    m2 = masks.at[1, 3, 4].add(eps)
    fd = (f(m2) - f(masks)) / eps
    assert abs(float(g[1, 3, 4]) - float(fd)) < 1e-2


def test_uncertain_coords_shape():
    rng = np.random.RandomState(6)
    ml = jnp.asarray(rng.randn(3, 16, 16).astype(np.float32))
    c = uncertain_point_coords(jax.random.PRNGKey(0), ml, 64)
    assert c.shape == (3, 64, 2)
    assert float(c.min()) >= 0.0 and float(c.max()) <= 1.0


def test_custom_vjp_matches_torch_grads():
    """The hand-written splat/analytic backward (ops/bilinear.py) must match
    torch grid_sample autograd for BOTH masks and coords, incl. out-of-range
    points (zero padding)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(11)
    masks = rng.randn(4, 11, 15).astype(np.float32)
    coords = rng.uniform(-0.2, 1.2, (4, 29, 2)).astype(np.float32)
    cot = rng.randn(4, 29).astype(np.float32)

    t = torch.from_numpy(masks).float().unsqueeze(1).requires_grad_(True)
    g = (torch.from_numpy(coords).float().unsqueeze(2) * 2 - 1
         ).requires_grad_(True)
    out = F.grid_sample(t, g, mode="bilinear", padding_mode="zeros",
                        align_corners=False).squeeze(1).squeeze(-1)
    out.backward(torch.from_numpy(cot))
    t_gmask = t.grad.squeeze(1).numpy()
    t_gcoord = g.grad.squeeze(2).numpy() * 2  # chain: grid = 2*coords - 1

    def f(m, c):
        return (point_sample(m, c) * cot).sum()

    gm, gc = jax.grad(f, argnums=(0, 1))(jnp.asarray(masks),
                                         jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(gm), t_gmask, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gc), t_gcoord, rtol=1e-4, atol=1e-3)


def test_fastgrad_splat_close_to_exact():
    """bilinear_sample_fastgrad: identical forward, bf16-operand splat
    backward within ~1% of the exact f32 splat (criterion.py uses it for the
    Monte-Carlo mask-loss gradient)."""
    from hipie_tpu.ops.bilinear import bilinear_sample, bilinear_sample_fastgrad

    rng = np.random.RandomState(13)
    masks = jnp.asarray(rng.randn(3, 12, 10).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-0.1, 1.1, (3, 64, 2)).astype(np.float32))
    cot = jnp.asarray(rng.randn(3, 64).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(bilinear_sample_fastgrad(masks, coords)),
        np.asarray(bilinear_sample(masks, coords)))

    def g(fn):
        return jax.grad(lambda m: (fn(m, coords) * cot).sum())(masks)

    ge = np.asarray(g(bilinear_sample))
    gf = np.asarray(g(bilinear_sample_fastgrad))
    np.testing.assert_allclose(gf, ge, rtol=2e-2, atol=2e-2)


def test_uncertain_coords_approx_topk_high_recall():
    """Opt-in approx_max_k selection must overlap the exact-sort selection
    heavily (it steers the same Monte-Carlo estimator; exact_topk=True is the
    parity escape hatch)."""
    rng = np.random.RandomState(7)
    ml = jnp.asarray(rng.randn(2, 32, 32).astype(np.float32))
    key = jax.random.PRNGKey(3)
    ca = uncertain_point_coords(key, ml, 256, exact_topk=False)
    ce = uncertain_point_coords(key, ml, 256)
    assert ca.shape == ce.shape == (2, 256, 2)
    # the trailing 25% random-coord block uses the same key: exactly equal
    np.testing.assert_allclose(np.asarray(ca[:, 192:]), np.asarray(ce[:, 192:]))
    # the uncertainty block: compare as SETS of picked coords per instance
    for i in range(2):
        a = {tuple(np.round(x, 6)) for x in np.asarray(ca[i, :192])}
        e = {tuple(np.round(x, 6)) for x in np.asarray(ce[i, :192])}
        recall = len(a & e) / len(e)
        assert recall > 0.85, recall
