"""Matcher tests: auction vs scipy optimal assignment; simOTA invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def test_auction_near_optimal_vs_scipy():
    from scipy.optimize import linear_sum_assignment
    from hipie_tpu.losses.matcher import auction_assignment

    rng = np.random.RandomState(0)
    for trial in range(5):
        q, n = 120, 25
        cost = rng.randn(q, n).astype(np.float32) * 3
        valid = np.ones(n, bool)
        assign = np.asarray(auction_assignment(jnp.asarray(cost), jnp.asarray(valid)))
        # each valid gt owns exactly one query
        owned = assign[assign >= 0]
        assert len(owned) == n
        assert len(set(owned.tolist())) == n
        got_cost = sum(cost[qi, gi] for qi, gi in enumerate(assign) if gi >= 0)
        row, col = linear_sum_assignment(cost.T)  # gt x query
        opt_cost = cost.T[row, col].sum()
        assert got_cost <= opt_cost + 0.02 * abs(opt_cost) + 0.1, (
            f"trial {trial}: auction {got_cost} vs optimal {opt_cost}")


def test_auction_respects_validity():
    from hipie_tpu.losses.matcher import auction_assignment

    cost = jnp.asarray(np.random.RandomState(1).randn(30, 10).astype(np.float32))
    valid = jnp.asarray(np.array([True] * 4 + [False] * 6))
    assign = np.asarray(auction_assignment(cost, valid))
    matched_gts = set(assign[assign >= 0].tolist())
    # only indices matter; all matched gts must be valid
    for q, g in enumerate(assign):
        if g >= 0:
            assert g < 4


def test_simota_every_gt_matched():
    from hipie_tpu.losses.matcher import simota_match

    rng = np.random.RandomState(2)
    q, n, L = 100, 8, 16
    prob = jax.nn.sigmoid(jnp.asarray(rng.randn(q, L).astype(np.float32)))
    boxes = np.concatenate([rng.rand(q, 2), rng.rand(q, 2) * 0.3 + 0.02], -1)
    gt = np.concatenate([rng.rand(n, 2) * 0.8 + 0.1, rng.rand(n, 2) * 0.3 + 0.1], -1)
    pm = np.zeros((n, L), np.float32)
    pm[np.arange(n), rng.randint(0, L, n)] = 1.0
    valid = np.array([True] * 6 + [False] * 2)

    assign = np.asarray(simota_match(
        prob, jnp.asarray(boxes.astype(np.float32)),
        jnp.asarray(gt.astype(np.float32)), jnp.asarray(pm), jnp.asarray(valid)))
    # every valid gt matched at least once; invalid gts never matched
    for g in range(6):
        assert (assign == g).sum() >= 1, f"gt {g} unmatched"
    assert not np.any(assign >= 6)


def test_hungarian_vl_match_prefers_close_boxes():
    from hipie_tpu.losses.matcher import hungarian_vl_match

    L = 8
    # 3 queries, 2 gts; query 0 overlaps gt 0, query 2 overlaps gt 1.
    prob = jnp.full((3, L), 0.5)
    pred = jnp.asarray([[0.2, 0.2, 0.2, 0.2], [0.5, 0.5, 0.1, 0.1],
                        [0.8, 0.8, 0.2, 0.2]], jnp.float32)
    gt = jnp.asarray([[0.2, 0.2, 0.2, 0.2], [0.8, 0.8, 0.2, 0.2]], jnp.float32)
    pm = jnp.asarray(np.eye(2, L, dtype=np.float32))
    assign = np.asarray(hungarian_vl_match(prob, pred, gt, pm,
                                           jnp.asarray([True, True])))
    assert assign[0] == 0 and assign[2] == 1 and assign[1] == -1


def test_mask_match_costs_embed_equals_dense():
    """The MaskDINO mask head is linear (mask = emb . F), so evaluating the
    matching costs from sampled features must equal materializing the dense
    (Q, H, W) masks first (same rng -> same points)."""
    from hipie_tpu.losses.matcher import mask_match_costs, mask_match_costs_embed

    rng = np.random.RandomState(3)
    q, c, h, w, n = 7, 12, 20, 24, 4
    emb = jnp.asarray(rng.randn(q, c).astype(np.float32))
    feats = jnp.asarray(rng.randn(h, w, c).astype(np.float32))
    gt = jnp.asarray((rng.rand(n, h, w) > 0.5).astype(np.float32))
    dense = jnp.einsum("qc,hwc->qhw", emb, feats)

    key = jax.random.PRNGKey(11)
    cd = mask_match_costs(key, dense, gt, num_points=512)
    ce = mask_match_costs_embed(key, emb, feats, gt, num_points=512)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(cd),
                               rtol=2e-4, atol=2e-4)
