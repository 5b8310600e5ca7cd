"""bg_lang TRAINING pass: language-derived stuff queries + fixed matching.

reference: ddetrs_dn.py prepare_bg_queries_lan (:1109-1148) builds one query
per unique stuff class (pooled token embeddings from its first-occurrence
batch element) + random negatives, shared across the batch, supervised
against stuff GTs by class-identity matching with the bg pass weight
(:719-729).
"""

import numpy as np
import jax
import jax.numpy as jnp


def test_prepare_bg_lang_queries_semantics():
    from hipie_tpu.train.bg_lang import prepare_bg_lang_queries

    B, N, L, C, K = 2, 4, 12, 8, 6
    # element 0: stuff classes 3 (gt0, tokens 1-2) and 5 (gt1, token 4);
    #            thing class 2 (gt2); slot order of first occurrence: 3 then 5
    # element 1: stuff class 5 again (gt0, token 7) -> same slot as elt 0's 5
    labels = jnp.asarray([[3, 5, 2, 0], [5, 0, 0, 0]], jnp.int32)
    pm = np.zeros((B, N, L), np.float32)
    pm[0, 0, 1:3] = 1.0
    pm[0, 1, 4] = 1.0
    pm[0, 2, 6] = 1.0
    pm[1, 0, 7] = 1.0
    is_thing = jnp.asarray([[False, False, True, False],
                            [False, False, False, False]])
    valid = jnp.asarray([[True, True, True, False],
                         [True, False, False, False]])
    lang_mask = jnp.ones((B, L), jnp.int32)
    out = prepare_bg_lang_queries(
        jax.random.PRNGKey(0), labels, jnp.asarray(pm), is_thing, valid,
        lang_mask, C, K)
    w = np.asarray(out.weights)          # (K, B, L)
    a = np.asarray(out.assign)           # (B, K)

    # slot 0 = class 3, pooled evenly over tokens 1-2 of element 0
    np.testing.assert_allclose(w[0, 0, 1:3], 0.5)
    assert w[0, 1].sum() == 0 and w[0, 0].sum() == 1.0
    # slot 1 = class 5, token 4 of element 0 (first occurrence), NOT elt 1
    np.testing.assert_allclose(w[1, 0, 4], 1.0)
    assert w[1, 1].sum() == 0
    # remaining slots are single-token negatives on un-covered tokens
    covered = {(0, 1), (0, 2), (0, 4), (1, 7)}
    for k in range(2, K):
        nz = np.argwhere(w[k] > 0)
        assert nz.shape == (1, 2), f"slot {k} should be one negative token"
        assert tuple(nz[0]) not in covered
    # fixed matching: elt0 gt0 -> slot 0, gt1 -> slot 1; elt1 gt0 -> slot 1
    assert a[0, 0] == 0 and a[0, 1] == 1
    assert a[1, 1] == 0
    assert a[1, 0] == -1                      # class 3 absent in element 1
    assert (a[:, 2:] == -1).all()             # negatives unmatched
    # thing GT (class 2) must NOT claim a slot
    assert not (a[0] == 2).any()


def test_train_step_with_bg_lang_pass():
    """Train step with bg_query_from_lang: [dn | bg_lang | bg | fg] layout,
    4th pass replaces the Hungarian bg pass, loss finite, resizer gets grads."""
    from hipie_tpu.config import apply_overrides, tiny_test_config
    from hipie_tpu.losses.criterion import Targets
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.train.step import (TrainBatch, create_train_state,
                                      make_loss_fn, make_train_step)

    cfg = apply_overrides(tiny_test_config(), {
        "model.bg_query_from_lang": True,
        "model.transformer.num_bg_lang_queries": 5,
        "solver.warmup_iters": 0})
    model = HIPIEModel(cfg.model)
    rng = np.random.RandomState(0)
    b, H, W, L, G = 1, 64, 64, 16, 4
    t = Targets(
        labels=jnp.asarray([[1, 3, 0, 0]], jnp.int32),
        boxes=jnp.asarray(rng.uniform(0.3, 0.6, (b, G, 4)).astype(np.float32)),
        masks=jnp.asarray((rng.rand(b, G, 16, 16) > 0.5).astype(np.float32)),
        positive_map=jnp.asarray(np.eye(G, L, 1, dtype=np.float32)[None]),
        is_thing=jnp.asarray([[True, False, True, True]]),   # gt1 is stuff
        valid=jnp.asarray([[True, True, False, False]]),
    )
    batch = TrainBatch(
        images=jnp.asarray(rng.rand(b, H, W, 3).astype(np.float32) * 255),
        pad_mask=jnp.zeros((b, H, W), bool),
        input_ids=jnp.arange(L)[None].astype(jnp.int32) % 16,
        lang_mask=jnp.ones((b, L), jnp.int32),
        image_sizes=jnp.asarray([[H, W]], jnp.int32),
        targets=t)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg, tx)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))

    # the resizer (which embeds the bg_lang queries) must receive gradients
    # (state was donated to the step; use the updated params)
    loss_fn = make_loss_fn(model, cfg)
    g = jax.grad(lambda p: loss_fn(p, batch, jax.random.PRNGKey(1))[0])(
        state2.params)
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    resizer_norms = [float(jnp.abs(v).sum()) for path, v in flat
                     if "resizer" in jax.tree_util.keystr(path)]
    assert resizer_norms and any(n > 0 for n in resizer_norms)
