"""Training infrastructure tests: checkpoint roundtrip, optimizer param groups,
LR schedule, events storage, mesh sharding rules."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_checkpoint_roundtrip(tmp_path):
    from hipie_tpu.train.checkpoint import (latest_checkpoint,
                                            restore_checkpoint, save_checkpoint)
    from hipie_tpu.train.step import TrainState

    params = {"a": jnp.arange(4.0), "b": {"w": jnp.ones((2, 3))}}
    opt = {"count": jnp.zeros(())}
    state = TrainState(params, opt, jnp.asarray(7))
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, state, 7)
    assert latest_checkpoint(d).endswith("model_0000007")
    state2 = restore_checkpoint(latest_checkpoint(d), TrainState(
        jax.tree.map(jnp.zeros_like, params),
        jax.tree.map(jnp.zeros_like, opt), jnp.asarray(0)))
    np.testing.assert_array_equal(np.asarray(state2.params["a"]),
                                  np.asarray(params["a"]))
    assert int(state2.step) == 7


def test_param_group_labels():
    from hipie_tpu.train.optimizer import param_labels

    params = {"params": {
        "text_encoder": {"layers": {"kernel": jnp.ones(1)}},
        "detr": {
            "backbone": {
                # stem + res2 are frozen (FREEZE_AT=2); res3 trains at 0.1x
                "stem_conv1": {"kernel": jnp.ones(1)},
                "res2_0": {"conv1": {"kernel": jnp.ones(1)}},
                "res3_0": {
                    "conv1": {"kernel": jnp.ones(1)},
                    # FrozenBN buffers: frozen everywhere
                    "conv1_norm": {"weight": jnp.ones(1), "bias": jnp.ones(1),
                                   "running_mean": jnp.ones(1),
                                   "running_var": jnp.ones(1)},
                },
            },
            "transformer": {
                "encoder": {"vl_layer": {"gamma_v": jnp.ones(1)},
                            "layer": {"self_attn": {"sampling_offsets": {
                                "kernel": jnp.ones(1)}}}},
                "bg_query_refs": jnp.ones(1),
            },
            "controller": {"layers_0": {"kernel": jnp.ones(1)}},
        },
    }}
    labels = param_labels(params)
    p = labels["params"]
    assert p["text_encoder"]["layers"]["kernel"] == "lang"
    assert p["detr"]["backbone"]["stem_conv1"]["kernel"] == "frozen"
    assert p["detr"]["backbone"]["res2_0"]["conv1"]["kernel"] == "frozen"
    assert p["detr"]["backbone"]["res3_0"]["conv1"]["kernel"] == "backbone"
    bn = p["detr"]["backbone"]["res3_0"]["conv1_norm"]
    assert all(v == "frozen" for v in bn.values())
    assert p["detr"]["transformer"]["encoder"]["vl_layer"]["gamma_v"] == "vl"
    assert p["detr"]["transformer"]["encoder"]["layer"]["self_attn"][
        "sampling_offsets"]["kernel"] == "offsets"
    assert p["detr"]["transformer"]["bg_query_refs"] == "offsets"
    assert p["detr"]["controller"]["layers_0"]["kernel"] == "base"


def test_param_groups_cover_real_tree():
    """Every optimizer group labels >= 1 param in the real model tree, and
    frozen params receive zero updates (ADVICE r1)."""
    import numpy as np
    from hipie_tpu.config import apply_overrides, tiny_test_config
    from hipie_tpu.train.optimizer import build_optimizer, param_labels
    from hipie_tpu.models.hipie import HIPIEModel

    # warmup_iters=0 so step-0 updates are nonzero for trainable params
    cfg = apply_overrides(tiny_test_config(), {"solver.warmup_iters": 0})
    model = HIPIEModel(cfg.model)
    img = jnp.zeros((1, 64, 64, 3))
    pad = jnp.zeros((1, 64, 64), bool)
    L = cfg.model.text.max_query_len
    ids = jnp.ones((1, L), jnp.int32)
    am = jnp.ones((1, L), jnp.int32)
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, pad, ids, am, sizes)

    labels = param_labels(params)
    found = set(jax.tree_util.tree_leaves(labels))
    # tiny backbone has no resnet -> no frozen/backbone... use label presence
    # of the groups that must exist in every config:
    for grp in ["base", "lang", "vl", "offsets"]:
        assert grp in found, f"group {grp} labels no parameter"

    tx = build_optimizer(cfg.solver, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # vl / offsets params got nonzero updates
    flat_u = dict(jax.tree_util.tree_flatten_with_path(updates)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(labels)[0])
    for k, lbl in flat_l.items():
        u = np.asarray(flat_u[k])
        if lbl == "frozen":
            assert np.all(u == 0), k
        else:
            assert np.any(u != 0), k


def test_lr_schedule_warmup_and_decay():
    from hipie_tpu.config import SolverConfig
    from hipie_tpu.train.optimizer import lr_schedule

    cfg = SolverConfig(base_lr=1.0, warmup_iters=100, lr_decay_steps=(1000,),
                       lr_decay_gamma=0.1)
    fn = lr_schedule(cfg, 1.0)
    # warmup starts at warmup_factor=1e-3 like d2's WarmupMultiStepLR, never 0
    assert abs(float(fn(0)) - 1e-3) < 1e-9
    assert abs(float(fn(50)) - 0.5005) < 1e-6
    assert abs(float(fn(500)) - 1.0) < 1e-6
    assert abs(float(fn(1500)) - 0.1) < 1e-6


def test_event_storage(tmp_path):
    from hipie_tpu.utils.events import EventStorage

    st = EventStorage(str(tmp_path))
    for i in range(5):
        st.put_scalars(loss=float(i), total_loss=float(i * 2))
        st.tick()
        st.write_json()
    assert st.median("loss") == 2.0
    lines = open(os.path.join(str(tmp_path), "metrics.json")).read().splitlines()
    assert len(lines) == 5


def test_param_sharding_rules():
    from jax.sharding import PartitionSpec as P
    from hipie_tpu.parallel.mesh import param_spec

    assert param_spec("detr/backbone/run_12/block/attn/qkv/kernel",
                      (20, 64, 192), 2) == P(None, None, "model")
    assert param_spec("text_encoder/layers/layer/intermediate/kernel",
                      (12, 32, 64), 2) == P(None, None, "model")
    assert param_spec("detr/transformer/encoder/layer/linear1/kernel",
                      (6, 256, 1024), 2) == P(None, None, "model")
    assert param_spec("detr/transformer/dec_layers_0/linear1/kernel",
                      (256, 1024), 2) == P(None, "model")
    # non-divisible dims stay replicated
    assert param_spec("detr/backbone/run_12/block/attn/qkv/kernel",
                      (20, 64, 193), 2) == P()
    assert param_spec("anything/else/kernel", (8, 8), 2) == P()


def test_train_step_without_dn():
    """Non-DN variant (reference DDETRSegmUni, USE_DINO=False): the train step
    runs with dn.enabled=False — no dn slots, fg/bg passes only."""
    from hipie_tpu.config import apply_overrides, tiny_test_config
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.train.step import TrainBatch, create_train_state, make_train_step

    cfg = apply_overrides(tiny_test_config(), {
        "model.dn.enabled": False, "solver.warmup_iters": 0})
    model = HIPIEModel(cfg.model)
    rng = np.random.RandomState(0)
    b, H, W, L, G = 1, 64, 64, 16, 4
    from hipie_tpu.losses.criterion import Targets
    t = Targets(
        labels=jnp.zeros((b, G), jnp.int32),
        boxes=jnp.asarray(rng.uniform(0.3, 0.6, (b, G, 4)).astype(np.float32)),
        masks=jnp.asarray((rng.rand(b, G, 16, 16) > 0.5).astype(np.float32)),
        positive_map=jnp.asarray(np.eye(G, L, 1, dtype=np.float32)[None]),
        is_thing=jnp.ones((b, G), bool),
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


def test_shard_tokens_sequence_parallel():
    """model.transformer.shard_tokens partitions the encoder token axis over
    the mesh 'model' axis (SP; SURVEY §2.5 image analog). Checks the
    constraint binds under a dp x tp mesh and the forward stays numerically
    identical to the unsharded run."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from hipie_tpu.config import apply_overrides, tiny_test_config
    from hipie_tpu.models.hipie import HIPIEModel

    if jax.device_count() < 4:
        import pytest
        pytest.skip("needs >=4 devices")

    cfg = tiny_test_config()
    cfg = apply_overrides(cfg, {"model.transformer.dim_feedforward": 64})
    cfg_sp = apply_overrides(cfg, {"model.transformer.shard_tokens": True})
    L = cfg.data.max_text_len
    args = (jnp.full((1, 64, 64, 3), 96.0), jnp.zeros((1, 64, 64), bool),
            jnp.full((1, L), 7, jnp.int32), jnp.ones((1, L), jnp.int32),
            jnp.asarray([[64, 64]]))

    model = HIPIEModel(cfg.model)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    base = jax.jit(model.apply)(params, *args)

    model_sp = HIPIEModel(cfg_sp.model)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "model"))
    with jax.set_mesh(mesh):
        out = jax.jit(model_sp.apply)(params, *args)
        np.testing.assert_allclose(
            np.asarray(out["pred_logits"], np.float32),
            np.asarray(base["pred_logits"], np.float32), rtol=2e-2, atol=2e-2)


def test_best_checkpointer_distinct_path(tmp_path):
    """Best and periodic checkpoints must not collide: saving model_best at an
    iteration that also writes model_{it} crashed orbax (code-review r2);
    re-saving model_best on a later improvement must also succeed, and the
    last_checkpoint marker must not point at model_best."""
    import numpy as np
    import jax.numpy as jnp

    from hipie_tpu.train.checkpoint import latest_checkpoint, save_checkpoint
    from hipie_tpu.train.step import TrainState

    state = TrainState(params={"w": jnp.ones((2, 2))}, opt_state=None, step=0)
    d = str(tmp_path)
    save_checkpoint(d, state, 100)
    save_checkpoint(d, state, 100, name="model_best", update_marker=False)
    # improvement at a later iter: overwrite model_best in place
    save_checkpoint(d, state, 200, name="model_best", update_marker=False)
    assert latest_checkpoint(d).endswith("model_0000100")
    import os
    assert os.path.isdir(os.path.join(d, "model_best"))


def test_cdn_dynamic_groups():
    """CDN must derive its group count from the batch's ACTUAL max GT count,
    not the static padding (reference prepare_for_cdn: an image with 3 objects
    and dn_number=20 gets 2*20//(2*3)=6 groups = 36 active dn queries, not
    one group of 2*3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipie_tpu.models.dn import prepare_cdn

    b, n_pad = 2, 50
    labels = jnp.zeros((b, n_pad), jnp.int32)
    boxes = jnp.full((b, n_pad, 4), 0.5)
    valid = jnp.asarray(np.arange(n_pad)[None] < np.array([[3], [2]]))
    cdn = prepare_cdn(jax.random.PRNGKey(0), labels, boxes, valid,
                      num_classes=5, num_matching_queries=10, dn_number=20)
    # static budget 2*max(dn_number, N_pad): widened so a batch whose actual
    # max GT count exceeds dn_number still lays out full sections (advisor r1)
    assert cdn.pad_size == 100
    # m=3 -> 6 groups x 2 sections x 3 slots = 36 active layout slots;
    # image 0 (3 valid GTs) activates all 36, image 1 (2 valid) 24 of them.
    n_act = np.asarray(cdn.slot_valid).sum(axis=1)
    assert n_act[0] == 36 and n_act[1] == 24, n_act
    # every active slot supervises the gt it was built from
    ga = np.asarray(cdn.gt_assign)
    assert set(ga[0][ga[0] >= 0]) == {0, 1, 2}
    assert set(ga[1][ga[1] >= 0]) == {0, 1}
    # groups only attend within themselves
    mask = np.asarray(cdn.attn_mask)
    assert mask[0, 6]      # slot 0 (group 0) cannot see slot 6 (group 1)
    assert not mask[0, 5]  # ... but sees its own group's slots
    assert mask[cdn.pad_size, 0]   # matching queries never see dn


def test_cdn_max_gt_exceeds_dn_number():
    """m > dn_number: a single group still needs 2*m slots — the pos AND neg
    section of every GT must be laid out (advisor r1: the old 2*dn_number
    budget silently truncated the negative section)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipie_tpu.models.dn import prepare_cdn

    b, n_pad, m = 1, 12, 9
    labels = jnp.zeros((b, n_pad), jnp.int32)
    boxes = jnp.full((b, n_pad, 4), 0.5)
    valid = jnp.asarray(np.arange(n_pad)[None] < m)
    cdn = prepare_cdn(jax.random.PRNGKey(0), labels, boxes, valid,
                      num_classes=5, num_matching_queries=10, dn_number=4)
    assert cdn.pad_size == 2 * n_pad
    # one group, two sections of width m: 2*m active slots, every GT twice
    assert int(np.asarray(cdn.slot_valid).sum()) == 2 * m
    ga = np.asarray(cdn.gt_assign)[0]
    counts = np.bincount(ga[ga >= 0], minlength=m)
    assert (counts[:m] == 2).all(), counts


def test_criterion_mask_embeds_equals_dense():
    """criterion_pass with 'mask_embeds'+pixel_feats (the MaskDINO train path,
    dense logits never materialized for all Q) must reproduce the dense
    'masks' path: same rng -> identical matching costs/assignments and
    loss values up to float reassociation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hipie_tpu.config import LossConfig
    from hipie_tpu.losses.criterion import Targets, criterion_pass

    rng = np.random.RandomState(7)
    L, B, Q, C, H, W, N, Ltxt = 2, 2, 10, 16, 16, 16, 3, 8
    embeds = jnp.asarray(rng.randn(L, B, Q, C).astype(np.float32))
    feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32) * 0.3)
    classes = jnp.asarray(rng.randn(L, B, Q, Ltxt).astype(np.float32))
    boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(L, B, Q, 4).astype(np.float32)))
    dense = jnp.einsum("lbqc,bhwc->lbqhw", embeds, feats)

    pm = np.zeros((B, N, Ltxt), np.float32)
    pm[:, np.arange(N), np.arange(N)] = 1.0
    t = Targets(
        labels=jnp.zeros((B, N), jnp.int32),
        boxes=jnp.asarray(np.concatenate(
            [rng.rand(B, N, 2) * 0.6 + 0.2, rng.rand(B, N, 2) * 0.2 + 0.05],
            -1).astype(np.float32)),
        masks=jnp.asarray((rng.rand(B, N, H, W) > 0.5).astype(np.float32)),
        positive_map=jnp.asarray(pm),
        is_thing=jnp.ones((B, N), bool),
        valid=jnp.ones((B, N), bool))

    cfg = LossConfig(num_points=256, oversample_ratio=3.0,
                     importance_sample_ratio=0.75)
    common = dict(
        targets=t, text_mask=jnp.ones((B, Ltxt), jnp.int32),
        mask_feats=jnp.zeros((B, 4, 4, 8)), image_sizes=jnp.asarray([[H, W]] * B),
        cfg=cfg, weight_nums=[8], bias_nums=[1], matcher="hungarian",
        max_matched=6)
    key = jax.random.PRNGKey(5)
    out_dense = criterion_pass(
        key, {"classes": classes, "boxes": boxes, "masks": dense}, **common)
    out_embed = criterion_pass(
        key, {"classes": classes, "boxes": boxes, "mask_embeds": embeds},
        pixel_feats=feats, **common)

    assert set(out_dense) == set(out_embed)
    for k in out_dense:
        np.testing.assert_allclose(
            np.asarray(out_embed[k]), np.asarray(out_dense[k]),
            rtol=3e-4, atol=3e-4, err_msg=k)


def test_compile_cache_key_isolates_xla_configs(monkeypatch):
    """Round-3 regression: XLA:CPU AOT results compiled under different
    XLA_FLAGS (e.g. the platform sitecustomize's +prefer-no-gather) or a
    different jaxlib must land in different cache subdirs — a shared dir
    loaded cross-config entries with 'could lead to SIGILL' warnings."""
    from hipie_tpu.utils.compile_cache import _host_cpu_key

    monkeypatch.delenv("XLA_FLAGS", raising=False)
    a = _host_cpu_key()
    assert a == _host_cpu_key()  # deterministic
    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_foo=1")
    b = _host_cpu_key()
    assert a != b


def test_compile_cache_isolates_cpu_set_via_jax_config(monkeypatch, tmp_path):
    """Round-3 regression (VERDICT Weak #1): the CPU-entry isolation must fire
    when the platform is selected via jax.config.update("jax_platforms","cpu")
    even while the env var says something else (this environment exports
    JAX_PLATFORMS=axon; the dryrun switches platform through jax.config).
    The conftest already ran jax.config.update("jax_platforms", "cpu")."""
    import jax

    from hipie_tpu.utils.compile_cache import enable_compilation_cache

    monkeypatch.setenv("JAX_PLATFORMS", "axon")  # the hole: env var non-cpu
    old = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(str(tmp_path / "cache"))
        d = jax.config.jax_compilation_cache_dir
        assert d is not None and "/cpu-" in d, d
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_optimizer_mu_dtype_bf16():
    """solver.mu_dtype=bfloat16 stores the Adam first moment in bf16 (the
    single-chip ViT-H fit knob) while updates and params stay f32."""
    import jax
    import jax.numpy as jnp

    from hipie_tpu.config import apply_overrides, tiny_test_config
    from hipie_tpu.train.optimizer import build_optimizer

    cfg = apply_overrides(tiny_test_config(), {"solver.mu_dtype": "bfloat16"})
    params = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}}
    tx = build_optimizer(cfg.solver, params)
    st = tx.init(params)
    dtypes = {str(x.dtype) for x in jax.tree_util.tree_leaves(st)
              if hasattr(x, "dtype") and x.ndim > 0}
    assert "bfloat16" in dtypes and "float32" in dtypes
    g = jax.tree.map(jnp.ones_like, params)
    upd, _ = tx.update(g, st, params)
    assert jax.tree_util.tree_leaves(upd)[0].dtype == jnp.float32


def test_loss_labels_vl_binary_targets():
    """The focal target must be the BINARY token map even when
    Targets.positive_map carries row-normalized rows (reference binarizes at
    coco_dataset_mapper_uni.py:395 before the criterion consumes it;
    deformable_detr.py:370-376). Training against the normalized 1/n rows is
    minimized by a flat p=1/n on every class's tokens — the round-4
    class-collapse (TRAINLOG.md)."""
    from hipie_tpu.losses.criterion import Targets, loss_labels_vl

    b, q, L, G = 1, 3, 8, 2
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, q, L).astype(np.float32))
    # class 0 spans tokens {1,2,3} (normalized 1/3 rows), class 1 token {5}
    pm_norm = np.zeros((b, G, L), np.float32)
    pm_norm[0, 0, 1:4] = 1 / 3
    pm_norm[0, 1, 5] = 1.0
    t = Targets(
        labels=jnp.zeros((b, G), jnp.int32),
        boxes=jnp.zeros((b, G, 4)),
        masks=jnp.zeros((b, G, 4, 4)),
        positive_map=jnp.asarray(pm_norm),
        is_thing=jnp.ones((b, G), bool),
        valid=jnp.ones((b, G), bool))
    assign = jnp.asarray([[0, 1, -1]], jnp.int32)
    text_mask = jnp.ones((b, L), jnp.int32)
    got = float(loss_labels_vl(logits, assign, t, text_mask, num_boxes=2.0))

    # independent numpy focal with BINARY targets
    tgt = np.zeros((b, q, L), np.float32)
    tgt[0, 0] = (pm_norm[0, 0] > 0)
    tgt[0, 1] = (pm_norm[0, 1] > 0)
    x = np.asarray(logits)
    p = 1 / (1 + np.exp(-x))
    ce = np.maximum(x, 0) - x * tgt + np.log1p(np.exp(-np.abs(x)))
    p_t = p * tgt + (1 - p) * (1 - tgt)
    want = (0.25 * tgt + 0.75 * (1 - tgt)) * ce * (1 - p_t) ** 2
    np.testing.assert_allclose(got, want.sum() / 2.0, rtol=1e-5)
