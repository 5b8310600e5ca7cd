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
            "backbone": {"stem_conv1": {"kernel": jnp.ones(1)}},
            "transformer": {
                "encoder": {"vl_layers_0": {"gamma_v": jnp.ones(1)},
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
    assert p["detr"]["backbone"]["stem_conv1"]["kernel"] == "backbone"
    assert p["detr"]["transformer"]["encoder"]["layer"]["self_attn"][
        "sampling_offsets"]["kernel"] == "offsets"
    assert p["detr"]["transformer"]["bg_query_refs"] == "offsets"
    assert p["detr"]["controller"]["layers_0"]["kernel"] == "base"


def test_lr_schedule_warmup_and_decay():
    from hipie_tpu.config import SolverConfig
    from hipie_tpu.train.optimizer import lr_schedule

    cfg = SolverConfig(base_lr=1.0, warmup_iters=100, lr_decay_steps=(1000,),
                       lr_decay_gamma=0.1)
    fn = lr_schedule(cfg, 1.0)
    assert float(fn(0)) == 0.0
    assert abs(float(fn(50)) - 0.5) < 1e-6
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
