"""Device mesh + sharding rules.

The reference's parallelism is data-parallel DDP over NCCL (SURVEY.md §2.5/2.6,
detectron2/engine/launch.py). The TPU-native replacement is a single SPMD program
over a ("data", "model") jax.sharding.Mesh:
  * gradients are psum'd by XLA over the data axis (replaces NCCL all-reduce),
  * tensor parallelism shards the big matmuls (ViT/BERT attention heads + MLP
    hidden, transformer FFN, VL-fusion projections) over the model axis,
  * activations follow from parameter shardings via XLA propagation; the encoder
    token axis can additionally be sharded over `model` for sequence parallelism
    (deformable attention is a pure gather, so no halo exchange is needed).

No process launcher is required: multi-host JAX init + these specs replace
launch.py/comm.py entirely.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(dp: int = -1, tp: int = 1,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("data", "model"))


# (regex over 'path/to/param', partition spec). Scanned stacks (nn.scan) carry a
# leading layer axis, hence the extra leading None in those specs.
_TP_RULES = [
    # ViT blocks (scanned runs): qkv/fc1 shard the output dim; proj/fc2 the input.
    (r".*backbone/run_\d+/block/attn/qkv/kernel", P(None, None, "model")),
    (r".*backbone/run_\d+/block/attn/qkv/bias", P(None, "model")),
    (r".*backbone/run_\d+/block/mlp_fc1/kernel", P(None, None, "model")),
    (r".*backbone/run_\d+/block/mlp_fc1/bias", P(None, "model")),
    (r".*backbone/run_\d+/block/attn/proj/kernel", P(None, "model", None)),
    (r".*backbone/run_\d+/block/mlp_fc2/kernel", P(None, "model", None)),
    # BERT (scanned layers): head-sharded attention + MLP.
    (r"text_encoder/layers/layer/attention/(query|key|value)/kernel",
     P(None, None, "model", None)),
    (r"text_encoder/layers/layer/attention/(query|key|value)/bias",
     P(None, "model", None)),
    (r"text_encoder/layers/layer/attention/output_dense/kernel",
     P(None, "model", None, None)),
    (r"text_encoder/layers/layer/intermediate/kernel", P(None, None, "model")),
    (r"text_encoder/layers/layer/intermediate/bias", P(None, "model")),
    (r"text_encoder/layers/layer/output/kernel", P(None, "model", None)),
    # main encoder (scanned): deformable FFN + VL bi-attention projections.
    (r".*/encoder/layer/linear1/kernel", P(None, None, "model")),
    (r".*/encoder/layer/linear1/bias", P(None, "model")),
    (r".*/encoder/layer/linear2/kernel", P(None, "model", None)),
    # unrolled VL-carrying encoder head layers (encoder_vl{i}: no leading
    # scan axis; reference NUM_VL_LAYERS=1 keeps VLFuse out of the scan tail).
    (r".*/encoder_vl\d+/layer/linear1/kernel", P(None, "model")),
    (r".*/encoder_vl\d+/layer/linear1/bias", P("model")),
    (r".*/encoder_vl\d+/layer/linear2/kernel", P("model", None)),
    (r".*/vl_layer/attn/(v_proj|l_proj|values_v_proj|values_l_proj)/kernel",
     P(None, "model", None)),
    (r".*/vl_layer/attn/(v_proj|l_proj|values_v_proj|values_l_proj)/bias",
     P("model", None)),
    (r".*/vl_layer/attn/(out_v_proj|out_l_proj)/kernel",
     P("model", None, None)),
    # unrolled decoder / maskdino FFNs.
    (r".*/(enc_layers|dec_layers)_\d+/linear1/kernel", P(None, "model")),
    (r".*/(enc_layers|dec_layers)_\d+/linear1/bias", P("model")),
    (r".*/(enc_layers|dec_layers)_\d+/linear2/kernel", P("model", None)),
    # maskdino pixel-decoder encoder (scanned: leading layer axis).
    (r".*/enc_layers/layer/linear1/kernel", P(None, None, "model")),
    (r".*/enc_layers/layer/linear1/bias", P(None, "model")),
    (r".*/enc_layers/layer/linear2/kernel", P(None, "model", None)),
]


def param_spec(path: str, shape: Tuple[int, ...], tp: int) -> P:
    """Partition spec for one parameter. Replicated unless a TP rule matches
    and the sharded dim divides by tp."""
    if tp <= 1:
        return P()
    for pattern, spec in _TP_RULES:
        if re.fullmatch(pattern, path):
            ok = True
            for dim, axis in zip(shape, spec):
                if axis == "model" and dim % tp != 0:
                    ok = False
            if ok and len(spec) == len(shape):
                return spec
    return P()


def shard_params(params, mesh: Mesh):
    """NamedSharding tree for a param pytree following the TP rules."""
    tp = mesh.shape["model"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    specs = {}
    for kp, leaf in flat:
        specs[path_str(kp)] = param_spec(path_str(kp), leaf.shape, tp)

    def to_sharding(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_sharding(mesh: Mesh):
    """Leading-axis data sharding for every batch leaf."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
