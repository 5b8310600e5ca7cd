"""PyTorch-checkpoint -> flax-params converter.

The single most important parity tool (SURVEY.md §7.1): maps reference
state_dicts (HIPIE .pth, HF bert-base-uncased, torchvision/d2 ResNet) onto the
hipie_tpu parameter tree. All conversions are pure name/layout maps:

  * torch Linear weight (out, in)        -> flax Dense kernel (in, out)           [T]
  * torch Conv2d weight (out, in, kh, kw)-> flax Conv kernel (kh, kw, in, out)
  * torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose (kh, kw, in, out)
  * torch MultiheadAttention in_proj (3C, C) -> split q/k/v DenseGeneral kernels
  * BatchNorm/LayerNorm/Embedding copy through (embedding (V, C) unchanged).

Conversion entry points return plain nested dicts matching module param trees;
`flax.core.freeze` is applied by callers if needed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np


def t_linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_dense_general(sd: Dict[str, Any], prefix: str, heads: int) -> Dict[str, np.ndarray]:
    """torch Linear (H*D, C) -> DenseGeneral kernel (C, H, D)."""
    w = np.asarray(sd[f"{prefix}.weight"])           # (H*D, C)
    hd = w.shape[0] // heads
    out = {"kernel": w.T.reshape(w.shape[1], heads, hd)}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"]).reshape(heads, hd)
    return out


def t_dense_general_out(sd: Dict[str, Any], prefix: str, heads: int) -> Dict[str, np.ndarray]:
    """torch Linear (C, H*D) out-proj -> DenseGeneral axis=(-2,-1) kernel (H, D, C)."""
    w = np.asarray(sd[f"{prefix}.weight"])           # (C, H*D)
    hd = w.shape[1] // heads
    out = {"kernel": w.T.reshape(heads, hd, w.shape[0])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_conv(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_conv_transpose(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    # torch: (in, out, kh, kw); flax ConvTranspose kernel: (kh, kw, in, out).
    # flax (transpose_kernel=False) correlates with the kernel while torch's
    # ConvTranspose2d convolves (gradient-of-conv): spatial dims must be
    # flipped (verified numerically vs torch, tests/test_converter_roundtrip).
    w = np.transpose(np.asarray(sd[f"{prefix}.weight"]), (2, 3, 0, 1))
    out = {"kernel": w[::-1, ::-1].copy()}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def t_norm(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def t_frozen_bn(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "weight": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "running_mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "running_var": np.asarray(sd[f"{prefix}.running_var"]),
    }


def t_embed(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"embedding": np.asarray(sd[f"{prefix}.weight"])}


def t_mha(sd: Dict[str, Any], prefix: str, heads: int) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> hipie_tpu layers.MultiHeadAttention."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])   # (3C, C)
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    c = w.shape[1]
    hd = c // heads
    parts = {}
    for i, name in enumerate(["q_proj", "k_proj", "v_proj"]):
        wi = w[i * c:(i + 1) * c]                     # (C, C)
        bi = b[i * c:(i + 1) * c]
        parts[name] = {"kernel": wi.T.reshape(c, heads, hd),
                       "bias": bi.reshape(heads, hd)}
    wo = np.asarray(sd[f"{prefix}.out_proj.weight"])  # (C, C)
    parts["out_proj"] = {"kernel": wo.T.reshape(heads, hd, c),
                         "bias": np.asarray(sd[f"{prefix}.out_proj.bias"])}
    return parts


def t_mlp(sd: Dict[str, Any], prefix: str, num_layers: int) -> Dict[str, Any]:
    """torch MLP with .layers.N Linear children -> layers.MLP."""
    return {f"layers_{i}": t_linear(sd, f"{prefix}.layers.{i}")
            for i in range(num_layers)}


# ---------------------------------------------------------------------------
# component converters
# ---------------------------------------------------------------------------

def convert_hf_bert(sd: Dict[str, Any], num_layers: int = 12,
                    heads: int = 12, prefix: str = "") -> Dict[str, Any]:
    """HF transformers BertModel state_dict -> hipie_tpu BertModel params."""
    p = prefix
    out: Dict[str, Any] = {
        "word_embeddings": t_embed(sd, f"{p}embeddings.word_embeddings"),
        "position_embeddings": t_embed(sd, f"{p}embeddings.position_embeddings"),
        "token_type_embeddings": t_embed(sd, f"{p}embeddings.token_type_embeddings"),
        "embeddings_norm": t_norm(sd, f"{p}embeddings.LayerNorm"),
    }
    per_layer = []
    for i in range(num_layers):
        lp = f"{p}encoder.layer.{i}"
        per_layer.append({
            "attention": {
                "query": t_dense_general(sd, f"{lp}.attention.self.query", heads),
                "key": t_dense_general(sd, f"{lp}.attention.self.key", heads),
                "value": t_dense_general(sd, f"{lp}.attention.self.value", heads),
                "output_dense": t_dense_general_out(
                    sd, f"{lp}.attention.output.dense", heads),
            },
            "attention_norm": t_norm(sd, f"{lp}.attention.output.LayerNorm"),
            "intermediate": t_linear(sd, f"{lp}.intermediate.dense"),
            "output": t_linear(sd, f"{lp}.output.dense"),
            "output_norm": t_norm(sd, f"{lp}.output.LayerNorm"),
        })
    # layers are nn.scan'ed: stack per-layer leaves on axis 0.
    out["layers"] = {"layer": stack_trees(per_layer)}
    return out


def stack_trees(trees):
    """Stack a list of identical nested dicts leaf-wise on a new axis 0."""
    first = trees[0]
    if isinstance(first, dict):
        return {k: stack_trees([t[k] for t in trees]) for k in first}
    return np.stack(trees)


def convert_d2_resnet(sd: Dict[str, Any], depth: int = 50,
                      prefix: str = "") -> Dict[str, Any]:
    """detectron2 ResNet (backbone.0.backbone.*) -> hipie_tpu ResNet params."""
    blocks_per_stage = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
    p = prefix
    out: Dict[str, Any] = {
        "stem_conv1": t_conv(sd, f"{p}stem.conv1"),
        "stem_conv1_norm": t_frozen_bn(sd, f"{p}stem.conv1.norm"),
    }
    for s, nblocks in enumerate(blocks_per_stage):
        stage = f"res{s + 2}"
        for i in range(nblocks):
            bp = f"{p}{stage}.{i}"
            blk = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = t_conv(sd, f"{bp}.conv{ci}")
                blk[f"conv{ci}_norm"] = t_frozen_bn(sd, f"{bp}.conv{ci}.norm")
            if f"{bp}.shortcut.weight" in sd:
                blk["shortcut"] = t_conv(sd, f"{bp}.shortcut")
                blk["shortcut_norm"] = t_frozen_bn(sd, f"{bp}.shortcut.norm")
            out[f"{stage}_{i}"] = blk
    return out


def convert_vit(sd: Dict[str, Any], depth: int, prefix: str = "",
                window_block_indexes: Sequence[int] = (0, 1, 3, 4, 6, 7, 9, 10),
                window_size: int = 14) -> Dict[str, Any]:
    """ViTDet backbone state_dict -> hipie_tpu ViTDet params.

    Blocks are grouped into nn.scan'ed same-window-size runs (run_{start}/block),
    so per-run leaves stack along axis 0 — mirror that grouping here."""
    p = prefix
    out: Dict[str, Any] = {
        "patch_embed": t_conv(sd, f"{p}patch_embed.proj"),
        "pos_embed": np.asarray(sd[f"{p}pos_embed"]),
        "fpn1": t_conv_transpose(sd, f"{p}fpn1.0"),
    }

    def block(i):
        bp = f"{p}blocks.{i}"
        blk = {
            "norm1": t_norm(sd, f"{bp}.norm1"),
            "norm2": t_norm(sd, f"{bp}.norm2"),
            "attn": {
                "qkv": t_linear(sd, f"{bp}.attn.qkv"),
                "proj": t_linear(sd, f"{bp}.attn.proj"),
            },
            "mlp_fc1": t_linear(sd, f"{bp}.mlp.fc1"),
            "mlp_fc2": t_linear(sd, f"{bp}.mlp.fc2"),
        }
        if f"{bp}.attn.rel_pos_h" in sd:
            blk["attn"]["rel_pos_h"] = np.asarray(sd[f"{bp}.attn.rel_pos_h"])
            blk["attn"]["rel_pos_w"] = np.asarray(sd[f"{bp}.attn.rel_pos_w"])
        return blk

    i = 0
    while i < depth:
        ws = window_size if i in window_block_indexes else 0
        j = i
        while j < depth and (window_size if j in window_block_indexes else 0) == ws:
            j += 1
        out[f"run_{i}"] = {"block": stack_trees([block(k) for k in range(i, j)])}
        i = j
    return out


def convert_swin(sd: Dict[str, Any], depths: Sequence[int] = (2, 2, 6, 2),
                 prefix: str = "") -> Dict[str, Any]:
    """Swin state dict (timm/d2 naming: patch_embed.proj/.norm,
    layers.{s}.blocks.{i}.*, layers.{s}.downsample.{norm,reduction}, norm{s})
    -> hipie_tpu SwinTransformer param tree.

    Patch-merging order differs: torch concatenates [x(0,0), x(1,0), x(0,1),
    x(1,1)] while our reshape produces [(0,0), (0,1), (1,0), (1,1)], so the
    merge norm/reduction input channels are permuted with [0, 2, 1, 3].
    reference: hipie/backbone/swin.py PatchMerging.
    """
    out: Dict[str, Any] = {
        "patch_embed": t_conv(sd, f"{prefix}patch_embed.proj"),
        "patch_norm": t_norm(sd, f"{prefix}patch_embed.norm"),
    }
    perm = [0, 2, 1, 3]
    for s, depth in enumerate(depths):
        for i in range(depth):
            p = f"{prefix}layers.{s}.blocks.{i}"
            out[f"stage{s}_block{i}"] = {
                "norm1": t_norm(sd, f"{p}.norm1"),
                "norm2": t_norm(sd, f"{p}.norm2"),
                "attn": {
                    "qkv": t_linear(sd, f"{p}.attn.qkv"),
                    "proj": t_linear(sd, f"{p}.attn.proj"),
                    "relative_position_bias_table": np.asarray(
                        sd[f"{p}.attn.relative_position_bias_table"]),
                },
                "mlp_fc1": t_linear(sd, f"{p}.mlp.fc1"),
                "mlp_fc2": t_linear(sd, f"{p}.mlp.fc2"),
            }
        dkey = f"{prefix}layers.{s}.downsample.reduction.weight"
        if dkey in sd:
            nw = t_norm(sd, f"{prefix}layers.{s}.downsample.norm")
            c = nw["scale"].shape[0] // 4

            def pvec(v):
                return np.concatenate([v[k * c:(k + 1) * c] for k in perm])

            out[f"merge_norm{s}"] = {"scale": pvec(nw["scale"]),
                                     "bias": pvec(nw["bias"])}
            red = t_linear(sd, f"{prefix}layers.{s}.downsample.reduction")
            out[f"merge_reduce{s}"] = {"kernel": np.concatenate(
                [red["kernel"][k * c:(k + 1) * c] for k in perm], axis=0)}
    for s in range(len(depths)):
        if f"{prefix}norm{s}.weight" in sd:
            out[f"out_norm{s}"] = t_norm(sd, f"{prefix}norm{s}")
    return out


def convert_convnext(sd: Dict[str, Any], depths: Sequence[int] = (3, 3, 9, 3),
                     prefix: str = "") -> Dict[str, Any]:
    """ConvNeXt state dict (facebook naming: downsample_layers.{s}.{0,1},
    stages.{s}.{i}.{dwconv,norm,pwconv1,pwconv2,gamma}, norm{s}) ->
    hipie_tpu ConvNeXt param tree. reference: hipie/backbone/convnext.py:60-264."""
    out: Dict[str, Any] = {
        "stem_conv": t_conv(sd, f"{prefix}downsample_layers.0.0"),
        "stem_norm": t_norm(sd, f"{prefix}downsample_layers.0.1"),
    }
    for s in range(1, len(depths)):
        out[f"down_norm{s}"] = t_norm(sd, f"{prefix}downsample_layers.{s}.0")
        out[f"down_conv{s}"] = t_conv(sd, f"{prefix}downsample_layers.{s}.1")
    for s, depth in enumerate(depths):
        for i in range(depth):
            p = f"{prefix}stages.{s}.{i}"
            out[f"stage{s}_block{i}"] = {
                "dwconv": t_conv(sd, f"{p}.dwconv"),   # (C,1,7,7)->(7,7,1,C)
                "norm": t_norm(sd, f"{p}.norm"),
                "pwconv1": t_linear(sd, f"{p}.pwconv1"),
                "pwconv2": t_linear(sd, f"{p}.pwconv2"),
                "gamma": np.asarray(sd[f"{p}.gamma"]),
            }
    for s in range(len(depths)):
        if f"{prefix}norm{s}.weight" in sd:
            out[f"out_norm{s}"] = t_norm(sd, f"{prefix}norm{s}")
    return out


def _clip_block(sd: Dict[str, Any], prefix: str, heads: int) -> Dict[str, Any]:
    return {
        "ln_1": t_norm(sd, f"{prefix}.ln_1"),
        "attn": t_mha(sd, f"{prefix}.attn", heads),
        "ln_2": t_norm(sd, f"{prefix}.ln_2"),
        "mlp_fc": t_linear(sd, f"{prefix}.mlp.c_fc"),
        "mlp_proj": t_linear(sd, f"{prefix}.mlp.c_proj"),
    }


def convert_clip(sd: Dict[str, Any], visual_layers: int = 24,
                 visual_heads: int = 16, text_layers: int = 12,
                 text_heads: int = 12) -> Dict[str, Any]:
    """open_clip / openai-CLIP state dict -> {visual: ..., text: ..., logit_scale}.

    Key layout (open_clip ViT-L-14-336): visual.conv1 / class_embedding /
    positional_embedding / ln_pre / transformer.resblocks.N.* / ln_post / proj;
    text side token_embedding / positional_embedding / transformer.resblocks.N
    / ln_final / text_projection; scalar logit_scale.
    Matches hipie_tpu/models/clip.py CLIPVisual / CLIPText param trees.
    """
    visual = {
        "conv1": t_conv(sd, "visual.conv1"),
        "class_embedding": np.asarray(sd["visual.class_embedding"]),
        "positional_embedding": np.asarray(sd["visual.positional_embedding"]),
        "ln_pre": t_norm(sd, "visual.ln_pre"),
        "ln_post": t_norm(sd, "visual.ln_post"),
        "proj": np.asarray(sd["visual.proj"]),
    }
    for i in range(visual_layers):
        visual[f"blocks_{i}"] = _clip_block(
            sd, f"visual.transformer.resblocks.{i}", visual_heads)
    text = {
        "token_embedding": t_embed(sd, "token_embedding"),
        "positional_embedding": np.asarray(sd["positional_embedding"]),
        "ln_final": t_norm(sd, "ln_final"),
        "text_projection": np.asarray(sd["text_projection"]),
    }
    for i in range(text_layers):
        text[f"blocks_{i}"] = _clip_block(
            sd, f"transformer.resblocks.{i}", text_heads)
    return {"visual": visual, "text": text,
            "logit_scale": np.asarray(sd["logit_scale"])}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pkl checkpoint into a flat numpy state_dict (host-side)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in data.items()}
