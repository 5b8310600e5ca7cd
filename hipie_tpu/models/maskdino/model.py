"""MaskDINO "stuff" branch: pixel decoder (deformable encoder + FPN) and mask
transformer decoder.

Behavioral parity targets (reference files):
  * hipie/models/maskdino/pixel_decoder/maskdino_encoder.py:191-435 (MaskDINOEncoder):
    1x1+GN input projections for res3/4/5 plus one stride-2 3x3+GN downsample (total
    4 levels), 6-layer MSDeformAttn encoder WITHOUT padding masks (the reference
    disables masks when sizes divide 32, :389-394), level order [s64, s32, s16, s8]
    high-to-low at the decoder input ([::-1] indexing at :398-404 with
    feature_order='low2high' srcs [s8..s64]), one FPN step on res3 (lateral 1x1+GN,
    add bilinear-upsampled stride-8 encoder map, 3x3+GN+relu output conv) and
    mask_features = ConvTranspose2d x2 + GN + relu + 1x1 conv -> stride-4 map.
  * hipie/models/maskdino/transformer_decoder/maskdino_decoder.py:37-548
    (MaskDINODecoder): two-stage topk over max of the class-embedding output
    (a Linear(hidden, 256) whose output is matched against language by cloned
    VL_Align heads OUTSIDE this module — ddetrs_dn.py:209-215 post_process_maskdino),
    initial prediction from the detached topk content, 9 decoder layers sharing ONE
    bbox MLP (:166-172), per-layer class/mask/box heads, mask = mask_embed(q) ·
    mask_features (:520-531).

TPU-first: everything static-shape; the decoder runs over the 4-level flattened
memory with MSDeformAttn cross-attention (same Pallas/XLA core as the main branch).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.config import MaskDINOConfig, TransformerConfig
from hipie_tpu.layers import MLP, ConvGN, sine_position_embedding_2d
from hipie_tpu.models.transformer import (
    DeformableDecoderLayer,
    DeformableEncoderLayer,
    encoder_reference_points,
)
from hipie_tpu.utils.misc import inverse_sigmoid, sine_position_embedding_1d

Shapes = Tuple[Tuple[int, int], ...]


def _enc_cfg(c: MaskDINOConfig) -> TransformerConfig:
    return TransformerConfig(
        d_model=c.hidden_dim, nhead=c.nheads, dim_feedforward=c.dim_feedforward,
        num_feature_levels=4, enc_n_points=4, dec_n_points=4)


class _PixDecScanBody(nn.Module):
    """nn.scan body: one deformable encoder layer of the pixel decoder."""

    cfg: TransformerConfig
    spatial_shapes: Shapes
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, memory, pos_flat, enc_ref, mask_flat):
        out = DeformableEncoderLayer(self.cfg, dtype=self.dtype,
                                     name="layer")(
            memory, pos_flat, enc_ref, self.spatial_shapes, mask_flat)
        return out, None


class MaskDINOPixelDecoder(nn.Module):
    """Deformable-encoder pixel decoder -> (mask_features s4, 4 level maps)."""

    cfg: MaskDINOConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],        # res3/res4/res5 NHWC backbone maps
        shared_memory_levels: Optional[Sequence[jnp.ndarray]] = None,
    ):
        """If `shared_memory_levels` ([s8, s16, s32] NHWC maps from the MAIN encoder)
        is given, the internal deformable encoder is skipped (SHARE_ENCODER mode,
        reference ddetrs_dn.py:636-650); only the s64 level, FPN and mask_features
        run. Returns (mask_features (B, H4, W4, mask_dim), [s64, s32, s16, s8] maps).
        """
        c = self.cfg
        names = ["res3", "res4", "res5"]

        if shared_memory_levels is None:
            srcs = [
                ConvGN(c.hidden_dim, 1, dtype=self.dtype, name=f"input_proj_{i}")(
                    features[n])
                for i, n in enumerate(names)
            ]
            # extra stride-64 level from res5.
            srcs.append(ConvGN(c.hidden_dim, 3, strides=2, dtype=self.dtype,
                               name="input_proj_3")(features["res5"]))
            b = srcs[0].shape[0]
            spatial_shapes: Shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
            level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                     (4, c.hidden_dim))
            flat, pos_flat = [], []
            for lvl, s in enumerate(srcs):
                h, w = s.shape[1], s.shape[2]
                zero_mask = jnp.zeros((b, h, w), bool)
                pos = sine_position_embedding_2d(zero_mask,
                                                 num_pos_feats=c.hidden_dim // 2,
                                                 offset=-0.5)
                flat.append(s.reshape(b, h * w, -1))
                pos_flat.append(pos.reshape(b, h * w, -1).astype(self.dtype)
                                + level_embed[lvl].astype(self.dtype))
            src_flat = jnp.concatenate(flat, axis=1).astype(self.dtype)
            pos_flat = jnp.concatenate(pos_flat, axis=1)
            mask_flat = jnp.zeros(src_flat.shape[:2], bool)
            valid_ratios = jnp.ones((b, 4, 2), jnp.float32)
            enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
            ecfg = _enc_cfg(c)
            # scanned layers: one compiled body for all enc_layers (same
            # pattern as the main transformer encoder) — the unrolled python
            # loop compiled 6 separate encoder-scale MSDA layers whose layout
            # copies alone cost ~20 ms/img at 1024^2 (PERFORMANCE.md).
            scan = nn.scan(_PixDecScanBody, variable_axes={"params": 0},
                           split_rngs={"params": True}, in_axes=nn.broadcast,
                           length=c.enc_layers)
            memory, _ = scan(ecfg, spatial_shapes, dtype=self.dtype,
                             name="enc_layers")(
                src_flat, pos_flat, enc_ref, mask_flat)
            # split levels back to maps: [s8, s16, s32, s64].
            level_maps = []
            start = 0
            for (h, w) in spatial_shapes:
                level_maps.append(
                    jax.lax.slice_in_dim(memory, start, start + h * w, axis=1)
                    .reshape(b, h, w, c.hidden_dim))
                start += h * w
        else:
            level_maps = list(shared_memory_levels)
            level_maps.append(ConvGN(c.hidden_dim, 3, strides=2, dtype=self.dtype,
                                     name="input_proj_3")(features["res5"]))

        # FPN step on res3 (stride 8): lateral + upsampled high-res encoder map.
        s8 = level_maps[0]
        lateral = ConvGN(c.hidden_dim, 1, use_bias=False, dtype=self.dtype,
                         name="adapter_1")(features["res3"])
        up = jax.image.resize(
            s8, (s8.shape[0], lateral.shape[1], lateral.shape[2], s8.shape[-1]),
            "bilinear")
        y = lateral + up
        y = nn.relu(ConvGN(c.hidden_dim, 3, use_bias=False, dtype=self.dtype,
                           name="layer_1")(y))

        # mask features at stride 4.
        m = nn.ConvTranspose(c.hidden_dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                             name="mask_features_up")(y)
        m = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                         name="mask_features_gn")(m)
        m = nn.relu(m)
        mask_features = nn.Conv(c.mask_dim, (1, 1), dtype=self.dtype,
                                name="mask_features_out")(m)
        # decoder consumes levels high-to-low: [s64, s32, s16, s8].
        return mask_features, level_maps[::-1]


class MaskDINODecoder(nn.Module):
    """Two-stage mask transformer decoder with shared box head."""

    cfg: MaskDINOConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        level_maps: Sequence[jnp.ndarray],   # [s64, s32, s16, s8] NHWC, hidden_dim ch
        mask_features: jnp.ndarray,          # (B, H4, W4, mask_dim)
        dn_tgt: Optional[jnp.ndarray] = None,
        dn_refs_unact: Optional[jnp.ndarray] = None,
        self_attn_mask: Optional[jnp.ndarray] = None,
        dn_valid: Optional[jnp.ndarray] = None,       # (B, pad)
        lang_pool: Optional[jnp.ndarray] = None,      # (B, lang_dim)
        emit_embeds: bool = False,
    ) -> Dict[str, Any]:
        """With emit_embeds=True (training), per-layer DENSE masks are never
        materialized: mask = mask_embed(q) . mask_features is LINEAR in the
        pixel features, so the criterion evaluates it at sampled points /
        selected slots instead (point_sample(emb @ F) == emb @ point_sample(F)
        exactly). The dense path emitted (layers x Q x H4 x W4) logits —
        ~860 MB of HBM writes per step at 1024^2 — that existed only to be
        point-sampled down to <=2048/12544 points by the criterion. Output
        keys become mask_embeds/aux.mask_embeds/interm.pred_mask_embed plus
        mask_features."""
        c = self.cfg
        b = level_maps[0].shape[0]
        spatial_shapes: Shapes = tuple((m.shape[1], m.shape[2]) for m in level_maps)
        src_flat = jnp.concatenate(
            [m.reshape(b, m.shape[1] * m.shape[2], -1) for m in level_maps], axis=1
        ).astype(self.dtype)
        valid_ratios = jnp.ones((b, len(level_maps), 2), jnp.float32)
        mask_flat = jnp.zeros(src_flat.shape[:2], bool)

        class_embed = nn.Dense(c.hidden_dim, dtype=self.dtype, name="class_embed")
        mask_embed = MLP(c.hidden_dim, c.mask_dim, 3, dtype=self.dtype, name="mask_embed")
        bbox_embed = MLP(c.hidden_dim, 4, 3, dtype=self.dtype, name="bbox_embed")
        decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")
        mf = mask_features.astype(jnp.float32)

        def predict(q, with_mask=True):
            d = decoder_norm(q)
            logits = class_embed(d).astype(jnp.float32)
            mask = None
            if with_mask:
                emb = mask_embed(d).astype(jnp.float32)
                mask = emb if emit_embeds else jnp.einsum(
                    "bqc,bhwc->bqhw", emb, mf)
            return logits, mask

        # ---- two-stage init -------------------------------------------------
        grid_props = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            gy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            gx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            grid = jnp.stack([jnp.broadcast_to(gx[None, :], (h, w)),
                              jnp.broadcast_to(gy[:, None], (h, w))], -1).reshape(-1, 2)
            wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
            grid_props.append(jnp.concatenate([grid, wh], -1))
        proposals = jnp.broadcast_to(
            jnp.concatenate(grid_props, 0)[None], (b,) + jnp.concatenate(grid_props, 0).shape)
        prop_valid = jnp.all((proposals > 0.01) & (proposals < 0.99), axis=-1)
        safe = jnp.clip(proposals, 1e-6, 1 - 1e-6)
        proposals_unact = jnp.where(prop_valid[..., None], jnp.log(safe / (1 - safe)), 1e9)

        out_memory = jnp.where(prop_valid[..., None], src_flat, 0.0)
        out_memory = nn.Dense(c.hidden_dim, dtype=self.dtype, name="enc_output")(out_memory)
        out_memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name="enc_output_norm")(out_memory)
        enc_logits = class_embed(out_memory).astype(jnp.float32)
        enc_coords_unact = (bbox_embed(out_memory).astype(jnp.float32) + proposals_unact)
        scores = jnp.where(prop_valid, jnp.max(enc_logits, -1), jnp.finfo(jnp.float32).min)
        _, topk_idx = jax.lax.top_k(scores, c.num_queries)
        ref_unact_undetach = jnp.take_along_axis(enc_coords_unact, topk_idx[..., None], 1)
        refpoints_unact = jax.lax.stop_gradient(ref_unact_undetach)
        tgt_undetach = jnp.take_along_axis(
            out_memory, topk_idx[..., None], 1)
        interm_class, interm_mask = predict(tgt_undetach)
        interm = {"pred_logits": interm_class,
                  "pred_boxes": jax.nn.sigmoid(ref_unact_undetach),
                  "pred_masks": interm_mask}
        tgt = jax.lax.stop_gradient(tgt_undetach)

        if dn_refs_unact is not None:
            if dn_tgt is None:
                # seg-DN with dynamic label encoding: every dn slot carries the
                # resized pooled language feature (maskdino_decoder.py
                # prepare_for_dn with DYNAMIC_LABEL_ENC, reference :202-280).
                from hipie_tpu.models.heads import FeatureResizer
                le = FeatureResizer(c.hidden_dim, dtype=self.dtype,
                                    name="resizer")(lang_pool)
                dn_tgt = jnp.broadcast_to(
                    le[:, None, :], (b, dn_refs_unact.shape[1], c.hidden_dim))
                if dn_valid is not None:
                    dn_tgt = jnp.where(dn_valid[..., None], dn_tgt, 0.0)
            tgt = jnp.concatenate([dn_tgt.astype(self.dtype), tgt], axis=1)
            refpoints_unact = jnp.concatenate(
                [dn_refs_unact.astype(jnp.float32), refpoints_unact], axis=1)

        classes_list, masks_list, boxes_list = [], [], []
        if c.initial_pred:
            cls0, m0 = predict(tgt)
            classes_list.append(cls0)
            masks_list.append(m0)
            boxes_list.append(jax.nn.sigmoid(refpoints_unact))

        # ---- decoder layers --------------------------------------------------
        dcfg = _enc_cfg(c)
        ref_point_head = MLP(c.hidden_dim, c.hidden_dim, 2, dtype=self.dtype,
                             name="ref_point_head")
        output = tgt
        reference_points = jax.nn.sigmoid(refpoints_unact)
        for lid in range(c.dec_layers):
            ref_input = reference_points[:, :, None, :] * jnp.concatenate(
                [valid_ratios, valid_ratios], -1)[:, None, :, :]
            query_sine = sine_position_embedding_1d(
                ref_input[:, :, 0, :], num_feats=c.hidden_dim // 2)
            query_pos = ref_point_head(query_sine.astype(self.dtype))
            output = DeformableDecoderLayer(dcfg, dtype=self.dtype,
                                            name=f"dec_layers_{lid}")(
                output, query_pos, ref_input, src_flat, spatial_shapes,
                mask_flat, self_attn_mask)
            delta = bbox_embed(output).astype(jnp.float32)
            new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(reference_points))
            boxes_list.append(new_ref)
            reference_points = jax.lax.stop_gradient(new_ref)
            cls_l, m_l = predict(output)
            classes_list.append(cls_l)
            masks_list.append(m_l)

        if emit_embeds:
            interm = dict(interm)
            interm["pred_mask_embed"] = interm.pop("pred_masks")
            return {
                "pred_logits": classes_list[-1],
                "pred_mask_embed": masks_list[-1],    # (B, Q, mask_dim)
                "pred_boxes": boxes_list[-1],
                "aux": {"classes": classes_list[:-1],
                        "mask_embeds": masks_list[:-1],
                        "boxes": boxes_list[:-1]},
                "interm_outputs": interm,
                "mask_features": mf,                  # (B, H4, W4, mask_dim)
            }
        return {
            "pred_logits": classes_list[-1],      # (B, Q, hidden) VL embeddings
            "pred_masks": masks_list[-1],         # (B, Q, H4, W4)
            "pred_boxes": boxes_list[-1],
            "aux": {"classes": classes_list[:-1], "masks": masks_list[:-1],
                    "boxes": boxes_list[:-1]},
            "interm_outputs": interm,
        }


class MaskDINOHead(nn.Module):
    """Pixel decoder + decoder, the reference's meta_arch/maskdino_head.py:21-82."""

    cfg: MaskDINOConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, shared_memory_levels=None,
                 dn_tgt=None, dn_refs_unact=None, self_attn_mask=None,
                 dn_valid=None, lang_pool=None, emit_embeds=False):
        mask_features, level_maps = MaskDINOPixelDecoder(
            self.cfg, dtype=self.dtype, name="pixel_decoder")(
            features, shared_memory_levels)
        return MaskDINODecoder(self.cfg, dtype=self.dtype, name="predictor")(
            level_maps, mask_features, dn_tgt, dn_refs_unact, self_attn_mask,
            dn_valid, lang_pool, emit_embeds=emit_embeds)
