"""Language-derived background (stuff) queries for TRAINING.

Behavioral parity target: reference projects/HIPIE/hipie/models/ddetrs_dn.py
prepare_bg_queries_lan (:1109-1148) + the bg_lang criterion pass (:719-729):
with MODEL.DDETRS.BG_QUERY_FROM_LANG, the decoder gets one extra content query
per UNIQUE stuff class in the batch — the class's BERT token embeddings pooled
by its positive map, taken from the first batch element containing it — plus
randomly sampled negative token embeddings. These queries are shared across
the batch, carry zero-box references, and are supervised against the stuff
GTs by FIXED class-identity matching (not Hungarian); their criterion pass
inherits the bg pass weight (which the reference then zeroes).

TPU redesign: the reference builds a dynamically sized query list per batch;
here the budget is a STATIC `num_slots`: the first slots hold unique stuff
classes in first-occurrence order, every remaining slot is a random negative
token (the reference always appends exactly 20 negatives; filling the static
remainder generalizes that). Queries are expressed as pooling WEIGHTS over
the raw BERT hidden states (slots, B, L) so the model pools + resizes
on-device exactly like the inference-side bg_lang path (transformer.py).

Known deliberate divergences from the reference TRAIN path:
  * Pool-then-resize order: the reference is internally inconsistent — its
    TRAIN path applies the resizer (Linear+LayerNorm) per token BEFORE
    pooling (ddetrs_dn.py:1110) while its INFERENCE path pools raw tokens
    first (hipie_img.py:1023); LayerNorm does not commute with pooling. We
    match the INFERENCE order on both sides so train and eval see identical
    query construction (the property the reference itself lacks).
  * One slot per class: if one image holds two valid stuff GTs of the SAME
    class, only the last one is supervised (`assign.at[...].set` keeps the
    final write); the reference pairs the shared query with every duplicate.
    COCO panoptic has at most one stuff segment per class per image, so this
    only matters for non-COCO data — see test_bg_lang_queries.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BgLangQueries(NamedTuple):
    weights: jnp.ndarray   # (K, B, L) f32 pooling weights over lang hidden
    assign: jnp.ndarray    # (B, K) int32 fixed matching: GT index or -1


def prepare_bg_lang_queries(
    rng: jax.Array,
    labels: jnp.ndarray,         # (B, N) int32
    positive_map: jnp.ndarray,   # (B, N, L) f32
    is_thing: jnp.ndarray,       # (B, N) bool
    valid: jnp.ndarray,          # (B, N) bool
    lang_mask: jnp.ndarray,      # (B, L) 1 = real token
    num_classes: int,
    num_slots: int,
) -> BgLangQueries:
    b, n = labels.shape
    L = positive_map.shape[-1]
    bn = b * n
    stuff = valid & ~is_thing                                  # (B, N)
    flat_lbl = jnp.clip(labels.reshape(bn), 0, num_classes - 1)
    flat_ok = stuff.reshape(bn)

    # first occurrence (flattened (b, n) order) of each stuff class
    order = jnp.arange(bn, dtype=jnp.int32)
    cand = jnp.where(flat_ok, order, bn)
    first = jnp.full((num_classes,), bn, jnp.int32).at[flat_lbl].min(
        cand, mode="drop")                                     # (C,)
    present = first < bn
    rank = jnp.cumsum(present.astype(jnp.int32)) - 1           # (C,)
    slot_of_class = jnp.where(present & (rank < num_slots), rank, -1)

    # per-slot source (b, n): scatter first-occurrence indices into slots.
    # NOTE: -1 indices WRAP in .at[] (they'd hit slot K-1); map invalid slots
    # to the out-of-range sentinel K so mode="drop" actually drops them.
    slot_scatter = jnp.where(slot_of_class >= 0, slot_of_class, num_slots)
    src = jnp.full((num_slots,), bn, jnp.int32).at[slot_scatter].set(
        first, mode="drop")                                    # (K,)
    has_class = src < bn
    safe_src = jnp.minimum(src, bn - 1)
    w_pos = positive_map.reshape(bn, L)[safe_src].astype(jnp.float32)
    w_pos = w_pos / jnp.clip(w_pos.sum(-1, keepdims=True), 1e-9)
    src_b = safe_src // n                                      # (K,)
    b_onehot = (src_b[:, None] == jnp.arange(b)[None, :])      # (K, B)
    w_class = (w_pos[:, None, :] * b_onehot[:, :, None]
               * has_class[:, None, None])                     # (K, B, L)

    # negative slots: one random un-covered real token each (reference :1137-
    # 1146 appends 20 random negatives; here every class-less slot is one).
    # "covered" counts tokens in ANY valid GT's positive map — things AND
    # stuff — matching the reference's positive_map.sum(0)==0 test
    # (ddetrs_dn.py:1141); a thing-class token must not be supervised as
    # a no-object bg query. (ADVICE r2 fix: was stuff-only.)
    covered = (positive_map * valid[..., None]).sum(1) > 1e-6  # (B, L)
    neg_ok = (lang_mask > 0) & ~covered
    g = jax.random.gumbel(rng, (b * L,))
    scores = jnp.where(neg_ok.reshape(-1), g, -jnp.inf)
    _, neg_idx = jax.lax.top_k(scores, num_slots)              # (K,) flat (b,l)
    neg_b, neg_l = neg_idx // L, neg_idx % L
    w_neg = (jnp.zeros((num_slots, b, L))
             .at[jnp.arange(num_slots), neg_b, neg_l].set(1.0))
    weights = jnp.where(has_class[:, None, None], w_class, w_neg)

    # fixed class-identity matching: element b's stuff GT n -> its class slot
    slot_per_gt = slot_of_class[flat_lbl].reshape(b, n)        # (B, N)
    # invalid -> out-of-range sentinel (negative indices would wrap in .at[])
    slot_per_gt = jnp.where(stuff & (slot_per_gt >= 0), slot_per_gt,
                            num_slots)
    gt_idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    assign = jnp.full((b, num_slots), -1, jnp.int32)
    assign = jax.vmap(
        lambda a, s, g_: a.at[s].set(g_, mode="drop"))(
        assign, slot_per_gt, gt_idx)
    return BgLangQueries(weights=weights, assign=assign)
