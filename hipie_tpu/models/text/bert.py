"""BERT text encoder in flax.

Replaces reference hipie/models/deformable_detr/bert_model.py (BertEncoder wrapping HF
BertModel) and the clamp-patched hipie/models/deformable_detr/modeling_bert.py. Weights
load from a HF bert-base-uncased torch checkpoint via hipie_tpu/utils/converter.py.

Parity notes:
  * returns {"hidden": (B, L, C), "masks": (B, L)} like bert_model.py:32-66.
  * `parallel_det` builds a block-diagonal attention mask so class names in a
    "a. b. c." detection prompt don't attend to each other (bert_model.py:36-58);
    the block structure is derived on device from the token ids (sentence separator
    "." closes a block, matching the reference's mask construction).
  * long prompts (>512 tokens, open-vocab label sets) are handled by the caller
    encoding extra chunks as batch rows and re-assembling — see
    hipie_tpu/models/text/frontend.py (reference: bert_model.py:68-135).
  * bf16-safe: attention logits in fp32, so the reference's ±50000 clamps
    (modeling_bert.py) are unnecessary.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from hipie_tpu.layers import gelu


class BertSelfAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        # attn_bias: (B, 1, L, L) additive fp32 bias (0 or -inf-ish).
        h = self.num_heads
        d = self.hidden_size // h
        q = nn.DenseGeneral((h, d), dtype=self.dtype, name="query")(x)
        k = nn.DenseGeneral((h, d), dtype=self.dtype, name="key")(x)
        v = nn.DenseGeneral((h, d), dtype=self.dtype, name="value")(x)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / (d ** 0.5)
        logits = logits + attn_bias
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        return nn.DenseGeneral(self.hidden_size, axis=(-2, -1), dtype=self.dtype,
                               name="output_dense")(out)


class BertLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        attn_out = BertSelfAttention(self.hidden_size, self.num_heads, dtype=self.dtype,
                                     name="attention")(x, attn_bias)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="attention_norm")(x + attn_out)
        y = nn.Dense(self.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        y = gelu(y)
        y = nn.Dense(self.hidden_size, dtype=self.dtype, name="output")(y)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="output_norm")(x + y)


class _BertLayerScanBody(nn.Module):
    """Scan body: carry = hidden states, broadcast = additive attention bias.

    The 12 layers compile ONCE via nn.scan (params stacked on axis 0) instead of
    unrolling — a major XLA compile-time win on CPU and TPU alike.
    """

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        x = BertLayer(self.hidden_size, self.num_heads, self.intermediate_size,
                      dtype=self.dtype, name="layer")(x, attn_bias)
        return x, None


class BertModel(nn.Module):
    """BERT encoder returning the last hidden state (pooler not needed)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,        # (B, L) int32
        attention_mask: jnp.ndarray,   # (B, L) 1 = valid
        block_mask: Optional[jnp.ndarray] = None,  # (B, L, L) bool True = ALLOWED
    ) -> jnp.ndarray:
        b, l = input_ids.shape
        word = nn.Embed(self.vocab_size, self.hidden_size, dtype=self.dtype,
                        name="word_embeddings")(input_ids)
        pos_ids = jnp.arange(l)[None, :]
        pos = nn.Embed(self.max_position_embeddings, self.hidden_size, dtype=self.dtype,
                       name="position_embeddings")(pos_ids)
        tok_type = nn.Embed(self.type_vocab_size, self.hidden_size, dtype=self.dtype,
                            name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = word + pos + tok_type
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="embeddings_norm")(x)

        neg = jnp.float32(-1e9)
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)
        if block_mask is not None:
            bias = bias + jnp.where(block_mask[:, None, :, :], 0.0, neg)

        body = _BertLayerScanBody
        if self.remat:
            body = nn.remat(_BertLayerScanBody)
        scan = nn.scan(
            body, variable_axes={"params": 0}, split_rngs={"params": True},
            in_axes=nn.broadcast, length=self.num_layers)
        x, _ = scan(self.hidden_size, self.num_heads, self.intermediate_size,
                    dtype=self.dtype, name="layers")(x, bias)
        return x


def parallel_det_block_mask(input_ids: jnp.ndarray, sep_token_id: int,
                            cls_token_id: int, pad_token_id: int) -> jnp.ndarray:
    """Block-diagonal attention mask for detection class-list prompts.

    reference: bert_model.py:38-50 — the mask is an identity matrix overwritten
    with separator-EXCLUSIVE blocks: every token attends to itself; class-name
    tokens additionally attend to the other tokens of the same class name
    (between '.' separators, the separators themselves excluded). Special
    positions ([CLS], '.', [PAD]) therefore attend only to themselves, and
    class tokens never attend to specials.

    Returns (B, L, L) bool, True = attention ALLOWED.
    """
    is_sep = (input_ids == sep_token_id)
    # segment id = number of separators *before* this token; '.' closes its block.
    seg = jnp.cumsum(is_sep.astype(jnp.int32), axis=1) - is_sep.astype(jnp.int32)
    same = seg[:, :, None] == seg[:, None, :]
    special = (input_ids == cls_token_id) | (input_ids == pad_token_id) | is_sep
    nonspecial = ~special
    blocks = same & nonspecial[:, :, None] & nonspecial[:, None, :]
    eye = jnp.eye(input_ids.shape[1], dtype=bool)[None]
    return blocks | eye
