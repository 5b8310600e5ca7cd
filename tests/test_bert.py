"""BERT parity: hipie_tpu flax BERT vs HF transformers BertModel with identical
(random) weights, via the checkpoint converter. This is the test pattern for all
weight-converted components (SURVEY.md §7.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def hf_bert_pair():
    import torch
    from transformers import BertConfig, BertModel as HFBert

    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = HFBert(cfg).eval()

    from hipie_tpu.models.text.bert import BertModel
    from hipie_tpu.utils.converter import convert_hf_bert

    jx = BertModel(vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, max_position_embeddings=64)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = {"params": convert_hf_bert(sd, num_layers=2, heads=4)}
    return hf, jx, params


def test_bert_matches_hf(hf_bert_pair):
    import torch

    hf, jx, params = hf_bert_pair
    rng = np.random.RandomState(1)
    ids = rng.randint(0, 99, (2, 16)).astype(np.int64)
    mask = np.ones((2, 16), np.int64)
    mask[1, 10:] = 0

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got = jx.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=1e-4)


def test_parallel_det_block_mask():
    from hipie_tpu.models.text.bert import parallel_det_block_mask

    # [CLS] a b . c . [PAD]
    ids = jnp.array([[2, 10, 11, 5, 12, 5, 0]])
    allowed = parallel_det_block_mask(ids, sep_token_id=5, cls_token_id=2,
                                      pad_token_id=0)[0]
    # reference bert_model.py:38-50: eye + separator-exclusive blocks
    assert bool(allowed[1, 2])          # a <-> b same block
    assert not bool(allowed[1, 4])      # a <-> c different blocks
    assert not bool(allowed[0, 4])      # CLS attends only to itself
    assert bool(allowed[0, 0])
    assert not bool(allowed[1, 3])      # class token does not attend to '.'
    assert not bool(allowed[4, 6])      # nor to PAD
    assert bool(allowed[3, 3]) and bool(allowed[6, 6])   # specials self-attend


def test_wordpiece_tokenizer_roundtrip():
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer

    tok = WordPieceTokenizer.toy(words=["person", "bicycle", "car", "##s"])
    enc = tok.encode("person. bicycle. cars.", max_len=16)
    assert len(enc["input_ids"]) == 16
    assert enc["input_ids"][0] == tok.cls_token_id
    # "person" is a whole-word token
    assert tok.vocab["person"] in enc["input_ids"]
    # "cars" -> "car" + "##s"
    assert tok.vocab["car"] in enc["input_ids"]
    assert tok.vocab["##s"] in enc["input_ids"]
    # offsets map chars back to tokens
    ti = tok.char_to_token(enc["offsets"], 0)
    assert enc["input_ids"][ti] == tok.vocab["person"]
