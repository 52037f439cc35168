"""HF language-tower wrappers exercised with tiny locally-built models.

Counterparts: ape/modeling/text/{bert,t5,llama2}_wrapper.py. No weights are
downloaded — models are constructed from tiny configs; the Bert wordpiece
tokenizer is built from a handwritten vocab file and shared across families
(the wrapper contract only consumes input_ids/attention_mask).
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat", "dog", "photo", "of", "the"]


@pytest.fixture(scope="module")
def bert_tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    vf = d / "vocab.txt"
    vf.write_text("\n".join(VOCAB))
    return transformers.BertTokenizer(str(vf))


def test_bert_wrapper(bert_tokenizer):
    from ape_tpu.modeling.text.hf_wrappers import Bert

    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, max_position_embeddings=256,
    )
    wrap = Bert(model=transformers.BertModel(cfg), tokenizer=bert_tokenizer)
    texts = ["a cat", "a photo of the dog"]
    out = wrap.forward_text(texts, cache=True)
    # bert_wrapper.py:60-66: max_length=256 "max_length" padding
    assert out["last_hidden_state"].shape == (2, 256, 16)
    assert out["last_hidden_state_eot"].shape == (2, 16)
    # end_token_idx = argmin(input_ids) - 1 = the [SEP] position (:96)
    n_tok = [len(t.split()) for t in texts]
    np.testing.assert_array_equal(out["end_token_idx"], [n + 1 for n in n_tok])
    np.testing.assert_array_equal(out["attention_mask"].sum(1), [n + 2 for n in n_tok])
    # pooled = masked average of valid positions
    want = out["last_hidden_state"][0, : n_tok[0] + 2].mean(0)
    np.testing.assert_allclose(out["last_hidden_state_eot"][0], want, rtol=1e-5)
    # cache returns the same object
    assert wrap.forward_text(texts, cache=True) is out


def test_t5_wrapper(bert_tokenizer):
    from ape_tpu.modeling.text.hf_wrappers import T5

    cfg = transformers.T5Config(
        vocab_size=32, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2,
    )
    wrap = T5(model=transformers.T5Model(cfg), tokenizer=bert_tokenizer)
    # t5_wrapper.py:70-99: encoder-only forward, POOLED feature returned
    # directly (not a dict)
    feats = wrap.forward_text(["a cat", "the dog"])
    assert isinstance(feats, np.ndarray)
    assert feats.shape == (2, 16)
    assert np.isfinite(feats).all()


def test_llama2_wrapper(bert_tokenizer):
    from ape_tpu.modeling.text.hf_wrappers import Llama2

    cfg = transformers.LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, max_position_embeddings=64,
    )
    wrap = Llama2(model=transformers.LlamaModel(cfg), tokenizer=bert_tokenizer)
    texts = ["a cat", "a photo of the dog"]
    out = wrap.forward_text(texts)
    # llama2_wrapper.py:114: "longest" padding
    n = max(len(t.split()) for t in texts) + 2
    assert out["last_hidden_state"].shape == (2, n, 16)
    assert np.isfinite(out["last_hidden_state"]).all()  # nan_to_num (:140)
    assert out["last_hidden_state_eot"].shape == (2, 16)


def test_ape_wrapper_accepts_pooled_array(bert_tokenizer):
    """The APE inference wrapper consumes dict-returning towers AND the T5
    pooled-array return (ape_wrapper._encode_vocab)."""
    from ape_tpu.engine.ape_wrapper import APE
    from ape_tpu.modeling.text.hf_wrappers import T5

    cfg = transformers.T5Config(
        vocab_size=32, d_model=16, d_kv=8, d_ff=32, num_layers=2, num_heads=2,
    )
    wrap = T5(model=transformers.T5Model(cfg), tokenizer=bert_tokenizer)
    enc = APE._encode_vocab.__get__(
        type("S", (), {"model_language": wrap, "_text_cache": {}})(), None
    )
    feats = enc(["a cat", "dog"])
    assert feats.shape == (2, 16) and feats.dtype == np.float32
