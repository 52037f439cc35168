"""Text stack tests: tokenizer behavior, CLIP tower shapes, wrapper caching."""

import numpy as np

import jax.numpy as jnp

from ape_tpu.modeling.text.tokenizer import BPETokenizer, HashTokenizer, bytes_to_unicode
from ape_tpu.modeling.text.wrapper import EVA02CLIP, reduce_language_feature


def test_bytes_to_unicode_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


def test_bpe_tokenizer_from_synthetic_merges(tmp_path):
    # tiny merges file in CLIP format: first line header, then merges
    merges = "#version\nc a\nt</w> s\nca t</w>\n"
    p = tmp_path / "bpe.txt"
    p.write_text(merges)
    tok = BPETokenizer(str(p))
    out = tok(["cat"], context_length=8)
    assert out.shape == (1, 8)
    assert out[0, 0] == tok.sot
    assert tok.eot in out[0]
    # deterministic
    np.testing.assert_array_equal(out, tok(["cat"], context_length=8))


def test_hash_tokenizer_framing():
    tok = HashTokenizer(vocab_size=1000)
    out = tok(["a cat", "a cat"], context_length=6)
    np.testing.assert_array_equal(out[0], out[1])
    assert out[0, 0] == tok.sot
    assert (out == tok.eot).any()
    # EOT at argmax position (CLIP pooling invariant)
    assert out[0].argmax() == list(out[0]).index(tok.eot)


def test_text_wrapper_forward_and_cache():
    enc = EVA02CLIP(width=32, heads=2, layers=1, output_dim=16, max_batch_size=4)
    out = enc.forward_text(["a cat", "a dog", "a bird"], cache=True)
    assert out["last_hidden_state_eot"].shape == (3, 16)
    assert out["last_hidden_state"].shape == (3, 77, 16)
    assert out["attention_mask"].shape == (3, 77)
    assert bool(out["attention_mask"][0, 0])
    out2 = enc.forward_text(["a cat", "a dog", "a bird"], cache=True)
    assert out2 is out  # cache hit
    # chunking path: more texts than max_batch_size
    out3 = enc.forward_text([f"thing {i}" for i in range(9)])
    assert out3["last_hidden_state_eot"].shape == (9, 16)


def test_reduce_language_feature():
    feats = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 4, 6))
    mask = jnp.asarray([[True, True, False, False]])
    avg = reduce_language_feature(feats, mask, "average")
    np.testing.assert_allclose(np.asarray(avg)[0], np.arange(24).reshape(4, 6)[:2].mean(0))
    last = reduce_language_feature(feats, mask, "last")
    np.testing.assert_allclose(np.asarray(last)[0], np.arange(24).reshape(4, 6)[1])
