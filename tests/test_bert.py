"""BERT classifier tests: tokenizer, forward shapes, HF weight parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_lipread_tpu.models.bert import (
    BertClassifier,
    BertConfig,
    HashingTokenizer,
    bert_tiny_config,
    convert_hf_bert,
    tokenize_texts,
)


def test_hashing_tokenizer():
    tok = HashingTokenizer(vocab_size=256, max_length=8)
    ids = tok(["a calm speaker here", "x"])
    assert ids.shape == (2, 8)
    assert ids[0, 0] == 1  # [CLS]
    assert 2 in ids[0]  # [SEP]
    assert ids[1, 3:].sum() == 0  # padded
    np.testing.assert_array_equal(ids, tok(["a calm speaker here", "x"]))


def test_bert_classifier_forward():
    import jax

    cfg = bert_tiny_config(vocab_size=512)
    model = BertClassifier(cfg, num_classes=4)
    ids = tokenize_texts(["hello there", "another one"], max_length=16,
                         vocab_size=512, hf_model=None)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, jnp.asarray(ids), train=False)
    out = model.apply(variables, jnp.asarray(ids), train=False)
    assert out.shape == (2, 4)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_hf_bert_conversion_parity():
    """convert_hf_bert output matches transformers' torch BERT numerically."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.BertConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=24, num_labels=3,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    tmodel = transformers.BertForSequenceClassification(hf_cfg).eval()

    cfg = BertConfig(vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position=24, dropout_rate=0.0)
    params = convert_hf_bert(tmodel.state_dict(), cfg)

    ids = np.array([[101, 5, 6, 7, 102, 0, 0, 0], [101, 9, 102, 0, 0, 0, 0, 0]], np.int32)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(ids.astype(np.int64)),
                     attention_mask=torch.from_numpy(mask)).logits.numpy()

    fmodel = BertClassifier(cfg, num_classes=3)
    out = fmodel.apply({"params": params}, jnp.asarray(ids), train=False)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-3)
