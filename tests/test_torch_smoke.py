"""Torch-gated smoke test for the real BertModel backend (VERDICT r2 #9).

torch/transformers are absent in this sandbox, so these tests SKIP here —
they exist so the gated path (stages/tagger.py:BertModel) is exercised in any
environment that does have torch (CI, a real cluster node). They build a tiny
random 2-layer checkpoint on the fly (no network, no real weights) and assert
the properties the sandboxed suite can only unit-test torch-free:

* ``tag_batch`` (length-sorted padded chunks) is prediction-equivalent to
  per-sentence ``tag`` — padding/chunking must not change argmax labels.
* Words whose first wordpiece falls beyond ``max_tokens`` stay ``'O'``
  (reference truncation semantics, cli_tagger_no_torch_serve.py:208-226).
"""

from __future__ import annotations

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from newsagency_classification_ray.functions.textproc import tokenize_with_spans
from newsagency_classification_ray.stages.tagger import BertModel

LABELS = ["O", "B-org.ent.pressagency.Havas", "I-org.ent.pressagency.Havas"]


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """A 2-layer random BertForTokenClassification + WordPiece tokenizer."""
    from transformers import BertConfig, BertForTokenClassification, BertTokenizerFast

    root = tmp_path_factory.mktemp("tiny_bert")
    vocab = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
        "havas", "reuters", "agence", "##s", "##as", "la", "de", "presse",
        "the", "a", "news", ".", ",",
    ]
    (root / "vocab.txt").write_text("\n".join(vocab) + "\n")
    tok = BertTokenizerFast(str(root / "vocab.txt"), do_lower_case=True)
    tok.save_pretrained(str(root))
    torch.manual_seed(7)
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, num_labels=len(LABELS),
        id2label=dict(enumerate(LABELS)),
        label2id={l: i for i, l in enumerate(LABELS)},
    )
    BertForTokenClassification(cfg).save_pretrained(str(root))
    return str(root)


SENTENCES = [
    "Havas reports the news .",
    "Agence de presse , la presse .",
    "The news .",
    "Reuters and Havas de la presse news the a , . " * 3,  # longest: many words
]


def test_tag_batch_equals_per_sentence(tiny_checkpoint):
    model = BertModel(tiny_checkpoint, max_tokens=48)
    token_lists = [tokenize_with_spans(s) for s in SENTENCES]
    batched = model.tag_batch(token_lists)
    for toks, (btags, bconfs) in zip(token_lists, batched):
        stags, sconfs = model.tag(toks)
        assert btags == stags
        assert bconfs == pytest.approx(sconfs, abs=1e-5)
        assert len(btags) == len(toks)


def test_truncation_yields_O(tiny_checkpoint):
    # max_tokens=8 → wordpieces beyond position 8 (incl. [CLS]) are dropped;
    # every word whose FIRST wordpiece was truncated must stay 'O'
    model = BertModel(tiny_checkpoint, max_tokens=8)
    toks = tokenize_with_spans("havas news the a de la presse reuters havas news")
    tags, confs = model.tag(toks)
    assert len(tags) == len(toks)
    # at most 6 content wordpieces fit ([CLS] + 6 + [SEP]); the tail words
    # never appear in word_ids and must be 'O' with conf 0.0
    assert tags[-3:] == ["O", "O", "O"]
    assert confs[-3:] == [0.0, 0.0, 0.0]


def test_chunking_is_order_stable(tiny_checkpoint):
    # chunk_sentences=2 forces multiple padded forwards; results must come
    # back in input order regardless of the internal length sort
    model = BertModel(tiny_checkpoint, max_tokens=48)
    model.chunk_sentences = 2
    token_lists = [tokenize_with_spans(s) for s in SENTENCES]
    chunked = model.tag_batch(token_lists)
    model.chunk_sentences = 64
    single = model.tag_batch(token_lists)
    assert [t for t, _ in chunked] == [t for t, _ in single]
