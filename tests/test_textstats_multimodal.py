"""Text-analysis stages + multimodal plumbing."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from newsagency_classification_ray.stages.multimodal import (
    FrameSampleStage,
    MediaDecodeStage,
    MediaResizeStage,
    _decode_payload,
    encode_media,
    make_media_table,
    media_metadata,
)
from newsagency_classification_ray.stages.textstats import (
    LangIdStage,
    doc_stats,
    fingerprints,
    quality_filter,
)


def docs_ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


def test_doc_stats():
    out = doc_stats(docs_ds(["Hello, world! one two", ""])).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    r = out.iloc[0]
    assert r.n_chars == len("Hello, world! one two")
    assert r.n_tokens == 6          # Hello , world ! one two
    assert r.n_ws_tokens == 4
    assert r.n_punct == 2
    assert out.iloc[1].n_tokens == 0


def test_quality_filter():
    good = "this text has plenty of distinct ordinary words in a row here"
    bad_short = "too short"
    bad_punct = "!!! ??? ... ;;; --- !!! ??? ... ;;; --- !!! ???"
    kept = quality_filter(docs_ds([good, bad_short, bad_punct])).to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_fingerprints_md5_and_winnow_deterministic():
    texts = ["hello world " * 10, "other content " * 10]
    a = fingerprints(docs_ds(texts)).to_pandas().sort_values("doc_id")
    b = fingerprints(docs_ds(texts)).to_pandas().sort_values("doc_id")
    assert a["fp_md5"].tolist() == [hashlib.md5(t.encode()).hexdigest() for t in texts]
    assert a["fp_winnow"].tolist() == b["fp_winnow"].tolist()


def test_langid():
    st = LangIdStage()
    out = st(pa.table({"text": [
        "le gouvernement de la ville et les routes",
        "der bericht und die zeitung in das land",
        "the quick brown fox is in the yard",
        "zzz qqq www",
        "",
    ]}))
    assert out["lang_pred"].to_pylist() == ["fr", "de", "en", "und", "und"]
    assert out["lang_conf"].to_pylist()[3] == 0.0


def test_langid_matches_rowwise_reference():
    """Vectorized stage == the obvious per-row dict-max implementation,
    including the tie-break to the lexicographically greatest language."""
    from newsagency_classification_ray.stages.textstats import _STOPWORDS

    texts = [
        "the la der el",          # 4-way tie at 0.25 each -> 'fr' (last wins)
        "de de de",               # fr/es share 'de'? ('de' is fr-only here)
        "in in und der the and",  # mixed
        "  ",
        "un une et in das los y el la de",
    ]
    st = LangIdStage()
    got = st(pa.table({"text": texts}))
    for text, pred, conf in zip(texts, got["lang_pred"].to_pylist(),
                                got["lang_conf"].to_pylist()):
        toks = text.lower().split()
        if not toks:
            assert (pred, conf) == ("und", 0.0)
            continue
        scores = {lang: sum(t in sw for t in toks) / len(toks)
                  for lang, sw in _STOPWORDS.items()}
        best = max(scores, key=lambda k: (scores[k], k))
        assert pred == (best if scores[best] > 0 else "und")
        assert abs(conf - scores[best]) < 1e-6


def test_media_roundtrip_and_decode():
    blob = encode_media(0, 32, 24, 3, 1, b"x" * 100)
    meta = _decode_payload(blob)
    assert (meta["width"], meta["height"], meta["payload_bytes"]) == (32, 24, 100)


def test_media_metadata_pipeline():
    media = ray.data.from_arrow(make_media_table(64))
    out = media_metadata(media).to_pandas()
    assert len(out) == 64
    assert {"width", "height", "channels", "n_frames", "payload_bytes"} <= set(out.columns)
    assert (out["width"] >= 8).all()


def test_media_resize_and_frame_sample():
    tbl = make_media_table(32)
    resized = MediaResizeStage(target_w=16, target_h=16)(tbl)
    metas = [_decode_payload(b) for b in resized["blob"].to_pylist()]
    assert all(m["width"] == 16 and m["height"] == 16 for m in metas)

    frames = FrameSampleStage(stride=4)(tbl).to_pandas()
    vids = tbl.to_pandas()
    n_expected = sum(
        len(range(0, _decode_payload(b)["n_frames"], 4))
        for b, k in zip(vids["blob"], vids["kind"]) if k == "video"
    )
    assert len(frames) == n_expected
    assert (frames["frame_idx"] % 4 == 0).all()


def test_decode_rejects_foreign_payload():
    import pytest

    with pytest.raises(NotImplementedError):
        _decode_payload(b"\x89PNG\r\n\x1a\n" + b"0" * 20)


def test_ngram_lm_scores_semantics_and_batch_invariance():
    from newsagency_classification_ray.stages.textstats import (
        _lm_count_batch,
        _lm_score_doc,
        ngram_lm_scores,
    )

    ref = "the cat sat on the mat and the cat ran to the mat again"
    texts = [ref, "the cat sat on the mat", "zq xv qqq wyx zq plk mnb vcx",
             "the cat", "one"]
    langs = ["en", "en", "en", "en", "en"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts), "lang": pa.array(langs),
    })

    # distributed result, two different batchings -> identical rows
    got = {}
    for bs in (2, 5):
        ds = ray.data.from_arrow(tbl).map_batches(
            lambda t: t, batch_size=bs, batch_format="pyarrow")
        r = {x["doc_id"]: x["lm_m"]
             for x in ngram_lm_scores(ds, ref_lang="en").take_all()}
        got[bs] = r
    assert got[2] == got[5]
    res = got[2]

    # < 2 tokens -> dropped; in-model text scores above unseen-vocab text
    assert 4 not in res and set(res) == {0, 1, 2, 3}
    assert res[1] > res[2]

    # matches the pure per-doc recompute (shared scoring fns)
    uni_c = np.zeros(1 << 16, dtype=np.int64)
    bi_c = np.zeros(1 << 16, dtype=np.int64)
    _lm_count_batch([t.split() for t in texts], uni_c, bi_c)
    for i, t in enumerate(texts):
        s = _lm_score_doc(t.split(), uni_c, bi_c)
        if s is None:
            assert i not in res
        else:
            assert res[i] == int(round(s * 1e6))
