"""HIPE CoNLL TSV reader (S7) against a synthetic fixture in reference format.

Fixture layout mirrors /root/reference README.md:96-114 and
convert_xmi2clef_format.py:417-442 (comment metadata, 13 columns,
EndOfSentence SEG flags) without copying reference data.
"""

import os

import pyarrow as pa
import pytest

from newsagency_classification_ray.sources.hipe import (
    HIPE_COLUMNS,
    doc_agency_labels,
    parse_hipe_text,
    read_hipe_tsv,
)

FIXTURE = """# global.columns = TOKEN NE-COARSE-LIT NE-COARSE-METO NE-FINE-LIT NE-FINE-METO NE-FINE-COMP NE-NESTED NEL-LIT NEL-METO RENDER SEG OCR-INFO MISC
# language = fr
# newspaper = EXP
# date = 1924-07-12
# document_id = EXP-1924-07-12-a-i0057
Londres\tO\tO\tO\tO\tO\tO\t_\t_\t_\t_\t_\t_
,\tO\tO\tO\tO\tO\tO\t_\t_\t_\t_\t_\t_
12\tO\tO\tO\tO\tO\tO\t_\t_\t_\tEndOfSentence\t_\t_
(\tO\tO\tO\tO\tO\tO\t_\t_\t_\t_\t_\t_
Havas\tB-org\tO\tB-org.ent.pressagency.Havas\tO\tO\tO\tQ2826560\t_\t_\t_\t_\t_
)\tO\tO\tO\tO\tO\tO\t_\t_\t_\tEndOfSentence\t_\t_

# language = de
# newspaper = NZZ
# date = 1931-01-02
# document_id = NZZ-1931-01-02-a-i0012
Bern\tO\tO\tO\tO\tO\tO\t_\t_\t_\t_\t_\t_
Wolff\tB-org\tO\tB-org.ent.pressagency.Wolff\tO\tO\tO\tQ552226\t_\t_\t_\t_\t_
Reuter\tB-org\tO\tB-org.ent.pressagency.Reuter\tO\tO\tO\tQ130879\t_\t_\t_\tEndOfSentence\t_\t_
"""


def test_parse_hipe_text_tokens_and_meta():
    t = parse_hipe_text(FIXTURE)
    assert len(t) == 9
    assert t.column_names[:8] == [
        "document_id", "language", "newspaper", "date", "seg_idx", "tok_idx",
        "scorer_seg_idx", "token",
    ]
    rows = t.to_pylist()
    assert rows[0]["document_id"] == "EXP-1924-07-12-a-i0057"
    assert rows[0]["language"] == "fr" and rows[0]["newspaper"] == "EXP"
    # sentence split on EndOfSentence: tokens 0-2 seg 0, 3-5 seg 1
    assert [r["seg_idx"] for r in rows[:6]] == [0, 0, 0, 1, 1, 1]
    assert [r["tok_idx"] for r in rows[:6]] == [0, 1, 2, 0, 1, 2]
    # second doc resets numbering and metadata
    assert rows[6]["document_id"] == "NZZ-1931-01-02-a-i0012"
    assert rows[6]["language"] == "de" and rows[6]["seg_idx"] == 0
    havas = rows[4]
    assert havas["token"] == "Havas"
    assert havas["ne_fine_lit"] == "B-org.ent.pressagency.Havas"
    assert havas["nel_lit"] == "Q2826560"


def test_read_hipe_tsv_dataset(tmp_path, ray_session):
    p = os.path.join(tmp_path, "fixture.tsv")
    with open(p, "w") as f:
        f.write(FIXTURE)
    ds = read_hipe_tsv(p)
    assert ds.count() == 9
    assert set(ds.schema().names) >= {"document_id", "token", "nel_lit", "seg"}


def test_doc_agency_labels(tmp_path, ray_session):
    p = os.path.join(tmp_path, "fixture.tsv")
    with open(p, "w") as f:
        f.write(FIXTURE)
    out = {r["document_id"]: r for r in doc_agency_labels(read_hipe_tsv(p)).take_all()}
    assert out["EXP-1924-07-12-a-i0057"]["agencies"] == "Q2826560"
    assert out["NZZ-1931-01-02-a-i0012"]["agencies"] == "Q130879,Q552226"
    assert out["NZZ-1931-01-02-a-i0012"]["n_agencies"] == 2


def test_column_count_is_reference_13():
    assert len(HIPE_COLUMNS) == 13


def test_merge_predictions_keyed_join(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.sources.hipe import merge_predictions

    p = os.path.join(tmp_path, "fixture.tsv")
    with open(p, "w") as f:
        f.write(FIXTURE)
    tokens = read_hipe_tsv(p)
    preds = ray.data.from_arrow(pa.table({
        "document_id": pa.array(["EXP-1924-07-12-a-i0057"], type=pa.string()),
        "seg_idx": pa.array([1], type=pa.int32()),
        "tok_idx": pa.array([1], type=pa.int32()),
        "pred_fine": pa.array(["B-org.ent.pressagency.Havas"], type=pa.string()),
    }))
    out = merge_predictions(tokens, preds, num_partitions=2).take_all()
    by_key = {(r["document_id"], r["seg_idx"], r["tok_idx"]): r for r in out}
    hit = by_key[("EXP-1924-07-12-a-i0057", 1, 1)]
    assert hit["token"] == "Havas"
    assert hit["pred_fine"] == "B-org.ent.pressagency.Havas"
    assert hit["pred_coarse"] == "B-org"
    # unpredicted tokens default to 'O' (truncation semantics)
    assert by_key[("EXP-1924-07-12-a-i0057", 0, 0)]["pred_fine"] == "O"
    assert len(out) == 9


import os as _os

_BASE = "/root/reference/data"
_RT_RUNS = {
    "fr": (f"{_BASE}/annotated_data/fr/newsagency-data-test-fr.tsv",
           f"{_BASE}/results_2024/model_dbmdz_bert_base_french_europeana_cased_"
           f"max_sequence_length_256_epochs_3_run_fr_1/newsagency-data-test-fr_pred.tsv"),
    "de": (f"{_BASE}/annotated_data/de/newsagency-data-test-de.tsv",
           f"{_BASE}/results_2024/model_bert_base_cased_max_sequence_length_128_"
           f"epochs_3_run_de_1/newsagency-data-test-de_pred.tsv"),
}


@pytest.mark.parametrize("lang", ["fr", "de"])
def test_pred_tsv_emit_byte_identical_to_reference(lang):
    """S8 writer closure: re-emitting the reference's own shipped predictions
    through format_pred_tsv reproduces its pred TSV byte-for-byte."""
    from newsagency_classification_ray.sources.hipe import (
        format_pred_tsv, parse_hipe_text,
    )

    gold_p, pred_p = _RT_RUNS[lang]
    if not (_os.path.exists(gold_p) and _os.path.exists(pred_p)):
        pytest.skip("reference corpora absent")
    lookup = {
        (r["document_id"], r["seg_idx"], r["tok_idx"]): r["ne_fine_lit"]
        for r in parse_hipe_text(open(pred_p).read()).to_pylist()
    }
    assert format_pred_tsv(open(gold_p).read(), lookup) == open(pred_p).read()


def test_write_pred_tsv_roundtrip_spans(ray_session, tmp_path):
    """Dataset-level writer: write TSV -> read_hipe_tsv -> spans identical."""
    from newsagency_classification_ray.sources.hipe import (
        read_hipe_tsv, token_spans, write_pred_tsv,
    )

    gold_p, pred_p = _RT_RUNS["fr"]
    if not (_os.path.exists(gold_p) and _os.path.exists(pred_p)):
        pytest.skip("reference corpora absent")
    preds = read_hipe_tsv(pred_p).map_batches(
        lambda t: t.select(["document_id", "seg_idx", "tok_idx", "ne_fine_lit"])
        .rename_columns(["document_id", "seg_idx", "tok_idx", "pred_fine"]),
        batch_format="pyarrow",
    )
    out = str(tmp_path / "roundtrip_pred.tsv")
    write_pred_tsv(preds, gold_p, out)
    orig = sorted(map(tuple, (r.values() for r in
                  token_spans(read_hipe_tsv(pred_p)).take_all())))
    ours = sorted(map(tuple, (r.values() for r in
                  token_spans(read_hipe_tsv(out)).take_all())))
    assert orig == ours
