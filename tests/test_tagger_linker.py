"""Tagger + linker semantics, incl. the golden-fixture scenario
(reference tests/na_tagger_in.jsonl → na_tagger_out.jsonl: OCR-noisy
surface ``Havaas`` must resolve to canonical ``Havas``; ``ad``-type /
mention-free articles yield nothing)."""

import datetime

import pyarrow as pa

from newsagency_classification_ray.stages.extract import extract_text_batch, filter_pages
from newsagency_classification_ray.stages.linker import LinkerStage
from newsagency_classification_ray.stages.tagger import TaggerStage


def pages_batch(rows):
    return pa.table({
        "url": pa.array([r.get("url", f"https://h.example.ch/1930/10/11/article-{i}")
                         for i, r in enumerate(rows)], type=pa.string()),
        "warc_ts": pa.array([r.get("ts", datetime.datetime(1930, 10, 11)) for r in rows],
                            type=pa.timestamp("us")),
        "html": pa.array([r.get("html") for r in rows], type=pa.binary()),
        "text": pa.array([r.get("text") for r in rows], type=pa.large_string()),
        "lang": pa.array([r.get("lang", "fr") for r in rows], type=pa.string()),
    })


GOLDEN_FT = (
    "PARLOIR DES CHAUFFEURS Avant—projet de loi fédérale sur la circulation "
    "des véhicules automobiles et des cycles (Suite) Recours Les décisions "
    "portant refus ou retrait d'un permis sont susceptibles d'un recours au "
    "gouvernement du canton. Elle peut transmettre cette compétence aux "
    "autorités. de certaines communes. (Havaas).} "
)


def run_tag_link(batch):
    batch = extract_text_batch(filter_pages(batch))
    return LinkerStage()(TaggerStage()(batch))


def test_golden_havaas_resolves_to_havas():
    out = run_tag_link(pages_batch([
        {"text": GOLDEN_FT, "lang": "fr"},
        {"text": "DERNIERES NOUVELLES ", "lang": "fr"},   # no mentions
        {"text": "Telekurs AG information page", "lang": "en"},  # lang gate
    ]))
    df = out.to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    assert row["surface"] == "Havaas"
    assert row["canonical"] == "Havas"
    assert row["qid"] == "Q2826560"
    assert GOLDEN_FT[row["l_art"]:row["r_art"]] == "Havaas"


def test_truncation_drops_late_aliases():
    long_sentence = " ".join(["mot"] * 520) + " (Havas) fin."
    early = "Debut (Havas) " + " ".join(["mot"] * 520) + "."
    out = run_tag_link(pages_batch([{"text": long_sentence}, {"text": early}]))
    df = out.to_pandas()
    # alias past 512 tokens → 'O' (cli_tagger_no_torch_serve.py:219-224);
    # alias before the window survives
    assert len(df) == 1
    assert df.iloc[0]["l_art"] == len("Debut (")


def test_mention_filters_punct_and_len():
    # single-char and punctuation-only surfaces are dropped (cli_tagger.py:163-165)
    out = run_tag_link(pages_batch([{"text": "Voici TT et Havas."}]))
    surfaces = set(out["surface"].to_pylist())
    assert "Havas" in surfaces
    assert "TT" in surfaces  # len 2 > 1 → kept


def test_html_extraction_path():
    from newsagency_classification_ray.functions.html import wrap_html

    text = "BERNE, 4 (Reuters). Rien de plus."
    out = run_tag_link(pages_batch([{"text": None, "html": wrap_html(text)}]))
    df = out.to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["surface"] == "Reuters"
    assert text[df.iloc[0]["l_art"]:df.iloc[0]["r_art"]] == "Reuters"


def test_linker_fuzzy_fallback():
    lk = LinkerStage()
    # exact alias table hit
    assert lk.resolve("Havaas")[:2] == ("Havas", "Q2826560")
    # fuzzy: not in the alias table, edit distance 1 from 'reuters'
    canon, qid, score = lk.resolve("Reuterss")
    assert (canon, qid) == ("Reuters", "Q130879")
    assert 0 < score < 1
    # garbage stays NIL
    assert lk.resolve("xyzzyqqq")[1] == "NIL"
    # Europapress links to NIL qid by design (cli_tagger.py:42-74)
    assert lk.resolve("Europapress")[:2] == ("Europapress", "NIL")


def test_empty_batch_schema_stable():
    out = run_tag_link(pages_batch([{"text": "", "lang": "fr"}]))
    assert out.num_rows == 0
    assert "qid" in out.column_names and "canonical" in out.column_names


def test_linker_embedding_fallback_beyond_edit_band():
    """Corruption past the 2-edit Levenshtein band resolves via the
    char-trigram embedding cosine (T5 'embedding score' path)."""
    from newsagency_classification_ray.stages.linker import LinkerStage

    lk = LinkerStage()
    canon, qid, score = lk.resolve("Reuutersss")  # 3 edits from 'reuters'
    assert canon == "Reuters" and qid == "Q130879"
    assert 0.55 <= score < 1.0
    # garbage still refuses to link
    canon, qid, score = lk.resolve("Zqxwvy")
    assert qid == "NIL" and canon == ""


def test_realign_wordpieces_reference_semantics():
    """M5 realign, torch-free: first wordpiece carries the word's tag,
    later wordpieces of the same word are ignored, special positions
    (None) skipped, truncated-away words stay 'O'."""
    from newsagency_classification_ray.stages.tagger import realign_wordpieces

    id2label = {0: "O", 1: "B-org.ent.pressagency.Havas", 2: "I-org.ent.pressagency.Havas"}
    # sentence of 4 words; word 1 splits into 3 wordpieces; word 3 truncated
    word_ids = [None, 0, 1, 1, 1, 2, None]      # [CLS] w0 w1a w1b w1c w2 [SEP]
    pred_ids = [0,    0, 1, 2, 0, 0, 0]
    confs =    [.5,  .9, .8, .7, .6, .4, .5]
    tags, out_conf = realign_wordpieces(word_ids, pred_ids, confs, 4, id2label)
    assert tags == ["O", "B-org.ent.pressagency.Havas", "O", "O"]  # w3 truncated -> O
    assert out_conf == [0.9, 0.8, 0.4, 0.0]


def test_realign_wordpieces_all_truncated():
    from newsagency_classification_ray.stages.tagger import realign_wordpieces

    tags, confs = realign_wordpieces([None, None], [0, 0], [0.1, 0.2], 3, {0: "O"})
    assert tags == ["O", "O", "O"] and confs == [0.0, 0.0, 0.0]


def test_tag_batch_equals_per_sentence_for_alias_and_simbert():
    from newsagency_classification_ray.functions.textproc import tokenize_with_spans
    from newsagency_classification_ray.stages.tagger import (
        AliasModel, SimulatedBertModel,
    )

    sents = [tokenize_with_spans(s) for s in [
        "Reuters meldet aus Berlin .",
        "short",
        "la dépêche de l ' agence Havas est arrivée hier soir à Paris et",
        "",
    ] if s]
    for model in (AliasModel(), SimulatedBertModel()):
        assert model.tag_batch(sents) == [model.tag(s) for s in sents]
