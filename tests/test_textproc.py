"""Unit tests for the span-preserving text primitives (SURVEY.md §5 plan (a))."""

import string

from newsagency_classification_ray.functions.textproc import (
    decode_bio,
    edit_distance,
    is_punct_only,
    normalize_surface,
    remove_space_before_punctuation,
    segment_sentences,
    tokenize,
    tokenize_with_spans,
)


def reference_tokenize(text: str) -> list[str]:
    """Byte-exact reimplementation of the reference M4 tokenizer
    (cli_tagger_no_torch_serve.py:158-161) for parity checking."""
    for punctuation in string.punctuation:
        text = text.replace(punctuation, " " + punctuation + " ")
    return text.split()


def test_tokenizer_matches_reference_sequence():
    cases = [
        "LONDRES, 27 (Havas). Bonne nouvelle.",
        "A.F.P meldet: nichts!  doppelt  leer",
        "(Havaas).} ",
        "...",
        "",
        "mot-compose l'article",
    ]
    for text in cases:
        assert tokenize(text) == reference_tokenize(text), text


def test_tokenizer_spans_are_exact():
    text = "PARIS, 3 (Reuters).  Deux  espaces."
    for tok in tokenize_with_spans(text):
        assert text[tok.start:tok.end] == tok.text


def test_segment_sentences_spans():
    text = "Premiere phrase. Deuxieme phrase! Troisieme?  Quatrieme."
    spans = segment_sentences(text)
    assert [s.text for s in spans] == [
        "Premiere phrase.", "Deuxieme phrase!", "Troisieme?", "Quatrieme.",
    ]
    for s in spans:
        assert text[s.start:s.end] == s.text


def test_segment_empty():
    assert segment_sentences("") == []
    assert segment_sentences("   ") == []


def test_decode_bio_simple():
    text = "ville ( Havas ) fin"
    toks = tokenize_with_spans(text)
    tags = ["O", "O", "B-org.ent.pressagency.Havas", "O", "O"]
    spans = decode_bio(text, toks, tags)
    assert len(spans) == 1
    assert spans[0].surface == "Havas"
    assert spans[0].label == "org.ent.pressagency.Havas"
    assert text[spans[0].start:spans[0].end] == "Havas"


def test_decode_bio_multi_token_and_s_e_remap():
    text = "United Press of town"
    toks = tokenize_with_spans(text)
    tags = ["S-org.x.UP", "E-org.x.UP", "O", "O"]
    # S-→B-, E-→I- remap (cli_tagger_no_torch_serve.py:165): S then E means
    # B then I → one two-token span
    spans = decode_bio(text, toks, tags)
    assert len(spans) == 1
    assert spans[0].surface == "United Press"


def test_decode_bio_adjacent_entities():
    text = "Havas Reuters"
    toks = tokenize_with_spans(text)
    tags = ["B-a.X", "B-a.Y"]
    spans = decode_bio(text, toks, tags)
    assert [s.surface for s in spans] == ["Havas", "Reuters"]


def test_remove_space_before_punctuation():
    assert remove_space_before_punctuation("Havas .") == "Havas."
    assert remove_space_before_punctuation("( x ) y") == "( x) y"


def test_edit_distance():
    assert edit_distance("havas", "havas") == 0
    assert edit_distance("havaas", "havas") == 1
    assert edit_distance("beuter", "reuter") == 1
    assert edit_distance("abc", "xyz") == 3  # > band → clipped to max+1
    assert edit_distance("abc", "xyzzzzz", max_dist=2) == 3


def test_normalize_surface():
    assert normalize_surface("(Havas).") == "havas"
    assert normalize_surface("HAVAS") == "havas"
    assert normalize_surface("Dépêche") == "depeche"


def test_is_punct_only():
    assert is_punct_only("...")
    assert is_punct_only("")
    assert not is_punct_only("a.")
