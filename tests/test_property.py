"""Property tests (hypothesis) over the span-carrying text primitives.

These are the invariants every downstream byte-offset depends on
(SURVEY.md §7.4 "hard parts"): spans always slice the original text
exactly, tokens never overlap, scrubbing never changes length.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.functions.textproc import (
    decode_bio,
    normalize_surface,
    scrub_control_chars,
    segment_sentences,
    tokenize_with_spans,
)

TEXT = st.text(max_size=400)
SMALL_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=200, deadline=None, derandomize=True)
@given(SMALL_TEXT)
def test_token_spans_slice_exactly_and_never_overlap(text):
    toks = tokenize_with_spans(text)
    prev_end = -1
    for t in toks:
        assert text[t.start:t.end] == t.text
        assert t.start >= prev_end  # ordered, non-overlapping
        assert t.end > t.start
        prev_end = t.end


@settings(max_examples=200, deadline=None, derandomize=True)
@given(SMALL_TEXT)
def test_sentence_spans_slice_exactly_ordered(text):
    spans = segment_sentences(text)
    prev_end = -1
    for s in spans:
        assert text[s.start:s.end] == s.text
        assert s.start >= prev_end
        assert s.end > s.start
        prev_end = s.end
    # every non-whitespace char is inside some sentence span
    covered = [False] * len(text)
    for s in spans:
        for i in range(s.start, s.end):
            covered[i] = True
    for i, c in enumerate(text):
        if not c.isspace():
            assert covered[i]


@settings(max_examples=200, deadline=None, derandomize=True)
@given(SMALL_TEXT, st.randoms())
def test_decode_bio_spans_always_slice_exactly(text, rnd):
    toks = tokenize_with_spans(text)
    labels = ["O", "B-x.y.A", "I-x.y.A", "B-x.y.B", "S-x.y.C", "E-x.y.A"]
    tags = [rnd.choice(labels) for _ in toks]
    for span in decode_bio(text, toks, tags):
        assert text[span.start:span.end] == span.surface
        assert 0 <= span.tok_start < span.tok_end <= len(toks)
        assert span.label  # never empty


@settings(max_examples=300, deadline=None, derandomize=True)
@given(SMALL_TEXT)
def test_scrub_is_length_preserving_and_idempotent(text):
    out = scrub_control_chars(text)
    assert len(out) == len(text)
    assert scrub_control_chars(out) == out


@settings(max_examples=300, deadline=None, derandomize=True)
@given(SMALL_TEXT)
def test_normalize_surface_is_idempotent(text):
    n = normalize_surface(text)
    assert normalize_surface(n) == n
