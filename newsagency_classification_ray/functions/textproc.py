"""Text primitives: sentence segmentation, tokenization, BIO decode.

All functions are pure and span-preserving: every produced unit carries its
``(start, end)`` character span into the *original* text, so the downstream
invariant ``text[l:r] == surface`` (reference
``single_task/newsagency_ner.py:145-147``) holds by construction.

Reference parity notes
----------------------
* Tokenizer: the reference pads every ``string.punctuation`` char with spaces
  then ``split()`` (``cli_tagger_no_torch_serve.py:158-161``, duplicated in
  ``model_handler.py:24-28`` and ``single_task/newsagency_ner.py:60-64``).
  ``tokenize_with_spans`` produces the *same token sequence* (each punctuation
  character is its own token; other tokens are maximal runs of
  non-space/non-punct chars) but with exact char spans instead of the
  reference's lossy space-join arithmetic.
* Sentence segmentation: the reference uses ``pysbd`` (``cli_tagger.py:37-40``)
  with cumulative ``len(sentence)+1`` offset accounting
  (``cli_tagger.py:227``). We segment with a deterministic rule-based splitter
  returning spans; article offsets are ``span.start + sentence_offset`` which
  is exact even when sentences are separated by multiple spaces/newlines
  (the reference arithmetic silently drifts there — a known weakness we do not
  reproduce because the north-star invariant is byte-identity).
* BIO decode: direct scan equivalent to the reference's NLTK-tree walk
  (``cli_tagger_no_torch_serve.py:164-205``) including the ``S-→B-`` /
  ``E-→I-`` remaps; the NLTK ``pos_tag`` detour is dropped (its output is
  ignored by the reference too).
"""

from __future__ import annotations

import re
import string
import unicodedata
from typing import NamedTuple

PUNCT = set(string.punctuation)

_PUNCT_RE = re.escape(string.punctuation)
# token = single punctuation char | run of non-space non-punct chars
_TOKEN_RE = re.compile(rf"[{_PUNCT_RE}]|[^\s{_PUNCT_RE}]+")

# sentence boundary: terminal .!? (possibly repeated / followed by closing
# quotes or brackets), then whitespace, then an upper/digit/open-bracket start.
_SENT_BOUNDARY_RE = re.compile(
    r"(?<=[.!?])[\"'»)\]]*\s+"
)
# space-before-punctuation cleanup, byte-for-byte the reference regex
# (cli_tagger.py:99-104)
_SPACE_PUNCT_RE = re.compile(rf"\s([{_PUNCT_RE}](?:\s|$))")


class Span(NamedTuple):
    text: str
    start: int
    end: int


def remove_space_before_punctuation(text: str) -> str:
    """Undo tokenizer padding inside surfaces (reference cli_tagger.py:99-104)."""
    return _SPACE_PUNCT_RE.sub(r"\1", text)


def segment_sentences(text: str) -> list[Span]:
    """Split ``text`` into sentence spans (stand-in for pysbd, T4 in SURVEY §2.3).

    Returns spans such that ``text[s.start:s.end] == s.text`` and sentences are
    non-overlapping, in order, covering all non-whitespace content. Leading /
    trailing whitespace is trimmed from each sentence (pysbd ``clean=False``
    keeps inner whitespace; we do too).
    """
    if not text or not text.strip():
        return []
    spans: list[Span] = []
    pos = 0
    for m in _SENT_BOUNDARY_RE.finditer(text):
        end = m.start() + _terminal_len(text, m.start())
        seg = text[pos:end]
        if seg.strip():
            s, e = _trim(text, pos, end)
            spans.append(Span(text[s:e], s, e))
        pos = m.end()
    if pos < len(text) and text[pos:].strip():
        s, e = _trim(text, pos, len(text))
        spans.append(Span(text[s:e], s, e))
    return spans


def _terminal_len(text: str, at: int) -> int:
    # include closing quotes/brackets that the boundary regex consumed
    i = at
    while i < len(text) and text[i] in "\"'»)]":
        i += 1
    return i - at


def _trim(text: str, s: int, e: int) -> tuple[int, int]:
    while s < e and text[s].isspace():
        s += 1
    while e > s and text[e - 1].isspace():
        e -= 1
    return s, e


def tokenize_with_spans(text: str) -> list[Span]:
    """Reference tokenizer M4 with exact spans.

    Token *sequence* is identical to the reference's punctuation-padding
    ``split()`` (cli_tagger_no_torch_serve.py:158-161).
    """
    return [Span(m.group(0), m.start(), m.end()) for m in _TOKEN_RE.finditer(text)]


def tokenize(text: str) -> list[str]:
    """Token strings only (drop spans) — byte-compatible with reference M4."""
    return _TOKEN_RE.findall(text)


def scrub_control_chars(text: str) -> str:
    """Length-preserving control-character scrub (M17).

    Replaces every Unicode control/format character (category ``C*``) with a
    space, 1-for-1 — the reference's model for byte-offset-safe cleanup
    (``retokenization.py:107-141``, which asserts
    ``len(text) == len(text_clean)`` at :141). Offsets computed before or
    after the scrub are interchangeable by construction.
    """
    out = [
        " " if unicodedata.category(c)[0] == "C" and c != " " else c
        for c in text
    ]
    cleaned = "".join(out)
    assert len(cleaned) == len(text)  # the reference's invariant, kept hard
    return cleaned


def normalize_surface(surface: str) -> str:
    """Normalization for alias lookup / canonicalization shuffle key.

    casefold + NFKD accent fold + strip leading/trailing punctuation.
    Used both by the linker (T5) and as the salted groupby key (A2).
    """
    s = unicodedata.normalize("NFKD", surface)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return s.casefold().strip("".join(PUNCT) + " ")


def edit_distance(a: str, b: str, max_dist: int = 2) -> int:
    """Banded Levenshtein distance, early-exit above ``max_dist``.

    Mirrors the QA scoring in reference ``helpers.py:55-69`` (normalized
    Levenshtein over OCR-noisy surfaces) but bounded for linker use.
    Returns ``max_dist + 1`` when the distance exceeds the band.
    """
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > max_dist:
        return max_dist + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        lo = max(1, j - max_dist)
        hi = min(la, j + max_dist)
        if lo > 1:
            cur[lo - 1] = max_dist + 1
        for i in range(lo, hi + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        for i in range(hi + 1, la + 1):
            cur[i] = max_dist + 1
        if min(cur) > max_dist:
            return max_dist + 1
        prev = cur
    return min(prev[la], max_dist + 1)


class BioSpan(NamedTuple):
    surface: str  # text slice of the span (exact)
    label: str    # fine label without the B-/I- prefix
    tok_start: int
    tok_end: int  # exclusive
    start: int    # char offset into the tokenized text
    end: int


def decode_bio(text: str, tokens: list[Span], tags: list[str]) -> list[BioSpan]:
    """BIO decode → entity spans (reference M6, direct-scan form).

    Applies the reference's ``S-→B-`` / ``E-→I-`` normalization
    (cli_tagger_no_torch_serve.py:165) then scans: a span starts at ``B-X`` (or
    an ``I-X`` without an open span of X — conll tolerance, same result as
    ``conlltags2tree``) and extends over subsequent ``I-X``. The surface is the
    *exact text slice* from first-token start to last-token end, which equals
    the reference's space-joined surface after its
    ``remove_space_before_punctuation`` repair whenever tokens are single-space
    separated, and is byte-correct otherwise.
    """
    spans: list[BioSpan] = []
    cur_label: str | None = None
    cur_start_tok = -1
    for i, raw in enumerate(tags):
        tag = raw.replace("S-", "B-").replace("E-", "I-")
        if tag == "O" or not tag:
            if cur_label is not None:
                spans.append(_close(text, tokens, cur_label, cur_start_tok, i))
                cur_label = None
            continue
        prefix, label = (tag.split("-", 1) + [""])[:2] if "-" in tag else ("B", tag)
        if prefix == "B" or cur_label != label:
            if cur_label is not None:
                spans.append(_close(text, tokens, cur_label, cur_start_tok, i))
            cur_label = label
            cur_start_tok = i
    if cur_label is not None:
        spans.append(_close(text, tokens, cur_label, cur_start_tok, len(tags)))
    return spans


def _close(text: str, tokens: list[Span], label: str, s: int, e: int) -> BioSpan:
    start = tokens[s].start
    end = tokens[e - 1].end
    # exact slice of the original text → text[start:end] == surface always
    # holds (the reference instead space-joins tokens and repairs with
    # remove_space_before_punctuation; identical on single-space text)
    surface = text[start:end]
    return BioSpan(surface, label, s, e, start, end)


def is_punct_only(s: str) -> bool:
    """True when the surface is pure punctuation (drop filter M7,
    cli_tagger.py:163-165)."""
    return all(c in PUNCT or c.isspace() for c in s) if s else True
