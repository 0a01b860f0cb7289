"""Stateless page-preparation stages (filter + byte-identical text extraction).

Ray mapping of SURVEY.md §2.2 M1/M2 (filters) and the html→text extractor the
north-star requires ("byte-identical extracted text per url"). All stages are
zero-copy-friendly ``batch_format="pyarrow"`` transforms; the only per-row
Python is the html unwrap, which touches exclusively the rows whose ``text``
is null (~20 % of the corpus).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.html import extract_text

SUPPORTED_LANGS = ("de", "fr")  # language gate, reference cli_tagger.py:130-132


def filter_pages(batch: pa.Table, langs: tuple[str, ...] = SUPPORTED_LANGS) -> pa.Table:
    """Keep rows in a supported language with *some* content (M1/M2).

    The reference additionally filters on content type ``tp ∈ {ar, page}``
    (cli_tagger.py:278-283); the webtext input has no ``tp`` column — every
    crawled row is an article candidate.
    """
    lang_ok = pc.is_in(batch["lang"], value_set=pa.array(langs, type=pa.string()))
    has_content = pc.or_(
        pc.fill_null(pc.not_equal(pc.utf8_length(pc.cast(batch["text"], pa.string())), 0), False),
        pc.is_valid(batch["html"]),
    )
    return batch.filter(pc.and_(lang_ok, has_content))


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """Fill null ``text`` from ``html`` byte-identically; drop ``html``.

    Invariant (north-star / retokenization.py:141 analogue): for every row
    where both are present, ``extract_text(html) == text`` byte-for-byte —
    asserted in tests, relied on here.
    """
    text = pc.cast(batch["text"], pa.large_string()).combine_chunks()
    null_mask = pc.is_null(text)
    if pc.any(null_mask).as_py():
        # touch ONLY the null rows: take their html, extract, scatter back —
        # the ~80 % of rows that already carry text stay zero-copy Arrow
        idx = pc.indices_nonzero(null_mask)
        htmls = pc.take(batch["html"], idx).to_pylist()
        repl = pa.array([extract_text(h) for h in htmls], type=pa.large_string())
        text = pc.replace_with_mask(text, null_mask, repl)
    out = batch.drop_columns(["html", "text"]).append_column(
        pa.field("text", pa.large_string()), text
    )
    return out.filter(pc.fill_null(pc.not_equal(pc.utf8_length(out["text"]), 0), False))
