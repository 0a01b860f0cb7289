"""Span-level conformance scorer (strict regime of the reference's scorer).

Distributed reimplementation of the HIPE scorer's *strict* evaluation
(``HIPE-scorer/hipe_evaluation/ner_eval.py:387-450``: a predicted span is a
true positive iff boundaries AND type match exactly; spurious predictions are
FP, missed gold spans FN; P/R/F1 from the global counts). The reference
accumulates per-document Counters in a driver loop (``ner_eval.py:104-110``);
here both sides stream through one groupby on the span key:

    pred → (key, pred=1, gold=0) ┐
                                 ├ union → per-batch partial sums (combiner)
    gold → (key, pred=0, gold=1) ┘        → groupby(key).sum
                                          → per-batch TP/FP/FN partials
                                          → global sum() → P/R/F1

so the scorer itself scales like any other aggregate — no driver-side
alignment loop (the reference's positional gold/pred alignment, SURVEY.md
§2.4 J4/J5, is replaced by the explicit span key).

The default key (doc, l, r, label) is the strict NERC regime; pass
``label_col="qid"`` for the end-to-end linking conformance the north-star
P/R ≥ 0.95 criterion is stated over ((subj, pred, obj) triples ≍
(url, span, qid)).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum

_KEY = ["doc", "l", "r", "label"]


def strict_span_prf_by_label(
    pred: Dataset,
    gold: Dataset,
    *,
    doc_col: str = "url",
    l_col: str = "l_art",
    r_col: str = "r_art",
    label_col: str = "entity",
) -> pa.Table:
    """Strict P/R/F1 broken down per label (the reference scorer's per-type
    report, ``ner_eval.py:714-906``) — one row per label, sorted by label."""
    keyed = _as_keyed(pred, doc_col, l_col, r_col, label_col, True).union(
        _as_keyed(gold, doc_col, l_col, r_col, label_col, False)
    )
    partial = keyed.map_batches(_partial_sum, batch_format="pyarrow")
    per_span = partial.groupby(_KEY).aggregate(
        Sum("pred", alias_name="pred"), Sum("gold", alias_name="gold")
    )

    def to_counts(t: pa.Table) -> pa.Table:
        has_p = pc.greater(t["pred"], 0)
        has_g = pc.greater(t["gold"], 0)
        return pa.table({
            "label": pc.cast(t["label"], pa.string()),
            "tp": pc.cast(pc.and_(has_p, has_g), pa.int64()),
            "fp": pc.cast(pc.and_(has_p, pc.invert(has_g)), pa.int64()),
            "fn": pc.cast(pc.and_(has_g, pc.invert(has_p)), pa.int64()),
        })

    grouped = per_span.map_batches(to_counts, batch_format="pyarrow").groupby(
        "label"
    ).aggregate(Sum("tp", alias_name="tp"), Sum("fp", alias_name="fp"),
                Sum("fn", alias_name="fn"))

    def finish(t: pa.Table) -> pa.Table:
        tp = t["tp"].to_numpy(zero_copy_only=False).astype(float)
        fp = t["fp"].to_numpy(zero_copy_only=False).astype(float)
        fn = t["fn"].to_numpy(zero_copy_only=False).astype(float)
        import numpy as np

        p = np.divide(tp, tp + fp, out=np.zeros_like(tp), where=(tp + fp) > 0)
        r = np.divide(tp, tp + fn, out=np.zeros_like(tp), where=(tp + fn) > 0)
        f1 = np.divide(2 * p * r, p + r, out=np.zeros_like(tp), where=(p + r) > 0)
        return pa.table({
            "label": t["label"],
            "tp": pc.cast(t["tp"], pa.int64()),
            "fp": pc.cast(t["fp"], pa.int64()),
            "fn": pc.cast(t["fn"], pa.int64()),
            "precision": pa.array(np.round(p, 6)),
            "recall": pa.array(np.round(r, 6)),
            "f1": pa.array(np.round(f1, 6)),
        })

    rows = grouped.sort("label").take_all()
    if not rows:
        return finish(pa.table({"label": pa.array([], type=pa.string()),
                                "tp": pa.array([], type=pa.int64()),
                                "fp": pa.array([], type=pa.int64()),
                                "fn": pa.array([], type=pa.int64())}))
    return finish(pa.Table.from_pylist(rows))


def ent_type_span_prf(
    pred: Dataset,
    gold: Dataset,
    *,
    doc_col: str = "url",
    l_col: str = "l_art",
    r_col: str = "r_art",
    label_col: str = "entity",
) -> pa.Table:
    """Type-match-with-overlap regime (reference ``ner_eval`` *ent_type*):
    a prediction is TP iff it overlaps an unmatched gold span of the same
    type (greedy 1-1 matching in start order); spurious → FP, unmatched
    gold → FN.

    Unlike the strict regime this needs both sides of a document together,
    so it shuffles once on the doc key and sweeps each doc's (tiny) span
    lists in-group — the per-doc Counter shape of the reference scorer
    (``ner_eval.py:104-110``), distributed.
    """
    p = _as_keyed(pred, doc_col, l_col, r_col, label_col, True)
    g = _as_keyed(gold, doc_col, l_col, r_col, label_col, False)

    def match_doc(t: pa.Table) -> pa.Table:
        rows = sorted(
            ((r["l"], r["r"], r["label"], bool(r["pred"])) for r in t.to_pylist()),
        )
        preds = [x for x in rows if x[3]]
        golds = [list(x) + [False] for x in rows if not x[3]]  # + matched flag
        tp = fp = 0
        for pl, pr, plabel, _ in preds:
            hit = None
            for gspan in golds:
                if not gspan[4] and gspan[2] == plabel and pl < gspan[1] and gspan[0] < pr:
                    hit = gspan
                    break
            if hit is not None:
                hit[4] = True
                tp += 1
            else:
                fp += 1
        fn = sum(1 for gspan in golds if not gspan[4])
        return pa.table({
            "tp": pa.array([tp], type=pa.int64()),
            "fp": pa.array([fp], type=pa.int64()),
            "fn": pa.array([fn], type=pa.int64()),
        })

    counts = p.union(g).groupby("doc").map_groups(match_doc, batch_format="pyarrow")
    sums = counts.sum(["tp", "fp", "fn"])
    tp, fp, fn = (int(sums[f"sum({c})"]) for c in ("tp", "fp", "fn"))
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return pa.table({
        "tp": pa.array([tp], type=pa.int64()),
        "fp": pa.array([fp], type=pa.int64()),
        "fn": pa.array([fn], type=pa.int64()),
        "precision": pa.array([round(prec, 6)], type=pa.float64()),
        "recall": pa.array([round(rec, 6)], type=pa.float64()),
        "f1": pa.array([round(f1, 6)], type=pa.float64()),
    })


def reference_gold_mentions(clean_pages: Dataset) -> Dataset:
    """Independent gold derivation for conformance scoring.

    A deliberately *separate* implementation from the tagger path: one
    word-boundary regex pass over the full article text (the generator
    injects aliases as single word-char tokens, sources/pages.py) — no
    segmentation, tokenization, BIO decode, or linker involved. Emits
    (url, l_art, r_art, qid) per hit, linked-only. Differences vs the
    pipeline are *real* semantic deltas (e.g. the reference's 512-token
    truncation drops late aliases; the gold keeps them), which is exactly
    what the P/R ≥ 0.95 criterion is meant to absorb.
    """
    import re

    from .sources.pages import GEN_ALIASES
    from .vocab import WIKIDATA_IDS

    alias_qid = {
        a: WIKIDATA_IDS[c]
        for c, aliases in GEN_ALIASES.items() if WIKIDATA_IDS[c] != "NIL"
        for a in aliases
    }
    pattern = re.compile(
        r"\b(" + "|".join(sorted(alias_qid, key=len, reverse=True)) + r")\b"
    )

    def find(t: pa.Table) -> pa.Table:
        urls, ls, rs, qids = [], [], [], []
        for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            for m in pattern.finditer(text or ""):
                urls.append(url)
                ls.append(m.start())
                rs.append(m.end())
                qids.append(alias_qid[m.group(1)])
        return pa.table({
            "url": pa.array(urls, type=pa.string()),
            "l_art": pa.array(ls, type=pa.int64()),
            "r_art": pa.array(rs, type=pa.int64()),
            "qid": pa.array(qids, type=pa.string()),
        })

    return clean_pages.map_batches(find, batch_format="pyarrow")


def linking_conformance(pages_path: str) -> pa.Table:
    """End-to-end conformance: pipeline mentions vs the independent gold,
    strict (url, span, qid) matching — the sandbox stand-in for 'P/R ≥ 0.95
    vs the reference tagger on the HIPE newsagency test set'."""
    from .pipelines import kg
    from .stages.extract import extract_text_batch, filter_pages

    pages = kg.read_pages(pages_path)
    mentions = kg.extract_mentions(pages)
    linked = mentions.map_batches(
        lambda t: t.filter(pc.not_equal(t["qid"], "NIL")), batch_format="pyarrow"
    )
    clean = kg.dedup_by_url(
        pages.map_batches(filter_pages, batch_format="pyarrow")
    ).map_batches(extract_text_batch, batch_format="pyarrow")
    gold = reference_gold_mentions(clean)
    return strict_span_prf(linked, gold, label_col="qid")


def _as_keyed(ds: Dataset, doc_col: str, l_col: str, r_col: str, label_col: str,
              is_pred: bool) -> Dataset:
    one = 1 if is_pred else 0

    def project(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "doc": pc.cast(t[doc_col], pa.string()),
            "l": pc.cast(t[l_col], pa.int64()),
            "r": pc.cast(t[r_col], pa.int64()),
            "label": pc.cast(t[label_col], pa.string()),
            "pred": pa.array([one] * n, type=pa.int64()),
            "gold": pa.array([1 - one] * n, type=pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _partial_sum(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return t
    g = t.group_by(_KEY).aggregate([("pred", "sum"), ("gold", "sum")])
    # select by NAME — pyarrow's key/aggregate column order is
    # version-dependent (older releases emitted aggregates first)
    return pa.table({**{k: g[k] for k in _KEY},
                     "pred": g["pred_sum"], "gold": g["gold_sum"]})


def strict_span_prf(
    pred: Dataset,
    gold: Dataset,
    *,
    doc_col: str = "url",
    l_col: str = "l_art",
    r_col: str = "r_art",
    label_col: str = "entity",
) -> pa.Table:
    """Strict span P/R/F1 of ``pred`` vs ``gold`` → one-row Arrow table.

    Duplicate identical spans on either side collapse to one (the strict
    regime counts a span once; the reference dedups via its per-doc span
    sets). Columns: tp, fp, fn, precision, recall, f1.
    """
    keyed = _as_keyed(pred, doc_col, l_col, r_col, label_col, True).union(
        _as_keyed(gold, doc_col, l_col, r_col, label_col, False)
    )
    partial = keyed.map_batches(_partial_sum, batch_format="pyarrow")
    per_span = partial.groupby(_KEY).aggregate(
        Sum("pred", alias_name="pred"), Sum("gold", alias_name="gold")
    )

    def to_counts(t: pa.Table) -> pa.Table:
        has_p = pc.greater(t["pred"], 0)
        has_g = pc.greater(t["gold"], 0)
        tp = pc.and_(has_p, has_g)
        return pa.table({
            "tp": pc.cast(tp, pa.int64()),
            "fp": pc.cast(pc.and_(has_p, pc.invert(has_g)), pa.int64()),
            "fn": pc.cast(pc.and_(has_g, pc.invert(has_p)), pa.int64()),
        })

    counts = per_span.map_batches(to_counts, batch_format="pyarrow")
    sums = counts.sum(["tp", "fp", "fn"])
    tp, fp, fn = (int(sums[f"sum({c})"]) for c in ("tp", "fp", "fn"))
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return pa.table({
        "tp": pa.array([tp], type=pa.int64()),
        "fp": pa.array([fp], type=pa.int64()),
        "fn": pa.array([fn], type=pa.int64()),
        "precision": pa.array([round(p, 6)], type=pa.float64()),
        "recall": pa.array([round(r, 6)], type=pa.float64()),
        "f1": pa.array([round(f1, 6)], type=pa.float64()),
    })
