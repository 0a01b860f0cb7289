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
        # Order note: the reference scorer walks entities in FILE order; we
        # sort by (l, r, label) because rows arrive shuffle-reordered. BIO
        # decoding cannot produce two entities with the same start offset,
        # so for non-nested spans (the only kind a token-level tagger
        # emits) start order == file order and the greedy match below is
        # identical — pinned bit-exact in test_reference_scorer_parity.
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


_REGIMES = ("strict", "ent_type", "partial", "exact")
_KINDS = ("correct", "incorrect", "partial", "missed", "spurious")
_SER_KINDS = ("deletion", "insertion", "substitution_type",
              "substitution_span", "substitution_both")


def _match_segment(golds: list, preds: list, bump) -> None:
    """Faithful per-segment reproduction of the reference scorer's scenario
    walk (``HIPE-scorer/hipe_evaluation/ner_eval.py:387-631``), including its
    asymmetries: scenario I (exact) and IV (type substitution at equal
    boundaries) do NOT consult the already-overlapped list; V/VI (span
    overlap) do. Spans are (l, r, label) with r EXCLUSIVE — the reference's
    inclusive ``range(start, end+1)`` overlap equals half-open intersection.

    ``bump(regime, kind, label)`` accumulates; SER scenario tallies go to
    regime ``"ser"`` (the reference tracks them in comments and leaves
    ``compute_slot_error_rate`` NotImplementedError; we keep the counts).
    """
    overlapped: list = []
    for p in preds:
        hit = next((g for g in golds if g == p), None)
        if hit is not None:  # scenario I: exact type+boundaries
            for reg in _REGIMES:
                bump(reg, "correct", hit[2])
            overlapped.append(hit)
            continue
        found = False
        for g in golds:
            if g[0] == p[0] and g[1] == p[1] and g[2] != p[2]:
                # scenario IV: boundaries equal, type differs
                bump("strict", "incorrect", g[2])
                bump("ent_type", "incorrect", g[2])
                bump("partial", "correct", g[2])
                bump("exact", "correct", g[2])
                bump("ser", "substitution_type", g[2])
                overlapped.append(g)
                found = True
                break
            elif max(g[0], p[0]) < min(g[1], p[1]) and g not in overlapped:
                overlapped.append(g)
                found = True
                if g[2] == p[2]:  # scenario V: span substitution, same type
                    bump("strict", "incorrect", g[2])
                    bump("ent_type", "correct", g[2])
                    bump("partial", "partial", g[2])
                    bump("exact", "incorrect", g[2])
                    bump("ser", "substitution_span", g[2])
                else:              # scenario VI: span AND type substitution
                    bump("strict", "incorrect", g[2])
                    bump("ent_type", "incorrect", g[2])
                    bump("partial", "partial", g[2])
                    bump("exact", "incorrect", g[2])
                    bump("ser", "substitution_both", g[2])
                break
        if not found:  # scenario II: spurious
            for reg in _REGIMES:
                bump(reg, "spurious", p[2])
            bump("ser", "insertion", p[2])
    for g in golds:
        if g not in overlapped:  # scenario III: missed
            for reg in _REGIMES:
                bump(reg, "missed", g[2])
            bump("ser", "deletion", g[2])


def hipe_counts(
    pred: Dataset,
    gold: Dataset,
    *,
    doc_col: str = "document_id",
    seg_col: str = "seg",
    l_col: str = "l",
    r_col: str = "r",
    label_col: str = "label",
    by_doc: bool = False,
) -> pa.Table:
    """Distributed scenario counts for ALL four HIPE regimes + SER tallies.

    The reference accumulates per-segment Counters in a driver loop
    (``ner_eval.py:254-306``); here both sides shuffle once on the doc key,
    each doc's (tiny) span lists are matched segment-by-segment in-group,
    and the long-format (label, regime, kind, n) partials reduce through one
    small groupby — the scorer scales like any other aggregate. Predictions
    whose label is not in the gold tag set are dropped before matching
    (``ner_eval.py:425-435``); the tag set is collected once (tiny).
    """
    from collections import Counter

    def project(ds: Dataset, is_pred: int) -> Dataset:
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            return pa.table({
                "doc": pc.cast(t[doc_col], pa.string()),
                "seg": pc.cast(t[seg_col], pa.int64()),
                "l": pc.cast(t[l_col], pa.int64()),
                "r": pc.cast(t[r_col], pa.int64()),
                "label": pc.cast(t[label_col], pa.string()),
                "pred": pa.array([is_pred] * n, type=pa.int64()),
            })
        return ds.map_batches(fn, batch_format="pyarrow")

    g_keyed = project(gold, 0)
    tags = frozenset(
        r["label"]
        for r in g_keyed.groupby("label").count().select_columns(["label"]).take_all()
    )

    def per_doc(t: pa.Table) -> pa.Table:
        segs: dict[int, tuple[list, list]] = {}
        for row in t.to_pylist():
            segs.setdefault(row["seg"], ([], []))[row["pred"]].append(
                (row["l"], row["r"], row["label"])
            )
        acc: Counter = Counter()

        def bump(reg: str, kind: str, label: str) -> None:
            acc[(label, reg, kind)] += 1

        for s in sorted(segs):
            golds, preds = segs[s]
            golds.sort()
            preds.sort()
            preds = [p for p in preds if p[2] in tags]
            _match_segment(golds, preds, bump)
        keys = sorted(acc)
        cols = {
            "label": pa.array([k[0] for k in keys], type=pa.string()),
            "regime": pa.array([k[1] for k in keys], type=pa.string()),
            "kind": pa.array([k[2] for k in keys], type=pa.string()),
            "n": pa.array([acc[k] for k in keys], type=pa.int64()),
        }
        if by_doc:
            doc = t["doc"][0].as_py()
            cols = {"doc": pa.array([doc] * len(keys), type=pa.string()), **cols}
        return pa.table(cols)

    counts = g_keyed.union(project(pred, 1)).groupby("doc").map_groups(
        per_doc, batch_format="pyarrow"
    )
    group_keys = (["doc"] if by_doc else []) + ["label", "regime", "kind"]
    summed = counts.groupby(group_keys).aggregate(Sum("n", alias_name="n"))
    rows = summed.take_all()
    if not rows:
        return pa.table({**({"doc": pa.array([], type=pa.string())} if by_doc else {}),
                         "label": pa.array([], type=pa.string()),
                         "regime": pa.array([], type=pa.string()),
                         "kind": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    return pa.Table.from_pylist(rows)


def _regime_row(counts: dict[str, int], partial_credit: bool) -> dict:
    correct = counts.get("correct", 0)
    incorrect = counts.get("incorrect", 0)
    partial = counts.get("partial", 0)
    missed = counts.get("missed", 0)
    spurious = counts.get("spurious", 0)
    # SemEval-2013 task 9.1 possible/actual (ner_eval.py:714-743)
    possible = correct + incorrect + partial + missed
    actual = correct + incorrect + partial + spurious
    num = correct + 0.5 * partial if partial_credit else correct
    p = num / actual if actual else 0.0
    r = num / possible if possible else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {
        "correct": correct, "incorrect": incorrect, "partial": partial,
        "missed": missed, "spurious": spurious,
        "possible": possible, "actual": actual,
        "tp": correct, "fp": actual - correct, "fn": possible - correct,
        "precision": p, "recall": r, "f1": f1,  # raw; callers round for display
    }


def hipe_regime_scores(
    pred: Dataset,
    gold: Dataset,
    *,
    per_label: bool = False,
    counts: pa.Table | None = None,
    **key_cols,
) -> pa.Table:
    """All four HIPE evaluation regimes (strict / ent_type / partial /
    exact), micro counts + P/R/F1 — one row per regime (× label when
    ``per_label``). The partial regime rewards half credit
    (``ner_eval.py:746-775``); the others count ``correct`` only.
    Bit-exact against the reference scorer's frozen result JSONs
    (tests/test_reference_scorer_parity)."""
    if counts is None:
        counts = hipe_counts(pred, gold, **key_cols)
    acc: dict[tuple[str, str], dict[str, int]] = {}
    for row in counts.to_pylist():
        if row["regime"] == "ser":
            continue
        key = (row["label"] if per_label else "ALL", row["regime"])
        acc.setdefault(key, {})[row["kind"]] = (
            acc.setdefault(key, {}).get(row["kind"], 0) + row["n"]
        )
    out_rows = []
    for (label, regime) in sorted(acc):
        row = {"regime": regime, **_regime_row(acc[(label, regime)],
                                               partial_credit=regime == "partial")}
        for k in ("precision", "recall", "f1"):
            row[k] = round(row[k], 6)
        if per_label:
            row = {"label": label, **row}
        out_rows.append(row)
    return pa.Table.from_pylist(out_rows)


def hipe_macro_type_scores(
    pred: Dataset,
    gold: Dataset,
    *,
    counts: pa.Table | None = None,
    **key_cols,
) -> pa.Table:
    """Entity-type-averaged macro P/R/F1 per regime (reference
    ``compute_macro_type_scores``, ner_eval.py:807-848): plain mean of the
    per-type micro scores over all types touched by the evaluation, plus
    the recomputed-from-macro-P/R F1 variant."""
    import numpy as np

    if counts is None:
        counts = hipe_counts(pred, gold, **key_cols)
    acc: dict[tuple[str, str], dict[str, int]] = {}
    for row in counts.to_pylist():
        if row["regime"] == "ser":
            continue
        d = acc.setdefault((row["label"], row["regime"]), {})
        d[row["kind"]] = d.get(row["kind"], 0) + row["n"]
    by_regime: dict[str, list[dict]] = {}
    for (label, regime), kinds in acc.items():
        by_regime.setdefault(regime, []).append(
            _regime_row(kinds, partial_credit=regime == "partial")
        )
    out = []
    for regime in sorted(by_regime):
        rows = by_regime[regime]
        p = float(np.mean([r["precision"] for r in rows]))
        r_ = float(np.mean([r["recall"] for r in rows]))
        f1 = float(np.mean([r["f1"] for r in rows]))
        f1_pr = 2 * p * r_ / (p + r_) if p + r_ else 0.0
        out.append({"regime": regime, "n_types": len(rows),
                    "p_macro": round(p, 6), "r_macro": round(r_, 6),
                    "f1_macro": round(f1, 6),
                    "f1_macro_from_pr": round(f1_pr, 6)})
    return pa.Table.from_pylist(out)


def hipe_macro_doc_scores(
    pred: Dataset,
    gold: Dataset,
    *,
    counts: pa.Table | None = None,
    **key_cols,
) -> pa.Table:
    """Document-averaged macro P/R/F1 per regime (reference
    ``accumulate_doc_scores`` + ``compute_macro_doc_scores``,
    ner_eval.py:333-360,851-870): per-doc micro scores with the reference's
    dismissal rules — a doc contributes to P only when it predicted
    something (actual ≠ 0), to R only when gold has entities (possible ≠
    0), to F1 only when both — then mean and population std across the
    contributing docs."""
    import numpy as np

    if counts is None:
        counts = hipe_counts(pred, gold, by_doc=True, **key_cols)
    acc: dict[tuple[str, str], dict[str, int]] = {}
    for row in counts.to_pylist():
        if row["regime"] == "ser":
            continue
        key = (row["doc"], row["regime"])
        d = acc.setdefault(key, {})
        d[row["kind"]] = d.get(row["kind"], 0) + row["n"]
    lists: dict[str, dict[str, list[float]]] = {}
    for (doc, regime), kinds in acc.items():
        m = _regime_row(kinds, partial_credit=regime == "partial")
        ls = lists.setdefault(regime, {"p": [], "r": [], "f1": []})
        if m["actual"] != 0:
            ls["p"].append(m["precision"])
        if m["possible"] != 0:
            ls["r"].append(m["recall"])
        if m["actual"] != 0 and m["possible"] != 0:
            ls["f1"].append(m["f1"])
    out = []
    for regime in sorted(lists):
        ls = lists[regime]
        row = {"regime": regime}
        for name, vals in (("p_macro_doc", ls["p"]), ("r_macro_doc", ls["r"]),
                           ("f1_macro_doc", ls["f1"])):
            row[name] = round(float(np.mean(vals)), 6) if vals else None
            row[name + "_std"] = round(float(np.std(vals)), 6) if vals else None
        out.append(row)
    return pa.Table.from_pylist(out)


def hipe_slot_error_rate(
    pred: Dataset,
    gold: Dataset,
    *,
    counts: pa.Table | None = None,
    **key_cols,
) -> pa.Table:
    """Slot error rate (Makhoul et al. 1999): SER = (S + D + I) / R over the
    scenario tallies the reference scorer tracks but never finalizes
    (``ner_eval.py:873-879`` raises NotImplementedError; its commented-out
    accumulators map deletion←missed, insertion←spurious, substitutions←
    scenarios IV/V/VI). R = gold slots = strict ``possible``."""
    if counts is None:
        counts = hipe_counts(pred, gold, **key_cols)
    ser: dict[str, int] = {k: 0 for k in _SER_KINDS}
    possible = 0
    for row in counts.to_pylist():
        if row["regime"] == "ser":
            ser[row["kind"]] += row["n"]
        elif row["regime"] == "strict" and row["kind"] in (
            "correct", "incorrect", "partial", "missed"
        ):
            possible += row["n"]
    subs = (ser["substitution_type"] + ser["substitution_span"]
            + ser["substitution_both"])
    total = subs + ser["deletion"] + ser["insertion"]
    return pa.table({
        "deletions": pa.array([ser["deletion"]], type=pa.int64()),
        "insertions": pa.array([ser["insertion"]], type=pa.int64()),
        "substitutions": pa.array([subs], type=pa.int64()),
        "reference_slots": pa.array([possible], type=pa.int64()),
        "ser": pa.array([round(total / possible, 6) if possible else 0.0],
                        type=pa.float64()),
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
