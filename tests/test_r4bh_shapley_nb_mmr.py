"""Exact Shapley attribution, NB language confusion, MMR diversified top-k."""

from __future__ import annotations

import itertools
import math

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.stages.textstats as ts

SF = "/root/testdata/sf0.001"


def _touched_sets():
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id",
                                "event_type"]).to_pandas()
    ev["tsi"] = ev.ts.astype("int64")
    sets = {}
    for uid, g in ev.groupby("user_id"):
        p = g[g.event_type == "purchase"].sort_values(["tsi", "event_id"])
        if p.empty:
            continue
        pts, peid = p.tsi.iloc[0], p.event_id.iloc[0]
        pre = g[(g.tsi < pts) | ((g.tsi == pts) & (g.event_id < peid))]
        sets[uid] = frozenset(t for t in pre.event_type if t != "purchase")
    return sets


def test_shapley_matches_permutation_definition():
    """Coalition-formula output == brute permutation-average Shapley."""
    t = Q.QUERIES["events_shapley"](SF).to_pandas().set_index("channel")
    sets = _touched_sets()
    channels = sorted(t.index)
    k = len(channels)

    def v(coal: frozenset) -> int:
        return sum(1 for s in sets.values() if s <= coal)

    want = {c: 0 for c in channels}
    for perm in itertools.permutations(channels):
        cur: frozenset = frozenset()
        for c in perm:
            want[c] += v(cur | {c}) - v(cur)
            cur = cur | {c}
    # permutation sum == phi * k! / (k!/k!) -> each phi_kfact equals the sum
    for c in channels:
        assert int(t.loc[c].phi_kfact) == want[c]
    # efficiency: sum phi_kfact == k! * (v(all) - v(empty))
    assert t.phi_kfact.sum() == math.factorial(k) * (
        v(frozenset(channels)) - v(frozenset()))
    # n_users: converted users whose pre-purchase set contains the channel
    for c in channels:
        assert int(t.loc[c].n_users) == sum(
            1 for s in sets.values() if c in s)


def test_nb_confusion_totals_and_kernel():
    t = Q.QUERIES["docs_nb_confusion"](SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    assert t.n_docs.sum() == len(docs)
    # per-true-lang marginals match the corpus
    marg = t.groupby("lang_true").n_docs.sum()
    want = docs.groupby("lang").size()
    assert (marg.sort_index() == want.sort_index()).all()
    # kernel: argmax of the nano-log score, ties to the smallest index
    cm = np.array([[5, 0], [5, 0]], dtype=float)
    dc = np.array([3, 3])
    model = ts.nb_nano_log_model(cm, dc)
    assert ts.nb_predict_doc(["x"], *model) == 0  # exact tie -> index 0
    cm2 = np.array([[9, 0], [0, 9]], dtype=float)
    m2 = ts.nb_nano_log_model(cm2, dc)
    b = int(ts.nb_buckets(["tok"])[0])
    cm3 = np.zeros((2, ts._NB_BUCKETS))
    cm3[1, b] = 50
    m3 = ts.nb_nano_log_model(cm3, dc)
    assert ts.nb_predict_doc(["tok"], *m3) == 1


def test_mmr_brute_force_equivalence():
    t = Q.QUERIES["embeddings_mmr"](SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    qz = np.array([[Q._q6(x) for x in v] for v in emb.embedding])
    ids = emb.vec_id.to_numpy()
    qid = ids.min()
    q = qz[ids == qid][0]
    simq = qz @ q
    mask = ids != qid
    cids, csim = ids[mask], simq[mask]
    order = np.lexsort((cids, -csim))[:Q._MMR_POOL]
    cids, csim = cids[order], csim[order]
    pos = {int(i): j for j, i in enumerate(cids)}
    cmat = qz[[int(np.flatnonzero(ids == i)[0]) for i in cids]]
    pd_mat = cmat @ cmat.T
    sel: list[int] = []
    rows = []
    remaining = set(int(i) for i in cids)
    for step in range(1, Q._MMR_K + 1):
        best = None
        for i in sorted(remaining):
            pen = max(int(pd_mat[pos[i], pos[s]]) for s in sel) if sel else 0
            sc = 7 * int(csim[pos[i]]) - 3 * pen
            if best is None or sc > best[0]:
                best = (sc, i)
        sel.append(best[1])
        remaining.discard(best[1])
        rows.append((step, best[1], int(csim[pos[best[1]]]), best[0]))
    got = list(t.itertuples(index=False, name=None))
    assert got == rows
    # scores are non-increasing (penalties only grow, pool only shrinks)
    assert (np.diff(t.mmr_score.to_numpy()) <= 0).all()
    assert t.vec_id.nunique() == len(t)
