"""Token-bucket replay, AMS F2 sketch, SimRank on the agency graph."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def _brute_token_bucket(ts_us: np.ndarray) -> tuple[int, int]:
    cap = Q._TB_CAP_TOKENS * Q._TB_PERIOD_US
    cost = Q._TB_PERIOD_US
    b, adm, prev = cap, 0, int(ts_us[0])
    for t in ts_us:
        b = min(cap, b + int(t) - prev)
        prev = int(t)
        if b >= cost:
            b -= cost
            adm += 1
    return adm, b


def test_token_bucket_matches_bruteforce():
    t = Q.QUERIES["events_token_bucket"](SF).to_pandas() \
        .set_index("user_id").sort_index()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "event_id"]).to_pandas()
    ev["tus"] = ev.ts.astype("datetime64[us]").astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["tus", "event_id"])
        adm, lvl = _brute_token_bucket(g.tus.to_numpy())
        row = t.loc[uid]
        assert row.n_events == len(g)
        assert row.n_admitted == adm
        assert row.n_dropped == len(g) - adm
        assert row.final_level_us == lvl
        # invariants: first event always admits; level within [0, cap]
        assert row.n_admitted >= 1
        assert 0 <= row.final_level_us <= Q._TB_CAP_TOKENS * Q._TB_PERIOD_US


def test_ams_f2_exact_and_estimate():
    t = Q.QUERIES["events_ams_f2"](SF).to_pandas().iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    c = ev.groupby("user_id").size().to_numpy().astype(np.int64)
    f2 = int((c * c).sum())
    assert t.f2_exact == f2
    # recompute the sketch independently from the same sign hash
    u = ev.user_id.to_numpy().astype(np.int64)
    k = Q._AMS_GROUPS * Q._AMS_PER_GROUP
    x = [int(Q._ams_signs(u, j).sum()) for j in range(k)]
    means = sorted(
        Q._div_nano(sum(x[g * Q._AMS_PER_GROUP + i] ** 2
                        for i in range(Q._AMS_PER_GROUP)),
                    Q._AMS_PER_GROUP)
        for g in range(Q._AMS_GROUPS))
    assert t.f2_est_nano == means[Q._AMS_GROUPS // 2]
    assert t.rel_err_nano == Q._div_nano(
        abs(int(t.f2_est_nano) - f2 * 10**9), f2 * 10**9)
    # the median-of-means estimator should be in the right ballpark
    assert t.rel_err_nano < 10**9  # within 100 % of exact


def _simrank_naive(pairs: set[tuple[str, str]], iters: int):
    nodes = sorted({q for p in pairs for q in p})
    nbr = {q: set() for q in nodes}
    for a, b in pairs:
        nbr[a].add(b)
        nbr[b].add(a)
    s = {(a, b): (10**9 if a == b else 0) for a in nodes for b in nodes}
    for _ in range(iters):
        nxt = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    nxt[(a, b)] = 10**9
                    continue
                tot = sum(s[(u, v)] for u in nbr[a] for v in nbr[b])
                d = 10 * len(nbr[a]) * len(nbr[b])
                nxt[(a, b)] = (16 * tot + d) // (2 * d)
        s = nxt
    return s


def test_simrank_matches_naive_integer_recurrence():
    t = Q.QUERIES["kg_simrank"](SF).to_pandas()
    rows = (Q.kg.cooccurrence_edges(Q._mentions(SF)).map_batches(
        lambda b: b.select(["src_qid", "dst_qid"]),
        batch_format="pyarrow").take_all())
    pairs = {(r["src_qid"], r["dst_qid"]) for r in rows}
    s = _simrank_naive(pairs, Q._SIMRANK_ITERS)
    expect = sorted(((a, b, v) for (a, b), v in s.items()
                     if a < b and v > 0),
                    key=lambda r: (-r[2], r[0], r[1]))[:Q._SIMRANK_TOP]
    got = list(t.itertuples(index=False, name=None))
    assert got == expect
    # symmetry of the recurrence
    for (a, b), v in s.items():
        assert s[(b, a)] == v
