"""Window functions, ordered sequences, rollup, bloom semi-join, triangle
enumeration, label propagation — brute-force property tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from newsagency_classification_ray.ops import (
    bloom_semi_join,
    grouped_sequence,
    label_propagation,
    rollup_sum,
    triangles,
    window_lag_lead,
)


def events_ds(n=200, seed=7, parts=5):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 3600, n), unit="s"),
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "value": rng.uniform(0, 10, n).round(3),
        "kind": rng.choice(["a", "b", "c"], n),
    })
    return df, ray.data.from_pandas(df).repartition(parts)


# ---------------------------------------------------------------- windows


def test_window_lag_lead_matches_pandas():
    df, ds = events_ds()
    out = window_lag_lead(ds, "user_id", ["ts", "event_id"], "value").to_pandas()
    exp = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = exp.groupby("user_id")["value"]
    exp["rn"] = g.cumcount() + 1
    exp["lag_value"] = g.shift(1)
    exp["lead_value"] = g.shift(-1)
    got = out.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    for c in ("rn", "lag_value", "lead_value"):
        pd.testing.assert_series_equal(
            got[c].reset_index(drop=True), exp[c].reset_index(drop=True),
            check_dtype=False, check_names=False)


def test_grouped_sequence_matches_pandas():
    df, ds = events_ds()
    out = grouped_sequence(ds, "user_id", ["ts", "event_id"], "kind").to_pandas()
    exp = (
        df.sort_values(["ts", "event_id"])
        .groupby("user_id")["kind"]
        .agg([("seq", ",".join), ("n", "size")])
        .reset_index()
    )
    got = out.sort_values("user_id").reset_index(drop=True)
    exp = exp.sort_values("user_id").reset_index(drop=True)
    assert got["seq"].tolist() == exp["seq"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()


# ----------------------------------------------------------------- rollup


def test_rollup_sum_matches_pandas():
    import pytest

    df, ds = events_ds()
    df["v_int"] = (df["value"] * 1000).round().astype(np.int64)
    # int keys can't hold the "ALL" sentinel → clear error, not silent junk
    with pytest.raises(ValueError, match="cast.*to string"):
        rollup_sum(ray.data.from_pandas(df).repartition(4),
                   ["kind", "user_id"], "v_int", "s")
    lvl2 = df.groupby(["kind", "user_id"])["v_int"].sum()
    exp = {(k, str(u)): v for (k, u), v in lvl2.items()}
    exp.update({(k, "ALL"): v for k, v in df.groupby("kind")["v_int"].sum().items()})
    exp[("ALL", "ALL")] = df["v_int"].sum()
    df2 = df.assign(user_id=df["user_id"].astype(str))
    ds2 = ray.data.from_pandas(df2).repartition(4)
    out2 = rollup_sum(ds2, ["kind", "user_id"], "v_int", "s").to_pandas()
    got2 = {(r.kind, r.user_id): r.s for r in out2.itertuples()}
    assert got2 == exp
    assert len(out2) == len(exp)


# ------------------------------------------------------------ bloom semi


def test_bloom_semi_join_exact_even_with_tiny_bitmap():
    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 1000, 500).astype(np.int64),
        "payload": np.arange(500, dtype=np.int64),
    })
    right = pd.DataFrame({"rk": rng.integers(0, 1000, 80).astype(np.int64)})
    exp = set(left[left["k"].isin(set(right["rk"]))]["payload"])
    for m_bits in (1 << 16, 64):  # 64 bits → huge FP rate; result still exact
        out = bloom_semi_join(
            ray.data.from_pandas(left).repartition(4),
            ray.data.from_pandas(right).repartition(3),
            "k", "rk", m_bits=m_bits,
        ).to_pandas()
        assert set(out["payload"]) == exp
        assert list(out.columns) == ["k", "payload"]


# -------------------------------------------------------------- triangles


def brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = set()
    for a, b in pairs:
        for c in adj[a] & adj[b]:
            out.add(tuple(sorted((a, b, c))))
    return out


def test_triangles_int_and_string_nodes():
    rng = np.random.default_rng(3)
    pairs = {tuple(sorted(p)) for p in rng.integers(0, 25, (150, 2)) if p[0] != p[1]}
    pairs = sorted((int(a), int(b)) for a, b in pairs)
    exp = brute_triangles(pairs)

    e_int = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], type=pa.int64()),
        "dst": pa.array([b for _, b in pairs], type=pa.int64()),
    })).repartition(4)
    got = {tuple(r) for r in triangles(e_int).to_pandas().itertuples(index=False)}
    assert got == exp

    e_str = ray.data.from_arrow(pa.table({
        "src": pa.array([f"Q{a}" for a, _ in pairs], type=pa.string()),
        "dst": pa.array([f"Q{b}" for _, b in pairs], type=pa.string()),
    })).repartition(4)
    got_s = {tuple(r) for r in triangles(e_str).to_pandas().itertuples(index=False)}
    exp_s = {tuple(sorted((f"Q{a}", f"Q{b}", f"Q{c}"))) for a, b, c in exp}
    assert got_s == exp_s


def test_triangles_star_has_none():
    # hub star: no triangles, and degree orientation keeps wedges bounded
    e = ray.data.from_arrow(pa.table({
        "src": pa.array([0] * 20, type=pa.int64()),
        "dst": pa.array(range(1, 21), type=pa.int64()),
    }))
    assert triangles(e).count() == 0


# ------------------------------------------------------ label propagation


def brute_lpa(s, d, w, iters):
    nodes = sorted(set(s) | set(d))
    lab = {v: v for v in nodes}
    for _ in range(iters):
        income = {}
        for a, b, ww in zip(s, d, w):
            t = income.setdefault(b, {})
            t[lab[a]] = t.get(lab[a], 0) + int(ww)
        lab = {v: (min(income[v].items(), key=lambda kv: (-kv[1], kv[0]))[0]
                   if v in income else lab[v]) for v in nodes}
    return lab


def test_label_propagation_matches_brute_force():
    rng = np.random.default_rng(9)
    # two planted cliques plus random noise edges, symmetrized
    pairs = set()
    for base in (0, 10):
        for i in range(base, base + 10):
            for j in range(i + 1, base + 10):
                pairs.add((i, j))
    for _ in range(8):
        a, b = sorted(rng.integers(0, 20, 2))
        if a != b:
            pairs.add((int(a), int(b)))
    s = [a for a, b in pairs] + [b for a, b in pairs]
    d = [b for a, b in pairs] + [a for a, b in pairs]
    w = rng.integers(1, 5, len(s)).astype(np.int64).tolist()
    exp = brute_lpa(s, d, w, iters=4)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(s, type=pa.int64()),
        "dst": pa.array(d, type=pa.int64()),
        "weight": pa.array(w, type=pa.int64()),
    })).repartition(4)
    out = label_propagation(ds, weight="weight", iters=4).to_pandas()
    assert dict(zip(out.node, out.label)) == exp
    # structure smoke: far fewer communities than nodes (synchronous LPA may
    # not fully converge a clique in 4 rounds — exactness vs brute force
    # above is the real contract)
    assert len(set(out.label)) <= 6


def test_label_propagation_unweighted_triangle_pair():
    # two triangles joined by one bridge edge, unweighted: each triangle
    # collapses to its min label
    s = [0, 1, 2, 3, 4, 5, 2] + [1, 2, 0, 4, 5, 3, 3]
    d = [1, 2, 0, 4, 5, 3, 3] + [0, 1, 2, 3, 4, 5, 2]
    exp = brute_lpa(s, d, [1] * len(s), iters=6)
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(s, type=pa.int64()),
        "dst": pa.array(d, type=pa.int64()),
    }))
    out = label_propagation(ds, iters=6).to_pandas()
    assert dict(zip(out.node, out.label)) == exp


# -------------------------------------------------------- group quantiles


def test_group_quantiles_matches_numpy():
    from newsagency_classification_ray.ops import group_quantiles

    df, ds = events_ds(n=300, seed=21)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    out = group_quantiles(ds, "kind", "value", qs).to_pandas()
    got = {(r.kind, r.q): r.value for r in out.itertuples()}
    exp = {}
    for kind, grp in df.groupby("kind")["value"]:
        v = np.sort(grp.to_numpy())
        for q in qs:
            exp[(kind, q)] = v[int(q * (len(v) - 1))]
    assert got == exp


# ------------------------------------------------------------- fuzzy pairs


def test_fuzzy_pairs_matches_brute_force():
    from newsagency_classification_ray.functions.textproc import edit_distance
    from newsagency_classification_ray.ops import fuzzy_pairs

    rng = np.random.default_rng(17)
    words = ["ring", "rings", "rink", "gear", "gears", "widget", "widgets",
             "bolt", "bolts", "belt", "xylophone"]
    n = 120
    df = pd.DataFrame({
        "pk": np.arange(n, dtype=np.int64),
        "name": [" ".join(rng.choice(words, 2)) for _ in range(n)],
        "brand": rng.choice(["B1", "B2", "B3"], n),
    })
    df.loc[5, "name"] = None  # null compares as ""
    exp = set()
    for _, grp in df.groupby("brand"):
        rows = list(grp.itertuples())
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                a, b = sorted((rows[x], rows[y]), key=lambda r: r.pk)
                d = edit_distance(a.name or "", b.name or "", 2)
                if d <= 2:
                    exp.add((a.brand, a.pk, b.pk, d))
    out = fuzzy_pairs(ray.data.from_pandas(df).repartition(4),
                      "brand", "pk", "name", max_dist=2).to_pandas()
    got = {tuple(r) for r in out.itertuples(index=False)}
    assert got == exp


# ------------------------------------------------------------ latest / BFS


def test_latest_by_key_matches_pandas():
    from newsagency_classification_ray.ops import latest_by_key

    df, ds = events_ds(n=400, seed=31, parts=7)
    out = latest_by_key(ds, ["user_id"], ["ts", "event_id"]).to_pandas()
    exp = (df.sort_values(["user_id", "ts", "event_id"])
           .groupby("user_id").tail(1))
    got = out.sort_values("user_id").reset_index(drop=True)
    exp = exp.sort_values("user_id").reset_index(drop=True)
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert len(got) == df["user_id"].nunique()
    # composite key path
    out2 = latest_by_key(ds, ["user_id", "kind"], ["ts", "event_id"]).to_pandas()
    exp2 = (df.sort_values(["user_id", "kind", "ts", "event_id"])
            .groupby(["user_id", "kind"]).tail(1))
    assert (set(zip(out2.user_id, out2.kind, out2.event_id))
            == set(zip(exp2.user_id, exp2.kind, exp2.event_id)))


def brute_khop(pairs_sym, seeds, k):
    import collections
    adj = collections.defaultdict(set)
    for a, b in pairs_sym:
        adj[a].add(b)
    hop = {s: 0 for s in seeds}
    frontier = set(seeds)
    for lvl in range(1, k + 1):
        nxt = {b for a in frontier for b in adj[a]} - set(hop)
        for b in nxt:
            hop[b] = lvl
        frontier = nxt
    return hop


def test_k_hop_matches_brute_force_bfs():
    from newsagency_classification_ray.ops import k_hop

    rng = np.random.default_rng(41)
    und = {tuple(sorted(p)) for p in rng.integers(0, 40, (60, 2)) if p[0] != p[1]}
    sym = [(int(a), int(b)) for a, b in und] + [(int(b), int(a)) for a, b in und]
    for seeds, k in (([0], 2), ([0, 39], 3), ([7], 0)):
        exp = brute_khop(sym, seeds, k)
        ds = ray.data.from_arrow(pa.table({
            "src": pa.array([a for a, _ in sym], type=pa.int64()),
            "dst": pa.array([b for _, b in sym], type=pa.int64()),
        })).repartition(4)
        out = k_hop(ds, seeds, k).to_pandas()
        assert dict(zip(out.node, out.hop)) == exp


def test_clustering_coefficient_composition():
    """The kg_clustering composition (triangles + degrees + left join)
    matches a brute-force local clustering coefficient."""
    from newsagency_classification_ray.ops import (
        _compact, distinct, hash_join, triangles,
    )
    from ray.data.aggregate import Count

    rng = np.random.default_rng(13)
    pairs = sorted({tuple(sorted((int(a), int(b))))
                    for a, b in rng.integers(0, 15, (40, 2)) if a != b})
    exp_tri = brute_triangles(pairs)
    tcount = {}
    for tri3 in exp_tri:
        for v in tri3:
            tcount[v] = tcount.get(v, 0) + 1
    degv = {}
    for a, b in pairs:
        degv[a] = degv.get(a, 0) + 1
        degv[b] = degv.get(b, 0) + 1
    und = ray.data.from_arrow(pa.table({
        "src": pa.array([a for a, _ in pairs], type=pa.int64()),
        "dst": pa.array([b for _, b in pairs], type=pa.int64()),
    })).repartition(3).materialize()
    tri = triangles(und)

    def ends(col):
        return lambda t: pa.table({"node": t[col]})

    tc = _compact(
        tri.map_batches(ends("a"), batch_format="pyarrow")
        .union(tri.map_batches(ends("b"), batch_format="pyarrow"))
        .union(tri.map_batches(ends("c"), batch_format="pyarrow"))
        .groupby("node").aggregate(Count(alias_name="t")))
    dg = _compact(
        und.map_batches(ends("src"), batch_format="pyarrow")
        .union(und.map_batches(ends("dst"), batch_format="pyarrow"))
        .groupby("node").aggregate(Count(alias_name="deg")))
    out = hash_join(dg, tc, on=("node",), how="left_outer").to_pandas()
    got_t = {r.node: 0 if pd.isna(r.t) else int(r.t) for r in out.itertuples()}
    got_d = dict(zip(out.node, out.deg))
    assert got_t == {v: tcount.get(v, 0) for v in degv}
    assert got_d == degv


def test_cube_sum_matches_pandas():
    from newsagency_classification_ray.ops import cube_sum

    df, _ = events_ds()
    df["v_int"] = (df["value"] * 1000).round().astype(np.int64)
    df["u"] = df["user_id"].astype(str)
    ds = ray.data.from_pandas(df).repartition(4)
    out = cube_sum(ds, ["kind", "u"], "v_int", "s").to_pandas()
    got = {(r.kind, r.u): r.s for r in out.itertuples()}
    exp = {(k, u): v for (k, u), v in df.groupby(["kind", "u"])["v_int"].sum().items()}
    exp.update({(k, "ALL"): v for k, v in df.groupby("kind")["v_int"].sum().items()})
    exp.update({("ALL", u): v for u, v in df.groupby("u")["v_int"].sum().items()})
    exp[("ALL", "ALL")] = df["v_int"].sum()
    assert got == exp
    assert len(out) == len(exp)
