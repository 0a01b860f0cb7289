"""Round-3 batch-2 operators: set ops (EXCEPT/INTERSECT), weighted
sampling, fixed-width histogram, categorical pivot, exact grouped moments —
each property-tested against a driver brute force."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from newsagency_classification_ray.ops import (
    except_distinct,
    grouped_moments,
    histogram_fixed,
    intersect_distinct,
    pivot_counts,
    weighted_sample_topk,
)


def _kv_ds(keys, vals):
    return ray.data.from_arrow(pa.table({
        "k": pa.array(keys, type=pa.int64()),
        "v": pa.array(vals, type=pa.string()),
    })).repartition(4)


def _pairs(ds):
    return {(r["k"], r["v"]) for r in ds.take_all()}


def test_except_intersect_distinct_brute(ray_session):
    rng = np.random.RandomState(7)
    lk, lv = rng.randint(0, 12, 120).tolist(), rng.choice(list("abc"), 120).tolist()
    rk, rv = rng.randint(0, 12, 90).tolist(), rng.choice(list("abc"), 90).tolist()
    left, right = _kv_ds(lk, lv), _kv_ds(rk, rv)
    lset, rset = set(zip(lk, lv)), set(zip(rk, rv))
    assert _pairs(except_distinct(left, right, ["k", "v"])) == lset - rset
    assert _pairs(intersect_distinct(left, right, ["k", "v"])) == lset & rset


def test_except_distinct_empty_sides(ray_session):
    left = _kv_ds([1, 1, 2], ["a", "a", "b"])
    empty = _kv_ds([], [])
    assert _pairs(except_distinct(left, empty, ["k", "v"])) == {(1, "a"), (2, "b")}
    assert _pairs(except_distinct(empty, left, ["k", "v"])) == set()
    assert _pairs(intersect_distinct(left, empty, ["k", "v"])) == set()


def test_weighted_sample_topk_brute(ray_session):
    rng = np.random.RandomState(3)
    ids = rng.permutation(500)[:200].astype(np.int64)
    w = rng.randint(0, 400, 200).astype(np.int64)  # includes w=0 -> clamp to 1
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids), "wt": pa.array(w),
        "tag": pa.array([f"t{i % 5}" for i in ids], type=pa.string()),
    })).repartition(6)
    out = weighted_sample_topk(ds, "doc_id", "wt", 15, keep_cols=["tag"]).to_pandas()
    u = ((ids * 2654435761) % 4294967296 + 1) / 4294967297.0
    key = u ** (1.0 / np.maximum(w, 1))
    exp = [int(i) for _, i in sorted(zip(-key, ids))][:15]
    assert out["doc_id"].tolist() == exp
    assert out["tag"].tolist() == [f"t{i % 5}" for i in exp]
    # determinism across partitionings
    out2 = weighted_sample_topk(ds.repartition(2), "doc_id", "wt", 15,
                                keep_cols=["tag"]).to_pandas()
    assert out2["doc_id"].tolist() == exp


def test_histogram_fixed_brute_with_negatives(ray_session):
    rng = np.random.RandomState(11)
    v = rng.randint(-250, 250, 400).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v)})).repartition(5)
    got = {r["bucket"]: (r["n"], r["min_v"], r["max_v"])
           for r in histogram_fixed(ds, "x", 100).take_all()}
    exp = {}
    for b in np.unique(v // 100):
        sel = v[v // 100 == b]
        exp[int(b)] = (len(sel), int(sel.min()), int(sel.max()))
    assert got == exp


def test_pivot_counts_brute(ray_session):
    rng = np.random.RandomState(2)
    keys = rng.choice(["k1", "k2", "k3"], 300).tolist()
    cats = rng.choice(["A", "B", "C", "D"], 300).tolist()  # D unlisted
    ds = ray.data.from_arrow(pa.table({"g": keys, "c": cats})).repartition(4)
    got = {r["g"]: (r["n_A"], r["n_B"], r["n_C"])
           for r in pivot_counts(ds, "g", "c", ["A", "B", "C"]).take_all()}
    df = pd.DataFrame({"g": keys, "c": cats})
    exp = {g: tuple(int(((grp["c"] == c).sum())) for c in "ABC")
           for g, grp in df.groupby("g")}
    assert got == exp


def test_grouped_moments_exact(ray_session):
    rng = np.random.RandomState(9)
    g = rng.choice(["p", "q"], 500)
    x = rng.randint(-50, 50, 500).astype(np.int64)
    y = rng.randint(0, 10_000, 500).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(g.tolist(), type=pa.string()),
        "x": pa.array(x), "y": pa.array(y),
    })).repartition(7)
    got = {r["g"]: (r["n"], r["sx"], r["sy"], r["sxx"], r["syy"], r["sxy"])
           for r in grouped_moments(ds, "g", "x", "y").take_all()}
    for grp in ("p", "q"):
        m = g == grp
        exp = (int(m.sum()), int(x[m].sum()), int(y[m].sum()),
               int((x[m] * x[m]).sum()), int((y[m] * y[m]).sum()),
               int((x[m] * y[m]).sum()))
        assert got[grp] == exp


def test_bm25_topk_brute(ray_session):
    from newsagency_classification_ray.stages.retrieval import bm25_topk

    rng = np.random.RandomState(4)
    vocab = ["cat", "dog", "fish", "bird", "cow"]
    texts = [" ".join(rng.choice(vocab, size=int(k)))
             for k in rng.randint(1, 30, 80)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(80), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })).repartition(5)
    terms = ["cat", "fish"]
    out = bm25_topk(ds, terms, k=10).to_pandas()

    n = len(texts)
    dls = np.array([len(t.split()) for t in texts], dtype=np.float64)
    avgdl = dls.sum() / n
    dfs = np.array([sum(1 for t in texts if w in t.split()) for w in terms])
    idf = np.log((n - dfs + 0.5) / (dfs + 0.5) + 1.0)
    scores = {}
    for i, t in enumerate(texts):
        toks = t.split()
        s = 0.0
        for j, w in enumerate(terms):
            tf = float(toks.count(w))
            if tf:
                s += (tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dls[i] / avgdl))) * idf[j]
        micro = int(np.floor(s * 1e6 + 0.5))
        if micro > 0:
            scores[i] = micro
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out.doc_id, out.score_micro)) == exp


def test_grouped_approx_distinct_accuracy_and_determinism(ray_session):
    from newsagency_classification_ray.ops import grouped_approx_distinct

    rng = np.random.RandomState(8)
    keys = rng.choice(["a", "b"], 6000).tolist()
    vals = rng.randint(0, 1500, 6000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys, type=pa.string()), "v": pa.array(vals),
    })).repartition(6)
    got = {r["k"]: r["approx_n"]
           for r in grouped_approx_distinct(ds, "k", "v", p=12).take_all()}
    for grp in ("a", "b"):
        exact = len({int(v) for k, v in zip(keys, vals) if k == grp})
        assert abs(got[grp] - exact) / exact < 0.05  # ~1.6% expected @ p=12
    # deterministic across partitionings (hash sketch, max-merge)
    got2 = {r["k"]: r["approx_n"]
            for r in grouped_approx_distinct(ds.repartition(2), "k", "v",
                                             p=12).take_all()}
    assert got == got2


def test_quantiles_histogram_matches_exact(ray_session):
    from newsagency_classification_ray.ops import exact_quantiles, quantiles_histogram

    rng = np.random.RandomState(6)
    # mixed continuous + heavy duplicate mass (exercises the bmin==bmax
    # short-circuit) + a few extremes
    v = np.concatenate([
        rng.lognormal(3, 1, 3000),
        np.full(2000, 7.5),
        [0.0, 1e6],
    ])
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, type=pa.float64())}))
    ds = ds.repartition(6)
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    hist = {r["q"]: r["value"] for r in quantiles_histogram(ds, "x", qs).to_pylist()}
    exact = {r["q"]: r["value"] for r in exact_quantiles(ds, "x", qs).to_pylist()}
    assert hist == exact
    # brute check too
    sv = np.sort(v)
    for q in qs:
        assert hist[q] == sv[int(q * (len(v) - 1))]


def test_quantiles_histogram_candidate_cap(ray_session):
    import pytest

    from newsagency_classification_ray.ops import quantiles_histogram

    rng = np.random.RandomState(1)
    v = rng.uniform(0, 1, 2000)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, type=pa.float64())}))
    with pytest.raises(ValueError, match="max_candidates"):
        quantiles_histogram(ds, "x", [0.5], num_buckets=2, max_candidates=10)


def test_skew_join_equals_hash_join(ray_session):
    from newsagency_classification_ray.ops import hash_join, skew_join

    rng = np.random.RandomState(12)
    # one key is half the left side -> forced through the salted path
    lk = np.concatenate([np.full(5000, 7), rng.randint(0, 40, 5000)]).astype(np.int64)
    lv = np.arange(len(lk), dtype=np.int64)
    rk = np.arange(0, 40, dtype=np.int64)
    rv = rk * 10
    left = ray.data.from_arrow(pa.table({"k": pa.array(lk), "lval": pa.array(lv)}))
    right = ray.data.from_arrow(pa.table({"k": pa.array(rk), "rval": pa.array(rv)}))
    left, right = left.repartition(6), right.repartition(3)
    got = skew_join(left, right, "k", salt=4, hot_threshold=1000)
    exp = hash_join(left, right, on=("k",))
    key = lambda r: (r["k"], r["lval"], r["rval"])
    assert sorted(map(key, got.take_all())) == sorted(map(key, exp.take_all()))


def test_skew_join_cold_path_identity(ray_session):
    from newsagency_classification_ray.ops import hash_join, skew_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], type=pa.int64()),
        "lval": pa.array([10, 20, 30, 40], type=pa.int64())}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 3, 9], type=pa.int64()),
        "rval": pa.array([200, 300, 900], type=pa.int64())}))
    got = skew_join(left, right, "k", hot_threshold=100)  # nothing hot
    exp = hash_join(left, right, on=("k",))
    key = lambda r: (r["k"], r["lval"], r["rval"])
    assert sorted(map(key, got.take_all())) == sorted(map(key, exp.take_all()))


def test_quantiles_histogram_linear_matches_numpy(ray_session):
    from newsagency_classification_ray.ops import quantiles_histogram

    rng = np.random.RandomState(14)
    v = rng.uniform(0, 1000, 3001)
    ds = ray.data.from_arrow(pa.table({"x": pa.array(v, type=pa.float64())}))
    ds = ds.repartition(5)
    qs = [0.1, 0.5, 0.9]
    got = {r["q"]: r["value"]
           for r in quantiles_histogram(ds, "x", qs,
                                        interpolation="linear").to_pylist()}
    sv = np.sort(v)
    for q in qs:
        p = q * (len(v) - 1)
        lo, hi = sv[int(np.floor(p))], sv[int(np.ceil(p))]
        assert got[q] == round(float(lo + (p - np.floor(p)) * (hi - lo)), 6)


def test_broadcast_join_duplicate_small_keys_arrow_path(ray_session):
    from newsagency_classification_ray.ops import broadcast_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], type=pa.int64()),
        "lval": pa.array(["a", "b", "c"], type=pa.string())}))
    # duplicate keys on the small side -> one-to-many expansion
    small = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                      "rval": pa.array([10, 11, 20], type=pa.int64())})
    got = sorted(((r["k"], r["lval"], r["rval"])
                  for r in broadcast_join(left, small, on="k").take_all()))
    assert got == [(1, "a", 10), (1, "a", 11), (2, "b", 20)]
    got_l = sorted(((r["k"], r["lval"], r["rval"])
                    for r in broadcast_join(left, small, on="k",
                                            how="left").take_all()))
    assert got_l == [(1, "a", 10), (1, "a", 11), (2, "b", 20), (3, "c", None)]


def test_grouped_ntile_stats_matches_sql_semantics(ray_session):
    """Randomized check of NTILE(k) bucket stats vs a brute-force Python
    implementation of the SQL sizing rule (first n%k tiles get ceil(n/k))."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import grouped_ntile_stats

    rng = np.random.RandomState(11)
    n = 700
    g = rng.randint(0, 7, size=n)          # one group likely < k rows
    v = rng.randint(0, 20, size=n).astype(np.float64)  # heavy ties
    i = rng.permutation(n).astype(np.int64)
    k = 4
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v, "id": i})).repartition(5)
    got = {(r["g"], r["tile"]): (r["n"], r["min_v"], r["max_v"])
           for r in grouped_ntile_stats(ds, "g", "v", "id", k).take_all()}

    want = {}
    for gg in np.unique(g):
        m = g == gg
        order = np.lexsort((i[m], v[m]))
        vs = v[m][order]
        nn = len(vs)
        base, rem = divmod(nn, k)
        pos = 0
        for tile in range(1, k + 1):
            size = base + (1 if tile <= rem else 0)
            if size == 0:
                continue
            want[(gg, tile)] = (size, vs[pos], vs[pos + size - 1])
            pos += size
    assert got == want


def test_grouped_ntile_stats_group_smaller_than_k(ray_session):
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import grouped_ntile_stats

    ds = ray.data.from_arrow(pa.table({
        "g": ["a", "a", "b"], "v": [3.0, 1.0, 9.0], "id": [1, 2, 3]}))
    rows = sorted((r["g"], r["tile"], r["n"], r["min_v"], r["max_v"])
                  for r in grouped_ntile_stats(ds, "g", "v", "id", 4).take_all())
    assert rows == [("a", 1, 1, 1.0, 1.0), ("a", 2, 1, 3.0, 3.0),
                    ("b", 1, 1, 9.0, 9.0)]


def test_grouped_mode_ties_and_partial_merge(ray_session):
    """Mode per group with ties → smallest value, across many blocks so the
    per-block partial counts must merge before the argmax."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from newsagency_classification_ray.ops import grouped_mode

    rng = np.random.RandomState(5)
    n = 2000
    g = rng.randint(0, 40, size=n)
    v = np.array(["abcde"[j] for j in rng.randint(0, 5, size=n)])
    ds = ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(8)
    got = {r["g"]: (r["top_value"], r["n"])
           for r in grouped_mode(ds, "g", "v").take_all()}

    df = pd.DataFrame({"g": g, "v": v}).groupby(["g", "v"]).size().reset_index(name="n")
    want = {}
    for gg, sub in df.groupby("g"):
        sub = sub.sort_values(["n", "v"], ascending=[False, True])
        want[gg] = (sub.iloc[0]["v"], int(sub.iloc[0]["n"]))
    assert got == want
