"""Attack tolerance, k-anon generalization ladder, distinct-2 diversity."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_attack_tolerance_monotone_and_sane():
    t = Q.QUERIES["kg_attack_tolerance"](SF).to_pandas() \
        .sort_values("k_removed")
    assert list(t.k_removed) == list(range(Q._ATTACK_STEPS))
    assert t.iloc[0].removed_node == ""
    assert (t.iloc[1:].removed_node != "").all()
    # node count drops by exactly one per removal
    assert (np.diff(t.n_nodes_left.to_numpy()) == -1).all()
    assert (t.giant_share_nano <= 10 ** 9).all()
    assert (t.giant_share_nano > 0).all()
    # removed hubs are distinct
    hubs = list(t.iloc[1:].removed_node)
    assert len(hubs) == len(set(hubs))


def test_kanon_ladder_monotone_and_chooses_first_satisfying():
    t = Q.QUERIES["pages_kanon_generalize"](SF).to_pandas() \
        .sort_values("level")
    assert list(t.rung) == ["host_day", "host_month", "tld_month",
                            "tld_year"]
    # generalizing can only shrink the class count and raise the minimum
    assert (np.diff(t.n_classes.to_numpy()) <= 0).all()
    assert (np.diff(t.min_class_size.to_numpy()) >= 0).all()
    assert int(t.chosen.sum()) == 1
    chosen = t[t.chosen].iloc[0]
    sat = t[t.satisfies_k]
    if len(sat):
        assert chosen.level == sat.level.min()
    else:
        assert chosen.level == t.level.max()


def test_distinct2_matches_bruteforce():
    t = Q.QUERIES["docs_distinct_ngram_diversity"](SF).to_pandas() \
        .set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    per: dict[str, Counter] = {}
    for r in docs.itertuples():
        toks = (r.text or "").split()
        per.setdefault(r.source, Counter()).update(
            zip(toks, toks[1:]))
    assert set(t.index) == {s for s, c in per.items() if c}
    for s, c in per.items():
        if not c:
            continue
        tot = sum(c.values())
        row = t.loc[s]
        assert int(row.n_bigrams) == tot
        assert int(row.n_distinct_bigrams) == len(c)
        assert int(row.distinct2_nano) == Q._div_nano(len(c), tot)
        assert 0 < row.distinct2_nano <= 10 ** 9
