"""Host lang mix, token case profile, key density."""

from __future__ import annotations

import glob
import re

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
from newsagency_classification_ray.sources.pages import ensure_pages

SF = "/root/testdata/sf0.001"


def test_host_lang_mix_matches_bruteforce():
    t = Q.QUERIES["pages_host_lang_mix"](SF).to_pandas() \
        .set_index("mix")
    from collections import Counter, defaultdict
    per = defaultdict(set)
    for f in glob.glob(ensure_pages(SF) + "/*.parquet"):
        tb = pq.read_table(f, columns=["url", "lang"])
        for u, lg in zip(tb["url"].to_pylist(), tb["lang"].to_pylist()):
            per[re.sub(r"/.*$", "", re.sub(r"^[a-z]+://", "", u))] \
                .add(lg)

    def mix(langs):
        gated = langs & {"fr", "de"}
        if not gated:
            return "ungated_only"
        if gated == {"fr"}:
            return "fr_only"
        if gated == {"de"}:
            return "de_only"
        return "both"

    census = Counter(mix(v) for v in per.values())
    assert set(t.index) == set(census)
    for k, v in census.items():
        assert t.loc[k].n_hosts == v


def test_token_case_profile_matches_bruteforce():
    t = Q.QUERIES["docs_token_case_profile"](SF).to_pandas() \
        .set_index("case_class")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    from collections import Counter
    census = Counter()
    for txt in docs.text:
        for w in txt.split():
            if not w:
                continue
            if re.fullmatch(r"[A-Z]+", w):
                census["ALLCAPS"] += 1
            elif re.fullmatch(r"[A-Z][a-z]+", w):
                census["Capitalized"] += 1
            elif re.fullmatch(r"[a-z]+", w):
                census["lower"] += 1
            else:
                census["other"] += 1
    total = sum(census.values())
    nonzero = {k: v for k, v in census.items() if v}
    assert set(t.index) == set(nonzero)
    for k, v in nonzero.items():
        assert t.loc[k].n_occurrences == v
        assert t.loc[k].share_nano == Q._div_nano(v, total)


def test_key_density_matches_bruteforce():
    t = Q.QUERIES["orders_key_density"](SF).to_pandas().iloc[0]
    k = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey"])["o_orderkey"] \
        .to_numpy().astype(np.int64)
    assert t.n_orders == len(k)
    assert (t.min_key, t.max_key) == (int(k.min()), int(k.max()))
    assert t.density_nano == Q._div_nano(
        len(k), int(k.max()) - int(k.min()) + 1)
    assert 0 < t.density_nano <= 10**9
