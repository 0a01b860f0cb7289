"""Aho-Corasick automaton vs str.count / kernel-sweep equivalence,
Markov entropy-rate kernel vs hand math, Holt smoothing recursion."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray import ops
from newsagency_classification_ray.queries import (_holt_nano,
                                                   _markov_entropy_nano)


def _py_count(text: str, phrase: str) -> int:
    """Python str.count == non-overlapping left-to-right semantics."""
    return text.count(phrase)


@given(st.lists(st.text(alphabet="ab ", min_size=1, max_size=6),
                min_size=1, max_size=8, unique=True),
       st.text(alphabet="ab ", max_size=120))
@settings(max_examples=200, deadline=None)
def test_automaton_counts_match_str_count(phrases, text):
    phrases = [p for p in phrases if p]
    if not phrases:
        return
    ac = ops.AhoCorasickAutomaton(phrases)
    got = ac.count(text)
    for p, c in zip(ac.phrases, got):
        assert c == _py_count(text, p), (p, text)


def test_automaton_nested_and_overlap_semantics():
    ac = ops.AhoCorasickAutomaton(["aa", "aaa", "a"])
    got = dict(zip(ac.phrases, ac.count("aaaaa")))
    assert got == {"a": 5, "aa": 2, "aaa": 1}


def test_automaton_stage_equals_kernel_sweep(ray_session):
    docs = ["the hash join beat the sort merge twice: hash join wins",
            "table scan table scan table scan", "nothing here",
            "sort merge and a table scan", "", "aa aa aaaa"]
    t = pa.table({"text": pa.array(docs)})
    phrases = ["hash join", "table scan", "sort merge", "aa", "a", "absent"]
    ds = ray.data.from_arrow(t).repartition(3)
    a = {r["phrase"]: (r["n_docs"], r["n_hits"])
         for r in ops.gazetteer_counts(ds, phrases).take_all()}
    b = {r["phrase"]: (r["n_docs"], r["n_hits"])
         for r in ops.gazetteer_counts_automaton(ds, phrases).take_all()}
    assert a == b
    assert a["aa"] == (1, 4)  # 'aa aa aaaa': 1+1+2 non-overlapping


def test_markov_entropy_hand_math():
    # deterministic chain: entropy 0
    assert _markov_entropy_nano([("a", "b", 10), ("b", "a", 10)])[2] == 0
    # uniform 2-way from every state -> ln 2
    big, k, hn = _markov_entropy_nano(
        [("a", "a", 5), ("a", "b", 5), ("b", "a", 5), ("b", "b", 5)])
    assert (big, k) == (20, 2)
    assert abs(hn / 1e9 - math.log(2)) < 1e-9
    # weighted mixture
    cells = [("a", "a", 3), ("a", "b", 1), ("b", "b", 4)]
    big, k, hn = _markov_entropy_nano(cells)
    want = (4 / 8) * (-(3 / 4) * math.log(3 / 4) - (1 / 4) * math.log(1 / 4))
    assert abs(hn / 1e9 - want) < 1e-9
    assert _markov_entropy_nano([]) == (0, 0, 0)


def test_holt_recursion_matches_manual():
    cnts = [10, 12, 15, 14, 20]
    lv = 10.0
    b = 2.0
    for x in cnts[1:]:
        prev = lv
        lv = 0.5 * x + 0.5 * (lv + b)
        b = 0.3 * (lv - prev) + 0.7 * b
    glv, gb, gf = _holt_nano(cnts)
    assert abs(glv / 1e9 - lv) < 1e-9
    assert abs(gb / 1e9 - b) < 1e-9
    assert abs(gf / 1e9 - (lv + b)) < 1e-9
    assert _holt_nano([7]) == (0, 0, 0)
    # constant series: level == the constant, trend == 0
    glv, gb, gf = _holt_nano([9, 9, 9, 9])
    assert glv == 9 * 10**9 and gb == 0 and gf == 9 * 10**9
