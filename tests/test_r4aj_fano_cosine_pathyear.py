"""Fano-factor integer identity, cos² rational identity, path-year regex
parity between Arrow and DuckDB kernels."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from newsagency_classification_ray.queries import _div_nano


@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_fano_numerator_nonnegative_and_zero_iff_constant(cnts):
    n, s, s2 = len(cnts), sum(cnts), sum(c * c for c in cnts)
    num = n * s2 - s * s
    assert num >= 0  # Cauchy-Schwarz
    assert (num == 0) == (len(set(cnts)) == 1)
    if s:
        fano = _div_nano(num, n * s)
        # constant series -> 0; Bernoulli-like 0/2 alternation -> var=1, mean=1
        if len(set(cnts)) == 1:
            assert fano == 0


def test_fano_hand_values():
    # days [0, 2]: mean 1, var 1 -> fano = 1.0
    assert _div_nano(2 * 4 - 4, 2 * 2) == 10**9
    # days [3, 3, 3]: fano 0
    assert _div_nano(3 * 27 - 81, 3 * 9) == 0


def test_cos2_rational_identity():
    # parallel profiles -> cos² == 1
    a = [1, 2, 3]
    b = [2, 4, 6]
    dot = sum(x * y for x, y in zip(a, b))
    na2 = sum(x * x for x in a)
    nb2 = sum(x * x for x in b)
    assert _div_nano(dot * dot, na2 * nb2) == 10**9
    # orthogonal -> 0
    assert _div_nano(0, 5 * 7) == 0


def test_cos2_survives_int64_overflow_magnitudes():
    # hourly counts ~1e12 per bin: dot² ~ 1e50 — must stay exact
    a = [10**12] * 24
    b = [10**12] * 24
    dot = sum(x * y for x, y in zip(a, b))
    assert _div_nano(dot * dot, dot * dot) == 10**9


def test_path_year_regex_parity_with_duckdb():
    urls = ["https://news4.example.ch/1978/10/03/article-0",
            "http://h.example.lu/2001/01/31/x",
            "https://h.example.ch/notyear/05/a",
            "https://h.example.ch/123/05/a"]
    ex = pc.extract_regex(pa.array(urls), pattern=r"://[^/]+/(?P<y>\d{4})/")
    got = pc.struct_field(ex, "y").to_pylist()
    con = duckdb.connect()
    for u, g in zip(urls, got):
        want = con.execute(
            r"SELECT nullif(regexp_extract(?, '://[^/]+/(\d{4})/', 1), '')",
            [u]).fetchone()[0]
        assert g == want, u
