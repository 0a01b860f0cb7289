"""HLL approximate distinct + M17 control-char scrub."""

import pyarrow as pa
import ray.data

from newsagency_classification_ray.functions.textproc import scrub_control_chars
from newsagency_classification_ray.ops import HyperLogLog, approx_distinct


def test_hll_estimate_within_error():
    import numpy as np

    hll = HyperLogLog(p=12)
    rng = np.random.RandomState(3)
    vals = (rng.randint(0, 1 << 32, size=50_000).astype(np.uint64) << np.uint64(32)) \
        | rng.randint(0, 1 << 32, size=50_000).astype(np.uint64)
    hll.add_hashes(vals)
    true = len(np.unique(vals))
    assert abs(hll.estimate() - true) / true < 0.05


def test_hll_merge_equals_union():
    import numpy as np

    a, b, u = HyperLogLog(p=10), HyperLogLog(p=10), HyperLogLog(p=10)
    va = np.arange(1, 5000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    vb = np.arange(3000, 9000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    a.add_hashes(va); b.add_hashes(vb)
    u.add_hashes(va); u.add_hashes(vb)
    assert a.merge(b).estimate() == u.estimate()


def test_approx_distinct_on_dataset(ray_session):
    n = 20_000
    ds = ray.data.from_arrow(pa.table({"v": pa.array([i % 1777 for i in range(n)])}))
    est = approx_distinct(ds, "v")
    assert abs(est - 1777) / 1777 < 0.05


def test_scrub_control_chars_length_preserving():
    s = "a\x00b\tc\nd​e"  # NUL, tab, newline, zero-width space
    out = scrub_control_chars(s)
    assert len(out) == len(s)
    assert out == "a b c d e"
    assert scrub_control_chars("plain text.") == "plain text."
