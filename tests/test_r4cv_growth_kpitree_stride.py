"""Growth accounting, KPI tree, frame stride sweep."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import newsagency_classification_ray.queries as Q
import newsagency_classification_ray.stages.multimodal as mm

SF = "/root/testdata/sf0.001"


def test_growth_accounting_matches_bruteforce():
    t = Q.QUERIES["events_growth_accounting"](SF).to_pandas() \
        .set_index("month_idx")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["m"] = ev.ts.dt.year * 12 + ev.ts.dt.month - 1
    by_m = {int(m): set(g.user_id) for m, g in ev.groupby("m")}
    seen = set()
    for m in sorted(by_m):
        cur = by_m[m]
        prev = by_m.get(m - 1, set())
        row = t.loc[m]
        assert row.n_mau == len(cur)
        assert row.n_new == len(cur - seen)
        assert row.n_retained == len(cur & prev)
        assert row.n_resurrected == len((cur & seen) - prev)
        assert row.n_churned == len(prev - cur)
        seen |= cur
    # identity: mau = new + retained + resurrected
    assert (t.n_mau == t.n_new + t.n_retained + t.n_resurrected).all()


def test_kpi_tree_identity_and_values():
    t = Q.QUERIES["events_kpi_tree"](SF).to_pandas() \
        .set_index("component")
    # the decomposition closes exactly
    assert (t.loc["users"].delta_nano + t.loc["intensity"].delta_nano
            + t.loc["value"].delta_nano + t.loc["residual"].delta_nano
            == t.loc["total"].delta_nano)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "value"]).to_pandas()
    day = (ev.ts.astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    cut = (int(day.min()) + int(day.max()) + 1) // 2
    ev["half"] = (day >= cut).astype(int)
    ev["cents"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    g = ev.groupby("half").agg(u=("user_id", "nunique"),
                               e=("cents", "size"), s=("cents", "sum"))
    u1, e1, s1 = (int(g.loc[0][k]) for k in ["u", "e", "s"])
    u2, e2, s2 = (int(g.loc[1][k]) for k in ["u", "e", "s"])
    assert t.loc["total"].delta_nano == (s2 - s1) * 10**9
    assert t.loc["users"].delta_nano \
        == Q._div_nano((u2 - u1) * e1 * s1, u1 * e1)
    assert t.loc["value"].delta_nano \
        == Q._div_nano(u2 * e2 * (s2 * e1 - s1 * e2), u2 * e2 * e1)


def test_frame_stride_sweep_matches_pure():
    t = Q.QUERIES["media_frame_stride_sweep"](SF).to_pandas() \
        .set_index("stride")
    src = mm.make_media_table(256)
    vids = [mm._decode_payload(src["blob"][i].as_py())["n_frames"]
            for i in range(len(src))
            if src["kind"][i].as_py() == "video"]
    for s in Q._STRIDE_SWEEP:
        row = t.loc[s]
        assert row.n_videos == len(vids)
        assert row.n_frames_emitted \
            == sum((n + s - 1) // s for n in vids)
    # larger strides emit monotonically fewer frames
    vals = [t.loc[s].n_frames_emitted for s in Q._STRIDE_SWEEP]
    assert vals == sorted(vals, reverse=True)
