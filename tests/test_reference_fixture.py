"""Parity on the reference's OWN golden test inputs.

Consumes /root/reference/tests/na_tagger_in.jsonl (data, not code) through an
adapter that plays the reference reader's role (keep ``tp ∈ {ar, page}``,
language from ``lg_comp`` — cli_tagger.py:278-283), then our tagger+linker,
and checks the semantics na_tagger_out.jsonl pins: article
SDT-1930-10-11-a-i0011 yields exactly one ``newsag`` mention with surface
``Havaas`` linked to canonical ``Havas``; the mention-free article and the
``tp:"ad"`` item yield nothing. (The reference's expected offsets are
placeholders — ``123``/``xxx`` — so the offset assertion here is our stricter
byte-identity invariant instead.)
"""

import json
import os

import pyarrow as pa
import pytest

REF = "/root/reference/tests/na_tagger_in.jsonl"


@pytest.mark.skipif(not os.path.exists(REF), reason="reference fixture absent")
def test_reference_golden_fixture_semantics():
    from newsagency_classification_ray.stages.linker import LinkerStage
    from newsagency_classification_ray.stages.tagger import TaggerStage

    rows = [json.loads(l) for l in open(REF) if l.strip()]
    # adapter = the reference reader: only ar/page content items are tagged
    kept = [r for r in rows if r.get("tp") in ("ar", "page")]
    assert len(rows) == 3 and len(kept) == 2

    batch = pa.table({
        "url": pa.array([f"https://impresso.example/{r['id']}" for r in kept]),
        "lang": pa.array([r["lg_comp"] for r in kept]),
        "warc_ts": pa.array([None] * len(kept), type=pa.timestamp("us")),
        "text": pa.array([r["ft"] for r in kept], type=pa.large_string()),
    })
    mentions = LinkerStage()(TaggerStage()(batch)).to_pylist()

    by_doc: dict[str, list] = {r["id"]: [] for r in rows}
    for m in mentions:
        by_doc[m["url"].rsplit("/", 1)[1]].append(m)

    havas = by_doc["SDT-1930-10-11-a-i0011"]
    assert len(havas) == 1
    m = havas[0]
    assert m["surface"] == "Havaas"
    assert m["canonical"] == "Havas"
    assert m["qid"] == "Q2826560"
    # byte-identity against the reference's own article text
    ft = next(r["ft"] for r in rows if r["id"] == "SDT-1930-10-11-a-i0011")
    assert ft[m["l_art"]:m["r_art"]] == "Havaas"
    assert by_doc["JDG-1951-02-26-a-i0080"] == []   # no mention in text
    assert by_doc["GDL-1987-12-31-a-i0025"] == []   # tp == "ad" filtered
