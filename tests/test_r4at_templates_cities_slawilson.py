"""Mention-template census invariants + error-SLA Wilson properties."""

from __future__ import annotations

import newsagency_classification_ray.queries as Q

SF = "/root/testdata/sf0.001"


def test_template_kinds_partition_total_mentions():
    """dateline + attribution + parenthetical == total linked mention
    count per canonical (the census partitions kg_mentions exactly,
    NIL-linked generator aliases included on both sides)."""
    t = Q.QUERIES["kg_mention_templates"](SF).to_pandas()
    assert set(t.kind) <= {"dateline", "attribution", "parenthetical"}
    assert (t.n > 0).all()
    per_canon = t.groupby("canonical").n.sum()
    m = Q.QUERIES["kg_mentions"](SF).to_pandas()
    ref = m.groupby("canonical").url.size()
    for c, n in per_canon.items():
        assert ref.get(c, 0) == n, c


def test_dateline_cities_are_generator_cities():
    from newsagency_classification_ray.sources.pages import _CITIES

    t = Q.QUERIES["pages_dateline_cities"](SF).to_pandas()
    assert set(t.city) <= set(_CITIES)
    assert set(t.lang) <= {"fr", "de"}
    assert (t.n > 0).all()
    # dateline city totals == dateline template totals
    tem = Q.QUERIES["kg_mention_templates"](SF).to_pandas()
    assert t.n.sum() == tem[tem.kind == "dateline"].n.sum()


def test_error_wilson_bounds():
    t = Q.QUERIES["events_error_wilson"](SF).to_pandas()
    assert (t.n_errors <= t.n_events).all()
    # Wilson lower bound is a strict lower bound on the point rate
    # whenever there is any uncertainty (n >= 1)
    assert (t.wilson_lo_nano <= t.rate_nano).all()
    assert (t.wilson_lo_nano >= 0).all()
    assert len(t) >= 1
