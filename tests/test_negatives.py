"""W3 semi-hard negative selection (reference batch_sampler.py:242-264):
band pick, easiest fallback, hardest fallback, anchors-without-both
dropped, deterministic ties."""

from __future__ import annotations

from entity_linking_in_biomedical_spark.operators.negatives import semi_hard_negatives


def _run(spark, rows, margin=0.2):
    df = spark.createDataFrame(rows, "anchor string, cand string, score double, is_pos boolean")
    return {
        r["anchor"]: (r["cand"], r["score"], r["kind"])
        for r in semi_hard_negatives(df, margin=margin).collect()
    }


def test_semi_hard_band_pick(spark):
    rows = [
        ("a", "p", 0.9, True),
        ("a", "n1", 0.85, False),  # in band (0.7, 0.9) — highest
        ("a", "n2", 0.75, False),  # in band, lower
        ("a", "n3", 0.95, False),  # above pos -> not in band
    ]
    got = _run(spark, rows)
    assert got["a"] == ("n1", 0.85, "semi_hard")


def test_easiest_fallback_when_negative_outscores(spark):
    rows = [
        ("b", "p", 0.6, True),
        ("b", "n1", 0.95, False),  # >= pos, band empty
        ("b", "n2", 0.61, False),  # >= pos - margin but >= pos? no: 0.61 > 0.6 -> ge
    ]
    got = _run(spark, rows)
    assert got["b"] == ("n2", 0.61, "easiest")  # min-score negative


def test_hardest_fallback_when_all_far_below(spark):
    rows = [
        ("c", "p", 0.9, True),
        ("c", "n1", 0.3, False),
        ("c", "n2", 0.5, False),
    ]
    got = _run(spark, rows)
    assert got["c"] == ("n2", 0.5, "hardest")


def test_anchors_without_both_sides_dropped(spark):
    rows = [
        ("onlypos", "p", 0.9, True),
        ("onlyneg", "n", 0.4, False),
        ("full", "p", 0.9, True),
        ("full", "n", 0.85, False),
    ]
    got = _run(spark, rows)
    assert set(got) == {"full"}


def test_tie_breaks_by_cand(spark):
    rows = [
        ("t", "p", 0.9, True),
        ("t", "nb", 0.8, False),
        ("t", "na", 0.8, False),
    ]
    got = _run(spark, rows)
    assert got["t"][0] == "na"
