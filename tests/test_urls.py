"""URL canonicalization (functions/urls.py): known-value behavior and
Spark-vs-DuckDB twin agreement."""

from __future__ import annotations

import duckdb

from entity_linking_in_biomedical_spark.functions.urls import (
    canonical_url,
    canonical_url_sql,
)

CASES = [
    # tracking params stripped, real params kept, delimiters repaired
    (
        "https://Example.COM/p?utm_source=x&id=7&utm_medium=y#frag",
        "https://example.com/p?id=7",
    ),
    ("http://a.org/?utm_campaign=z", "http://a.org/"),
    ("https://b.net/x?ref=tw&keep=1", "https://b.net/x?keep=1"),
    ("https://c.io/x?utm_a=1&utm_b=2", "https://c.io/x"),
    # scheme+host lowered, path case preserved
    ("HTTPS://WWW.Site.ORG/CaseSensitive/Path", "https://www.site.org/CaseSensitive/Path"),
    # default ports dropped, non-default kept
    ("https://host.com:443/a", "https://host.com/a"),
    ("http://host.com:80", "http://host.com"),
    ("http://host.com:8080/a", "http://host.com:8080/a"),
    # fragment-only and bare
    ("https://d.com/a#sec", "https://d.com/a"),
    ("https://d.com", "https://d.com"),
    # '&name=' in the PATH (no query string) must be untouched
    ("https://x.com/path&ref=1", "https://x.com/path&ref=1"),
    ("https://x.com/a&ref=b/c?utm_x=1", "https://x.com/a&ref=b/c"),
    # default port directly before the query string
    ("https://host.com:443?a=1", "https://host.com?a=1"),
    ("http://host.com:80?a=1", "http://host.com?a=1"),
    # non-URL text passes through BYTE-IDENTICAL (no fragment/query
    # surgery on prose)
    ("not a url", "not a url"),
    ("c# notes are here", "c# notes are here"),
    ("is this a url?", "is this a url?"),
    ("see docs?ref=x for info", "see docs?ref=x for info"),
]


def test_canonical_url_known_values(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    assert got == [want for _, want in CASES]


def test_canonical_url_duckdb_twin_agrees(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    got = [r[0] for r in df.select(canonical_url("u")).collect()]
    con = duckdb.connect()
    sql = canonical_url_sql("u")
    values = ", ".join(f"({i}, '{u}')" for i, (u, _) in enumerate(CASES))
    want = [
        r[0]
        for r in con.execute(
            f"select {sql} from (values {values}) t(i, u) order by i"
        ).fetchall()
    ]
    assert got == want


def test_canonical_url_idempotent(spark):
    """A canonicalizer must be a projection: applying it twice equals
    applying it once (otherwise dedup keys depend on how many
    normalization passes a pipeline happened to run)."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    once = [r[0] for r in df.select(canonical_url("u").alias("c")).collect()]
    twice = [
        r[0]
        for r in df.select(canonical_url(canonical_url("u")).alias("c")).collect()
    ]
    assert once == twice


def test_drop_url_duplicates_keep_first_and_null_bypass(spark):
    from entity_linking_in_biomedical_spark.operators.dedup import (
        drop_url_duplicates,
    )

    docs = spark.createDataFrame(
        [
            (1, "https://WWW.Ex.COM:443/a?utm_source=x&q=1"),
            (2, "https://www.ex.com/a?q=1"),  # same canonical as 1
            (3, "https://www.ex.com/b"),
            (4, None),
            (5, None),  # every NULL survives
        ],
        "doc_id bigint, url string",
    )
    kept = {r["doc_id"] for r in drop_url_duplicates(docs).collect()}
    assert kept == {1, 3, 4, 5}


def test_curate_url_gate_first(spark):
    from entity_linking_in_biomedical_spark.plans.curate import (
        CurateConfig,
        curate_corpus,
    )

    text = "a long enough paragraph of ordinary english words that the " \
           "quality gate keeps it around without any trouble at all " * 3
    docs = spark.createDataFrame(
        [
            (1, text + "one", "en", "https://ex.com/p?utm_source=a"),
            (2, text + "two", "en", "https://EX.com/p"),  # same canonical
            (3, text + "three", "en", None),
        ],
        "doc_id bigint, text string, lang string, url string",
    )
    res = curate_corpus(
        docs, cfg=CurateConfig(url_col="url", near_dup=False)
    )
    gates = [g for g, _ in res["funnel"]]
    assert gates[:2] == ["input", "url_dedup"]
    assert dict(res["funnel"])["url_dedup"] == 2
    assert {r["doc_id"] for r in res["clean"].collect()} == {1, 3}
