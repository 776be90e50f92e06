"""Domain-level quality gate (operators/domain_filter.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.domain_filter import (
    domain_of,
    drop_bad_domains,
    flag_bad_domains,
)

_GOOD = (
    "the study of distributed data processing systems shows that careful "
    "partitioning and shuffle planning are the keys to throughput at scale "
    "for the workloads that matter in practice and in the literature too"
)
_JUNK = "!!! ??? $$$"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, url string, text string")


def test_flag_and_drop_bad_domains(spark):
    rows = (
        [(f"g{i}", f"https://Good.example.org/p/{i}", _GOOD + str(i)) for i in range(3)]
        + [(f"b{i}", f"https://spam.example.net/p/{i}", _JUNK) for i in range(3)]
        # only 2 junk docs: below min_docs, never condemned
        + [(f"s{i}", f"https://small.example.net/{i}", _JUNK) for i in range(2)]
        + [("n0", "not a url at all", _JUNK)]
    )
    docs = _docs(spark, rows)
    verdicts = {
        r["domain"]: r["kept"]
        for r in flag_bad_domains(docs, min_avg_quality=0.3, min_docs=3).collect()
    }
    assert verdicts == {
        "good.example.org": True,
        "spam.example.net": False,
        "small.example.net": True,  # thin evidence
        "": True,  # unparseable URLs never condemned
    }
    survivors = {r["doc_id"] for r in drop_bad_domains(docs).collect()}
    assert survivors == {"g0", "g1", "g2", "s0", "s1", "n0"}


def test_domain_of_lowercases_and_rejects_non_urls(spark):
    df = spark.createDataFrame(
        [("https://WWW.Example.COM:443/x",), ("ftp://x.y/z",), ("plain text",)],
        "u string",
    )
    got = [r[0] for r in df.select(domain_of("u")).collect()]
    assert got == ["www.example.com", "", ""]


def test_curate_composes_domain_gate(spark):
    from entity_linking_in_biomedical_spark.plans.curate import (
        CurateConfig,
        curate_corpus,
    )

    rows = [
        (f"g{i}", f"https://good.example.org/p/{i}", _GOOD + str(i), "en")
        for i in range(3)
    ] + [(f"b{i}", f"https://spam.example.net/p/{i}", _JUNK, "en") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id string, url string, text string, lang string")
    res = curate_corpus(
        docs,
        cfg=CurateConfig(
            url_col="url",
            domain_quality_floor=0.3,
            near_dup=False,
            min_quality=None,
        ),
    )
    gates = [g for g, _ in res["funnel"]]
    assert gates[:3] == ["input", "url_dedup", "domain_filter"]
    assert {r["doc_id"] for r in res["clean"].collect()} == {"g0", "g1", "g2"}


def test_decimal_sum_partition_invariance(spark):
    """The decimal(38,9) rollup must give identical verdicts however
    the rows are partitioned (float sums would not)."""
    rows = [
        (f"d{i}", "https://edge.example.org/p", _GOOD * (1 + i % 3)) for i in range(40)
    ]
    docs = _docs(spark, rows)
    a = flag_bad_domains(docs.repartition(1)).collect()
    b = flag_bad_domains(docs.repartition(16, F.col("doc_id"))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
