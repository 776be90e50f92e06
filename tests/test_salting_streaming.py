"""Salted-join equivalence + streaming windowed aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_linking_in_biomedical_spark.operators.salting import salted_equi_join


def test_salted_join_identical_to_plain(spark):
    # one mega-hot key ("hot") + a long tail
    big = spark.createDataFrame(
        [(f"m{i}", "hot" if i % 2 == 0 else f"k{i % 7}") for i in range(500)],
        "mid string, key string",
    )
    small = spark.createDataFrame(
        [(f"e{j}", "hot") for j in range(20)]
        + [(f"e{j}", f"k{j % 7}") for j in range(20, 40)],
        "eid string, key string",
    )
    hot = spark.createDataFrame([("hot",)], "key string")
    plain = big.join(small, "key").select("mid", "eid")
    salted = salted_equi_join(big, small, "key", hot, n_salts=4, salt_on="mid").select(
        "mid", "eid"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    assert salted.count() == plain.count()  # exactly once, no dup/loss


def test_salted_join_spreads_hot_key(spark):
    big = spark.createDataFrame([(f"m{i}", "hot") for i in range(100)], "mid string, key string")
    small = spark.createDataFrame([("e1", "hot")], "eid string, key string")
    hot = spark.createDataFrame([("hot",)], "key string")
    out = salted_equi_join(big, small, "key", hot, n_salts=4, salt_on="mid")
    assert out.count() == 100
    # the physical join key includes the salt -> >=2 distinct salts used
    salts = (
        big.withColumn("s", F.pmod(F.xxhash64("mid"), F.lit(4))).select("s").distinct().count()
    )
    assert salts >= 2


def test_streaming_windowed_counts(spark, tmp_path):
    from entity_linking_in_biomedical_spark.streaming.windows import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    events.limit(500).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits finalized windows; correctness check = the
    # batch twin over the same rows restricted to emitted windows
    got = spark.sql("select * from win_counts")
    batch = (
        events.limit(500)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )
    emitted = {
        (r["window_start"], r["event_type"]): r["n"] for r in got.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["n"] for r in batch.collect()
    }
    for k, n in emitted.items():
        assert want.get(k) == n
