"""Explicit hot-key salting for skewed equi-joins (north-rule
requirement; SURVEY.md §4).

AQE's skew-join splitting handles skewed *partitions* after the fact;
for blocking joins we know the skew source a priori — specific hot keys
(frequent surfaces, dense LSH buckets) — so we split them explicitly:

    big side:    salt = pmod(xxhash64(row-id), n_salts)   (scatter)
    small side:  replicated once per salt value           (broadcast-ish)
    join key:    (key, salt)

The join result is identical to the unsalted join (every original pair
appears exactly once: the big-side row meets the one replica carrying
its salt). Only keys in ``hot_keys`` are salted — cold keys keep salt 0
on both sides, so there is no blow-up for the long tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salts: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Inner-join ``big`` and ``small`` on ``key`` with explicit salting
    of the keys listed in ``hot_keys`` (single column ``key``).

    ``salt_on``: big-side column whose hash spreads rows across salts
    (defaults to the key itself + a random-ish stable column mix via
    monotonically varying xxhash64 over all columns is NOT deterministic
    — callers pass a stable id column).
    """
    salt_src = F.xxhash64(F.col(salt_on if salt_on else key))
    hot = F.broadcast(hot_keys.select(F.col(key), F.lit(True).alias("_hot")))

    big_s = (
        big.join(hot, key, "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(), F.pmod(salt_src, F.lit(n_salts))).otherwise(
                F.lit(0)
            ),
        )
        .drop("_hot")
    )
    small_s = (
        small.join(hot, key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("_hot")
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts")
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
