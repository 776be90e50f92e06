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
    salt_on: str = "",
) -> DataFrame:
    """Inner-join ``big`` and ``small`` on ``key`` with explicit salting
    of the keys listed in ``hot_keys`` (single column ``key``).

    ``salt_on`` (required): big-side column whose hash spreads rows
    across salts — a stable per-row id, NOT the join key. Hashing the
    join key would give every row of a hot key the same salt (constant
    per key), silently turning the salting into a no-op; we raise
    instead of defaulting into that trap.
    """
    if not salt_on:
        raise ValueError(
            "salt_on is required: pass a stable big-side row-id column "
            "(hashing the join key itself would salt every hot-key row "
            "identically — a silent no-op)"
        )
    if salt_on == key:
        raise ValueError(
            "salt_on must differ from the join key: xxhash64(key) is "
            "constant per key, so hot keys would not be spread"
        )
    salt_src = F.xxhash64(F.col(salt_on))
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
