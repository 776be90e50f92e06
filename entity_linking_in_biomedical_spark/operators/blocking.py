"""Stage 1 — blocking / candidate generation (reference J1).

The reference brute-forces dense cosine between every mention TF-IDF
vector and every entity-name vector in 128-row batches, keeps top-128
per mention, and unions a char-gram pass with a word pass
(candidate_generator.py:89-127). That is O(|M|·|E|) — impossible at
10^12 docs. This module replaces it with two sub-quadratic channels:

  exact : equi-join on the normalized surface key (norm_key) — the
          high-precision channel; hash/broadcast join, one shuffle max.
  lsh   : char-n-gram MinHash banded LSH — explode band keys on both
          sides, equi-join on the band key. Recall channel for typo'd
          surfaces (the reference's char 2-5-gram TF-IDF analogue).

Scale levers (all measured, SURVEY.md §4):
- blocking runs over **distinct normalized surfaces**, not mention
  occurrences: |distinct surfaces| << |mentions| at web scale; the
  result re-joins to mentions by norm. (The reference dedups too —
  candidate_generator.py:75-77 — but buggily; see mentions.py.)
- hot-key cap: band keys whose entity-side frequency exceeds
  ``max_key_freq`` are dropped before the join (the reference's
  max_df=0.1 analogue, candidate_generator.py:35). This bounds the
  worst-case join fan-out per key — the explicit skew control the
  north rule requires; AQE skew-join splitting covers the residual.
- per-surface candidate cap (``top_k``) via a window — the reference's
  top-128 (candidate_generator.py:89,107-109), applied on the cheap
  proxy similarity so the expensive scoring stage sees bounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.ngrams import ngram_minhash_bands
from ..functions.normalize import norm_key


def entity_names(entities: DataFrame) -> DataFrame:
    """entities(cui, sem_type, synonyms) -> (cui, name, norm), one row
    per synonym (dictionary scan S8, candidate_generator.py:65-73)."""
    return (
        entities.select("cui", F.explode("synonyms").alias("name"))
        .withColumn("norm", norm_key("name"))
        .filter(F.col("norm") != "")
        .dropDuplicates(["cui", "norm"])
    )


def block_candidates(
    mentions: DataFrame,
    names: DataFrame,
    ns: tuple[int, ...] = (2, 3),
    num_hashes: int = 16,
    bands: int = 16,
    max_key_freq: int = 200,
    top_k: int = 128,
) -> DataFrame:
    """mentions(.., norm) × names(cui, norm) -> candidates
    (norm, cui, channel, block_key).

    ``block_key`` is the key both sides shared (the norm itself for the
    exact channel, the LSH band key otherwise) — the north rule's F1 is
    conditioned on pairs at shared blocking keys, so the key is carried
    through to the output.
    """
    surfaces = mentions.select("norm").distinct()

    # --- exact channel ------------------------------------------------
    exact = (
        surfaces.join(names, "norm")
        .select("norm", "cui", F.lit("exact").alias("channel"), F.col("norm").alias("block_key"))
    )

    # --- LSH channel ----------------------------------------------------
    # The 16-minhash band expression is the most expensive projection in
    # the stage; each banded frame is referenced more than once (hot-key
    # count + join), so materialize it once (localCheckpoint) instead of
    # letting every consumer re-evaluate 16 x |grams| md5 calls per row.
    def with_bands(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bk", F.explode(ngram_minhash_bands(F.col("norm"), ns, num_hashes, bands))
        )

    m_bands = with_bands(surfaces).localCheckpoint(eager=False)
    e_bands = (
        with_bands(names)
        .select("cui", "norm", "bk")
        .dropDuplicates(["cui", "bk"])
        .localCheckpoint(eager=False)
    )

    # hot-key cap: drop band keys shared by too many entity names
    # (stop-gram analogue of the reference's max_df, explicit skew control)
    key_freq = e_bands.groupBy("bk").agg(F.count_distinct("cui").alias("kf"))
    hot = key_freq.filter(F.col("kf") > max_key_freq).select("bk")
    e_bands = e_bands.join(F.broadcast(hot), "bk", "left_anti")

    lsh = (
        m_bands.select(F.col("norm").alias("m_norm"), "bk")
        .join(e_bands.select("cui", "bk"), "bk")
        .select(
            F.col("m_norm").alias("norm"),
            "cui",
            F.lit("lsh").alias("channel"),
            F.col("bk").alias("block_key"),
        )
    )

    cands = exact.unionByName(lsh)
    # A6: union channels + dedup per (surface, entity); keep the
    # highest-precision channel/key for reporting.
    cands = (
        cands.groupBy("norm", "cui")
        .agg(F.min("channel").alias("channel"), F.min("block_key").alias("block_key"))
    )

    # per-surface top-k cap (W1) on a cheap JVM-side proxy similarity —
    # bounded input for the scoring stage. Proxy: exact channel pinned
    # first, then normalized Levenshtein on the key strings.
    need_cap = top_k is not None and top_k > 0
    if need_cap:
        # one deterministic representative norm per cui for the proxy
        rep = names.groupBy("cui").agg(F.min("norm").alias("e_norm"))
        cands = cands.join(rep, "cui", "left")
        proxy = F.when(F.col("channel") == "exact", F.lit(2.0)).otherwise(
            1.0
            - F.levenshtein("norm", "e_norm")
            / F.greatest(F.length("norm"), F.length("e_norm"), F.lit(1))
        )
        w = Window.partitionBy("norm").orderBy(F.desc("proxy"), F.asc("cui"))
        cands = (
            cands.withColumn("proxy", proxy)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k)
            .drop("rk", "proxy", "e_norm")
        )
    return cands
