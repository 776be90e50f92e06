"""Fellegi-Sunter probabilistic record linkage: EM-estimated m/u
probabilities and per-pattern match weights over comparison vectors.

Fellegi & Sunter (1969) score a candidate pair by the log-likelihood
ratio of its field-agreement pattern under the match vs non-match
populations; the m_k (P[field k agrees | match]) and u_k (P[agrees |
non-match]) parameters are estimated *unsupervised* via EM over the
pattern frequency table (Winkler 1988). This is the core of modern
linkage engines (e.g. Splink) and complements this repo's
similarity-score channel (operators/scoring.py): scoring ranks
candidates inside a block; FS calibrates *how much evidence* each
agreement pattern carries, with no labels.

Scale shape — the part that must be distributed is, and the part that
must not be isn't:

  1. Comparison-vector construction + pattern counting: ONE
     map-side-partial groupBy over the candidate-pair frame
     (corpus-scale work, no driver involvement).
  2. EM: runs driver-side in numpy over the aggregated pattern table,
     which has at most 2^K rows for K comparison fields REGARDLESS of
     corpus size (K <= ~10 in practice) — the same bounded-collect
     discipline as the IDF fit (operators/scoring.py:46).
  3. Weight assignment: a broadcast join of the <=2^K-row weight table
     back onto the pairs.

EM update (binary agreement fields, pattern g with count n_g):
  E: w_g = lam * prod_k m_k^g_k (1-m_k)^(1-g_k)
           / (that + (1-lam) * prod_k u_k^g_k (1-u_k)^(1-g_k))
  M: lam  = sum n_g w_g / sum n_g
     m_k  = sum n_g w_g g_k / sum n_g w_g
     u_k  = sum n_g (1-w_g) g_k / sum n_g (1-w_g)
Deterministic: fixed init, fixed iteration count, patterns processed
in sorted order, float64 throughout — replayable by an unrolled-CTE
SQL twin (see __spark_entry__'s oracle generator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EPS = 1e-9


def em_fit(
    pattern_counts: list[tuple[tuple[int, ...], int]],
    iters: int = 15,
    init_lambda: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> tuple[float, list[float], list[float]]:
    """Pure-python/numpy EM over a (pattern -> count) table. Separated
    from the Spark plumbing so the unit tests can drive it directly.
    Returns (lambda, m[k], u[k]). Parameters are clamped to
    [EPS, 1-EPS] so degenerate fields cannot produce 0/0."""
    import numpy as np

    if not pattern_counts:
        raise ValueError(
            "empty pattern table: the candidate-pair frame has no rows, "
            "so there is nothing to fit (check the blocking stage)"
        )
    pats = np.array([p for p, _ in pattern_counts], dtype=np.float64)
    ns = np.array([c for _, c in pattern_counts], dtype=np.float64)
    k = pats.shape[1]
    lam = float(init_lambda)
    m = np.full(k, init_m, dtype=np.float64)
    u = np.full(k, init_u, dtype=np.float64)
    clip = lambda x: np.clip(x, EPS, 1.0 - EPS)  # noqa: E731
    for _ in range(iters):
        pm = np.prod(np.where(pats == 1.0, m, 1.0 - m), axis=1)
        pu = np.prod(np.where(pats == 1.0, u, 1.0 - u), axis=1)
        num = lam * pm
        w = num / (num + (1.0 - lam) * pu)
        sw = float((ns * w).sum())
        snw = float((ns * (1.0 - w)).sum())
        lam = min(max(sw / float(ns.sum()), EPS), 1.0 - EPS)
        # degenerate mixtures (all posterior mass on one side) would
        # 0/0 the starved side's update into NaN; freeze it instead.
        # The SQL twins never hit this (their inputs carry both
        # populations), so replay parity is unaffected.
        if sw > 0.0:
            m = clip((ns * w) @ pats / sw)
        if snw > 0.0:
            u = clip((ns * (1.0 - w)) @ pats / snw)
    return lam, [float(x) for x in m], [float(x) for x in u]


def fellegi_sunter_weights(
    pairs: DataFrame,
    agreement_cols: list[str],
    iters: int = 15,
    init_lambda: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> DataFrame:
    """Per-pattern Fellegi-Sunter calibration table.

    ``pairs``: candidate pairs with boolean/0-1 ``agreement_cols``
    (the comparison vector). -> one row per observed pattern:
    (g_<field>..., n_pairs, match_weight, match_prob) where
    match_weight = log2 LR of the pattern and match_prob its posterior
    under the EM-fitted mixture. Rounded to 6 for cross-engine replay.
    """
    import math

    gs = [F.col(c).cast("int").alias(c) for c in agreement_cols]
    counts = (
        pairs.select(*gs)
        .groupBy(*agreement_cols)
        .agg(F.count("*").alias("n_pairs"))
    )
    rows = counts.collect()  # <= 2^K rows by construction
    table = sorted(
        (tuple(int(r[c]) for c in agreement_cols), int(r["n_pairs"])) for r in rows
    )
    spark = SparkSession.getActiveSession()
    schema_empty = (
        ", ".join(f"{c} int" for c in agreement_cols)
        + ", n_pairs bigint, match_weight double, match_prob double"
    )
    if not table:
        # empty candidate-pair frame: nothing to fit — return an empty
        # calibration table (score_pairs left-joins it to NULL scores)
        return spark.createDataFrame([], schema_empty)
    lam, m, u = em_fit(table, iters, init_lambda, init_m, init_u)
    out_rows = []
    for pat, n in table:
        pm = 1.0
        pu = 1.0
        for gk, mk, uk in zip(pat, m, u):
            pm *= mk if gk else (1.0 - mk)
            pu *= uk if gk else (1.0 - uk)
        weight = math.log2(pm / pu)
        prob = lam * pm / (lam * pm + (1.0 - lam) * pu)
        out_rows.append(tuple(pat) + (n, weight, prob))
    schema = (
        ", ".join(f"{c} int" for c in agreement_cols)
        + ", n_pairs bigint, match_weight double, match_prob double"
    )
    # Round via F.round (half-up, matching the SQL twin), NOT python's
    # round() (banker's) — the cross-engine hash compares the rounded
    # representation.
    return spark.createDataFrame(out_rows, schema).select(
        *agreement_cols,
        "n_pairs",
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_prob", 6).alias("match_prob"),
    )


def score_pairs(pairs: DataFrame, weights: DataFrame, agreement_cols: list[str]) -> DataFrame:
    """Attach the calibrated weight/posterior to every pair via a
    broadcast join on the (tiny) pattern table."""
    keyed = pairs.select(
        "*", *[F.col(c).cast("int").alias(f"__g_{c}") for c in agreement_cols]
    )
    w = weights.select(
        *[F.col(c).alias(f"__g_{c}") for c in agreement_cols],
        "match_weight",
        "match_prob",
    )
    out = keyed.join(F.broadcast(w), [f"__g_{c}" for c in agreement_cols], "left")
    return out.drop(*[f"__g_{c}" for c in agreement_cols])


# --- multi-level (Splink-style) comparisons --------------------------------
# Production linkage grades each field into ordered agreement LEVELS
# (e.g. exact / fuzzy / disagree), not just 0/1 — the m/u parameters
# become per-level categorical distributions. Same EM, same bounded
# pattern table (at most prod(n_levels) rows regardless of corpus
# size), same unrolled-CTE SQL replay.


def _init_levels(n_levels: list[int]) -> tuple[list[list[float]], list[list[float]]]:
    """Deterministic closed-form init: matches concentrate on the top
    level (0.8 there, 0.2 split over the rest); non-matches concentrate
    on level 0. Exactly replayable in SQL as literals."""
    m, u = [], []
    for L in n_levels:
        rest = 0.2 / (L - 1) if L > 1 else 0.0
        m.append([rest] * (L - 1) + [0.8])
        u.append([0.8] + [rest] * (L - 1))
    return m, u


def em_fit_levels(
    pattern_counts: list[tuple[tuple[int, ...], int]],
    n_levels: list[int],
    iters: int = 15,
    init_lambda: float = 0.1,
) -> tuple[float, list[list[float]], list[list[float]]]:
    """EM over categorical agreement levels: pattern g assigns field k
    the level g_k in [0, n_levels[k]). Returns (lambda, m[k][l],
    u[k][l]). Per-parameter clamping mirrors the binary em_fit (clip to
    [EPS, 1-EPS], no renormalization) so the SQL twin replays it with
    least/greatest."""
    import numpy as np

    if not pattern_counts:
        raise ValueError(
            "empty pattern table: the candidate-pair frame has no rows, "
            "so there is nothing to fit (check the blocking stage)"
        )
    pats = [p for p, _ in pattern_counts]
    ns = np.array([c for _, c in pattern_counts], dtype=np.float64)
    m0, u0 = _init_levels(n_levels)
    m = [np.array(v) for v in m0]
    u = [np.array(v) for v in u0]
    lam = float(init_lambda)
    onehots = [
        np.array([[1.0 if p[k] == l else 0.0 for l in range(L)] for p in pats])
        for k, L in enumerate(n_levels)
    ]
    for _ in range(iters):
        pm = np.ones(len(pats))
        pu = np.ones(len(pats))
        for k in range(len(n_levels)):
            pm = pm * (onehots[k] @ m[k])
            pu = pu * (onehots[k] @ u[k])
        num = lam * pm
        w = num / (num + (1.0 - lam) * pu)
        sw = float((ns * w).sum())
        snw = float((ns * (1.0 - w)).sum())
        lam = min(max(sw / float(ns.sum()), EPS), 1.0 - EPS)
        for k in range(len(n_levels)):
            # same degenerate-side freeze as the binary em_fit
            if sw > 0.0:
                m[k] = np.clip((ns * w) @ onehots[k] / sw, EPS, 1.0 - EPS)
            if snw > 0.0:
                u[k] = np.clip((ns * (1.0 - w)) @ onehots[k] / snw, EPS, 1.0 - EPS)
    return lam, [[float(x) for x in v] for v in m], [[float(x) for x in v] for v in u]


def fellegi_sunter_weights_levels(
    pairs: DataFrame,
    level_cols: list[str],
    n_levels: list[int],
    iters: int = 15,
    init_lambda: float = 0.1,
) -> DataFrame:
    """Multi-level calibration table: one row per observed level
    pattern with (level cols..., n_pairs, match_weight, match_prob).
    Same scale shape as the binary form: ONE map-side-partial groupBy,
    driver EM over <= prod(n_levels) rows, F.round for cross-engine
    replay."""
    import math

    counts = (
        pairs.select(*[F.col(c).cast("int").alias(c) for c in level_cols])
        .groupBy(*level_cols)
        .agg(F.count("*").alias("n_pairs"))
    )
    rows = counts.collect()
    table = sorted(
        (tuple(int(r[c]) for c in level_cols), int(r["n_pairs"])) for r in rows
    )
    spark = SparkSession.getActiveSession()
    schema_empty = (
        ", ".join(f"{c} int" for c in level_cols)
        + ", n_pairs bigint, match_weight double, match_prob double"
    )
    if not table:
        # same empty-input contract as the binary form
        return spark.createDataFrame([], schema_empty)
    lam, m, u = em_fit_levels(table, n_levels, iters, init_lambda)
    out_rows = []
    for pat, n in table:
        pm = 1.0
        pu = 1.0
        for k, l in enumerate(pat):
            pm *= m[k][l]
            pu *= u[k][l]
        out_rows.append(
            tuple(pat)
            + (n, math.log2(pm / pu), lam * pm / (lam * pm + (1.0 - lam) * pu))
        )
    schema = (
        ", ".join(f"{c} int" for c in level_cols)
        + ", n_pairs bigint, match_weight double, match_prob double"
    )
    return spark.createDataFrame(out_rows, schema).select(
        *level_cols,
        "n_pairs",
        F.round("match_weight", 6).alias("match_weight"),
        F.round("match_prob", 6).alias("match_prob"),
    )


# --- term-frequency adjustments (Winkler 1989 / Splink tf_adjustments) ------
# A match weight treats every agreement on a field as equal evidence,
# but agreeing on a RARE value (surname "Zubrzycki") is far stronger
# evidence than agreeing on a common one ("Smith"): under the
# non-match population, P[agree on value v] ~ f_v (the value's relative
# frequency), so the field's u-probability should be value-specific.
# The standard adjustment replaces the field's average u with f_v for
# agreeing pairs: delta = log2(u_k / f_v), added to the pattern weight
# (positive for rarer-than-average values, negative for common ones).


def term_frequencies(items: DataFrame, value_col: str) -> DataFrame:
    """Relative frequency of each value of ``value_col`` across the
    item table (NULLs dropped): one map-side-partial groupBy + a 1-row
    total broadcast back. -> (value, tf) with sum(tf) == 1."""
    vals = items.select(F.col(value_col).alias("value")).filter(
        F.col("value").isNotNull()
    )
    counts = vals.groupBy("value").agg(F.count("*").alias("c"))
    total = counts.agg(F.sum("c").alias("t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "value", (F.col("c") / F.col("t")).alias("tf")
    )


def tf_adjusted_weight(
    pairs: DataFrame,
    tf: DataFrame,
    agree_col: str,
    value_col: str,
    u_k: float,
    weight_col: str = "match_weight",
    out_col: str = "match_weight_tf",
    min_tf: float = 1e-6,
) -> DataFrame:
    """Add the value-specific evidence correction to an already-scored
    pair frame: for pairs agreeing on the field (``agree_col`` = 1),
    weight += log2(u_k / max(tf(value), min_tf)); disagreeing pairs are
    unchanged. ``tf`` is the (value, tf) table from term_frequencies —
    dictionary-sized, broadcast. ``u_k`` is the field's EM-fitted
    average u (fellegi_sunter_weights output feeds it). min_tf floors
    singleton values so one-off strings cannot dominate the score."""
    t = tf.select(F.col("value").alias(value_col), "tf")
    joined = pairs.join(F.broadcast(t), value_col, "left")
    adj = F.when(
        (F.col(agree_col).cast("int") == 1) & F.col("tf").isNotNull(),
        F.log2(F.lit(float(u_k)) / F.greatest(F.col("tf"), F.lit(float(min_tf)))),
    ).otherwise(F.lit(0.0))
    return joined.withColumn(out_col, F.col(weight_col) + adj).drop("tf")


def clerical_review_queue(
    scored_pairs: DataFrame,
    prob_col: str = "match_prob",
    low: float = 0.1,
    high: float = 0.9,
    cap: int = 1000,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The possible-match band every linkage deployment exports for
    human review (Fellegi & Sunter's three-way decision rule: link /
    possible link / non-link): pairs whose posterior falls inside
    (low, high), most-uncertain first (|prob - 0.5| ascending), capped
    deterministically. ``order_cols`` break ties so the queue is
    replayable; the cap is a global LIMIT after a total order — fine
    for a review queue (cap-sized by definition), never used on an
    uncapped corpus path."""
    band = scored_pairs.filter(
        (F.col(prob_col) > low) & (F.col(prob_col) < high)
    )
    u = F.abs(F.col(prob_col) - 0.5).alias("_u")
    return (
        band.withColumn("_u", u)
        .orderBy(F.asc("_u"), *[F.asc(c) for c in order_cols])
        .limit(cap)
        .drop("_u")
    )
