"""Distributed quality-classifier training: fixed-iteration logistic
regression by full-batch gradient descent, each iteration ONE map-side-
partial aggregate over the corpus — the "train a small quality model on
cheap signals, score everything" step of a curation pipeline (the
fastText-classifier stage of CCNet/RefinedWeb, linear instead of
learned embeddings so the fit is engine-replayable).

Scale shape (the 100 TB story):

- the model is O(#features) floats — driver-sized by construction;
  per-iteration state shipped to executors is a handful of literal
  doubles baked into the plan (no broadcast needed);
- each GD iteration is ONE scan of the (localCheckpointed) featurized
  frame and ONE aggregate with map-side partial combine — k iterations
  = k scans, exactly the treeAggregate shape of MLlib's own LBFGS, no
  shuffles beyond the aggregate's;
- scoring is a pure codegen'd column expression (no join, no UDF).

Determinism / oracle story: per-row gradient contributions are rounded
to 9 decimals and summed as decimal(38,9) — exact integer arithmetic,
so the fitted weights do not depend on partition layout and a DuckDB
twin replaying the same feature expressions, rounding, and update rule
reproduces them bit-for-bit (the lm_nll idiom). Features themselves
must be rounded by the caller (see :func:`quality_features`) so both
engines feed identical doubles into the IEEE-identical z = w.x + b.

The fixed iteration count (no convergence test) is deliberate: a data-
dependent stop would make the job count — and the oracle replay —
corpus-dependent. Production fits pick iters/lr by validation offline;
the operator's job is the distributed per-iteration aggregate.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text_metrics import tokens


def _round9(x: float) -> float:
    """HALF_UP 9-decimal rounding of the shortest-repr decimal value —
    the semantics of Spark's round() on doubles (BigDecimal.valueOf +
    setScale HALF_UP), so driver-side weight updates round the same
    way the engines round."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP))


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(id, x1, x2, x3): three cheap quality signals, each rounded to 9
    decimals so any engine computing the same formulas feeds the fit
    identical doubles — log length, mean token length, and alphanumeric
    density. Tokenizer projected to a column first (lambda-CSE,
    functions/lambdas.py)."""
    t = F.col("__toks")
    raw = F.col("__raw")
    return (
        df.select(
            F.col(id_col),
            *[F.col(c) for c in carry],
            tokens(text_col).alias("__toks"),
            F.coalesce(F.col(text_col), F.lit("")).alias("__raw"),
        )
        .select(
            id_col,
            *carry,
            F.round(F.log(F.lit(1.0) + F.length(raw)), 9).alias("x1"),
            F.round(
                F.when(
                    F.size(t) > 0,
                    # integer length-sum (exact in any engine), THEN the
                    # one double division
                    F.aggregate(
                        t, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
                    ).cast("double")
                    / F.size(t),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("x2"),
            F.round(
                F.when(
                    F.length(raw) > 0,
                    F.length(F.regexp_replace(F.lower(raw), r"[^a-z0-9]", ""))
                    / F.length(raw),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("x3"),
        )
    )


FEATURES = ("x1", "x2", "x3")


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def lr_fit(
    feats: DataFrame,
    label_col: str,
    feature_cols: tuple[str, ...] = FEATURES,
    iters: int = 2,
    lr: float = 0.5,
) -> dict[str, float]:
    """Full-batch GD from w=0, ``iters`` iterations: returns
    {"bias": b, feature: w, ...}, every value a 9-decimal double.

    One Spark job per iteration (the O(1)-row gradient digest is the
    same bounded driver round-trip as clustering.py's CC convergence
    digest); the featurized frame should be localCheckpointed by the
    caller when the corpus scan is expensive.

    Update rule (replayed verbatim by the DuckDB oracle):
        g_j  = decimal-sum over rows of round9((sigmoid(z) - y) * x_j)
        w_j -= round9(lr * g_j / n)
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    w = {c: 0.0 for c in feature_cols}
    b = 0.0
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        z = F.lit(b)
        for c in feature_cols:
            z = z + F.lit(w[c]) * F.col(c)
        err = _sigmoid(z) - y
        aggs = [
            F.sum(F.round(err * F.col(c), 9).cast("decimal(38,9)")).alias(c)
            for c in feature_cols
        ]
        aggs.append(
            F.sum(F.round(err, 9).cast("decimal(38,9)")).alias("__bias")
        )
        aggs.append(F.count(F.lit(1)).alias("__n"))
        row = feats.agg(*aggs).collect()[0]
        if row["__n"] == 0:
            raise ValueError("cannot fit on an empty feature frame")
        n = float(row["__n"])
        for c in feature_cols:
            w[c] = _round9(w[c] - _round9(lr * float(row[c]) / n))
        b = _round9(b - _round9(lr * float(row["__bias"]) / n))
    out = {"bias": b}
    out.update(w)
    return out


def lr_score(
    df: DataFrame,
    model: dict[str, float],
    feature_cols: tuple[str, ...] = FEATURES,
    out_col: str = "score",
) -> DataFrame:
    """Append sigmoid(w.x + b) rounded to 6 decimals — a pure codegen'd
    expression, no join/UDF; the model rides in as plan literals."""
    z = F.lit(model["bias"])
    for c in feature_cols:
        z = z + F.lit(model[c]) * F.col(c)
    return df.withColumn(out_col, F.round(_sigmoid(z), 6))
