"""Dense-vector column helpers over ``array<float>`` columns.

JVM-side implementations using higher-order functions (zip_with /
aggregate) — these keep ANN scoring inside codegen for the brute-force
path. Replaces the reference's sklearn ``linear_kernel`` calls
(candidate_generator.py:105,118) and torch mean-pool/dot
(affinity_models.py:31-42).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .lambdas import let_bound


def _dbl(a: Column | str) -> Column:
    """Promote array<float> to array<double> BEFORE any arithmetic —
    float32 products would otherwise lose precision the DuckDB oracle
    (and any double-path consumer) keeps."""
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: x.cast("double"))


def dot_product(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(a: Column | str) -> Column:
    """The norm is let-bound (functions.lambdas.let_bound): an inline
    l2_norm(a) inside the element lambda would re-run the O(d)
    aggregate once per element — O(d^2) per vector."""
    a = F.col(a) if isinstance(a, str) else a
    return let_bound(
        l2_norm(a), lambda nrm: F.transform(_dbl(a), lambda x: x / nrm)
    )


def mean_pool(vectors: Column | str) -> Column:
    """Element-wise mean over an array of equal-length vectors
    (array<array<double>> -> array<double>) — the reference's masked
    mean-pool over mention-token embeddings (affinity_models.py:31-37),
    JVM-side: one aggregate + a final scale."""
    vs = F.col(vectors) if isinstance(vectors, str) else vectors
    n = F.size(vs)
    zero = F.transform(F.get(vs, 0), lambda x: x * F.lit(0.0))
    summed = F.aggregate(vs, zero, lambda acc, v: F.zip_with(acc, v, lambda x, y: x + y))
    return F.when(n > 0, F.transform(summed, lambda x: x / n))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))
