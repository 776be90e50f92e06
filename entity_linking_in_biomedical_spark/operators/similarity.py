"""Approximate-nearest-neighbor search over an embedding column.

Two paths:
- brute-force cosine top-k: cross join + JVM-side dot product + window
  top-k. Correctness baseline; at scale only viable when the query set
  is small enough to broadcast (Catalyst picks BroadcastNestedLoopJoin).
- SRP-LSH bucketed top-k: sign-random-projection buckets shrink the
  candidate set; recall < 1 traded for a |DB|/2^planes-sized bucket
  scan. Hyperplanes are derived deterministically from md5 of
  (plane, dim) — no RNG, so results are reproducible and the pandas
  oracle can replay them.

The IVF scale path (k-means coarse quantizer + inverted lists) follows
the same join shape: assign -> bucket-join -> verify; SRP is used here
because it needs no training pass.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.vectors import cosine_sim


def _plane_coeffs(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from md5 bits: coeff =
    inverse-normal of a uniform in (0,1) derived from md5(plane,dim).
    Box-Muller on two md5-derived uniforms keeps it simple."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"srp:{p}:{d}".encode()).hexdigest()
            u1 = (int(h[:8], 16) + 1) / (2**32 + 2)
            u2 = (int(h[8:16], 16) + 1) / (2**32 + 2)
            row.append(math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.pi * u2))
        planes.append(row)
    return planes


def srp_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-random-projection bucket id (string of 0/1 bits). ``dim``
    caps how many leading dimensions participate (extra dims ignored;
    shorter vectors contribute only their length)."""
    planes = _plane_coeffs(n_planes, dim)

    def bit(p: int) -> Column:
        coeffs = planes[p]
        acc = F.lit(0.0)
        # F.get is 0-indexed and null (not ANSI error) out of bounds
        for d, c in enumerate(coeffs):
            acc = acc + F.coalesce(F.get(vec, d).cast("double"), F.lit(0.0)) * F.lit(c)
        return F.when(acc >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(p) for p in range(n_planes)])


def srp_bucket_udf(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Arrow pandas-UDF variant of srp_bucket: one numpy matmul per
    ~10k-row batch against the same deterministic hyperplane matrix.
    Preferred for high-dim vectors — the unrolled column expression is
    n_planes x dim terms (512 for 8x64), which blows past whole-stage
    codegen budgets; a batched matmul is both faster and scales with
    Python workers. Sign agreement with srp_bucket holds except at
    |projection| < float-epsilon (measure zero)."""
    planes = np.array(_plane_coeffs(n_planes, dim))  # (p, d)

    @F.pandas_udf("string")
    def _bucket(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype=str)
        mat = np.zeros((len(vs), dim))
        for i, v in enumerate(vs):
            a = np.asarray(v, dtype=float)[:dim]
            mat[i, : len(a)] = a
        proj = mat @ planes.T  # (n, p)
        bits = (proj >= 0).astype(np.uint8)
        return pd.Series(["".join("1" if b else "0" for b in row) for row in bits])

    return _bucket(vec)


def brute_force_topk(
    queries: DataFrame,
    database: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    db_id: str = "vec_id",
    db_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (q_id, vec_id, cosine, rank). Query side is
    broadcast (small); the scan over the database is embarrassingly
    parallel and stays in codegen."""
    joined = F.broadcast(queries.select(q_id, q_vec)).crossJoin(
        database.select(db_id, db_vec)
    )
    scored = joined.withColumn("cosine", cosine_sim(q_vec, db_vec))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(db_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, db_id, F.round("cosine", 6).alias("cosine"), "rank")
    )


def lsh_topk(
    queries: DataFrame,
    database: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    db_id: str = "vec_id",
    db_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the SRP bucket, then exact
    cosine + window top-k inside the bucket. One equi-join shuffle on
    the bucket key instead of a cross join — the 100 TB path."""
    qb = queries.select(q_id, q_vec, srp_bucket_udf(F.col(q_vec), n_planes).alias("bkt"))
    db = database.select(db_id, db_vec, srp_bucket_udf(F.col(db_vec), n_planes).alias("bkt"))
    scored = qb.join(db, "bkt").withColumn("cosine", cosine_sim(q_vec, db_vec))
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(db_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, db_id, F.round("cosine", 6).alias("cosine"), "rank")
    )
