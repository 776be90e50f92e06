"""Attribute-level survivorship: compose each entity cluster into ONE
golden record by merging attributes across member rows under
per-column rules — the master-data step that follows clustering
(reference scope note: the reference repo stops at mention->CUI links,
``src/utils.py:183-193`` groups mentions but never emits a canonical
record; survivorship is what an ER *deployment* publishes downstream).
Unlike dedup.py's keep-best (which elects one whole surviving ROW per
near-dup cluster), survivorship may take each attribute from a
different member — max balance from one source, the modal category
from another, the longest address from a third.

Rules (all deterministic, tie-broken by value so reruns and engine
swaps agree byte-for-byte):

- ``("max", col)`` / ``("min", col)`` / ``("sum", col)`` /
  ``("count", col)`` — plain aggregates.
- ``("longest", col)`` — the longest string, ties to the
  lexicographically LARGEST so the pick is a pure max over
  (length, value).
- ``("first", col, order_col)`` — the value of ``col`` from the row
  with the smallest ``order_col`` AMONG ROWS WHERE col IS NOT NULL
  (source-priority / recency survivorship; NULLs never win).
- ``("most_frequent", col)`` — the modal value, ties to the smallest
  value; NULLs excluded.

Scale shape at 10^12 rows: every rule except most_frequent folds into
ONE map-side-partial groupBy on cluster_id (max/min/sum/max_by are all
partial-aggregable, so the shuffle carries one row per cluster per
partition). Each most_frequent column adds one (cluster, value) count
groupBy + a max_by over the counts — two exchanges, both partial-
aggregated — and re-joins on cluster_id, where AQE reuses the
clustered partitioning. No windows over raw rows, no collect_list of
member payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _rule_expr(rule: tuple) -> F.Column:
    kind, col = rule[0], rule[1]
    c = F.col(col)
    if kind == "max":
        return F.max(c)
    if kind == "min":
        return F.min(c)
    if kind == "sum":
        return F.sum(c)
    if kind == "count":
        return F.count(c)
    if kind == "longest":
        # max over (length, value): deterministic even when several
        # members tie on length
        return F.max_by(c, F.struct(F.length(c).alias("l"), c.alias("v")))
    if kind == "first":
        order_col = rule[2]
        # NULL ordering keys are ignored by min_by, so gating the key
        # on col's non-nullness both excludes NULL values and keeps
        # the aggregate a single partial-aggregable expression
        return F.min_by(c, F.when(c.isNotNull(), F.col(order_col)))
    raise ValueError(f"unknown survivorship rule {kind!r}")


def golden_records(
    records: DataFrame,
    rules: dict[str, tuple],
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """``records`` (carrying ``cluster_col``; join your assignments on
    before calling) -> one row per cluster: (cluster_col, n_members,
    *rules.keys()). ``rules`` maps output column -> rule tuple (see
    module docstring)."""
    direct = {
        out: r for out, r in rules.items() if r[0] != "most_frequent"
    }
    modal = {out: r for out, r in rules.items() if r[0] == "most_frequent"}
    base = records.groupBy(cluster_col).agg(
        F.count("*").cast("bigint").alias("n_members"),
        *[_rule_expr(r).alias(out) for out, r in direct.items()],
    )
    for out, (_, col) in modal.items():
        counts = (
            records.filter(F.col(col).isNotNull())
            .groupBy(cluster_col, col)
            .agg(F.count("*").alias("__cnt"))
        )
        # modal value = max over (count, inverted-rank-by-value); the
        # value itself can't be negated generically, so pick max count
        # then min value via max_by on (cnt, MINUS nothing) -> two-step:
        # max_by over struct(cnt) breaks ties arbitrarily, so order by
        # (cnt desc, value asc) == min_by over struct(-cnt, value) for
        # numeric cnt, which IS generic: cnt is always a long here.
        winner = counts.groupBy(cluster_col).agg(
            F.min_by(
                F.col(col), F.struct((-F.col("__cnt")).alias("nc"), F.col(col).alias("v"))
            ).alias(out)
        )
        base = base.join(winner, cluster_col, "left")
    return base


def refresh_golden_records(
    records: DataFrame,
    old_golden: DataFrame,
    touched_clusters: DataFrame,
    rules: dict[str, tuple],
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Incremental survivorship — the snapshot-lifecycle face of
    ``golden_records``, completing the pattern the dedup/media/ER
    indexes follow (operators/incremental_dedup.py,
    operators/clustering.merge_into_clusters): after a merge/retract/
    review pass touches SOME clusters, recompute golden rows for those
    clusters only and splice them over the persisted golden table,
    instead of re-aggregating 10^12 member rows.

    ``records``: the full member table already carrying the NEW
    ``cluster_col`` assignment. ``old_golden``: the persisted output of
    a prior ``golden_records`` run under the SAME rules (schema must
    match; enforced). ``touched_clusters``: one column ``cluster_col``
    listing every cluster whose membership may have changed — new ids,
    grown ids, shrunk ids, AND ids that vanished entirely (callers get
    this from ``merge_into_clusters``/``retract_from_clusters``'s
    relabeled nodes or ``diff_snapshots``). Result == running
    ``golden_records`` on the full table, provided ``touched_clusters``
    covers every changed cluster: untouched rows are carried from
    ``old_golden``, touched ones recomputed, vanished ones retire
    (their semi-join recompute is empty).

    Scale shape: one scan of ``records`` pruned by a broadcast
    semi-join on the (small) touched set — only touched members reach
    the groupBy shuffle — plus one broadcast anti-join over the
    golden table (one row per cluster). O(|touched members| +
    |golden|), never O(corpus).
    """
    t = touched_clusters.select(F.col(cluster_col).cast("string").alias(cluster_col))
    fresh = golden_records(
        records.withColumn(cluster_col, F.col(cluster_col).cast("string")).join(
            F.broadcast(t), cluster_col, "left_semi"
        ),
        rules,
        cluster_col,
    )
    missing = set(fresh.columns) ^ set(old_golden.columns)
    if missing:
        raise ValueError(
            f"old_golden schema does not match the rules' golden schema; "
            f"mismatched columns: {sorted(missing)}"
        )
    kept = old_golden.withColumn(
        cluster_col, F.col(cluster_col).cast("string")
    ).join(F.broadcast(t), cluster_col, "left_anti")
    return kept.unionByName(fresh)
