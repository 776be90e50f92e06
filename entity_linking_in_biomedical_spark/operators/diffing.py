"""Snapshot diffing: added / removed / changed rows between two corpus
snapshots.

The complement of the incremental-arrival operators
(``incremental_dedup``/``incremental_er``): those fold a KNOWN batch of
new documents into persisted state; this one derives the batch when
all you have is two full snapshots (a re-crawl, a vendor re-delivery,
an upstream table you don't control). Its output is exactly the
change-feed the incremental operators consume — 'added' rows go
through ``link_snapshot``/``flag_against_index``, 'removed' rows
retract from the indexes, 'changed' rows do both.

Scale shape: one full-outer sort-merge join on the id — O(|old|+|new|)
with a single shuffle per side, which is the information-theoretic
floor for diffing two unordered snapshots (every id must be compared
once). Content comparison is by fingerprint (md5 over the tracked
columns), computed scan-side so the join carries ~50 B/row, not the
payload. Unchanged rows — the overwhelming majority at 10^12 docs —
are dropped by a post-join filter, so the OUTPUT is O(|changes|).
On Iceberg the same feed comes free from the changelog of a MERGE;
this operator is for sources without one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_SEP = "\x1f"  # unit separator: never appears in the tracked columns


def snapshot_fingerprint(cols: list[str]):
    """md5 over the tracked columns (null-tagged, \\x1f-joined): the
    ~16-byte content summary the diff join carries instead of the
    payload."""
    tagged = [
        F.when(F.col(c).isNull(), F.lit("\x00")).otherwise(F.col(c).cast("string"))
        for c in cols
    ]
    return F.md5(F.concat_ws(_SEP, *tagged))


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    tracked_cols: list[str],
) -> DataFrame:
    """Rows that differ between two snapshots keyed by ``id_col``:
    ``(id, change)`` with change in {'added', 'removed', 'changed'}
    (present only in new / only in old / in both with different
    fingerprints over ``tracked_cols``). Unchanged ids produce no
    output. ``id_col`` must be unique per snapshot (it is a key)."""
    fp = snapshot_fingerprint(tracked_cols)
    o = old.select(F.col(id_col).alias("id"), fp.alias("_fp_old"))
    n = new.select(F.col(id_col).alias("id"), fp.alias("_fp_new"))
    return (
        o.join(n, "id", "full_outer")
        .select(
            "id",
            F.when(F.col("_fp_old").isNull(), F.lit("added"))
            .when(F.col("_fp_new").isNull(), F.lit("removed"))
            .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
            .alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )
