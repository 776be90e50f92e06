"""Custom stateful streaming operators (applyInPandasWithState).

The batch dedup family (operators/dedup.py) answers "which documents in
this corpus are duplicates"; a continuously-ingesting pipeline needs the
online form — "is THIS arriving document a duplicate of anything seen so
far" — which requires keyed state that outlives a micro-batch. That is
exactly what ``applyInPandasWithState`` provides: state is partitioned
by key (content hash), persisted in the checkpoint, and restored across
restarts, so the operator scales horizontally (each executor holds the
state shards for its keys) and survives failure/resume like every other
stage in the engine.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = "text_hash string, doc_id string, is_duplicate boolean"
DEDUP_STATE_SCHEMA = "seen bigint"


def streaming_exact_dedup(
    stream_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup: every arriving document is emitted with
    ``is_duplicate`` = whether any earlier document (in this or ANY
    previous micro-batch, across restarts) had the same content hash.

    State per key is one bigint (documents seen), so state size is
    O(distinct hashes) — the minimum any online exact dedup can hold.
    Within a micro-batch, arrival order is made deterministic by doc_id
    so results are reproducible under repartitioning."""
    hashed = stream_docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_hash"),
    )

    def mark_duplicates(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else (0,)
        # a key's micro-batch group may arrive as SEVERAL Arrow chunks;
        # sorting per chunk would make "which doc is first" depend on
        # chunk boundaries, so accumulate the group and sort once —
        # group size is the duplicates of ONE hash in one micro-batch,
        # so materializing it is bounded and the doc_id order (hence
        # is_duplicate assignment) is reproducible under repartitioning
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            yield pd.DataFrame(
                {
                    "text_hash": key[0],
                    "doc_id": pdf["doc_id"].values,
                    # duplicate iff anything with this hash came before it
                    "is_duplicate": (seen + pd.RangeIndex(len(pdf)).values) > 0,
                }
            )
            seen += len(pdf)
        state.update((seen,))

    return hashed.groupBy("text_hash").applyInPandasWithState(
        mark_duplicates,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_exact_dedup_flags(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> list[tuple[Any, ...]]:
    """Single-node oracle for tests: (text_hash, doc_id, is_duplicate)
    with the same doc_id arrival order, computed in pandas."""
    pdf = (
        docs.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.md5(F.col(text_col)).alias("text_hash"),
        )
        .toPandas()
        .sort_values("doc_id")
    )
    seen: dict[str, int] = {}
    rows = []
    for _, r in pdf.iterrows():
        h = r["text_hash"]
        rows.append((h, r["doc_id"], seen.get(h, 0) > 0))
        seen[h] = seen.get(h, 0) + 1
    return sorted(rows)
