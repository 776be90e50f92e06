"""End-to-end entity-resolution pipeline (the north star's three-stage
DataFrame job): blocking -> pairwise scoring -> transitive clustering.

Graph design (the core scale decision): clustering runs over **distinct
normalized surfaces**, not mention occurrences. Nodes are
``e|<cui>`` (entities) and ``s|<norm>`` (surface forms); every mention
deterministically attaches to its surface node by an equi-join at the
end. At web scale |distinct surfaces| is orders of magnitude below
|mentions| (Zipf), so the pair-scoring and CC stages never touch the
full corpus — only the final attach join does, and that is a plain
hash/sort-merge equi-join Catalyst handles with AQE.

Because "e|" < "s|" lexicographically and cluster ids are component
minima, any component containing an entity automatically roots at the
smallest CUI — mention-entity matches pin clusters to CUIs with no
extra pass; entity-free components become NIL clusters.

Span-sequence invariant: ``documents.spans`` is never rewritten; the
output attaches a *separate* ``span_clusters`` column, so the invariant
holds structurally (SURVEY.md §1.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.blocking import block_candidates, entity_names, surface_blocking_keys
from ..operators.clustering import connected_components
from ..operators.mentions import extract_mentions
from ..operators.scoring import ScoringConfig, fit_idf, score_pairs
from .resume import make_stage_store, stage_signature


@dataclass(frozen=True)
class PipelineConfig:
    scoring: ScoringConfig = ScoringConfig()
    ngram: int = 3  # scoring tf-idf gram size
    block_ngrams: tuple[int, ...] = (2, 3)  # LSH gram sizes (no 1-grams:
    # a min-hash over 1-grams is dominated by common letters -> mega-buckets)
    num_hashes: int = 12
    bands: int = 12
    del_max_len: int = 12  # deletion-neighborhood channel bound
    del2_max_len: int = 7  # delete-2 depth for very short strings
    lsh_min_len: int = 5  # skip LSH for very short strings (deletion covers)
    word_num_hashes: int = 4  # word-token minhash channel (0 disables)
    phonetic: bool = False  # opt-in 'p|' Soundex channel (spelling variants)
    mm_threshold: float = 0.7  # mention-mention edges need more evidence
    max_key_freq: int = 64  # keys shared by more entities discriminate nothing
    top_k: int = 32  # reference's hardest-negative count (dataset.py:103)
    mm_pair_cap: int = 20  # max scored mention-mention partners per surface

    def params(self) -> dict:
        d = dict(self.__dict__)
        d["scoring"] = dict(self.scoring.__dict__)
        return d


def _input_fingerprint(df: DataFrame) -> list:
    """Stable identity fingerprint of a pipeline input for stage
    signatures. semanticHash covers source paths + transformations, but
    a (local)checkpoint-backed frame analyzes to a LogicalRDD whose
    hash embeds the RDD id — different on EVERY run — which would make
    all signatures unique and silently defeat snapshot resume. For
    those frames fall back to (schema md5, row count): weaker (a
    content change preserving both goes unnoticed — same caveat as an
    in-place file change under an unchanged path) but stable across
    runs."""
    import hashlib

    plan = df._jdf.queryExecution().analyzed().toString()  # type: ignore[operator]
    if "LogicalRDD" in plan or "ExistingRDD" in plan:
        schema_md5 = hashlib.md5(df.schema.json().encode()).hexdigest()
        return ["schema", schema_md5, "rows", df.count()]
    return [df.semanticHash()]


def run_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    entities: DataFrame,
    embeddings: DataFrame | None = None,
    abbr_map: DataFrame | None = None,
    split_ids: DataFrame | None = None,
    cfg: PipelineConfig = PipelineConfig(),
    out_dir: str | None = None,
    eager_stage_timing: bool = False,
) -> dict:
    """Returns dict with DataFrames: mentions, candidates, me_scores,
    mm_scores, assignments, mention_clusters, linked_documents — plus
    'metrics' (list) and 'cc_iterations' (int).

    ``embeddings``: optional (norm string, embedding array<float>)
    lookup used for the dense dot-product feature.
    ``out_dir``: when set, each stage commits a snapshot + manifest and
    re-runs resume from the last committed stage. A plain path uses the
    Parquet+manifest store; ``iceberg://catalog.namespace`` commits each
    stage as an Iceberg table (north-rule storage contract) when the
    session has an Iceberg catalog configured.
    """
    store = make_stage_store(spark, out_dir, eager_timing=eager_stage_timing)
    p = cfg.params()
    # input-identity fingerprints (semanticHash of each source plan:
    # covers paths + upstream transformations) fold into every stage
    # signature, so a re-run against different inputs into the same
    # out_dir recomputes instead of serving stale snapshots. Signatures
    # are only consulted when snapshots persist, so skip the (possibly
    # count-bearing) fingerprints entirely when out_dir is None.
    if out_dir is not None:
        p["input_fp"] = [
            _input_fingerprint(df)
            for df in (documents, entities, embeddings, abbr_map, split_ids)
            if df is not None
        ]
    tau = cfg.scoring.threshold

    if split_ids is not None:
        # P1 split semi-join (the reference's PMID split-list filter,
        # medmention_preprocess.py:34-35)
        documents = documents.join(
            split_ids.select("doc_id"), "doc_id", "left_semi"
        )
        p["split"] = True

    # ---- stage 1: mentions -------------------------------------------
    # Persisted stages bucket on the key every downstream join reuses
    # (``norm`` ties mentions ↔ candidates ↔ scores across stages and
    # resumed runs — sources/bucketed.py): the stage's one shuffle is
    # paid at write time, and a resumed 100 TB run re-joins the
    # snapshots with no Exchange instead of re-shuffling per stage.
    sig_mentions = stage_signature("mentions", p, [])
    mentions = store.get_or_compute(
        "mentions",
        sig_mentions,
        lambda: extract_mentions(documents, abbr_map),
        bucket_by=["norm"],
    )

    # pin the synonym frame once (lazy): entity_names ends in a
    # dropDuplicates exchange and is consumed by fit_idf (count + agg),
    # blocking (keys + top-k representative) and both scoring stages —
    # without the barrier each consumer re-ran the explode + dedup
    from ..session import barrier_level

    names = entity_names(entities).localCheckpoint(
        eager=False, storageLevel=barrier_level()
    )

    # the surface keying frame is shared by blocking (stage 2) and the
    # mention-mention channel (stage 3b) — one keying pass for the job.
    # Single evaluation is STRUCTURAL, not best-effort: the lazy
    # localCheckpoint inside surface_blocking_keys truncates the lineage
    # to one shared RDD at construction, so this lambda closing over it
    # and compute_mm's three references (hot cap + both self-join sides)
    # all plan as Scan ExistingRDD — verified by
    # test_plans.py::test_surface_keys_shared_frame_single_evaluated
    surf_keys = surface_blocking_keys(
        mentions,
        ns=cfg.block_ngrams,
        num_hashes=cfg.num_hashes,
        bands=cfg.bands,
        del_max_len=cfg.del_max_len,
        lsh_min_len=cfg.lsh_min_len,
        del2_max_len=cfg.del2_max_len,
        word_num_hashes=cfg.word_num_hashes,
        phonetic=cfg.phonetic,
    )

    # ---- stage 2: blocking -------------------------------------------
    sig_cands = stage_signature("candidates", p, [sig_mentions])
    cands = store.get_or_compute(
        "candidates",
        sig_cands,
        lambda: block_candidates(
            mentions,
            names,
            ns=cfg.block_ngrams,
            num_hashes=cfg.num_hashes,
            bands=cfg.bands,
            del_max_len=cfg.del_max_len,
            lsh_min_len=cfg.lsh_min_len,
            del2_max_len=cfg.del2_max_len,
            max_key_freq=cfg.max_key_freq,
            top_k=cfg.top_k,
            surface_keys=surf_keys,
            word_num_hashes=cfg.word_num_hashes,
            phonetic=cfg.phonetic,
        ),
        bucket_by=["norm"],
    )

    # ---- stage 3: pairwise scoring -----------------------------------
    if eager_stage_timing:
        import time as _time

        _t0 = _time.time()
        idf = fit_idf(names, ngram=cfg.ngram, vocab_cap=cfg.scoring.vocab_cap)
        store.metrics.append(
            {"stage": "idf_fit", "rows": len(idf), "sec": round(_time.time() - _t0, 3)}
        )
    else:
        idf = fit_idf(names, ngram=cfg.ngram, vocab_cap=cfg.scoring.vocab_cap)

    # Attach-join strategy for the embedding lookup (guide §3.1:
    # broadcast the side that fits, decided by size, not by hope): the
    # checkpointed lookup hides its statistics from the planner, so
    # without the hint every attach was a sort-merge join that shuffled
    # the pair frame. One cheap count gates the hint; at corpus scale
    # (per-surface embeddings) the count exceeds the cap and the joins
    # stay shuffled — identical results either way.
    emb_bcast = (
        embeddings is not None and embeddings.count() <= 200_000
    )

    def _emb_side(key: str, out: str) -> DataFrame:
        e = embeddings.select(F.col("norm").alias(key), F.col("embedding").alias(out))
        return F.broadcast(e) if emb_bcast else e

    def with_emb(df: DataFrame, key: str, out: str) -> DataFrame:
        if embeddings is None:
            return df
        return df.join(_emb_side(key, out), key, "left")

    def compute_me() -> DataFrame:
        # mention-surface × entity-synonym pairs within candidate blocks;
        # per (surface, cui) keep the best-scoring synonym (the reference
        # scores mention vs dictionary description, dataset.py:128,461).
        # Embeddings attach BEFORE the cui join — to the candidate frame
        # (one row per surface×cui) and the synonym frame — instead of
        # to the exploded pair frame: the pair set is ~4x larger than
        # the candidate set and the old second with_emb join reshuffled
        # every pair already carrying its 256-byte a_emb payload (guide
        # §8: decide placement on small rows, never let a later join
        # re-shuffle the payload). The join tree re-associated this way
        # produces the identical tuples.
        c = cands.select("norm", "cui", "block_key")
        n = names.select("cui", F.col("norm").alias("e_norm"))
        c = with_emb(c, "norm", "a_emb")
        if embeddings is not None:
            n = n.join(_emb_side("e_norm", "b_emb"), "e_norm", "left")
        pairs = c.join(n, "cui").select(
            F.col("norm").alias("a_norm"),
            F.col("e_norm").alias("b_norm"),
            "cui",
            "block_key",
            *(["a_emb", "b_emb"] if embeddings is not None else []),
        )
        scored = score_pairs(
            spark,
            pairs,
            idf,
            cfg.scoring,
            a_emb="a_emb" if embeddings is not None else None,
            b_emb="b_emb" if embeddings is not None else None,
        )
        return scored.groupBy("a_norm", "cui").agg(
            F.max("score").alias("score"), F.min("block_key").alias("block_key")
        )

    sig_me = stage_signature("me_scores", p, [sig_cands])
    me_scores = store.get_or_compute(
        "me_scores", sig_me, compute_me, bucket_by=["a_norm"]
    )

    def compute_mm() -> DataFrame:
        # mention-mention channel: distinct surface pairs sharing a
        # blocking key (J6/J7 semantics at inference: same block ≙ same
        # doc/cui grouping in the reference). Needed so NIL surface
        # variants cluster together without an entity bridge.
        # Reuses the stage-2 keying frame (surf_keys) — the identical
        # blocking_keys explode was previously derived twice per job.
        b = surf_keys
        # hot-band cap on the surface side (same skew control as blocking)
        hot = (
            b.groupBy("bk").agg(F.count("*").alias("kf"))
            .filter(F.col("kf") > cfg.max_key_freq)
            .select("bk")
        )
        b = b.join(F.broadcast(hot), "bk", "left_anti")
        pairs = (
            b.alias("x")
            .join(b.alias("y"), "bk")
            .filter(F.col("x.norm") < F.col("y.norm"))
            .select(
                F.col("x.norm").alias("a_norm"),
                F.col("y.norm").alias("b_norm"),
                F.col("bk").alias("block_key"),
            )
            .dropDuplicates(["a_norm", "b_norm"])
        )
        # cap partners per surface (deterministic by hash order) to bound
        # the scoring fan-out on hot surfaces; md5 order so the pandas
        # oracle reproduces the identical partner choice
        from pyspark.sql import Window

        w = Window.partitionBy("a_norm").orderBy(F.md5("b_norm"), F.col("b_norm"))
        pairs = pairs.withColumn("rk", F.row_number().over(w)).filter(
            F.col("rk") <= cfg.mm_pair_cap
        ).drop("rk")
        pairs = with_emb(pairs, "a_norm", "a_emb")
        pairs = with_emb(pairs, "b_norm", "b_emb")
        scored = score_pairs(
            spark,
            pairs,
            idf,
            cfg.scoring,
            a_emb="a_emb" if embeddings is not None else None,
            b_emb="b_emb" if embeddings is not None else None,
        )
        return scored.select("a_norm", "b_norm", "block_key", "score")

    sig_mm = stage_signature("mm_scores", p, [sig_mentions])
    mm_scores = store.get_or_compute(
        "mm_scores", sig_mm, compute_mm, bucket_by=["a_norm"]
    )

    # ---- stage 4: transitive clustering ------------------------------
    def compute_assign() -> DataFrame:
        from pyspark.sql import Window

        # Entity linking is argmax over candidates (the reference scores
        # candidates and takes the top, dataset.py:448-450 + batch top-k):
        # each surface links to at most ONE entity — linking to every
        # entity above threshold would transitively merge entities that
        # merely share a similar surface.
        w_me = Window.partitionBy("a_norm").orderBy(F.desc("score"), F.asc("cui"))
        me_top1 = (
            me_scores.filter(F.col("score") >= tau)
            .withColumn("rk", F.row_number().over(w_me))
            .filter(F.col("rk") == 1)
            .drop("rk")
        )
        me_edges = me_top1.select(
            F.concat(F.lit("s|"), "a_norm").alias("src"),
            F.concat(F.lit("e|"), "cui").alias("dst"),
        )
        linked = me_top1.select("a_norm").withColumnRenamed("a_norm", "norm")

        # mention-mention attachment: only surfaces with NO entity link
        # attach, and each to its single best partner — an unlinked
        # surface must never become a bridge that merges two entities.
        mm_tau = cfg.mm_threshold
        both_dirs = mm_scores.filter(F.col("score") >= mm_tau).select(
            F.col("a_norm").alias("s_norm"), F.col("b_norm").alias("p_norm"), "score"
        ).unionByName(
            mm_scores.filter(F.col("score") >= mm_tau).select(
                F.col("b_norm").alias("s_norm"), F.col("a_norm").alias("p_norm"), "score"
            )
        )
        unlinked_pairs = both_dirs.join(
            linked.withColumnRenamed("norm", "s_norm"), "s_norm", "left_anti"
        )
        w_mm = Window.partitionBy("s_norm").orderBy(F.desc("score"), F.asc("p_norm"))
        mm_edges = (
            unlinked_pairs.withColumn("rk", F.row_number().over(w_mm))
            .filter(F.col("rk") == 1)
            .select(
                F.concat(F.lit("s|"), "s_norm").alias("src"),
                F.concat(F.lit("s|"), "p_norm").alias("dst"),
            )
        )
        all_surface_nodes = mentions.select(
            F.concat(F.lit("s|"), "norm").alias("node")
        ).distinct()
        assign, iters = connected_components(
            me_edges.unionByName(mm_edges), nodes=all_surface_nodes
        )
        return assign.withColumn("cc_iterations", F.lit(iters))

    sig_assign = stage_signature("assignments", p, [sig_me, sig_mm])
    assignments = store.get_or_compute("assignments", sig_assign, compute_assign)
    cc_iterations = (
        assignments.select(F.max("cc_iterations")).collect()[0][0]
        if "cc_iterations" in assignments.columns
        else -1
    )

    # ---- attach clusters back to mentions and documents ---------------
    surf_clusters = assignments.filter(F.col("node").startswith("s|")).select(
        F.expr("substring(node, 3)").alias("norm"),
        F.when(
            F.col("cluster_id").startswith("e|"), F.expr("substring(cluster_id, 3)")
        )
        .otherwise(F.concat(F.lit("NIL_"), F.expr("substring(cluster_id, 3)")))
        .alias("cluster_id"),
    )
    mention_clusters = mentions.join(surf_clusters, "norm", "left").select(
        "doc_id", "span_seq", "surface", "norm", "cluster_id"
    )

    per_doc = mention_clusters.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("span_seq", "cluster_id"))).alias(
            "span_clusters"
        )
    )
    linked_documents = documents.join(per_doc, "doc_id", "left")

    return {
        "mentions": mentions,
        "candidates": cands,
        "me_scores": me_scores,
        "mm_scores": mm_scores,
        "assignments": assignments,
        "mention_clusters": mention_clusters,
        "linked_documents": linked_documents,
        "metrics": store.metrics,
        "cc_iterations": cc_iterations,
        # intermediates downstream composers reuse instead of recomputing:
        # the materialized-once surface keying frame (lazy — costs nothing
        # unless consumed) and the fitted driver-side IDF table. The
        # incremental fold's index probe needs exactly these two
        # (plans/incremental_er._cross_snapshot_edges).
        "surface_keys": surf_keys,
        "idf": idf,
    }
