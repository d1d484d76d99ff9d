"""Streaming boilerplate gate: CCNet-style line-level dedup at ingest
time (Wenzek et al. 2020 §4.1), the line-frequency twin of the exact+LSH
dedup gate in streaming/ingest_dedup.py.

Arriving documents are segmented into fixed LINE_TOKENS-token "lines"
(queries/llm_filters.py); a line is boilerplate when the number of
DISTINCT documents containing it -- across the standing corpus AND the
current batch -- reaches BOILERPLATE_DF.  A document whose boilerplate
fraction reaches the threshold is rejected; survivors land in the
accepted store and their per-line postings extend the standing
line-frequency store, so batch N+1 gates against everything batch N
admitted.

Exactly-once: the same idempotent-by-batch-id discipline as the dedup
gate -- every store write is partitioned by batch id via dynamic
partition overwrite, the gate reads EXCLUDE the replaying batch's own
partitions, and the zero-admitted replay path clears stale partitions
explicitly (gate outcomes may change if the stream restarts with a
different threshold against the same checkpoint).

Scale posture: the standing store holds (digest, n_docs) aggregates --
8-byte xxhash64 digests, never line text -- so the per-batch gate cost
is one standing-store scan plus digest-sized shuffles; document text
never leaves the batch's scan stage.  At 100 TB the store is the
parquet twin of a nightly-compacted digest rollup (io/maintenance.py's
incremental refresh is the maintenance face).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.queries.llm_filters import BOILERPLATE_DF, LINE_TOKENS

# reject a document when at least this fraction of its lines is boilerplate
LINE_BP_THRESHOLD = 0.5


def line_digests_of(docs: DataFrame) -> DataFrame:
    """(doc_id, digest) at SEGMENT grain -- one row per LINE_TOKENS-token
    line occurrence, hashed to xxhash64 inside the scan stage (the same
    segmentation as queries/llm_filters.py:boilerplate_line_filter)."""
    toks = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(LINE_TOKENS)).cast("int")
    return docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_lines - 1),
                lambda i: F.xxhash64(
                    F.array_join(
                        F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "
                    )
                ),
            )
        ).alias("digest"),
    )


def doc_line_counts(
    docs: DataFrame, lines: DataFrame | None = None
) -> DataFrame:
    """(digest, n_docs): distinct-document posting counts per line --
    the standing store's row format.  ``lines`` overrides the
    segmentation source with a precomputed (doc_id, digest) frame (the
    batch queries pass the staged ``line_segments`` layer so the corpus
    text is split once per corpus, not once per caller)."""
    if lines is None:
        lines = line_digests_of(docs)
    return (
        lines.select("doc_id", "digest")
        .dropDuplicates(["doc_id", "digest"])
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs"))
    )


def gate_lines_against(
    batch_df: DataFrame,
    std_line_df: DataFrame,
    threshold: float = LINE_BP_THRESHOLD,
    lines: DataFrame | None = None,
) -> DataFrame:
    """Store-free core of the gate: per batch document, the line count,
    boilerplate-line count (document frequency across standing + batch
    reaches BOILERPLATE_DF), rounded boilerplate ratio, and the
    admission verdict (unrounded ratio strictly below ``threshold``).
    Registered as the oracle-checked query ``ingest_boilerplate_gate``
    (queries/llm_filters.py).  ``lines`` overrides the segmentation
    source with a precomputed (doc_id, digest) frame, same contract as
    ``doc_line_counts``."""
    if lines is None:
        lines = line_digests_of(batch_df)
    batch_df_counts = (
        lines.dropDuplicates(["doc_id", "digest"])
        .groupBy("digest")
        .agg(F.count("*").alias("b_docs"))
    )
    total = (
        batch_df_counts.join(
            std_line_df.groupBy("digest").agg(
                F.sum("n_docs").alias("s_docs")
            ),
            "digest",
            "left",
        )
        .select(
            "digest",
            (F.col("b_docs") + F.coalesce(F.col("s_docs"), F.lit(0))).alias(
                "df_total"
            ),
        )
    )
    is_bp = F.when(F.col("df_total") >= BOILERPLATE_DF, 1).otherwise(0)
    ratio = F.sum(is_bp).cast("double") / F.count("*")
    return (
        lines.join(total, "digest")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(is_bp).alias("n_boilerplate"),
            F.round(ratio, 4).alias("bp_ratio"),
            (ratio < threshold).alias("admitted"),
        )
    )


def gate_line_batch(
    batch_df: DataFrame,
    store_dir: str,
    threshold: float = LINE_BP_THRESHOLD,
    exclude_batch: int | None = None,
) -> DataFrame:
    """Gate ``batch_df`` against the standing line store, returning the
    admitted document rows.  Missing store (first run, no bootstrap) ==
    empty standing state; ``exclude_batch`` keeps replays deterministic
    exactly as in ingest_dedup.gate_batch."""
    from pyspark.errors import AnalysisException

    spark = batch_df.sparkSession
    try:
        std = spark.read.parquet(f"{store_dir}/line_counts")
        if exclude_batch is not None:
            std = std.filter(F.col("_batch") != exclude_batch)
        std = std.drop("_batch")
    except AnalysisException:  # store not created yet -> empty corpus
        std = doc_line_counts(batch_df.limit(0))
    verdicts = gate_lines_against(batch_df, std, threshold)
    return batch_df.join(
        verdicts.filter(F.col("admitted")).select("doc_id"), "doc_id"
    )


def init_line_store(
    spark: SparkSession, corpus_docs: DataFrame, store_dir: str
) -> None:
    """Bootstrap the standing line-frequency store from a corpus (the
    nightly maintenance job's output); base data in _batch=-1.

    Same restart-skip as ingest_dedup.init_standing_stores: a matching
    ``_corpus_id`` marker makes re-init one corpus scan (and protects
    the gate's appended ``_batch>=0`` partitions from the rebuild's
    plain overwrite); marker written only after a successful build."""
    from wsu_cpts_415_spark.streaming.ingest_dedup import (
        _marker_path,
        _read_marker,
        corpus_fingerprint,
    )

    fp = corpus_fingerprint(corpus_docs)
    if _read_marker(spark, store_dir, gate="line") == fp:
        return
    doc_line_counts(corpus_docs).withColumn("_batch", F.lit(-1)).write.mode(
        "overwrite"
    ).partitionBy("_batch").parquet(f"{store_dir}/line_counts")
    spark.createDataFrame(
        [(fp[0], fp[1])], "n_docs long, xor_hash long"
    ).coalesce(1).write.mode("overwrite").parquet(
        _marker_path(store_dir, gate="line")
    )


def apply_line_gate_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    accepted_dir: str,
    threshold: float = LINE_BP_THRESHOLD,
) -> None:
    """Idempotent per-batch body: gate, land survivors, extend the line
    store -- every write into a _batch=<id> partition via dynamic
    overwrite.  Same write-then-derive ordering as the dedup gate: the
    store append is derived from the LANDED accepted files so a lazy
    re-execution of the gate plan cannot observe the batch's own store
    rows."""
    from wsu_cpts_415_spark.streaming.ingest_dedup import (
        _drop_batch_partition,
    )

    spark = batch_df.sparkSession
    batch_df.persist()
    accepted = gate_line_batch(
        batch_df, store_dir, threshold, exclude_batch=batch_id
    ).persist()
    try:
        if accepted.limit(1).count() == 0:
            for base in (accepted_dir, f"{store_dir}/line_counts"):
                _drop_batch_partition(spark, base, batch_id)
            return
        opts = {"partitionOverwriteMode": "dynamic"}
        (
            accepted.withColumn("_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .options(**opts)
            .partitionBy("_batch")
            .parquet(accepted_dir)
        )
        landed = (
            spark.read.parquet(accepted_dir)
            .filter(F.col("_batch") == batch_id)
            .drop("_batch")
        )
        (
            doc_line_counts(landed)
            .withColumn("_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .options(**opts)
            .partitionBy("_batch")
            .parquet(f"{store_dir}/line_counts")
        )
    finally:
        accepted.unpersist()
        batch_df.unpersist()


def stream_ingest_line_gate(
    stream_docs: DataFrame,
    store_dir: str,
    accepted_dir: str,
    checkpoint_dir: str,
    threshold: float = LINE_BP_THRESHOLD,
    on_batch_end=None,
) -> None:
    """Run the boilerplate gate over a documents stream with
    trigger(availableNow); ``on_batch_end(batch_id)`` is the
    failure-injection seam shared with the other foreachBatch jobs."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_line_gate_batch(
            batch_df, batch_id, store_dir, accepted_dir, threshold
        )
        if on_batch_end is not None:
            on_batch_end(batch_id)

    q = (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
