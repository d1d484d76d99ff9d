#!/usr/bin/env python3
"""Standing-store scale probe for the streaming gates (round-8 verdict
item 4): the batch families all have x10/x100 probes, but the streaming
gates' cost driver is the STANDING STORE -- the state that grows as the
corpus the stream has admitted grows -- so this probe measures
per-micro-batch wall against standing stores built from N-fold
replicated corpora while the batch itself stays FIXED.

    SPARK_GRAFT_PROBE_N=10 python streaming_store_probe.py

What is measured, per gate (exact+LSH dedup gate, CCNet line gate):

  * store bootstrap cost (the nightly maintenance job's price, linear
    in corpus by design -- reported for context, not the verdict);
  * wall per micro-batch for 3 identical-size batches of novel docs
    (500 each, ids shifted far above the corpus range, text rewritten
    per batch so they are genuinely novel);
  * standing-store row counts, so "per-batch cost vs store size" is
    two columns of one artifact.

Reading the numbers: each micro-batch reads the standing stores in
full (digest anti-join, band join, line-count join) -- plain-parquet
cost is O(store bytes) per batch with a small constant (digests and
band keys are 8-byte hashes; document text never enters the stores
except the shingle arrays).  At 100 TB the stores are written bucketed
by the maintenance job (queries/dedup_policy.py:_inc_bucketed_layout)
so the band join co-locates and the scan term drops to the probed
buckets; the probe quantifies the plain-parquet slope those buckets
remove.  The gate's OUTPUT correctness under replay/stragglers is the
test suite's job (tests/test_gate_straggler_interleave.py); this probe
is only about the cost curve.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.session import get_spark

N = int(os.environ.get("SPARK_GRAFT_PROBE_N", "10"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = f"/tmp/spark_graft_probe/streamstore_x{N}"
OFF = 10**9
BATCH_DOCS = 500
N_BATCHES = 3

# per-token rewrite rate for corpus replicas (same design as
# scale_probe.py: replicas are same-topic rewrites, not verbatim copies)
PERTURB_PCT = 50


def _perturbed(docs, seed_col):
    toks = F.split(F.col("text"), " ")
    rewritten = F.transform(
        toks,
        lambda t: F.when(
            F.pmod(F.xxhash64(t, seed_col), F.lit(100)) < PERTURB_PCT,
            F.concat(
                t,
                F.lit("r"),
                F.pmod(F.xxhash64(t, seed_col, F.lit(7)), F.lit(997)).cast(
                    "string"
                ),
            ),
        ).otherwise(t),
    )
    return docs.withColumn(
        "text",
        F.when(seed_col == 0, F.col("text")).otherwise(
            F.array_join(rewritten, " ")
        ),
    )


def build_corpus(spark):
    docs = load_table(spark, SRC, "documents").select("doc_id", "text")
    reps = docs.crossJoin(
        F.broadcast(spark.range(N).select(F.col("id").alias("_rep")))
    )
    reps = reps.withColumn("doc_id", F.col("doc_id") + F.col("_rep") * OFF)
    return _perturbed(reps, F.col("_rep")).select("doc_id", "text")


def build_batch(spark, batch_no: int):
    """Fixed-size novel batch: sf0.01 docs, ids shifted far above any
    corpus replica, text rewritten with a per-batch seed."""
    docs = (
        load_table(spark, "/root/testdata/sf0.01", "documents")
        .select("doc_id", "text")
        .limit(BATCH_DOCS)
    )
    shifted = docs.withColumn(
        "doc_id", F.col("doc_id") + F.lit(5 * 10**14 + batch_no * 10**6)
    )
    return _perturbed(shifted, F.lit(1000 + batch_no)).select(
        "doc_id", "text"
    )


def probe_gate(spark, name: str, init_fn, stream_fn, corpus) -> dict:
    base = f"{ROOT}/{name}"
    shutil.rmtree(base, ignore_errors=True)
    store, src = f"{base}/store", f"{base}/incoming"
    accepted, ckpt = f"{base}/accepted", f"{base}/ckpt"
    t0 = time.perf_counter()
    init_fn(spark, corpus, store)
    init_sec = round(time.perf_counter() - t0, 2)
    # restart path (round 10): a second init over the same corpus must
    # be a READ (fingerprint check against the _corpus_id marker), not
    # an O(corpus) rebuild -- and must not wipe appended batches
    t0 = time.perf_counter()
    init_fn(spark, corpus, store)
    reinit_sec = round(time.perf_counter() - t0, 2)
    batches = []
    for i in range(N_BATCHES):
        build_batch(spark, i).coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            src
        )
        t0 = time.perf_counter()
        stream_fn(stream, store, accepted, ckpt)
        batches.append(round(time.perf_counter() - t0, 2))
    accepted_rows = spark.read.parquet(accepted).count()
    store_rows = {}
    for sub in os.listdir(store):
        if sub.startswith("_"):  # _corpus_id marker, not a store
            continue
        store_rows[sub] = spark.read.parquet(f"{store}/{sub}").count()
    return {
        "init_sec": init_sec,
        "reinit_sec": reinit_sec,
        "batch_sec": batches,
        "accepted_rows": accepted_rows,
        "store_rows": store_rows,
    }


def main() -> None:
    from wsu_cpts_415_spark.streaming.ingest_dedup import (
        init_standing_stores,
        stream_ingest_with_dedup,
    )
    from wsu_cpts_415_spark.streaming.line_gate import (
        init_line_store,
        stream_ingest_line_gate,
    )

    spark = get_spark(app_name="streaming-store-probe")
    corpus = build_corpus(spark)
    out = {
        "metric": "streaming_store_probe",
        "n_replicas": N,
        "corpus_docs": corpus.count(),
        "batch_docs": BATCH_DOCS,
        "dedup_gate": probe_gate(
            spark,
            "dedup",
            init_standing_stores,
            stream_ingest_with_dedup,
            corpus,
        ),
        "line_gate": probe_gate(
            spark,
            "line",
            init_line_store,
            stream_ingest_line_gate,
            corpus,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
