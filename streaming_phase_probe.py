#!/usr/bin/env python3
"""Streaming-family phase decomposition + state-store A/B (r13 verdict
task #3): runs representative Structured Streaming shapes from the
registry through run_available_now's exact protocol, but keeps the
StreamingQuery handle so the per-trigger ``durationMs`` breakdown
(addBatch / getBatch / walCommit / commitOffsets / queryPlanning /
triggerExecution) and state-operator metrics land in the artifact.

Conf axes (one JSON record per (shape, conf)):
  default        HDFSBackedStateStoreProvider (the session default)
  rocksdb        spark.sql.streaming.stateStore.providerClass=RocksDB...

Usage: python streaming_phase_probe.py [shape ...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wsu_cpts_415_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _shapes(spark):
    from pyspark.sql import functions as F

    from wsu_cpts_415_spark.streaming.jobs import (
        read_events_stream,
        session_aggregates,
        tumbling_counts,
        cep_error_after_purchase,
    )

    def tumbling():
        return tumbling_counts(read_events_stream(spark, SF_DIR)), "complete"

    def sessions():
        return session_aggregates(read_events_stream(spark, SF_DIR)), "complete"

    def ss_join():
        ev = read_events_stream(spark, SF_DIR)
        signups = (
            ev.filter(F.col("event_type") == "signup")
            .select(
                F.col("user_id").alias("s_user"),
                F.col("event_id").alias("signup_event"),
                F.col("ts").alias("signup_ts"),
            )
            .withWatermark("signup_ts", "1 day")
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id", "event_id", F.col("ts").alias("purchase_ts"))
            .withWatermark("purchase_ts", "1 day")
        )
        joined = signups.join(
            purchases,
            (F.col("s_user") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("signup_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")
            ),
        )
        return joined, "append"

    def dedup():
        stream = read_events_stream(spark, SF_DIR, files_per_trigger=64)
        doubled = stream.withColumn(
            "_copy", F.explode(F.array(F.lit(0), F.lit(1)))
        ).drop("_copy")
        return (
            doubled.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
                ["event_id"]
            ),
            "append",
        )

    def cep():
        return (
            cep_error_after_purchase(
                read_events_stream(spark, SF_DIR, files_per_trigger=64)
            ),
            "update",
        )

    return {
        "tumbling": tumbling,
        "sessions": sessions,
        "ss_join": ss_join,
        "dedup": dedup,
        "cep": cep,
    }


def run_one(spark, make, name: str, idx: int) -> dict:
    from wsu_cpts_415_spark.streaming.jobs import STREAM_SHUFFLE_PARTITIONS

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(STREAM_SHUFFLE_PARTITIONS)
    )
    try:
        df, mode = make()
        t0 = time.perf_counter()
        q = (
            df.writeStream.format("memory")
            .queryName(f"probe_{name}_{idx}")
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    phases: dict[str, int] = {}
    state = {"rows": 0, "commit_ms": 0, "mem_bytes": 0}
    for p in prog:
        for k, v in (p.get("durationMs") or {}).items():
            phases[k] = phases.get(k, 0) + int(v)
        for op in p.get("stateOperators") or []:
            state["rows"] += int(op.get("numRowsTotal") or 0)
            state["commit_ms"] += int(op.get("allUpdatesTimeMs") or 0) + int(
                op.get("commitTimeMs") or 0
            )
            state["mem_bytes"] += int(op.get("memoryUsedBytes") or 0)
    return {
        "wall": round(wall, 3),
        "n_batches": len(prog),
        "phases_ms": phases,
        "state": state,
    }


def main() -> None:
    which = sys.argv[1:]
    out: dict[str, dict] = {}
    spark = get_spark(app_name="wsu_cpts_415_spark-streamprobe")
    spark.sparkContext.setLogLevel("ERROR")
    key = "spark.sql.streaming.stateStore.providerClass"
    # providerClass is a per-query SQL conf read at stream start, so one
    # session serves both arms; interleaving (A,B,A,B) would be nicer
    # but RocksDB loads a native library on first use -- grouping keeps
    # that one-time cost out of the default arm and visible in run 1 of
    # the rocksdb arm (min-of-2 drops it)
    for conf_name in ["default", "rocksdb"]:
        if conf_name == "rocksdb":
            spark.conf.set(key, ROCKSDB)
        shapes = _shapes(spark)
        names = which or list(shapes)
        recs: dict[str, list] = {}
        for idx in range(2):  # min-of-2 like the bench
            for name in names:
                rec = run_one(spark, shapes[name], f"{conf_name}_{name}", idx)
                recs.setdefault(name, []).append(rec)
        grp = {n: min(rs, key=lambda r: r["wall"]) for n, rs in recs.items()}
        grp["total_wall"] = round(
            sum(r["wall"] for r in grp.values() if isinstance(r, dict)), 3
        )
        out[conf_name] = grp
    print(json.dumps(out))


if __name__ == "__main__":
    main()
