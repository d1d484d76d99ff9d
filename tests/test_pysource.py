"""Custom Python DataSource (io/pysource.py): determinism across
partitionings, schema stability, and pushdown-compatible planning."""

from __future__ import annotations

import pyspark.sql.functions as F

from wsu_cpts_415_spark.io.pysource import (
    _mix,
    register_synthetic_source,
)


def _read(spark, **opts):
    register_synthetic_source(spark)
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_rows_are_pure_function_of_seed_and_index(spark):
    """Same (seed, n_rows) must emit identical rows no matter how many
    partitions slice the index space -- the scale-out property."""
    a = sorted(map(tuple, _read(spark, n_rows=500, n_partitions=2).collect()))
    b = sorted(map(tuple, _read(spark, n_rows=500, n_partitions=7).collect()))
    assert a == b
    assert len(a) == 500


def test_seed_changes_rows(spark):
    a = _read(spark, n_rows=100, seed=1).agg(F.sum("user_id")).collect()[0][0]
    b = _read(spark, n_rows=100, seed=2).agg(F.sum("user_id")).collect()[0][0]
    assert a != b


def test_schema_and_domains(spark):
    df = _read(spark, n_rows=200)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts_us", "user_id", "event_type", "value",
    ]
    types = {r[0] for r in df.select("event_type").distinct().collect()}
    assert types <= {"click", "view", "purchase", "signup", "error"}
    assert df.filter((F.col("user_id") < 0) | (F.col("user_id") >= 1000)).count() == 0


def test_partition_count_matches_option(spark):
    df = _read(spark, n_rows=1000, n_partitions=5)
    assert df.rdd.getNumPartitions() == 5


def test_mix_is_splitmix64(spark):
    # reference value for splitmix64(seed=0 advanced once) is public
    assert _mix(0) == 16294208416658607535


def test_stream_reader_matches_batch_rows(spark, tmp_path):
    """The streaming face must emit exactly the batch generator's rows
    under availableNow replay (offsets are row indices; rows are pure
    functions of the index)."""
    from wsu_cpts_415_spark.io.pysource import register_synthetic_stream_source

    register_synthetic_stream_source(spark)
    stream = (
        spark.readStream.format("synthetic_events_stream")
        .option("max_rows", 300)
        .option("rows_per_batch", 100)
        .option("seed", 7)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysource_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.table("pysource_stream").collect()))
    want = sorted(
        map(tuple, _read(spark, n_rows=300, seed=7).collect())
    )
    assert got == want


def test_jsonl_audit_writer_two_phase_commit(spark, tmp_path):
    """The Python DataSource WRITER face: rows stage per-task, publish
    on driver commit, and the control-total sidecar reconciles exactly
    with what a re-read finds (the S5 discipline on the v2 write
    protocol)."""
    import json
    import os

    from wsu_cpts_415_spark.io.pysource import register_jsonl_audit_sink

    register_jsonl_audit_sink(spark)
    out = str(tmp_path / "audit_out")
    df = spark.range(0, 1000, 1, 6).selectExpr(
        "id", "cast(id % 7 as double) as value"
    )
    df.write.format("jsonl_audit").option("path", out).option(
        "total_col", "value"
    ).mode("append").save()

    control = json.load(open(os.path.join(out, "_control_totals.json")))
    assert control["n_rows"] == 1000
    assert control["n_files"] == control["n_files"] == len(control["files"])
    assert not os.path.exists(os.path.join(out, "_staging"))
    back = spark.read.schema("id bigint, value double").json(
        os.path.join(out, "*.jsonl")
    )
    assert back.count() == 1000
    got_total = back.groupBy().sum("value").head()[0]
    assert abs(got_total - control["total_value"]) < 1e-6
    exact = df.groupBy().sum("value").head()[0]
    assert abs(got_total - exact) < 1e-6


def _settled_jsonl_leftovers(out, timeout=20.0):
    """Post-settle leftover scan: Spark's save() raises while zombie
    tasks may still be finishing their staged writes; the abort contract
    is that those files self-clean (marker check in write()), so poll
    until the tree holds no .jsonl for two consecutive looks or the
    timeout expires, and return whatever is left."""
    import os
    import time

    deadline = time.monotonic() + timeout
    clean_streak = 0
    leftover = []
    while time.monotonic() < deadline:
        leftover = []
        if os.path.exists(out):
            for _root, _dirs, files in os.walk(out):
                leftover += [f for f in files if f.endswith(".jsonl")]
        if not leftover:
            clean_streak += 1
            if clean_streak >= 2:
                return []
        else:
            clean_streak = 0
        time.sleep(0.1)
    return leftover


def test_jsonl_audit_writer_abort_cleans_staging(spark, tmp_path):
    """Failure injection on the v2 write protocol: when one task fails,
    the driver must call abort() -- staged files from the tasks that
    DID finish are discarded and nothing is published (no jsonl files,
    no control sidecar).  Asserts on post-settle state: tasks that
    outlive abort() must self-clean via the abort marker."""
    import os

    import pytest as _pytest

    from pyspark.sql import functions as F
    from wsu_cpts_415_spark.io.pysource import register_jsonl_audit_sink

    register_jsonl_audit_sink(spark)
    out = str(tmp_path / "audit_abort")

    @F.udf("long")
    def boom(v):
        if v == 999:  # only partition holding 999 dies, others finish
            raise ValueError("injected failure")
        return v

    df = spark.range(0, 1000, 1, 8).select(boom("id").alias("id"))
    with _pytest.raises(Exception, match="injected failure"):
        df.write.format("jsonl_audit").option("path", out).mode(
            "append"
        ).save()
    assert not os.path.exists(os.path.join(out, "_control_totals.json"))
    leftover = _settled_jsonl_leftovers(out)
    assert leftover == [], f"staged files survived abort: {leftover}"


def test_jsonl_audit_writer_abort_with_straggler_task(spark, tmp_path):
    """The finish-after-sweep race, provoked deliberately: one partition
    fails FAST (driver aborts and sweeps _staging) while another sleeps
    past the abort and only then writes its staged file.  The straggler
    must see the abort marker after closing its file and delete it --
    post-settle, the tree holds no .jsonl and nothing is published."""
    import os

    import pytest as _pytest

    from pyspark.sql import functions as F
    from wsu_cpts_415_spark.io.pysource import register_jsonl_audit_sink

    register_jsonl_audit_sink(spark)
    out = str(tmp_path / "audit_straggler")

    @F.udf("long")
    def slow_or_boom(v):
        import time

        if v == 0:  # partition 0 dies immediately -> abort fires early
            raise ValueError("injected failure")
        time.sleep(2.0)  # every other task outlives the abort sweep
        return v

    df = spark.range(0, 8, 1, 8).select(slow_or_boom("id").alias("id"))
    with _pytest.raises(Exception, match="injected failure"):
        df.write.format("jsonl_audit").option("path", out).mode(
            "append"
        ).save()
    assert not os.path.exists(os.path.join(out, "_control_totals.json"))
    leftover = _settled_jsonl_leftovers(out)
    assert leftover == [], f"straggler files survived abort: {leftover}"


def test_jsonl_audit_writer_next_write_sweeps_abort_residue(spark, tmp_path):
    """Abort-only workloads must not accumulate staging residue: the
    abort marker (which must OUTLIVE stragglers, so abort() leaves it)
    and any straggler-recreated staging dir are swept by the NEXT
    writer to the path -- driver-side, before its first task runs --
    under the one-writer-per-path contract."""
    import json
    import os

    import pytest as _pytest

    from pyspark.sql import functions as F
    from wsu_cpts_415_spark.io.pysource import register_jsonl_audit_sink

    register_jsonl_audit_sink(spark)
    out = str(tmp_path / "audit_residue")

    @F.udf("long")
    def boom(v):
        if v == 0:
            raise ValueError("injected failure")
        return v

    bad = spark.range(0, 8, 1, 4).select(boom("id").alias("id"))
    with _pytest.raises(Exception, match="injected failure"):
        bad.write.format("jsonl_audit").option("path", out).mode(
            "append"
        ).save()
    _settled_jsonl_leftovers(out)
    staging = os.path.join(out, "_staging")
    markers = [
        f for f in os.listdir(staging) if f.endswith("._ABORTED")
    ] if os.path.isdir(staging) else []
    assert markers, "abort() should leave its marker for stragglers"

    good = spark.range(0, 50, 1, 2).selectExpr(
        "id", "cast(id as double) as value"
    )
    good.write.format("jsonl_audit").option("path", out).option(
        "total_col", "value"
    ).mode("append").save()
    assert not os.path.exists(staging), "commit must sweep all residue"
    control = json.load(open(os.path.join(out, "_control_totals.json")))
    assert control["n_rows"] == 50


def test_jsonl_audit_writer_overwrite_replaces_prior_files(spark, tmp_path):
    """mode('overwrite') must actually replace: part files from a prior
    save may not survive alongside the new ones (a reader globbing
    *.jsonl has to see exactly the file list the control sidecar
    names), while mode('append') keeps accumulating."""
    import json
    import os

    from wsu_cpts_415_spark.io.pysource import register_jsonl_audit_sink

    register_jsonl_audit_sink(spark)
    out = str(tmp_path / "audit_overwrite")
    first = spark.range(0, 100, 1, 4).selectExpr(
        "id", "cast(id as double) as value"
    )
    first.write.format("jsonl_audit").option("path", out).option(
        "total_col", "value"
    ).mode("append").save()
    second = spark.range(1000, 1050, 1, 2).selectExpr(
        "id", "cast(id as double) as value"
    )
    second.write.format("jsonl_audit").option("path", out).option(
        "total_col", "value"
    ).mode("overwrite").save()

    control = json.load(open(os.path.join(out, "_control_totals.json")))
    on_disk = sorted(f for f in os.listdir(out) if f.endswith(".jsonl"))
    assert on_disk == control["files"], (
        f"disk/control divergence: {on_disk} vs {control['files']}"
    )
    assert control["n_rows"] == 50
    back = spark.read.schema("id bigint, value double").json(
        os.path.join(out, "*.jsonl")
    )
    assert back.count() == 50
    assert back.agg({"id": "min"}).head()[0] == 1000  # old rows gone
