"""Schema-evolution reads (io/evolution.py): multi-generation table
directories must align to the declared schema -- old files surface new
columns as typed NULLs/defaults, unknown stored columns are ignored,
and the audit names every divergence."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from wsu_cpts_415_spark.io.evolution import evolution_report, read_evolved

DECLARED = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),  # added in gen 2
        T.StructField("tier", T.StringType(), True),  # never materialized
    ]
)


def _write_generations(spark, base):
    gen1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    gen1.write.mode("overwrite").parquet(f"{base}/g1")
    # gen 2 adds score and an undeclared debug column
    gen2 = spark.createDataFrame(
        [(3, "c", 0.5, "x"), (4, "d", 0.9, "y")],
        "id long, name string, score double, debug string",
    )
    gen2.write.mode("overwrite").parquet(f"{base}/g2")
    import shutil
    import glob
    import os

    os.makedirs(f"{base}/table", exist_ok=True)
    for i, part in enumerate(
        glob.glob(f"{base}/g1/part-*.parquet") + glob.glob(f"{base}/g2/part-*.parquet")
    ):
        shutil.copy(part, f"{base}/table/part-{i:05d}.parquet")
    return f"{base}/table"


def test_read_evolved_aligns_generations(spark, tmp_path):
    table = _write_generations(spark, str(tmp_path))
    df = read_evolved(spark, table, DECLARED, defaults={"tier": "std"})
    assert [f.name for f in df.schema.fields] == ["id", "name", "score", "tier"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None  # gen-1 file lacks the column
    assert rows[3]["score"] == 0.5
    assert all(r["tier"] == "std" for r in rows.values())  # default fill
    assert "debug" not in df.columns  # undeclared extra dropped


def test_read_evolved_prunes_columns(spark, tmp_path):
    """Column pruning must still reach the scan through mergeSchema."""
    table = _write_generations(spark, str(tmp_path))
    df = read_evolved(spark, table, DECLARED).select("id")
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "name" not in read and "score" not in read


def test_evolution_report_names_divergences(spark, tmp_path):
    table = _write_generations(spark, str(tmp_path))
    rep = {r["column"]: r["status"] for r in evolution_report(
        spark, table, DECLARED
    ).collect()}
    assert rep["id"] == "ok"
    assert rep["score"] == "ok"  # present in the merged view
    assert rep["tier"] == "missing_in_files"
    assert rep["debug"] == "undeclared_extra"


def test_read_evolved_casts_type_drift(spark, tmp_path):
    """A generation storing a column at a narrower type casts up."""
    g = spark.createDataFrame([(9, 7)], "id long, score int")
    g.write.mode("overwrite").parquet(f"{tmp_path}/t")
    df = read_evolved(spark, f"{tmp_path}/t", DECLARED)
    row = df.collect()[0]
    assert row["score"] == 7.0 and isinstance(row["score"], float)
