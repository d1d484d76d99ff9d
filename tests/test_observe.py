"""Observation API (df.observe): pipeline-attached metrics collected as
a side channel of a normal action -- the monitoring hook a production
job uses instead of a second counting pass."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from tests.conftest import SF_ORACLE
from wsu_cpts_415_spark.io.tables import load_table


def test_observe_collects_metrics_in_one_pass(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    obs = Observation("doc_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum("n_chars").alias("chars_seen"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("en_rows"),
    )
    result = observed.groupBy("lang").count().collect()
    want_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert obs.get["rows_seen"] == docs.count()
    assert obs.get["chars_seen"] == want_chars
    assert 0 < obs.get["en_rows"] < obs.get["rows_seen"]
    assert len(result) == 5  # the action itself still returns its answer
