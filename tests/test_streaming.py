"""Stream-vs-batch equivalence: the same transformations produce identical
results under trigger(availableNow) streaming as in batch (replay mode),
and the custom stateful operator's final state matches a batch groupBy."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.streaming.jobs import (
    read_events_stream,
    run_available_now,
    running_user_totals,
    session_aggregates,
    tumbling_counts,
)


def _rows(df, key_cols):
    return sorted(
        (tuple(r[c] for c in key_cols) for r in df.collect()),
    )


def test_tumbling_stream_equals_batch(spark):
    batch = tumbling_counts(load_table(spark, SF_SMOKE, "events"))
    stream = run_available_now(
        tumbling_counts(read_events_stream(spark, SF_SMOKE)), "t_tumbling"
    )
    cols = ["day", "event_type", "n_events", "sum_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_session_stream_equals_batch(spark):
    batch = session_aggregates(load_table(spark, SF_SMOKE, "events"))
    stream = run_available_now(
        session_aggregates(read_events_stream(spark, SF_SMOKE)), "t_sessions"
    )
    cols = ["user_id", "session_start", "session_end", "n_events", "session_value"]
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stateful_running_totals(spark):
    from pyspark.sql import functions as F

    stream = run_available_now(
        running_user_totals(read_events_stream(spark, SF_SMOKE)),
        "t_user_totals",
        output_mode="update",
    )
    # update-mode memory sink may hold several updates per key; the LAST
    # update per user must equal the batch fold
    final = (
        stream.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    cols = ["user_id", "n_events"]
    assert _rows(final, cols) == _rows(batch, cols)
