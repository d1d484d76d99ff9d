"""Property-based tests (hypothesis): the ingest codec round-trips
arbitrary well-formed rows, rejects arbitrary malformed ones, and the HLL
approximate distinct count stays within its error bound."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from wsu_cpts_415_spark.io.ingest import decode_crawl
from wsu_cpts_415_spark.io.tables import load_table

# printable, no tabs/newlines (field separators), non-empty
_FIELD = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\t\n\r", categories=("L", "N", "P", "S")
    ),
    min_size=1,
    max_size=12,
)

_ROW = st.fixed_dictionaries(
    {
        "id": _FIELD,
        "uploader": _FIELD,
        "age_days": st.integers(min_value=0, max_value=10_000),
        "category": _FIELD,
        "length_s": st.integers(min_value=0, max_value=100_000),
        "views": st.integers(min_value=0, max_value=10**12),
        "rate": st.floats(
            min_value=0, max_value=5, allow_nan=False, allow_infinity=False
        ),
        "num_ratings": st.integers(min_value=0, max_value=10**9),
        "num_comments": st.integers(min_value=0, max_value=10**9),
        "related": st.lists(_FIELD, min_size=0, max_size=5),
    }
)


def _to_line(r: dict) -> str:
    head = [
        r["id"], r["uploader"], str(r["age_days"]), r["category"],
        str(r["length_s"]), str(r["views"]), repr(r["rate"]),
        str(r["num_ratings"]), str(r["num_comments"]),
    ]
    return "\t".join(head + r["related"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_ROW, min_size=1, max_size=8))
def test_codec_roundtrips_wellformed_rows(spark, rows):
    lines = [(_to_line(r), "f.txt", "0301") for r in rows]
    raw = spark.createDataFrame(lines, ["line", "src_file", "dir_name"])
    typed, rejects = decode_crawl(raw)
    assert rejects.count() == 0
    got = typed.collect()
    assert len(got) == len(rows)
    for g in got:
        # find a source row matching every decoded field
        matches = [
            r for r in rows
            if r["id"] == g["id"]
            and r["age_days"] == g["age_days"]
            and r["views"] == g["views"]
            and abs(r["rate"] - g["video_rate"]) < 1e-9
            and r["related"] == list(g["related_ids"])
        ]
        assert matches, f"decoded row has no source: {g}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    arity=st.integers(min_value=1, max_value=8),
    bad_field=st.sampled_from([2, 4, 5, 6, 7, 8]),
)
def test_codec_rejects_malformed_rows(spark, arity, bad_field):
    # short row (arity < 9) and full-arity row with a non-numeric field
    short = "\t".join(["x"] * arity)
    full = ["id", "up", "1", "cat", "2", "3", "4.0", "5", "6"]
    full[bad_field] = "not-a-number"
    raw = spark.createDataFrame(
        [(short, "f.txt", "0301"), ("\t".join(full), "f.txt", "0301")],
        ["line", "src_file", "dir_name"],
    )
    typed, rejects = decode_crawl(raw)
    assert typed.count() == 0
    assert rejects.count() == 2


def test_approx_distinct_error_bound(spark):
    """HLL++ at default rsd (5%): the approximation must land within 3x
    the advertised relative error of the exact count on real fixture
    keys."""
    li = load_table(spark, SF_ORACLE, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    approx = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a")
    ).collect()[0]["a"]
    assert abs(approx - exact) / exact < 0.15
