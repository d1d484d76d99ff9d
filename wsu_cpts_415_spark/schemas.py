"""Canonical explicit schemas for every table the engine reads.

The reference never declares a schema -- TSV parsing is positional
(reference big_data/scripts/load_data/data_types.py:26-39) and the Spark
reads infer from Mongo sampling (analyze_links.py:111-116). Schema-on-read
at 100 TB means a sampling scan before every query and silent type drift;
this engine declares every StructType up front and treats inference as an
opt-in debugging tool.

Fixture schemas follow FIXTURES.md §A; the ``videos`` schema is the
canonical form of the reference's video-observation entity (FIXTURES.md §B,
from mongo_loader.py:103-121 / data_types.py:9-21).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Driver fixture tables (TPC-H-ish star schema + events/documents/embeddings)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

# Physical shape of events.parquet: ts is stored as parquet
# TIMESTAMP(NANOS) (int64), which Spark's parquet reader rejects outright
# (PARQUET_TYPE_ILLEGAL).  The loader reads ts as a raw long and converts
# ns -> microseconds with integer division (timestamp_micros(ts div 1000));
# see io/tables.py.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# Reference-parity: canonical video-observation schema
# --------------------------------------------------------------------------
# One schema replaces the reference's two inconsistent JSON shapes
# (data_types.py:46-64 vs mongo_loader.py:103-117); field names follow the
# Mongo shape because that is what the analyses actually read.

VIDEO_DESC = T.StructType(
    [
        T.StructField("uploader", T.StringType(), True),
        T.StructField("age_days", T.LongType(), True),
        T.StructField("category", T.StringType(), True),
    ]
)

VIDEO_ATTRI = T.StructType(
    [
        T.StructField("length", T.LongType(), True),
        T.StructField("rating", T.DoubleType(), True),
    ]
)

VIDEO_ENGAGEMENT = T.StructType(
    [
        T.StructField("views", T.LongType(), True),
        T.StructField("num_ratings", T.LongType(), True),
        T.StructField("num_comments", T.LongType(), True),
    ]
)

VIDEOS = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("upload_date", T.DateType(), True),
        T.StructField("video_desc", VIDEO_DESC, True),
        T.StructField("video_attri", VIDEO_ATTRI, True),
        T.StructField("video_engagement", VIDEO_ENGAGEMENT, True),
        T.StructField("related_ids", T.ArrayType(T.StringType()), True),
    ]
)

# Flat TSV ingest shape (reference data_types.py:9-21): 9 positional fields
# then a variadic related-ids tail.  Used by io.tsv for the raw-crawl loader.
VIDEOS_FLAT = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("uploader_un", T.StringType(), True),
        T.StructField("age_days", T.LongType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("length_s", T.LongType(), True),
        T.StructField("views", T.LongType(), True),
        T.StructField("video_rate", T.DoubleType(), True),
        T.StructField("num_ratings", T.LongType(), True),
        T.StructField("num_comments", T.LongType(), True),
        T.StructField("related_ids", T.ArrayType(T.StringType()), True),
    ]
)
