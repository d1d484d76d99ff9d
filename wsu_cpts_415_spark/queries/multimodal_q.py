"""Multimodal registry queries: the mapInPandas decode path with its
deterministic kernel, oracle-checked against DuckDB performing the same
md5 arithmetic in SQL.  What the oracle pins is the PLUMBING -- binary
column handling, Arrow batch shape, UDF output schema -- since the fake
kernel's math is trivially mirrored (pipelines/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.pipelines.multimodal import (
    attach_payloads,
    attach_real_payloads,
    decode_and_featurize,
    decode_real,
    resize_plan,
    sample_frames,
)
from wsu_cpts_415_spark.registry import register

_DUCK_DECODED = """
    decoded AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               16 + h % 2048 AS width,
               16 + (h >> 8) % 2048 AS height,
               CASE WHEN doc_id % 3 = 2 THEN 1 + h % 240 ELSE 1 END
                   AS n_frames,
               list_transform(generate_series(0, 3),
                              i -> ROUND(((h >> (3 * i)) % 997) / 997.0, 6))
                   AS features
        FROM (
            SELECT doc_id, text,
                   (('0x' || substr(md5(text), 1, 8))::BIGINT) AS h
            FROM documents
        )
    )
"""


@register(
    "multimodal_decode_features",
    oracle=f"""
    WITH {_DUCK_DECODED}
    SELECT doc_id, media_type, n_bytes, width, height, n_frames,
           array_to_string(list_transform(features, x -> printf('%.6f', x)),
                           ',') AS features
    FROM decoded
    ORDER BY doc_id
    """,
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Arrow-batched decode -> typed metadata + feature
    vector, via mapInPandas (deterministic kernel; real codecs slot into
    decode_real).

    The feature vector is serialized to a fixed-format CSV string in the
    registered output (identically in both engines) because the driver's
    pandas canonicalizer cannot sort list cells; the array-typed form
    stays available via pipelines.multimodal.decode_and_featurize."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_and_featurize(attach_payloads(docs))
    return decoded.withColumn(
        "features",
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.6f", x)), ","
        ),
    ).orderBy("doc_id")


@register(
    "multimodal_resize_plan",
    oracle=f"""
    WITH {_DUCK_DECODED}
    SELECT doc_id, media_type, width, height,
           GREATEST(1, CAST(FLOOR(width * LEAST(1.0,
               256.0 / GREATEST(width, height))) AS BIGINT)) AS target_w,
           GREATEST(1, CAST(FLOOR(height * LEAST(1.0,
               256.0 / GREATEST(width, height))) AS BIGINT)) AS target_h
    FROM decoded
    ORDER BY doc_id
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan (cap 256) as pure column math over
    decoded metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return resize_plan(decode_and_featurize(attach_payloads(docs))).orderBy("doc_id")


@register(
    "multimodal_frame_samples",
    oracle=f"""
    WITH {_DUCK_DECODED}
    SELECT doc_id, n_frames, unnest(generate_series(0, n_frames - 1, 24))
               AS frame_idx
    FROM decoded
    WHERE media_type = 'video'
    ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-24th frame-sampling plan for video payloads (sequence +
    explode -- generator, no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(decode_and_featurize(attach_payloads(docs))).orderBy(
        "doc_id", "frame_idx"
    )


@register(
    "multimodal_audio_windows",
    oracle="""
    WITH audio AS (
        SELECT doc_id,
               (('0x' || substr(md5(text), 1, 8))::BIGINT) AS h
        FROM documents
        WHERE doc_id % 3 = 1
    ),
    meta AS (
        SELECT doc_id,
               CAST([8000, 12000, 16000][CAST(h % 3 AS INT) + 1] AS BIGINT)
                   AS sample_rate,
               500 + (h // 16) % 10000 AS duration_ms
        FROM audio
    )
    SELECT doc_id, sample_rate, duration_ms,
           unnest(generate_series(0,
               CAST((duration_ms - 250) // 125 AS BIGINT))) AS win_idx,
           unnest(generate_series(0,
               CAST((duration_ms - 250) // 125 AS BIGINT))) * 125 AS start_ms,
           sample_rate * 250 // 1000 AS n_samples
    FROM meta
    ORDER BY doc_id, win_idx
    """,
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """250 ms / 50%-overlap audio analysis-window plan (deterministic
    header stand-in; see pipelines.multimodal.audio_window_plan).  The
    third modality's scheduling artifact alongside the image resize plan
    and the video frame sampler."""
    from wsu_cpts_415_spark.pipelines.multimodal import audio_window_plan

    docs = load_table(spark, sf_dir, "documents")
    return audio_window_plan(attach_payloads(docs)).orderBy(
        "doc_id", "win_idx"
    )


@register(
    "multimodal_payload_dedup",
    oracle="""
    WITH payloads AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS media_type,
               md5(text) AS digest,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    ),
    uniq AS (
        SELECT media_type, digest,
               CAST(COUNT(*) AS BIGINT) AS copies,
               MAX(n_bytes) AS n_bytes
        FROM payloads GROUP BY media_type, digest
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_unique,
           CAST(SUM(copies) AS BIGINT) AS n_payloads,
           CAST(SUM(copies * n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM((copies - 1) * n_bytes) AS BIGINT) AS dedup_savings_bytes
    FROM uniq
    GROUP BY media_type
    ORDER BY media_type
    """,
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload exact dedup census: payloads grouped by md5 digest
    per media type, reporting unique count, total stored bytes, and the
    bytes a content-addressed store would save.  The digest is computed
    over the BINARY column (Spark md5 accepts binary directly); the
    oracle hashes the same UTF-8 bytes through DuckDB's md5.

    Scale: the shuffle key is the 16-byte digest -- payload bytes never
    move; the rollup is |media_type| rows.  This is the dedup-exact
    pattern applied to the opaque-binary modality."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_payloads(docs).select(
        "media_type", F.md5("payload").alias("digest"), "n_bytes"
    )
    uniq = payloads.groupBy("media_type", "digest").agg(
        F.count("*").alias("copies"), F.max("n_bytes").alias("n_bytes")
    )
    return (
        uniq.groupBy("media_type")
        .agg(
            F.count("*").alias("n_unique"),
            F.sum("copies").alias("n_payloads"),
            F.sum(F.col("copies") * F.col("n_bytes")).alias("total_bytes"),
            F.sum((F.col("copies") - 1) * F.col("n_bytes")).alias(
                "dedup_savings_bytes"
            ),
        )
        .orderBy("media_type")
    )


@register(
    "multimodal_decode_real",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS media_type
        FROM documents
    ),
    dims AS (
        SELECT doc_id, media_type,
               CASE media_type
                   WHEN 'image' THEN 16 + doc_id % 2048
                   WHEN 'audio' THEN 8000 + (doc_id % 8) * 4000
                   ELSE 128 + (doc_id % 16) * 16 END AS width,
               CASE media_type
                   WHEN 'image' THEN 16 + (doc_id * 7) % 2048
                   WHEN 'audio' THEN 1 + doc_id % 2
                   ELSE 96 + (doc_id % 12) * 16 END AS height,
               CASE media_type
                   WHEN 'image' THEN 1
                   WHEN 'audio' THEN 16 + doc_id % 64
                   ELSE 1 + doc_id % 24 END AS n_frames
        FROM base
    ),
    sized AS (
        SELECT doc_id, media_type, width, height, n_frames,
               CASE media_type
                   WHEN 'image' THEN 33
                   WHEN 'audio' THEN 44 + n_frames * 2 * height
                   ELSE LENGTH('YUV4MPEG2 W' || CAST(width AS VARCHAR)
                               || ' H' || CAST(height AS VARCHAR)
                               || ' F25:1 Ip A1:1') + 1 + n_frames * 6
               END AS n_bytes
        FROM dims
    )
    SELECT doc_id, media_type,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CAST(n_frames AS BIGINT) AS n_frames,
           array_to_string(list_transform(
               [width, height, n_frames, n_bytes],
               v -> printf('%.6f', ROUND((v % 997) / 997.0, 6))), ',')
               AS features
    FROM sized
    ORDER BY doc_id
    """,
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-format decode round-trip: JVM-side synthesis of genuine PNG /
    RIFF-WAVE / YUV4MPEG2 byte streams (header fields a pure function of
    doc_id), then the library-free header decoder parses them back inside
    the same Arrow-batched mapInPandas path the fake kernel uses
    (pipelines/multimodal.py:decode_real).  The oracle recomputes every
    parsed field from doc_id arithmetic, so any synthesis/parse
    disagreement (endianness, chunk walk, frame count) hash-fails.

    Scale: identical posture to multimodal_decode_features -- payload
    bytes stay on the executor, zero shuffles before the presentation
    sort."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_and_featurize(attach_real_payloads(docs), kernel=decode_real)
    return decoded.withColumn(
        "features",
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.6f", x)), ","
        ),
    ).orderBy("doc_id")


@register(
    "multimodal_resize_real",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS media_type
        FROM documents
    ),
    dims AS (
        SELECT doc_id, media_type,
               CASE media_type
                   WHEN 'image' THEN 16 + doc_id % 2048
                   WHEN 'audio' THEN 8000 + (doc_id % 8) * 4000
                   ELSE 128 + (doc_id % 16) * 16 END AS width,
               CASE media_type
                   WHEN 'image' THEN 16 + (doc_id * 7) % 2048
                   WHEN 'audio' THEN 1 + doc_id % 2
                   ELSE 96 + (doc_id % 12) * 16 END AS height
        FROM base
    )
    SELECT doc_id, media_type,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           GREATEST(1, CAST(FLOOR(width * LEAST(1.0,
               256.0 / GREATEST(width, height))) AS BIGINT)) AS target_w,
           GREATEST(1, CAST(FLOOR(height * LEAST(1.0,
               256.0 / GREATEST(width, height))) AS BIGINT)) AS target_h
    FROM dims
    ORDER BY doc_id
    """,
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan computed over REAL parsed headers:
    the genuine PNG/WAV/Y4M streams are decoded by the library-free
    header parser and the resize targets come out of the parsed
    dimensions -- the full synthesize -> parse -> plan chain, oracle-
    checked end-to-end from doc_id arithmetic (for audio the "resize"
    caps the sample-rate x channel grid the same way, a resample plan).
    """
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_and_featurize(attach_real_payloads(docs), kernel=decode_real)
    return resize_plan(decoded).orderBy("doc_id")


@register(
    "multimodal_jpeg_meta",
    oracle="""
    SELECT doc_id,
           'image' AS media_type,
           CAST(41 AS BIGINT) AS n_bytes,
           CAST(16 + doc_id % 4096 AS BIGINT) AS width,
           CAST(16 + (doc_id * 11) % 4096 AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS n_frames,
           array_to_string(list_transform(
               [16 + doc_id % 4096, 16 + (doc_id * 11) % 4096, 1, 41],
               v -> printf('%.6f', ROUND((v % 997) / 997.0, 6))), ',')
               AS features
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_jpeg_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG/JFIF round-trip: genuine minimal JPEG byte streams (SOI,
    APP0, SOF0 with big-endian dimensions, EOI) synthesized JVM-side,
    parsed back by the library-free MARKER-WALK decoder
    (pipelines/multimodal.py:decode_jpeg) -- JPEG's 0xFF-marker stream
    is a third header discipline next to PNG's length-prefixed chunks
    and RIFF's word-aligned chunk walk.  The oracle recomputes every
    parsed field from doc_id arithmetic, so any endianness or
    marker-step bug hash-fails.

    Scale: payload bytes stay on the executor (Arrow-batched
    mapInPandas), zero shuffles before the presentation sort."""
    from wsu_cpts_415_spark.pipelines.multimodal import (
        attach_jpeg_payloads,
        decode_jpeg,
    )

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_and_featurize(
        attach_jpeg_payloads(docs), kernel=decode_jpeg
    )
    return decoded.withColumn(
        "features",
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.6f", x)), ","
        ),
    ).orderBy("doc_id")


@register(
    "multimodal_bmp_meta",
    oracle="""
    SELECT doc_id,
           'image' AS media_type,
           CAST(54 AS BIGINT) AS n_bytes,
           CAST(16 + doc_id % 4096 AS BIGINT) AS width,
           CAST(16 + (doc_id * 7) % 4096 AS BIGINT) AS height,
           CAST(1 AS BIGINT) AS n_frames,
           array_to_string(list_transform(
               [16 + doc_id % 4096, 16 + (doc_id * 7) % 4096, 1, 54],
               v -> printf('%.6f', ROUND((v % 997) / 997.0, 6))), ',')
               AS features
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_bmp_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BMP round-trip: genuine minimal BMP byte streams
    (BITMAPFILEHEADER + BITMAPINFOHEADER, little-endian i32 dimensions)
    synthesized JVM-side, parsed back by the library-free FIXED-OFFSET
    decoder (pipelines/multimodal.py:decode_bmp) -- the fourth header
    discipline next to PNG chunks, RIFF's chunk walk, and JPEG's marker
    stream.  The oracle recomputes every parsed field from doc_id
    arithmetic, so any endianness or offset bug hash-fails.

    Scale: payload bytes stay on the executor (Arrow-batched
    mapInPandas), zero shuffles before the presentation sort."""
    from wsu_cpts_415_spark.pipelines.multimodal import (
        attach_bmp_payloads,
        decode_bmp,
    )

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_and_featurize(
        attach_bmp_payloads(docs), kernel=decode_bmp
    )
    return decoded.withColumn(
        "features",
        F.array_join(
            F.transform("features", lambda x: F.format_string("%.6f", x)), ","
        ),
    ).orderBy("doc_id")
