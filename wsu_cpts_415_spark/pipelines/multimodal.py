"""Multimodal-column plumbing: opaque binary payloads with typed metadata,
decoded/featurized via Arrow-batched mapInPandas (SURVEY.md build mandate;
north-star LLM-data ops).

The container has no image/audio/video libraries BY DESIGN, so the decode
kernel is swappable:

  * ``decode_real`` -- a working header decoder for three REAL public
    formats (PNG IHDR, RIFF/WAVE chunk walk, YUV4MPEG2), no external
    libraries; ``attach_real_payloads`` synthesizes genuine byte streams
    for it JVM-side.  Pixel/sample DATA decode (PIL/libav territory)
    slots in here when those libraries exist.
  * ``decode_fake`` -- a deterministic stand-in deriving "decoded" metadata
    and features from an md5 of the payload bytes.  Deterministic => the
    whole mapInPandas path is oracle-checkable against DuckDB SQL doing the
    same md5 arithmetic (queries/multimodal_q.py), which pins the REAL
    part: binary column handling, Arrow batch shapes, UDF signature,
    schema, partitioning.

Scale notes: mapInPandas streams Arrow batches (no per-row Python), keeps
columnar layout end-to-end, and the decode is embarrassingly parallel --
zero shuffles.  Payload bytes never leave the executor; only features and
metadata come back.  At 100 TB the payloads would live in parquet binary
columns (or object-store pointers) partitioned by media_type/date; the
plumbing here is exactly that shape.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 4

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_payloads(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, payload binary, n_bytes).

    The fixture has no binary column, so the document text stands in as
    the payload bytes (UTF-8); media_type is assigned deterministically.
    In production this is the parquet binary column as stored."""
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def _be32(c):
    """Big-endian uint32 pack as a column expression (PNG field order)."""
    return F.unhex(F.lpad(F.hex(c), 8, "0"))


def _le_bytes(c, width_hex: int):
    """Little-endian pack (RIFF/WAV field order): reverse the hex pairs."""
    h = F.lpad(F.hex(c), width_hex, "0")
    pairs = [F.substring(h, i, 2) for i in range(width_hex - 1, 0, -2)]
    return F.unhex(F.concat(*pairs))


def _le32(c):
    return _le_bytes(c, 8)


def _le16(c):
    return _le_bytes(c, 4)


def attach_real_payloads(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type, payload, n_bytes) where payload
    is a REAL public-format byte stream -- PNG (image), RIFF/WAVE
    (audio), YUV4MPEG2 (video) -- with header fields derived
    deterministically from doc_id so the decode round-trip is
    oracle-checkable.  Synthesis is pure JVM column math (hex/unhex
    packing, no Python): at 100 TB this projection rides the scan."""
    did = F.col("doc_id")
    # image: PNG signature + IHDR (width/height big-endian u32) + empty CRC
    w_img, h_img = 16 + did % 2048, 16 + (did * 7) % 2048
    png = F.concat(
        F.lit(bytes.fromhex("89504e470d0a1a0a")),
        _be32(F.lit(13)),
        F.lit(b"IHDR"),
        _be32(w_img),
        _be32(h_img),
        F.lit(b"\x08\x06\x00\x00\x00"),
        F.lit(b"\x00\x00\x00\x00"),
    )
    # audio: canonical 44-byte WAV header + silence body (content unread)
    rate = 8000 + (did % 8) * 4000
    ch = 1 + did % 2
    n_samples = 16 + did % 64
    block = 2 * ch
    data_size = n_samples * block
    wav = F.concat(
        F.lit(b"RIFF"),
        _le32(36 + data_size),
        F.lit(b"WAVEfmt "),
        _le32(F.lit(16)),
        _le16(F.lit(1)),
        _le16(ch),
        _le32(rate),
        _le32(rate * block),
        _le16(block),
        _le16(F.lit(16)),
        F.lit(b"data"),
        _le32(data_size),
        F.encode(F.repeat(F.lit("0"), data_size.cast("int")), "UTF-8"),
    )
    # video: YUV4MPEG2 plain-text header + one FRAME marker per frame
    w_vid = 128 + (did % 16) * 16
    h_vid = 96 + (did % 12) * 16
    n_frames = (1 + did % 24).cast("int")
    y4m = F.encode(
        F.concat(
            F.lit("YUV4MPEG2 W"),
            w_vid.cast("string"),
            F.lit(" H"),
            h_vid.cast("string"),
            F.lit(" F25:1 Ip A1:1\n"),
            F.repeat(F.lit("FRAME\n"), n_frames),
        ),
        "UTF-8",
    )
    media = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (did % 3 + 1).cast("int"),
    )
    payload = (
        F.when(media == "image", png).when(media == "audio", wav).otherwise(y4m)
    )
    return docs.select(
        "doc_id",
        media.alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def decode_real(payload: bytes, media_type: str) -> dict:
    """Real public-format header decode (no external libraries): PNG IHDR
    width/height, WAV fmt/data chunk walk (sample rate -> width, channels
    -> height, sample count -> n_frames), YUV4MPEG2 header parse + FRAME
    marker count.  Features are the same prime-modulus arithmetic as
    decode_fake (exact-half-free at 6 decimals), over the DECODED header
    fields -- so the full synthesize->parse round-trip is oracle-checked
    by doc_id arithmetic in DuckDB (queries/multimodal_q.py).

    Pixel/sample DATA decode (needing PIL/soundfile/av) stays out of
    scope by design; headers are enough for the engine-side plumbing
    (resize plans, frame sampling, payload dedup) this feeds."""
    import struct

    try:
        if media_type == "image":
            if (
                payload[:8] != bytes.fromhex("89504e470d0a1a0a")
                or payload[12:16] != b"IHDR"
            ):
                raise ValueError("not a PNG stream")
            width, height = struct.unpack(">II", payload[16:24])
            n_frames = 1
        elif media_type == "audio":
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE stream")
            # two-phase walk: collect chunks first so a data chunk BEFORE
            # fmt (spec-legal ordering) still divides by the true block
            # align, and a missing fmt chunk is an error, not zeros
            fmt_body = None
            data_size = None
            pos = 12
            while pos + 8 <= len(payload):
                cid, size = payload[pos : pos + 4], struct.unpack(
                    "<I", payload[pos + 4 : pos + 8]
                )[0]
                if cid == b"fmt ":
                    fmt_body = payload[pos + 8 : pos + 8 + size]
                elif cid == b"data":
                    data_size = size
                pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
            if fmt_body is None:
                raise ValueError("RIFF/WAVE stream has no fmt chunk")
            (_, height, width, _, block_align, _) = struct.unpack(
                "<HHIIHH", fmt_body[:16]
            )
            n_frames = (data_size or 0) // max(block_align, 1)
        elif media_type == "video":
            header, _, rest = payload.partition(b"\n")
            fields = header.decode("ascii").split()
            if not fields or fields[0] != "YUV4MPEG2":
                raise ValueError("not a YUV4MPEG2 stream")
            params = {f[0]: f[1:] for f in fields[1:]}
            width, height = int(params["W"]), int(params["H"])
            n_frames = rest.count(b"FRAME")
        else:
            raise ValueError(f"unknown media_type {media_type!r}")
    except ValueError:
        raise
    except Exception as exc:
        # truncated-after-magic / missing-field / non-ASCII streams raise
        # struct.error / KeyError / UnicodeDecodeError internally -- the
        # per-payload contract is ValueError for every malformed input
        raise ValueError(f"malformed {media_type} stream: {exc}") from exc
    n_bytes = len(payload)
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "features": [
            round((v % 997) / 997.0, 6)
            for v in (width, height, n_frames, n_bytes)
        ],
    }


def decode_fake(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in decode: metadata/features derived from
    md5(payload) -- mirrors the DuckDB oracle arithmetic exactly."""
    h = int(hashlib.md5(payload).hexdigest()[:8], 16)
    return {
        "width": 16 + h % 2048,
        "height": 16 + (h >> 8) % 2048,
        "n_frames": 1 + h % 240 if media_type == "video" else 1,
        "features": [
            round(((h >> (3 * i)) % 997) / 997.0, 6) for i in range(N_FEATURES)
        ],
    }


def decode_and_featurize(
    with_payloads: DataFrame,
    kernel: Callable[[bytes, str], dict] = decode_fake,
) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    One mapInPandas pass; the kernel runs per payload inside a batch loop
    (a real codec releases the GIL there).  Output schema is fixed and
    typed -- downstream joins/aggregations never see the binary column."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a NULL payload cannot decode: drop it here (the JVM-side
            # pipeline is null-safe for free; the Python kernel must be
            # made so by hand -- round-11 NULL-injection sweep)
            pdf = pdf[pdf["payload"].notna()]
            decoded = [
                kernel(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "n_frames": [d["n_frames"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return with_payloads.mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize planning as pure column math over decoded metadata: target
    dims preserving aspect ratio, capped at max_dim.  (The pixel transform
    itself belongs in the decode kernel; the plan is what the engine
    schedules and what tests can assert.)"""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest(F.col("width"), F.col("height")),
    )
    return decoded.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.greatest(F.lit(1), F.floor(F.col("width") * scale)).cast("bigint").alias("target_w"),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale)).cast("bigint").alias("target_h"),
    )


def sample_frames(decoded: DataFrame, every_n: int = 24) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per sampled frame
    index (explode of a sequence -- generator, no UDF)."""
    return (
        # n_frames >= 1 guard: a structurally valid zero-frame stream
        # (e.g. a Y4M header with no FRAME markers) must yield zero
        # sample rows, not an illegal sequence(0, -1) boundary error
        decoded.filter(
            (F.col("media_type") == "video") & (F.col("n_frames") >= 1)
        )
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


AUDIO_WIN_MS = 250  # analysis window length
AUDIO_HOP_MS = 125  # 50% overlap
AUDIO_RATES = (8000, 12000, 16000)  # deterministic stand-in header rates


def audio_window_plan(with_payloads: DataFrame) -> DataFrame:
    """Overlapping analysis-window plan for audio payloads: one row per
    {AUDIO_WIN_MS} ms window at {AUDIO_HOP_MS} ms hop, with the window's
    start offset and per-window sample count.

    The sample rate and duration stand in for a real header parse the
    same way decode_fake stands in for a codec: deterministic md5
    arithmetic over the payload bytes, so the SCHEDULING artifact -- how
    many windows, which offsets, what batch shape the feature kernel
    will see -- is real and oracle-checkable while the PCM decode stays
    a stub.  Pure column math + one explode; no UDF."""
    h = F.expr(
        "cast(conv(substr(md5(payload), 1, 8), 16, 10) as bigint)"
    )
    audio = with_payloads.filter(F.col("media_type") == "audio").select(
        "doc_id",
        h.alias("h"),
    )
    rate = F.element_at(
        F.array(*[F.lit(r) for r in AUDIO_RATES]),
        (F.col("h") % 3 + 1).cast("int"),
    )
    dur = 500 + (F.col("h") / 16).cast("bigint") % 10000
    meta = audio.select(
        "doc_id",
        rate.cast("bigint").alias("sample_rate"),
        dur.alias("duration_ms"),
    ).withColumn(
        "n_windows",
        (
            F.floor((F.col("duration_ms") - AUDIO_WIN_MS) / AUDIO_HOP_MS) + 1
        ).cast("bigint"),
    )
    return meta.select(
        "doc_id",
        "sample_rate",
        "duration_ms",
        F.explode(
            F.sequence(F.lit(0), F.col("n_windows") - 1)
        ).alias("win_idx"),
    ).select(
        "doc_id",
        "sample_rate",
        "duration_ms",
        "win_idx",
        (F.col("win_idx") * AUDIO_HOP_MS).alias("start_ms"),
        (F.col("sample_rate") * AUDIO_WIN_MS / 1000).cast("bigint").alias(
            "n_samples"
        ),
    )


def _be16(c):
    """Big-endian uint16 pack (JPEG field order)."""
    return F.unhex(F.lpad(F.hex(c), 4, "0"))


def attach_jpeg_payloads(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type='image', payload, n_bytes) where
    payload is a REAL minimal JPEG/JFIF byte stream: SOI, an APP0/JFIF
    segment, an SOF0 frame header carrying height/width (big-endian u16,
    derived from doc_id), and EOI -- 41 bytes.  Unlike PNG's
    length-prefixed chunks or RIFF's word-aligned chunk walk, JPEG is a
    MARKER stream (0xFF-prefixed segments with u16 payload lengths), so
    the decoder exercises a third header discipline.  Synthesis is pure
    JVM column math; at 100 TB this projection rides the scan."""
    did = F.col("doc_id")
    w = 16 + did % 4096
    h = 16 + (did * 11) % 4096
    jpeg = F.concat(
        F.lit(bytes.fromhex("ffd8")),  # SOI
        F.lit(bytes.fromhex("ffe00010")),  # APP0, length 16
        F.lit(b"JFIF\x00"),
        F.lit(bytes.fromhex("010100000100010000")),  # v1.1, no density/thumb
        F.lit(bytes.fromhex("ffc0001108")),  # SOF0, length 17, 8-bit
        _be16(h),
        _be16(w),
        F.lit(bytes.fromhex("03012200021101031101")),  # 3 comps, 4:2:0
        F.lit(bytes.fromhex("ffd9")),  # EOI
    )
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        jpeg.alias("payload"),
        F.length(jpeg).cast("bigint").alias("n_bytes"),
    )


def decode_jpeg(payload: bytes, media_type: str) -> dict:
    """Library-free JPEG/JFIF header decode by marker walk: verify SOI,
    then step 0xFF-marker segments by their big-endian u16 lengths until
    an SOF0-SOF15 frame header (height/width) appears; SOS or EOI before
    any SOF is malformed.  Same ValueError contract and feature
    arithmetic as decode_real, so the synthesize->parse round-trip is
    oracle-checked by doc_id arithmetic in DuckDB."""
    import struct

    try:
        if media_type != "image" or payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG stream")
        pos, width, height = 2, None, None
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                raise ValueError("lost marker alignment")
            marker = payload[pos + 1]
            if marker in (0xD9, 0xDA):  # EOI / SOS: no SOF seen
                break
            size = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
            # SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                _, height, width = struct.unpack(
                    ">BHH", payload[pos + 4 : pos + 9]
                )
                break
            pos += 2 + size
        if width is None:
            raise ValueError("no SOF frame header before SOS/EOI")
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"malformed JPEG stream: {exc}") from exc
    n_bytes = len(payload)
    return {
        "width": width,
        "height": height,
        "n_frames": 1,
        "features": [
            round((v % 997) / 997.0, 6)
            for v in (width, height, 1, n_bytes)
        ],
    }


def attach_bmp_payloads(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, media_type='image', payload, n_bytes) where
    payload is a REAL minimal BMP byte stream: BITMAPFILEHEADER ('BM',
    file size, pixel-data offset) + BITMAPINFOHEADER (biSize=40,
    little-endian i32 width/height derived from doc_id, 1 plane, 24bpp)
    -- 54 bytes, no pixel array.  BMP is the engine's fourth header
    discipline: a FIXED-OFFSET struct (fields live at absolute byte
    positions), unlike PNG's length-prefixed chunks, RIFF's aligned
    chunk walk, or JPEG's marker stream.  Synthesis is pure JVM column
    math; at 100 TB this projection rides the scan."""
    did = F.col("doc_id")
    w = 16 + did % 4096
    h = 16 + (did * 7) % 4096
    bmp = F.concat(
        F.lit(b"BM"),
        _le32(F.lit(54)),  # bfSize: header-only stream
        F.lit(bytes(4)),  # reserved
        _le32(F.lit(54)),  # bfOffBits
        _le32(F.lit(40)),  # biSize (BITMAPINFOHEADER)
        _le32(w),  # biWidth
        _le32(h),  # biHeight (bottom-up)
        _le16(F.lit(1)),  # biPlanes
        _le16(F.lit(24)),  # biBitCount
        F.lit(bytes(24)),  # compression..clrImportant, all zero
    )
    return docs.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        bmp.alias("payload"),
        F.length(bmp).cast("bigint").alias("n_bytes"),
    )


def decode_bmp(payload: bytes, media_type: str) -> dict:
    """Library-free BMP header decode by fixed offsets: verify the 'BM'
    magic and a DIB header big enough to carry dimensions (biSize >=
    40), then read little-endian i32 width/height at offsets 18/22
    (negative height = top-down row order -> absolute value).  Same
    ValueError contract and feature arithmetic as the other real
    decoders, so the synthesize->parse round-trip is oracle-checked by
    doc_id arithmetic in DuckDB."""
    import struct

    try:
        if media_type != "image" or payload[:2] != b"BM":
            raise ValueError("not a BMP stream")
        if len(payload) < 26:
            raise ValueError("truncated BITMAPFILEHEADER")
        (bi_size,) = struct.unpack("<I", payload[14:18])
        if bi_size < 40:
            raise ValueError(f"unsupported DIB header size {bi_size}")
        width, height = struct.unpack("<ii", payload[18:26])
        if width <= 0:
            raise ValueError("non-positive BMP width")
        height = abs(height)  # negative = top-down scan order
    except ValueError:
        raise
    except Exception as exc:
        raise ValueError(f"malformed BMP stream: {exc}") from exc
    n_bytes = len(payload)
    return {
        "width": width,
        "height": height,
        "n_frames": 1,
        "features": [
            round((v % 997) / 997.0, 6)
            for v in (width, height, 1, n_bytes)
        ],
    }
