"""Multimodal plumbing + incremental streaming extraction."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from pdf_to_text_spark.operators.multimodal import (
    decode_image_meta,
    decode_video_frame,
    sample_video_frames,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk))
    )


def test_decode_image_meta(spark):
    from pdf_to_text_spark.core.jpegcodec import encode_jpeg

    rows = [
        (1, _png(640, 480)),
        (2, encode_jpeg(30, 20, 1, bytes(600))),
        (3, b"garbage bytes here"),
        (4, None),
        (5, b"\xff\xd8\xff\xe0 headerless jpeg body"),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r.asDict() for r in decode_image_meta(df).collect()}
    assert got[1]["kind"] == "png" and (got[1]["width"], got[1]["height"]) == (640, 480)
    # jpeg dims come from the real SOF header parse now
    assert got[2]["kind"] == "jpeg" and (got[2]["width"], got[2]["height"]) == (30, 20)
    assert got[3]["kind"] == "unknown" and got[3]["width"] == 0
    assert got[4]["n_bytes"] == 0
    assert got[5]["kind"] == "error" and got[5]["decode_error"]  # no SOF → row error
    again = {r["media_id"]: r.asDict() for r in decode_image_meta(df).collect()}
    assert again == got


def test_sample_video_frames_real_demux(spark):
    """Frame sampling is REAL demux now: every-Nth sample row carries
    the actual NAL payload bytes + keyframe flag from the MP4 sample
    tables; undemuxable rows degrade to a demux_error row; only
    NAL→pixels remains an explicit stub."""
    from pdf_to_text_spark.core.mp4codec import build_mp4

    samples = [bytes([i]) * (8 + i) for i in range(10)]
    rows = [
        (1, build_mp4(samples, keyframe_every=4)),
        (2, b"\x00\x00\x00\x18ftypisom truncated"),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    out = {}
    for r in sample_video_frames(df, every_n=3).collect():
        out.setdefault(r["media_id"], []).append(r.asDict())
    got1 = sorted(out[1], key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in got1] == [1, 4, 7, 10]
    # the emitted bytes ARE the sample payloads
    for r in got1:
        assert r["frame_bytes"] == samples[r["frame_no"] - 1]
    assert [r["keyframe"] for r in got1] == [True, False, False, False]  # stss: 1,5,9
    assert out[2][0]["demux_error"] and out[2][0]["frame_no"] == 0

    # fake payloads are not valid H.264 → disclosed MediaError (r5:
    # the I_PCM subset decodes for real; garbage never decodes silently)
    from pdf_to_text_spark.core.mediacodec import MediaError

    with pytest.raises(MediaError):
        decode_video_frame(got1[0]["frame_bytes"])


def test_decode_video_frames_ipcm_end_to_end(spark):
    """MP4 built from real I_PCM H.264 access units (AVCC length
    prefixes, the MP4 sample shape) → demux-sample → pixel decode:
    mean luma recovers each frame's known value; a non-H.264 payload
    degrades to a decode_error row, not a task failure."""
    import numpy as np

    from pdf_to_text_spark.core.h264 import encode_ipcm
    from pdf_to_text_spark.core.mp4codec import build_mp4
    from pdf_to_text_spark.operators.multimodal import decode_video_frames

    lumas = [17, 80, 133, 200]
    samples = [
        encode_ipcm(np.full((30, 44), v, np.uint8), length_prefixed=True)
        for v in lumas
    ] + [b"not an access unit"]
    df = spark.createDataFrame(
        [(1, build_mp4(samples, width=44, height=30))], "media_id long, media binary"
    )
    rows = {
        r["frame_no"]: r.asDict()
        for r in decode_video_frames(sample_video_frames(df, every_n=1)).collect()
    }
    assert len(rows) == 5
    for i, v in enumerate(lumas, start=1):
        assert rows[i]["decode_error"] is None
        assert (rows[i]["width"], rows[i]["height"]) == (44, 30)
        assert rows[i]["mean_luma"] == v
    assert rows[5]["mean_luma"] is None and rows[5]["decode_error"]


def test_sample_video_frames_out_of_range_is_error_row(spark):
    """ADVICE r3: a file whose sample index points past EOF (truncated
    or malformed stco) must emit demux_error rows for the out-of-range
    samples — never silently short/empty frame_bytes. Built by patching
    the LAST chunk's stco offset to near-EOF so its samples overrun."""
    import struct

    from pdf_to_text_spark.core.mp4codec import build_mp4

    samples = [bytes([65 + i]) * 40 for i in range(6)]
    full = build_mp4(samples, keyframe_every=3)
    # chunks of 3 → patch the second chunk's stco offset to 10 bytes
    # before EOF (search inside moov, i.e. past mdat, so a coincidental
    # byte pattern in payloads/box sizes can't be hit)
    moov_start = full.index(samples[3][:8]) + sum(len(s) for s in samples[3:])
    second_off = full.index(
        struct.pack(">I", full.index(samples[3][:8])), moov_start
    )
    patched = (
        full[:second_off]
        + struct.pack(">I", len(full) - 10)
        + full[second_off + 4 :]
    )
    df = spark.createDataFrame([(1, patched)], "media_id long, media binary")
    rows = sorted(
        (r.asDict() for r in sample_video_frames(df, every_n=1).collect()),
        key=lambda r: r["frame_no"],
    )
    assert len(rows) == 6
    ok = [r for r in rows if r["demux_error"] is None]
    bad = [r for r in rows if r["demux_error"] is not None]
    assert [r["frame_no"] for r in ok] == [1, 2, 3]
    assert [r["frame_no"] for r in bad] == [4, 5, 6]
    for r in ok:  # in-range rows still carry exact payloads
        assert r["frame_bytes"] == samples[r["frame_no"] - 1]
    for r in bad:
        assert r["frame_bytes"] is None
        assert "outside file" in r["demux_error"]


def test_incremental_streaming_extraction(spark, corpus_dir, golden_extracted, tmp_path):
    """availableNow streaming over the pages dir must equal the batch
    result, and a second drop of files is picked up incrementally."""
    from pdf_to_text_spark.streaming.stream import run_incremental_extraction

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    a, b = pages.randomSplit([0.5, 0.5], seed=1)
    a.write.mode("overwrite").parquet(in_dir)

    run_incremental_extraction(spark, in_dir, out_dir, ck)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == a.count()

    # drop more files → only the new ones are processed
    b.write.mode("append").parquet(in_dir)
    run_incremental_extraction(spark, in_dir, out_dir, ck)
    got = spark.read.parquet(out_dir)
    assert got.count() == pages.count()

    j = got.alias("g").join(golden_extracted.alias("o"), "url", "inner")
    assert j.filter(~F.col("g.extracted_text").eqNullSafe(F.col("o.extracted_text"))).count() == 0


def test_stream_windowed_counts_watermark_late_data(spark, tmp_path):
    """Late row within the watermark delay lands in its window;
    a too-late row is dropped; append emits each finalized window once."""
    from datetime import datetime

    from pdf_to_text_spark.streaming.stream import stream_windowed_counts

    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    schema = "ts timestamp, event_type string"

    def drop(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream_windowed_counts(spark, src, out, ckpt, schema, "1 hour", "30 minutes")
        _ = name

    t = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731
    drop("d1", [(t(9, 5), "a"), (t(10, 5), "a"), (t(10, 15), "a"), (t(11, 5), "b")])
    # watermark is now 10:35: the 9:00 window (end 10:00 <= wm) is
    # closed — 9:45 is TOO late and dropped; the 10:00 window is still
    # open — 10:50 is late-but-ok and lands in it
    drop("d2", [(t(9, 45), "a"), (t(10, 50), "a"), (t(11, 40), "b")])
    # advance the watermark past 12:00 so the remaining windows finalize
    drop("d3", [(t(12, 31), "b")])

    got = {
        (r["window_start"].hour, r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(9, "a"): 1, (10, "a"): 3, (11, "b"): 2}, got


def test_pdf_embedded_images_operator(spark):
    """notch 4: /DCTDecode XObject extraction + own-codec decode through
    the Arrow-batched operator, incl. row-level error tolerance."""
    from pdf_to_text_spark.core.jpegcodec import encode_jpeg
    from pdf_to_text_spark.core.pdfgen import build_pdf, page_content_stream
    from pdf_to_text_spark.operators.multimodal import pdf_embedded_images

    def doc(g, w, h):
        jpeg = encode_jpeg(w, h, 1, bytes([g]) * (w * h), quality=50)
        content = page_content_stream(["line one", "line two"]) + (
            f"\nq {w} 0 0 {h} 72 600 cm /Im0 Do Q".encode()
        )
        return build_pdf([content], flate=True, images=[(w, h, jpeg)])

    rows = [
        ("u1", doc(64, 16, 8)),
        ("u2", doc(200, 8, 24)),
        ("u3", b"%PDF-1.4\ngarbage"),  # unparseable → error row
        ("u4", build_pdf([page_content_stream(["no images here"])])),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in pdf_embedded_images(df).collect()}
    assert got["u1"]["mean_luma"] == 64 and (got["u1"]["width"], got["u1"]["height"]) == (16, 8)
    assert got["u2"]["mean_luma"] == 200 and got["u2"]["codec"] == "jpeg"
    assert got["u3"]["image_no"] == 0 and got["u3"]["extract_error"]
    assert "u4" not in got  # zero images → zero rows, no error row
    assert len(got) == 3


def test_pdf_embedded_images_password_and_g4(spark):
    """Round-5: the operator passes a user password through to the
    decryptor, and CCITT-G4 bitonal XObjects yield a bit-mean luma."""
    from pdf_to_text_spark.core.ccittfax import encode_g4
    from pdf_to_text_spark.core.pdfgen import build_pdf, page_content_stream
    from pdf_to_text_spark.operators.multimodal import pdf_embedded_images

    w, h = 16, 5  # 5 | 255: exact integer luma
    bm = [[1] * w if i < 2 else [0] * w for i in range(h)]  # 2/5 black
    pdf = build_pdf(
        [page_content_stream(["x"])],
        flate=True, encrypt=4, user_pw=b"pw",
        images=[(w, h, encode_g4(bm, w), "g4")],
    )
    df = spark.createDataFrame([("u1", pdf)], "url string, html binary")
    # no password → disclosed error row
    no_pw = pdf_embedded_images(df).collect()[0]
    assert no_pw["image_no"] == 0 and "password" in no_pw["extract_error"]
    # with password → decrypt + G4 decode + exact luma (3/5 white = 153)
    ok = pdf_embedded_images(df, password=b"pw").collect()[0]
    assert (ok["codec"], ok["mean_luma"]) == ("raw", 153)
