"""Real PNG/WAV codecs + multimodal feature operators."""

from __future__ import annotations

import math
import random

import pytest

from pdf_to_text_spark.core.mediacodec import (
    MediaError,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    gray_thumbnail,
)
from pdf_to_text_spark.operators.multimodal import decode_media_features, image_signatures


def _img(w, h, ch, seed=3):
    rng = random.Random(seed)
    return bytes(rng.randrange(256) for _ in range(w * h * ch))


@pytest.mark.parametrize("row_filter", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_every_filter_and_colortype(row_filter, channels):
    """encode (forward filter) → decode (inverse filter) must be
    lossless for all five PNG filters × four 8-bit color types."""
    w, h = 13, 7  # odd sizes catch stride bugs
    px = _img(w, h, channels)
    got = decode_png(encode_png(w, h, channels, px, row_filter))
    assert got == (w, h, channels, px)


def test_png_rejects_malformed():
    with pytest.raises(MediaError):
        decode_png(b"\x89PNG\r\n\x1a\nnot really")
    good = encode_png(4, 4, 3, _img(4, 4, 3))
    with pytest.raises(MediaError):
        decode_png(good[:40])  # truncated


def test_wav_roundtrip_rms():
    samples = [int(10000 * math.sin(i / 5)) for i in range(8000)]
    ch, rate, n, dur, rms = decode_wav(encode_wav(8000, samples))
    assert (ch, rate, n) == (1, 8000, 8000)
    assert abs(dur - 1.0) < 1e-9
    expected = math.sqrt(sum(v * v for v in samples) / len(samples))
    assert abs(rms - expected) < 1e-6


def test_decode_media_features_real_vs_fake(spark):
    rows = [
        (1, encode_png(20, 10, 3, _img(20, 10, 3))),
        (2, encode_wav(16000, [0, 100, -100, 50] * 100)),
        (3, b"\xff\xd8\xff\xe0 fake jpeg body"),
        (4, b"\x89PNG\r\n\x1a\ntruncated"),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r.asDict() for r in decode_media_features(df).collect()}
    assert got[1]["decoder"] == "real" and (got[1]["width"], got[1]["height"]) == (20, 10)
    assert got[2]["decoder"] == "real" and got[2]["sample_rate"] == 16000 and got[2]["rms"] > 0
    assert got[3]["decoder"] == "fake"  # honestly labeled
    assert got[4]["kind"] == "error" and got[4]["decode_error"]


def test_image_signatures_find_near_dup(spark):
    """Real-pixel near-dup: a one-pixel perturbation stays ~identical
    in signature space; a different image does not."""
    w, h = 16, 16
    base = bytearray(_img(w, h, 3, seed=5))
    near = bytearray(base)
    near[0] = (near[0] + 9) % 256  # single-pixel change
    other = _img(w, h, 3, seed=99)
    df = spark.createDataFrame(
        [
            (1, encode_png(w, h, 3, bytes(base))),
            (2, encode_png(w, h, 3, bytes(near))),
            (3, encode_png(w, h, 3, other)),
        ],
        "media_id long, media binary",
    )
    sigs = {r["media_id"]: r["signature"] for r in image_signatures(df).collect()}
    # verify against the pure-python reference thumbnail
    assert sigs[1] == gray_thumbnail(w, h, 3, bytes(base), 4)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    assert cos(sigs[1], sigs[2]) > 0.999
    assert cos(sigs[1], sigs[2]) > cos(sigs[1], sigs[3])
