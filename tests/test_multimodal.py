

def test_resize_images_exact_pixels(spark):
    import hashlib

    import numpy as np

    from shippai_knowledge_etl_spark.operators import multimodal as M

    text = "x" * 100  # fake decode: w=116, h=16
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = M.resize_images(
        M.attach_payload(df, "doc_id", "text"), 8, 4
    ).collect()[0]
    assert (out["src_w"], out["src_h"]) == (116, 16)
    assert (out["dst_w"], out["dst_h"]) == (8, 4)
    raw = text.encode()
    w, h = 116, 16
    grid = np.frombuffer(
        (raw * ((w * h) // len(raw) + 1))[: w * h], dtype=np.uint8
    ).reshape(h, w)
    yi = (np.arange(4) * h) // 4
    xi = (np.arange(8) * w) // 8
    expected = grid[yi][:, xi].tobytes()
    assert bytes(out["pixels"]) == expected
    assert out["pixel_md5"] == hashlib.md5(expected).hexdigest()
    assert out["ok"]


def test_resize_images_real_decoder_raises(spark):
    import pytest as _pytest

    from shippai_knowledge_etl_spark.operators import multimodal as M

    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with _pytest.raises(Exception):
        M.resize_images(
            M.attach_payload(df, "doc_id", "text"), 8, 8,
            use_real_decoder=True,
        ).collect()


def test_resize_images_empty_payload_zero_grid(spark):
    from shippai_knowledge_etl_spark.operators import multimodal as M

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = M.resize_images(
        M.attach_payload(df, "doc_id", "text"), 4, 4
    ).collect()[0]
    assert out["ok"] and (out["src_w"], out["src_h"]) == (16, 16)
    assert bytes(out["pixels"]) == b"\x00" * 16


def test_ahash_planted_copies_and_determinism(spark):
    """Identical payloads give identical signatures (hamming 0 pairs
    found for every planted copy) and the signature is a pure
    function of the payload across runs."""
    from shippai_knowledge_etl_spark.catalog import load_catalog

    fn = load_catalog()["mm_image_near_dup"].fn
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in fn(spark, "/root/testdata/sf0.001").collect()
    }
    planted = {(i, i + 300000) for i in range(0, 500, 25)}
    assert planted <= set(out)
    assert all(out[p] == 0 for p in planted)
    out2 = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in fn(spark, "/root/testdata/sf0.001").collect()
    }
    assert out == out2


def test_image_near_dup_pigeonhole_guarantee(spark):
    """hamming <= 3 pairs are ALWAYS generated (3 flips cannot touch
    all 4 bands); a 4-flip pair hitting every band is correctly out of
    reach at max_hamming=3."""
    from shippai_knowledge_etl_spark.operators.multimodal import (
        image_near_dup,
    )

    base = 0x0123_4567_89AB_CDEF
    flip3 = base ^ 0b111  # 3 flips, all in band 0
    spread3 = base ^ (1 | (1 << 16) | (1 << 32))  # 3 flips, 3 bands
    flip4 = base ^ (1 | (1 << 16) | (1 << 32) | (1 << 48))  # all 4 bands

    def signed(v):
        return v - (1 << 64) if v >= 1 << 63 else v

    sigs = spark.createDataFrame(
        [(1, signed(base), True), (2, signed(flip3), True),
         (3, signed(spread3), True), (4, signed(flip4), True)],
        "doc_id long, sig long, ok boolean",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup(sigs, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 3 and got[(1, 3)] == 3
    assert (1, 4) not in got  # hamming 4 > threshold, correctly dropped


def test_audio_vad_segments_merge_and_split(spark):
    """Synthetic multi-frame payloads: H=high-energy frame ('z'*256),
    L=low ('!'*256). HHLHH → 2 segments (longest 2); LLLL → 0; HHHH →
    1 segment of 4 — the islands merge exactly."""
    import os
    import tempfile

    H = "z" * 256  # ord z = 122 → energy 31232 > threshold
    L = "!" * 256  # ord ! = 33  → energy 8448  < threshold
    docs = [
        (1, H + H + L + H + H, "en", "s", 5 * 256),
        (2, L + L + L + L, "en", "s", 4 * 256),
        (3, H + H + H + H, "en", "s", 4 * 256),
    ]
    df = spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        from shippai_knowledge_etl_spark.catalog import load_catalog

        out = {
            r["doc_id"]: (r["n_frames"], r["n_speech_frames"],
                          r["n_segments"], r["longest_segment"])
            for r in load_catalog()["mm_audio_vad"].fn(spark, td).collect()
        }
    assert out[1] == (5, 4, 2, 2)
    assert out[2] == (4, 0, 0, 0)
    assert out[3] == (4, 4, 1, 4)


def test_png_codec_roundtrip_pixel_exact_all_filters():
    """Golden-array roundtrip: encode_png cycles ALL five RFC 2083
    filters (one per scanline, h >= 5), decode_png must reconstruct
    the exact pixel bytes. Content is a deterministic gradient chosen
    so every filter row has nonzero deltas both horizontally and
    vertically (a wrong Sub/Up/Average/Paeth cannot cancel out)."""
    from shippai_knowledge_etl_spark.operators.png_codec import (
        decode_png,
        encode_png,
    )

    w, h, c = 9, 7, 3
    golden = bytes(
        (x * 37 + y * 91 + ch * 53) % 256
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )
    data = encode_png(w, h, c, golden)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    ww, hh, cc, pixels = decode_png(data)
    assert (ww, hh, cc) == (w, h, c)
    assert pixels == golden  # bit-exact through all five filters

    # gray and RGBA channel layouts reconstruct exactly too
    for channels in (1, 2, 4):
        g = bytes(
            (x + 3 * y + 7 * ch) % 256
            for y in range(6)
            for x in range(5)
            for ch in range(channels)
        )
        ww, hh, cc, pixels = decode_png(encode_png(5, 6, channels, g))
        assert (ww, hh, cc) == (5, 6, channels)
        assert pixels == g


def test_png_codec_paeth_golden_scanline():
    """Checked-in golden: one Paeth-filtered scanline decoded by hand.
    Image 3x2 gray; row 0 filter None = [10, 20, 30]; row 1 filter
    Paeth with filtered bytes [1, 2, 3]. Paeth predictors for row 1:
    x=0: left=0, up=10, upleft=0 -> p=10, nearest is up=10 -> 11;
    x=1: left=11, up=20, upleft=10 -> p=21, |21-11|=10, |21-20|=1,
         |21-10|=11 -> up=20 -> 22;
    x=2: left=22, up=30, upleft=20 -> p=32, pa=10, pb=2, pc=12 ->
         up=30 -> 33."""
    import struct
    import zlib

    from shippai_knowledge_etl_spark.operators.png_codec import decode_png

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 10, 20, 30]) + bytes([4, 1, 2, 3])
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, c, pixels = decode_png(data)
    assert (w, h, c) == (3, 2, 1)
    assert list(pixels) == [10, 20, 30, 11, 22, 33]


def test_png_codec_palette_and_scope_errors():
    """Palette images expand to RGB; 16-bit depth and interlacing
    raise NotImplementedError; garbage raises ValueError."""
    import struct
    import zlib

    import pytest

    from shippai_knowledge_etl_spark.operators.png_codec import decode_png

    def chunk(ctype, payload):
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    magic = b"\x89PNG\r\n\x1a\n"
    # 2x2 palette image: indices [[0,1],[1,0]], palette red/blue
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 0, 255])
    raw = bytes([0, 0, 1]) + bytes([0, 1, 0])
    data = (
        magic
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, c, pixels = decode_png(data)
    assert (w, h, c) == (2, 2, 3)
    assert list(pixels) == [255, 0, 0, 0, 0, 255, 0, 0, 255, 255, 0, 0]

    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad16 = magic + chunk(b"IHDR", ihdr16)
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(bad16)

    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad_i = magic + chunk(b"IHDR", ihdr_i)
    with pytest.raises(NotImplementedError, match="interlacing"):
        decode_png(bad_i)

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def test_decode_image_features_real_png_path(spark):
    """use_real_decoder=True now actually decodes PNG payloads via the
    stdlib codec (round 9): dimensions come from the real IHDR, not
    the byte-length fake."""
    from pyspark.sql import functions as F

    from shippai_knowledge_etl_spark.operators import multimodal as M
    from shippai_knowledge_etl_spark.operators.png_codec import encode_png

    png = encode_png(4, 3, 3, bytes(range(36)))
    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    ).select("doc_id", F.col("payload"), F.lit(None).alias("meta"))
    rows = M.decode_image_features(df, use_real_decoder=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"], r["channels"]) == (4, 3, 3)
    assert r["ok"] is True
    assert r["byte_len"] == len(png)
