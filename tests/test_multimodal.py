

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
