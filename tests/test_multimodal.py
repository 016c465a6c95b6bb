

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
