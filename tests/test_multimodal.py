"""Multimodal plumbing tests: binary columns + Arrow-batched
mapInPandas decode/feature/resize stages over the deterministic FAKE
container (real codecs aren't in the container; the Spark-side
schema/batching/partitioning is what's under test)."""

from __future__ import annotations

import pytest

from sirix_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, M.encode_fake_image(4, 3, seed=1), "img/1"),
        (2, M.encode_fake_image(8, 2, seed=7), "img/2"),
        (3, b"not-an-image", "img/3"),
        (4, None, "img/4"),
    ]
    return spark.createDataFrame(rows, "id long, content binary, uri string").repartition(2)


def test_metadata_sniff_jvm_side(images):
    rows = {r["id"]: r for r in M.with_media_metadata(images).collect()}
    assert rows[1]["looks_fake_img"] is True
    assert rows[3]["looks_fake_img"] is False
    assert rows[1]["n_bytes"] == len(M.MAGIC) + 8 + 12


def test_feature_extraction(images):
    rows = {r["id"]: r for r in M.extract_image_features(images).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["valid"]) == (4, 3, True)
    assert rows[2]["mean_pixel"] is not None
    # poison blobs degrade to valid=false instead of failing the stage
    assert rows[3]["valid"] is False and rows[4]["valid"] is False
    # input columns preserved alongside features
    assert rows[1]["uri"] == "img/1"


def test_feature_extraction_carry_cols(images):
    """r10 optimization contract: carry_cols limits what crosses the
    Python boundary back to the JVM — only the named input columns +
    features are emitted (in particular NOT the binary payload), and
    the feature values are identical to the append-all default."""
    slim = M.extract_image_features(images, carry_cols=["id"])
    assert slim.columns == ["id", "width", "height", "n_bytes", "mean_pixel", "valid"]
    slim_rows = {r["id"]: r for r in slim.collect()}
    full_rows = {r["id"]: r for r in M.extract_image_features(images).collect()}
    for i in (1, 2, 3, 4):
        for c in ("width", "height", "n_bytes", "mean_pixel", "valid"):
            assert slim_rows[i][c] == full_rows[i][c]
    # carry_cols=[] emits features only (aggregating consumers)
    only = M.extract_image_features(images, carry_cols=[])
    assert only.columns == ["width", "height", "n_bytes", "mean_pixel", "valid"]
    assert only.count() == 4


def test_resize_roundtrip(images):
    resized = M.resize_images(images.filter("id <= 2"), 2, 2)
    feats = {r["id"]: r for r in M.extract_image_features(resized).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (2, 2)
    assert (feats[2]["width"], feats[2]["height"]) == (2, 2)


def test_decode_stub_boundary():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"JPEG-bytes-we-cannot-decode-here")
    w, h, px = M.decode_image(M.encode_fake_image(2, 2, seed=0))
    assert (w, h, len(px)) == (2, 2, 4)


def test_video_frame_sampling(spark):
    from sirix_spark.functions.multimodal import (
        encode_fake_video,
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [
            (1, encode_fake_video(5, 3, 2, seed=10)),
            (2, b"NOTAVID"),  # zero frames, must not fail the stage
            (3, encode_fake_video(1, 2, 2, seed=0)),
        ],
        "doc_id long, content binary",
    )
    out = sample_video_frames(df, every_k=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): r for r in out}
    # doc 1: frames 0, 2, 4 kept; doc 2: none; doc 3: frame 0
    assert set(got) == {(1, 0), (1, 2), (1, 4), (3, 0)}
    assert got[(1, 0)]["width"] == 3 and got[(1, 0)]["height"] == 2
    # frame 2 pixel sum: sum((10 + 2*7 + i*13) % 256 for i in range(6))
    assert got[(1, 2)]["pixel_sum"] == sum((10 + 14 + i * 13) % 256 for i in range(6))
