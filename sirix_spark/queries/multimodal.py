"""Multimodal pipeline operators as first-class oracle-checked
queries: binary media columns processed through the Arrow-batched
mapInPandas decode path (functions/multimodal.py).

The media corpus is derived deterministically from `documents`
(content = FAKE-container image whose width/height/seed are pure
functions of doc_id, with a poison non-image blob every 97th doc), so
the DuckDB oracle can compute the expected decoded features
arithmetically — the Python decode stage is value-checked end-to-end,
not just shape-checked. Outputs are integer/boolean only; no float
drift surface.

Scale design: blob synthesis + decode are mapInPandas stages (Arrow
batches, bounded memory, no shuffle); the JVM-side metadata sniff
(with_media_metadata) runs BEFORE decode so poison blobs are routed
around the expensive path by built-in expressions — the 100 TB
pattern for media tables.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F

from sirix_spark.functions.multimodal import (
    HEADER,
    MAGIC,
    extract_image_features,
)
from sirix_spark.queries import Query
from sirix_spark.tables import load

POISON_EVERY = 97


def _media(spark, sf_dir):
    """(doc_id, content): deterministic synthetic media table.

    width = 8 + doc_id % 8, height = 8 + (doc_id // 8) % 8,
    seed = doc_id % 251; every POISON_EVERY-th doc gets a non-image
    blob (decode must tolerate it, not fail the stage)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if doc_id % POISON_EVERY == 0:
                    out.append(b"NOTANIMG")
                    continue
                w = 8 + doc_id % 8
                h = 8 + (doc_id // 8) % 8
                seed = doc_id % 251
                payload = bytes((seed + i * 31) % 256 for i in range(w * h))
                out.append(MAGIC + struct.pack("<II", w, h) + payload)
            pdf["content"] = out
            yield pdf

    return docs.mapInPandas(gen, schema="doc_id long, content binary")


def multimodal_features(spark, sf_dir):
    """Decode the media table via the Arrow mapInPandas stage and
    return integer/boolean features per blob (poison blobs →
    valid=false with NULL dims). carry_cols=["doc_id"]: the decode
    stage ships back only the id + features — never the blob
    (r10 optimization, guide §4.1; A/B 0.36 → 0.32 s, and at real
    blob sizes the saved Python→JVM Arrow bytes dominate)."""
    feats = extract_image_features(_media(spark, sf_dir), carry_cols=["doc_id"])
    return feats.select("doc_id", "width", "height", "n_bytes", "valid")


MULTIMODAL_FEATURES_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id % {POISON_EVERY} = 0 THEN NULL
            ELSE CAST(8 + doc_id % 8 AS INT) END AS width,
       CASE WHEN doc_id % {POISON_EVERY} = 0 THEN NULL
            ELSE CAST(8 + (doc_id // 8) % 8 AS INT) END AS height,
       CASE WHEN doc_id % {POISON_EVERY} = 0 THEN 8
            ELSE {HEADER} + (8 + doc_id % 8) * (8 + (doc_id // 8) % 8)
            END AS n_bytes,
       doc_id % {POISON_EVERY} <> 0 AS valid
FROM documents
"""


def multimodal_filter_decode(spark, sf_dir):
    """The scale pattern: JVM-side magic-byte sniff filters blobs
    BEFORE the Python decode stage touches them — only plausible
    images cross the Arrow boundary. Returns per-source aggregate of
    decoded bytes (integer-only)."""
    from sirix_spark.functions.multimodal import with_media_metadata

    media = with_media_metadata(_media(spark, sf_dir))
    plausible = media.filter(F.col("looks_fake_img")).drop("n_bytes", "looks_fake_img")
    feats = extract_image_features(plausible, carry_cols=[])
    return feats.agg(
        F.count("*").alias("n_images"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
    )


MULTIMODAL_FILTER_DECODE_SQL = f"""
WITH imgs AS (
  SELECT 8 + doc_id % 8 AS w, 8 + (doc_id // 8) % 8 AS h
  FROM documents WHERE doc_id % {POISON_EVERY} <> 0
)
SELECT count(*) AS n_images,
       CAST(sum({HEADER} + w * h) AS BIGINT) AS total_bytes,
       CAST(sum(w * h) AS BIGINT) AS total_pixels
FROM imgs
"""
# Outer BIGINT casts: DuckDB integer sum yields HUGEINT → Decimal on
# the driver's Arrow fetch → hash mismatch vs Spark's long.


# --- video frame sampling -------------------------------------------
VID_POISON_EVERY = 89
FRAME_EVERY_K = 2


def _videos(spark, sf_dir):
    """(doc_id, content): deterministic FAKEVID clips — n_frames =
    2 + doc_id % 5, width = 4 + doc_id % 4, height = 4,
    seed = doc_id % 97; every VID_POISON_EVERY-th doc is a non-video
    blob that must yield zero frames."""
    from sirix_spark.functions.multimodal import encode_fake_video

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                if doc_id % VID_POISON_EVERY == 0:
                    out.append(b"NOTAVID")
                    continue
                out.append(
                    encode_fake_video(
                        2 + doc_id % 5, 4 + doc_id % 4, 4, seed=doc_id % 97
                    )
                )
            pdf["content"] = out
            yield pdf

    return docs.mapInPandas(gen, schema="doc_id long, content binary")


def multimodal_frame_sample(spark, sf_dir):
    """Every-k-th-frame sampling over the synthetic video table:
    one row per kept frame with integer stats, value-checked (the
    oracle recomputes each frame's pixel sum arithmetically)."""
    from sirix_spark.functions.multimodal import sample_video_frames

    return sample_video_frames(_videos(spark, sf_dir), every_k=FRAME_EVERY_K)


MULTIMODAL_FRAME_SAMPLE_SQL = f"""
WITH clips AS (
  SELECT doc_id,
         2 + doc_id % 5 AS n_frames,
         4 + doc_id % 4 AS w,
         4 AS h,
         doc_id % 97 AS seed
  FROM documents WHERE doc_id % {VID_POISON_EVERY} <> 0
)
SELECT doc_id,
       CAST(f AS BIGINT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(list_sum(list_transform(range(0, w * h),
                     i -> (seed + f * 7 + i * 13) % 256)) AS BIGINT) AS pixel_sum
FROM clips, unnest(range(0, n_frames, {FRAME_EVERY_K})) AS t(f)
"""


QUERIES = {
    "multimodal_features": Query(
        multimodal_features, MULTIMODAL_FEATURES_SQL, ("multimodal",)
    ),
    "multimodal_frame_sample": Query(
        multimodal_frame_sample, MULTIMODAL_FRAME_SAMPLE_SQL, ("multimodal", "video")
    ),
    "multimodal_filter_decode": Query(
        multimodal_filter_decode, MULTIMODAL_FILTER_DECODE_SQL, ("multimodal",)
    ),
}
