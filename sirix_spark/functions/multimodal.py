"""Multimodal column support: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched Pandas
functions (`mapInPandas`) — the pattern a 100 TB training-data
pipeline needs.

The engine treats media as:
    content: binary, meta: struct<mime:string, ...>
and runs decode / feature-extract / resize / frame-sample as
mapInPandas stages so each task streams Arrow batches (bounded
memory), with the binary payload never passing through Python
row-at-a-time.

Real codecs (PIL/opencv/librosa) are NOT in this container, so the
decode step is pluggable:
- if PIL is importable, real decode is used;
- otherwise the deterministic FAKE container format below keeps the
  plumbing (schema, batch shape, partitioning) real and testable.

FAKE format: b"FAKEIMG" | uint32 width | uint32 height | payload
(one byte per pixel, row-major, truncated/padded).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FAKEIMG"
HEADER = len(MAGIC) + 8

try:  # pragma: no cover - not in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def encode_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic synthetic image blob (for tests/fixtures)."""
    n = width * height
    payload = bytes((seed + i * 31) % 256 for i in range(n))
    return MAGIC + struct.pack("<II", width, height) + payload


def _decode_dims(blob: bytes) -> tuple[int, int] | None:
    if blob is None or not blob.startswith(MAGIC):
        return None
    w, h = struct.unpack_from("<II", blob, len(MAGIC))
    return w, h


def decode_image(blob: bytes):
    """Decode one blob to (width, height, pixel bytes).

    With a real codec installed this would decode actual formats;
    here only the FAKE container is supported and anything else
    raises, clearly marking the stub boundary."""
    if HAVE_PIL and not (blob or b"").startswith(MAGIC):  # pragma: no cover
        raise NotImplementedError("real-codec path requires PIL; not in container")
    dims = _decode_dims(blob)
    if dims is None:
        raise NotImplementedError(
            "only the FAKEIMG container is decodable in this environment"
        )
    w, h = dims
    return w, h, blob[HEADER : HEADER + w * h]


FEATURE_SCHEMA = (
    "width int, height int, n_bytes long, mean_pixel double, valid boolean"
)


def extract_image_features(
    df: DataFrame,
    content_col: str = "content",
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """Append decoded features per image via mapInPandas (Arrow
    batches; each output row aligned with its input row). Invalid /
    undecodable blobs yield valid=false rather than failing the
    stage — at corpus scale a poison blob must not kill the job.

    ``carry_cols`` (r10 optimization, guide §4.1: control how many
    columns cross the Python boundary): when given, the stage emits
    ONLY those input columns plus the features — in particular the
    binary payload is NOT shipped back Python→JVM just to be
    projected away above the stage (Spark cannot column-prune
    through a mapInPandas schema, so without this every consumer
    pays an Arrow round-trip of the full blob column). Default None
    keeps the original append-to-all-columns contract."""
    if carry_cols is None:
        carried = [f.name for f in df.schema.fields]
    else:
        carried = list(carry_cols)
    name_to_type = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {name_to_type[c]}" for c in carried] + [FEATURE_SCHEMA]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = {"width": [], "height": [], "n_bytes": [], "mean_pixel": [], "valid": []}
            for blob in pdf[content_col]:
                blob = bytes(blob) if blob is not None else None
                dims = _decode_dims(blob) if blob else None
                if dims is None:
                    feats["width"].append(None)
                    feats["height"].append(None)
                    feats["n_bytes"].append(len(blob) if blob else 0)
                    feats["mean_pixel"].append(None)
                    feats["valid"].append(False)
                else:
                    w, h = dims
                    px = blob[HEADER : HEADER + w * h]
                    feats["width"].append(w)
                    feats["height"].append(h)
                    feats["n_bytes"].append(len(blob))
                    feats["mean_pixel"].append(
                        round(sum(px) / len(px), 4) if px else None
                    )
                    feats["valid"].append(True)
            out = pdf[carried].copy() if carried else pd.DataFrame(index=pdf.index)
            for k, v in feats.items():
                out[k] = v
            yield out

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame, width: int, height: int, content_col: str = "content"
) -> DataFrame:
    """Resize stage (nearest-neighbor over the FAKE container;
    real-codec path stubbed). Output replaces `content_col`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for blob in pdf[content_col]:
                blob = bytes(blob) if blob is not None else None
                dims = _decode_dims(blob) if blob else None
                if dims is None:
                    out.append(None)
                    continue
                w, h = dims
                px = blob[HEADER : HEADER + w * h]
                resized = bytes(
                    px[min(int(y * h / height), h - 1) * w + min(int(x * w / width), w - 1)]
                    if px
                    else 0
                    for y in range(height)
                    for x in range(width)
                )
                out.append(MAGIC + struct.pack("<II", width, height) + resized)
            pdf[content_col] = out
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(run, schema=schema)


def with_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata (no decode): byte length + magic
    sniff. Runs as built-in expressions — use this for filtering
    BEFORE any Python decode stage so the expensive path sees only
    plausible blobs (predicate-pushdown thinking applied to media)."""
    c = F.col(content_col)
    return df.withColumn("n_bytes", F.length(c).cast("long")).withColumn(
        "looks_fake_img",
        F.expr(f"substring({content_col}, 1, {len(MAGIC)})") == F.lit(MAGIC),
    )


# --- video: frame sampling ------------------------------------------
# FAKE video container (same stub philosophy as FAKEIMG — the real
# codec path needs av/ffmpeg, not in this container image; the
# Spark-side plumbing — schema, Arrow batching, fan-out shape — is
# real and value-tested):
#   b"FAKEVID" | uint32 n_frames | uint32 width | uint32 height |
#   n_frames * (width*height) grayscale payload
VID_MAGIC = b"FAKEVID"
VID_HEADER = len(VID_MAGIC) + 12


def encode_fake_video(n_frames: int, width: int, height: int, seed: int = 0) -> bytes:
    frames = bytes(
        (seed + f * 7 + i * 13) % 256
        for f in range(n_frames)
        for i in range(width * height)
    )
    return VID_MAGIC + struct.pack("<III", n_frames, width, height) + frames


def sample_video_frames(
    df: DataFrame,
    every_k: int = 2,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Frame sampling: one output row per kept frame (frames 0, k,
    2k, …) with integer frame stats — the fan-out stage of a video
    pipeline. Arrow-batched mapInPandas; rows-per-batch is bounded by
    (batch size × frames/clip ÷ k), no shuffle. Non-video blobs emit
    zero rows (route poisons around the stage with
    with_media_metadata-style sniffing when they are frequent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, sums = [], [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                blob = bytes(blob) if blob is not None else None
                if not blob or not blob.startswith(VID_MAGIC):
                    continue
                n, w, h = struct.unpack_from("<III", blob, len(VID_MAGIC))
                fsz = w * h
                for f in range(0, n, every_k):
                    px = blob[VID_HEADER + f * fsz : VID_HEADER + (f + 1) * fsz]
                    ids.append(int(rid))
                    idxs.append(f)
                    ws.append(w)
                    hs.append(h)
                    sums.append(sum(px))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "pixel_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(
        run,
        schema=f"{id_col} long, frame_idx long, width int, height int, pixel_sum long",
    )
