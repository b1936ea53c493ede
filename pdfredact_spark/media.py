"""Multimodal span plumbing: treat media as opaque binary + typed metadata.

Real image/audio decoding libraries are not available in this environment,
so the DECODE step is stubbed: ``decode_media`` returns deterministic
digest-derived fake metadata BY DEFAULT (``fake=True``), and the real
decoder path (``fake=False``) raises NotImplementedError until PIL/ffmpeg
exist — callers wiring real media must pass ``fake=False`` explicitly or
they will ship fabricated width/height/n_frames. The Spark-side plumbing
is real either way: binary payload fetch, Arrow-batched ``mapInPandas``
with a typed output schema, and partition-friendly batch shapes.
Swapping the stub for PIL/ffmpeg is a function-body change only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (

    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("n_frames", IntegerType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ]
)


def fetch_media_bytes(media_ref: str) -> bytes:
    """Deterministic fake payload store: in production this is an object
    store / Iceberg binary column read. Payload = ref-derived bytes."""
    seed = hashlib.md5(media_ref.encode()).digest()
    return seed * (1 + seed[0] % 8)


def decode_media(payload: bytes, fake: bool = True) -> dict:
    """STUB: real decode (image open / frame sample / resize) needs PIL or
    ffmpeg, absent in this container. The deterministic fake derives
    metadata from the payload digest so tests and oracles are stable."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg (not in this container)"
        )
    d = hashlib.md5(payload).digest()
    return {
        "n_frames": 1 + d[0] % 16,
        "width": 64 * (1 + d[1] % 8),
        "height": 64 * (1 + d[2] % 8),
    }


def resize_dims(width: int, height: int, target: int = 256) -> tuple[int, int]:
    """Aspect-preserving thumbnail arithmetic (longest side -> target,
    integer math, floor, min 1px). This part is REAL — only the pixel
    resample below is stubbed."""
    m = max(width, height)
    return max(1, width * target // m), max(1, height * target // m)


def resize_media(
    payload: bytes, width: int, height: int, target: int = 256, fake: bool = True
) -> dict:
    """STUB resample: real pixel work needs PIL/ffmpeg. The fake derives a
    thumbnail digest from (payload, output dims) so results are stable."""
    if not fake:
        raise NotImplementedError(
            "real media resampling requires PIL/ffmpeg (not in this container)"
        )
    w, h = resize_dims(width, height, target)
    digest = hashlib.md5(payload + f":resize:{w}x{h}".encode()).hexdigest()
    return {"out_width": w, "out_height": h, "thumb_digest": digest}


def sample_frame_indices(n_frames: int, k: int = 4) -> list[int]:
    """Uniformly-spread frame sampling: at most k frames, always frame 0,
    indices i*n//k so coverage spans the whole clip (the former
    stride-from-0 form was front-biased — n=15, k=4 gave [0,3,6,9],
    never sampling the last 5 frames; this gives [0,3,7,11])."""
    if k < 1:
        # range(k) would silently yield NO frames and every video would
        # vanish from the frame-extract output
        raise ValueError(f"k must be >= 1, got {k}")
    if n_frames < 1:
        # same vanishing-video hazard from the other argument (round-5
        # review): the deterministic fake decoder always reports >= 1
        # frame, but a real decoder can return 0 for a corrupt/empty
        # clip — fail fast so the caller routes it to an error channel
        # instead of the clip silently dropping from the output
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    return sorted({i * n_frames // k for i in range(k) if i * n_frames // k < n_frames})


def frame_digest(payload: bytes, idx: int) -> str:
    """STUBBED frame decode: digest stands in for the frame tensor."""
    return hashlib.md5(payload + f":frame:{idx}".encode()).hexdigest()


def media_metadata(docs: DataFrame) -> DataFrame:
    """Extract media spans, fetch payloads, and decode metadata via an
    Arrow-batched mapInPandas (one Python call per batch of media refs —
    the same shape a real thumbnailing/frame-sampling stage would use)."""
    media = _media_refs(docs)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [fetch_media_bytes(r) for r in pdf["media_ref"]]
            metas = [decode_media(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "n_bytes": [len(p) for p in payloads],
                    "n_frames": [m["n_frames"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                }
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_META_SCHEMA)


THUMB_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("out_width", IntegerType(), False),
        StructField("out_height", IntegerType(), False),
        StructField("thumb_digest", StringType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("media_ref", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_digest", StringType(), False),
    ]
)


def _media_refs(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )


def media_thumbnails(docs: DataFrame, target: int = 256) -> DataFrame:
    """Fetch -> decode -> aspect-preserving resize per media span, one
    Arrow batch per Python call (the thumbnailing stage of a multimodal
    ingest; resample stubbed, dimension arithmetic real)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, digs = [], [], []
            for r in pdf["media_ref"]:
                p = fetch_media_bytes(r)
                m = decode_media(p)
                t = resize_media(p, m["width"], m["height"], target)
                ws.append(t["out_width"])
                hs.append(t["out_height"])
                digs.append(t["thumb_digest"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "out_width": ws,
                    "out_height": hs,
                    "thumb_digest": digs,
                }
            )

    return _media_refs(docs).mapInPandas(fn, schema=THUMB_SCHEMA)


def media_frames(docs: DataFrame, k: int = 4) -> DataFrame:
    """Fetch -> decode -> uniform-stride frame sampling, one output row
    per sampled frame (the one-to-many multimodal shape: a video span
    fans out to k frame rows; decode stubbed behind a digest)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            d_out, r_out, i_out, g_out = [], [], [], []
            for d, r in zip(pdf["doc_id"], pdf["media_ref"]):
                p = fetch_media_bytes(r)
                m = decode_media(p)
                for idx in sample_frame_indices(m["n_frames"], k):
                    d_out.append(d)
                    r_out.append(r)
                    i_out.append(idx)
                    g_out.append(frame_digest(p, idx))
            yield pd.DataFrame(
                {
                    "doc_id": d_out,
                    "media_ref": r_out,
                    "frame_idx": i_out,
                    "frame_digest": g_out,
                }
            )

    return _media_refs(docs).mapInPandas(fn, schema=FRAME_SCHEMA)
