"""Multimodal span plumbing: treat media as opaque binary + typed metadata.

Real image/audio decoding libraries are not available in this environment,
so the DECODE step is stubbed (``decode_media`` raises NotImplementedError
unless the deterministic fake is requested) — but the Spark-side plumbing
is real: binary payload fetch, Arrow-batched ``mapInPandas`` with a typed
output schema, and partition-friendly batch shapes. Swapping the stub for
PIL/ffmpeg is a function-body change only.
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


def media_metadata(docs: DataFrame) -> DataFrame:
    """Extract media spans, fetch payloads, and decode metadata via an
    Arrow-batched mapInPandas (one Python call per batch of media refs —
    the same shape a real thumbnailing/frame-sampling stage would use)."""
    media = (
        docs.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )

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
