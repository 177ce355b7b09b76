"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with struct
metadata; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
over bounded batches (the same physical shape as the HTML kernel, so the
partitioning/skew story is shared).

The actual codecs are NOT available in this environment, so the decode step
is stubbed: ``decode_stub="fake"`` produces deterministic pseudo-features
from the payload bytes (testable plumbing), ``decode_stub="raise"`` raises
``NotImplementedError`` the way a missing codec would.  The Spark-side
contract — schema, batch shape, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "channels int, sha1 string"
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload column (stand-in for a real
    image/audio blob ingested from WARC)."""
    return df.select(
        F.col(id_col),
        F.encode(F.md5(F.col(text_col)), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def extract_media_features(
    media: DataFrame, decode_stub: str = "fake"
) -> DataFrame:
    """Decode + feature-extract each payload in Arrow batches."""
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                payload: bytes = row.payload
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "image decode requires a codec library not present in "
                        "this environment; plug a real decoder here"
                    )
                digest = hashlib.sha1(payload).hexdigest()
                rows.append(
                    {
                        "doc_id": row.doc_id,
                        "media_type": row.media_type,
                        "n_bytes": len(payload),
                        # deterministic fake decode: dimensions from digest
                        "width": 64 + int(digest[:2], 16),
                        "height": 64 + int(digest[2:4], 16),
                        "channels": 3,
                        "sha1": digest,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "n_bytes",
                    "width",
                    "height",
                    "channels",
                    "sha1",
                ],
            )

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)
