"""Multimodal columns: opaque binary payloads + typed metadata, with
decode/feature-extract/resize/frame-sample as Arrow-batched stages over
mapInPandas (SURVEY.md §2 extras).

The image/audio libraries are not in this container, so the *decode* step
is stubbed two ways:
  - ``decode_stub_features``: a deterministic fake (features derived from
    the payload bytes) so the full Spark plumbing — schema, partitioning,
    UDF signature, Arrow batch shape — is real and TESTED;
  - ``decode_real``: raises NotImplementedError with the exact place a
    PIL/ffmpeg call plugs in.

Media rows reference the crawl corpus' media spans (media_ref), the same
shape a 100 TB pipeline would carry: payloads stay columnar binary, never
hit the driver, and flow through mapInPandas in Arrow batches.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, kind string, payload binary, width int, height int, bytes int"
)
FEATURE_SCHEMA = (
    "media_ref string, kind string, bytes int, feat array<float>, phash bigint"
)


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Materialize media spans into a typed binary table. The payload is a
    deterministic pseudo-blob: sha256 stream of the media_ref (stands in
    for real bytes; same shape/size discipline)."""
    refs = docs.select(
        F.explode(F.filter("spans", lambda s: s.kind == F.lit("media"))).alias("s")
    ).select(F.col("s").media_ref.alias("media_ref")).where(F.col("media_ref").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights, sizes = [], [], [], []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256(ref.encode()).digest()
                size = 256 + h[0] * 16
                payload = (h * ((size // len(h)) + 1))[:size]
                payloads.append(payload)
                widths.append(16 + h[1] % 64)
                heights.append(16 + h[2] % 64)
                sizes.append(size)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": "image",
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "bytes": sizes,
                }
            )

    return refs.distinct().mapInPandas(gen, MEDIA_SCHEMA)


def decode_stub_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Deterministic fake decoder: 'features' are byte-histogram moments of
    the payload — the Arrow plumbing (binary in, float array out, batch
    sizing, no driver hop) is exactly what a real CNN/codec stage uses."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, phashes = [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                chunks = np.array_split(arr.astype(np.float32), feat_dim)
                feats.append([float(c.mean()) for c in chunks])
                # hash the lowercase-hex encoding, not the raw bytes:
                # engine-portable (DuckDB's md5 only takes VARCHAR), so the
                # driver oracle can recompute phash end-to-end
                phashes.append(
                    int.from_bytes(
                        hashlib.md5(payload.hex().encode()).digest()[:8], "big", signed=True
                    )
                )
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "bytes": pdf["bytes"],
                    "feat": feats,
                    "phash": phashes,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def decode_real(media: DataFrame):
    """Plug point for a real decoder (PIL / torchaudio / pyav): replace
    decode_stub_features' byte-histogram with the actual decode inside the
    same mapInPandas signature."""
    raise NotImplementedError(
        "real image/audio decode requires PIL/ffmpeg (not in this container); "
        "use decode_stub_features for the tested plumbing"
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' on the stub payloads: take every Nth byte as a
    frame marker — shape-identical to video frame extraction (one input
    row → many frame rows), exercising the explode-side plumbing."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "frame_no": [], "frame_byte": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                for i, b in enumerate(payload[::every_n_bytes]):
                    out["media_ref"].append(ref)
                    out["frame_no"].append(i)
                    out["frame_byte"].append(int(b))
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, "media_ref string, frame_no int, frame_byte int")
