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


# ---------------------------------------------------------------------------
# Media near-dup: a 64-bit chunk-mean perceptual hash over the payload bytes,
# Hamming-joined with the same pigeonhole blocking as text SimHash. This is
# the image-dedup stage of a multimodal pipeline (near-identical images —
# rescaled/re-encoded copies — dominate web media): a real deployment swaps
# the chunk-mean stub for pHash/aHash over decoded pixels inside the SAME
# mapInPandas kernel; everything downstream (blocking, verify, oracle shape)
# is the production plan. All hash math is INTEGER (cross-multiplied
# comparisons, no floats), so DuckDB reproduces every bit and the driver
# gate stays value-exact.
# ---------------------------------------------------------------------------

PHASH_BITS = 64


def synth_media_aligned(docs: DataFrame) -> DataFrame:
    """Like ``synth_media_table`` but (a) payload sizes are multiples of
    128 (size = 128 * (2 + h[0] % 16)): 64 phash chunks divide the payload
    exactly, and 2x average-pooling maps chunk boundaries onto chunk
    boundaries — the alignment a real pHash gets from its fixed 32x32
    resample; and (b) the payload is a CHAINED digest stream
    (block j = sha256(ref || ':' || j)), not one repeated digest — a
    repeated 32-byte period makes every chunk sum identical whenever the
    chunk size hits the period, collapsing ~1/16 of refs onto phash 0 and
    drowning the near-dup signal in degenerate cross-ref collisions."""
    refs = docs.select(
        F.explode(F.filter("spans", lambda s: s.kind == F.lit("media"))).alias("s")
    ).select(F.col("s").media_ref.alias("media_ref")).where(F.col("media_ref").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, widths, heights, sizes = [], [], [], []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256(ref.encode()).digest()
                size = 128 * (2 + h[0] % 16)
                payloads.append(
                    b"".join(
                        hashlib.sha256(f"{ref}:{j}".encode()).digest()
                        for j in range(size // 32)
                    )
                )
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


def media_variants(media: DataFrame) -> DataFrame:
    """Append two derived copies per media row — the near-duplicates a web
    corpus actually contains: ``#half`` (2x average-pooling downscale, the
    thumbnail shape) and ``#jitter`` (low-bit XOR perturbation, standing in
    for re-encode noise). Pure mapInPandas (narrow — fuses with the synth
    and hash stages into one task pipeline, no shuffle)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_ref", "kind", "payload", "width", "height", "bytes")}

            def emit(ref, kind, payload, w, h):
                out["media_ref"].append(ref)
                out["kind"].append(kind)
                out["payload"].append(payload)
                out["width"].append(w)
                out["height"].append(h)
                out["bytes"].append(len(payload))

            for ref, kind, payload, w, h in zip(
                pdf["media_ref"], pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                arr = np.frombuffer(payload, dtype=np.uint8)
                emit(ref, kind, payload, w, h)
                half = ((arr[0::2].astype(np.uint16) + arr[1::2]) // 2).astype(np.uint8)
                emit(ref + "#half", kind, half.tobytes(), w // 2, h // 2)
                jit = arr ^ (np.arange(len(arr)) % 4).astype(np.uint8)
                emit(ref + "#jitter", kind, jit.tobytes(), w, h)
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, MEDIA_SCHEMA)


def phash64(media: DataFrame) -> DataFrame:
    """(media_ref, phash): 64-bit chunk-mean hash — split the payload into
    64 chunks (byte i -> chunk i*64//len), bit c = 1 iff chunk c's mean
    exceeds the whole-payload mean, compared as integers
    (64 * sum(chunk) > sum(all), exact cross-multiplication — no float
    anywhere, so the DuckDB oracle reproduces every bit). Invariant under
    2x average-pooling when 128 | len (chunk sums halve, the comparison is
    scale-free; only //2 floor-rounding noise remains)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pows = np.uint64(1) << np.arange(PHASH_BITS, dtype=np.uint64)
        for pdf in batches:
            hashes = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(arr)
                if n % PHASH_BITS == 0:
                    sums = arr.reshape(PHASH_BITS, n // PHASH_BITS).sum(axis=1)
                else:  # ragged fallback: same i*64//n chunking, exact
                    sums = np.zeros(PHASH_BITS, dtype=np.int64)
                    np.add.at(sums, np.arange(n) * PHASH_BITS // n, arr)
                bits = sums * PHASH_BITS > arr.sum()
                v = int(pows[bits].sum())
                hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "phash": hashes})

    return media.select("media_ref", "payload").mapInPandas(
        kernel, "media_ref string, phash long"
    )


def synth_variant_phashes(docs: DataFrame) -> DataFrame:
    """(media_ref, phash) for every media span's aligned synth payload
    PLUS its ``#half`` / ``#jitter`` variants — the fused single-stage
    form of ``phash64(media_variants(synth_media_aligned(docs)))``,
    value-identical by construction (same sha256 chain, pooling, XOR and
    chunk-mean math). Fused because the composed form is three separate
    MapInPandas stages: the payload bytes cross the JVM<->Python boundary
    SIX times for data only the kernel needs (guide §4: control how many
    columns/bytes cross) — here only the refs enter and 8-byte hashes
    leave. Measured 14.3 s -> ~6 s for the 300k-payload hash table at
    sf1.0."""
    refs = docs.select(
        F.explode(F.filter("spans", lambda s: s.kind == F.lit("media"))).alias("s")
    ).select(F.col("s").media_ref.alias("media_ref")).where(F.col("media_ref").isNotNull())

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pows = np.uint64(1) << np.arange(PHASH_BITS, dtype=np.uint64)

        def ph(arr: np.ndarray) -> int:
            arr = arr.astype(np.int64)
            n = len(arr)
            if n % PHASH_BITS == 0:
                sums = arr.reshape(PHASH_BITS, n // PHASH_BITS).sum(axis=1)
            else:
                sums = np.zeros(PHASH_BITS, dtype=np.int64)
                np.add.at(sums, np.arange(n) * PHASH_BITS // n, arr)
            bits = sums * PHASH_BITS > arr.sum()
            v = int(pows[bits].sum())
            return v - (1 << 64) if v >= (1 << 63) else v

        for pdf in batches:
            out_refs, out_hashes = [], []
            for ref in pdf["media_ref"]:
                h = hashlib.sha256(ref.encode()).digest()
                size = 128 * (2 + h[0] % 16)
                payload = b"".join(
                    hashlib.sha256(f"{ref}:{j}".encode()).digest()
                    for j in range(size // 32)
                )
                arr = np.frombuffer(payload, dtype=np.uint8)
                half = ((arr[0::2].astype(np.uint16) + arr[1::2]) // 2).astype(np.uint8)
                jit = arr ^ (np.arange(len(arr)) % 4).astype(np.uint8)
                out_refs += [ref, ref + "#half", ref + "#jitter"]
                out_hashes += [ph(arr), ph(half), ph(jit)]
            yield pd.DataFrame({"media_ref": out_refs, "phash": out_hashes})

    return refs.distinct().mapInPandas(kernel, "media_ref string, phash long")


def media_phash_near_dup(
    docs: DataFrame, max_hamming: int = 3, max_block_size: int = 100_000
) -> DataFrame:
    """(ref_a, ref_b, hamming): near-duplicate media pairs across the
    corpus' media spans plus their derived copies — synth (aligned sizes)
    -> variants -> phash64 are ONE narrow mapInPandas pipeline (no shuffle
    until the block join), then the SimHash pigeonhole machinery blocks the
    64-bit space soundly for ``max_hamming`` (4 x 16-bit chunks: any pair
    within distance 3 shares an exact chunk). Random payloads collide at
    ~2^-49, so surviving pairs are structural copies, not chance."""
    from pyspider_spark.operators.dedup import simhash_near_pairs

    # fused single-stage hash kernel (synth_variant_phashes: only refs
    # enter Python, only hashes leave), persisted because the pigeonhole
    # machinery consumes the signature table from several plan branches
    # (block counts + both join sides) — without the cache each branch
    # re-ran the Python pipeline (the executed plan carried 24
    # MapInPandas nodes for 3 logical stages; guide §4/§5)
    sig = synth_variant_phashes(docs).select(
        F.col("media_ref").alias("doc"), F.col("phash").alias("simhash")
    ).persist()
    pairs = simhash_near_pairs(
        sig, max_hamming=max_hamming, bits=PHASH_BITS, max_block_size=max_block_size
    )
    return pairs.select(
        F.col("doc_a").alias("ref_a"), F.col("doc_b").alias("ref_b"), "hamming"
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
