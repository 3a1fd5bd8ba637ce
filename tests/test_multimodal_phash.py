"""Media near-dup via the 64-bit chunk-mean perceptual hash: the hash must
be (a) integer-exact (the oracle gate at sf0.01 proves DuckDB bit-equality;
here we prove the semantics), (b) stable under the two planted copy kinds
(2x average-pool downscale, low-bit re-encode jitter), and (c) collision-
free across unrelated payloads, so the pigeonhole Hamming join surfaces
exactly the structural copies."""

import numpy as np
from pyspark.sql import functions as F

from pyspider_spark.functions.multimodal import (
    media_phash_near_dup,
    media_variants,
    phash64,
    synth_media_aligned,
)


def _docs_with_media(spark, n=40):
    rows = [
        (f"http://site{i % 4}.test/page?n={i}",
         [("media", None, f"media://img/p{i}", 0)])
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_phash_pooling_and_jitter_invariance(spark):
    """Every variant's hash stays within Hamming 3 of its base for almost
    all refs: pooling halves every chunk sum (the comparison is
    scale-free), jitter is zero-mean low-bit noise — only floor-rounding /
    near-threshold bits may flip."""
    media = synth_media_aligned(_docs_with_media(spark))
    hashes = {r["media_ref"]: r["phash"]
              for r in phash64(media_variants(media)).collect()}
    bases = sorted(r for r in hashes if "#" not in r)
    assert len(bases) == 40
    close = 0
    for b in bases:
        for suf in ("#half", "#jitter"):
            ham = bin((hashes[b] ^ hashes[b + suf]) & (2**64 - 1)).count("1")
            close += ham <= 3
    assert close >= 0.9 * 2 * len(bases)  # deterministic corpus: 90%+ hold


def test_phash_no_chance_collisions(spark):
    """Unrelated chained-stream payloads behave as random 64-bit points:
    no two distinct bases land within Hamming 3 (P ~ 2^-49 per pair)."""
    media = synth_media_aligned(_docs_with_media(spark, n=60))
    hs = [r["phash"] for r in phash64(media).collect()]
    assert len(hs) == len(set(hs))
    for i, a in enumerate(hs):
        for b in hs[i + 1:]:
            assert bin((a ^ b) & (2**64 - 1)).count("1") > 3


def test_media_near_dup_pairs_are_structural(spark):
    """End-to-end: every surviving pair shares a base ref (planted copies
    only), every base contributes at least one pair, and the plan contains
    no cartesian product (pigeonhole block join, not all-pairs)."""
    pairs = media_phash_near_dup(_docs_with_media(spark), max_hamming=3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    rows = pairs.collect()
    assert rows, "no pairs found"
    base = lambda r: r.split("#")[0]  # noqa: E731
    assert all(base(r["ref_a"]) == base(r["ref_b"]) for r in rows)
    with_signal = {base(r["ref_a"]) for r in rows}
    assert len(with_signal) >= 0.9 * 40


def test_pooled_variant_payload_is_exact_average(spark):
    """The #half variant is the exact integer average-pool of the base
    payload (the invariance proof depends on it)."""
    media = synth_media_aligned(_docs_with_media(spark, n=3))
    rows = {r["media_ref"]: bytes(r["payload"]) for r in media_variants(media).collect()}
    for ref in [r for r in rows if "#" not in r]:
        arr = np.frombuffer(rows[ref], dtype=np.uint8)
        half = np.frombuffer(rows[ref + "#half"], dtype=np.uint8)
        assert len(arr) % 128 == 0
        expect = (arr[0::2].astype(np.uint16) + arr[1::2]) // 2
        assert np.array_equal(half, expect.astype(np.uint8))
