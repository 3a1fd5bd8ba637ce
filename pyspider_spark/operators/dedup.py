"""Deduplication operators for training-data pipelines (SURVEY.md §2
extras): exact, MinHash+LSH, SimHash, n-gram Jaccard.

All JVM-side (one exception: winnowing fingerprints are an Arrow-batched
pandas_udf — see its docstring for the Catalyst lambda-collapse blowup it
avoids): shingling is explode + substring, MinHash is one explode +
one groupBy with n partial-agg mins (no UDF), SimHash is per-bit signed
sums, LSH banding is an explode + self-join on (band, band_hash). The only
shuffles are the per-doc groupBys and the bucket self-join — at 100 TB the
bucket join is the classic LSH candidate-pair plan: band hash distributes
uniformly, and a hot bucket (boilerplate text) is bounded by
``max_bucket_size`` before the join (standard guard, else one giant
bucket quadratically explodes). Bucket counts use groupBy+join (a partial
agg + broadcast-able join), NOT a window — a window would sort every
bucket partition for a count.

Hashing is the engine-portable md5-slice (functions/portable_hash.py), so
every pipeline here is mirrorable 1:1 in DuckDB SQL for the correctness
gate (pyspider_spark/oracles.py generates the mirrors).
"""

from __future__ import annotations

import os
from math import ceil

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspider_spark.functions.portable_hash import HASH_BITS, md5_hash56
from pyspider_spark.functions.text import fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by normalized-content fingerprint: one hash-groupBy,
    keep the smallest id as canonical (deterministic)."""
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """(doc, shset: array<string>) — each doc's DISTINCT character
    k-shingles (lowercased, ws-normalized) as ONE array row, built in a
    single row expression (transform(sequence) + array_distinct): zero
    shuffle, zero explode. The array form is what the minhash pipeline
    consumes end-to-end (VERDICT r04 item 6 — signatures and verify sets
    derive per-row from this array, eliminating both 1M-row groupBys the
    exploded shape needed). Memory: one doc's shingle array lives in one
    row buffer (~len*k chars), fine for web-page-sized docs; multi-MB
    docs would want the exploded variant."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    arr = F.expr(
        f"array_distinct(transform(sequence(1, greatest(length(t) - {k - 1}, 1)),"
        f" p -> substring(t, p, {int(k)})))"
    )
    return (
        df.select(F.col(id_col).alias("doc"), norm.alias("t"))
        .select("doc", arr.alias("shset"))
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Thin exploded (doc, shingle) pairs — ``shingle_sets`` flattened
    (the shape the n-gram Jaccard query and the oracle CTEs mirror)."""
    return shingle_sets(df, text_col, id_col, k).select(
        "doc", F.explode("shset").alias("shingle")
    )


MERSENNE31 = (1 << 31) - 1  # prime modulus for the universal hash family


def minhash_coeffs(n_hashes: int, seed: int = 1337) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the classic universal family
    h_i(x) = (a_i * x + b_i) mod p — shared with the oracle generator."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE31), rng.randrange(0, MERSENNE31))
        for _ in range(n_hashes)
    ]


def minhash_signatures(
    shingled: DataFrame, n_hashes: int = 32
) -> DataFrame:
    """MinHash: ONE md5 per shingle reduced mod 2^31-1, then the n hashes
    come from the universal family (a_i*h + b_i) mod p — pure BIGINT
    arithmetic (a_i, h < 2^31 so products fit a signed 64-bit in every
    engine). 32x fewer md5 calls than hashing per-function (measured 3x
    faster end-to-end at sf0.1); one groupBy computes all n partial-agg
    mins map-side."""
    h = (md5_hash56(F.col("shingle")) % F.lit(MERSENNE31)).alias("h")
    base = shingled.select("doc", h)
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MERSENNE31)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
    ]
    return base.groupBy("doc").agg(*mins)


def minhash_signatures_from_sets(shsets: DataFrame, n_hashes: int = 32) -> DataFrame:
    """Same signatures as ``minhash_signatures``, computed per-ROW from
    the (doc, shset) array — no explode, no groupBy, no exchange at all
    (VERDICT r04 item 6: the signature groupBy was minhash's dominant
    exchange). One md5 per shingle materializes into an ``h_arr`` column
    (its own projection, so the 32 consumers don't recompute it), then
    each hash function is an array_min over a transform of that array —
    identical arithmetic to the grouped form, so the DuckDB oracle is
    unchanged."""
    h_arr = F.transform(
        F.col("shset"), lambda s: md5_hash56(s) % F.lit(MERSENNE31)
    )
    base = shsets.select("doc", h_arr.alias("h_arr"))
    mins = [
        F.array_min(
            F.transform(
                F.col("h_arr"),
                lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MERSENNE31),
            )
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
    ]
    return base.select("doc", *mins)


def _guard_buckets(df: DataFrame, keys: list[str], max_size: int) -> DataFrame:
    """Hot-bucket guard: drop buckets larger than ``max_size`` before a
    self-join (one partial-agg groupBy + an inner join on the bucket key —
    no window sort; the counts side is tiny and broadcast-able)."""
    counts = df.groupBy(*keys).agg(F.count("*").alias("_bucket_n"))
    return (
        df.join(counts.where(F.col("_bucket_n") <= max_size), keys, "inner")
        .drop("_bucket_n")
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, rows: int = 4, max_bucket_size: int = 1000
) -> DataFrame:
    """Band the signature, bucket-join docs sharing any band hash.
    Band hash = md5_hash56 of the '|'-joined row hashes (portable).
    Emits distinct (doc_a, doc_b) with doc_a < doc_b.

    The banded table persists (thin (doc, band, bh) rows): the guard's
    count branch, its join branch, and both self-join sides otherwise
    each re-run the band-hash Generate — whose computed struct-array
    input re-evaluates per output row (the dup_substring_spans lesson)."""
    banded = _band_explode(sigs, bands, rows).persist()
    sized = _guard_buckets(banded, ["band", "bh"], max_bucket_size)
    a = sized.select("band", "bh", F.col("doc").alias("doc_a"))
    b = sized.select("band", "bh", F.col("doc").alias("doc_b"))
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, shingled: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """Exact Jaccard on candidate pairs: |A∩B| = array_intersect of the
    two docs' shingle SETS, |A∪B| = |A|+|B|-|A∩B|.

    Shape (VERDICT r03 item 8): each doc's shingles aggregate ONCE into an
    array (one row per doc), the candidate pairs join that table on each
    side, and the intersection is a per-row JVM set operation. The old
    plan joined the EXPLODED shingle rows through the pairs —
    |pairs| × shingles-per-doc intermediate rows (86M rows for 420k
    candidates at sf0.1; measured 29s of the query's 33s) — where this
    computes the same counts over |pairs| rows. The per-doc set table is
    |docs| rows: broadcast when small, a keyed shuffle join at corpus
    scale (and LSH guarantees the pair side is bucket-pruned, never
    all-pairs)."""
    # intersect 64-bit shingle hashes, not strings: the per-pair set op is
    # long comparisons instead of string hashing (measured 2.5x on the
    # verify stage). A cross-collision inside one candidate pair would
    # perturb a count with probability ~|A||B|/2^64 per pair — standard
    # near-dup practice, and the string-exact oracle stays green on the
    # deterministic test corpora.
    # persist: both join sides broadcast this table — without the cache
    # the 1M-row collect_list aggregation runs once per side
    sets = shingled.groupBy("doc").agg(
        F.collect_list(F.xxhash64("shingle")).alias("sh"),
        F.count("*").alias("n_sh"),
    ).persist()
    return jaccard_verify_sets(pairs, sets, threshold)


# when the whole per-doc set table (sum of array bytes) fits under this
# bound, the verify joins broadcast it instead of sort-merge-shuffling
# |pairs| x two fat arrays (measured at sf1.0: 8.5M candidate pairs x
# ~2.3 KB arrays = a ~40 GB SMJ shuffle, 47 s; broadcast verify 17 s).
# At corpus scale the probe reports a size over the bound and the join
# stays keyed — the adaptive broadcast-when-it-fits rule of guide §3.1.
SETS_BROADCAST_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SETS_BROADCAST_MAX", str(256 << 20))
)


def _fits_broadcast(df: DataFrame, n_elems) -> bool:
    """One cheap agg job estimating a per-doc array table's in-memory
    bytes (``n_elems``: per-row element-count column/expression). Size
    estimates from Catalyst are unreliable after opaque transforms, so
    probe the real number (guide §3.1: estimates are often badly wrong;
    hint when you know)."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"), F.sum(n_elems).alias("tot")
    ).first()
    if not row or row["n"] is None or row["tot"] is None:
        return False
    est = int(row["tot"]) * 8 + int(row["n"]) * 32
    return est <= SETS_BROADCAST_MAX_BYTES


def _sets_fit_broadcast(sets: DataFrame) -> bool:
    return _fits_broadcast(sets, F.col("n_sh"))


def jaccard_verify_sets(
    pairs: DataFrame, sets: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """Exact-Jaccard verify against a prebuilt per-doc hash-set table
    ``sets`` = (doc, sh: array<long>, n_sh) — the join/intersection core
    shared by the exploded-input wrapper above and the array-form
    pipeline (where ``sets`` derives per-row from shingle_sets with no
    aggregation).

    Shape (r06): the set table broadcasts when its probed size fits
    (else keyed joins — the 100-TB fallback); the intersection size
    lands in ONE projection materialized thin (5 longs per pair) behind
    a persist barrier, because filter pushdown otherwise clones the
    array_intersect across the Filter/Project boundary and evaluates it
    2x per pair (measured 17 s -> 11.7 s at sf1.0)."""
    fit = _sets_fit_broadcast(sets)
    a = sets.select(
        F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("n_a")
    )
    b = sets.select(
        F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("n_b")
    )
    if fit:
        a, b = F.broadcast(a), F.broadcast(b)
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    # the pair table is BYTE-small but each row costs an O(|A|+|B|) set
    # intersection — AQE coalesces it by size to a handful of partitions
    # and serializes the compute; spread it across the cluster explicitly
    pairs = pairs.repartition(pairs.sparkSession.sparkContext.defaultParallelism * 2)
    # sound size-ratio prefilter (the AllPairs length bound): J(A,B) >= t
    # implies |A∩B| <= min and |A∪B| >= max, so min >= t * max — a pair
    # failing it can NEVER clear the threshold, so dropping it before the
    # O(|A|+|B|) intersection preserves the output exactly (the 1e-9 slack
    # covers double rounding of t * max; the true bound is rational)
    size_ok = F.least("n_a", "n_b").cast("double") >= F.lit(
        float(threshold) - 1e-9
    ) * F.greatest("n_a", "n_b").cast("double")
    thin = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .where(size_ok)
        .select("doc_a", "doc_b", "n_a", "n_b", n_inter.alias("n_inter"))
        .persist()
    )
    return (
        thin.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def estimate_prefilter(
    pairs: DataFrame, sigs: DataFrame, n_hashes: int, min_matches: int,
) -> DataFrame:
    """Cut candidate pairs by the MinHash Jaccard ESTIMATE before the
    exact verify: a pair's matching-minhash count is an unbiased sample
    of its Jaccard (E[matches] = n_hashes × J), so pairs far below the
    threshold — the overwhelming bulk of LSH candidates on template-heavy
    corpora (sf0.1: 420k candidates → 256 survivors) — drop for 2 ×
    n_hashes long-compares instead of an O(|A|+|B|) set intersection.
    The signature table is |docs| rows of packed longs: broadcast when
    small, keyed join at corpus scale. Deterministic (same signatures in
    both engines), so the DuckDB oracle mirrors it exactly."""
    packed = sigs.select(
        "doc", F.array(*[F.col(f"h{i}") for i in range(n_hashes)]).alias("sig")
    )
    a = packed.select(F.col("doc").alias("doc_a"), F.col("sig").alias("sig_a"))
    b = packed.select(F.col("doc").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .where(matches >= F.lit(min_matches))
        .select("doc_a", "doc_b")
    )


def minhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, n_hashes: int = 32, bands: int = 8, rows: int = 4,
    threshold: float = 0.7, max_bucket_size: int = 1000,
    est_margin: float | None = None,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bucket join →
    [optional estimate prefilter] → exact-Jaccard verify. Returns
    (doc_a, doc_b, jaccard).

    ``est_margin``: pairs whose estimated Jaccard (matching-minhash
    fraction) falls below ``threshold - est_margin`` skip the exact
    verify; with n=32 hashes the estimate's σ at J=0.7 is ~0.08, so 0.25
    (≈3σ) drops a true above-threshold pair with probability ~0.2%, and
    the oracle mirrors the cut exactly. Default OFF: an interleaved A/B
    at sf0.1 measured the prefilter 0.89× (the per-doc set table
    broadcasts there, so array_intersect is already cheaper than two
    extra joins). It is the right lever only when the set table is too
    large to broadcast — each dropped pair then saves a shuffled
    O(|A|+|B|) row — so enable it at corpus scale, not below.

    Pipeline shape (VERDICT r04 item 6): everything per-doc derives from
    ONE persisted (doc, shset) array row — signatures are array_min over
    per-row transforms (no explode, no groupBy: the signature groupBy was
    the dominant remaining exchange) and the verify hash-set table is a
    per-row transform of the same array (the 1M-row collect_list
    aggregation is gone too). The only exchanges left are the banded
    bucket self-join and its size guard. The signature table persists
    (it feeds the band join twice plus the guard); ``pairs`` persists (it
    feeds the verify joins); without the caches each consumer re-runs its
    upstream DAG and joins plan without runtime stats."""
    shsets = shingle_sets(df, text_col, id_col, k).persist()
    sigs = minhash_signatures_from_sets(shsets, n_hashes).persist()
    pairs = lsh_candidate_pairs(sigs, bands, rows, max_bucket_size).persist()
    if est_margin is not None:
        min_matches = max(0, int(ceil((threshold - est_margin) * n_hashes)))
        pairs = estimate_prefilter(pairs, sigs, n_hashes, min_matches)
    sets = shsets.select(
        "doc",
        F.transform(F.col("shset"), lambda s: F.xxhash64(s)).alias("sh"),
        F.size("shset").cast("long").alias("n_sh"),
    )
    return jaccard_verify_sets(pairs, sets, threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = HASH_BITS) -> DataFrame:
    """SimHash: token hashes vote per bit; sign of the sum sets the bit.
    One explode + one groupBy with `bits` conditional sums (JVM).
    Default 56 bits = the portable md5-slice hash width (a full signed-64
    signature would need a second md5 slice for marginal extra precision).
    """
    if bits > HASH_BITS:
        raise ValueError(f"bits must be <= {HASH_BITS} (md5-slice hash width)")
    # hash each token exactly ONCE in a projection — md5 is the expensive
    # part, and referencing it from `bits` aggregate expressions would
    # otherwise rely on codegen CSE to avoid 56 recomputes per token
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "").select("doc", md5_hash56(F.col("tok")).alias("h"))
    # branch-free votes: ones_i = sum of bit i, n = token count;
    # the +-1 vote is positive iff 2*ones_i > n (ties land negative in
    # both formulations, so the signature is bit-identical)
    ones = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc").agg(F.count(F.lit(1)).alias("_n"), *ones)
    sig = sum(
        (
            F.when(
                F.col(f"b{i}") * 2 > F.col("_n"),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
            for i in range(bits)
        ),
        F.lit(0).cast("long"),
    )
    return agg.select("doc", sig.alias("simhash"))


def simhash_chunk_plan(max_hamming: int, bits: int = HASH_BITS) -> tuple[int, int]:
    """(n_chunks, chunk_bits) for pigeonhole blocking: a pair within
    Hamming distance d shares at least one exact chunk iff n_chunks > d,
    so n_chunks = max_hamming + 1. Requires bits % n_chunks == 0 so the
    chunk extraction is a uniform shift/mask in both engines."""
    n_chunks = max_hamming + 1
    if bits % n_chunks != 0:
        # round chunk count UP to the next divisor of bits: more chunks
        # than the pigeonhole minimum is still sound (smaller chunks,
        # more candidate pairs, same guarantee)
        divisors = [d for d in range(n_chunks, bits + 1) if bits % d == 0]
        n_chunks = divisors[0]
    return n_chunks, bits // n_chunks


def simhash_near_pairs(
    sig: DataFrame, max_hamming: int = 3, bits: int = HASH_BITS,
    max_block_size: int = 1000,
) -> DataFrame:
    """Near-dup pairs by Hamming distance, pigeonhole-blocked SOUNDLY for
    the requested ``max_hamming``: the signature splits into
    ``max_hamming + 1`` chunks (any pair within that distance shares at
    least one exact chunk), self-join per chunk, verify with bit_count.
    A popular chunk value (boilerplate / near-constant signatures) is
    dropped by ``max_block_size`` before the join — same guard as the
    MinHash LSH buckets (a 30%%-hot block would otherwise go O(n²))."""
    n_chunks, chunk_bits = simhash_chunk_plan(max_hamming, bits)
    mask = (1 << chunk_bits) - 1
    chunk_cols = [
        F.struct(
            F.lit(c).alias("ck"),
            F.shiftrightunsigned(F.col("simhash"), chunk_bits * c)
            .bitwiseAND(F.lit(mask)).alias("blk"),
        )
        for c in range(n_chunks)
    ]
    blocked = sig.select(
        "doc", "simhash", F.explode(F.array(*chunk_cols)).alias("cb")
    ).select("doc", "simhash", F.col("cb").ck.alias("ck"), F.col("cb").blk.alias("blk"))
    guarded = _guard_buckets(blocked, ["ck", "blk"], max_block_size)
    a = guarded.select("ck", "blk", F.col("doc").alias("doc_a"), F.col("simhash").alias("sig_a"))
    b = guarded.select("ck", "blk", F.col("doc").alias("doc_b"), F.col("simhash").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("long")
    return (
        a.join(b, ["ck", "blk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: pairs -> connected components -> canonical doc.
# The reference stops at pairwise similarity; a training-data pipeline needs
# the transitive closure (A~B, B~C => {A,B,C} is ONE duplicate cluster, keep
# one canonical member). Alternating large-star/small-star (Kiveris et al.,
# "Connected Components in MapReduce and Beyond", SoCC 2014) converges in
# O(log n) rounds regardless of component diameter — plain min-label
# propagation needs O(diameter) rounds, which on web-scale near-dup chains
# (mirror farms) is the difference between ~15 and ~10000 shuffles.
# ---------------------------------------------------------------------------


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star or small-star round over an undirected edge list.

    large-star: for every node u, connect each LARGER neighbor to the
    minimum of u's closed neighborhood. small-star: canonicalize edges to
    (bigger, smaller) and connect each smaller neighbor (and u itself) to
    that minimum. Each round is one groupBy + one join, both shuffled on
    the node key — no collect, no window."""
    u, v = F.col("u"), F.col("v")
    if large:
        nbrs = edges.union(edges.select(v.alias("u"), u.alias("v")))
        emit_filter = F.col("v") > F.col("u")
    else:
        nbrs = edges.select(
            F.greatest(u, v).alias("u"), F.least(u, v).alias("v")
        )
        emit_filter = F.lit(True)  # all neighbors of u are <= u here
    mins = nbrs.groupBy("u").agg(F.min("v").alias("mv")).select(
        "u", F.least(F.col("u"), F.col("mv")).alias("m")
    )
    out = (
        nbrs.join(mins, "u")
        .where(emit_filter)
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    if not large:
        out = out.union(mins.select(F.col("u"), F.col("m").alias("v")))
    return out.where(F.col("u") != F.col("v")).distinct()


def _cc_with_iters(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
    max_iter: int = 25,
) -> tuple[DataFrame, int]:
    """(components, rounds-used). Iterates (large-star, small-star) until
    the edge set reaches a fixpoint — at which point every edge is
    (node, component-minimum). The fixpoint check is a cheap aggregate
    fingerprint (count + xor of row hashes; xor, not sum, so ANSI
    overflow checking can never trip it), one extra job per round; each
    round's result is eagerly localCheckpoint-ed so lineage stays O(1)
    across iterations instead of doubling per round."""
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    fp_cols = [
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ]
    prev_fp = edges.agg(*fp_cols).first()
    iters = 0
    for _ in range(max_iter):
        iters += 1
        edges = _star_round(_star_round(edges, large=True), large=False)
        edges = edges.localCheckpoint(eager=True)
        fp = edges.agg(*fp_cols).first()
        if fp == prev_fp:
            break
        prev_fp = fp
    return edges, iters


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(doc, component) for every doc appearing in ``pairs``, where
    ``component`` is the smallest doc id in its connected component (the
    conventional canonical label). Star edges at the fixpoint all point
    node -> root, so the output is the edge list plus each root mapped to
    itself."""
    edges, _ = _cc_with_iters(pairs, a_col, b_col, max_iter)
    roots = edges.select(F.col("v").alias("u"), F.col("v"))
    return (
        edges.union(roots).distinct()
        .select(F.col("u").alias("doc"), F.col("v").alias("component"))
    )


def dedup_assign(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    a_col: str = "doc_a", b_col: str = "doc_b",
) -> DataFrame:
    """Join every document to its near-dup cluster: adds ``component``
    (its own id when the doc is in no pair — singleton cluster) and
    ``is_canonical`` (the member a keep-one-per-cluster pipeline
    retains). The components table is tiny relative to the corpus (only
    docs that appear in some near-dup pair), so the join broadcasts."""
    comp = connected_components(pairs, a_col, b_col).withColumnRenamed("doc", id_col)
    return df.join(F.broadcast(comp), id_col, "left").select(
        df["*"],
        F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        (F.coalesce(F.col("component"), F.col(id_col)) == F.col(id_col)).alias(
            "is_canonical"
        ),
    )


def _band_explode(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(doc, band, bh) from a signature table — the banding step of
    lsh_candidate_pairs, factored so the incremental probe can band each
    side independently."""
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            md5_hash56(
                F.concat_ws("|", *[F.col(f"h{b * rows + r}") for r in range(rows)])
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    return sigs.select("doc", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc", F.col("bb").band.alias("band"), F.col("bb").bh.alias("bh")
    )


def minhash_archive_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, n_hashes: int = 32, bands: int = 8, rows: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """(bands_df, sets_df): the materializable LSH index of a corpus
    snapshot — ``bands`` = (doc, band, bh) for the bucket probe, ``sets``
    = (doc, sh: array<long>, n_sh) for the exact-Jaccard verify. A
    deployment writes BOTH to storage at snapshot time (parquet/Iceberg
    partitioned by band) so the next increment probes the archive
    without re-shingling it; ``incremental_minhash_pairs`` derives the
    same rows inline for the self-contained form."""
    sh = shingle_sets(docs, text_col, id_col, k).persist()
    # persisted: the probe guard reads the band table from two branches
    # (bucket counts + the join), and the band-hash Generate re-evaluates
    # its computed input otherwise (see lsh_candidate_pairs)
    banded = _band_explode(
        minhash_signatures_from_sets(sh, n_hashes), bands, rows
    ).persist()
    sets = sh.select(
        "doc",
        F.transform(F.col("shset"), lambda s: F.xxhash64(s)).alias("sh"),
        F.size("shset").cast("long").alias("n_sh"),
    )
    return banded, sets


def incremental_minhash_probe(
    new_docs: DataFrame, archive_bands: DataFrame, archive_sets: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, n_hashes: int = 32, bands: int = 8, rows: int = 4,
    threshold: float = 0.7, max_bucket_size: int = 1000,
) -> DataFrame:
    """(doc_new, doc_old, jaccard): probe a NEW increment against a
    prebuilt archive index (``minhash_archive_index`` rows — inline or
    read back from storage). The archive is never self-joined or
    re-shingled: the increment's bands inner-join the archive band table
    (hot archive buckets size-guarded first), and the verify joins each
    side's own per-row shingle-hash-set table, filtering on the
    UNROUNDED Jaccard then rounding — the same order as
    jaccard_verify_sets / the oracle, so borderline pairs agree."""
    new_bands, new_sets = minhash_archive_index(
        new_docs, text_col, id_col, k, n_hashes, bands, rows
    )
    ok_old = _guard_buckets(archive_bands, ["band", "bh"], max_bucket_size)
    pairs = (
        new_bands.select("band", "bh", F.col("doc").alias("doc_new"))
        .join(ok_old.select("band", "bh", F.col("doc").alias("doc_old")),
              ["band", "bh"])
        .select("doc_new", "doc_old")
        .distinct()
    )
    a = new_sets.select(
        F.col("doc").alias("doc_new"), F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("n_a"),
    )
    b = archive_sets.select(
        F.col("doc").alias("doc_old"), F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("n_b"),
    )
    # same verify shape as jaccard_verify_sets (r06): broadcast each side
    # that fits (probed, not estimated; keyed join at corpus scale), sound
    # size-ratio prefilter, and the intersection computed ONCE into a thin
    # persisted row so filter pushdown can't clone it across the boundary
    if _sets_fit_broadcast(new_sets):
        a = F.broadcast(a)
    if _sets_fit_broadcast(archive_sets):
        b = F.broadcast(b)
    size_ok = F.least("n_a", "n_b").cast("double") >= F.lit(
        float(threshold) - 1e-9
    ) * F.greatest("n_a", "n_b").cast("double")
    n_inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    thin = (
        pairs.join(a, "doc_new").join(b, "doc_old")
        .where(size_ok)
        .select("doc_new", "doc_old", "n_a", "n_b", n_inter.alias("n_inter"))
        .persist()
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    return (
        thin.withColumn("_j", jac)
        .where(F.col("_j") >= threshold)
        .select("doc_new", "doc_old", F.round("_j", 4).alias("jaccard"))
    )


def incremental_minhash_pairs(
    new_docs: DataFrame, old_docs: DataFrame,
    text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, n_hashes: int = 32, bands: int = 8, rows: int = 4,
    threshold: float = 0.7, max_bucket_size: int = 1000,
) -> DataFrame:
    """(doc_new, doc_old, jaccard): near-dups of a NEW crawl increment
    against the EXISTING corpus — the dedup verb a continuously-crawling
    pipeline actually runs per snapshot (new-vs-new pairs are the batch
    ``minhash_dedup``'s job; GPT-3/RefinedWeb-style fuzzy dedup applied
    incrementally). A doc present in both sides legitimately pairs with
    itself at jaccard 1.0 — an unchanged recrawl.

    Scale shape — the whole point vs re-running batch dedup over
    old ∪ new: the OLD corpus is never self-joined and never re-paired;
    its band table (in deployment the ``minhash_archive_index`` written
    at the last snapshot — byte-identical rows, probe-from-storage
    tested) is probed by an inner join from the increment's bands, so
    per-snapshot cost is |new| × bands plus the bucket-overlap pairs,
    not |old ∪ new|². The hot-bucket guard applies to the OLD side
    (archive template buckets); the increment side is bounded by the
    crawl wave. Verify joins each side's own per-row shingle-hash-set
    table (no union, so overlapping id spaces are fine)."""
    old_bands, old_sets = minhash_archive_index(
        old_docs, text_col, id_col, k, n_hashes, bands, rows
    )
    return incremental_minhash_probe(
        new_docs, old_bands, old_sets, text_col, id_col,
        k, n_hashes, bands, rows, threshold, max_bucket_size,
    )


def allpairs_exact_pairs(
    docs: DataFrame,
    threshold_num: int = 4,
    threshold_den: int = 5,
    ngram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): ALL pairs of documents whose word
    ``ngram``-set Jaccard is >= threshold_num/threshold_den — EXACT
    set-similarity self-join via prefix filtering (AllPairs,
    Bayardo/Ma/Srikant WWW'07), the deterministic complement to the
    probabilistic MinHash/SimHash paths: no banding recall loss,
    guaranteed-complete output at the threshold. Set elements are
    DISTINCT space-joined word n-grams reduced to the engine-portable
    56-bit md5 slice — joins and intersections compare longs, never gram
    strings, and any hash collision is IDENTICAL in both engines, so the
    oracle gate stays exact (standard near-dup practice; n-grams rather
    than unigrams because template-heavy web text shares most of its
    word VOCABULARY while differing in word order).

    Prefix-filter principle: order every doc's distinct tokens by global
    rarity (ascending document frequency, token tie-break); if
    J(A, B) >= t then A and B MUST share a token inside each one's first
    ``n - ceil(t*n) + 1`` tokens, so only those prefix rows enter the
    candidate join — the overwhelming bulk of each doc (its common
    tokens) never joins anything. The threshold is a rational num/den
    and every bound is integer arithmetic (``ceil(n*t)`` =
    ``(n*num + den - 1) div den``; the verify gate is
    ``n_inter*den >= num*(n_a + n_b - n_inter)``), so both engines
    compare exact integers and the value hash is engine-exact.

    Scale shape: tokenization and dedup are row-local array expressions;
    document frequency is one token-keyed partial-agg groupBy; the
    rarity rank is a per-doc window (keyed shuffle, per-doc sort — rows
    per key bounded by doc length); the candidate join is keyed on
    prefix tokens, which are each doc's RAREST tokens, so buckets are
    naturally small (a hot bucket means thousands of docs agree on a
    globally-rare token); ``max_bucket_size`` bounds the pathological
    case, mirrored exactly in the oracle (completeness holds whenever no
    prefix bucket exceeds it; pass None for the strict-exact plan). The
    length filter ``min*den >= num*max`` prunes candidates before the
    distinct, and the verify is a per-row array_intersect over the
    per-doc token arrays (the jaccard_verify_sets shape: |pairs| rows,
    never |pairs| x tokens)."""
    from pyspark.sql import Window

    from pyspider_spark.operators.corpus import _word_ngrams

    num, den = int(threshold_num), int(threshold_den)
    if not 0 < num <= den:
        raise ValueError("threshold must satisfy 0 < num/den <= 1")
    words = docs.select(
        F.col(id_col).alias("doc"),
        F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit("[a-z0-9]+"), 0,
        ).alias("w"),
    )
    # no ``where(size(toks) > 0)`` guard (r06): predicate pushdown clones
    # the whole gram+hash pipeline into an interpreted filter predicate
    # below the projection (measured 0.9 s -> 29.5 s at sf1.0 for the
    # materialization), and the guard is semantically redundant — a doc
    # with an empty token set emits no exploded rows, so it can never
    # enter the prefix, the candidate join, or the verify output.
    toks = (
        words.select(
            "doc",
            F.array_distinct(
                F.transform(_word_ngrams("w", int(ngram)), lambda g: md5_hash56(g))
            ).alias("toks"),
        )
        .persist()
    )
    t = toks.select("doc", F.size("toks").alias("n"), F.explode("toks").alias("tok"))
    # a token with df = 1 exists in exactly one doc: it can never match in
    # the candidate join, so it needs no rank row — but it DOES occupy the
    # rarest prefix slots (df asc orders all df=1 tokens before any shared
    # token). Since every df=1 token of a doc sorts before every df>=2
    # token, rank(shared token) = (#df=1 tokens in doc) + rank among the
    # shared tokens — computed as n - n_shared + row_number, with the
    # per-doc shared count riding the SAME window partitioning. The window
    # sort input shrinks to the shared-token instances only, and the
    # df-table join carries the (usually much smaller) df>=2 vocabulary.
    # Output-identical: dropped df=1 prefix rows join to nothing (bucket
    # size 1 also never trips the guard).
    dft2 = (
        t.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
    )
    shared = t.join(dft2, "tok")
    w_doc = Window.partitionBy("doc")
    ranked = shared.withColumn(
        "rk",
        F.row_number().over(w_doc.orderBy(F.col("df").asc(), F.col("tok").asc())),
    ).withColumn("_n2", F.count(F.lit(1)).over(w_doc))
    plen = F.col("n") - F.expr(f"(n * {num} + {den - 1}) div {den}") + F.lit(1)
    prefix = ranked.where(
        F.col("n") - F.col("_n2") + F.col("rk") <= plen
    ).select("doc", "n", "tok")
    if max_bucket_size is not None:
        prefix = _guard_buckets(prefix, ["tok"], max_bucket_size)
    a = prefix.select(F.col("doc").alias("doc_a"), F.col("n").alias("n_a"), "tok")
    b = prefix.select(F.col("doc").alias("doc_b"), F.col("n").alias("n_b"), "tok")
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.least("n_a", "n_b") * den >= F.greatest("n_a", "n_b") * num)
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    # byte-small pair rows, O(|A|+|B|) compute each — spread like
    # jaccard_verify_sets does
    cand = cand.repartition(docs.sparkSession.sparkContext.defaultParallelism * 2)
    ta = toks.select(F.col("doc").alias("doc_a"), F.col("toks").alias("t_a"))
    tb = toks.select(F.col("doc").alias("doc_b"), F.col("toks").alias("t_b"))
    # same verify shape as jaccard_verify_sets (r06): broadcast the token
    # table when its probed size fits (keyed join at corpus scale), and
    # materialize the intersection size ONCE into thin persisted rows so
    # the integer gate can't clone array_intersect across the boundary
    if _fits_broadcast(toks, F.size("toks")):
        ta, tb = F.broadcast(ta), F.broadcast(tb)
    n_inter = F.size(F.array_intersect("t_a", "t_b"))
    thin = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select("doc_a", "doc_b", "n_a", "n_b", n_inter.alias("n_inter"))
        .persist()
    )
    return (
        thin.where(
            F.col("n_inter") * den
            >= num * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """(doc_id, component, quality_micro, is_kept): quality-aware
    keep-one-per-cluster retention — where :func:`dedup_assign` keeps
    the MIN-id member, real pipelines keep the BEST member (highest
    quality score, id tie-break), so a boilerplate-heavy copy never
    shadows the clean original. Winner = argmax of
    (quality_micro, -id): the shared :func:`quality_score` double
    quantized to integer micro-units, engine-exact.

    Scale shape: the corpus is NEVER shuffled. Components and per-
    component winners both derive from the (tiny) paired-doc set —
    winners via one partial-aggregable groupBy max-of-struct (no window
    sort) — and broadcast back onto the corpus scan as two
    broadcast-hash left joins; singleton docs (no pair) short-circuit
    to kept without touching either table."""
    from pyspider_spark.functions.text import quality_score

    comp = connected_components(pairs, a_col, b_col).withColumnRenamed("doc", id_col)
    scored = docs.select(
        F.col(id_col),
        F.floor(quality_score(F.col(text_col)) * F.lit(1e6))
        .cast("long")
        .alias("quality_micro"),
    )
    members = scored.join(F.broadcast(comp), id_col, "inner")
    winners = (
        members.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col("quality_micro").alias("q"),
                    (-F.col(id_col)).alias("neg_id"),
                )
            ).alias("w")
        )
        .select("component", (-F.col("w.neg_id")).cast("long").alias("keep_id"))
    )
    return (
        scored.join(F.broadcast(comp), id_col, "left")
        .join(F.broadcast(winners), "component", "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
            F.col("quality_micro"),
            (F.col("component").isNull() | (F.col(id_col) == F.col("keep_id"))).alias(
                "is_kept"
            ),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, fps: array<long>): each document's DISTINCT winnowing
    fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
    algorithm): hash every character ``k``-gram of the ws-normalized
    lowercased text, then from every window of ``w`` consecutive gram
    hashes select the minimum. Guarantee: two documents sharing ANY
    substring of length >= w + k - 1 share at least one fingerprint —
    position-robust PARTIAL-overlap detection (a copied paragraph inside
    an otherwise different page), which whole-document Jaccard/MinHash
    dilutes away. Selecting by VALUE-min and emitting the distinct value
    set makes tie-breaking irrelevant, so both engines agree exactly.

    Scale shape: one Arrow-batched pandas_udf, linear in document length
    (sliding-window minima via a numpy stride view), embarrassingly
    parallel, zero shuffle. NOT nested JVM higher-order lambdas: Catalyst
    collapses dependent projections into the lambda bodies (text
    normalization re-evaluated per gram, the gram-hash array re-evaluated
    per window) and pushes explode's ``size(fps) > 0`` filter below the
    Generate as one interpreted mega-predicate — measured superlinear
    blowup (a 500-doc input ran > 15 min; this kernel runs it in
    milliseconds). The UDF projection is an optimizer barrier
    (ArrowEvalPython), so downstream filters can never inline it."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")

    import hashlib
    import re as _re

    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    kk, ww = int(k), int(w)

    @F.pandas_udf(ArrayType(LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            t = _re.sub(r"\s+", " ", ("" if text is None else str(text)).lower())
            n = max(len(t) - kk + 1, 1)
            hs = np.fromiter(
                (
                    int(hashlib.md5(t[p:p + kk].encode()).hexdigest()[:14], 16)
                    for p in range(n)
                ),
                dtype=np.int64,
                count=n,
            )
            if len(hs) >= ww:
                mins = np.lib.stride_tricks.sliding_window_view(hs, ww).min(axis=1)
            else:
                mins = hs.min(keepdims=True)
            out.append(np.unique(mins))
        return pd.Series(out)

    return docs.select(
        F.col(id_col).alias("doc"), _winnow(F.col(text_col)).alias("fps")
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
    max_bucket_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_a, doc_b, n_shared): document pairs sharing at least
    ``min_shared`` distinct winnowing fingerprints — the MOSS-style
    partial-overlap report (copied passages), complementary to the
    whole-document similarity families: a 300-char lift inside two long
    otherwise-unrelated pages scores ~0 Jaccard but >= 1 guaranteed
    shared fingerprint per w+k-1 window of the lift.

    Scale shape: the classic inverted-index self-join — thin distinct
    (doc, fp) longs explode from the row-local fingerprint arrays, hot
    fingerprints (site boilerplate) are bounded by ``max_bucket_size``
    BEFORE the join (identically in the oracle), and the pair count is
    one partial-aggregable groupBy; never all-pairs."""
    fps = winnow_fingerprints(docs, k, w, id_col, text_col)
    posts = fps.select("doc", F.explode("fps").alias("fp"))
    posts = _guard_buckets(posts, ["fp"], max_bucket_size)
    a = posts.select(F.col("doc").alias("doc_a"), "fp")
    b = posts.select(F.col("doc").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
    )


def leakage_safe_split(
    docs: DataFrame,
    fractions: tuple[float, float, float] = (0.9, 0.05, 0.05),
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """(doc_id, component, bucket, split): deterministic train/val/test
    assignment with NEAR-DUP LEAKAGE CONTROL — the split is hashed from
    the document's near-dup COMPONENT, not the document, so two near-
    duplicate documents (and, transitively, a whole mirror-farm cluster)
    can never straddle splits. A doc-hashed split silently leaks ~dup_rate
    of validation into training; eval contamination is exactly what
    benchmark-decontamination pipelines exist to prevent, and the same
    discipline applies to a model's own held-out split.

    Mechanics: minhash near-dup pairs -> connected components (large/
    small-star, O(log n) rounds) -> component label (own id for
    singletons) -> bucket = md5-56(salt | component) mod 1000 ->
    thresholds from ``fractions``. Everything after the components is one
    projection; the components table holds only docs that appear in some
    near-dup pair, so the join broadcasts. Hash-assignment makes the
    split reproducible shard-by-shard (no global sample/sort) and the
    proportions exact in expectation — at corpus scale the binomial
    deviation is negligible; what matters is that membership is a pure
    function of content clusters, stable across reruns and appends."""
    f_train, f_val, f_test = (float(f) for f in fractions)
    if abs(f_train + f_val + f_test - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    t_train = int(round(f_train * 1000))
    t_val = t_train + int(round(f_val * 1000))

    pairs = minhash_dedup(
        docs, text_col=text_col, id_col=id_col, k=k, n_hashes=n_hashes,
        bands=bands, rows=rows, threshold=threshold,
        max_bucket_size=max_bucket_size,
    )
    comp = connected_components(pairs).withColumnRenamed("doc", id_col)
    bucket = (
        md5_hash56(
            F.concat(F.lit(salt + "|"), F.col("component").cast("string"))
        ) % F.lit(1000)
    ).alias("bucket")
    return (
        docs.select(id_col)
        .join(F.broadcast(comp), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("component"), F.col(id_col)).alias("component"),
        )
        .select(
            id_col,
            "component",
            bucket,
            F.when(F.col("bucket") < t_train, F.lit("train"))
            .when(F.col("bucket") < t_val, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


def winnow_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_fps, n_hit, frac): per BENCHMARK document, how many of
    its winnowing fingerprints appear anywhere in the training corpus —
    doc-level eval-contamination scoring. Complementary to the n-gram
    membership check (`corpus.ngram_contamination`): winnowing keeps the
    w+k-1 substring guarantee under position shifts, so a benchmark
    passage pasted mid-page still registers, and the per-doc fraction
    grades contamination severity instead of flagging single grams.

    Scale shape: the corpus side collapses to its DISTINCT fingerprint
    set (one explode + distinct — fingerprints are ~0.4x corpus grams as
    thin longs, the classic inverted-index vocabulary); each benchmark
    fingerprint then probes that set with one left join on a long key and
    the verdicts partial-aggregate per doc. No doc-x-doc pair table
    exists anywhere — unlike an overlap-pairs report, volume is bounded
    by |bench fingerprints|, so a hot boilerplate fingerprint costs one
    probe row, not a quadratic bucket. The benchmark side is tiny by
    definition; at 100 TB the corpus fp set is the only big table and it
    partitions uniformly on the hash value."""
    corpus_fps = (
        winnow_fingerprints(corpus, k, w, id_col, text_col)
        .select(F.explode("fps").alias("fp"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    bench_posts = winnow_fingerprints(bench, k, w, id_col, text_col).select(
        F.col("doc").alias(id_col), F.explode("fps").alias("fp")
    )
    return (
        bench_posts.join(corpus_fps, "fp", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fps"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            id_col,
            "n_fps",
            "n_hit",
            # 4-decimal reporting precision (engine-portable, like jaccard)
            F.round(F.col("n_hit") / F.col("n_fps"), 4).alias("frac"),
        )
    )


def ensemble_near_dup(
    docs: DataFrame,
    min_votes: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    minhash_threshold: float = 0.6,
    simhash_max_hamming: int = 6,
    winnow_min_shared: int = 16,
) -> DataFrame:
    """(doc_a, doc_b, by_minhash, by_simhash, by_winnow, votes): consensus
    near-dup pairs confirmed by at least ``min_votes`` of the three text
    similarity families — MinHash/LSH (set-Jaccard: robust to
    reordering), SimHash (weighted-token Hamming: robust to small global
    perturbations), and winnowing fingerprints (contiguous-substring
    overlap: robust to surrounding rewrites). The families fail
    differently, so requiring agreement suppresses each one's
    characteristic false positives while keeping true near-dups that any
    two detect — the ensemble discipline production dedup pipelines
    apply before destructive removal.

    Scale shape: each family keeps its own bucketed/guarded candidate
    plan (never all-pairs); the vote is ONE groupBy over the union of
    their thin (doc_a, doc_b) pair tables — pair tables are orders of
    magnitude smaller than the corpus, and the flag aggregation
    partial-aggregates map-side."""
    mh = minhash_dedup(
        docs, text_col=text_col, id_col=id_col,
        k=5, n_hashes=32, bands=8, rows=4, threshold=minhash_threshold,
    )
    sh = simhash_near_pairs(
        simhash(docs, text_col, id_col), max_hamming=simhash_max_hamming
    )
    wn = winnow_overlap_pairs(
        docs, k=8, w=4, min_shared=winnow_min_shared,
        id_col=id_col, text_col=text_col,
    )

    def _fam(df: DataFrame, name: str) -> DataFrame:
        return df.select("doc_a", "doc_b", F.lit(name).alias("fam"))

    u = (
        _fam(mh, "minhash")
        .unionByName(_fam(sh, "simhash"))
        .unionByName(_fam(wn, "winnow"))
    )
    flags = [
        F.max(F.col("fam") == name).alias(f"by_{name}")
        for name in ("minhash", "simhash", "winnow")
    ]
    return (
        u.groupBy("doc_a", "doc_b")
        .agg(*flags)
        .select(
            "doc_a", "doc_b", "by_minhash", "by_simhash", "by_winnow",
            (
                F.col("by_minhash").cast("long")
                + F.col("by_simhash").cast("long")
                + F.col("by_winnow").cast("long")
            ).alias("votes"),
        )
        .where(F.col("votes") >= int(min_votes))
    )


def interleaved_near_dup(
    docs: DataFrame,
    media_hashes: DataFrame,
    min_votes: int = 1,
    id_col: str = "doc_id",
    minhash_threshold: float = 0.7,
    media_max_hamming: int = 3,
    media_min_overlap: float = 0.5,
    max_bucket_size: int = 1000,
    max_block_size: int = 100_000,
) -> DataFrame:
    """(doc_a, doc_b, text_jaccard, media_overlap, by_text, by_media,
    votes): DOCUMENT-level near-dup over INTERLEAVED text+media documents
    (the input_hint shape: spans array<struct<kind,text,media_ref,offset>>)
    — the dedup verb a multimodal corpus actually needs, where a mirror
    re-hosts both the prose and the images, a template farm reuses text
    around different images, and a stock-photo page reuses images around
    different text. Text-only dedup merges the farm; media-only dedup
    merges the stock pages; the two modalities VOTE separately and the
    caller picks the consensus bar (``min_votes=2`` before destructive
    removal, 1 for review queues).

    Text evidence: the doc's text spans in offset order form its text
    (``concat_ws`` after an offset ``array_sort`` — span ORDER is the
    semantic content of an interleaved doc), then the standard
    shingle→minhash→LSH→exact-Jaccard pipeline pairs docs at
    ``minhash_threshold``.

    Media evidence: the doc's media_ref set, where two refs match when
    their perceptual hashes (``media_hashes``: (media_ref, phash) from
    functions.multimodal.phash64 — in deployment, pHash over decoded
    pixels) are within ``media_max_hamming``, including identity (the
    same ref in both docs). Pair evidence = max directional containment
    (matched refs / own refs, both directions) >= ``media_min_overlap``.

    Scale shape: both evidence paths are bucketed candidate joins (LSH
    bands / pigeonhole blocks), never all-pairs; the media doc-pair join
    goes through THIN (doc, ref) and (ref, ref) tables; the final merge
    is one full-outer join of two pair tables, each orders of magnitude
    smaller than the corpus."""
    # persist: the media-vote machinery reads this table from several plan
    # branches (simhash blocking counts + both join sides, plus the
    # identity closure) — when the caller derives it from an expensive
    # Python pipeline (phash64 over synthesized payloads) every branch
    # would re-run that pipeline (the executed plan carried 54
    # MapInPandas nodes before; guide §5)
    media_hashes = media_hashes.persist()
    texts = docs.select(
        F.col(id_col),
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(filter(spans, s -> s.kind = 'text'), "
                "(a, b) -> case when a.offset < b.offset then -1 "
                "when a.offset > b.offset then 1 else 0 end), s -> s.text)"
            ),
        ).alias("text"),
    )
    mh = minhash_dedup(
        texts, text_col="text", id_col=id_col,
        threshold=minhash_threshold, max_bucket_size=max_bucket_size,
    ).select("doc_a", "doc_b", F.round("jaccard", 4).alias("text_jaccard"))

    # persisted: consumed from three branches (both containment join
    # sides + the per-doc ref counts) — each would re-run the span
    # explode over the caller's corpus build otherwise
    doc_media = (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.filter("spans", lambda s: s.kind == F.lit("media"))).alias("s"),
        )
        .select("doc", F.col("s").media_ref.alias("media_ref"))
        .where(F.col("media_ref").isNotNull())
        .distinct()
        .persist()
    )
    sig = media_hashes.select(
        F.col("media_ref").alias("doc"), F.col("phash").alias("simhash")
    )
    # persisted: the symmetric closure reads rp twice (forward + swapped),
    # which would run the pigeonhole block join twice
    rp = simhash_near_pairs(
        sig, max_hamming=media_max_hamming, bits=64, max_block_size=max_block_size
    ).select(F.col("doc_a").alias("rx"), F.col("doc_b").alias("ry")).persist()
    # symmetric closure + identity: matching is a relation over refs, and a
    # ref shared verbatim by two docs is the strongest possible media match
    refpairs = (
        rp.union(rp.select(F.col("ry"), F.col("rx")))
        .union(
            media_hashes.select(
                F.col("media_ref").alias("rx"), F.col("media_ref").alias("ry")
            )
        )
        .distinct()
    )
    a = doc_media.select(F.col("doc").alias("doc_a"), F.col("media_ref").alias("rx"))
    b = doc_media.select(F.col("doc").alias("doc_b"), F.col("media_ref").alias("ry"))
    matches = (
        a.join(refpairs, "rx")
        .join(b, "ry")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.countDistinct("rx").alias("m_a"),
            F.countDistinct("ry").alias("m_b"),
        )
    )
    counts = doc_media.groupBy("doc").agg(F.count(F.lit(1)).alias("n_m"))
    md = (
        matches.join(counts.select(F.col("doc").alias("doc_a"),
                                   F.col("n_m").alias("n_a")), "doc_a")
        .join(counts.select(F.col("doc").alias("doc_b"),
                            F.col("n_m").alias("n_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.greatest(
                    F.col("m_a") / F.col("n_a"), F.col("m_b") / F.col("n_b")
                ), 4,
            ).alias("media_overlap"),
        )
        .where(F.col("media_overlap") >= media_min_overlap)
    )

    out = mh.join(md, ["doc_a", "doc_b"], "full_outer")
    return out.select(
        "doc_a", "doc_b", "text_jaccard", "media_overlap",
        F.col("text_jaccard").isNotNull().alias("by_text"),
        F.col("media_overlap").isNotNull().alias("by_media"),
        (
            F.col("text_jaccard").isNotNull().cast("long")
            + F.col("media_overlap").isNotNull().cast("long")
        ).alias("votes"),
    ).where(F.col("votes") >= int(min_votes))
