"""Deduplication operators for training-data pipelines (SURVEY.md §2
extras): exact, MinHash+LSH, SimHash, n-gram Jaccard.

All JVM-side: shingling is explode + substring, MinHash is one explode +
one groupBy with n partial-agg mins (no UDF), SimHash is per-bit signed
sums, LSH banding is an explode + self-join on (band, band_hash). The only
shuffles are the per-doc groupBys and the bucket self-join — at 100 TB the
bucket join is the classic LSH candidate-pair plan: band hash distributes
uniformly, and a hot bucket (boilerplate text) is bounded by
``max_bucket_size`` before the join (standard guard, else one giant
bucket quadratically explodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Distinct character k-shingles per doc (lowercased, ws-normalized)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return (
        df.select(F.col(id_col).alias("doc"), norm.alias("t"), n.alias("n"))
        .select("doc", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("pos"), "t")
        .select("doc", F.expr(f"substring(t, pos, {int(k)})").alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingled: DataFrame, n_hashes: int = 32
) -> DataFrame:
    """MinHash: sig[i] = min over shingles of xxhash64(i || shingle).
    ONE explode already done upstream; here a single groupBy computes all
    n partial-agg mins map-side (no UDF, no extra shuffle per hash)."""
    mins = [
        F.min(F.xxhash64(F.concat(F.lit(f"mh{i}:"), F.col("shingle")))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return shingled.groupBy("doc").agg(*mins)


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 8, rows: int = 4, max_bucket_size: int = 1000
) -> DataFrame:
    """Band the signature, bucket-join docs sharing any band hash.
    Emits distinct (doc_a, doc_b) with doc_a < doc_b."""
    n_hashes = bands * rows
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * rows + r}") for r in range(rows)]).alias("bh"),
        )
        for b in range(bands)
    ]
    banded = sigs.select("doc", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc", F.col("bb").band.alias("band"), F.col("bb").bh.alias("bh")
    )
    # hot-bucket guard: drop degenerate buckets before the self-join
    sized = banded.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy("band", "bh"))
    ).where(F.col("bucket_n") <= max_bucket_size)
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
    """Exact Jaccard on candidate pairs: |A∩B| via shingle join, |A∪B| =
    |A|+|B|-|A∩B|. Candidate set is LSH-pruned so this join is tiny
    relative to all-pairs."""
    sizes = shingled.groupBy("doc").agg(F.count("*").alias("n_sh"))
    sa = shingled.select(F.col("doc").alias("doc_a"), "shingle")
    sb = shingled.select(F.col("doc").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a").join(sb, ["doc_b", "shingle"]).groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    k: int = 5, n_hashes: int = 32, bands: int = 8, rows: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bucket join →
    exact-Jaccard verify. Returns (doc_a, doc_b, jaccard)."""
    sh = shingles(df, text_col, id_col, k).persist()
    pairs = lsh_candidate_pairs(minhash_signatures(sh, n_hashes), bands, rows)
    return jaccard_verify(pairs, sh, threshold)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64) -> DataFrame:
    """SimHash: token hashes vote per bit; sign of the sum sets the bit.
    One explode + one groupBy with `bits` conditional sums (JVM)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("doc").agg(*votes)
    sig = sum(
        (
            F.when(
                F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
            ).otherwise(F.lit(0).cast("long"))
            for i in range(bits)
        ),
        F.lit(0).cast("long"),
    )
    return agg.select("doc", sig.alias("simhash"))


def simhash_near_pairs(sig: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance: block on 4 16-bit chunks (any
    pair within distance 3 shares at least one exact chunk — pigeonhole),
    verify with bit_count inside blocks."""
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias(f"c{c}")
        for c in range(4)
    ]
    blocked = sig.select("doc", "simhash", *chunks)
    out = None
    for c in range(4):
        a = blocked.select(F.col(f"c{c}").alias("blk"), F.col("doc").alias("doc_a"),
                           F.col("simhash").alias("sig_a"))
        b = blocked.select(F.col(f"c{c}").alias("blk"), F.col("doc").alias("doc_b"),
                           F.col("simhash").alias("sig_b"))
        pairs = a.join(b, "blk").where(F.col("doc_a") < F.col("doc_b"))
        out = pairs if out is None else out.unionByName(pairs)
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        out.withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .distinct()
    )
