"""Similarity search over embedding columns (SURVEY.md §2 extras):
brute-force cosine top-k baseline + LSH-bucketed ANN scale path.

Dot products run JVM-side via F.zip_with + F.aggregate (no Python). The
ANN path uses deterministic random-hyperplane signatures: plane vectors are
seeded numpy, shipped as array literals (dims × n_planes doubles — tiny),
so the signature is again a pure expression. Brute force stays the
correctness oracle; the LSH path is the 100 TB plan (bucket join instead
of full cross product).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine: one scan + TakeOrderedAndProject (no
    global sort materialization). The baseline/oracle path."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        embeddings.select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def _planes(dims: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dims)


def rh_signature(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane bit signature as a long (n_planes <= 63)."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bits.append(bit)
    return sum(bits[1:], bits[0])


def ann_topk_lsh(
    embeddings: DataFrame, query: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 12, n_tables: int = 4, seed: int = 42, max_hamming: int = 2,
) -> DataFrame:
    """ANN top-k: probe only vectors whose signature is within
    ``max_hamming`` of the query's in ANY of ``n_tables`` hash tables.
    At scale the signature is a stored/bucketed column and this becomes a
    partition-pruned scan; recall is tested vs the brute-force oracle."""
    qv = np.array(query, dtype=float)
    out = None
    vec = F.col(vec_col).cast("array<double>")
    for t in range(n_tables):
        planes = _planes(len(query), n_planes, seed + 1000 * t)
        qsig = int(sum((1 << i) for i, p in enumerate(planes) if float(np.dot(qv, p)) >= 0))
        sig = rh_signature(vec, planes)
        cand = embeddings.where(
            F.bit_count(sig.bitwiseXOR(F.lit(qsig).cast("long"))) <= max_hamming
        )
        out = cand if out is None else out.unionByName(cand)
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        out.dropDuplicates([id_col])
        .select(F.col(id_col), cosine(vec, q).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 14, seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup: bucket by full hyperplane signature, join
    within buckets, verify cosine >= threshold. Near-identical vectors
    collide with high probability; the bucket join replaces the O(n²)
    cross product."""
    planes = _planes(
        embeddings.select(F.size(vec_col)).head()[0], n_planes, seed
    )
    vec = F.col(vec_col).cast("array<double>")
    sig = embeddings.select(
        F.col(id_col).alias("doc"), vec.alias("v"), rh_signature(vec, planes).alias("sig")
    )
    a = sig.select(F.col("sig"), F.col("doc").alias("doc_a"), F.col("v").alias("va"))
    b = sig.select(F.col("sig"), F.col("doc").alias("doc_b"), F.col("v").alias("vb"))
    return (
        a.join(b, "sig")
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "cos_sim",
            dot(F.col("va"), F.col("vb")) / (norm(F.col("va")) * norm(F.col("vb"))),
        )
        .where(F.col("cos_sim") >= threshold)
        .select("doc_a", "doc_b", "cos_sim")
        .distinct()
    )
