"""End-to-end corpus-cleaning pipeline for training data: language gate →
quality gate → exact dedup (keep min-id per fingerprint) → near-dup
clustering (keep one canonical per minhash component).

This is the composition a 100-TB pretraining pipeline actually runs — each
stage is an already-scale-shaped operator (no new shuffle patterns): the
lang/quality gates are row-local expressions that push down to the scan,
exact dedup is one hash groupBy + a co-shuffled join on the fingerprint,
and the near-dup step reuses minhash_dedup + connected_components (banded
LSH with hot-bucket guards, O(log n) star rounds). Filtering EARLY matters
at scale: the minhash stage — by far the most expensive — only ever sees
documents that survived the cheap gates.

Mirrored 1:1 in DuckDB by oracles.corpus_clean_sql (same lang CASE, same
quality expression, same md5 fingerprint, same minhash parameters, same
reachability closure), so the whole pipeline is value-hash gated, not just
its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspider_spark.functions.text import fingerprint, lang_guess, quality_score
from pyspider_spark.operators.dedup import dedup_assign, minhash_dedup


def corpus_clean(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.6,
) -> DataFrame:
    """(doc_id, component, kept) for every document that survives the
    lang + quality gates and exact dedup; ``kept`` marks the one canonical
    member of each near-dup cluster (singletons keep themselves)."""
    text = F.col(text_col)
    base = docs.select(
        F.col(id_col), text,
        lang_guess(text).alias("glang"),
        quality_score(text).alias("q"),
    ).where(F.col("glang").isin(*langs) & (F.col("q") >= F.lit(min_quality)))
    fpx = base.withColumn("fp", fingerprint(text))
    mfp = fpx.groupBy("fp").agg(F.min(id_col).alias("canonical_id"))
    exact_kept = (
        fpx.join(mfp, "fp")
        .where(F.col(id_col) == F.col("canonical_id"))
        .select(id_col, text_col)
    )
    pairs = minhash_dedup(
        exact_kept, text_col=text_col, id_col=id_col,
        k=k, n_hashes=n_hashes, bands=bands, rows=rows, threshold=threshold,
    )
    return dedup_assign(exact_kept, pairs, id_col=id_col).select(
        id_col, "component", F.col("is_canonical").alias("kept")
    )
