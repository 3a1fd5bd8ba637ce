"""Link-graph analytics over the document corpus: PageRank.

A crawl engine produces a link graph as a side effect (every follow edge);
rank over that graph is the classic crawl-prioritization / corpus-quality
signal (quality-weighted sampling of training data, frontier ordering by
authority). The reference schedules purely by priority/time and has no
graph analytics — this is a Spark-first extension, same spirit as the
dedup/ANN family.

Scale shape: one power iteration = one join (ranks onto edge sources,
pre-divided by out-degree) + one groupBy(dst) sum — both shuffled on the
node key, no collect of node-sized data (the only driver scalars are the
node count, once, and nothing per iteration: dangling mass rides along as
a crossJoin of a 1-row aggregate, which Spark broadcasts). Lineage is cut
per iteration with an eager localCheckpoint, so 10 iterations plan as 10
shallow jobs instead of one exponentially-nested DAG.

The fixed-iteration form (not convergence-tested) is deliberate: it makes
the computation bit-deterministic and 1:1 mirrorable as UNROLLED DuckDB
CTEs (oracles.pagerank_sql), so the driver gate value-hashes the whole
computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspider_spark.functions.portable_hash import md5_hash56


def synth_doc_links(
    docs: DataFrame, links_per_doc: int = 8, id_col: str = "doc_id",
    total: int | None = None,
) -> DataFrame:
    """Deterministic synthetic link graph over the documents table:
    doc i links to md5_hash56(i & '-' & k) mod total for k < links_per_doc
    (self-links dropped). Engine-portable (same md5-slice hash in the
    DuckDB mirror) — the documents table has no native link column, so
    both engines derive the SAME graph from the same rows."""
    if total is None:
        total = docs.count()
    k = F.explode(F.sequence(F.lit(0), F.lit(links_per_doc - 1))).alias("k")
    e = docs.select(F.col(id_col).alias("src"), k)
    dst = F.pmod(
        md5_hash56(F.concat_ws("-", F.col("src").cast("string"), F.col("k").cast("string"))),
        F.lit(total),
    ).cast("long")
    return e.select("src", dst.alias("dst")).where(F.col("src") != F.col("dst"))


def pagerank(
    edges: DataFrame, n_iter: int = 10, damping: float = 0.85,
    src_col: str = "src", dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``n_iter`` power iterations with uniform
    teleport and dangling-mass redistribution (the standard formulation:
    rank = (1-d)/N + d * (in-contributions + dangling_mass/N))."""
    src, dst = F.col(src_col), F.col(dst_col)
    edges = edges.select(src.alias("src"), dst.alias("dst")).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # pre-join degree once: each iteration then joins ranks on src only
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
            .withColumnRenamed("dst", "node")
        )
        dangling = (
            ranks.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def doc_pagerank(
    docs: DataFrame, links_per_doc: int = 8, n_iter: int = 10,
    damping: float = 0.85, id_col: str = "doc_id", total: int | None = None,
) -> DataFrame:
    """PageRank over the synthetic doc link graph, with rank scaled by the
    node count (O(1) values survive fixed-decimal rounding with headroom)
    and rounded for engine-portable value hashing."""
    edges = synth_doc_links(docs, links_per_doc, id_col, total)
    pr = pagerank(edges, n_iter, damping)
    total_nodes = pr.count()
    return pr.select(
        F.col("node").alias(id_col),
        F.round(F.col("rank") * F.lit(float(total_nodes)), 6).alias("rank_x_n"),
    )
