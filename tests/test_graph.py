"""PageRank over the synthetic doc link graph: hand-checkable structure,
mass conservation, an independent numpy power-iteration oracle, and
engine-portability of the link derivation."""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import functions as F

from pyspider_spark.operators.graph import doc_pagerank, pagerank, synth_doc_links


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_pagerank_cycle_is_uniform(spark):
    # a 4-cycle is perfectly symmetric: every node ends at rank 1/4
    pr = pagerank(_edges(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])).collect()
    for r in pr:
        assert abs(r["rank"] - 0.25) < 1e-12


def test_pagerank_mass_conserved_with_dangling(spark):
    # node 3 is dangling (no out-edges): its mass must be redistributed,
    # not lost — total rank stays 1.0
    pr = pagerank(_edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)]))
    total = pr.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9
    ranks = {r["node"]: r["rank"] for r in pr.collect()}
    # the sink collects from both 1 and 2: highest rank
    assert ranks[3] == max(ranks.values())


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for s, t in edges:
        out.setdefault(s, set()).add(t)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = sum(r[idx[u]] for u in nodes if u not in out)
        nxt += d * dangling / n
        for s, ts in out.items():
            share = r[idx[s]] / len(ts)
            for t in ts:
                nxt[idx[t]] += d * share
        r = nxt
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_matches_numpy_on_random_graphs(spark):
    rng = random.Random(5)
    for _ in range(2):
        n = rng.randint(5, 30)
        edges = {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 3 * n))
        }
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = _numpy_pagerank(edges)
        got = {r["node"]: r["rank"] for r in pagerank(_edges(spark, edges)).collect()}
        assert set(got) == set(want)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-9, k


def test_synth_doc_links_portable(spark):
    import duckdb

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["src"], r["dst"])
        for r in synth_doc_links(docs, links_per_doc=4).collect()
    }
    con = duckdb.connect()
    con.sql("SET threads=2")
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    from pyspider_spark.functions.portable_hash import md5_hash56_sql

    h = md5_hash56_sql("(CAST(src AS VARCHAR) || '-' || CAST(k AS VARCHAR))")
    want = {
        tuple(r)
        for r in con.sql(
            f"""
            SELECT DISTINCT src, ({h} % (SELECT COUNT(*) FROM documents)) AS dst
            FROM (SELECT src, unnest(range(0, 4)) AS k
                  FROM (SELECT doc_id AS src FROM documents))
            WHERE src != ({h} % (SELECT COUNT(*) FROM documents))
            """
        ).fetchall()
    }
    assert got == want


def test_doc_pagerank_output_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = doc_pagerank(docs, links_per_doc=4, n_iter=3)
    rows = out.collect()
    assert out.columns == ["doc_id", "rank_x_n"]
    total = sum(r["rank_x_n"] for r in rows)
    assert abs(total - len(rows)) < 1e-3  # scaled mass = node count
