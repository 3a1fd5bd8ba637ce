"""DuckDB oracle-SQL generators for the hash-keyed pipelines.

Each generator mirrors the corresponding Spark operator 1:1 — same
md5-slice hashing (functions/portable_hash.py), same banding/blocking
arithmetic, same hot-bucket guards — derived from the SAME parameters, so
the driver's side-by-side gate validates the whole pipeline, not a
hand-transcribed approximation. Keep parameter defaults in sync with the
__spark_entry__ driver queries.
"""

from __future__ import annotations

from pyspider_spark.functions.portable_hash import HASH_BITS, md5_hash56_sql
from pyspider_spark.operators.dedup import simhash_chunk_plan


def minhash_pairs_sql(
    k: int, n_hashes: int, bands: int, rows: int, threshold: float,
    max_bucket_size: int = 1000,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.dedup.minhash_dedup: shingle → minhash → banded
    LSH bucket join (guarded) → exact-Jaccard verify."""
    mins = ",\n                   ".join(
        f"MIN({md5_hash56_sql('shingle', salt=f'mh{i}:')}) AS h{i}"
        for i in range(n_hashes)
    )
    band_selects = "\n            UNION ALL ".join(
        "SELECT doc, {b} AS band, {bh} AS bh FROM sig".format(
            b=b,
            bh=md5_hash56_sql(
                " || '|' || ".join(
                    f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
                )
            ),
        )
        for b in range(bands)
    )
    return f"""
        WITH docs AS (
            SELECT {id_col} AS doc,
                   regexp_replace(lower({text_col}), '\\s+', ' ', 'g') AS t
            FROM {table}
        ),
        sh AS (
            SELECT DISTINCT doc, substr(t, CAST(pos AS INTEGER), {k}) AS shingle
            FROM (SELECT doc, t,
                         unnest(range(1, greatest(length(t) - {k - 1}, 1) + 1)) AS pos
                  FROM docs)
        ),
        sig AS (
            SELECT doc, {mins}
            FROM sh GROUP BY doc
        ),
        banded AS (
            {band_selects}
        ),
        sized AS (SELECT band, bh, COUNT(*) AS n FROM banded GROUP BY 1, 2),
        ok AS (
            SELECT b.doc, b.band, b.bh FROM banded b
            JOIN sized s ON b.band = s.band AND b.bh = s.bh
            WHERE s.n <= {max_bucket_size}
        ),
        pairs AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM ok a JOIN ok b ON a.band = b.band AND a.bh = b.bh
            WHERE a.doc < b.doc
        ),
        sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
        inter AS (
            SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
            FROM pairs p
            JOIN sh sa ON sa.doc = p.doc_a
            JOIN sh sb ON sb.doc = p.doc_b AND sb.shingle = sa.shingle
            GROUP BY 1, 2
        ),
        j AS (
            SELECT i.doc_a, i.doc_b,
                   CAST(i.n_inter AS DOUBLE) / (za.n_sh + zb.n_sh - i.n_inter) AS jaccard
            FROM inter i
            JOIN sizes za ON za.doc = i.doc_a
            JOIN sizes zb ON zb.doc = i.doc_b
        )
        SELECT doc_a, doc_b, ROUND(jaccard, 4) AS jaccard
        FROM j WHERE jaccard >= {threshold}
    """


def simhash_pairs_sql(
    max_hamming: int, bits: int = HASH_BITS, max_block_size: int = 1000,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.dedup.simhash + simhash_near_pairs: per-bit token
    votes → signature → pigeonhole chunk blocking (guarded) → bit_count
    verify."""
    n_chunks, chunk_bits = simhash_chunk_plan(max_hamming, bits)
    mask = (1 << chunk_bits) - 1
    votes = ",\n                   ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(bits)
    )
    return f"""
        WITH toks AS (
            SELECT {id_col} AS doc,
                   unnest(string_split_regex(lower({text_col}), '\\s+')) AS tok
            FROM {table}
        ),
        h AS (
            SELECT doc, {md5_hash56_sql('tok')} AS h
            FROM toks WHERE tok <> ''
        ),
        votes AS (
            SELECT doc, {votes}
            FROM h GROUP BY doc
        ),
        sig AS (SELECT doc, {sig} AS simhash FROM votes),
        blocked AS (
            SELECT doc, simhash, ck,
                   (simhash >> ({chunk_bits} * ck)) & {mask} AS blk
            FROM sig CROSS JOIN (SELECT unnest(range({n_chunks})) AS ck)
        ),
        sized AS (SELECT ck, blk, COUNT(*) AS n FROM blocked GROUP BY 1, 2),
        ok AS (
            SELECT b.doc, b.simhash, b.ck, b.blk FROM blocked b
            JOIN sized s ON b.ck = s.ck AND b.blk = s.blk
            WHERE s.n <= {max_block_size}
        )
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM ok a JOIN ok b ON a.ck = b.ck AND a.blk = b.blk
        WHERE a.doc < b.doc
          AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """
