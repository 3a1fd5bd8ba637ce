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


def _vec_sql(vec) -> str:
    """DOUBLE[] literal with full round-trip precision (repr matches the
    exact double Spark embeds via F.lit)."""
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def rh_signature_sql(vec_expr: str, planes) -> str:
    """Mirror of functions.similarity.rh_signature (same plane literals)."""
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec_expr}, {_vec_sql(p)}) >= 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def minhash_pairs_sql(
    k: int, n_hashes: int, bands: int, rows: int, threshold: float,
    max_bucket_size: int = 1000,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    est_margin: float | None = None,
) -> str:
    """Mirror of operators.dedup.minhash_dedup: shingle → minhash → banded
    LSH bucket join (guarded) → optional estimate prefilter → exact-
    Jaccard verify. Uses the SAME universal-hash coefficients as
    minhash_signatures; ``est_margin`` mirrors the Spark prefilter's
    integer min-matches cut exactly (same signatures → same verdicts)."""
    ctes = _minhash_ctes(
        k, n_hashes, bands, rows, max_bucket_size, table, id_col, text_col,
        est_margin, threshold,
    )
    return f"""
        WITH {ctes}
        SELECT doc_a, doc_b, ROUND(jaccard, 4) AS jaccard
        FROM j WHERE jaccard >= {threshold}
    """


def minhash_components_sql(
    k: int, n_hashes: int, bands: int, rows: int, threshold: float,
    max_bucket_size: int = 1000,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.dedup.connected_components over minhash_dedup's
    pairs: the transitive closure by recursive reachability (peer = every
    node reachable from ``node``; component = MIN(peer)). The recursive
    closure is O(component_size²) rows — fine at oracle scale; the Spark
    side uses the O(log n)-round star algorithm instead."""
    ctes = _minhash_ctes(
        k, n_hashes, bands, rows, max_bucket_size, table, id_col, text_col,
        None, threshold,
    )
    return f"""
        WITH RECURSIVE {ctes},
        fp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= {threshold}),
        ed AS (
            SELECT doc_a AS x, doc_b AS y FROM fp
            UNION SELECT doc_b, doc_a FROM fp
        ),
        reach(node, peer) AS (
            SELECT x, x FROM ed
            UNION
            SELECT r.node, e.y FROM reach r JOIN ed e ON e.x = r.peer
        )
        SELECT node AS doc, MIN(peer) AS component FROM reach GROUP BY node
    """


def leakage_split_sql(
    k: int, n_hashes: int, bands: int, rows: int, threshold: float,
    fractions: tuple[float, float, float] = (0.9, 0.05, 0.05),
    max_bucket_size: int = 1000,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    salt: str = "split",
) -> str:
    """Mirror of operators.dedup.leakage_safe_split: same minhash pairs,
    same recursive-reachability components (COALESCE to own id for
    singletons), same md5-56(salt|component) mod 1000 bucketing and the
    same integer thresholds from ``fractions``."""
    t_train = int(round(float(fractions[0]) * 1000))
    t_val = t_train + int(round(float(fractions[1]) * 1000))
    ctes = _minhash_ctes(
        k, n_hashes, bands, rows, max_bucket_size, table, id_col, text_col,
        None, threshold,
    )
    bucket = md5_hash56_sql(
        f"concat('{salt}|', CAST(component AS VARCHAR))"
    )
    return f"""
        WITH RECURSIVE {ctes},
        fp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= {threshold}),
        ed AS (
            SELECT doc_a AS x, doc_b AS y FROM fp
            UNION SELECT doc_b, doc_a FROM fp
        ),
        reach(node, peer) AS (
            SELECT x, x FROM ed
            UNION
            SELECT r.node, e.y FROM reach r JOIN ed e ON e.x = r.peer
        ),
        comp AS (SELECT node AS doc, MIN(peer) AS component FROM reach GROUP BY node),
        lbl AS (
            SELECT t.{id_col},
                   COALESCE(c.component, t.{id_col}) AS component
            FROM {table} t LEFT JOIN comp c ON c.doc = t.{id_col}
        ),
        bkt AS (
            SELECT {id_col}, component,
                   CAST(({bucket}) % 1000 AS BIGINT) AS bucket
            FROM lbl
        )
        SELECT {id_col}, component, bucket,
               CASE WHEN bucket < {t_train} THEN 'train'
                    WHEN bucket < {t_val} THEN 'val'
                    ELSE 'test' END AS split
        FROM bkt
    """


def dedup_keep_best_sql(
    k: int, n_hashes: int, bands: int, rows: int, threshold: float,
    max_bucket_size: int = 1000,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.dedup.dedup_keep_best over minhash_dedup's
    pairs: recursive-reachability components, then the per-component
    winner by (quality_micro DESC, id ASC) — the window formulation of
    the Spark side's max-of-struct argmax (same total order). Singletons
    are their own kept component."""
    ctes = _minhash_ctes(
        k, n_hashes, bands, rows, max_bucket_size, table, id_col, text_col,
        None, threshold,
    )
    return f"""
        WITH RECURSIVE {ctes},
        fp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= {threshold}),
        ed AS (
            SELECT doc_a AS x, doc_b AS y FROM fp
            UNION SELECT doc_b, doc_a FROM fp
        ),
        reach(node, peer) AS (
            SELECT x, x FROM ed
            UNION
            SELECT r.node, e.y FROM reach r JOIN ed e ON e.x = r.peer
        ),
        comp AS (SELECT node AS doc, MIN(peer) AS component FROM reach GROUP BY node),
        q AS (
            SELECT {id_col},
                   CAST(FLOOR(({quality_sql(text_col)}) * 1e6) AS BIGINT)
                       AS quality_micro
            FROM {table}
        ),
        f AS (
            SELECT q.{id_col},
                   COALESCE(comp.component, q.{id_col}) AS component,
                   q.quality_micro,
                   comp.component IS NULL AS singleton
            FROM q LEFT JOIN comp ON comp.doc = q.{id_col}
        ),
        r AS (
            SELECT {id_col}, component, quality_micro, singleton,
                   row_number() OVER (
                       PARTITION BY component
                       ORDER BY quality_micro DESC, {id_col} ASC
                   ) AS rk
            FROM f
        )
        SELECT {id_col}, component, quality_micro,
               (singleton OR rk = 1) AS is_kept
        FROM r
    """


def _minhash_ctes(
    k: int, n_hashes: int, bands: int, rows: int, max_bucket_size: int,
    table: str, id_col: str, text_col: str,
    est_margin: float | None, threshold: float,
) -> str:
    """The shared CTE chain (docs → … → j) behind the minhash oracles."""
    from math import ceil

    from pyspider_spark.operators.dedup import MERSENNE31, minhash_coeffs

    base_h = f"({md5_hash56_sql('shingle')} % {MERSENNE31})"
    mins = ",\n                   ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE31}) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
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
    if est_margin is None:
        pair_select = "SELECT doc_a, doc_b FROM raw_pairs"
    else:
        min_matches = max(0, int(ceil((threshold - est_margin) * n_hashes)))
        match_sum = " + ".join(
            f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
            for i in range(n_hashes)
        )
        pair_select = f"""
            SELECT p.doc_a, p.doc_b FROM raw_pairs p
            JOIN sig sa ON sa.doc = p.doc_a
            JOIN sig sb ON sb.doc = p.doc_b
            WHERE ({match_sum}) >= {min_matches}
        """
    return f"""docs AS (
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
            FROM (SELECT doc, {base_h} AS h FROM sh)
            GROUP BY doc
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
        raw_pairs AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM ok a JOIN ok b ON a.band = b.band AND a.bh = b.bh
            WHERE a.doc < b.doc
        ),
        pairs AS ({pair_select}),
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
        )"""


def ann_lsh_topk_sql(
    query: list[float], k: int = 10,
    n_planes: int = 12, n_tables: int = 4, seed: int = 42, max_hamming: int = 2,
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    """Mirror of functions.similarity.ann_topk_lsh: per-table signatures
    from the SAME seeded planes, multi-probe via hamming-ball IN lists,
    exact-cosine rank over the union of probes."""
    from pyspider_spark.functions.similarity import (
        hamming_ball,
        query_signature,
        table_planes,
    )

    planes_per_table = table_planes(len(query), n_planes, n_tables, seed)
    sig_cols = ",\n                   ".join(
        f"{rh_signature_sql('v', planes)} AS sig_{t}"
        for t, planes in enumerate(planes_per_table)
    )
    probe = " OR ".join(
        "sig_{t} IN ({ball})".format(
            t=t,
            ball=", ".join(
                str(s)
                for s in hamming_ball(
                    query_signature(query, planes), n_planes, max_hamming
                )
            ),
        )
        for t, planes in enumerate(planes_per_table)
    )
    q = _vec_sql(query)
    return f"""
        WITH base AS (
            SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
        ),
        sigs AS (
            SELECT {id_col}, v,
                   {sig_cols}
            FROM base
        )
        SELECT {id_col}, ROUND(list_cosine_similarity(v, {q}), 4) AS cos_sim
        FROM sigs
        WHERE {probe}
        ORDER BY list_cosine_similarity(v, {q}) DESC, {id_col} ASC
        LIMIT {k}
    """


def ann_ivf_topk_sql(
    query: list[float], k: int = 10,
    n_cells: int = 16, nprobe: int = 4, seed: int = 42,
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding",
    centroids=None,
) -> str:
    """Mirror of functions.similarity.ann_topk_ivf: same centroids as
    literals (trained via train_ivf_centroids when provided — pure numpy
    from the same parquet sample, so bit-identical to the Spark side —
    else the seeded fallback), same nearest-cell assignment (1-indexed
    argmax of cosine), same driver-computed probe list."""
    from pyspider_spark.functions.similarity import ivf_centroids, ivf_probe_cells

    if centroids is None:
        centroids = ivf_centroids(len(query), n_cells, seed)
    sims = ",\n                ".join(
        f"list_dot_product(v, {_vec_sql(c)}) / sqrt(list_dot_product(v, v))"
        for c in centroids
    )
    probes = ", ".join(
        str(p) for p in ivf_probe_cells(query, n_cells, seed, nprobe, centroids)
    )
    q = _vec_sql(query)
    return f"""
        WITH base AS (
            SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
        ),
        cells AS (
            SELECT {id_col}, v, list_position(sims, list_max(sims)) AS cell
            FROM (SELECT {id_col}, v, [
                {sims}
            ] AS sims FROM base)
        )
        SELECT {id_col}, ROUND(list_cosine_similarity(v, {q}), 4) AS cos_sim
        FROM cells
        WHERE cell IN ({probes})
        ORDER BY list_cosine_similarity(v, {q}) DESC, {id_col} ASC
        LIMIT {k}
    """


def embedding_near_dup_sql(
    dims: int, threshold: float = 0.95,
    n_bands: int = 4, planes_per_band: int = 6, seed: int = 42,
    max_bucket_size: int = 1000, plant_every: int | None = None,
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    """Mirror of functions.similarity.embedding_near_dup_pairs: banded
    hyperplane buckets (same seeded planes), size guard, cosine verify.
    ``plant_every`` mirrors the driver query's planted near-dups: for
    every id divisible by it, a copy at id+1_000_000 with v[0] += 0.5."""
    from pyspider_spark.functions.similarity import table_planes

    bands = table_planes(dims, planes_per_band, n_bands, seed)
    aug = f"SELECT {id_col} AS doc, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}"
    if plant_every:
        aug += f"""
            UNION ALL
            SELECT {id_col} + 1000000, list_concat([v[1] + 0.5], v[2:])
            FROM (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table})
            WHERE {id_col} % {plant_every} = 0"""
    band_selects = "\n            UNION ALL ".join(
        f"SELECT doc, {t} AS band, {rh_signature_sql('v', planes)} AS bsig FROM aug"
        for t, planes in enumerate(bands)
    )
    return f"""
        WITH aug AS (
            {aug}
        ),
        banded AS (
            {band_selects}
        ),
        counts AS (SELECT band, bsig, COUNT(*) AS n FROM banded GROUP BY 1, 2),
        ok AS (
            SELECT b.doc, b.band, b.bsig FROM banded b
            JOIN counts c ON b.band = c.band AND b.bsig = c.bsig
            WHERE c.n <= {max_bucket_size}
        ),
        cand AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
            FROM ok a JOIN ok b ON a.band = b.band AND a.bsig = b.bsig
            WHERE a.doc < b.doc
        ),
        verified AS (
            SELECT c.doc_a, c.doc_b, list_cosine_similarity(x.v, y.v) AS cs
            FROM cand c
            JOIN aug x ON x.doc = c.doc_a
            JOIN aug y ON y.doc = c.doc_b
        )
        SELECT doc_a, doc_b, ROUND(cs, 4) AS cos_sim
        FROM verified WHERE cs >= {threshold}
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


# ---------------------------------------------------------------------------
# Flagship crawl + multimodal oracles.
#
# The flagship crawl is not SQL-expressible, but its expected final frontier
# IS independently computable: the corpus graph is a deterministic function
# of documents.parquet (pure-Python XXH64 recomputes Spark's xxhash64 host/
# link assignments without a Spark session), and ReferenceSim transcribes
# the reference scheduler's semantics (task_queue.py / scheduler.py) in
# plain Python. Sim output -> a VALUES-literal DuckDB query = a real
# independent oracle for the driver gate (VERDICT r02 item 2).
# ---------------------------------------------------------------------------


def _page_host_py(i: int, hosts: int, seed: int) -> int:
    """Pure-Python mirror of synth._page_host (Spark xxhash64 semantics)."""
    from pyspider_spark.functions.xxh64 import pmod, xxh64_signed

    if hosts <= 1:
        return 0
    if pmod(xxh64_signed(f"hot{seed}-{i}"), 100) < 50:
        return 0
    return pmod(xxh64_signed(f"h{seed}-{i}"), max(hosts - 1, 1)) + 1


def _page_url_py(i: int, h: int) -> str:
    return f"http://site{h}.test/page?n={i}"


def _doc_ids(sf_dir: str) -> list[int]:
    import pyarrow.parquet as pq

    return sorted(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .column("doc_id").to_pylist()
    )


def flagship_graph(
    sf_dir: str, show: int = 5, hosts: int = 4, seed: int = 42, n_seeds: int = 8,
):
    """Rebuild interleave_from_testdata's link graph + synth_seeds' seed
    list in pure Python: corpus {url: [(kind, text, media_ref, offset)]}
    and seeds [(url, priority, exetime)]."""
    from pyspider_spark.functions.xxh64 import pmod, xxh64_signed

    ids = _doc_ids(sf_dir)
    total = len(ids)
    corpus: dict[str, list[tuple]] = {}
    for i in ids:
        url = _page_url_py(i, _page_host_py(i, hosts, seed))
        spans = []
        for k in range(show):
            t = pmod(xxh64_signed(f"{i}-{k}-{seed}"), total)
            href = _page_url_py(t, _page_host_py(t, hosts, seed))
            spans.append(("link", href, None, 2 + k * 2))
        corpus[url] = spans
    stride = max(total // max(n_seeds, 1), 1)
    seeds = []
    for j in range(n_seeds):
        pid = (j * stride) % total
        seeds.append((_page_url_py(pid, _page_host_py(pid, hosts, seed)), j % 3, 0.0))
    return corpus, seeds


def crawl_flagship_sql(
    sf_dir: str, max_rounds: int = 3, loop_limit: int = 100_000,
    show: int = 5, hosts: int = 4, seed: int = 42, n_seeds: int = 8,
) -> str:
    """Expected flagship frontier after ``max_rounds`` rounds, as a VALUES
    literal. Columns mirror __spark_entry__.crawl_flagship's projection:
    (taskid, url, host, status, priority, status_code, round_no)."""
    from pyspider_spark.model_sim import ReferenceSim, SimConfig

    corpus, seeds = flagship_graph(sf_dir, show, hosts, seed, n_seeds)
    sim = ReferenceSim(
        corpus,
        SimConfig(rate=1e9, burst=1e9, loop_limit=loop_limit, robots_enabled=False),
    )
    sim.seed(seeds)
    for r in range(max_rounds):
        sim.run_round(r)
    rows = []
    for t in sim.tasks.values():
        sc = "CAST(NULL AS INTEGER)" if t.status_code is None else str(t.status_code)
        rows.append(
            f"('{t.taskid}', '{t.url}', '{t.host}', {t.status}, "
            f"{t.priority}, {sc}, {t.round_no})"
        )
    values = ",\n            ".join(rows)
    return f"""
        SELECT taskid, url, host,
               CAST(status AS INTEGER) AS status,
               CAST(priority AS INTEGER) AS priority,
               CAST(status_code AS INTEGER) AS status_code,
               CAST(round_no AS INTEGER) AS round_no
        FROM (VALUES
            {values}
        ) AS t(taskid, url, host, status, priority, status_code, round_no)
    """


def multimodal_sql(sf_dir: str, hosts: int = 4, seed: int = 42) -> str:
    """Oracle for the deterministic multimodal columns (media_ref, bytes,
    phash): the ref list comes from the same pure-Python graph, while the
    payload synthesis (sha256 stream) and phash (md5 of the payload's hex)
    are recomputed INSIDE DuckDB — functions.multimodal hashes the hex
    encoding precisely so both engines can run the whole computation."""
    ids = _doc_ids(sf_dir)
    refs = ",\n            ".join(
        f"('media://img/{_page_url_py(i, _page_host_py(i, hosts, seed))}')" for i in ids
    )
    return f"""
        WITH refs(media_ref) AS (VALUES
            {refs}
        ),
        s AS (
            SELECT media_ref, lower(sha256(media_ref)) AS hx,
                   256 + CAST(('0x' || substr(sha256(media_ref), 1, 2)) AS INTEGER) * 16 AS size
            FROM refs
        ),
        p AS (
            SELECT media_ref, size,
                   substr(repeat(hx, CAST(size // 32 + 1 AS INTEGER)), 1, 2 * size) AS payload_hex
            FROM s
        ),
        m AS (
            SELECT media_ref, size,
                   CAST(('0x' || substr(md5(payload_hex), 1, 16)) AS UBIGINT) AS u
            FROM p
        )
        SELECT media_ref, CAST(size AS INTEGER) AS bytes,
               CAST(CAST(u AS HUGEINT)
                    - CASE WHEN u >= 9223372036854775808::UBIGINT
                           THEN 18446744073709551616::HUGEINT
                           ELSE 0::HUGEINT END AS BIGINT) AS phash
        FROM m
    """


def multimodal_frames_sql(sf_dir: str, every_n_bytes: int = 64,
                          hosts: int = 4, seed: int = 42) -> str:
    """Oracle for functions.multimodal.frame_sample: every Nth byte of the
    synthetic payload, recomputed in DuckDB over the hex stream (byte i
    lives at hex offset 2i; frame count = ceil(size / N))."""
    ids = _doc_ids(sf_dir)
    refs = ",\n            ".join(
        f"('media://img/{_page_url_py(i, _page_host_py(i, hosts, seed))}')" for i in ids
    )
    stride = int(every_n_bytes)
    return f"""
        WITH refs(media_ref) AS (VALUES
            {refs}
        ),
        s AS (
            SELECT media_ref, lower(sha256(media_ref)) AS hx,
                   256 + CAST(('0x' || substr(sha256(media_ref), 1, 2)) AS INTEGER) * 16 AS size
            FROM refs
        ),
        p AS (
            SELECT media_ref, size,
                   substr(repeat(hx, CAST(size // 32 + 1 AS INTEGER)), 1, 2 * size) AS payload_hex
            FROM s
        )
        , f AS (
            SELECT media_ref, payload_hex,
                   unnest(range(0, CAST((size + {stride} - 1) // {stride} AS BIGINT))) AS i
            FROM p
        )
        SELECT media_ref,
               CAST(i AS INTEGER) AS frame_no,
               CAST(('0x' || substr(payload_hex, CAST(2 * {stride} * i + 1 AS INTEGER), 2))
                    AS INTEGER) AS frame_byte
        FROM f
    """


def _phash_blkv_sql(refs_cte: str) -> str:
    """Shared CTE chain from a CTE ``refs_cte``(media_ref) to ``blkv``
    (ref, ck, blk): the chained-sha256 payload stream (size =
    128*(2 + h0 % 16)), its #half (2x average-pool) and #jitter (XOR i%4)
    variants, and the 64-bit chunk-mean phash held as four 16-bit block
    ints (no unsigned/sign juggling; hamming = sum of per-block
    bit_count(xor)). Every comparison is integer (64*chunk_sum >
    total_sum), so DuckDB agrees with the Spark kernel bit-for-bit."""
    return f"""s AS (
            SELECT media_ref,
                   128 * (2 + CAST(('0x' || substr(sha256(media_ref), 1, 2)) AS INTEGER) % 16) AS n
            FROM {refs_cte}
        ),
        blocks AS (
            SELECT media_ref, n, unnest(range(0, CAST(n // 32 AS BIGINT))) AS j FROM s
        ),
        pb AS (
            SELECT media_ref, n, j,
                   lower(sha256(media_ref || ':' || CAST(j AS VARCHAR))) AS bh
            FROM blocks
        ),
        p AS (
            SELECT media_ref, n, string_agg(bh, '' ORDER BY j) AS ph
            FROM pb GROUP BY media_ref, n
        ),
        f AS (
            SELECT media_ref, n, ph, unnest(range(0, CAST(n AS BIGINT))) AS i FROM p
        ),
        b AS (
            SELECT media_ref, n, i,
                   CAST(('0x' || substr(ph, CAST(2 * i + 1 AS INTEGER), 2)) AS INTEGER) AS v
            FROM f
        ),
        allv AS (
            SELECT media_ref AS ref, n AS L, i, v FROM b
            UNION ALL
            SELECT media_ref || '#jitter', n, i, xor(v, CAST(i % 4 AS INTEGER)) FROM b
            UNION ALL
            SELECT media_ref || '#half', n // 2, i // 2,
                   CAST(SUM(v) // 2 AS INTEGER)
            FROM b GROUP BY media_ref, n, i // 2
        ),
        sums AS (
            SELECT ref, (i * 64) // L AS c, SUM(v) AS sc
            FROM allv GROUP BY ref, (i * 64) // L
        ),
        tot AS (SELECT ref, SUM(sc) AS st FROM sums GROUP BY ref),
        blkv AS (
            SELECT s.ref, CAST(s.c // 16 AS INTEGER) AS ck,
                   CAST(SUM(CASE WHEN s.sc * 64 > t.st
                                 THEN (1 << CAST(s.c % 16 AS INTEGER))
                                 ELSE 0 END) AS INTEGER) AS blk
            FROM sums s JOIN tot t USING (ref)
            GROUP BY s.ref, s.c // 16
        )"""


def media_phash_sql(sf_dir: str, hosts: int = 4, seed: int = 42,
                    max_hamming: int = 3) -> str:
    """Oracle for functions.multimodal.media_phash_near_dup: payloads,
    variants, and hashes recomputed inside DuckDB (``_phash_blkv_sql``);
    pairing mirrors the pigeonhole plan (4 x 16-bit blocks, exact for
    hamming <= 3, same as simhash_pairs_sql's convention)."""
    ids = _doc_ids(sf_dir)
    refs = ",\n            ".join(
        f"('media://img/{_page_url_py(i, _page_host_py(i, hosts, seed))}')" for i in ids
    )
    return f"""
        WITH refs(media_ref) AS (VALUES
            {refs}
        ),
        {_phash_blkv_sql("refs")},
        cand AS (
            SELECT a.ref AS ref_a, b.ref AS ref_b
            FROM blkv a JOIN blkv b ON a.ck = b.ck AND a.blk = b.blk AND a.ref < b.ref
            GROUP BY 1, 2
        ),
        ham AS (
            SELECT c.ref_a, c.ref_b, SUM(bit_count(xor(x.blk, y.blk))) AS hamming
            FROM cand c
            JOIN blkv x ON x.ref = c.ref_a
            JOIN blkv y ON y.ref = c.ref_b AND y.ck = x.ck
            GROUP BY 1, 2
        )
        SELECT ref_a, ref_b, CAST(hamming AS BIGINT) AS hamming
        FROM ham WHERE hamming <= {int(max_hamming)}
    """


def interleaved_near_dup_sql(
    minhash_threshold: float = 0.7,
    media_max_hamming: int = 3,
    media_min_overlap: float = 0.5,
    min_votes: int = 1,
) -> str:
    """Oracle for operators.dedup.interleaved_near_dup over the derived
    mixed corpus (__spark_entry__._interleaved_mixed_corpus): doc i%10==1
    mirrors doc i-1 in BOTH modalities (same text, #half media copies),
    i%10==3 shares media evidence only (#jitter copy of one of i-1's
    refs), i%10==6 shares text only. Text evidence re-runs the minhash
    oracle over the span-concatenated text (two 150-char chunks — the
    same substr/concat both engines compute); media evidence re-runs the
    phash chain over the base refs + variants, pairs refs by pigeonhole
    Hamming (plus identity), and scores doc pairs by max directional
    containment of matched refs."""
    iv_corpus = """
            SELECT 'd' || CAST(d.doc_id AS VARCHAR) AS doc_id,
                   CASE WHEN d.doc_id % 10 IN (1, 6) AND p.doc_id IS NOT NULL
                        THEN p.text ELSE d.text END AS t,
                   CASE WHEN d.doc_id % 10 = 1 AND p.doc_id IS NOT NULL
                        THEN 'media://' || CAST(p.doc_id AS VARCHAR) || '/0#half'
                        WHEN d.doc_id % 10 = 3 AND p.doc_id IS NOT NULL
                        THEN 'media://' || CAST(p.doc_id AS VARCHAR) || '/0#jitter'
                        ELSE 'media://' || CAST(d.doc_id AS VARCHAR) || '/0' END AS r0,
                   CASE WHEN d.doc_id % 10 = 1 AND p.doc_id IS NOT NULL
                        THEN 'media://' || CAST(p.doc_id AS VARCHAR) || '/1#half'
                        ELSE 'media://' || CAST(d.doc_id AS VARCHAR) || '/1' END AS r1
            FROM documents d LEFT JOIN documents p ON p.doc_id = d.doc_id - 1
    """
    text_table = (
        "(SELECT doc_id, substr(t, 1, 150) || ' ' || substr(t, 151, 150) AS itext "
        f"FROM ({iv_corpus}) ivc) ivx"
    )
    mh_sql = minhash_pairs_sql(
        k=5, n_hashes=32, bands=8, rows=4, threshold=minhash_threshold,
        table=text_table, id_col="doc_id", text_col="itext",
    )
    return f"""
        WITH iv AS ({iv_corpus}),
        baserefs AS (
            SELECT 'media://' || CAST(doc_id AS VARCHAR) || '/' || sfx AS media_ref
            FROM documents, (VALUES ('0'), ('1')) AS sx(sfx)
        ),
        {_phash_blkv_sql("baserefs")},
        rcand AS (
            SELECT a.ref AS rx, b.ref AS ry
            FROM blkv a JOIN blkv b ON a.ck = b.ck AND a.blk = b.blk AND a.ref < b.ref
            GROUP BY 1, 2
        ),
        rham AS (
            SELECT c.rx, c.ry
            FROM rcand c
            JOIN blkv x ON x.ref = c.rx
            JOIN blkv y ON y.ref = c.ry AND y.ck = x.ck
            GROUP BY c.rx, c.ry
            HAVING SUM(bit_count(xor(x.blk, y.blk))) <= {int(media_max_hamming)}
        ),
        refpairs AS (
            SELECT rx, ry FROM rham
            UNION SELECT ry, rx FROM rham
            UNION SELECT DISTINCT ref, ref FROM blkv
        ),
        dm AS (
            SELECT doc_id AS doc, r0 AS media_ref FROM iv
            UNION SELECT doc_id, r1 FROM iv
        ),
        mm AS (
            SELECT a.doc AS doc_a, b.doc AS doc_b,
                   COUNT(DISTINCT a.media_ref) AS m_a,
                   COUNT(DISTINCT b.media_ref) AS m_b
            FROM dm a
            JOIN refpairs r ON r.rx = a.media_ref
            JOIN dm b ON b.media_ref = r.ry
            WHERE a.doc < b.doc
            GROUP BY 1, 2
        ),
        cnt AS (SELECT doc, COUNT(*) AS n_m FROM dm GROUP BY doc),
        md AS (
            SELECT doc_a, doc_b, media_overlap FROM (
                SELECT mm.doc_a, mm.doc_b,
                       ROUND(GREATEST(CAST(mm.m_a AS DOUBLE) / ca.n_m,
                                      CAST(mm.m_b AS DOUBLE) / cb.n_m), 4)
                           AS media_overlap
                FROM mm
                JOIN cnt ca ON ca.doc = mm.doc_a
                JOIN cnt cb ON cb.doc = mm.doc_b
            ) WHERE media_overlap >= {float(media_min_overlap)}
        ),
        mh AS (
            SELECT doc_a, doc_b, jaccard AS text_jaccard FROM (
                {mh_sql}
            )
        )
        SELECT * FROM (
            SELECT COALESCE(mh.doc_a, md.doc_a) AS doc_a,
                   COALESCE(mh.doc_b, md.doc_b) AS doc_b,
                   mh.text_jaccard, md.media_overlap,
                   (mh.doc_a IS NOT NULL) AS by_text,
                   (md.doc_a IS NOT NULL) AS by_media,
                   CAST(mh.doc_a IS NOT NULL AS BIGINT)
                       + CAST(md.doc_a IS NOT NULL AS BIGINT) AS votes
            FROM mh FULL OUTER JOIN md
              ON mh.doc_a = md.doc_a AND mh.doc_b = md.doc_b
        ) WHERE votes >= {int(min_votes)}
    """


def _lang_counts_sql(text_expr: str) -> str:
    """Per-language marker-hit count columns (c_en … c_cjk), mirroring
    functions.text.lang_guess's vote inputs."""
    from pyspider_spark.functions.text import LANG_MARKERS

    cols = [
        f"len(regexp_extract_all(lower({text_expr}), "
        f"'\\b({'|'.join(ws)})\\b')) AS c_{lang}"
        for lang, ws in LANG_MARKERS.items()
    ]
    cols.append(
        f"len(regexp_extract_all({text_expr}, '[\\x{{4e00}}-\\x{{9fff}}]')) AS c_cjk"
    )
    return ",\n                   ".join(cols)


LANG_CASE_SQL = """CASE WHEN c_cjk > 0 THEN 'zh'
                 WHEN GREATEST(c_en, c_de, c_fr, c_es) = 0 THEN 'unknown'
                 WHEN c_en = GREATEST(c_en, c_de, c_fr, c_es) THEN 'en'
                 WHEN c_de = GREATEST(c_en, c_de, c_fr, c_es) THEN 'de'
                 WHEN c_fr = GREATEST(c_en, c_de, c_fr, c_es) THEN 'fr'
                 ELSE 'es' END"""


def quality_sql(text_expr: str) -> str:
    """Mirror of functions.text.quality_score (same stopword markers,
    same linear weights, same clips)."""
    return f"""GREATEST(0.0, LEAST(1.0,
          0.5 * LEAST(length({text_expr}) / 500.0, 1.0)
        + 2.0 * (CASE WHEN trim({text_expr}) = '' THEN 0.0 ELSE
            CAST(len(regexp_extract_all(lower({text_expr}), '\\b(the|and|of|to|is)\\b'))
                 AS DOUBLE)
            / len(string_split_regex(trim({text_expr}), '\\s+')) END)
        - 1.0 * (CASE WHEN length({text_expr}) = 0 THEN 0.0 ELSE
            CAST(len(regexp_extract_all({text_expr}, '[^A-Za-z0-9\\s]')) AS DOUBLE)
            / length({text_expr}) END)
        + 0.3))"""


def corpus_clean_sql(
    langs: tuple[str, ...] = ("en",), min_quality: float = 0.5,
    k: int = 5, n_hashes: int = 32, bands: int = 8, rows: int = 4,
    threshold: float = 0.6, max_bucket_size: int = 1000,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.clean.corpus_clean: lang gate → quality gate →
    exact dedup (min id per md5 fingerprint) → minhash near-dup pairs →
    reachability-closure components → kept = canonical member."""
    lang_list = ", ".join(f"'{l}'" for l in langs)
    ctes = _minhash_ctes(
        k, n_hashes, bands, rows, max_bucket_size, "exact_kept",
        id_col, text_col, None, threshold,
    )
    return f"""
        WITH RECURSIVE
        lv AS (
            SELECT {id_col}, {text_col},
                   {_lang_counts_sql(text_col)}
            FROM {table}
        ),
        base AS (
            SELECT {id_col}, {text_col} FROM lv
            WHERE ({LANG_CASE_SQL}) IN ({lang_list})
              AND ({quality_sql(text_col)}) >= {min_quality}
        ),
        fpx AS (
            SELECT {id_col}, {text_col},
                   md5(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')) AS fp
            FROM base
        ),
        mfp AS (SELECT fp, MIN({id_col}) AS m FROM fpx GROUP BY fp),
        exact_kept AS (
            SELECT f.{id_col}, f.{text_col}
            FROM fpx f JOIN mfp g ON f.fp = g.fp AND f.{id_col} = g.m
        ),
        {ctes},
        fp2 AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= {threshold}),
        ed AS (
            SELECT doc_a AS x, doc_b AS y FROM fp2
            UNION SELECT doc_b, doc_a FROM fp2
        ),
        reach(node, peer) AS (
            SELECT x, x FROM ed
            UNION
            SELECT r.node, e.y FROM reach r JOIN ed e ON e.x = r.peer
        ),
        comp AS (SELECT node AS doc, MIN(peer) AS component FROM reach GROUP BY node)
        SELECT e.{id_col},
               COALESCE(c.component, e.{id_col}) AS component,
               COALESCE(c.component, e.{id_col}) = e.{id_col} AS kept
        FROM exact_kept e LEFT JOIN comp c ON c.doc = e.{id_col}
    """


def pagerank_sql(
    links_per_doc: int = 8, n_iter: int = 10, damping: float = 0.85,
    table: str = "documents", id_col: str = "doc_id",
) -> str:
    """Mirror of operators.graph.doc_pagerank: the same md5-slice link
    derivation and the same fixed power iterations, UNROLLED as one CTE
    pair (contributions + dangling mass) per iteration — recursive CTEs
    can't aggregate the recursive table, unrolling can."""
    h = md5_hash56_sql("(CAST(src AS VARCHAR) || '-' || CAST(k AS VARCHAR))")
    d = repr(float(damping))
    n_sql = "(SELECT n FROM nn)"
    its = []
    for i in range(1, n_iter + 1):
        p = f"r{i - 1}"
        its.append(f"""
        c{i} AS MATERIALIZED (
            SELECT e.dst AS node, SUM(r.rank / e.outdeg) AS c
            FROM ed e JOIN {p} r ON r.node = e.src GROUP BY e.dst
        ),
        d{i} AS MATERIALIZED (
            SELECT COALESCE(SUM(r.rank), 0.0) AS dm FROM {p} r
            WHERE r.node NOT IN (SELECT src FROM deg)
        ),
        r{i} AS MATERIALIZED (
            SELECT n.node,
                   (1.0 - {d}) / {n_sql}
                   + {d} * (COALESCE(c.c, 0.0) + (SELECT dm FROM d{i}) / {n_sql})
                   AS rank
            FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
        )""")
    return f"""
        WITH raw AS (
            SELECT src, unnest(range(0, {links_per_doc})) AS k
            FROM (SELECT {id_col} AS src FROM {table})
        ),
        edges AS MATERIALIZED (
            SELECT DISTINCT src,
                   ({h} % (SELECT COUNT(*) FROM {table})) AS dst
            FROM raw
        ),
        e2 AS MATERIALIZED (SELECT src, dst FROM edges WHERE src != dst),
        nodes AS MATERIALIZED (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
        nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
        deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM e2 GROUP BY src),
        ed AS MATERIALIZED (SELECT e.src, e.dst, g.outdeg FROM e2 e JOIN deg g ON g.src = e.src),
        r0 AS MATERIALIZED (SELECT node, 1.0 / {n_sql} AS rank FROM nodes),
        {", ".join(its)}
        SELECT node AS {id_col},
               ROUND(rank * {n_sql}, 6) AS rank_x_n
        FROM r{n_iter}
    """


def repetition_sql(table: str = "documents", id_col: str = "doc_id",
                   text_col: str = "text") -> str:
    """Mirror of operators.textprep.repetition_stats: same line/paragraph
    splits (literal-newline splits match Spark's regex split for these
    patterns), same word regex, same top-2-gram slot fraction."""
    def dup(arr: str) -> str:
        return (f"CASE WHEN len({arr}) = 0 THEN 0.0 ELSE "
                f"ROUND((len({arr}) - len(list_distinct({arr})))"
                f" / CAST(len({arr}) AS DOUBLE), 6) END")

    return f"""
        WITH lx AS (
            SELECT {id_col},
                   list_filter(string_split(COALESCE({text_col}, ''), chr(10)),
                               x -> trim(x) != '') AS lines,
                   list_filter(string_split(COALESCE({text_col}, ''),
                                            chr(10) || chr(10)),
                               x -> trim(x) != '') AS paras,
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        base AS (
            SELECT {id_col},
                   CAST(len(lines) AS INTEGER) AS n_lines,
                   {dup('lines')} AS dup_line_frac,
                   {dup('paras')} AS dup_para_frac,
                   len(w) AS n_words, w
            FROM lx
        ),
        gx AS (
            SELECT {id_col}, n_words, w,
                   unnest(range(1, len(w))) AS i
            FROM base WHERE n_words >= 2
        ),
        gc AS (
            SELECT {id_col}, n_words, w[i] || ' ' || w[i + 1] AS gram,
                   COUNT(*) AS c
            FROM gx GROUP BY ALL
        ),
        tg AS (
            SELECT {id_col}, MAX(c) AS top_c FROM gc GROUP BY {id_col}
        )
        SELECT b.{id_col}, b.n_lines, b.dup_line_frac, b.dup_para_frac,
               CASE WHEN b.n_words >= 2 THEN
                   ROUND(t.top_c / CAST(b.n_words - 1 AS DOUBLE), 6)
               ELSE 0.0 END AS top_2gram_frac
        FROM base b LEFT JOIN tg t ON t.{id_col} = b.{id_col}
    """


def pii_scrub_sql(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Mirror of operators.textprep.scrub_pii: same patterns applied in
    the same fixed order, each class counted on the text AFTER the
    previous class was redacted."""
    from pyspider_spark.operators.textprep import PII_PATTERNS

    ctes, prev = [], "s0"
    ctes.append(f"s0 AS (SELECT {id_col}, COALESCE({text_col}, '') AS t FROM {table})")
    counts: list[str] = []
    for i, (name, pat) in enumerate(PII_PATTERNS.items(), start=1):
        lit = pat.replace("'", "''")
        carried = "".join(f" {c}," for c in counts)
        ctes.append(
            f"s{i} AS (SELECT {id_col},{carried}"
            f" len(regexp_extract_all(t, '{lit}')) AS n_{name},"
            f" regexp_replace(t, '{lit}', '<{name}>', 'g') AS t"
            f" FROM {prev})"
        )
        counts.append(f"n_{name}")
        prev = f"s{i}"
    return f"""
        WITH {", ".join(ctes)}
        SELECT {id_col}, {", ".join(f"CAST({c} AS INTEGER) AS {c}" for c in counts)},
               md5(t) AS clean_fp
        FROM {prev}
    """


def stratified_sample_sql(rates: dict[str, float], stratum_col: str = "lang",
                          default_rate: float = 0.0, salt: str = "sample",
                          mod: int = 1_000_000, table: str = "documents",
                          id_col: str = "doc_id") -> str:
    """Mirror of operators.textprep.stratified_sample over the documents
    table's native lang column (same md5-slice hash, same double-vs-double
    threshold comparison — never an integer cast, whose rounding rules
    differ between engines)."""
    h = md5_hash56_sql(f"CAST({id_col} AS VARCHAR)", salt=salt)
    case = " ".join(
        f"WHEN '{s}' THEN {float(r)!r}" for s, r in sorted(rates.items())
    )
    return f"""
        SELECT {id_col}, {stratum_col}
        FROM {table}
        WHERE CAST(({h}) % {mod} AS DOUBLE)
            < (CASE {stratum_col} {case} ELSE {float(default_rate)!r} END) * {float(mod)!r}
    """


def tfidf_topk_sql(k: int = 3, min_df: int = 1, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Mirror of operators.textprep.tfidf_topk: same tokenization, same
    score = tf * ln(N / df) in the same operand order (bit-identical IEEE
    doubles before the shared ROUND)."""
    return f"""
        WITH w AS (
            SELECT {id_col},
                   unnest(regexp_extract_all(lower(COALESCE({text_col}, '')),
                                             '[a-z0-9]+')) AS term
            FROM {table}
        ),
        tf AS (SELECT {id_col}, term, COUNT(*) AS tf FROM w GROUP BY ALL),
        dfq AS (
            SELECT term, COUNT(*) AS df FROM tf
            GROUP BY term HAVING COUNT(*) >= {min_df}
        ),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM {table}),
        s AS (
            SELECT t.{id_col}, t.term, t.tf, d.df,
                   ROUND(CAST(t.tf AS DOUBLE)
                         * ln((SELECT n FROM nn) / CAST(d.df AS DOUBLE)), 6)
                   AS score
            FROM tf t JOIN dfq d ON d.term = t.term
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY {id_col} ORDER BY score DESC, term ASC
            ) AS rn FROM s
        )
        SELECT {id_col}, term, tf, df, score FROM r WHERE rn <= {k}
    """


# --- corpus-prep oracles (operators/corpus) ----------------------------------


def strip_boilerplate_sql(min_docs: int = 5, table: str = "documents",
                          id_col: str = "doc_id", text_expr: str = "text") -> str:
    """Mirror of operators.corpus.strip_boilerplate: same line
    normalization (trim, drop empties), hotness = distinct-doc count >=
    min_docs, removal of every occurrence, order-preserving rejoin.
    ``text_expr`` lets the driver query wrap the corpus text with
    synthetic boilerplate in BOTH engines identically."""
    lines = (f"list_filter(list_transform(string_split({text_expr}, chr(10)), "
             f"x -> trim(x)), x -> x <> '')")
    return f"""
        WITH base AS (SELECT {id_col}, {lines} AS lines FROM {table}),
        perdoc AS (
            SELECT {id_col}, unnest(list_distinct(lines)) AS line FROM base
        ),
        hot AS (
            SELECT line FROM (
                SELECT line, COUNT(*) AS c FROM perdoc GROUP BY line
            ) WHERE c >= {int(min_docs)}
        ),
        ex AS (
            SELECT {id_col}, unnest(lines) AS line,
                   unnest(generate_series(1, len(lines))) AS pos
            FROM base
        ),
        kept AS (SELECT e.* FROM ex e ANTI JOIN hot h ON e.line = h.line),
        reb AS (
            SELECT {id_col},
                   string_agg(line, chr(10) ORDER BY pos) AS text_clean,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY {id_col}
        )
        SELECT b.{id_col},
               COALESCE(r.text_clean, '') AS text_clean,
               CAST(len(b.lines) AS BIGINT) AS n_lines,
               CAST(len(b.lines) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
        FROM base b LEFT JOIN reb r USING ({id_col})
    """


def ngram_contamination_sql(n: int = 8, min_hits: int = 1,
                            bench_pred: str = "doc_id % 97 = 0",
                            table: str = "documents", id_col: str = "doc_id",
                            text_col: str = "text") -> str:
    """Mirror of operators.corpus.ngram_contamination with the benchmark
    side selected by ``bench_pred`` over the same table (the driver query
    uses a deterministic id-slice as the synthetic benchmark). Grams hash
    through the shared portable md5 slice in both engines."""
    gh = md5_hash56_sql("gram")
    return f"""
        WITH w AS (
            SELECT {id_col},
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        g AS (
            SELECT {id_col}, list_distinct(
                CASE WHEN len(w) >= {int(n)} THEN
                    [array_to_string(w[p:p+{int(n) - 1}], ' ')
                     for p in generate_series(1, len(w) - {int(n) - 1})]
                ELSE [] END) AS grams
            FROM w
        ),
        bh AS (
            SELECT DISTINCT {gh} AS gh FROM (
                SELECT unnest(grams) AS gram FROM g WHERE {bench_pred}
            )
        ),
        eh AS (
            SELECT {id_col}, {gh} AS gh FROM (
                SELECT {id_col}, unnest(grams) AS gram FROM g
            )
        ),
        h AS (
            SELECT {id_col}, COUNT(*) AS n_hits
            FROM eh JOIN bh USING (gh) GROUP BY {id_col}
        )
        SELECT g.{id_col},
               CAST(len(grams) AS BIGINT) AS n_grams,
               CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
               COALESCE(h.n_hits, 0) >= {int(min_hits)} AS contaminated
        FROM g LEFT JOIN h USING ({id_col})
    """


def pack_sequences_sql(max_tokens: int = 2048, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text") -> str:
    """Mirror of operators.corpus.pack_sequences as ONE global window
    cumsum — correct at oracle scale, and exactly what the two-phase
    bucketed prefix sum must reproduce for ANY bucket_span (the driver
    gate therefore also checks the bucketing's span-invariance)."""
    return f"""
        WITH t AS (
            SELECT {id_col},
                   CAST(len(regexp_extract_all(lower(COALESCE({text_col}, '')),
                                               '[a-z0-9]+')) AS BIGINT) AS n_tokens
            FROM {table}
        ),
        c AS (
            SELECT {id_col}, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS start_offset
            FROM t
        )
        SELECT {id_col}, n_tokens, start_offset,
               CAST(floor(start_offset / {int(max_tokens)}) AS BIGINT) AS pack_id,
               start_offset % {int(max_tokens)} AS pack_pos
        FROM c
    """


def _mixture_rate_sql(targets: dict[str, float], stratum_col: str,
                      table: str) -> str:
    """Shared CTE body computing (stratum, n_docs, raw weight _w) with
    the same operand order as operators.corpus._weights_raw."""
    case = " ".join(f"WHEN '{s}' THEN {float(t)!r}" for s, t in sorted(targets.items()))
    return f"""
        c AS (
            SELECT {stratum_col} AS stratum, COUNT(*) AS n_docs
            FROM {table} GROUP BY 1
        ),
        tt AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM c),
        wts AS (
            SELECT stratum, n_docs,
                   (CASE stratum {case} ELSE 0.0 END) * (SELECT total FROM tt)
                       / CAST(n_docs AS DOUBLE) AS _w
            FROM c
        )
    """


def mixture_weights_sql(targets: dict[str, float], stratum_col: str = "lang",
                        table: str = "documents") -> str:
    """Mirror of operators.corpus.mixture_weights."""
    return f"""
        WITH {_mixture_rate_sql(targets, stratum_col, table)}
        SELECT stratum, n_docs,
               ROUND(_w, 6) AS weight,
               ROUND(LEAST(_w, 1.0), 6) AS sample_rate
        FROM wts
    """


def rebalance_sql(targets: dict[str, float], stratum_col: str = "lang",
                  id_col: str = "doc_id", salt: str = "mix",
                  mod: int = 1_000_000, table: str = "documents") -> str:
    """Mirror of operators.corpus.rebalance: data-derived rate, same
    md5-slice Bernoulli predicate, same double-vs-double comparison on
    the UNROUNDED rate."""
    h = md5_hash56_sql(f"CAST({id_col} AS VARCHAR)", salt=salt)
    return f"""
        WITH {_mixture_rate_sql(targets, stratum_col, table)}
        SELECT d.{id_col}, d.{stratum_col} AS stratum
        FROM {table} d JOIN wts r ON d.{stratum_col} = r.stratum
        WHERE CAST(({h}) % {mod} AS DOUBLE)
            < LEAST(r._w, 1.0) * {float(mod)!r}
    """


def dedup_paragraphs_sql(table: str = "documents", id_col: str = "doc_id",
                         text_expr: str = "text") -> str:
    """Mirror of operators.corpus.dedup_paragraphs: same line
    normalization, global keep-first by (doc, pos) via a keyed
    row_number, order-preserving rejoin."""
    lines = (f"list_filter(list_transform(string_split({text_expr}, chr(10)), "
             f"x -> trim(x)), x -> x <> '')")
    return f"""
        WITH base AS (SELECT {id_col}, {lines} AS lines FROM {table}),
        ex AS (
            SELECT {id_col}, unnest(lines) AS line,
                   unnest(generate_series(1, len(lines))) AS pos
            FROM base
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY md5(line) ORDER BY {id_col}, pos
            ) AS rn FROM ex
        ),
        reb AS (
            SELECT {id_col},
                   string_agg(line, chr(10) ORDER BY pos) AS text_clean,
                   COUNT(*) AS n_kept
            FROM r WHERE rn = 1 GROUP BY {id_col}
        )
        SELECT b.{id_col},
               COALESCE(r.text_clean, '') AS text_clean,
               CAST(len(b.lines) AS BIGINT) AS n_lines,
               CAST(len(b.lines) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
        FROM base b LEFT JOIN reb r USING ({id_col})
    """


def url_filter_sql(blocked_domains: list[str],
                   block_re: str = "(porn|xxx|casino|gambl|viagra|escort|lottery)",
                   max_len: int = 2048, table: str = "documents",
                   id_col: str = "doc_id", url_expr: str = "url") -> str:
    """Mirror of operators.corpus.url_filter: same host extraction (port
    stripped, lowercased), same dot-suffix blocklist semantics, same
    first-failing-rule reason order."""
    blocked = ", ".join(f"'{d.lower()}'" for d in sorted(set(blocked_domains)))
    host_re = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"
    return f"""
        WITH u AS (SELECT {id_col}, {url_expr} AS url FROM {table}),
        h AS (
            SELECT {id_col}, url,
                   lower(string_split(regexp_extract(url, '{host_re}', 1), ':')[1])
                       AS host
            FROM u
        ),
        s AS (SELECT *, string_split(host, '.') AS labels FROM h),
        rr AS (
            SELECT {id_col}, url, host,
                   CASE
                       WHEN NOT regexp_matches(url, '^https?://') THEN 'scheme'
                       WHEN list_has_any(
                           [array_to_string(list_slice(labels, i, len(labels)), '.')
                            for i in generate_series(1, greatest(len(labels), 1))],
                           [{blocked}]) THEN 'domain'
                       WHEN regexp_matches(lower(url), '{block_re}') THEN 'pattern'
                       WHEN length(url) > {int(max_len)} THEN 'length'
                   END AS reason
            FROM s
        )
        SELECT {id_col}, url, host, reason, reason IS NULL AS kept FROM rr
    """


def span_dedup_sql(n: int = 10, min_docs: int = 2, table: str = "documents",
                   id_col: str = "doc_id", text_col: str = "text") -> str:
    """Mirror of operators.corpus.span_dedup: distinct n-token span
    hashes per doc, span doc-frequency, per-doc duplicated-span count.
    Hashing (56-bit md5 slice) and distinct-on-hash order match the
    Spark plan exactly."""
    gh = md5_hash56_sql("gram")
    return f"""
        WITH w AS (
            SELECT {id_col},
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        g AS (
            SELECT {id_col}, list_distinct(
                CASE WHEN len(w) >= {int(n)} THEN
                    [{gh} for gram in
                     [array_to_string(w[p:p+{int(n) - 1}], ' ')
                      for p in generate_series(1, len(w) - {int(n) - 1})]]
                ELSE [] END) AS ghs
            FROM w
        ),
        thin AS (SELECT {id_col}, unnest(ghs) AS gh FROM g),
        dup AS (
            SELECT gh FROM thin GROUP BY gh
            HAVING COUNT(*) >= {int(min_docs)}
        ),
        hits AS (
            SELECT {id_col}, COUNT(*) AS dup_spans
            FROM thin JOIN dup USING (gh) GROUP BY {id_col}
        )
        SELECT g.{id_col},
               CAST(len(ghs) AS BIGINT) AS n_spans,
               CAST(COALESCE(hits.dup_spans, 0) AS BIGINT) AS dup_spans
        FROM g LEFT JOIN hits USING ({id_col})
    """


def unigram_logprob_sql(table: str = "documents", id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """Mirror of operators.textprep.unigram_logprob. The per-token score
    quantizes to integer micro-nats BEFORE the per-doc sum, so both
    engines do exact integer arithmetic and the value-hash comparison
    never depends on float accumulation order."""
    return f"""
        WITH w AS (
            SELECT {id_col},
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        t AS (SELECT {id_col}, unnest(w) AS tok FROM w),
        f AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY tok),
        tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM f),
        s AS (
            SELECT {id_col},
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(CAST(FLOOR(
                       ln(CAST(cnt AS DOUBLE) / total) * 1e6
                   ) AS BIGINT)) AS BIGINT) AS lp_micro_sum
            FROM t JOIN f USING (tok) CROSS JOIN tot
            GROUP BY {id_col}
        )
        SELECT w.{id_col},
               CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(s.lp_micro_sum, 0) AS BIGINT) AS lp_micro_sum,
               CAST(COALESCE(FLOOR(CAST(s.lp_micro_sum AS DOUBLE)
                                   / CAST(s.n_tokens AS DOUBLE)), 0) AS BIGINT)
                   AS avg_lp_micro
        FROM w LEFT JOIN s USING ({id_col})
    """


def dsir_logratio_sql(table: str = "documents", id_col: str = "doc_id",
                      text_col: str = "text", target_col: str = "lang",
                      target_value: str = "en") -> str:
    """Mirror of operators.textprep.dsir_logratio. Each model's per-token
    log-prob quantizes to integer micro-nats BEFORE the subtraction and
    the per-doc sum, so both engines do exact integer arithmetic past
    the single ln() call (the same construction unigram_logprob_sql
    proved hash-stable across Spark and DuckDB)."""
    return f"""
        WITH w AS (
            SELECT {id_col},
                   {target_col} = '{target_value}' AS is_t,
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        t AS (SELECT {id_col}, is_t, unnest(w) AS tok FROM w),
        f AS (
            SELECT tok,
                   COUNT(*) AS cnt_r,
                   SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS cnt_t
            FROM t GROUP BY tok
        ),
        c AS (
            SELECT CAST(SUM(cnt_r) AS DOUBLE) AS total_r,
                   CAST(SUM(cnt_t) AS DOUBLE) AS total_t,
                   CAST(COUNT(*) AS DOUBLE) AS vocab
            FROM f
        ),
        s AS (
            SELECT {id_col},
                   CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(
                       CAST(FLOOR(ln(CAST(cnt_t + 1 AS DOUBLE)
                                     / (total_t + vocab)) * 1e6) AS BIGINT)
                     - CAST(FLOOR(ln(CAST(cnt_r + 1 AS DOUBLE)
                                     / (total_r + vocab)) * 1e6) AS BIGINT)
                   ) AS BIGINT) AS dsir_micro_sum
            FROM t JOIN f USING (tok) CROSS JOIN c
            GROUP BY {id_col}
        )
        SELECT w.{id_col},
               CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(s.dsir_micro_sum, 0) AS BIGINT) AS dsir_micro_sum,
               CAST(COALESCE(FLOOR(CAST(s.dsir_micro_sum AS DOUBLE)
                                   / CAST(s.n_tokens AS DOUBLE)), 0) AS BIGINT)
                   AS avg_dsir_micro
        FROM w LEFT JOIN s USING ({id_col})
    """


def dsir_topk_select_sql(k: int = 100, table: str = "documents",
                         id_col: str = "doc_id", text_col: str = "text",
                         target_col: str = "lang",
                         target_value: str = "en") -> str:
    """Mirror of operators.textprep.dsir_topk_select: the dsir_logratio
    weights, ordered by per-token weight DESC with id ASC tie-break,
    LIMIT k. The tie-break makes the kept row SET engine-exact, which is
    all the hash gate compares (it sorts rows itself)."""
    inner = dsir_logratio_sql(table, id_col, text_col, target_col, target_value)
    return f"""
        SELECT * FROM ({inner})
        ORDER BY avg_dsir_micro DESC, {id_col} ASC
        LIMIT {k}
    """


def dsir_quantile_select_sql(keep_num: int = 1, keep_den: int = 4,
                             table: str = "documents",
                             id_col: str = "doc_id", text_col: str = "text",
                             target_col: str = "lang",
                             target_value: str = "en") -> str:
    """Mirror of operators.textprep.dsir_quantile_select: ties-inclusive
    histogram-CDF threshold — the LOWEST score whose cumulative count
    covers ceil(total * keep_num / keep_den), then a plain >= filter.
    All comparisons are integer (the fraction is a ratio, never a
    float), so the kept set is engine-exact."""
    inner = dsir_logratio_sql(table, id_col, text_col, target_col, target_value)
    return f"""
        WITH base AS ({inner}),
        h AS (
            SELECT avg_dsir_micro, COUNT(*) AS cnt
            FROM base GROUP BY avg_dsir_micro
        ),
        cdf AS (
            SELECT avg_dsir_micro,
                   SUM(cnt) OVER (ORDER BY avg_dsir_micro DESC
                                  ROWS UNBOUNDED PRECEDING) AS cume
            FROM h
        ),
        tt AS (SELECT SUM(cnt) AS total FROM h),
        thr AS (
            SELECT MAX(avg_dsir_micro) AS thr
            FROM cdf CROSS JOIN tt
            WHERE cume * {keep_den} >= total * {keep_num}
        )
        SELECT base.* FROM base CROSS JOIN thr
        WHERE avg_dsir_micro >= thr
    """


def bm25_topk_sql(terms: list[str], k: int = 20, k1: float = 1.2,
                  b: float = 0.75, table: str = "documents",
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """Mirror of operators.textprep.bm25_topk: Lucene-variant BM25 with
    the per-(doc, term) score quantized to integer micro-units BEFORE
    the per-doc sum. Every double input (tf, df, dl, N, total_tokens)
    is exact, the float literals (k1, b and their Python-derived
    combinations) round-trip identically through repr, and the
    arithmetic is written in the same association order as the Spark
    expression — so the int64 sums hash-match exactly."""
    terms = sorted({t.lower() for t in terms})
    in_list = ", ".join("'%s'" % t for t in terms)
    return f"""
        WITH w AS (
            SELECT {id_col},
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        c AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   CAST(SUM(len(w)) AS DOUBLE) AS total_tokens
            FROM w
        ),
        hits AS (
            SELECT {id_col}, len(w) AS dl, unnest(w) AS tok FROM w
        ),
        tf AS (
            SELECT {id_col}, tok, COUNT(*) AS tf, FIRST(dl) AS dl
            FROM hits WHERE tok IN ({in_list})
            GROUP BY {id_col}, tok
        ),
        df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        s AS (
            SELECT {id_col},
                   CAST(SUM(CAST(FLOOR(
                       ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                       * ((tf * {k1 + 1.0}) /
                          (tf + {k1} * ({1.0 - b} + {b} * dl
                                        / (total_tokens / n_docs))))
                       * 1e6) AS BIGINT)) AS BIGINT) AS bm25_micro,
                   CAST(COUNT(*) AS BIGINT) AS n_terms
            FROM tf JOIN df USING (tok) CROSS JOIN c
            GROUP BY {id_col}
        )
        SELECT * FROM s
        ORDER BY bm25_micro DESC, {id_col} ASC
        LIMIT {k}
    """


def winnow_overlap_sql(k: int = 8, w: int = 4, min_shared: int = 3,
                       max_bucket_size: int = 1000, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text") -> str:
    """Mirror of operators.dedup.winnow_overlap_pairs: same ws-normalized
    lowercase stream, same k-gram md5-56 hashes, same w-window value-min
    selection (value-min + distinct set makes tie order irrelevant), same
    hot-fingerprint guard before the self-join."""
    gh = md5_hash56_sql(f"substr(t, p, {int(k)})")
    return f"""
        WITH d AS (
            SELECT {id_col} AS doc,
                   regexp_replace(lower(COALESCE({text_col}, '')),
                                  '\\s+', ' ', 'g') AS t
            FROM {table}
        ),
        h AS (
            SELECT doc,
                   [{gh} for p in
                    generate_series(1, greatest(length(t) - {k - 1}, 1))] AS h_arr
            FROM d
        ),
        fp AS (
            SELECT doc, list_distinct(
                [list_min(h_arr[i:i+{w - 1}]) for i in
                 generate_series(1, greatest(len(h_arr) - {w - 1}, 1))]) AS fps
            FROM h
        ),
        posts AS (SELECT doc, unnest(fps) AS f FROM fp),
        pg AS (SELECT f FROM posts GROUP BY f
               HAVING COUNT(*) <= {int(max_bucket_size)}),
        p AS (SELECT doc, f FROM posts JOIN pg USING (f))
        SELECT a.doc AS doc_a, b.doc AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM p a JOIN p b ON a.f = b.f AND a.doc < b.doc
        GROUP BY 1, 2
        HAVING COUNT(*) >= {int(min_shared)}
    """


def winnow_contamination_sql(k: int = 8, w: int = 4, bench_mod: int = 17,
                             table: str = "documents",
                             id_col: str = "doc_id",
                             text_col: str = "text") -> str:
    """Mirror of operators.dedup.winnow_contamination over the derived
    split: docs with id % bench_mod == 0 are the 'benchmark', the rest
    the training corpus. Same normalization, gram hashes, and w-window
    value-min fingerprints as winnow_overlap_sql; the corpus side
    collapses to its DISTINCT fingerprint set and each benchmark
    fingerprint probes it with one left join."""
    gh = md5_hash56_sql(f"substr(t, p, {int(k)})")
    return f"""
        WITH d AS (
            SELECT {id_col} AS doc, ({id_col} % {int(bench_mod)} = 0) AS is_bench,
                   regexp_replace(lower(COALESCE({text_col}, '')),
                                  '\\s+', ' ', 'g') AS t
            FROM {table}
        ),
        h AS (
            SELECT doc, is_bench,
                   [{gh} for p in
                    generate_series(1, greatest(length(t) - {k - 1}, 1))] AS h_arr
            FROM d
        ),
        fp AS (
            SELECT doc, is_bench, list_distinct(
                [list_min(h_arr[i:i+{w - 1}]) for i in
                 generate_series(1, greatest(len(h_arr) - {w - 1}, 1))]) AS fps
            FROM h
        ),
        corpus_fp AS (
            SELECT DISTINCT unnest(fps) AS f FROM fp WHERE NOT is_bench
        ),
        bench_posts AS (
            SELECT doc, unnest(fps) AS f FROM fp WHERE is_bench
        )
        SELECT b.doc AS {id_col},
               CAST(COUNT(*) AS BIGINT) AS n_fps,
               CAST(COUNT(c.f) AS BIGINT) AS n_hit,
               ROUND(COUNT(c.f) / COUNT(*), 4) AS frac
        FROM bench_posts b LEFT JOIN corpus_fp c ON b.f = c.f
        GROUP BY b.doc
    """


def ensemble_near_dup_sql(
    min_votes: int = 2,
    minhash_threshold: float = 0.6,
    simhash_max_hamming: int = 6,
    winnow_min_shared: int = 16,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.dedup.ensemble_near_dup: the three family
    oracles (minhash, simhash, winnow — identical params to their
    standalone driver queries) nested as subqueries, then one grouped
    vote with the same >= min_votes cut."""
    mh = minhash_pairs_sql(
        k=5, n_hashes=32, bands=8, rows=4, threshold=minhash_threshold,
        table=table, id_col=id_col, text_col=text_col,
    )
    sh = simhash_pairs_sql(
        max_hamming=simhash_max_hamming,
        table=table, id_col=id_col, text_col=text_col,
    )
    wn = winnow_overlap_sql(
        k=8, w=4, min_shared=winnow_min_shared,
        table=table, id_col=id_col, text_col=text_col,
    )
    return f"""
        WITH u AS (
            SELECT doc_a, doc_b, 'minhash' AS fam FROM ({mh})
            UNION ALL
            SELECT doc_a, doc_b, 'simhash' AS fam FROM ({sh})
            UNION ALL
            SELECT doc_a, doc_b, 'winnow' AS fam FROM ({wn})
        ),
        v AS (
            SELECT doc_a, doc_b,
                   MAX(fam = 'minhash') AS by_minhash,
                   MAX(fam = 'simhash') AS by_simhash,
                   MAX(fam = 'winnow') AS by_winnow
            FROM u GROUP BY doc_a, doc_b
        )
        SELECT doc_a, doc_b, by_minhash, by_simhash, by_winnow,
               CAST(CAST(by_minhash AS INT) + CAST(by_simhash AS INT)
                    + CAST(by_winnow AS INT) AS BIGINT) AS votes
        FROM v
        WHERE CAST(by_minhash AS INT) + CAST(by_simhash AS INT)
              + CAST(by_winnow AS INT) >= {int(min_votes)}
    """


def pack_interleaved_sql(max_tokens: int = 64, media_tokens: int = 32,
                         table: str = "documents", id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """Mirror of operators.corpus.pack_interleaved_spans over the same
    derived interleaved corpus as q_pack_interleaved (text halves, media
    span on id % 3 == 0, link span on id % 5 == 0). The greedy fold is a
    per-document linear recursion over span ordinals (the Spark side
    folds row-locally with `aggregate`)."""
    L, M = int(max_tokens), int(media_tokens)
    return f"""
        WITH RECURSIVE d AS (
            SELECT {id_col} AS doc,
                   regexp_replace(lower(COALESCE({text_col}, '')),
                                  '\\s+', ' ', 'g') AS t
            FROM {table}
        ),
        raw AS (
            SELECT doc, 0 AS off, 'text' AS kind,
                   substr(t, 1, CAST(floor(length(t) / 2) AS INT)) AS txt
            FROM d
            UNION ALL
            SELECT doc, 1, 'media', NULL FROM d WHERE doc % 3 = 0
            UNION ALL
            SELECT doc, 2, 'text',
                   substr(t, CAST(floor(length(t) / 2) AS INT) + 1)
            FROM d
            UNION ALL
            SELECT doc, 3, 'link', NULL FROM d WHERE doc % 5 = 0
        ),
        sp AS (
            SELECT doc, kind,
                   ROW_NUMBER() OVER (PARTITION BY doc ORDER BY off) AS ord,
                   CAST(CASE
                       WHEN kind = 'media' THEN {M}
                       WHEN kind = 'link' THEN 1
                       WHEN txt IS NULL OR trim(txt) = '' THEN 0
                       ELSE len(string_split_regex(trim(txt), '\\s+'))
                   END AS BIGINT) AS cost
            FROM raw
        ),
        rec(doc, ord, kind, cost, seq, used) AS (
            SELECT doc, ord, kind, cost, CAST(0 AS BIGINT), cost
            FROM sp WHERE ord = 1
            UNION ALL
            SELECT s.doc, s.ord, s.kind, s.cost,
                   CASE WHEN r.used + s.cost > {L} THEN r.seq + 1
                        ELSE r.seq END,
                   CASE WHEN r.used + s.cost > {L} THEN s.cost
                        ELSE r.used + s.cost END
            FROM rec r JOIN sp s ON s.doc = r.doc AND s.ord = r.ord + 1
        )
        SELECT doc AS {id_col}, ord, kind, cost, seq FROM rec
    """


def per_source_cap_sql(cap: int = 10, table: str = "documents",
                       id_col: str = "doc_id", text_col: str = "text",
                       source_col: str = "source") -> str:
    """Mirror of operators.textprep.per_source_cap as ONE plain window
    per source — exactly what the salted two-phase rank must reproduce
    for ANY salt_buckets (the driver gate therefore also checks the
    salting's containment proof). quality_score quantizes to integer
    micro-units via the shared mirrored expression, ties break by id."""
    return f"""
        WITH s AS (
            SELECT {id_col}, {source_col} AS source,
                   CAST(FLOOR(({quality_sql(text_col)}) * 1e6) AS BIGINT)
                       AS quality_micro
            FROM {table}
        ),
        r AS (
            SELECT {id_col}, source, quality_micro,
                   CAST(row_number() OVER (
                       PARTITION BY source
                       ORDER BY quality_micro DESC, {id_col} ASC
                   ) AS BIGINT) AS src_rank
            FROM s
        )
        SELECT * FROM r WHERE src_rank <= {int(cap)}
    """


def allpairs_exact_sql(threshold_num: int = 4, threshold_den: int = 5,
                       ngram: int = 3, max_bucket_size: int = 100_000,
                       table: str = "documents", id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """Mirror of operators.dedup.allpairs_exact_pairs: same lowercase-
    alnum tokenizer, same space-joined n-grams reduced to the portable
    56-bit md5 slice, same integer-rational prefix bound / length filter
    / verify gate, same (df ASC, token ASC) rarity order, same prefix
    hot-bucket guard — every comparison is over exact integers, so the
    value hash matches exactly (the output double divides the same two
    int64s in both engines)."""
    num, den, n = int(threshold_num), int(threshold_den), int(ngram)
    gh = md5_hash56_sql(f"array_to_string(w[p:p+{n - 1}], ' ')")
    return f"""
        WITH ww AS (
            SELECT {id_col} AS doc,
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        w2 AS (
            SELECT doc, list_distinct(
                CASE WHEN len(w) >= {n} THEN
                    [{gh} for p in generate_series(1, len(w) - {n - 1})]
                ELSE [] END) AS toks
            FROM ww
        ),
        w3 AS (SELECT doc, toks, len(toks) AS nn FROM w2 WHERE len(toks) > 0),
        t AS (SELECT doc, nn, unnest(toks) AS tok FROM w3),
        dft AS (SELECT tok, COUNT(*) AS df FROM t GROUP BY tok),
        r AS (
            SELECT doc, nn, tok,
                   row_number() OVER (PARTITION BY doc
                                      ORDER BY df ASC, tok ASC) AS rk
            FROM t JOIN dft USING (tok)
        ),
        p AS (
            SELECT doc, nn, tok FROM r
            WHERE rk <= nn - ((nn * {num} + {den - 1}) // {den}) + 1
        ),
        pg AS (SELECT tok FROM p GROUP BY tok
               HAVING COUNT(*) <= {int(max_bucket_size)}),
        cand AS (
            SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                   a.nn AS n_a, b.nn AS n_b
            FROM (SELECT * FROM p JOIN pg USING (tok)) a
            JOIN (SELECT * FROM p JOIN pg USING (tok)) b USING (tok)
            WHERE a.doc < b.doc
              AND least(a.nn, b.nn) * {den} >= {num} * greatest(a.nn, b.nn)
        ),
        v AS (
            SELECT doc_a, doc_b, n_a, n_b,
                   len(list_intersect(wa.toks, wb.toks)) AS ni
            FROM cand
            JOIN w3 wa ON wa.doc = cand.doc_a
            JOIN w3 wb ON wb.doc = cand.doc_b
        )
        SELECT doc_a, doc_b,
               CAST(ni AS DOUBLE) / (n_a + n_b - ni) AS jaccard
        FROM v WHERE ni * {den} >= {num} * (n_a + n_b - ni)
    """


def semdedup_sql(
    dims: int, threshold: float = 0.95,
    n_clusters: int = 16, seed: int = 42,
    plant_every: int | None = None, max_cluster_size: int = 10_000,
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding",
    centroids=None,
) -> str:
    """Mirror of functions.similarity.semdedup_keep: same centroid
    literals (trained via train_ivf_centroids when provided, so
    bit-identical to the Spark side), same 1-indexed argmax-cosine cell
    assignment, same fail-open cluster-size guard, same within-cluster
    lower-id-wins drop rule, kept (id, cell) out. ``plant_every``
    mirrors the driver query's planted near-copies: for every id
    divisible by it, a copy at id+1_000_000 with v[1] += 0.5."""
    from pyspider_spark.functions.similarity import ivf_centroids

    if centroids is None:
        centroids = ivf_centroids(dims, n_clusters, seed)
    aug = f"SELECT {id_col} AS doc, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}"
    if plant_every:
        aug += f"""
            UNION ALL
            SELECT {id_col} + 1000000, list_concat([v[1] + 0.5], v[2:])
            FROM (SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS v FROM {table})
            WHERE {id_col} % {plant_every} = 0"""
    sims = ",\n                ".join(
        f"list_dot_product(v, {_vec_sql(c)}) / sqrt(list_dot_product(v, v))"
        for c in centroids
    )
    return f"""
        WITH aug AS (
            {aug}
        ),
        cells AS (
            SELECT doc, v, CAST(list_position(sims, list_max(sims)) AS INTEGER) AS cell
            FROM (SELECT doc, v, [
                {sims}
            ] AS sims FROM aug)
        ),
        ok AS (SELECT cell FROM cells GROUP BY cell HAVING COUNT(*) <= {max_cluster_size}),
        dups AS (
            SELECT DISTINCT b.doc
            FROM cells a
            JOIN cells b ON a.cell = b.cell AND a.doc < b.doc
            WHERE a.cell IN (SELECT cell FROM ok)
              AND list_cosine_similarity(a.v, b.v) >= {threshold}
        )
        SELECT doc AS {id_col}, cell
        FROM cells WHERE doc NOT IN (SELECT doc FROM dups)
    """


def quality_classifier_sql(
    n_buckets: int = 256, seed: int = 1607, keep_threshold_micro: int = 0,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
    weights=None,
) -> str:
    """Mirror of operators.textprep.hashed_linear_classifier: same
    tokenizer, same unigram+adjacent-bigram features, same md5-slice
    bucket hash (salt 'clf'), same integer micro-weight literals from
    clf_weights(seed), same floor(sum/n) normalization — so the value
    hash pins the classifier end to end. range(1, len) is empty for
    0/1-token docs in DuckDB, matching the Spark n>=2 guard."""
    from pyspider_spark.operators.textprep import clf_weights

    w = clf_weights(n_buckets, seed) if weights is None else weights
    wlist = "[" + ", ".join(str(int(x)) for x in w) + "]"
    bucket = f"CAST({md5_hash56_sql('f', salt='clf')} % {n_buckets} AS INTEGER)"
    return f"""
        WITH w AS (
            SELECT {id_col},
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS toks
            FROM {table}
        ),
        fe AS (
            SELECT {id_col},
                   list_concat(
                       toks,
                       list_transform(range(1, len(toks)),
                                      i -> toks[i] || '_' || toks[i + 1])
                   ) AS feats
            FROM w
        ),
        t AS (SELECT {id_col}, unnest(feats) AS f FROM fe),
        s AS (
            SELECT {id_col},
                   CAST(COUNT(*) AS BIGINT) AS n_features,
                   CAST(SUM(list_extract({wlist}, {bucket} + 1))
                        AS BIGINT) AS clf_micro_sum
            FROM t GROUP BY {id_col}
        ),
        agg AS (
            SELECT fe.{id_col},
                   CAST(COALESCE(s.n_features, 0) AS BIGINT) AS n_features,
                   CAST(COALESCE(s.clf_micro_sum, 0) AS BIGINT) AS clf_micro_sum,
                   CAST(COALESCE(FLOOR(CAST(s.clf_micro_sum AS DOUBLE)
                                       / CAST(s.n_features AS DOUBLE)), 0)
                        AS BIGINT) AS avg_clf_micro
            FROM fe LEFT JOIN s USING ({id_col})
        )
        SELECT {id_col}, n_features, clf_micro_sum, avg_clf_micro,
               avg_clf_micro >= {int(keep_threshold_micro)} AS keep
        FROM agg
    """


def training_shards_sql(
    n_shards: int = 64, seed: int = 1,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.corpus.training_shards: same md5-slice
    permutation key (salt 'shuffle:{seed}'), same modulo shard, same
    (key, id)-ordered row_number and exclusive integer token prefix sum
    per shard — all-integer arithmetic, so the value hash pins the
    whole shard layout."""
    key = md5_hash56_sql(f"CAST({id_col} AS VARCHAR)", salt=f"shuffle:{seed}")
    return f"""
        WITH base AS (
            SELECT {id_col},
                   CAST(len(regexp_extract_all(lower(COALESCE({text_col}, '')),
                                               '[a-z0-9]+')) AS BIGINT) AS n_tokens,
                   {key} AS k
            FROM {table}
        )
        SELECT {id_col},
               n_tokens,
               CAST(k % {int(n_shards)} AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY k % {int(n_shards)}
                                       ORDER BY k, {id_col}) - 1
                    AS BIGINT) AS shard_pos,
               CAST(COALESCE(SUM(n_tokens) OVER (
                        PARTITION BY k % {int(n_shards)}
                        ORDER BY k, {id_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS tok_offset
        FROM base
    """


def _dup_span_ctes(
    n: int, min_docs: int, table: str, id_col: str, text_col: str,
) -> str:
    """Shared CTE chain for the exact-substring dedup oracles: tokenize
    (same lowercase-alnum tokenizer), hash space-joined n-grams with the
    56-bit md5 slice, keep grams in >= min_docs DISTINCT docs, and merge
    overlapping-or-adjacent duplicated gram intervals per doc
    (gaps-and-islands; new island when the next duplicated start exceeds
    the previous by more than n). Ends at ``spans`` =
    (id, island, span_start, span_end, n_grams)."""
    gh = md5_hash56_sql("array_to_string(w[p:p+" + str(int(n) - 1) + "], ' ')")
    return f"""
        w AS (
            SELECT {id_col},
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS w
            FROM {table}
        ),
        flat AS (
            SELECT {id_col},
                   unnest([{{'pos': p - 1, 'gh': {gh}}}
                           for p in generate_series(1, len(w) - {int(n) - 1})],
                          recursive := true)
            FROM w WHERE len(w) >= {int(n)}
        ),
        dup AS (
            SELECT gh FROM (SELECT DISTINCT {id_col}, gh FROM flat)
            GROUP BY gh HAVING COUNT(*) >= {int(min_docs)}
        ),
        hit AS (SELECT {id_col}, pos FROM flat JOIN dup USING (gh)),
        fl AS (
            SELECT {id_col}, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                          OR pos - lag(pos) OVER w > {int(n)}
                        THEN 1 ELSE 0 END AS nw
            FROM hit
            WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
        ),
        isl AS (
            SELECT {id_col}, pos,
                   SUM(nw) OVER (PARTITION BY {id_col} ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS island
            FROM fl
        ),
        spans AS (
            SELECT {id_col}, island,
                   CAST(MIN(pos) AS BIGINT) AS span_start,
                   CAST(MAX(pos) + {int(n) - 1} AS BIGINT) AS span_end,
                   CAST(COUNT(*) AS BIGINT) AS n_grams
            FROM isl GROUP BY {id_col}, island
        )"""


def dup_substring_spans_sql(
    n: int = 10, min_docs: int = 2, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.corpus.dup_substring_spans: same tokenizer,
    same space-joined n-grams hashed with the 56-bit md5 slice, same
    >= min_docs distinct-document frequency test, same gaps-and-islands
    interval merge (new island when the next duplicated start exceeds
    the previous by more than n). All-integer output, so the value hash
    pins the exact cut list."""
    return f"""
        WITH {_dup_span_ctes(n, min_docs, table, id_col, text_col)}
        SELECT {id_col}, span_start, span_end,
               CAST(span_end - span_start + 1 AS BIGINT) AS span_tokens,
               n_grams
        FROM spans
    """


def apply_span_cuts_sql(
    n: int = 10, min_docs: int = 2, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.corpus.apply_span_cuts: every token whose
    0-based position falls inside a duplicated span (same CTE chain as
    dup_substring_spans_sql) is removed; survivors rejoin space-separated
    in original order. Docs without cuts — including empty docs — pass
    through the left join with text_cut = the full token stream."""
    return f"""
        WITH {_dup_span_ctes(n, min_docs, table, id_col, text_col)},
        toks AS (
            SELECT {id_col},
                   unnest([{{'pos': p - 1, 'tok': w[p]}}
                           for p in generate_series(1, len(w))],
                          recursive := true)
            FROM w
        ),
        kept AS (
            SELECT t.{id_col}, t.pos, t.tok
            FROM toks t
            WHERE NOT EXISTS (
                SELECT 1 FROM spans s
                WHERE s.{id_col} = t.{id_col}
                  AND t.pos BETWEEN s.span_start AND s.span_end
            )
        ),
        agg AS (
            SELECT {id_col},
                   string_agg(tok, ' ' ORDER BY pos) AS text_cut,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY {id_col}
        )
        SELECT w.{id_col},
               COALESCE(agg.text_cut, '') AS text_cut,
               CAST(len(w.w) AS BIGINT) AS n_tokens,
               CAST(len(w.w) - COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed
        FROM w LEFT JOIN agg USING ({id_col})
    """


def perplexity_buckets_sql(
    table: str = "documents", id_col: str = "doc_id",
    text_col: str = "text", lang_col: str = "lang",
) -> str:
    """Mirror of operators.textprep.perplexity_buckets: the per-doc
    integer avg_lp_micro comes from the unigram_logprob construction,
    and the bucket is the same ties-inclusive descending cumulative
    count test (3*cume <= total -> head, <= 2*total -> middle, else
    tail). DuckDB's RANGE frame over ORDER BY ... DESC includes ties,
    which is exactly the histogram-CDF cume the Spark plan computes."""
    lp = unigram_logprob_sql(table=table, id_col=id_col, text_col=text_col)
    return f"""
        WITH lp AS ({lp}),
        j AS (
            SELECT d.{id_col},
                   COALESCE(d.{lang_col}, '') AS lang,
                   lp.avg_lp_micro
            FROM {table} d JOIN lp USING ({id_col})
        ),
        c AS (
            SELECT {id_col}, lang, avg_lp_micro,
                   SUM(1) OVER (PARTITION BY lang ORDER BY avg_lp_micro DESC
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cume,
                   COUNT(*) OVER (PARTITION BY lang) AS total
            FROM j
        )
        SELECT {id_col}, lang, avg_lp_micro,
               CASE WHEN cume * 3 <= total THEN 'head'
                    WHEN cume * 3 <= total * 2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM c
    """


def gopher_rules_sql(
    min_words: int = 50, max_words: int = 100_000, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text",
    keep_cols: tuple = (),
) -> str:
    """Mirror of operators.textprep.gopher_rules: whitespace-token words,
    trimmed non-empty lines, the same non-overlapping replace-based
    symbol counts, and the same all-integer rule tests, so booleans and
    counts hash identically."""
    stop = ", ".join(f"'{s}'" for s in
                     ("the", "be", "to", "of", "and", "that", "have", "with"))
    kc = "".join(f"{c}, " for c in keep_cols)
    return f"""
        WITH base AS (
            SELECT {id_col}, {kc}
                   COALESCE({text_col}, '') AS t,
                   list_filter(string_split_regex(COALESCE({text_col}, ''),
                                                  '\\s+'),
                               x -> x <> '') AS words,
                   list_filter(list_transform(
                                   string_split(COALESCE({text_col}, ''),
                                                chr(10)),
                                   x -> trim(x)),
                               x -> x <> '') AS lines,
                   regexp_extract_all(lower(COALESCE({text_col}, '')),
                                      '[a-z0-9]+') AS toks
            FROM {table}
        ),
        counted AS (
            SELECT {id_col}, {kc}
                   CAST(len(words) AS BIGINT) AS n_words,
                   CAST(COALESCE(list_aggregate(
                            list_transform(words, x -> length(x)), 'sum'),
                        0) AS BIGINT) AS n_chars,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST((length(t) - length(replace(t, '#', '')))
                        + (length(t) - length(replace(t, '...', ''))) / 3
                        + (length(t) - length(replace(t, '…', '')))
                        AS BIGINT) AS n_symbols,
                   CAST(len(list_filter(lines,
                            l -> starts_with(l, '-') OR starts_with(l, '*')
                                 OR starts_with(l, '•')))
                        AS BIGINT) AS n_bullet_lines,
                   CAST(len(list_filter(lines,
                            l -> ends_with(l, '...') OR ends_with(l, '…')))
                        AS BIGINT) AS n_ellipsis_lines,
                   CAST(len(list_filter(words,
                            x -> regexp_matches(x, '[A-Za-z]')))
                        AS BIGINT) AS n_alpha_words,
                   CAST(len(list_intersect(list_distinct(toks),
                                           [{stop}]))
                        AS BIGINT) AS n_stopwords_present
            FROM base
        ),
        rules AS (
            SELECT *,
                   (n_words >= {int(min_words)} AND n_words <= {int(max_words)})
                       AS r_word_count,
                   (3 * n_words <= n_chars AND n_chars <= 10 * n_words)
                       AS r_mean_word_len,
                   (10 * n_symbols <= n_words) AS r_symbol_ratio,
                   (10 * n_bullet_lines <= 9 * n_lines) AS r_bullet,
                   (10 * n_ellipsis_lines <= 3 * n_lines) AS r_ellipsis,
                   (5 * n_alpha_words >= 4 * n_words) AS r_alpha,
                   (n_stopwords_present >= 2) AS r_stopwords
            FROM counted
        )
        SELECT *,
               (r_word_count AND r_mean_word_len AND r_symbol_ratio
                AND r_bullet AND r_ellipsis AND r_alpha AND r_stopwords)
                   AS keep
        FROM rules
    """


def incremental_minhash_sql(
    k: int, n_hashes: int, bands: int, rows: int, threshold: float,
    max_bucket_size: int = 1000, split_mod: int = 5,
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text",
) -> str:
    """Mirror of operators.dedup.incremental_minhash_pairs with the
    driver's deterministic increment split (md5-slice of the stringified
    id mod ``split_mod`` == 0 -> NEW): same shingles, same universal-hash
    signatures, same banding, hot-bucket guard on the OLD side only, and
    the same unrounded-filter-then-round Jaccard verify."""
    from pyspider_spark.operators.dedup import MERSENNE31, minhash_coeffs

    base_h = f"({md5_hash56_sql('shingle')} % {MERSENNE31})"
    mins = ",\n                   ".join(
        f"MIN(({a} * h + {b}) % {MERSENNE31}) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
    )
    band_selects = "\n            UNION ALL ".join(
        "SELECT doc, is_new, {b} AS band, {bh} AS bh FROM sig".format(
            b=b,
            bh=md5_hash56_sql(
                " || '|' || ".join(
                    f"CAST(h{b * rows + r} AS VARCHAR)" for r in range(rows)
                )
            ),
        )
        for b in range(bands)
    )
    is_new = f"(({md5_hash56_sql(f'CAST({id_col} AS VARCHAR)')}) % {split_mod}) = 0"
    return f"""
        WITH docs AS (
            SELECT {id_col} AS doc,
                   regexp_replace(lower({text_col}), '\\s+', ' ', 'g') AS t,
                   {is_new} AS is_new
            FROM {table}
        ),
        sh AS (
            SELECT DISTINCT doc, is_new,
                   substr(t, CAST(pos AS INTEGER), {k}) AS shingle
            FROM (SELECT doc, is_new, t,
                         unnest(range(1, greatest(length(t) - {k - 1}, 1) + 1)) AS pos
                  FROM docs)
        ),
        sig AS (
            SELECT doc, is_new, {mins}
            FROM (SELECT doc, is_new, {base_h} AS h FROM sh)
            GROUP BY doc, is_new
        ),
        banded AS (
            {band_selects}
        ),
        sized AS (
            SELECT band, bh, COUNT(*) AS n FROM banded
            WHERE NOT is_new GROUP BY 1, 2
        ),
        ok_old AS (
            SELECT b.doc, b.band, b.bh FROM banded b
            JOIN sized s ON b.band = s.band AND b.bh = s.bh
            WHERE NOT b.is_new AND s.n <= {max_bucket_size}
        ),
        raw_pairs AS (
            SELECT DISTINCT n.doc AS doc_new, o.doc AS doc_old
            FROM (SELECT doc, band, bh FROM banded WHERE is_new) n
            JOIN ok_old o ON n.band = o.band AND n.bh = o.bh
        ),
        sizes AS (
            SELECT doc, is_new, COUNT(*) AS n_sh FROM sh GROUP BY doc, is_new
        ),
        inter AS (
            SELECT p.doc_new, p.doc_old, COUNT(*) AS n_inter
            FROM raw_pairs p
            JOIN sh sa ON sa.doc = p.doc_new AND sa.is_new
            JOIN sh sb ON sb.doc = p.doc_old AND NOT sb.is_new
                      AND sb.shingle = sa.shingle
            GROUP BY 1, 2
        ),
        j AS (
            SELECT i.doc_new, i.doc_old,
                   CAST(i.n_inter AS DOUBLE)
                       / (za.n_sh + zb.n_sh - i.n_inter) AS jaccard
            FROM inter i
            JOIN sizes za ON za.doc = i.doc_new AND za.is_new
            JOIN sizes zb ON zb.doc = i.doc_old AND NOT zb.is_new
        )
        SELECT doc_new, doc_old, ROUND(jaccard, 4) AS jaccard
        FROM j WHERE jaccard >= {threshold}
    """


def domain_curation_sql(
    min_docs: int = 5, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text", domain_col: str = "source",
) -> str:
    """Mirror of operators.textprep.domain_curation: the per-doc Gopher
    gate (gopher_rules_sql with pass-through domain + fingerprint
    columns) aggregated per domain with the same all-integer keep tests.
    The fingerprint expression matches the dedup_exact oracle."""
    staged = (
        f"(SELECT {id_col}, {text_col}, "
        f"COALESCE({domain_col}, '') AS _domain, "
        f"md5(regexp_replace(lower(trim({text_col})), '\\s+', ' ', 'g')) AS _fp "
        f"FROM {table}) staged"
    )
    g = gopher_rules_sql(
        table=staged, id_col=id_col, text_col=text_col,
        keep_cols=("_domain", "_fp"),
    )
    return f"""
        WITH g AS ({g})
        SELECT _domain AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_gopher_keep,
               CAST(COUNT(DISTINCT _fp) AS BIGINT) AS n_distinct_fp,
               (COUNT(*) >= {int(min_docs)}
                AND 2 * SUM(CASE WHEN keep THEN 1 ELSE 0 END) >= COUNT(*)
                AND 10 * COUNT(DISTINCT _fp) >= 9 * COUNT(*)) AS keep_domain
        FROM g GROUP BY _domain
    """
