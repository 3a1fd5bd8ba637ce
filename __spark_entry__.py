"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2 (frontier/scheduling semantics mapped onto the driver's
TPC-H-ish tables per FIXTURES.md §8, plus the training-data extras:
dedup / text analysis / similarity / multimodal). ``oracle_sql()`` gives
a DuckDB oracle for EVERY query — zero rows-only entries: hash-keyed
pipelines (minhash/simhash/LSH/IVF) via engine-portable md5-slice
hashing, the flagship crawl via a pure-Python XXH64 graph rebuild +
ReferenceSim replay emitted as a VALUES literal, and the multimodal
stubs recomputed end-to-end inside DuckDB.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"

# deterministic ANN query vector (seed 7), dim 64 — literal in both engines
import numpy as np

_QUERY_VEC = [round(float(x), 6) for x in np.random.RandomState(7).randn(64)]


def _t(spark: SparkSession, sf_dir: str, name: str, spread: bool | None = None) -> DataFrame:
    """Read a testdata table. ``spread``: the CPU-heavy text/vector tables
    (documents, embeddings) ship as ONE parquet row group locally, so the
    whole scan stage — and with it every row-local kernel (shingling,
    signature transforms, gram hashing) up to the first exchange — runs as
    ONE task no matter the core count (guide §2.5 "input skew: one huge
    unsplittable file ... repartition immediately after the read"). When
    the scan yields fewer splits than cores, round-robin repartition to
    the core count; at cluster scale input files outnumber cores and this
    is a no-op, so the rule is scale-adaptive, not a local[32] constant.
    PageRank opts out (spread=False): its per-iteration double sums are
    the one documents consumer whose low-order float bits depend on
    partial-aggregation order."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread is None:
        spread = name in ("documents", "embeddings")
    if spread:
        cores = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < cores:
            df = df.repartition(cores)
    return df


# ADVICE r03 (medium): the flagship/multimodal oracles are VALUES literals
# generated for ONE corpus dir. The gate compares them against the query
# run at whatever sf_dir the harness passes — if the two dirs ever differ,
# fail loudly instead of silently comparing against the wrong corpus.
_ORACLE_STATE: dict = {"generated_for": None, "last_query_sf": None}


def _oracle_sf() -> str:
    """Corpus dir the literal oracles are generated for: an explicit env
    override wins; else the dir the literal-oracled queries last ran
    against in this process; else the driver's sf0.01 gate default."""
    sf = (
        os.environ.get("SPARK_GRAFT_ORACLE_SF")
        or _ORACLE_STATE["last_query_sf"]
        or "/root/testdata/sf0.01"
    )
    _ORACLE_STATE["generated_for"] = sf
    return sf


def _literal_oracle_guard(sf_dir: str) -> None:
    gen = _ORACLE_STATE["generated_for"]
    if gen is not None and os.path.normpath(gen) != os.path.normpath(sf_dir):
        raise RuntimeError(
            f"oracle literals were generated for {gen} but this query is "
            f"executing against {sf_dir}; the side-by-side gate would "
            f"compare mismatched corpora. Run the query and oracle_sql() "
            f"against the same sf_dir (or set SPARK_GRAFT_ORACLE_SF)."
        )
    _ORACLE_STATE["last_query_sf"] = sf_dir


# ---------------------------------------------------------------------------
# flagship: a real crawl over the interleaved corpus derived from testdata
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: derive an interleaved-span corpus from sf0.001 documents,
    crawl it (rank-select → fetch-join → span extraction → dedup →
    frontier merge) and return the crawled results."""
    return crawl_flagship(spark, SF001, max_rounds=3)


def crawl_flagship(spark: SparkSession, sf_dir: str, max_rounds: int = 3) -> DataFrame:
    from pyspider_spark.plans.crawl import crawl
    from pyspider_spark.plans.round import RoundConfig
    from pyspider_spark.synth import interleave_from_testdata, synth_seeds

    docs = interleave_from_testdata(spark, sf_dir, show=5, hosts=4)
    total = docs.count()
    seeds = synth_seeds(spark, total=total, hosts=4, n_seeds=8)
    cfg = RoundConfig(
        projects={"bench": {"rate": 1e9, "burst": 1e9,
                            "retry_delay": {0: 30, 1: 3600, 2: 21600, 3: 43200, "": 86400}}},
        loop_limit=100000,
    )
    report = crawl(spark, seeds, docs, cfg, robots=None, max_rounds=max_rounds)
    return report.frontier.select(
        "taskid", "url", "host", "status",
        F.col("schedule").priority.alias("priority"),
        F.col("track").fetch.status_code.alias("status_code"),
        F.col("round_no").alias("round_no"),
    )


# ---------------------------------------------------------------------------
# scheduling-semantics operators on the TPC-H-ish tables (FIXTURES.md §8)
# ---------------------------------------------------------------------------

def q_f1_rank_select(spark, sf):
    """F1/F8: priority-band rank-select (window row_number, keep top 10)."""
    w = Window.partitionBy("o_orderpriority").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        _t(spark, sf, "orders")
        .withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= 10)
        .select("o_orderpriority", "pick_rank", "o_orderkey", "o_orderdate")
    )


def q_f2_merge_on_put(spark, sf):
    """F2: merge-on-put aggregation (max priority, min exetime, min seq)."""
    return (
        _t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_date"),
            F.min("o_orderkey").alias("first_seq"),
            F.count("*").alias("n_puts"),
        )
    )


def q_f6_token_bucket(spark, sf):
    """F6: per-group quota = least(ready_count, floor(tokens)) — computed
    by the REAL politeness.round_quotas/Bucket code (each priority class
    is a project with burst 150.7), so a bucket regression turns this
    driver row red."""
    from pyspider_spark.operators import politeness

    counts = {
        r["o_orderpriority"]: r["n"]
        for r in _t(spark, sf, "orders")
        .groupBy("o_orderpriority").agg(F.count("*").alias("n")).collect()
    }
    cfgs = {p: {"rate": 0.0, "burst": 150.7} for p in counts}
    quotas = politeness.round_quotas(
        politeness.BudgetState(), cfgs, counts, now=0.0, loop_limit=1 << 40
    )
    rows = [(p, int(n), min(int(n), quotas[p])) for p, n in counts.items()]
    return spark.createDataFrame(
        rows, "o_orderpriority string, n_ready long, quota long"
    )


def q_f8_fair_share(spark, sf):
    """F8: weighted fair-share clamps — computed by the REAL
    politeness.fair_share_limits (scheduler.py:500-522 math)."""
    from pyspider_spark.operators import politeness

    counts = {
        r["o_orderpriority"]: r["w"]
        for r in _t(spark, sf, "orders")
        .groupBy("o_orderpriority").agg(F.count("*").alias("w")).collect()
    }
    limits = politeness.fair_share_limits(counts, loop_limit=1000)
    rows = [(p, int(w), int(limits[p])) for p, w in counts.items()]
    return spark.createDataFrame(rows, "o_orderpriority string, w long, share long")


def q_f9_urlseen_antijoin(spark, sf):
    """F9: URL-seen check = left anti join (customers with no orders)."""
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q_f9b_urlseen_cuckoo(spark, sf):
    """F9 routed through the delete-capable sharded cuckoo prefilter (the
    north rule's 'bloom/cuckoo' pair, urlseen.ShardedCuckoo): the seen set
    (custkeys with orders) is learned into the filter; candidates split on
    it; definitely-new rows skip the join, maybe-seen rows take the exact
    anti-join. The no-false-negative contract makes the final answer
    identical to the plain anti-join, so the oracle is plain SQL. The seen
    set is the 'O'-status custkeys (a strict subset) so the split is
    non-vacuous: ~3% of candidates really are new."""
    from pyspider_spark.operators.urlseen import ShardedCuckoo

    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("taskid"), "c_custkey", "c_name"
    )
    seen = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").cast("string").alias("taskid"))
        .distinct()
    )
    ck = ShardedCuckoo(n_shards=8, expected_per_shard=1 << 15)
    ck.add_df(seen)
    new, maybe = ck.split_candidates(c)
    return new.unionByName(maybe.join(seen, "taskid", "left_anti")).select(
        "c_custkey", "c_name"
    )


def q_f9c_urlseen_stored(spark, sf):
    """F9 routed through the STORAGE-resident sharded filter
    (urlseen.StoredFilter, the 10^10-key posture): filter state lives as
    a (shard, table, stash) parquet table — 64 shards here — and both the
    build and the probe are shard-cogrouped jobs where no process ever
    holds more than one shard's bytes. Same no-false-negative contract,
    so the exact anti-join on the maybe side makes the answer plain SQL:
    unseen = customers with no 'F'-status order."""
    import tempfile

    from pyspider_spark.operators.urlseen import StoredFilter

    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("taskid"), "c_custkey", "c_name"
    )
    seen = (
        _t(spark, sf, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").cast("string").alias("taskid"))
        .distinct()
    )
    # one temp state dir per process (warm-up + trials re-invoke this fn);
    # re-adding the seen set is idempotent and version pruning bounds disk
    key = ("f9c_dir", os.path.normpath(sf))
    if key not in _ORACLE_STATE:
        _ORACLE_STATE[key] = tempfile.mkdtemp(prefix="urlseen_stored_")
    flt = StoredFilter(
        spark, _ORACLE_STATE[key], kind="bloom",
        n_shards=64, expected_per_shard=1 << 12,
    )
    flt.add_df(seen)
    new, maybe = flt.split_candidates(c)
    return new.unionByName(maybe.join(seen, "taskid", "left_anti")).select(
        "c_custkey", "c_name"
    )


def q_f7_project_delete(spark, sf):
    """F7 at project granularity against the cuckoo URL-seen
    (scheduler.py:630-647 _check_delete -> taskdb.drop + unlearn): every
    custkey with an order is learned; the 'deleted project' owns the
    custkeys with no 'P'-status order, and exactly those are unlearned via
    delete_df (the crawl's 'no other project still holds it' rule); the
    surviving seen set is then re-added (the idempotent alias repair,
    mirroring plans/crawl.py). Candidates re-route through
    split_candidates + exact anti-join — the final now-unseen set must
    equal the SQL oracle."""
    from pyspider_spark.operators.urlseen import ShardedCuckoo

    o = _t(spark, sf, "orders").select(
        F.col("o_custkey").cast("string").alias("taskid"), "o_orderstatus"
    )
    all_seen = o.select("taskid").distinct()
    surviving = o.where(F.col("o_orderstatus") == "P").select("taskid").distinct()
    doomed = all_seen.join(surviving, "taskid", "left_anti")

    ck = ShardedCuckoo(n_shards=8, expected_per_shard=1 << 15)
    ck.add_df(all_seen)
    ck.delete_df(doomed)
    ck.add_df(surviving)  # alias repair

    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").cast("string").alias("taskid"), "c_custkey", "c_name"
    )
    new, maybe = ck.split_candidates(c)
    return new.unionByName(maybe.join(surviving, "taskid", "left_anti")).select(
        "c_custkey", "c_name"
    )


def q_f10_restart_rules(spark, sf):
    """F10: restart rules per order, via the REAL frontier.restart_flags /
    restart_reason_label builders (itag > age > force_update precedence).
    Mapping: status P = changed itag; status O + pre-1995 = age expired
    (age 0, last crawl at epoch 0, now 1); price > 400k = force_update."""
    from pyspider_spark.operators.frontier import restart_flags, restart_reason_label

    o = _t(spark, sf, "orders").withColumn(
        "schedule",
        F.struct(
            F.when(F.col("o_orderstatus") == "P", F.lit("changed"))
            .otherwise(F.lit("same")).alias("itag"),
            F.when(
                (F.col("o_orderstatus") == "O")
                & (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp")),
                F.lit(0),
            ).otherwise(F.lit(-1)).cast("long").alias("age"),
            (F.col("o_totalprice") > 400000).alias("force_update"),
        ),
    ).withColumn(
        "old_schedule", F.struct(F.lit("same").alias("itag"))
    )
    itag_changed, age_expired, fu = restart_flags(
        F.col("schedule"), F.col("old_schedule"), F.lit(0.0), now=1.0
    )
    label = restart_reason_label(itag_changed, age_expired, fu)
    return o.groupBy(label.alias("restart_reason")).agg(F.count("*").alias("n"))


def q_f13_retry_ladder(spark, sf):
    """F13: retry-delay ladder via the REAL frontier.ladder_delay_expr
    (the expression apply_outcomes uses)."""
    from pyspider_spark.operators.frontier import DEFAULT_RETRY_DELAY, ladder_delay_expr

    li = _t(spark, sf, "lineitem").withColumn("retried", F.col("l_linenumber") - 1)
    delay = ladder_delay_expr(F.col("retried"), DEFAULT_RETRY_DELAY).cast("long")
    status = F.when(F.col("retried") >= 3, F.lit("FAILED")).otherwise(F.lit("RETRY"))
    return (
        li.select(delay.alias("delay"), status.alias("status"))
        .groupBy("delay", "status")
        .agg(F.count("*").alias("n"))
    )


def q_f19_inqueue_limit(spark, sf):
    """F19: per-project overflow drop via the REAL
    frontier.inqueue_headroom_cut (keep first 2 per custkey by arrival)."""
    from pyspider_spark.operators.frontier import inqueue_headroom_cut

    kept = inqueue_headroom_cut(
        _t(spark, sf, "orders"), {}, key_col="o_custkey",
        order_by=(F.asc("o_orderdate"), F.asc("o_orderkey")), default=2,
    )
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        kept.withColumn("rk", F.row_number().over(w))
        .select("o_custkey", "rk", "o_orderkey")
    )


def q_f23_status_counts(spark, sf):
    """F23/M1: status-count bootstrap (GROUP BY status)."""
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def q_f20_config_join(spark, sf):
    """F20: crawl_config broadcast join + coalesce defaults."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .select(F.coalesce(F.col("c_mktsegment"), F.lit("DEFAULT")).alias("segment"))
        .groupBy("segment")
        .agg(F.count("*").alias("n"))
    )


def q_f11_follows_dedup(spark, sf):
    """F11/F12: in-batch dedup = dropDuplicates on the key."""
    return _t(spark, sf, "events").select("user_id", "event_type").dropDuplicates()


def q_r1_result_latest(spark, sf):
    """R1: result upsert = latest write per key wins."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        _t(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


def q_r2_select_page(spark, sf):
    """R2: paginated result select via the REAL results.select_results
    (latest-wins dedup + rank-slice page) — events as the result log:
    taskid=user, updatetime=event_id (unique ⇒ deterministic ties)."""
    from pyspider_spark.operators.results import select_results

    log = _t(spark, sf, "events").select(
        F.col("user_id").cast("string").alias("taskid"),
        F.col("event_type").alias("project"),
        F.concat(F.lit("u://"), F.col("user_id").cast("string")).alias("url"),
        F.lit("{}").alias("result"),
        F.col("event_id").cast("double").alias("updatetime"),
    )
    page = select_results(log, "click", offset=20, limit=20)
    return page.select("project", "taskid", "url", "updatetime")


def q_r5_active_topk(spark, sf):
    """R5: active-task view = global top-k by recency."""
    return (
        _t(spark, sf, "events")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(100)
        .select("event_id", "ts", "event_type")
    )


def q_m2_windowed_counters(spark, sf):
    """M2: time-window counters (hourly tumbling sum/avg)."""
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "avg_value")
    )


def q_filter_pushdown(spark, sf):
    """Projection/filter pushdown path (P2-style field projection)."""
    return (
        _t(spark, sf, "events")
        .where((F.col("event_type") == "click") & (F.col("value") > 50))
        .select("event_id", "user_id", F.round("value", 4).alias("value"))
    )


# ---------------------------------------------------------------------------
# training-data extras: text / dedup / similarity / multimodal
# ---------------------------------------------------------------------------

def q_text_token_stats(spark, sf):
    from pyspider_spark.functions.text import token_count

    d = _t(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum(token_count(F.col("text"))).alias("tokens"),
            F.sum("n_chars").alias("chars"),
        )
    )


def q_text_quality(spark, sf):
    from pyspider_spark.functions.text import quality_score

    d = _t(spark, sf, "documents")
    bucket = F.floor(quality_score(F.col("text")) * 10).cast("long")
    return d.groupBy(bucket.alias("q_bucket")).agg(F.count("*").alias("n"))


def q_lang_id(spark, sf):
    from pyspider_spark.functions.text import lang_guess

    d = _t(spark, sf, "documents")
    return (
        d.groupBy(F.col("lang").alias("labeled"), lang_guess(F.col("text")).alias("guessed"))
        .agg(F.count("*").alias("n"))
    )


def q_dedup_exact(spark, sf):
    from pyspider_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf, "documents")).select("fp", "canonical_id", "dup_count")


def q_dedup_minhash(spark, sf):
    """MinHash+LSH near-dup pairs (portable md5-slice signatures; DuckDB
    oracle mirrors the full pipeline via oracles.minhash_pairs_sql)."""
    from pyspider_spark.operators.dedup import minhash_dedup

    return minhash_dedup(
        _t(spark, sf, "documents"), k=5, n_hashes=32, bands=8, rows=4, threshold=0.6
    ).select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))


def q_incremental_minhash(spark, sf):
    """Incremental fuzzy dedup: the 20% increment (md5(doc_id) % 5 == 0)
    probes the 80% archive's LSH band table — the old corpus is never
    self-joined or re-paired, so per-snapshot cost scales with the
    increment, not the archive."""
    from pyspider_spark.functions.portable_hash import md5_hash56
    from pyspider_spark.operators.dedup import incremental_minhash_pairs

    docs = _t(spark, sf, "documents")
    is_new = (md5_hash56(F.col("doc_id").cast("string")) % 5) == 0
    return incremental_minhash_pairs(
        docs.where(is_new), docs.where(~is_new),
        k=5, n_hashes=32, bands=8, rows=4, threshold=0.6,
    )


def q_dedup_cluster(spark, sf):
    """Near-dup clusters: minhash pairs → connected components
    (large-star/small-star, O(log n) rounds) → (doc, component-min).
    Oracle computes the same closure via recursive reachability."""
    from pyspider_spark.operators.dedup import connected_components, minhash_dedup

    pairs = minhash_dedup(
        _t(spark, sf, "documents"), k=5, n_hashes=32, bands=8, rows=4, threshold=0.6
    )
    return connected_components(pairs)


def q_leakage_split(spark, sf):
    """Leakage-safe train/val/test split: the split is hashed from the
    near-dup COMPONENT (minhash pairs -> connected components), so near-
    duplicate docs can never straddle splits (eval contamination)."""
    from pyspider_spark.operators.dedup import leakage_safe_split

    return leakage_safe_split(
        _t(spark, sf, "documents"),
        fractions=(0.9, 0.05, 0.05),
        k=5, n_hashes=32, bands=8, rows=4, threshold=0.6,
    )


def q_dedup_keep_best(spark, sf):
    """Quality-aware keep-one-per-cluster retention: minhash near-dup
    components, winner = argmax (quality_micro, -id) per component —
    broadcast-only on the corpus side (plan-tested)."""
    from pyspider_spark.operators.dedup import dedup_keep_best, minhash_dedup

    docs = _t(spark, sf, "documents")
    pairs = minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4, threshold=0.6)
    return dedup_keep_best(docs, pairs)


def q_corpus_clean(spark, sf):
    """End-to-end training-corpus cleaning: lang gate → quality gate →
    exact dedup → near-dup clustering with one canonical kept per
    cluster. Every stage mirrored in one DuckDB oracle query."""
    from pyspider_spark.operators.clean import corpus_clean

    return corpus_clean(_t(spark, sf, "documents"))


def q_pagerank(spark, sf):
    """PageRank over the deterministic synthetic doc link graph (10 fixed
    power iterations, damping 0.85, dangling mass redistributed). Oracle
    unrolls the same iterations as materialized DuckDB CTEs."""
    from pyspider_spark.operators.graph import doc_pagerank

    return doc_pagerank(_t(spark, sf, "documents", spread=False))


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "zh": 0.1}


def q_repetition_stats(spark, sf):
    """Gopher-style repetition metrics per document: duplicate-line /
    duplicate-paragraph fractions (row-local array expressions) and the
    top word-2-gram slot fraction (explode -> map-side-combined groupBy
    -> per-doc max). Rae et al. 2021 App. A1.1 semantics."""
    from pyspider_spark.operators.textprep import repetition_stats

    return repetition_stats(_t(spark, sf, "documents"))


def q_pii_scrub(spark, sf):
    """PII redaction counts (email, phone, ipv4 — fixed order, each class
    counted on the previous class's redacted text) + md5 fingerprint of
    the scrubbed text. Pure regexp expressions, zero shuffle."""
    from pyspider_spark.operators.textprep import scrub_pii

    return scrub_pii(_t(spark, sf, "documents"))


def q_stratified_sample(spark, sf):
    """Deterministic per-language Bernoulli sample (domain-mix rebalance):
    keep iff md5_hash56('sample' || id) mod 1e6 < rate(lang) * 1e6 —
    reproducible across engines/runs/partitionings, pushdown-able."""
    from pyspider_spark.operators.textprep import stratified_sample

    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    return stratified_sample(docs, SAMPLE_RATES, stratum_col="lang")


def q_tfidf_topk(spark, sf):
    """Top-3 TF-IDF terms per document (score = tf * ln(N/df), term-asc
    tie-break). Document frequency is a vocabulary-sized aggregate
    broadcast back onto the doc-keyed term counts."""
    from pyspider_spark.operators.textprep import tfidf_topk

    return tfidf_topk(_t(spark, sf, "documents"), k=3, min_df=2)


# synthetic boilerplate wrapped around every corpus doc (the corpus texts
# carry no newlines, so the hot-line detector needs planted template
# lines) — the oracle SQL wraps identically via text_expr
_BOILER_HEADER = "==site-nav | home | search=="
_BOILER_FOOTER = "==footer | contact | terms=="
# target language mixture for the rebalance queries (corpus is en-heavy:
# en upsample-flagged strata stay weight>1, zh/es get subsampled)
_MIX_TARGETS = {"en": 0.3, "de": 0.25, "zh": 0.15, "fr": 0.2, "es": 0.1}


def q_boilerplate_strip(spark, sf):
    """CCNet-style line-frequency boilerplate removal: lines in >= 5
    distinct docs (here: the planted nav/footer wrapped around every doc)
    strip from all of them; rejoin preserves original line order. Hot set
    is tiny by construction -> broadcast anti-join; reassembly is one
    doc-keyed groupBy with a row-local array_sort (no window)."""
    from pyspider_spark.operators.corpus import strip_boilerplate

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_BOILER_HEADER + "\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\n" + _BOILER_FOOTER),
        ).alias("text"),
    )
    return strip_boilerplate(docs, min_docs=5)


def q_ngram_contamination(spark, sf):
    """GPT-3/Llama-2 style benchmark decontamination: distinct word
    8-grams of each doc vs the gram set of a deterministic benchmark
    slice (doc_id % 97 == 0). Benchmark grams reduce to broadcast 56-bit
    hashes; the corpus side explodes thin (doc, hash) longs only."""
    from pyspider_spark.operators.corpus import ngram_contamination

    docs = _t(spark, sf, "documents")
    return ngram_contamination(
        docs, docs.where(F.col("doc_id") % 97 == 0), n=8, min_hits=1
    )


def q_pack_sequences(spark, sf):
    """Concat-and-chunk sequence packing via a two-phase distributed
    prefix sum (bucketed cumsum + broadcast bucket offsets) — the oracle
    is the single global window cumsum, so the gate also proves the
    bucketing is span-invariant."""
    from pyspider_spark.operators.corpus import pack_sequences

    return pack_sequences(_t(spark, sf, "documents"), max_tokens=2048, bucket_span=64)


def q_training_shards(spark, sf):
    """Deterministic training-shard writer layout: every document lands
    in one of 16 shards under a seeded md5-slice permutation (a
    reproducible global shuffle — no RNG), with its in-shard position
    and exclusive token offset. One hash exchange + one per-shard sort;
    no global ordering anywhere."""
    from pyspider_spark.operators.corpus import training_shards

    return training_shards(_t(spark, sf, "documents"), n_shards=16)


def q_dup_substring_spans(spark, sf):
    """Maximal cross-document duplicated token spans (the Lee et al.
    2021 exact-substring cut list, fixed 10-gram granularity):
    gram-hash doc frequency >= 2 distinct docs, overlapping-or-adjacent
    duplicated gram intervals merged per doc via gaps-and-islands.
    Corpus x corpus — nothing broadcasts; the island merge windows per
    doc only."""
    from pyspider_spark.operators.corpus import dup_substring_spans

    return dup_substring_spans(_t(spark, sf, "documents"), n=10, min_docs=2)


def q_perplexity_buckets(spark, sf):
    """CCNet-style head/middle/tail terciles per language by unigram-LM
    score (Wenzek et al. 2019): ties-inclusive descending cume over a
    (lang, score) histogram — never a corpus-wide per-language window —
    with all-integer bucket tests."""
    from pyspider_spark.operators.textprep import perplexity_buckets

    return perplexity_buckets(_t(spark, sf, "documents"))


def q_apply_span_cuts(spark, sf):
    """The APPLICATION half of exact-substring dedup: remove every token
    inside a dup_substring_spans cut range, rejoin survivors in order.
    Cut lists aggregate to one row per affected doc and join back
    doc-keyed; the edit itself is a row-local filter-with-index — no
    token explode, no window."""
    from pyspider_spark.operators.corpus import apply_span_cuts

    return apply_span_cuts(_t(spark, sf, "documents"), n=10, min_docs=2)


def q_gopher_rules(spark, sf):
    """The seven document-level Gopher quality rules (Rae et al. 2021
    App. A1.1) as all-integer row-local expressions — zero shuffle, a
    free rider on the text scan; repetition rules live in
    repetition_stats."""
    from pyspider_spark.operators.textprep import gopher_rules

    return gopher_rules(_t(spark, sf, "documents"))


def q_domain_curation(spark, sf):
    """Domain-level curation (RefinedWeb/C4-style source gating): per-doc
    Gopher stats + exact fingerprints ride one row-local pass (no
    doc-keyed join), then one map-side-combined groupBy on the domain
    key; keep tests are all-integer."""
    from pyspider_spark.operators.textprep import domain_curation

    return domain_curation(_t(spark, sf, "documents"), min_docs=5)


def q_mixture_weights(spark, sf):
    """Per-language resampling weights to hit a target mixture (target
    share / observed share) + the capped Bernoulli keep-rate."""
    from pyspider_spark.operators.corpus import mixture_weights

    return mixture_weights(_t(spark, sf, "documents"), _MIX_TARGETS)


def q_rebalance(spark, sf):
    """Deterministic subsample toward the target mixture: data-derived
    per-stratum rate, md5-slice Bernoulli keep predicate (reproducible
    across engines/runs/re-shardings)."""
    from pyspider_spark.operators.corpus import rebalance

    return rebalance(_t(spark, sf, "documents"), _MIX_TARGETS)


def q_dedup_paragraphs(spark, sf):
    """Corpus-GLOBAL keep-first paragraph dedup (RefinedWeb exact-span
    recipe at line granularity): the planted nav/footer survives only at
    its globally-first (doc_id, pos) occurrence; natural exact-duplicate
    corpus texts keep the lowest-doc_id copy. One keyed window + one
    doc-keyed rebuild — never an unpartitioned sort."""
    from pyspider_spark.operators.corpus import dedup_paragraphs

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit(_BOILER_HEADER + "\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\n" + _BOILER_FOOTER),
        ).alias("text"),
    )
    return dedup_paragraphs(docs)


# deterministic synthetic URLs over the documents table (the corpus has no
# url column): every filter branch — scheme, blocklisted domain (as a dot
# suffix of a deeper host), lexical pattern, over-length — gets a slice
_URL_BLOCKLIST = ["badcasino.com", "tracker.example"]
_URL_MAXLEN = 256


def q_url_filter(spark, sf):
    """C4/RefinedWeb-style URL filtering: scheme gate, dot-suffix domain
    blocklist, lexical blocklist regex, length cap — first failing rule
    wins. Pure row-local expressions (no join/exchange/UDF)."""
    from pyspider_spark.operators.corpus import url_filter

    d = F.col("doc_id")
    s = d.cast("string")
    url = (
        F.when(d % 17 == 0, F.concat(F.lit("ftp://files.archive.example/"), s))
        .when(d % 13 == 0, F.concat(F.lit("https://cdn.eu.badcasino.com:8443/p/"), s))
        .when(
            d % 11 == 0,
            F.concat(
                F.lit("https://host"), (d % 5).cast("string"),
                F.lit(".example.com/free-casino-bonus/"), s,
            ),
        )
        .when(
            d % 7 == 0,
            F.concat(F.lit("https://deep.example.com/"), F.repeat(F.lit("x"), 300),
                     F.lit("/"), s),
        )
        .otherwise(F.concat(F.lit("https://en.encyclo.example.org/wiki/"), s))
    )
    pages = _t(spark, sf, "documents").select("doc_id", url.alias("url"))
    return url_filter(pages, _URL_BLOCKLIST, max_len=_URL_MAXLEN)


_URL_EXPR_SQL = (
    "CASE WHEN doc_id % 17 = 0 THEN 'ftp://files.archive.example/' || doc_id "
    "WHEN doc_id % 13 = 0 THEN 'https://cdn.eu.badcasino.com:8443/p/' || doc_id "
    "WHEN doc_id % 11 = 0 THEN 'https://host' || (doc_id % 5) "
    "|| '.example.com/free-casino-bonus/' || doc_id "
    "WHEN doc_id % 7 = 0 THEN 'https://deep.example.com/' || repeat('x', 300) "
    "|| '/' || doc_id "
    "ELSE 'https://en.encyclo.example.org/wiki/' || doc_id END"
)


# a 14-token sentence planted at the head of every 5th document so the
# span-dedup query has genuinely cross-document duplicated 10-grams (the
# natural corpus texts also contain exact-duplicate docs, which share ALL
# their spans) — the oracle SQL plants it identically
_SPAN_PLANT = (
    "shared disclaimer all rights reserved contact the site"
    " administrator for removal requests today"
)


def q_span_dedup(spark, sf):
    """Exact duplicated-span detection (Lee et al. 2021 shape at fixed
    span length): per-doc count of distinct 10-token spans occurring in
    >= 2 documents. Corpus x corpus — the dup-span set flows through a
    shuffle hash join on 8-byte keys, never a broadcast."""
    from pyspider_spark.operators.corpus import span_dedup

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(_SPAN_PLANT + " "), F.coalesce(F.col("text"), F.lit(""))),
        ).otherwise(F.coalesce(F.col("text"), F.lit(""))).alias("text"),
    )
    return span_dedup(docs, n=10, min_docs=2)


def q_unigram_logprob(spark, sf):
    """Corpus-unigram LM quality score in exact integer micro-nats
    (quantize-before-sum makes the value partitioning-invariant, so the
    hash gate compares exactly)."""
    from pyspider_spark.operators.textprep import unigram_logprob

    return unigram_logprob(_t(spark, sf, "documents"))


def q_dsir_logratio(spark, sf):
    """DSIR-style importance weight per document for the lang='en'
    target domain (Xie et al. 2023): per-token log-ratio of the target
    subset's unigram model vs the raw corpus's, add-1 smoothed over the
    raw vocabulary, quantized to integer micro-nats before the per-doc
    sum so the hash gate compares exactly."""
    from pyspider_spark.operators.textprep import dsir_logratio

    return dsir_logratio(_t(spark, sf, "documents"))


def q_dsir_topk_select(spark, sf):
    """DSIR selection step: keep the 100 documents with the highest
    per-token importance weight for the lang='en' target, ties broken by
    doc_id — a TakeOrderedAndProject over the dsir_logratio weights (no
    global sort)."""
    from pyspider_spark.operators.textprep import dsir_topk_select

    return dsir_topk_select(_t(spark, sf, "documents"), k=100)


def q_dsir_quantile_select(spark, sf):
    """DSIR corpus-fraction selection: keep the top 1/4 of documents by
    per-token importance weight via a ties-inclusive histogram-CDF
    threshold (exact integer ratio, no float quantile, no global sort —
    the scan-shaped 100-TB alternative to dsir_topk_select)."""
    from pyspider_spark.operators.textprep import dsir_quantile_select

    return dsir_quantile_select(_t(spark, sf, "documents"), keep_num=1, keep_den=4)


def q_bm25_topk(spark, sf):
    """BM25 corpus retrieval (Robertson & Zaragoza 2009, Lucene idf
    variant): top 25 documents for the query {hash, join, vector}, with
    per-(doc, term) scores quantized to integer micro-units before the
    per-doc sum so the value hash compares exact int64s."""
    from pyspider_spark.operators.textprep import bm25_topk

    return bm25_topk(_t(spark, sf, "documents"), ["hash", "join", "vector"], k=25)


def q_quality_classifier(spark, sf):
    """fastText-style hashed linear quality classifier (Joulin et al.
    2016): unigram + adjacent-bigram features hash into 256 integer
    micro-weight buckets via the portable md5-slice hash; the per-doc
    score is an exact integer sum, normalized by feature count, and
    thresholded into a keep flag. Pure scan-time whole-stage-codegen
    map — zero shuffle, zero Python."""
    from pyspider_spark.operators.textprep import hashed_linear_classifier

    return hashed_linear_classifier(_t(spark, sf, "documents"))


def q_dedup_simhash(spark, sf):
    """SimHash near pairs; blocking is pigeonhole-sound for max_hamming=6
    (7 chunks x 8 bits over the 56-bit signature)."""
    from pyspider_spark.operators.dedup import simhash, simhash_near_pairs

    return simhash_near_pairs(simhash(_t(spark, sf, "documents")), max_hamming=6)


def q_winnow_overlap(spark, sf):
    """MOSS-style winnowing partial-overlap pairs (Schleimer et al.
    SIGMOD'03): k=8 char-gram hashes, w=4 window value-min fingerprints,
    pairs sharing >= 16 distinct fingerprints (a substantial lift)."""
    from pyspider_spark.operators.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(_t(spark, sf, "documents"), k=8, w=4, min_shared=16)


def q_ensemble_near_dup(spark, sf):
    """Consensus near-dup pairs confirmed by >= 2 of the three text
    similarity families (minhash Jaccard, simhash Hamming, winnowing
    substring overlap) — ensemble vote before destructive removal."""
    from pyspider_spark.operators.dedup import ensemble_near_dup

    return ensemble_near_dup(_t(spark, sf, "documents"), min_votes=2)


def q_winnow_contamination(spark, sf):
    """Doc-level eval-contamination scoring: docs with doc_id % 17 == 0
    play the benchmark, the rest the training corpus; each benchmark
    doc's winnowing-fingerprint hit fraction against the corpus's
    DISTINCT fingerprint set (bounded probe join, no pair table)."""
    from pyspider_spark.operators.dedup import winnow_contamination

    docs = _t(spark, sf, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 0)
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    return winnow_contamination(corpus, bench, k=8, w=4)


def q_pack_interleaved(spark, sf):
    """Greedy token-budget packing of interleaved text/media/link span
    sequences (media atomic, order preserved) over a deterministic
    interleaved corpus derived from `documents` (text halves + media
    every 3rd doc + link every 5th)."""
    from pyspider_spark.operators.corpus import pack_interleaved_spans

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.expr(
            r"regexp_replace(lower(coalesce(text, '')), '\\s+', ' ')"
        ).alias("t"),
    ).select(
        "doc_id",
        F.expr("""
            concat(
              array(named_struct(
                'kind', 'text',
                'text', substring(t, 1, CAST(floor(length(t) / 2) AS INT)),
                'media_ref', CAST(NULL AS STRING), 'offset', 0)),
              CASE WHEN doc_id % 3 = 0 THEN array(named_struct(
                'kind', 'media', 'text', CAST(NULL AS STRING),
                'media_ref', concat('img://', CAST(doc_id AS STRING)),
                'offset', 1))
              ELSE CAST(array() AS ARRAY<STRUCT<kind: STRING, text: STRING,
                                                media_ref: STRING, offset: INT>>)
              END,
              array(named_struct(
                'kind', 'text',
                'text', substring(t, CAST(floor(length(t) / 2) AS INT) + 1),
                'media_ref', CAST(NULL AS STRING), 'offset', 2)),
              CASE WHEN doc_id % 5 = 0 THEN array(named_struct(
                'kind', 'link', 'text',
                concat('https://ex.com/', CAST(doc_id AS STRING)),
                'media_ref', CAST(NULL AS STRING), 'offset', 3))
              ELSE CAST(array() AS ARRAY<STRUCT<kind: STRING, text: STRING,
                                                media_ref: STRING, offset: INT>>)
              END)
        """).alias("spans"),
    )
    return pack_interleaved_spans(docs, max_tokens=64, media_tokens=32)


def q_per_source_cap(spark, sf):
    """Per-source document cap (RefinedWeb/C4 anti-dominance): top 10
    docs per source by micro-quantized quality, salted two-phase rank
    (16 buckets) that must equal the oracle's single plain window."""
    from pyspider_spark.operators.textprep import per_source_cap

    return per_source_cap(_t(spark, sf, "documents"), cap=10, salt_buckets=16)


def q_allpairs_exact(spark, sf):
    """EXACT set-similarity self-join via prefix filtering (AllPairs,
    Bayardo et al. WWW'07): all pairs with word-trigram-set Jaccard
    >= 4/5, no probabilistic banding — integer-rational bounds end to
    end, so the value hash is engine-exact."""
    from pyspider_spark.operators.dedup import allpairs_exact_pairs

    return allpairs_exact_pairs(_t(spark, sf, "documents"), 4, 5, ngram=3)


def q_ngram_jaccard(spark, sf):
    """n-gram Jaccard verify on LSH candidates (oracled end-to-end)."""
    from pyspider_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    sh = shingles(_t(spark, sf, "documents"), k=4)
    pairs = lsh_candidate_pairs(minhash_signatures(sh, 32), bands=16, rows=2)
    return jaccard_verify(pairs, sh, threshold=0.5).select(
        "doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard")
    )


def q_ann_cosine_topk(spark, sf):
    from pyspider_spark.functions.similarity import cosine_topk

    top = cosine_topk(_t(spark, sf, "embeddings"), _QUERY_VEC, k=10)
    return top.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


def q_ann_lsh_topk(spark, sf):
    """Multi-probe LSH ANN (oracled: DuckDB mirrors the signature planes
    and hamming-ball probes; recall >= 0.9 vs brute force pytest-checked)."""
    from pyspider_spark.functions.similarity import ann_topk_lsh

    top = ann_topk_lsh(_t(spark, sf, "embeddings"), _QUERY_VEC, k=10)
    return top.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


_IVF_CENTROID_CACHE: dict = {}


def _ivf_trained_centroids(sf_dir: str):
    """K-means-trained IVF centroids for this corpus (VERDICT r04 item 3
    — seeded-random cells unbalance on skewed real embeddings). Pure
    numpy over a deterministic bounded parquet sample, so oracle_sql()
    regenerates BIT-IDENTICAL literals from the same file; cached per
    corpus dir (training reruns only on a new sf)."""
    import os as _os

    from pyspider_spark.functions.similarity import (
        sample_embeddings_parquet,
        train_ivf_centroids,
    )

    key = _os.path.normpath(sf_dir)
    if key not in _IVF_CENTROID_CACHE:
        sample = sample_embeddings_parquet(f"{sf_dir}/embeddings.parquet", cap=20_000)
        _IVF_CENTROID_CACHE[key] = train_ivf_centroids(sample, n_cells=16, seed=42)
    return _IVF_CENTROID_CACHE[key]


def q_ann_ivf_topk(spark, sf):
    """IVF ANN top-k with TRAINED centroids (oracled: DuckDB re-trains the
    same spherical k-means on the same parquet sample, so the centroid
    literals + probe list match; the complementary scale path to LSH —
    partition-pruned cells instead of hash tables)."""
    from pyspider_spark.functions.similarity import ann_topk_ivf

    _literal_oracle_guard(sf)
    top = ann_topk_ivf(
        _t(spark, sf, "embeddings"), _QUERY_VEC, k=10,
        centroids=_ivf_trained_centroids(sf),
    )
    return top.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


# near-dup planting: one perturbed copy (v[0] += 0.5, id += 1e6) per
# PLANT_EVERY-th vector, so the near-dup query has guaranteed positives
# (the round-1 driver row was vacuous: 0 pairs cleared the threshold)
PLANT_EVERY = 25


def q_embedding_near_dup(spark, sf):
    """Embedding-cosine near-dup pairs over banded hyperplane buckets
    (oracled end-to-end, planted positives)."""
    from pyspider_spark.functions.similarity import embedding_near_dup_pairs

    base = _t(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    planted = base.where(F.col("vec_id") % PLANT_EVERY == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at(v, 1) + F.lit(0.5)),
            F.slice(v, 2, F.size(v) - 1),
        ).alias("embedding"),
    )
    aug = base.select("vec_id", v.alias("embedding")).unionByName(planted)
    pairs = embedding_near_dup_pairs(aug, dims=64, threshold=0.8)
    return pairs.select("doc_a", "doc_b", F.round("cos_sim", 4).alias("cos_sim"))


def q_semdedup(spark, sf):
    """SemDeDup semantic dedup: TRAINED spherical-k-means clusters bound
    the pairwise cosine search; within each cluster the lowest-id member
    of every >= 0.8-cosine group survives. Same planted near-copies as
    embedding_near_dup guarantee non-vacuous drops; oracled end-to-end
    (DuckDB re-trains the identical centroids from the same parquet
    sample)."""
    from pyspider_spark.functions.similarity import semdedup_keep

    _literal_oracle_guard(sf)
    base = _t(spark, sf, "embeddings")
    v = F.col("embedding").cast("array<double>")
    planted = base.where(F.col("vec_id") % PLANT_EVERY == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array(F.element_at(v, 1) + F.lit(0.5)),
            F.slice(v, 2, F.size(v) - 1),
        ).alias("embedding"),
    )
    aug = base.select("vec_id", v.alias("embedding")).unionByName(planted)
    return semdedup_keep(
        aug, dims=64, threshold=0.8, centroids=_ivf_trained_centroids(sf)
    )


def _media_table(spark, sf):
    """Media payload table derived from the interleaved corpus (one media
    ref per doc) — shared by the multimodal feature + frame queries."""
    from pyspider_spark.functions.multimodal import synth_media_table
    from pyspider_spark.synth import interleave_from_testdata

    docs = interleave_from_testdata(spark, sf, show=5, hosts=4)
    return synth_media_table(
        docs.withColumn(
            "spans",
            F.array(
                F.struct(
                    F.lit("media").alias("kind"),
                    F.lit(None).cast("string").alias("text"),
                    F.concat(F.lit("media://img/"), F.col("doc_id")).alias("media_ref"),
                    F.lit(0).alias("offset"),
                )
            ),
        )
    )


def q_multimodal_features(spark, sf):
    """Multimodal plumbing: media spans → binary payloads → Arrow-batched
    feature extraction (deterministic stub decode; fully oracled)."""
    from pyspider_spark.functions.multimodal import decode_stub_features

    _literal_oracle_guard(sf)
    feats = decode_stub_features(_media_table(spark, sf))
    # project the engine-portable deterministic columns (the float feature
    # vector is computed by the same Arrow stage but is float32-mean math a
    # SQL oracle can't mirror bit-exactly — pytest covers it instead)
    return feats.select("media_ref", "bytes", "phash")


def q_multimodal_frames(spark, sf):
    """Multimodal frame sampling (one row per sampled 'frame' byte) —
    exercises the explode-side mapInPandas plumbing; fully oracled (the
    oracle recomputes the payload stream + stride inside DuckDB)."""
    from pyspider_spark.functions.multimodal import frame_sample

    _literal_oracle_guard(sf)
    # stride 63 is coprime with the 32-byte repeating payload stream, so
    # sampled frames actually walk the payload (64 would alias to byte 0)
    return frame_sample(_media_table(spark, sf), every_n_bytes=63)


def q_media_near_dup(spark, sf):
    """Media near-dup: payloads + their #half (2x average-pool) and #jitter
    (re-encode-noise) copies -> 64-bit integer-exact chunk-mean phash ->
    SimHash pigeonhole Hamming join. The image-dedup stage of a multimodal
    pipeline; fully oracled (DuckDB recomputes payloads, variants, hashes,
    and the exact-by-pigeonhole pair set)."""
    from pyspider_spark.functions.multimodal import media_phash_near_dup
    from pyspider_spark.synth import interleave_from_testdata

    _literal_oracle_guard(sf)
    docs = interleave_from_testdata(spark, sf, show=5, hosts=4).withColumn(
        "spans",
        F.array(
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat(F.lit("media://img/"), F.col("doc_id")).alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ),
    )
    return media_phash_near_dup(docs, max_hamming=3)


def _interleaved_mixed_corpus(spark, sf):
    """Interleaved docs with planted cross-modal structure (m = doc_id % 10):
    m==1 fully mirrors doc i-1 (its text, #half copies of its media);
    m==3 shares media evidence only (#jitter copy of one of i-1's refs);
    m==6 shares text only; every other doc is its own. Spans interleave
    two 150-char text chunks with two media refs (offsets 0..3)."""
    flat = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("_did"), "text"
    )
    prev = flat.select(F.col("_did").alias("_pid"), F.col("text").alias("_ptext"))
    j = flat.join(prev, flat["_did"] - 1 == prev["_pid"], "left")
    m = F.col("_did") % 10
    has_prev = F.col("_pid").isNotNull()
    t = F.when(m.isin(1, 6) & has_prev, F.col("_ptext")).otherwise(F.col("text"))

    def ref(idc, k, suffix=""):
        return F.concat(
            F.lit("media://"), idc.cast("string"), F.lit(f"/{k}{suffix}")
        )

    media0 = (
        F.when((m == 1) & has_prev, ref(F.col("_pid"), 0, "#half"))
        .when((m == 3) & has_prev, ref(F.col("_pid"), 0, "#jitter"))
        .otherwise(ref(F.col("_did"), 0))
    )
    media1 = F.when((m == 1) & has_prev, ref(F.col("_pid"), 1, "#half")).otherwise(
        ref(F.col("_did"), 1)
    )

    def tspan(txt, off):
        return F.struct(
            F.lit("text").alias("kind"), txt.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(off).alias("offset"),
        )

    def mspan(r, off):
        return F.struct(
            F.lit("media").alias("kind"), F.lit(None).cast("string").alias("text"),
            r.alias("media_ref"), F.lit(off).alias("offset"),
        )

    return j.select(
        F.concat(F.lit("d"), F.col("_did").cast("string")).alias("doc_id"),
        F.array(
            tspan(F.substring(t, 1, 150), 0),
            mspan(media0, 1),
            tspan(F.substring(t, 151, 150), 2),
            mspan(media1, 3),
        ).alias("spans"),
    )


def q_interleaved_near_dup(spark, sf):
    """Doc-level near-dup over interleaved text+media documents: text
    spans vote via minhash Jaccard, media spans vote via perceptual-hash
    containment — mirrors, template farms (same text, different images)
    and stock-photo reuse (same images, different text) separate into
    votes=2 / by_text / by_media rows. Fully oracled."""
    from pyspider_spark.functions.multimodal import synth_variant_phashes
    from pyspider_spark.operators.dedup import interleaved_near_dup

    _literal_oracle_guard(sf)
    docs = _interleaved_mixed_corpus(spark, sf)
    base = _t(spark, sf, "documents").select(
        F.explode(F.array(F.lit("/0"), F.lit("/1"))).alias("_sfx"),
        F.concat(
            F.lit("media://"), F.col("doc_id").cast("string"), F.col("_sfx")
        ).alias("_ref"),
    ).select(
        F.array(
            F.struct(
                F.lit("media").alias("kind"), F.lit(None).cast("string").alias("text"),
                F.col("_ref").alias("media_ref"), F.lit(0).alias("offset"),
            )
        ).alias("spans")
    )
    hashes = synth_variant_phashes(base)
    return interleaved_near_dup(
        docs, hashes, min_votes=1, minhash_threshold=0.7,
        media_max_hamming=3, media_min_overlap=0.5,
    )


def q_crawl_flagship(spark, sf):
    """Full crawl over the interleaved corpus (3 rounds); VALUES-literal
    oracled, so the corpus dir must match the oracle generation dir."""
    _literal_oracle_guard(sf)
    return crawl_flagship(spark, sf, max_rounds=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # REGISTRY ORDER POLICY (VERDICT r05 item 1): the driver's correctness
    # window has historically covered the FIRST 50 dict entries, so entries
    # are ordered by driver-coverage debt — (1) the 13 queries that had
    # never had a driver oracle row after round 5, then (2) the 9 whose
    # last green row was round 4 (incl. the flagship), then (3) the 50
    # fresh-green from round 5. Rotate on the same rule every round: no
    # entry goes more than 2 rounds without a driver row. Names and
    # semantics are untouched — this is dict order only.
    return {
        # --- (1) never driver-checked as of round 5 ---
        "dsir_topk_select": q_dsir_topk_select,
        "dsir_quantile_select": q_dsir_quantile_select,
        "bm25_topk": q_bm25_topk,
        "quality_classifier": q_quality_classifier,
        "allpairs_exact": q_allpairs_exact,
        "per_source_cap": q_per_source_cap,
        "pack_interleaved": q_pack_interleaved,
        "winnow_overlap": q_winnow_overlap,
        "winnow_contamination": q_winnow_contamination,
        "ensemble_near_dup": q_ensemble_near_dup,
        "semdedup": q_semdedup,
        "media_near_dup": q_media_near_dup,
        "interleaved_near_dup": q_interleaved_near_dup,
        # --- (2) last green row round 4 ---
        "crawl_flagship": q_crawl_flagship,
        "dedup_simhash": q_dedup_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "multimodal_features": q_multimodal_features,
        "multimodal_frames": q_multimodal_frames,
        # --- (3) fresh-green in round 5 ---
        "f1_rank_select": q_f1_rank_select,
        "f2_merge_on_put": q_f2_merge_on_put,
        "f6_token_bucket": q_f6_token_bucket,
        "f8_fair_share": q_f8_fair_share,
        "f9_urlseen_antijoin": q_f9_urlseen_antijoin,
        "f9b_urlseen_cuckoo": q_f9b_urlseen_cuckoo,
        "f9c_urlseen_stored": q_f9c_urlseen_stored,
        "f7_project_delete": q_f7_project_delete,
        "f10_restart_rules": q_f10_restart_rules,
        "f11_follows_dedup": q_f11_follows_dedup,
        "f13_retry_ladder": q_f13_retry_ladder,
        "f19_inqueue_limit": q_f19_inqueue_limit,
        "f20_config_join": q_f20_config_join,
        "f23_status_counts": q_f23_status_counts,
        "r1_result_latest": q_r1_result_latest,
        "r2_select_page": q_r2_select_page,
        "r5_active_topk": q_r5_active_topk,
        "m2_windowed_counters": q_m2_windowed_counters,
        "filter_pushdown": q_filter_pushdown,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "incremental_minhash": q_incremental_minhash,
        "dedup_cluster": q_dedup_cluster,
        "dedup_keep_best": q_dedup_keep_best,
        "leakage_split": q_leakage_split,
        "corpus_clean": q_corpus_clean,
        "pagerank": q_pagerank,
        "repetition_stats": q_repetition_stats,
        "pii_scrub": q_pii_scrub,
        "stratified_sample": q_stratified_sample,
        "tfidf_topk": q_tfidf_topk,
        "boilerplate_strip": q_boilerplate_strip,
        "ngram_contamination": q_ngram_contamination,
        "pack_sequences": q_pack_sequences,
        "training_shards": q_training_shards,
        "dup_substring_spans": q_dup_substring_spans,
        "apply_span_cuts": q_apply_span_cuts,
        "perplexity_buckets": q_perplexity_buckets,
        "gopher_rules": q_gopher_rules,
        "domain_curation": q_domain_curation,
        "mixture_weights": q_mixture_weights,
        "rebalance_mix": q_rebalance,
        "dedup_paragraphs": q_dedup_paragraphs,
        "url_filter": q_url_filter,
        "span_dedup": q_span_dedup,
        "unigram_logprob": q_unigram_logprob,
        "dsir_logratio": q_dsir_logratio,
    }


def oracle_sql() -> dict[str, str]:
    from pyspider_spark import oracles

    # the driver's side-by-side gate runs at sf0.01; the flagship/multimodal
    # oracles are VALUES literals derived (independently: pure-Python XXH64
    # + ReferenceSim) from that corpus, so they are generated for it
    oracle_sf = _oracle_sf()
    qv = "[" + ", ".join(f"{x!r}" for x in _QUERY_VEC) + "]"
    return {
        "crawl_flagship": oracles.crawl_flagship_sql(oracle_sf, max_rounds=3),
        "multimodal_features": oracles.multimodal_sql(oracle_sf),
        "multimodal_frames": oracles.multimodal_frames_sql(oracle_sf, every_n_bytes=63),
        "media_near_dup": oracles.media_phash_sql(oracle_sf, max_hamming=3),
        "interleaved_near_dup": oracles.interleaved_near_dup_sql(),
        "r2_select_page": """
            WITH log AS (
                SELECT CAST(user_id AS VARCHAR) AS taskid,
                       event_type AS project,
                       'u://' || CAST(user_id AS VARCHAR) AS url,
                       CAST(event_id AS DOUBLE) AS updatetime
                FROM events WHERE event_type = 'click'
            ),
            latest AS (
                SELECT * FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY project, taskid ORDER BY updatetime DESC
                    ) AS rn FROM log
                ) WHERE rn = 1
            ),
            page AS (
                SELECT project, taskid, url, updatetime,
                       ROW_NUMBER() OVER (ORDER BY updatetime DESC, taskid ASC) AS rn2
                FROM latest
            )
            SELECT project, taskid, url, updatetime
            FROM page WHERE rn2 > 20 AND rn2 <= 40
        """,
        "dedup_minhash": oracles.minhash_pairs_sql(
            k=5, n_hashes=32, bands=8, rows=4, threshold=0.6
        ),
        "incremental_minhash": oracles.incremental_minhash_sql(
            k=5, n_hashes=32, bands=8, rows=4, threshold=0.6, split_mod=5
        ),
        "dedup_cluster": oracles.minhash_components_sql(
            k=5, n_hashes=32, bands=8, rows=4, threshold=0.6
        ),
        "dedup_keep_best": oracles.dedup_keep_best_sql(
            k=5, n_hashes=32, bands=8, rows=4, threshold=0.6
        ),
        "leakage_split": oracles.leakage_split_sql(
            k=5, n_hashes=32, bands=8, rows=4, threshold=0.6,
            fractions=(0.9, 0.05, 0.05),
        ),
        "corpus_clean": oracles.corpus_clean_sql(),
        "pagerank": oracles.pagerank_sql(),
        "repetition_stats": oracles.repetition_sql(),
        "pii_scrub": oracles.pii_scrub_sql(),
        "stratified_sample": oracles.stratified_sample_sql(SAMPLE_RATES),
        "tfidf_topk": oracles.tfidf_topk_sql(k=3, min_df=2),
        "boilerplate_strip": oracles.strip_boilerplate_sql(
            min_docs=5,
            text_expr=(
                f"'{_BOILER_HEADER}' || chr(10) || COALESCE(text, '')"
                f" || chr(10) || '{_BOILER_FOOTER}'"
            ),
        ),
        "ngram_contamination": oracles.ngram_contamination_sql(
            n=8, min_hits=1, bench_pred="doc_id % 97 = 0"
        ),
        "pack_sequences": oracles.pack_sequences_sql(max_tokens=2048),
        "training_shards": oracles.training_shards_sql(n_shards=16),
        "dup_substring_spans": oracles.dup_substring_spans_sql(n=10, min_docs=2),
        "apply_span_cuts": oracles.apply_span_cuts_sql(n=10, min_docs=2),
        "perplexity_buckets": oracles.perplexity_buckets_sql(),
        "gopher_rules": oracles.gopher_rules_sql(),
        "domain_curation": oracles.domain_curation_sql(min_docs=5),
        "mixture_weights": oracles.mixture_weights_sql(_MIX_TARGETS),
        "rebalance_mix": oracles.rebalance_sql(_MIX_TARGETS),
        "dedup_paragraphs": oracles.dedup_paragraphs_sql(
            text_expr=(
                f"'{_BOILER_HEADER}' || chr(10) || COALESCE(text, '')"
                f" || chr(10) || '{_BOILER_FOOTER}'"
            ),
        ),
        "url_filter": oracles.url_filter_sql(
            _URL_BLOCKLIST, max_len=_URL_MAXLEN, url_expr=_URL_EXPR_SQL
        ),
        "span_dedup": oracles.span_dedup_sql(
            n=10, min_docs=2,
            table=(
                "(SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN "
                f"'{_SPAN_PLANT} ' || COALESCE(text, '') "
                "ELSE COALESCE(text, '') END AS text FROM documents)"
            ),
        ),
        "unigram_logprob": oracles.unigram_logprob_sql(),
        "dsir_logratio": oracles.dsir_logratio_sql(),
        "dsir_topk_select": oracles.dsir_topk_select_sql(k=100),
        "dsir_quantile_select": oracles.dsir_quantile_select_sql(keep_num=1, keep_den=4),
        "bm25_topk": oracles.bm25_topk_sql(["hash", "join", "vector"], k=25),
        "quality_classifier": oracles.quality_classifier_sql(),
        "allpairs_exact": oracles.allpairs_exact_sql(4, 5, ngram=3),
        "per_source_cap": oracles.per_source_cap_sql(cap=10),
        "pack_interleaved": oracles.pack_interleaved_sql(
            max_tokens=64, media_tokens=32
        ),
        "winnow_overlap": oracles.winnow_overlap_sql(k=8, w=4, min_shared=16),
        "winnow_contamination": oracles.winnow_contamination_sql(
            k=8, w=4, bench_mod=17
        ),
        "ensemble_near_dup": oracles.ensemble_near_dup_sql(min_votes=2),
        "ngram_jaccard": oracles.minhash_pairs_sql(
            k=4, n_hashes=32, bands=16, rows=2, threshold=0.5
        ),
        "dedup_simhash": oracles.simhash_pairs_sql(max_hamming=6),
        "ann_lsh_topk": oracles.ann_lsh_topk_sql(_QUERY_VEC, k=10),
        "ann_ivf_topk": oracles.ann_ivf_topk_sql(
            _QUERY_VEC, k=10, centroids=_ivf_trained_centroids(oracle_sf)
        ),
        "embedding_near_dup": oracles.embedding_near_dup_sql(
            dims=64, threshold=0.8, plant_every=PLANT_EVERY
        ),
        "semdedup": oracles.semdedup_sql(
            dims=64, threshold=0.8, plant_every=PLANT_EVERY,
            centroids=_ivf_trained_centroids(oracle_sf),
        ),
        "f1_rank_select": """
            SELECT o_orderpriority, pick_rank, o_orderkey, o_orderdate FROM (
                SELECT o_orderpriority, o_orderkey, o_orderdate,
                       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS pick_rank
                FROM orders
            ) WHERE pick_rank <= 10
        """,
        "f2_merge_on_put": """
            SELECT o_custkey, MAX(o_totalprice) AS max_price,
                   MIN(o_orderdate) AS first_date,
                   MIN(o_orderkey) AS first_seq, COUNT(*) AS n_puts
            FROM orders GROUP BY o_custkey
        """,
        "f6_token_bucket": """
            SELECT o_orderpriority, COUNT(*) AS n_ready,
                   LEAST(COUNT(*), CAST(FLOOR(150.7) AS BIGINT)) AS quota
            FROM orders GROUP BY o_orderpriority
        """,
        "f8_fair_share": """
            WITH c AS (SELECT o_orderpriority, COUNT(*) AS w FROM orders GROUP BY 1),
                 t AS (SELECT SUM(w) AS t FROM c)
            SELECT o_orderpriority, w,
                   -- (w / t) * L in THIS order: mirrors fair_share_limits'
                   -- int((1.0 * weight / total) * loop_limit) fp rounding
                   LEAST(GREATEST(CAST(FLOOR((w / CAST(t AS DOUBLE)) * 1000) AS BIGINT), 100), 333) AS share
            FROM c CROSS JOIN t
        """,
        "f9_urlseen_antijoin": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        # the cuckoo prefilter cannot change the answer (no false
        # negatives; the maybe side re-checks exactly): unseen = customers
        # with no 'O'-status order
        "f9b_urlseen_cuckoo": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'O')
        """,
        # the storage-resident sharded filter keeps the same contract:
        # unseen = customers with no 'F'-status order
        "f9c_urlseen_stored": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'F')
        """,
        # after the 'delete' unlearns custkeys holding no 'P' order,
        # seen = custkeys with at least one 'P' order
        "f7_project_delete": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderstatus = 'P')
        """,
        "f10_restart_rules": """
            SELECT CASE WHEN o_orderstatus = 'P' THEN 'itag_changed'
                        WHEN o_orderstatus = 'O' AND o_orderdate < TIMESTAMP '1995-01-01'
                             THEN 'age_expired'
                        WHEN o_totalprice > 400000 THEN 'force_update'
                        ELSE 'no_restart' END AS restart_reason,
                   COUNT(*) AS n
            FROM orders GROUP BY 1
        """,
        "f11_follows_dedup": "SELECT DISTINCT user_id, event_type FROM events",
        "f13_retry_ladder": """
            SELECT CASE WHEN retried = 0 THEN 30 WHEN retried = 1 THEN 3600
                        WHEN retried = 2 THEN 21600 WHEN retried = 3 THEN 43200
                        ELSE 86400 END AS delay,
                   CASE WHEN retried >= 3 THEN 'FAILED' ELSE 'RETRY' END AS status,
                   COUNT(*) AS n
            FROM (SELECT l_linenumber - 1 AS retried FROM lineitem)
            GROUP BY 1, 2
        """,
        "f19_inqueue_limit": """
            SELECT o_custkey, rk, o_orderkey FROM (
                SELECT o_custkey, o_orderkey,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS rk
                FROM orders
            ) WHERE rk <= 2
        """,
        "f20_config_join": """
            SELECT COALESCE(c_mktsegment, 'DEFAULT') AS segment, COUNT(*) AS n
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            GROUP BY 1
        """,
        "f23_status_counts": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                   ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY 1, 2
        """,
        "r1_result_latest": """
            SELECT user_id, event_id, ts FROM (
                SELECT user_id, event_id, ts,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "r5_active_topk": """
            SELECT event_id, ts, event_type FROM events
            ORDER BY ts DESC, event_id ASC LIMIT 100
        """,
        "m2_windowed_counters": """
            SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
                   COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
            FROM events GROUP BY 1, 2
        """,
        "filter_pushdown": """
            SELECT event_id, user_id, ROUND(value, 4) AS value FROM events
            WHERE event_type = 'click' AND value > 50
        """,
        "text_token_stats": r"""
            SELECT lang, COUNT(*) AS docs,
                   CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(string_split_regex(trim(text), '\s+')) END) AS BIGINT) AS tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM documents GROUP BY lang
        """,
        "text_quality": r"""
            SELECT CAST(FLOOR(GREATEST(0.0, LEAST(1.0,
                     0.5 * LEAST(length(text) / 500.0, 1.0)
                   + 2.0 * (CASE WHEN trim(text) = '' THEN 0.0 ELSE
                       CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b'))
                            AS DOUBLE)
                       / len(string_split_regex(trim(text), '\s+')) END)
                   - 1.0 * (CASE WHEN length(text) = 0 THEN 0.0 ELSE
                       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                       / length(text) END)
                   + 0.3)) * 10) AS BIGINT) AS q_bucket,
                   COUNT(*) AS n
            FROM documents GROUP BY 1
        """,
        "lang_id": r"""
            WITH v AS (
              SELECT lang AS labeled,
                     len(regexp_extract_all(lower(text), '\b(the|and|of|to|is)\b')) AS en,
                     len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS de,
                     len(regexp_extract_all(lower(text), '\b(le|la|et|les|est)\b')) AS fr,
                     len(regexp_extract_all(lower(text), '\b(el|la|de|que|es)\b')) AS es,
                     len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS cjk
              FROM documents
            )
            SELECT labeled,
                   CASE WHEN cjk > 0 THEN 'zh'
                        WHEN GREATEST(en, de, fr, es) = 0 THEN 'unknown'
                        WHEN en = GREATEST(en, de, fr, es) THEN 'en'
                        WHEN de = GREATEST(en, de, fr, es) THEN 'de'
                        WHEN fr = GREATEST(en, de, fr, es) THEN 'fr'
                        ELSE 'es' END AS guessed,
                   COUNT(*) AS n
            FROM v GROUP BY 1, 2
        """,
        "dedup_exact": r"""
            SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
                   MIN(doc_id) AS canonical_id, COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "ann_cosine_topk": f"""
            SELECT vec_id, ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                   {qv}), 4) AS cos_sim
            FROM embeddings
            ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {qv}) DESC,
                     vec_id ASC
            LIMIT 10
        """,
    }
