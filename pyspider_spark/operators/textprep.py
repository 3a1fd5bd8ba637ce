"""Training-corpus preparation operators beyond the gates in
``operators/clean``: Gopher-style repetition statistics, PII scrubbing,
deterministic stratified sampling, and TF-IDF top-k keyword extraction.

These are the remaining verbs of a pretraining data pipeline (quality
filtering by repetition — Rae et al. 2021 "Scaling Language Models"
App. A1.1 — PII redaction, domain-mix rebalancing by per-stratum
sampling, and per-document keyword signals), each expressed in the
scale shape Spark wants:

- ``repetition_stats``: the duplicate-line / duplicate-paragraph
  fractions are row-local array expressions (whole-stage codegen, push
  down to the scan, zero shuffle); the top-2-gram character fraction is
  the one genuinely aggregate-shaped metric, done as explode →
  map-side-combined groupBy(doc, gram) → per-doc max_by — two
  doc-keyed exchanges, no window sort.
- ``scrub_pii``: pure regexp_replace/regexp_count expressions; at 100 TB
  this is a free rider on whatever scan already reads the text column.
- ``stratified_sample``: hash-mod Bernoulli per stratum using the
  engine-portable md5-slice hash (functions/portable_hash) — no
  sampleBy/RNG, so the SAME rows are kept on every engine and every
  rerun (resumable pipelines need deterministic sampling), and the
  filter is a plain predicate Catalyst can push down.
- ``tfidf_topk``: tokenize → explode → groupBy(doc, term) with map-side
  combine; document frequency is a second groupBy on the term key whose
  result is vocabulary-sized (≪ corpus) and therefore broadcast back —
  the per-doc top-k is max_by-style row_number over (doc) only.

All four are mirrored 1:1 in DuckDB (oracles.repetition_sql /
pii_scrub_sql / stratified_sample_sql / tfidf_topk_sql), so the driver
gate value-hashes them end to end. The reference has no corpus-prep
surface (it stops at result_worker dumps — result_worker.py); this
family is the Spark-first extension the 100-TB use case needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspider_spark.functions.portable_hash import md5_hash56

# --- Gopher-style repetition statistics -------------------------------------

# tokenization shared by the 2-gram metric and tfidf_topk: lowercase
# alphanumeric runs (engine-portable: regexp_extract_all exists with the
# same semantics in Spark and DuckDB)
WORD_RE = "[a-z0-9]+"


def _words(text) -> F.Column:
    return F.regexp_extract_all(F.lower(F.coalesce(text, F.lit(""))), F.lit(WORD_RE), 0)


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_para_frac, top_2gram_frac):
    per-document repetition metrics in the spirit of Gopher's quality
    rules — the fraction of duplicate lines / paragraphs (count-based)
    and the fraction of word mass claimed by the most frequent word
    2-gram. Rounded to 6 decimals for engine-portable value hashing."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.filter(F.split(text, "\n"), lambda s: F.trim(s) != F.lit(""))
    paras = F.filter(F.split(text, "\n\n"), lambda s: F.trim(s) != F.lit(""))

    def dup_frac(arr) -> F.Column:
        n = F.size(arr).cast("double")
        d = F.size(F.array_distinct(arr)).cast("double")
        return F.when(n == 0, F.lit(0.0)).otherwise(F.round((n - d) / n, 6))

    base = docs.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        dup_frac(lines).alias("dup_line_frac"),
        dup_frac(paras).alias("dup_para_frac"),
        _words(F.col(text_col)).alias("w"),
    )
    # top-2-gram fraction: explode 2-grams, count per (doc, gram) with
    # map-side combine, keep each doc's max count, divide by the doc's
    # 2-gram total. max_by on the grouped result — no window over rows.
    grams = base.select(
        id_col,
        F.size(F.col("w")).alias("n_words"),
        F.explode_outer(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - 2),
                    lambda i: F.concat_ws(" ", F.get("w", i), F.get("w", i + 1)),
                ),
            )
        ).alias("gram"),
    )
    top = (
        grams.groupBy(id_col, "n_words", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col, "n_words")
        .agg(F.max(F.when(F.col("gram").isNotNull(), F.col("c")).otherwise(0)).alias("top_c"))
        .select(
            id_col,
            # fraction of 2-gram slots held by the most frequent 2-gram —
            # bounded (0, 1], 0.0 for docs with < 2 words
            F.when(
                F.col("n_words") >= 2,
                F.round(
                    F.col("top_c") / (F.col("n_words") - 1).cast("double"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("top_2gram_frac"),
        )
    )
    return base.drop("w").join(top, id_col)


def repetition_filter(
    docs: DataFrame,
    max_dup_line_frac: float = 0.3,
    max_dup_para_frac: float = 0.3,
    max_top_2gram_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Documents passing the Gopher-ish repetition thresholds."""
    stats = repetition_stats(docs, id_col, text_col)
    keep = stats.where(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_para_frac") <= max_dup_para_frac)
        & (F.col("top_2gram_frac") <= max_top_2gram_frac)
    ).select(id_col)
    return docs.join(keep, id_col)


# --- PII scrubbing -----------------------------------------------------------

PII_PATTERNS = {
    # deliberately simple, engine-portable regexes (no lookaround — RE2 /
    # DuckDB safe); real deployments swap in stricter patterns here
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9() .-]{7,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_email, n_phone, n_ipv4, clean_fp): redaction counts per
    PII class plus the md5 fingerprint of the scrubbed text (the
    fingerprint — not the full text — keeps the driver-gate payload
    small; pipelines keep the scrubbed column by calling scrub_text).
    Patterns apply in a fixed order (email, phone, ipv4) so counts are
    deterministic when classes overlap."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col)]
    cleaned = text
    for name, pat in PII_PATTERNS.items():
        cols.append(F.regexp_count(cleaned, F.lit(pat)).alias(f"n_{name}"))
        cleaned = F.regexp_replace(cleaned, pat, f"<{name}>")
    cols.append(F.md5(cleaned).alias("clean_fp"))
    return docs.select(*cols)


def scrub_text(text: F.Column) -> F.Column:
    """The scrubbed text column itself (same fixed pattern order)."""
    cleaned = F.coalesce(text, F.lit(""))
    for name, pat in PII_PATTERNS.items():
        cleaned = F.regexp_replace(cleaned, pat, f"<{name}>")
    return cleaned


# --- deterministic stratified sampling ---------------------------------------

SAMPLE_MOD = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff
    md5_hash56(salt ‖ id) mod 1e6 < rate(stratum) * 1e6. Unlike
    df.sampleBy this is (a) exactly reproducible across engines, runs,
    and partitionings (resume-safe), (b) a pure pushdown-able predicate
    (no RNG state), and (c) consistent under re-sharding — properties a
    domain-mix rebalance over 100 TB needs. Rows whose stratum is not in
    ``rates`` fall back to ``default_rate``."""
    h = F.pmod(md5_hash56(F.col(id_col).cast("string"), salt=salt), F.lit(SAMPLE_MOD))
    rate = F.lit(float(default_rate))
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(float(r))).otherwise(rate)
    # double-vs-double comparison: Spark `cast long` truncates where
    # DuckDB CAST rounds half-even, so never cast the threshold
    return df.where(h.cast("double") < rate * F.lit(float(SAMPLE_MOD)))


# --- TF-IDF top-k keywords ----------------------------------------------------


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, df, score): the k highest-TF-IDF terms per
    document (score = tf · ln(N/df), ties broken by term for
    determinism). Document frequency is computed once on the term key —
    a vocabulary-sized table that broadcasts back onto the doc-keyed
    term counts, so the only big exchange is the map-side-combined
    groupBy(doc, term)."""
    n_docs = docs.count()
    terms = docs.select(
        F.col(id_col), F.explode(_words(F.col(text_col))).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    scored = tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
            6,
        ).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


# --- corpus-unigram LM scoring -------------------------------------------------


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, lp_micro_sum, avg_lp_micro): each document's
    log-likelihood under the corpus's own unigram language model — the
    in-container analogue of CCNet/RefinedWeb LM-perplexity quality
    filtering (lower avg logprob = more surprising = more likely junk
    OR more likely novel; callers threshold both tails).

    Per-token score = floor(ln(count(tok)/total_tokens) * 1e6) as a
    64-bit integer ("micro-nats"): quantizing BEFORE the per-doc sum
    makes the sum exact integer arithmetic, so the result is invariant
    to partitioning / accumulation order — a float avg(ln(p)) would
    differ between engines in the last ulps and flap the value-hash
    gate. avg_lp_micro = floor(lp_micro_sum / n_tokens) likewise.

    Scale shape: the frequency table is ONE map-side-combined groupBy
    over exploded tokens (vocabulary-sized output); total_tokens is a
    1-row aggregate over THAT table (O(vocab), not O(corpus)) and
    broadcasts. The score join is corpus-thin-rows x vocab on the token
    key — at 100 TB the vocab can exceed broadcast size, so this stays
    a shuffle hash join; Zipf-hot tokens skew its probe side, which AQE
    skew-join splitting handles (the build side is per-key tiny).
    Docs with zero tokens surface with 0 scores (never NULL — keeps the
    column int64 end to end).
    """
    toks = docs.select(
        F.col(id_col).alias("doc"), F.explode(_words(F.col(text_col))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").cast("double").alias("total"))
    q = F.floor(
        F.log(F.col("cnt").cast("double") / F.col("total")) * F.lit(1e6)
    ).cast("long")
    scored = (
        toks.join(freq, "tok")
        .join(F.broadcast(total))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(q).cast("long").alias("lp_micro_sum"),
        )
        .withColumn(
            "avg_lp_micro",
            F.floor(
                F.col("lp_micro_sum").cast("double") / F.col("n_tokens").cast("double")
            ).cast("long"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(scored, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("lp_micro_sum"), F.lit(0)).cast("long").alias("lp_micro_sum"),
            F.coalesce(F.col("avg_lp_micro"), F.lit(0)).cast("long").alias("avg_lp_micro"),
        )
    )


def dsir_logratio(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
) -> DataFrame:
    """(doc_id, n_tokens, dsir_micro_sum, avg_dsir_micro): DSIR-style
    importance weight of each document for a target domain — the
    log-ratio of the doc's likelihood under the TARGET subset's unigram
    model vs the RAW corpus's unigram model (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"; their
    hashed-ngram features reduce to exactly this per-feature count
    log-ratio). Documents that look like the target domain score high;
    callers resample the corpus proportionally to exp(weight).

    Both models are add-1 smoothed over the RAW vocabulary V, so tokens
    absent from the target subset stay finite:
        p_t(tok) = (cnt_t + 1) / (total_t + V)
        p_r(tok) = (cnt_r + 1) / (total_r + V)
    Per-token weight = floor(ln(p_t)*1e6) - floor(ln(p_r)*1e6): each
    term quantizes to integer micro-nats BEFORE the subtraction and the
    per-doc sum (same construction unigram_logprob proved cross-engine
    exact), so the result is invariant to partitioning and engine float
    accumulation order.

    Scale shape (identical to unigram_logprob): both frequency tables
    are map-side-combined groupBys with vocabulary-sized output; V and
    the two totals are O(vocab) aggregates broadcast as a 1-row frame;
    the weight table joins the exploded token stream on the token key —
    a shuffle hash join at 100-TB vocab, with AQE skew-split handling
    Zipf-hot tokens. Zero-token docs surface with 0 scores, never NULL.
    """
    toks = docs.select(
        F.col(id_col).alias("doc"),
        (F.col(target_col) == F.lit(target_value)).alias("is_t"),
        F.explode(_words(F.col(text_col))).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("cnt_r"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("cnt_t"),
    )
    consts = freq.agg(
        F.sum("cnt_r").cast("double").alias("total_r"),
        F.sum("cnt_t").cast("double").alias("total_t"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    lp_t = F.floor(
        F.log((F.col("cnt_t") + 1).cast("double") / (F.col("total_t") + F.col("vocab")))
        * F.lit(1e6)
    ).cast("long")
    lp_r = F.floor(
        F.log((F.col("cnt_r") + 1).cast("double") / (F.col("total_r") + F.col("vocab")))
        * F.lit(1e6)
    ).cast("long")
    scored = (
        toks.join(freq, "tok")
        .join(F.broadcast(consts))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(lp_t - lp_r).cast("long").alias("dsir_micro_sum"),
        )
        .withColumn(
            "avg_dsir_micro",
            F.floor(
                F.col("dsir_micro_sum").cast("double") / F.col("n_tokens").cast("double")
            ).cast("long"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(scored, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("dsir_micro_sum"), F.lit(0)).cast("long").alias("dsir_micro_sum"),
            F.coalesce(F.col("avg_dsir_micro"), F.lit(0)).cast("long").alias("avg_dsir_micro"),
        )
    )


def dsir_topk_select(
    docs: DataFrame,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
) -> DataFrame:
    """The SELECTION step of the DSIR pipeline: keep the k documents
    with the highest per-token importance weight (``avg_dsir_micro``
    from :func:`dsir_logratio`), ties broken by ``id_col`` ascending so
    the kept set is fully deterministic on every engine and every rerun
    (Xie et al. 2023 §3 describe this top-k heuristic as the
    deterministic alternative to Gumbel resampling).

    Scale shape: orderBy+limit compiles to TakeOrderedAndProject — each
    task keeps a k-row heap over its partition and the driver merges
    k·P candidate rows, so no global sort of the corpus ever
    materializes. That holds for selection budgets up to ~10^6 docs; a
    corpus-fraction budget at 100 TB should instead derive a weight
    threshold from a quantile sketch and push it down as a plain
    predicate (the ``stratified_sample`` pattern), trading exactness at
    the boundary for a scan-shaped plan."""
    w = dsir_logratio(docs, id_col, text_col, target_col, target_value)
    return w.orderBy(F.col("avg_dsir_micro").desc(), F.col(id_col).asc()).limit(k)


def dsir_quantile_select(
    docs: DataFrame,
    keep_num: int = 1,
    keep_den: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
) -> DataFrame:
    """The corpus-FRACTION selection step of the DSIR pipeline: keep the
    documents whose per-token importance weight (``avg_dsir_micro`` from
    :func:`dsir_logratio`) reaches the top ``keep_num/keep_den`` of the
    corpus — the 100-TB-posture alternative to :func:`dsir_topk_select`
    that its docstring routes fraction-sized budgets to. The fraction is
    an integer RATIO (e.g. 1/4), never a float, so every comparison is
    exact integer arithmetic and the kept SET is engine-exact.

    Threshold rule (ties-inclusive, the ``perplexity_buckets``
    construction): the threshold T is the LOWEST score whose
    ties-inclusive cumulative count ``cume`` (# docs scoring >= that
    score) satisfies ``cume * keep_den >= total * keep_num`` — i.e. the
    first score, descending, at which the kept prefix covers the budget
    ``ceil(total * keep_num / keep_den)``. Every doc with score >= T is
    kept, so tied scores always share a fate and the kept count may
    exceed the budget by the tie group only.

    Scale shape: no global sort and no top-k heap anywhere. The score
    CDF is a HISTOGRAM — groupBy(score), map-side combined, output
    bounded by distinct integer scores, not corpus rows — the only
    Window runs over those histogram rows, and the 1-row threshold
    broadcasts back into the corpus scan as a plain ``>=`` predicate
    (plan-tested: no TakeOrderedAndProject, exactly one Window, fed by
    the aggregate). At 100 TB the selection is therefore scan-shaped:
    one pass to score, one histogram exchange, one filtered pass."""
    from pyspark.sql import Window

    if not (0 < keep_num <= keep_den):
        raise ValueError("keep_num/keep_den must be a fraction in (0, 1]")
    # persisted: the scored frame feeds both the histogram branch and the
    # final filter — without the cache the whole dsir_logratio subtree
    # (token explode + two-model frequency join) runs twice.
    w = dsir_logratio(docs, id_col, text_col, target_col, target_value).persist()
    hist = w.groupBy("avg_dsir_micro").agg(F.count(F.lit(1)).alias("cnt"))
    wd = Window.orderBy(F.col("avg_dsir_micro").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("cume", F.sum("cnt").over(wd))
    tot = hist.agg(F.sum("cnt").alias("total"))
    thr = (
        cum.join(F.broadcast(tot))
        .filter(F.col("cume") * keep_den >= F.col("total") * keep_num)
        .agg(F.max("avg_dsir_micro").alias("thr"))
    )
    return (
        w.join(F.broadcast(thr))
        .filter(F.col("avg_dsir_micro") >= F.col("thr"))
        .drop("thr")
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bm25_micro, n_terms): the k documents best matching a
    bag-of-words query under BM25 (Robertson & Zaragoza 2009, the
    Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))`` non-negative idf
    variant) — the corpus-retrieval verb a training-data pipeline uses
    to pull topical subsets ("find the docs about X") next to the
    model-based DSIR weighting. ``n_terms`` = how many distinct query
    terms the doc matched.

    Exactness: the per-(doc, term) score quantizes to integer
    micro-units — ``floor(idf * tfnorm * 1e6)`` — BEFORE the per-doc
    sum (the ``unigram_logprob`` construction), and both engines
    evaluate the same double expression from the same exact integers
    (tf, df, dl, N, total_tokens), so the value-hash gate compares
    exact int64 sums. Ranking ties break by ``id_col`` ascending: the
    returned SET is engine-exact.

    Scale shape: the query-term IN filter lands directly on the
    exploded token stream, so everything past the scan is
    |matching (doc, term) rows| — corpus rows with no query term never
    leave their input task. Per-term df and the (N, total_tokens)
    corpus constants are |terms|-row / 1-row aggregates that broadcast
    back; doc length is a row-local ``size()`` at scan time (no
    corpus-wide length join). The final top-k is orderBy+limit =
    TakeOrderedAndProject (per-partition heap, no global sort) —
    plan-tested. Zero Python anywhere."""
    if not terms:
        raise ValueError("terms must be a non-empty list of query words")
    terms = sorted({t.lower() for t in terms})
    base = docs.select(
        F.col(id_col).alias("doc"), _words(F.col(text_col)).alias("w")
    )
    consts = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(F.size("w")).cast("double").alias("total_tokens"),
    )
    hits = base.select(
        "doc", F.size("w").alias("dl"), F.explode("w").alias("tok")
    ).filter(F.col("tok").isin(terms))
    tf = hits.groupBy("doc", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfnorm = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * F.col("dl") / (F.col("total_tokens") / F.col("n_docs"))
        )
    )
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(F.broadcast(consts))
        .groupBy("doc")
        .agg(
            F.sum(F.floor(idf * tfnorm * F.lit(1e6)).cast("long"))
            .cast("long")
            .alias("bm25_micro"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
    )
    return (
        scored.select(F.col("doc").alias(id_col), "bm25_micro", "n_terms")
        .orderBy(F.col("bm25_micro").desc(), F.col(id_col).asc())
        .limit(k)
    )


# --- fastText-style hashed linear quality classifier ------------------------


def clf_weights(n_buckets: int = 256, seed: int = 1607):
    """Deterministic integer micro-weights for the hashed linear
    classifier: the stand-in for a trained fastText/logistic quality
    model (the same role the seeded spherical-k-means centroids play for
    the IVF index — the plumbing, hashing, and plan shape are real; a
    production deployment loads trained weights into the same vector).
    Integer "micro" units (1e-6) so every engine sums exactly."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(-1_000_000, 1_000_001, size=n_buckets).astype("int64")


def hashed_linear_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    seed: int = 1607,
    keep_threshold_micro: int = 0,
    weights=None,
) -> DataFrame:
    """(doc_id, n_features, clf_micro_sum, avg_clf_micro, keep): apply a
    hashing-trick linear text classifier — the fastText construction
    (Joulin et al. 2016 arXiv:1607.01759, hashing trick per Weinberger
    et al. 2009) that CCNet-style pipelines use as the learned quality
    gate next to the rule-based ``quality_score``. Features are the
    lowercase word unigrams plus adjacent-word bigrams; each feature
    hashes to one of ``n_buckets`` weights via the engine-portable
    md5-slice hash, and the per-document score is the exact integer sum
    of its feature micro-weights. ``avg_clf_micro`` is the
    length-normalized score (floor of sum/n, the quantize-before-divide
    construction proved hash-stable by ``unigram_logprob``), and
    ``keep`` thresholds it.

    Scale shape: a pure scan-time map — tokenize, feature-hash, and
    weight-sum are all row-local whole-stage-codegen expressions with
    the weight vector embedded as a plan literal, so at 100 TB this is
    a free rider on whatever scan reads the text column: zero shuffle,
    zero Python, zero joins (plan-pinned by
    ``test_classifier_plan_is_scan_only``). Plan literals hold to
    ~10^5 buckets; a fastText-sized 10^6-bucket model should instead
    broadcast a (bucket, weight) table and sum via explode +
    broadcast-join — same semantics, still shuffle-free on the corpus
    side. The reference has no learned-filter surface (its pipeline
    stops at result dumps); this is Spark-first LLM-corpus extension
    surface like the rest of this module."""
    w = clf_weights(n_buckets, seed) if weights is None else weights
    if len(w) != n_buckets:
        raise ValueError(f"weights len {len(w)} != n_buckets {n_buckets}")
    warr = F.array(*[F.lit(int(x)) for x in w])

    toks = _words(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def bucket(f):
        return (md5_hash56(f, salt="clf") % n_buckets).cast("int")

    feats = docs.select(
        F.col(id_col), F.concat(toks, bigrams).alias("_feats")
    )
    scored = feats.select(
        id_col,
        F.size("_feats").cast("long").alias("n_features"),
        F.aggregate(
            "_feats",
            F.lit(0).cast("long"),
            lambda acc, f: acc + F.element_at(warr, bucket(f) + 1).cast("long"),
        ).alias("clf_micro_sum"),
    )
    return scored.select(
        id_col,
        "n_features",
        "clf_micro_sum",
        F.when(
            F.col("n_features") > 0,
            F.floor(
                F.col("clf_micro_sum").cast("double")
                / F.col("n_features").cast("double")
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("avg_clf_micro"),
    ).withColumn(
        "keep", F.col("avg_clf_micro") >= F.lit(int(keep_threshold_micro))
    )


# --- CCNet-style per-language perplexity buckets -----------------------------


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, lang, avg_lp_micro, bucket): partition each language's
    documents into CCNet's head / middle / tail quality terciles by
    LM score (Wenzek et al. 2019 arXiv:1911.00359 — CCNet buckets each
    language by perplexity under a small LM and keeps the head). The
    score is :func:`unigram_logprob`'s integer ``avg_lp_micro`` (higher
    = more probable = better), ranked DESCENDING within each language;
    a document's bucket comes from its ties-inclusive cumulative count
    ``cume`` (how many docs in the language score >= it):
    head if ``3*cume <= total``, middle if ``3*cume <= 2*total``, else
    tail — all-integer comparisons, so the oracle hash is exact and
    tied scores always share a bucket.

    Scale shape — the naive plan (percent_rank over a window
    partitioned by language) puts an ENTIRE language in one task, which
    at 100 TB is a straggler by construction. Instead this builds the
    per-language score CDF as a histogram: groupBy (lang, score) —
    map-side combined, output bounded by distinct scores, not corpus
    rows — then windows over THAT histogram (per-language row count =
    distinct scores only) and joins the (lang, score) -> bucket map
    back to the corpus on the composite key. The bucket map is
    histogram-sized, usually broadcastable; the corpus-side join is the
    only corpus-scale exchange."""
    # persisted: the scored frame feeds both the histogram branch and the
    # final output join — without the cache the whole unigram-LM subtree
    # (token explode + frequency join) runs twice.
    scored = (
        unigram_logprob(docs, id_col, text_col)
        .join(
            docs.select(
                F.col(id_col), F.coalesce(F.col(lang_col), F.lit("")).alias("lang")
            ),
            id_col,
        )
        .persist()
    )
    hist = scored.groupBy("lang", "avg_lp_micro").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    from pyspark.sql import Window

    wl = Window.partitionBy("lang").orderBy(F.col("avg_lp_micro").desc())
    cum = hist.withColumn(
        "cume", F.sum("cnt").over(wl.rowsBetween(Window.unboundedPreceding, 0))
    )
    tot = hist.groupBy("lang").agg(F.sum("cnt").alias("total"))
    bmap = (
        cum.join(F.broadcast(tot), "lang")
        .select(
            "lang",
            "avg_lp_micro",
            F.when(F.col("cume") * 3 <= F.col("total"), F.lit("head"))
            .when(F.col("cume") * 3 <= F.col("total") * 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
    )
    return scored.join(F.broadcast(bmap), ["lang", "avg_lp_micro"]).select(
        id_col, "lang", "avg_lp_micro", "bucket"
    )


# --- Gopher document-quality rules -------------------------------------------

# the eight Gopher "must contain >= 2 of" stop words (Rae et al. 2021
# App. A1.1), matched against the lowercase-alnum token set
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document Gopher quality gate (Rae et al. 2021 arXiv:2112.11446
    App. A1.1): the seven document-level rules, each as an all-integer
    test so the oracle hash is exact — word count in
    [``min_words``, ``max_words``]; mean word length in [3, 10]
    (``3*n_words <= n_chars <= 10*n_words``); symbol-to-word ratio
    ('#' chars + non-overlapping '...' + '…' occurrences) <= 0.1
    (``10*n_symbols <= n_words``); <= 90% of lines bullet-initial
    ('-', '*', '•'); <= 30% of lines ellipsis-terminal;
    >= 80% of words containing an alphabetic character
    (``5*n_alpha_words >= 4*n_words``); and >= 2 of the eight Gopher
    stop words present. Words are whitespace tokens (symbols matter
    here, unlike the alnum ``_words``); lines are trimmed non-empty.
    Returns the integer counts, one boolean per rule, and the AND as
    ``keep``.

    Scale shape: every rule is a row-local expression over the text
    column — whole-stage codegen, zero shuffle, free rider on whatever
    scan already reads the text (and a narrow ReadSchema when it is the
    only consumer). The repetition-rule half of Gopher's appendix lives
    in :func:`repetition_stats` / :func:`repetition_filter`."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(text, r"\s+"), lambda x: x != F.lit(""))
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )

    def occurrences(needle: str) -> F.Column:
        gone = F.replace(text, F.lit(needle), F.lit(""))
        return (F.length(text) - F.length(gone)) / F.lit(len(needle))

    counted = docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(
            words, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("n_chars"),
        F.size(lines).cast("long").alias("n_lines"),
        (occurrences("#") + occurrences("...") + occurrences("…"))
        .cast("long")
        .alias("n_symbols"),
        F.size(
            F.filter(
                lines,
                lambda l: F.startswith(l, F.lit("-"))
                | F.startswith(l, F.lit("*"))
                | F.startswith(l, F.lit("•")),
            )
        )
        .cast("long")
        .alias("n_bullet_lines"),
        F.size(
            F.filter(
                lines,
                lambda l: F.endswith(l, F.lit("..."))
                | F.endswith(l, F.lit("…")),
            )
        )
        .cast("long")
        .alias("n_ellipsis_lines"),
        F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]")))
        .cast("long")
        .alias("n_alpha_words"),
        F.size(
            F.array_intersect(
                F.array_distinct(_words(F.col(text_col))),
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            )
        )
        .cast("long")
        .alias("n_stopwords_present"),
    )
    rules = counted.select(
        "*",
        ((F.col("n_words") >= int(min_words)) & (F.col("n_words") <= int(max_words))).alias("r_word_count"),
        (
            (F.lit(3) * F.col("n_words") <= F.col("n_chars"))
            & (F.col("n_chars") <= F.lit(10) * F.col("n_words"))
        ).alias("r_mean_word_len"),
        (F.lit(10) * F.col("n_symbols") <= F.col("n_words")).alias("r_symbol_ratio"),
        (F.lit(10) * F.col("n_bullet_lines") <= F.lit(9) * F.col("n_lines")).alias("r_bullet"),
        (F.lit(10) * F.col("n_ellipsis_lines") <= F.lit(3) * F.col("n_lines")).alias("r_ellipsis"),
        (F.lit(5) * F.col("n_alpha_words") >= F.lit(4) * F.col("n_words")).alias("r_alpha"),
        (F.col("n_stopwords_present") >= 2).alias("r_stopwords"),
    )
    return rules.withColumn(
        "keep",
        F.col("r_word_count")
        & F.col("r_mean_word_len")
        & F.col("r_symbol_ratio")
        & F.col("r_bullet")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stopwords"),
    )


def domain_curation(
    docs: DataFrame,
    min_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> DataFrame:
    """(domain, n_docs, n_tokens, n_gopher_keep, n_distinct_fp,
    keep_domain): domain-level corpus curation — the RefinedWeb/C4 move
    of gating whole SOURCES by their aggregate quality instead of (only)
    per-document rules. Per domain: document count, total whitespace
    tokens, documents passing :func:`gopher_rules`, and distinct exact
    fingerprints (internal-duplication signal). ``keep_domain`` is the
    all-integer gate: at least ``min_docs`` documents, >= 50% passing
    Gopher (``2*n_gopher_keep >= n_docs``), and <= 10% internal exact
    duplication (``10*n_distinct_fp >= 9*n_docs``).

    Scale shape: the per-doc stats ride the same row-local single pass
    as ``gopher_rules`` (fingerprint + domain are pass-through columns —
    no doc-keyed join anywhere), then ONE map-side-combined groupBy on
    the domain key. Giant domains skew the reduce, but every aggregate
    here partial-aggregates (count/sum, and count_distinct partial-
    dedupes per partition), so a hot domain costs its reducer one merge
    pass, never a sort. Output is |domains| rows — the keep list
    broadcasts back into whatever scan consumes it."""
    from pyspider_spark.functions.text import fingerprint

    staged = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.coalesce(F.col(domain_col), F.lit("")).alias("_domain"),
        fingerprint(F.col(text_col)).alias("_fp"),
    )
    g = gopher_rules(
        staged, id_col=id_col, text_col=text_col, keep_cols=("_domain", "_fp")
    )
    agg = g.groupBy(F.col("_domain").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_tokens"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_gopher_keep"),
        F.countDistinct("_fp").cast("long").alias("n_distinct_fp"),
    )
    return agg.withColumn(
        "keep_domain",
        (F.col("n_docs") >= int(min_docs))
        & (F.lit(2) * F.col("n_gopher_keep") >= F.col("n_docs"))
        & (F.lit(10) * F.col("n_distinct_fp") >= F.lit(9) * F.col("n_docs")),
    )


def per_source_cap(
    docs: DataFrame,
    cap: int = 10,
    salt_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, quality_micro, src_rank): keep at most ``cap``
    documents per source, highest quality first — the RefinedWeb/C4
    anti-dominance move that stops one giant host from swamping the
    training mix (the exact-count complement to ``stratified_sample``'s
    rate-based thinning and ``domain_curation``'s whole-source gate).

    Ranking is exact: the shared :func:`quality_score` double quantizes
    to integer micro-units (identical expression both engines), ties
    break by ``id_col`` ascending, so the kept SET and every rank are
    engine-exact integers.

    Scale shape — the hot-host problem this operator EXISTS for also
    shapes its plan: a naive per-source window sorts the giant host's
    millions of rows in one task. Instead the rank runs in two phases
    (the frontier's salted-select pattern, frontier.py): phase 1 ranks
    within (source, id mod salt_buckets) — the hot host's rows spread
    over ``salt_buckets`` tasks — and keeps ``cap`` per bucket, which
    provably contains the true top-``cap`` (any doc in the global
    top-cap has < cap bucket-mates beating it); phase 2 re-ranks the
    <= salt_buckets*cap survivors per source. Both windows are keyed
    shuffles with per-key heap-size sorts; no global sort anywhere."""
    from pyspark.sql import Window

    from pyspider_spark.functions.text import quality_score

    if cap < 1 or salt_buckets < 1:
        raise ValueError("cap and salt_buckets must be >= 1")
    scored = docs.select(
        F.col(id_col),
        F.col(source_col).alias("source"),
        F.floor(quality_score(F.col(text_col)) * F.lit(1e6))
        .cast("long")
        .alias("quality_micro"),
    )
    if salt_buckets > 1:
        w1 = Window.partitionBy(
            "source", F.pmod(F.col(id_col), F.lit(int(salt_buckets)))
        ).orderBy(F.col("quality_micro").desc(), F.col(id_col).asc())
        scored = (
            scored.withColumn("_rk1", F.row_number().over(w1))
            .where(F.col("_rk1") <= int(cap))
            .drop("_rk1")
        )
    w2 = Window.partitionBy("source").orderBy(
        F.col("quality_micro").desc(), F.col(id_col).asc()
    )
    return scored.withColumn(
        "src_rank", F.row_number().over(w2).cast("long")
    ).where(F.col("src_rank") <= int(cap))
