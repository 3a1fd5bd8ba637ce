"""Corpus-level preparation operators that complete the pretraining-data
verbs beyond ``operators/textprep``: boilerplate line removal,
benchmark-contamination detection, sequence packing, and domain-mix
rebalancing.

These are the remaining whole-corpus passes an LLM training pipeline runs
between a crawl dump and the tokenizer (line-frequency boilerplate
stripping as in CCNet / RefinedWeb, n-gram decontamination against eval
benchmarks as in GPT-3 App. C / Llama-2 §A.6, concat-and-chunk sequence
packing, and mixture reweighting), each expressed in the shape Spark
wants at 100 TB:

- ``strip_boilerplate``: line frequency is ONE map-side-combined
  groupBy over per-doc DISTINCT lines; the hot set (lines in >=
  ``min_docs`` docs) is by construction tiny relative to the corpus and
  broadcasts into a left-anti join on the exploded lines; reassembly is
  one doc-keyed exchange (array_sort over collected (pos, line) structs
  — never a window sort).
- ``ngram_contamination``: the benchmark gram set is eval-suite-sized
  (thousands of docs, not billions) → distinct 56-bit gram hashes
  broadcast; the corpus side explodes THIN (doc, gram_hash) rows; one
  doc-keyed count. No corpus-vs-corpus join ever happens.
- ``pack_sequences``: the classic two-phase distributed prefix sum —
  per-bucket window cumsum (bucket = doc_id range, so intra-bucket
  order composes to global order) plus a bucket-totals table that is
  #buckets rows (a single-partition window over it is O(buckets), not
  O(corpus)) broadcast back. The global token offset therefore never
  funnels the corpus through one task, which a naive
  ``Window.orderBy(doc_id)`` cumsum would.
- ``mixture_weights`` / ``rebalance``: per-stratum counts are a
  #strata-row aggregate; the keep decision is the same deterministic
  md5-slice Bernoulli predicate as ``textprep.stratified_sample``
  (engine-portable, resume-safe, pushdown-able) with the rate coming
  from the data itself (target share / observed share).

All are mirrored 1:1 in DuckDB (oracles.strip_boilerplate_sql /
ngram_contamination_sql / pack_sequences_sql / mixture_weights_sql /
rebalance_sql), so the driver gate value-hashes them end to end. The
reference stops at result dumps (result_worker.py); this family is the
Spark-first extension a crawl-to-training-corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyspider_spark.functions.portable_hash import md5_hash56
from pyspider_spark.operators.textprep import SAMPLE_MOD, _words

# --- boilerplate line removal -------------------------------------------------


def _lines(text: Column) -> Column:
    """Trimmed, non-empty lines of a document as an array (row-local)."""
    return F.filter(
        F.transform(F.split(F.coalesce(text, F.lit("")), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )


def hot_lines(
    docs: DataFrame, min_docs: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(line, n_docs_line): lines appearing in at least ``min_docs``
    DISTINCT documents — navigation bars, footers, cookie banners. The
    per-doc array_distinct happens row-local BEFORE the explode, so the
    groupBy's map-side combine sees each (doc, line) once; the result is
    small by construction (a line must recur across documents to
    qualify), which is what lets the removal join broadcast."""
    per_doc = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(_lines(F.col(text_col)))).alias("line"),
    )
    return (
        per_doc.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs_line"))
        .where(F.col("n_docs_line") >= min_docs)
    )


def strip_boilerplate(
    docs: DataFrame, min_docs: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text_clean, n_lines, n_removed): every occurrence of a
    hot line (>= ``min_docs`` docs) removed, remaining lines rejoined in
    original order. CCNet-style line-level dedup against template
    boilerplate.

    Scale shape: explode → broadcast left-anti against the hot set → one
    doc-keyed groupBy whose ordering need is satisfied by a row-local
    array_sort over (pos, line) structs (no window, no secondary sort).
    Docs whose every line was boilerplate (or that were empty) survive
    with text_clean = '' via the left join from the base table."""
    hot = F.broadcast(hot_lines(docs, min_docs, id_col, text_col).select("line"))
    exploded = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(_lines(F.col(text_col))).alias("pos", "line"),
    )
    rebuilt = (
        exploded.join(hot, "line", "left_anti")
        .groupBy("doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("_n_kept"),
        )
    )
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.size(_lines(F.col(text_col))).cast("long").alias("n_lines"),
    )
    return base.join(rebuilt, "doc", "left").select(
        F.col("doc").alias(id_col),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias("n_removed"),
    )


# --- benchmark contamination --------------------------------------------------


def _word_ngrams(words_col: str, n: int) -> Column:
    """Space-joined word n-grams of an array<string> column, row-local;
    empty when the doc has fewer than ``n`` words."""
    return F.expr(
        f"CASE WHEN size({words_col}) >= {int(n)} THEN "
        f"transform(sequence(1, size({words_col}) - {int(n) - 1}), "
        f"p -> array_join(slice({words_col}, p, {int(n)}), ' ')) "
        f"ELSE array() END"
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_grams, n_hits, contaminated): how many of each corpus
    document's DISTINCT word n-grams appear anywhere in the benchmark
    set (GPT-3 App. C / Llama-2 §A.6 style decontamination, n=8 default
    as in those recipes).

    Scale shape: the benchmark is eval-suite-sized, so its distinct gram
    set reduces to 56-bit portable hashes and BROADCASTS; the 100-TB
    corpus side explodes thin (doc, gram_hash) longs — never gram
    strings — and the only exchange is the doc-keyed hit count. A
    corpus×corpus join never occurs. The 56-bit hash admits a ~|grams|²/2⁵⁶
    false-hit probability per doc — standard decontamination practice."""
    bench_text_col = bench_text_col or text_col

    def gram_table(df: DataFrame, tc: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("doc"), _words(F.col(tc)).alias("w")
        ).select("doc", F.array_distinct(_word_ngrams("w", n)).alias("grams"))

    # the corpus tokenize + gram + md5 pass feeds BOTH output branches
    # (the hit join and the per-doc gram count); reduce it ONCE to thin
    # per-row hash arrays and persist, so the expensive pass runs a single
    # time (guide §5: persist when recomputation is the expensive side —
    # previously the whole gram pipeline ran twice). Hashing before the
    # explode is value-identical: the hash is per distinct gram string
    # either way.
    dg = (
        gram_table(docs, text_col)
        .select(
            "doc",
            F.transform(F.col("grams"), lambda g: md5_hash56(g)).alias("ghs"),
        )
        .persist()
    )
    bench_hashes = F.broadcast(
        gram_table(benchmark, bench_text_col)
        .select(F.explode("grams").alias("g"))
        .select(md5_hash56(F.col("g")).alias("gh"))
        .distinct()
    )
    hits = (
        dg.select("doc", F.explode("ghs").alias("gh"))
        .join(bench_hashes, "gh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return (
        dg.select("doc", F.size("ghs").cast("long").alias("n_grams"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.col("n_grams"),
            F.coalesce(F.col("_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("_hits"), F.lit(0)) >= F.lit(int(min_hits))).alias(
                "contaminated"
            ),
        )
    )


# --- sequence packing (concat-and-chunk) ---------------------------------------


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    bucket_span: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, start_offset, pack_id, pack_pos): GPT-style
    concat-and-chunk packing — documents concatenated in doc_id order
    into one token stream cut every ``max_tokens``; each doc lands at
    ``start_offset`` = the exact global prefix sum of token counts, in
    pack ``floor(start_offset / max_tokens)`` at in-pack position
    ``start_offset % max_tokens``.

    The global prefix sum is the scale hazard: ``Window.orderBy(doc_id)``
    with no partition funnels the whole corpus through ONE task. This is
    the classic two-phase scan instead: bucket = floor(doc_id /
    bucket_span) (a RANGE bucket, so intra-bucket order composes to the
    global order), cumsum WITHIN each bucket (partitioned window,
    parallel), then per-bucket totals — #buckets rows — get their own
    exclusive prefix in a single-partition window that is O(buckets),
    not O(corpus), and broadcast back. Choose bucket_span so #buckets ≈
    a few × cluster cores."""
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"),
        F.floor(F.col(id_col) / F.lit(int(bucket_span))).alias("_bucket"),
    )
    w_intra = (
        Window.partitionBy("_bucket")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = base.withColumn("_cum", F.sum("n_tokens").over(w_intra))
    # bucket totals: #buckets rows — the ONLY single-partition window in
    # the plan runs over this tiny table, never the corpus
    w_bucket = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("_tot"))
        .select(
            "_bucket",
            F.coalesce(F.sum("_tot").over(w_bucket), F.lit(0)).alias("_off"),
        )
    )
    start = F.col("_off") + F.col("_cum") - F.col("n_tokens")
    return intra.join(F.broadcast(offsets), "_bucket").select(
        F.col("doc").alias(id_col),
        F.col("n_tokens"),
        start.alias("start_offset"),
        F.floor(start / F.lit(int(max_tokens))).cast("long").alias("pack_id"),
        (start % F.lit(int(max_tokens))).alias("pack_pos"),
    )


# --- domain-mix rebalancing -----------------------------------------------------


def _weights_raw(
    docs: DataFrame, targets: dict[str, float], stratum_col: str
) -> DataFrame:
    """(stratum, n_docs, _w): unrounded weight = target share / observed
    share = target_frac × total / n_docs. Kept unrounded so the
    ``rebalance`` threshold compares the same IEEE double in both
    engines (rounding is display-only, in ``mixture_weights``)."""
    counts = docs.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    total = counts.agg(F.sum("n_docs").alias("_total"))
    tgt = F.lit(0.0)
    for s, t in sorted(targets.items()):
        tgt = F.when(F.col("stratum") == s, F.lit(float(t))).otherwise(tgt)
    return counts.crossJoin(F.broadcast(total)).select(
        "stratum",
        "n_docs",
        (tgt * F.col("_total").cast("double") / F.col("n_docs").cast("double")).alias(
            "_w"
        ),
    )


def mixture_weights(
    docs: DataFrame, targets: dict[str, float], stratum_col: str = "lang"
) -> DataFrame:
    """(stratum, n_docs, weight, sample_rate): per-stratum resampling
    weight to move the corpus to the ``targets`` mixture (target share /
    observed share) and the capped Bernoulli keep-rate min(weight, 1).
    Weights > 1 mean the stratum is UNDER-represented (needs upsampling
    / more epochs — flagged, not applied: subsampling can only remove).
    A #strata-row aggregate — trivially broadcastable."""
    return _weights_raw(docs, targets, stratum_col).select(
        "stratum",
        "n_docs",
        F.round(F.col("_w"), 6).alias("weight"),
        F.round(F.least(F.col("_w"), F.lit(1.0)), 6).alias("sample_rate"),
    )


def rebalance(
    docs: DataFrame,
    targets: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """(doc_id, stratum): deterministic subsample moving the corpus
    toward the target mixture — keep a row iff md5_hash56(salt ‖ id) mod
    1e6 < min(weight, 1) × 1e6, with the weight computed FROM the data
    (unlike ``stratified_sample``, whose rates are caller-supplied).
    Same portable-hash Bernoulli predicate: reproducible across engines,
    runs, and re-shardings, and the broadcast rate join keeps it one
    scan + one tiny join at 100 TB."""
    rates = F.broadcast(
        _weights_raw(docs, targets, stratum_col).select(
            "stratum", F.least(F.col("_w"), F.lit(1.0)).alias("_rate")
        )
    )
    h = F.pmod(md5_hash56(F.col(id_col).cast("string"), salt=salt), F.lit(SAMPLE_MOD))
    return (
        docs.join(rates, docs[stratum_col] == rates["stratum"])
        .where(h.cast("double") < F.col("_rate") * F.lit(float(SAMPLE_MOD)))
        .select(F.col(id_col), F.col(stratum_col).alias("stratum"))
    )


# --- global paragraph dedup (keep-first) ---------------------------------------


def dedup_paragraphs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text_clean, n_lines, n_removed): corpus-GLOBAL exact
    paragraph deduplication, keep-first — every occurrence of a paragraph
    after its first (ordered by (doc_id, position)) is removed, including
    repeats later in the same document. The RefinedWeb / "Deduplicating
    Training Data Makes Language Models Better" exact-duplicate-span
    recipe at paragraph granularity (unit = trimmed non-empty line, like
    ``strip_boilerplate`` — which removes by FREQUENCY; this removes by
    PRECEDENCE, keeping exactly one copy corpus-wide).

    Scale shape: explode → key on the full 128-bit md5 of the line (the
    shuffle carries a 32-char key + (doc, pos) longs, not document text
    for grouping) → ONE window partitioned BY THE KEY (tiny groups,
    fully parallel — never an unpartitioned sort) picks the first
    occurrence → doc-keyed rebuild via row-local array_sort, no second
    window. Nothing broadcasts; nothing is corpus-wide-sorted."""
    exploded = docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(_lines(F.col(text_col))).alias("pos", "line"),
    ).withColumn("key", F.md5(F.col("line")))
    w_key = Window.partitionBy("key").orderBy("doc", "pos")
    kept = (
        exploded.withColumn("_rn", F.row_number().over(w_key))
        .where(F.col("_rn") == 1)
        .drop("_rn", "key")
    )
    rebuilt = kept.groupBy("doc").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.size(_lines(F.col(text_col))).cast("long").alias("n_lines"),
    )
    return base.join(rebuilt, "doc", "left").select(
        F.col("doc").alias(id_col),
        F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias("n_removed"),
    )


# --- URL filtering --------------------------------------------------------------

# C4 / RefinedWeb-style lexical URL blocklist terms (the public recipes
# match curated word lists against the whole URL, lowercased)
DEFAULT_URL_BLOCK_RE = "(porn|xxx|casino|gambl|viagra|escort|lottery)"

_URL_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"


def url_filter(
    pages: DataFrame,
    blocked_domains: list[str],
    block_re: str = DEFAULT_URL_BLOCK_RE,
    max_len: int = 2048,
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """(id, url, host, reason, kept): C4/RefinedWeb-style URL filtering —
    scheme gate (http/https only), registrable-domain blocklist
    (UT1-style: ANY dot-suffix of the host matches, so a blocklisted
    ``badsite.com`` also blocks ``cdn.eu.badsite.com``), lexical blocklist
    regex over the whole lowercased URL, and a length cap. ``reason`` is
    the FIRST failing rule in that fixed order (NULL ⇒ kept).

    Scale shape: 100% row-local whole-stage-codegen expressions — the
    blocklist is a literal IN-array (``arrays_overlap`` against the
    host's dot-suffixes, built row-local), so the plan has NO join, NO
    exchange, NO UDF; the filter composes with any scan and pushes down
    as a plain predicate."""
    host = F.lower(
        F.element_at(F.split(F.regexp_extract(F.col(url_col), _URL_HOST_RE, 1), ":"), 1)
    )
    labels = F.split(host, r"\.")
    n = F.size(labels)
    suffixes = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )
    blocked = F.array(*[F.lit(d.lower()) for d in sorted(set(blocked_domains))])
    reason = (
        F.when(~F.col(url_col).rlike("^https?://"), F.lit("scheme"))
        .when(F.arrays_overlap(suffixes, blocked), F.lit("domain"))
        .when(F.lower(F.col(url_col)).rlike(block_re), F.lit("pattern"))
        .when(F.length(F.col(url_col)) > max_len, F.lit("length"))
        .otherwise(F.lit(None).cast("string"))
    )
    return pages.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        host.alias("host"),
        reason.alias("reason"),
    ).withColumn("kept", F.col("reason").isNull())


# --- cross-document duplicated-span detection ----------------------------------


def span_dedup(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_spans, dup_spans): for every document, how many of its
    DISTINCT ``n``-token spans also occur in at least ``min_docs - 1``
    OTHER documents — the detection half of exact-substring training-data
    dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better"; public), at fixed span length instead of a suffix
    array. Downstream policy (drop the doc, cut the span) is the
    caller's; integer counts keep the oracle comparison exact.

    Scale shape — this is corpus x corpus, so NOTHING here broadcasts:
    spans reduce row-local to 56-bit hashes (the same shuffle-free
    transform(sequence) shingling as dedup_minhash), the span
    doc-frequency is ONE map-side-combined groupBy over thin (doc, gh)
    longs, and the duplicated-span set — which at 100 TB is itself
    corpus-scale — flows back through a plain shuffle hash join on the
    8-byte key, never a broadcast. The per-doc hit count is the only
    doc-keyed exchange. Hot spans (the same boilerplate sentence in
    millions of docs) skew the gram groupBy's reduce side; map-side
    partial aggregation absorbs them (each input partition emits one
    partial row per gram).
    """
    per_doc = docs.select(
        F.col(id_col).alias("doc"), _words(F.col(text_col)).alias("w")
    ).select(
        "doc",
        F.array_distinct(
            F.transform(_word_ngrams("w", n), lambda g: md5_hash56(g))
        ).alias("ghs"),
    )
    # rows are distinct per (doc, gh) by construction, so count(*) IS the
    # span's document frequency. `thin` is referenced twice — the shingle
    # recompute is cheaper than persisting corpus-scale state.
    thin = per_doc.select("doc", F.explode("ghs").alias("gh"))
    dup = (
        thin.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= int(min_docs))
        .select("gh")
    )
    hits = thin.join(dup, "gh").groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("_dup")
    )
    return (
        per_doc.select("doc", F.size("ghs").cast("long").alias("n_spans"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "n_spans",
            F.coalesce(F.col("_dup"), F.lit(0)).cast("long").alias("dup_spans"),
        )
    )


# --- deterministic training-shard assignment ---------------------------------


def training_shards(
    docs: DataFrame,
    n_shards: int = 64,
    seed: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, shard, shard_pos, tok_offset): the writer verb
    at the end of the pipeline — assign every document to one of
    ``n_shards`` training shards under a DETERMINISTIC pseudo-random
    global shuffle, with its in-shard position and exclusive token
    offset (what a dataloader needs to seek). The permutation key is the
    portable md5-slice hash of the doc id under a seeded salt, so the
    assignment is reproducible across engines, reruns, and resumes (the
    property RNG-based ``orderBy(rand())`` shuffles lack), and uniform
    (no hot shards by construction).

    Scale shape: the plan is exactly the minimum a shuffled shard write
    costs — ONE hash exchange on the shard key plus a per-shard sort for
    the window pair (row_number + running token sum share one sort).
    There is no global ordering anywhere: no rangepartitioning, no
    single-partition window, no driver collect (plan-pinned by
    ``test_training_shards_plan``). Choose ``n_shards`` ≈ a few × the
    writer parallelism so each shard sorts (and spills) independently;
    at 100 TB the same frame feeds
    ``df.repartition("shard").sortWithinPartitions(...).write
    .partitionBy("shard")`` unchanged."""
    key = md5_hash56(F.col(id_col).cast("string"), salt=f"shuffle:{seed}")
    base = docs.select(
        F.col(id_col),
        F.size(_words(F.col(text_col))).cast("long").alias("n_tokens"),
        key.alias("_key"),
    ).withColumn("shard", (F.col("_key") % int(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return base.select(
        id_col,
        "n_tokens",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("shard_pos"),
        F.coalesce(
            F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("tok_offset"),
    )


# --- cross-document duplicated-substring spans --------------------------------


def dup_substring_spans(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens, n_grams): the actual
    maximal duplicated token ranges per document — the cut list that
    exact-substring training-data dedup removes (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"; public),
    at fixed gram length ``n`` instead of a suffix array. This completes
    :func:`span_dedup`, which only counts duplicated grams per doc: an
    ``n``-gram is duplicated when it occurs in at least ``min_docs``
    distinct documents, and overlapping-or-adjacent duplicated gram
    intervals ``[pos, pos + n - 1]`` merge into one maximal span
    (gaps-and-islands: a new island starts when the next duplicated
    start position exceeds the previous by more than ``n``). Positions
    are 0-based token offsets; ``n_grams`` is how many duplicated grams
    the span absorbed. Integer-only output keeps the oracle hash exact.

    Scale shape — corpus x corpus, so nothing broadcasts: grams reduce
    row-local to 56-bit hashes (shuffle-free transform(sequence)
    shingling), the gram document-frequency is a distinct + map-side-
    combined groupBy over thin (doc, gh) longs, and the duplicated-gram
    set flows back through a plain shuffle hash join on the 8-byte key.
    The island merge windows per DOC over only that doc's duplicated
    positions — bounded by doc length, never corpus-wide. Hot grams
    (boilerplate sentences in millions of docs) skew the doc-frequency
    reduce; map-side partials absorb them, and the join back is
    probe-side-skewed only, which AQE skew splitting handles."""
    # persisted at the ARRAY level, before the explode: the gram pipeline
    # feeds both the doc-frequency branch and the hit join (the r5 1.75x
    # persist), and — measured r06 at sf1.0 — a Generate whose input is
    # the computed transform/md5 expression cost 25s where the same
    # pipeline as a plain projection cost 4s; posexplode from a CACHED
    # attribute costs ~0.4s. Cached rows are thin (doc, array<long>).
    per_doc = docs.select(
        F.col(id_col).alias("doc"), _words(F.col(text_col)).alias("w")
    ).select(
        "doc",
        F.transform(_word_ngrams("w", n), lambda g: md5_hash56(g)).alias("ghs"),
    ).persist()
    pos = per_doc.select("doc", F.posexplode("ghs").alias("pos", "gh"))
    dup = (
        pos.select("doc", "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .where(F.col("nd") >= int(min_docs))
        .select("gh")
    )
    hit = pos.join(dup, "gh").select("doc", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    prev = F.lag("pos").over(w)
    flagged = hit.withColumn(
        "_new",
        F.when(prev.isNull() | (F.col("pos") - prev > int(n)), F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn(
        "_island", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        flagged.groupBy("doc", "_island")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(int(n) - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
        .select(
            F.col("doc").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
            "n_grams",
        )
    )


def apply_span_cuts(
    docs: DataFrame,
    n: int = 10,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text_cut, n_tokens, n_removed): the APPLICATION half of
    exact-substring dedup — every token inside a :func:`dup_substring_spans`
    cut range is removed and the survivors rejoin in original order (Lee
    et al. 2021's "remove the duplicated span, keep the remainder" policy,
    at fixed gram length). Tokenization is the shared lowercase-alnum
    ``_words``, so ``text_cut`` is a normalized token stream, not the raw
    byte string — the shape a tokenizer consumes next. ``n_tokens`` /
    ``n_removed`` are longs, so the oracle hash pins the whole edit.

    Scale shape: the cut list aggregates to ONE row per affected doc
    (span structs, bounded by doc length / n) and joins back doc-keyed —
    a shuffle hash join whose right side is only docs-with-duplication.
    The edit itself is row-local (filter-with-index over the token array
    against an exists() over the doc's own cut structs): no explode to
    token rows, no window. Unaffected docs pass through the left join
    with a null cut list and keep every token."""
    spans = dup_substring_spans(docs, n, min_docs, id_col, text_col)
    cuts = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_cuts")
    )
    base = docs.select(F.col(id_col), _words(F.col(text_col)).alias("_w"))
    kept = F.when(F.col("_cuts").isNull(), F.col("_w")).otherwise(
        F.filter(
            "_w",
            lambda tok, i: ~F.exists(
                "_cuts",
                lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
            ),
        )
    )
    return (
        base.join(cuts, id_col, "left")
        .withColumn("_kept", kept)
        .select(
            id_col,
            F.array_join("_kept", " ").alias("text_cut"),
            F.size("_w").cast("long").alias("n_tokens"),
            (F.size("_w") - F.size("_kept")).cast("long").alias("n_removed"),
        )
    )


def pack_interleaved_spans(
    docs: DataFrame,
    max_tokens: int = 64,
    media_tokens: int = 32,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """(doc_id, ord, kind, cost, seq): greedy token-budget packing of an
    INTERLEAVED document's span sequence into training sequences — the
    multimodal-interleaved analogue of `pack_sequences` (which packs flat
    token streams). Span order is preserved (the whole point of an
    interleaved corpus is the text/media ORDER), media spans are ATOMIC
    at a fixed token budget (a patchified image can't straddle two
    sequences), link spans cost one placeholder token, and text spans
    cost their whitespace token count. Greedy rule: a span whose cost
    would overflow the current sequence opens the next one; a span larger
    than ``max_tokens`` gets a sequence of its own (flagged by cost >
    max_tokens, never silently truncated).

    Scale shape: the fold is ONE row-local ``aggregate`` over the span
    array (the accumulator is the per-span (seq, used) state list —
    lambda-bound only, so no Catalyst lambda-collapse re-evaluation; see
    dedup.winnow_fingerprints for the anti-pattern), then one posexplode
    of a single arrays_zip — zero shuffle, zero Python, embarrassingly
    parallel per document."""
    L, M = int(max_tokens), int(media_tokens)
    states = F.expr(f"""
        aggregate(
            transform({spans_col}, s -> CAST(CASE
                WHEN s.kind = 'media' THEN {M}
                WHEN s.kind = 'link' THEN 1
                WHEN s.text IS NULL OR trim(s.text) = '' THEN 0
                ELSE size(split(trim(s.text), '\\\\s+'))
            END AS BIGINT)),
            CAST(array() AS ARRAY<STRUCT<seq: BIGINT, used: BIGINT, cost: BIGINT>>),
            (acc, c) -> CASE
                WHEN size(acc) = 0
                    THEN array(named_struct(
                        'seq', CAST(0 AS BIGINT), 'used', c, 'cost', c))
                WHEN element_at(acc, -1).used + c > {L}
                    THEN concat(acc, array(named_struct(
                        'seq', element_at(acc, -1).seq + CAST(1 AS BIGINT),
                        'used', c, 'cost', c)))
                ELSE concat(acc, array(named_struct(
                    'seq', element_at(acc, -1).seq,
                    'used', element_at(acc, -1).used + c, 'cost', c)))
            END)
    """)
    return (
        docs.select(F.col(id_col), F.col(spans_col), states.alias("st"))
        .select(id_col, spans_col, F.posexplode("st").alias("i", "e"))
        .select(
            F.col(id_col),
            (F.col("i") + 1).cast("long").alias("ord"),
            F.element_at(F.col(spans_col), F.col("i") + 1)["kind"].alias("kind"),
            F.col("e")["cost"].alias("cost"),
            F.col("e")["seq"].alias("seq"),
        )
    )
