"""Corpus-prep operators (operators/textprep): repetition stats, PII
scrubbing, stratified sampling, TF-IDF top-k. The sf0.01 oracle match is
tests/test_queries_oracle.py; these are planted-fixture semantics tests
for the paths the synthetic corpus doesn't exercise (newlines, PII
strings, skewed strata)."""

import math

import pytest
from pyspark.sql import functions as F

from pyspider_spark.operators.textprep import (
    repetition_filter,
    repetition_stats,
    scrub_pii,
    stratified_sample,
    tfidf_topk,
)


def test_repetition_stats_planted(spark):
    docs = spark.createDataFrame(
        [
            # 4 non-blank lines, 2 distinct -> dup_line_frac 0.5;
            # 2 paragraphs, both distinct -> dup_para_frac 0.0
            (0, "spam line\nspam line\n\nspam line\nother line"),
            # same 2-gram "buy now" 3x in 6 words -> 3/5 of the 5 slots
            (1, "buy now buy now buy now"),
            (2, "one"),          # < 2 words: top_2gram_frac defined 0.0
            (3, ""),             # empty: all zeros
            (4, None),           # null-safe
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[0]["n_lines"] == 4
    assert out[0]["dup_line_frac"] == pytest.approx(0.5)
    assert out[0]["dup_para_frac"] == pytest.approx(0.0)
    assert out[1]["top_2gram_frac"] == pytest.approx(3 / 5)
    assert out[1]["dup_line_frac"] == 0.0
    assert out[2]["top_2gram_frac"] == 0.0
    for d in (3, 4):
        assert out[d]["n_lines"] == 0
        assert (out[d]["dup_line_frac"], out[d]["top_2gram_frac"]) == (0.0, 0.0)


def test_repetition_filter_drops_spam(spark):
    docs = spark.createDataFrame(
        [
            (0, "a perfectly ordinary sentence with many different words"),
            (1, "spam spam spam spam spam spam spam spam"),  # top-2gram 1.0
            (2, "dup line\ndup line\ndup line\nreal line"),  # dup lines 0.5
        ],
        "doc_id long, text string",
    )
    kept = {r["doc_id"] for r in repetition_filter(docs).collect()}
    assert kept == {0}


def test_scrub_pii_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail a@b.com and c.d@e.org, call +1 (415) 555-0199,"
                " host 10.0.0.1"),
            (1, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert (out[0]["n_email"], out[0]["n_phone"], out[0]["n_ipv4"]) == (2, 1, 1)
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (0, 0, 0)
    # the fingerprint is over the REDACTED text: same non-PII skeleton
    # with different PII values -> same fingerprint
    # NB: PII classes can overlap (a long dotted IP also matches the
    # phone class — fixed application order makes that deterministic),
    # so the twin uses an equally short IP that only the ipv4 class hits
    twin = spark.createDataFrame(
        [(0, "mail x@y.net and qq.w@zz.io, call +44 (020) 555-7777,"
             " host 10.0.0.9")],
        "doc_id long, text string",
    )
    # phone/ip literal lengths differ but redaction tokens normalize them
    a = scrub_pii(docs.where("doc_id = 0")).collect()[0]["clean_fp"]
    b = scrub_pii(twin).collect()[0]["clean_fp"]
    assert a == b


def test_stratified_sample_deterministic_and_rated(spark):
    docs = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    rates = {"en": 0.5, "zh": 0.05}
    got = stratified_sample(docs, rates, stratum_col="lang")
    counts = {r["lang"]: r["n"] for r in
              got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # 2000 per stratum; hash-Bernoulli should land near rate * n
    assert abs(counts["en"] - 1000) < 150
    assert abs(counts.get("zh", 0) - 100) < 60
    # exactly reproducible: same ids on a different partitioning
    ids1 = sorted(r["doc_id"] for r in got.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(
            docs.repartition(7), rates, stratum_col="lang"
        ).collect()
    )
    assert ids1 == ids2
    # unknown stratum defaults to rate 0.0 (dropped)
    extra = spark.createDataFrame([(99999, "xx")], "doc_id long, lang string")
    assert stratified_sample(extra, rates, stratum_col="lang").count() == 0


def test_stratified_sample_is_pushdown_predicate(spark, tmp_path):
    """The sampler must stay a plain filter (no shuffle, no UDF) so
    Catalyst keeps it next to the scan."""
    p = str(tmp_path / "docs")
    spark.range(0, 100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    ).write.parquet(p)
    out = stratified_sample(
        spark.read.parquet(p), {"en": 0.5}, stratum_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_topk_planted(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple banana apple cherry"),
            (1, "banana banana date"),
            (2, "apple date date date"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(docs, k=2, min_df=1)
    rows = {(r["doc_id"], r["term"]): r for r in out.collect()}
    # doc 0: apple tf=2 df=2 -> 2*ln(1.5); cherry tf=1 df=1 -> ln(3)
    assert rows[(0, "apple")]["score"] == pytest.approx(
        round(2 * math.log(3 / 2), 6)
    )
    assert rows[(0, "cherry")]["score"] == pytest.approx(round(math.log(3.0), 6))
    # every doc returns at most k rows
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 2 for r in per_doc)
    # min_df prunes singleton terms
    pruned = tfidf_topk(docs, k=3, min_df=2)
    assert pruned.where(F.col("term") == "cherry").count() == 0


def test_tfidf_doc_freq_is_broadcast(spark):
    """The vocabulary-sized df table must come back as a broadcast join —
    a shuffle join on the term key would re-exchange the full term-count
    table a second time."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma{i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    plan = tfidf_topk(docs, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_stats_no_whole_doc_window(spark):
    """top_2gram uses grouped max, never a window over exploded gram rows
    (a per-doc sort of every 2-gram would be the 100-TB anti-pattern)."""
    docs = spark.createDataFrame(
        [(0, "a b c a b")], "doc_id long, text string"
    )
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# --- unigram LM scoring ----------------------------------------------------


def test_unigram_logprob_exact_micro_nats(spark):
    """Hand-checked corpus: 6 tokens total, 'a' x3, 'b' x2, 'c' x1 —
    per-token micro-nats are floor(ln(cnt/6) * 1e6) and the per-doc sum
    is exact integer arithmetic."""
    import math

    from pyspider_spark.operators.textprep import unigram_logprob

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b c"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    q = {t: math.floor(math.log(c / 6.0) * 1e6) for t, c in {"a": 3, "b": 2, "c": 1}.items()}
    assert out[0]["lp_micro_sum"] == 2 * q["a"] + q["b"]
    assert out[1]["lp_micro_sum"] == q["a"] + q["b"] + q["c"]
    assert out[1]["avg_lp_micro"] == math.floor((q["a"] + q["b"] + q["c"]) / 3.0)
    assert out[0]["n_tokens"] == 3
    # empty doc surfaces with 0 scores, zero tokens (never NULL)
    assert out[2]["n_tokens"] == 0 and out[2]["lp_micro_sum"] == 0
    assert out[2]["avg_lp_micro"] == 0


def test_unigram_logprob_partitioning_invariant(spark):
    """The quantize-before-sum contract: identical output at 1 and many
    partitions (a float avg would drift in the last ulps)."""
    from pyspider_spark.operators.textprep import unigram_logprob

    rows = [(i, ("tok%d " % (i % 7)) * (i % 5 + 1) + "shared filler words")
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, unigram_logprob(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, unigram_logprob(docs.repartition(16)).collect()))
    assert a == b


# --- DSIR importance weighting ----------------------------------------------


def test_dsir_logratio_exact_micro_nats(spark):
    """Hand-checked two-domain corpus. raw: a x2, b x1, c x1 (total 4,
    vocab 3); target (lang='en'): a x1, b x1 (total 2). Add-1 smoothing
    over the raw vocab: p_t = (cnt_t+1)/(2+3), p_r = (cnt_r+1)/(4+3);
    per-token weight = floor(ln(p_t)*1e6) - floor(ln(p_r)*1e6)."""
    import math

    from pyspider_spark.operators.textprep import dsir_logratio

    docs = spark.createDataFrame(
        [(0, "en", "a b"), (1, "de", "a c"), (2, "en", None)],
        "doc_id long, lang string, text string",
    )
    out = {r["doc_id"]: r for r in dsir_logratio(docs).collect()}

    def w(cnt_t, cnt_r):
        lp_t = math.floor(math.log((cnt_t + 1) / 5.0) * 1e6)
        lp_r = math.floor(math.log((cnt_r + 1) / 7.0) * 1e6)
        return lp_t - lp_r

    assert out[0]["dsir_micro_sum"] == w(1, 2) + w(1, 1)
    assert out[1]["dsir_micro_sum"] == w(1, 2) + w(0, 1)
    assert out[0]["n_tokens"] == 2
    # token 'c' never appears in the target domain -> negative weight
    assert w(0, 1) < 0
    # the in-domain doc outscores the out-of-domain doc
    assert out[0]["avg_dsir_micro"] > out[1]["avg_dsir_micro"]
    # empty doc surfaces with 0 scores (never NULL)
    assert out[2]["n_tokens"] == 0 and out[2]["dsir_micro_sum"] == 0


def test_dsir_logratio_partitioning_invariant(spark):
    """Quantize-before-sum contract, same as unigram_logprob: identical
    output at 1 and 16 partitions."""
    from pyspider_spark.operators.textprep import dsir_logratio

    rows = [
        (i, "en" if i % 3 else "de",
         ("tok%d " % (i % 7)) * (i % 5 + 1) + "shared filler words")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(map(tuple, dsir_logratio(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, dsir_logratio(docs.repartition(16)).collect()))
    assert a == b


def test_dsir_topk_select_deterministic_and_heap_shaped(spark):
    """Top-k keeps the highest-weight docs with doc_id tie-break, and the
    plan is TakeOrderedAndProject (per-partition heap), not a global
    sort."""
    from pyspider_spark.operators.textprep import dsir_logratio, dsir_topk_select

    rows = [
        (i, "en" if i % 3 else "de",
         ("tok%d " % (i % 7)) * (i % 5 + 1) + "shared filler words")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = dsir_topk_select(docs, k=10)
    assert "TakeOrderedAndProject" in out._jdf.queryExecution().executedPlan().toString()

    got = [(r["doc_id"], r["avg_dsir_micro"]) for r in out.collect()]
    all_w = {r["doc_id"]: r["avg_dsir_micro"] for r in dsir_logratio(docs).collect()}
    want = sorted(all_w.items(), key=lambda t: (-t[1], t[0]))[:10]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == want
    # the kept set is k in-domain-looking docs: every kept weight >= every
    # dropped weight
    kept = {d for d, _ in got}
    assert min(all_w[d] for d in kept) >= max(
        w for d, w in all_w.items() if d not in kept
    )


def _py_quantile_keep(weights, keep_num, keep_den):
    """Pure-Python mirror of dsir_quantile_select's threshold rule:
    lowest score whose ties-inclusive cumulative count covers
    ceil(total * keep_num / keep_den); keep everything >= it."""
    total = len(weights)
    cume = 0
    thr = None
    for score in sorted(set(weights.values()), reverse=True):
        cume += sum(1 for w in weights.values() if w == score)
        if cume * keep_den >= total * keep_num:
            thr = score
            break
    return {d for d, w in weights.items() if w >= thr}


def test_dsir_quantile_select_matches_mirror_and_is_scan_shaped(spark):
    """Kept set matches the ties-inclusive histogram threshold mirror;
    the plan has NO TakeOrderedAndProject / global corpus sort — the one
    Window runs over the score histogram aggregate only."""
    from pyspider_spark.operators.textprep import dsir_logratio, dsir_quantile_select

    rows = [
        (i, "en" if i % 3 else "de",
         ("tok%d " % (i % 7)) * (i % 5 + 1) + "shared filler words")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = dsir_quantile_select(docs, keep_num=1, keep_den=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan
    assert plan.count("Window ") == 1  # histogram CDF only, never corpus rows

    weights = {r["doc_id"]: r["avg_dsir_micro"] for r in dsir_logratio(docs).collect()}
    want = _py_quantile_keep(weights, 1, 4)
    got = {r["doc_id"] for r in out.collect()}
    assert got == want
    # budget covered, overshoot only by the boundary tie group
    assert len(got) >= -(-len(weights) // 4)
    boundary = min(weights[d] for d in got)
    assert len(got) - sum(1 for d in got if weights[d] == boundary) < -(-len(weights) // 4)


def test_dsir_quantile_select_ties_share_fate_and_partition_invariant(spark):
    """Docs with identical texts (identical weights) at the threshold
    are kept or dropped TOGETHER even when the budget lands mid-group,
    and the kept set is invariant to input partitioning."""
    from pyspider_spark.operators.textprep import dsir_quantile_select

    # 2 high-weight docs, then 6 identical mid-weight docs, 4 low: a
    # 1/4 budget (3 of 12) lands inside the tie group of 6.
    rows = (
        [(i, "en", "alpha beta gamma") for i in range(2)]
        + [(10 + i, "en", "shared middling text here") for i in range(6)]
        + [(100 + i, "de", "nur deutsche woerter hier drin") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    kept = {r["doc_id"] for r in dsir_quantile_select(docs, 1, 4).collect()}
    mids = {10 + i for i in range(6)}
    assert kept & mids in (set(), mids)  # never a partial tie group
    a = {r["doc_id"] for r in dsir_quantile_select(docs.coalesce(1), 1, 4).collect()}
    b = {r["doc_id"] for r in dsir_quantile_select(docs.repartition(16), 1, 4).collect()}
    assert a == b == kept

    import pytest as _pytest

    with _pytest.raises(ValueError):
        dsir_quantile_select(docs, 3, 2)


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    """Pure-Python BM25 mirror (same quantize-before-sum rule)."""
    import math
    import re

    toks = {d: re.findall("[a-z0-9]+", (t or "").lower()) for d, t in rows}
    n_docs = float(len(rows))
    total = float(sum(len(v) for v in toks.values()))
    avgdl = total / n_docs
    tset = set(terms)
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in tset
    }
    out = {}
    for d, v in toks.items():
        s, n = 0, 0
        for t in tset:
            tf = v.count(t)
            if not tf or not df[t]:
                continue
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            tfn = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * len(v) / avgdl))
            s += math.floor(idf * tfn * 1e6)
            n += 1
        if n:
            out[d] = (s, n)
    return out


def test_bm25_topk_matches_python_mirror(spark):
    """Scores match the quantized BM25 mirror exactly (int64), docs with
    no query term never appear, and the k cut keeps the highest scores
    with doc_id tie-break."""
    from pyspider_spark.operators.textprep import bm25_topk

    rows = [
        (0, "spark joins hash tables fast hash hash"),
        (1, "vector scan with a hash probe"),
        (2, "nothing relevant here at all"),
        (3, "join join join vector"),
        (4, ""),
        (5, "hash"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["bm25_micro"], r["n_terms"])
        for r in bm25_topk(docs, ["hash", "join", "vector"], k=10).collect()
    }
    want = _py_bm25(rows, ["hash", "join", "vector"])
    assert got == want
    assert 2 not in got and 4 not in got

    top2 = bm25_topk(docs, ["hash", "join", "vector"], k=2).collect()
    full = sorted(want.items(), key=lambda t: (-t[1][0], t[0]))[:2]
    assert [(r["doc_id"], (r["bm25_micro"], r["n_terms"])) for r in top2] == full

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bm25_topk(docs, [])


def test_bm25_topk_heap_shaped_and_partition_invariant(spark):
    """Plan contract: top-k compiles to TakeOrderedAndProject (no global
    sort) and both stats joins broadcast; results invariant to input
    partitioning."""
    from pyspider_spark.operators.textprep import bm25_topk

    rows = [(i, "hash join vector w%d " % (i % 7) * (i % 5 + 1)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(docs, ["hash", "vector"], k=15)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

    a = sorted(map(tuple, bm25_topk(docs.coalesce(1), ["hash", "vector"], k=15).collect()))
    b = sorted(map(tuple, bm25_topk(docs.repartition(16), ["hash", "vector"], k=15).collect()))
    assert a == b


# --- fastText-style hashed linear classifier ---------------------------------


def _py_clf(texts, n_buckets=256, seed=1607, thr=0):
    """Pure-Python mirror of hashed_linear_classifier."""
    import hashlib
    import math
    import re

    from pyspider_spark.operators.textprep import clf_weights

    w = clf_weights(n_buckets, seed)
    out = {}
    for i, t in texts:
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        feats = toks + [a + "_" + b for a, b in zip(toks, toks[1:])]
        s = sum(
            int(w[int(hashlib.md5(("clf" + f).encode()).hexdigest()[:14], 16)
                    % n_buckets])
            for f in feats
        )
        n = len(feats)
        avg = math.floor(s / n) if n else 0
        out[i] = (n, s if n else 0, avg, avg >= thr)
    return out


def test_classifier_matches_python_mirror(spark):
    """Spark output == a hashlib/numpy mirror of the same construction,
    including empty/null/1-token docs (no bigrams) and punctuation."""
    from pyspider_spark.operators.textprep import hashed_linear_classifier

    rows = [
        (0, "The quick brown fox jumps over the lazy dog!"),
        (1, "hello"),
        (2, ""),
        (3, None),
        (4, "a b a b a b repeated bigrams, YES: 42 a-b"),
        (5, "unicode naïve café text mixed 123 tokens"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_features"], r["clf_micro_sum"],
                      r["avg_clf_micro"], r["keep"])
        for r in hashed_linear_classifier(docs).collect()
    }
    assert got == _py_clf(rows)


def test_classifier_partitioning_invariant(spark):
    """Integer micro-weights: identical output at 1 and 16 partitions."""
    from pyspider_spark.operators.textprep import hashed_linear_classifier

    rows = [(i, ("word%d common text " % (i % 9)) * (i % 4 + 1)) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, hashed_linear_classifier(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, hashed_linear_classifier(docs.repartition(16)).collect()))
    assert a == b


def test_classifier_plan_is_scan_only(spark, tmp_path):
    """Scale contract: the classifier is a pure scan-time map — no
    Exchange, no Join, no Python eval in the physical plan, and only the
    (id, text) columns read from parquet."""
    from pyspider_spark.operators.textprep import hashed_linear_classifier

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "some text here", "extra") for i in range(10)],
        "doc_id long, text string, other string",
    ).write.parquet(p)
    df = hashed_linear_classifier(spark.read.parquet(p))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan and "BatchEval" not in plan
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_line and "other" not in schema_line[0]


# --- CCNet-style perplexity buckets -------------------------------------------


def _py_buckets(rows):
    """Pure-Python mirror of perplexity_buckets: unigram micro-nat
    scores, then ties-inclusive descending cume terciles per language."""
    import math
    import re

    toks = {i: re.findall(r"[a-z0-9]+", (t or "").lower()) for i, t, _ in rows}
    freq: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    total = sum(freq.values())
    score = {}
    for i, ts in toks.items():
        if ts:
            s = sum(math.floor(math.log(freq[t] / total) * 1e6) for t in ts)
            score[i] = math.floor(s / len(ts))
        else:
            score[i] = 0
    langs: dict[str, list] = {}
    for i, _, lang in rows:
        langs.setdefault(lang or "", []).append(i)
    out = {}
    for lang, ids in langs.items():
        n = len(ids)
        for i in ids:
            cume = sum(1 for j in ids if score[j] >= score[i])
            b = "head" if 3 * cume <= n else ("middle" if 3 * cume <= 2 * n else "tail")
            out[i] = (lang, score[i], b)
    return out


def test_perplexity_buckets_matches_python_mirror(spark):
    """Bucket assignment matches the mirror, including tied scores
    sharing a bucket, null lang -> '', and empty docs (score 0)."""
    from pyspider_spark.operators.textprep import perplexity_buckets

    rows = [
        (0, "the the the the common words", "en"),
        (1, "the the common words too", "en"),
        (2, "zyzzyx qwrtp rare rare tokens", "en"),
        (3, "middling mix of the and rare qwrtp", "en"),
        (4, "the the the", "en"),
        (5, "una lingua diversa qui", "it"),
        (6, "altra frase qui", "it"),
        (7, "terza frase diversa", "it"),
        (8, "", "it"),
        (9, "no lang at all", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["lang"], r["avg_lp_micro"], r["bucket"])
        for r in perplexity_buckets(docs).collect()
    }
    assert got == _py_buckets(rows)
    assert {b for _, _, b in got.values()} == {"head", "middle", "tail"}


def test_perplexity_buckets_every_doc_once_and_terciles_balanced(spark):
    """Each doc appears exactly once; with 9 all-distinct scores in one
    language the terciles split 3/3/3."""
    from pyspider_spark.operators.textprep import perplexity_buckets

    rows = [(i, "tok%d " % i * (i + 1) + "shared anchor", "en") for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(docs).collect()
    assert len(out) == 9 and len({r["doc_id"] for r in out}) == 9
    from collections import Counter

    assert Counter(r["bucket"] for r in out) == {"head": 3, "middle": 3, "tail": 3}


def test_perplexity_buckets_no_corpus_wide_language_window(spark):
    """Scale contract: the only windows run over the (lang, score)
    histogram, so no plan node sorts corpus rows by language — the
    corpus-side frames never pass through a Window at all (histogram
    aggregate + broadcast joins back)."""
    from pyspider_spark.operators.textprep import perplexity_buckets

    rows = [(i, "w%d x" % (i % 5), "en") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    df = perplexity_buckets(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly ONE Window in the whole plan — it runs over the
    # (lang, score) histogram aggregate, never over corpus rows
    # (unigram_logprob's token join may legitimately sort-merge; the
    # corpus frames themselves must not pass through any Window)
    assert plan.count("Window ") == 1
    # and the (lang, score) -> bucket map joins back via broadcast
    assert "BroadcastHashJoin [lang" in plan and "avg_lp_micro" in plan.split(
        "BroadcastHashJoin [lang", 1
    )[1].split("]", 1)[0]
    # the scored intermediate is persisted, not recomputed per branch
    assert "InMemoryTableScan" in plan


# --- gopher_rules -------------------------------------------------------------


def test_gopher_rules_planted(spark):
    """Each rule trips on its planted violator and passes elsewhere."""
    from pyspider_spark.operators.textprep import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog and then have "
            "to be of service with more plain words ") * 3  # ~60 words
    rows = [
        (0, good),                                  # passes everything
        (1, "too few words to count"),              # word count < 50
        (2, "a " * 60 + "the of and that be"),      # mean word len < 3
        (3, good + " ###### ##### #### ### ## #"),  # symbol ratio > 0.1 is NOT
        (4, "- bullet\n- bullet\n- bullet"),         # 100% bullet lines
        (5, good.replace("words ", "words... \n") ),  # many ellipsis lines
        (6, ("1234 5678 " * 30) + "the of and"),     # alpha fraction < 0.8
        (7, "zebra quartz " * 30),                   # no stopwords
        (8, None),                                   # null text
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_rules(docs, min_words=50).collect()}
    assert out[0]["keep"] is True
    assert out[1]["r_word_count"] is False
    assert out[2]["r_mean_word_len"] is False
    assert out[4]["r_bullet"] is False and out[4]["n_bullet_lines"] == 3
    assert out[5]["r_ellipsis"] is False
    assert out[6]["r_alpha"] is False
    assert out[7]["r_stopwords"] is False and out[7]["n_stopwords_present"] == 0
    assert out[8]["n_words"] == 0 and out[8]["keep"] is False
    # integer counts: whitespace words vs alnum stopword tokens
    assert out[0]["n_words"] >= 50
    assert out[0]["n_stopwords_present"] >= 2


def test_gopher_rules_symbol_counting(spark):
    """'#' chars, non-overlapping '...' runs, and '…' each count once,
    and the ratio test is the exact integer form 10*symbols <= words."""
    from pyspider_spark.operators.textprep import gopher_rules

    docs = spark.createDataFrame(
        [(0, "plain words here ### and ... also … fin")],
        "doc_id long, text string",
    )
    r = gopher_rules(docs, min_words=1).collect()[0]
    assert r["n_symbols"] == 3 + 1 + 1
    # 9 whitespace words ('###', '...', '…' are words too), 5 symbols
    assert r["n_words"] == 9
    assert r["r_symbol_ratio"] is False  # 50 > 9


def test_gopher_rules_plan_is_rowlocal(spark):
    """Zero exchanges: every rule is a row-local expression over the text
    scan — the 100-TB free-rider shape the docstring claims."""
    from pyspider_spark.operators.textprep import gopher_rules

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan


# --- domain_curation -----------------------------------------------------------


def test_domain_curation_planted(spark):
    """Each domain gate trips on its planted violator: quality (most docs
    fail Gopher), internal duplication (>10% exact dups), and size
    (< min_docs)."""
    from pyspider_spark.operators.textprep import domain_curation

    good = ("the quick brown fox jumps over that lazy dog and then have "
            "to be of service with more plain words ") * 3
    rows = (
        [(i, good + f" unique tail {i}", "good.example") for i in range(6)]
        + [(10 + i, "too short", "lowq.example") for i in range(6)]
        + [(20 + i, good, "dups.example") for i in range(6)]   # 6 identical
        + [(30, good, "tiny.example")]                          # below min_docs
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["domain"]: r for r in domain_curation(docs, min_docs=5).collect()}
    assert out["good.example"]["keep_domain"] is True
    assert out["good.example"]["n_gopher_keep"] == 6
    assert out["good.example"]["n_distinct_fp"] == 6
    assert out["lowq.example"]["keep_domain"] is False   # 0/6 pass Gopher
    assert out["lowq.example"]["n_gopher_keep"] == 0
    assert out["dups.example"]["keep_domain"] is False   # 1 distinct fp of 6
    assert out["dups.example"]["n_distinct_fp"] == 1
    assert out["tiny.example"]["keep_domain"] is False   # n_docs < 5
    assert out["tiny.example"]["n_docs"] == 1


def test_domain_curation_null_domain_buckets_to_empty(spark):
    from pyspider_spark.operators.textprep import domain_curation

    docs = spark.createDataFrame(
        [(0, "a b c", None), (1, "d e f", None)],
        "doc_id long, text string, source string",
    )
    out = domain_curation(docs, min_docs=1).collect()
    assert len(out) == 1 and out[0]["domain"] == "" and out[0]["n_docs"] == 2


def test_domain_curation_plan_single_agg_no_join(spark):
    """The per-doc stats ride one row-local pass: the executed plan has
    aggregation exchanges only (domain key), never a doc-keyed Join."""
    from pyspider_spark.operators.textprep import domain_curation

    docs = spark.createDataFrame(
        [(0, "x", "s")], "doc_id long, text string, source string"
    )
    plan = domain_curation(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


# --- per-source cap -----------------------------------------------------------


def test_per_source_cap_salted_equals_unsalted_and_semantics(spark):
    """The salted two-phase rank is bit-identical to the plain window
    (containment proof exercised on a skewed source distribution), at
    most cap rows survive per source with dense ranks 1..min(cap, n),
    and results are partition-invariant."""
    from pyspider_spark.operators.textprep import per_source_cap

    rows = [(i, "text body %s ok fine" % ("the and of to is " * (i % 9)), "hot")
            for i in range(200)]
    rows += [(1000 + i, "short %d" % i, "cold%d" % (i % 3)) for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")

    plain = sorted(map(tuple, per_source_cap(docs, cap=7, salt_buckets=1).collect()))
    salted = sorted(map(tuple, per_source_cap(docs, cap=7, salt_buckets=16).collect()))
    assert plain == salted

    by_src = {}
    for _, src, _, rk in plain:
        by_src.setdefault(src, []).append(rk)
    assert sorted(by_src["hot"]) == list(range(1, 8))  # capped at 7
    for s, rks in by_src.items():
        if s.startswith("cold"):
            assert sorted(rks) == list(range(1, len(rks) + 1))
            assert len(rks) == 3  # 9 docs over 3 cold sources

    rep = sorted(map(tuple, per_source_cap(
        docs.repartition(16), cap=7, salt_buckets=16).collect()))
    assert rep == plain

    import pytest as _pytest

    with _pytest.raises(ValueError):
        per_source_cap(docs, cap=0)
