"""Corpus-prep operators (operators/corpus): planted-case semantics +
plan-shape assertions (broadcast where small, partitioned windows where
big — the 100-TB shapes the docstrings claim)."""

import pytest
from pyspark.sql import functions as F

from pyspider_spark.operators.corpus import (
    hot_lines,
    mixture_weights,
    ngram_contamination,
    pack_sequences,
    rebalance,
    strip_boilerplate,
)

NAV = "==nav=="
FOOT = "==footer=="


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def boiler_docs(spark):
    rows = [
        (0, f"{NAV}\nunique zero\n{FOOT}"),
        (1, f"{NAV}\nunique one\n{FOOT}"),
        (2, f"{NAV}\n  {NAV}  \nunique two\n{FOOT}"),  # dup hot line + trim
        (3, f"{NAV}\n{FOOT}"),  # all-boilerplate doc
        (4, None),  # null text
        (5, "only original content here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_lines_distinct_doc_count(spark, boiler_docs):
    hot = {r["line"]: r["n_docs_line"] for r in hot_lines(boiler_docs, min_docs=4).collect()}
    # NAV appears twice in doc 2 but counts ONE doc there (distinct-doc
    # hotness), so both template lines sit at exactly 4 docs
    assert hot == {NAV: 4, FOOT: 4}


def test_strip_boilerplate_semantics(spark, boiler_docs):
    out = {r["doc_id"]: r for r in strip_boilerplate(boiler_docs, min_docs=4).collect()}
    assert len(out) == 6  # every doc survives, even emptied/null ones
    assert out[0]["text_clean"] == "unique zero"
    assert out[2]["text_clean"] == "unique two"
    assert out[2]["n_removed"] == 3  # both NAV occurrences + FOOT
    assert out[3]["text_clean"] == "" and out[3]["n_removed"] == 2
    assert out[4]["text_clean"] == "" and out[4]["n_lines"] == 0
    assert out[5]["text_clean"] == "only original content here"
    assert out[5]["n_removed"] == 0


def test_strip_boilerplate_preserves_line_order(spark):
    docs = spark.createDataFrame(
        [(i, f"{NAV}\nalpha {i}\nbeta {i}\ngamma {i}") for i in range(5)],
        "doc_id long, text string",
    )
    row = strip_boilerplate(docs, min_docs=5).where("doc_id = 3").first()
    assert row["text_clean"] == "alpha 3\nbeta 3\ngamma 3"


def test_strip_boilerplate_hot_join_is_broadcast(spark, boiler_docs):
    plan = _plan(strip_boilerplate(boiler_docs, min_docs=4))
    # the anti-join against the hot set must be broadcast, and reassembly
    # must not sort through a window
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_ngram_contamination_planted(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "brown fox jumps over something else entirely now ok fine"),
            (2, "completely different words in this document body here"),
            (3, "too short"),  # < n words -> zero grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in ngram_contamination(docs, bench, n=5).collect()}
    assert out[0]["contaminated"] and out[0]["n_hits"] > 0
    assert not out[1]["contaminated"]  # shares 'brown fox jumps over' (4-run) only
    assert not out[2]["contaminated"]
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_ngram_contamination_bench_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} a b c d e f g h") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(ngram_contamination(docs, docs.limit(2), n=3))
    assert "BroadcastHashJoin" in plan


def test_pack_sequences_matches_global_cumsum(spark):
    import random

    rng = random.Random(7)
    rows = [(i, " ".join(f"t{j}" for j in range(rng.randint(0, 40)))) for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_offset"], r["pack_id"], r["pack_pos"])
        for r in pack_sequences(docs, max_tokens=128, bucket_span=37).collect()
    }
    # reference: plain sequential scan
    off = 0
    for i, text in rows:
        n = len(text.split()) if text else 0
        assert got[i] == (n, off, off // 128, off % 128), f"doc {i}"
        off += n


def test_pack_sequences_span_invariant(spark):
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    a = sorted(map(tuple, pack_sequences(docs, 16, bucket_span=7).collect()))
    b = sorted(map(tuple, pack_sequences(docs, 16, bucket_span=1 << 20).collect()))
    assert a == b


def test_pack_sequences_no_corpus_wide_window(spark):
    """The only unpartitioned window may run over the #buckets-row totals
    table; the corpus-sized window must be partitioned by _bucket."""
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(50)], "doc_id long, text string"
    )
    plan = _plan(pack_sequences(docs, 16, bucket_span=8))
    windows = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert windows, "expected window operators in the packing plan"
    # every windowspec keys on _bucket: the corpus side PARTITIONS by it,
    # the totals side ORDERS by it over the #buckets-row aggregate output
    for ln in windows:
        assert "_bucket#" in ln
    # and the bucket-offset join comes back as a broadcast
    assert "BroadcastHashJoin" in plan


def test_mixture_weights_math(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i < 60 else ("de" if i < 90 else "zh")) for i in range(100)],
        "doc_id long, lang string",
    )
    out = {r["stratum"]: r for r in mixture_weights(docs, {"en": 0.3, "de": 0.3, "zh": 0.4}, "lang").collect()}
    assert out["en"]["n_docs"] == 60
    assert out["en"]["weight"] == 0.5  # 0.3*100/60
    assert out["en"]["sample_rate"] == 0.5
    assert out["de"]["weight"] == 1.0
    assert out["zh"]["weight"] == 4.0  # under-represented: flagged > 1
    assert out["zh"]["sample_rate"] == 1.0  # but keep-rate caps at 1


def test_rebalance_deterministic_and_directional(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 10 < 8 else "zh") for i in range(1000)],
        "doc_id long, lang string",
    )
    targets = {"en": 0.5, "zh": 0.5}
    a = rebalance(docs, targets, "lang")
    b = rebalance(docs, targets, "lang")
    ra = sorted(r["doc_id"] for r in a.collect())
    assert ra == sorted(r["doc_id"] for r in b.collect())  # same rows every run
    kept = a.groupBy("stratum").count().collect()
    counts = {r["stratum"]: r["count"] for r in kept}
    # zh is under target -> kept whole; en subsampled toward ~500
    assert counts["zh"] == 200
    assert 400 < counts["en"] < 600


def test_dedup_paragraphs_keep_first(spark):
    from pyspider_spark.operators.corpus import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (0, "shared para\nunique zero"),
            (1, "unique one\nshared para"),          # later doc loses the dup
            (2, "twice\ntwice\nunique two"),          # same-doc repeat: keep 1st
            (3, "shared para"),                       # emptied entirely
            (4, None),
            (5, "unique zero"),                       # dup of doc 0's 2nd line
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
    assert len(out) == 6
    assert out[0]["text_clean"] == "shared para\nunique zero"
    assert out[0]["n_removed"] == 0
    assert out[1]["text_clean"] == "unique one" and out[1]["n_removed"] == 1
    assert out[2]["text_clean"] == "twice\nunique two" and out[2]["n_removed"] == 1
    assert out[3]["text_clean"] == "" and out[3]["n_removed"] == 1
    assert out[4]["text_clean"] == "" and out[4]["n_lines"] == 0
    assert out[5]["text_clean"] == "" and out[5]["n_removed"] == 1


def test_dedup_paragraphs_window_is_keyed(spark):
    """The only window in the plan partitions by the paragraph hash key —
    an unpartitioned first-occurrence sort would funnel the corpus
    through one task."""
    from pyspider_spark.operators.corpus import dedup_paragraphs

    docs = spark.createDataFrame(
        [(i, f"line a\nline {i}") for i in range(20)], "doc_id long, text string"
    )
    plan = _plan(dedup_paragraphs(docs))
    windows = [ln for ln in plan.splitlines() if "windowspecdefinition(" in ln]
    assert windows
    for ln in windows:
        assert "key#" in ln


def test_url_filter_rules(spark):
    from pyspider_spark.operators.corpus import url_filter

    pages = spark.createDataFrame(
        [
            (0, "ftp://files.example.com/a"),
            (1, "https://cdn.eu.badsite.com:8443/x"),   # suffix of blocklisted
            (2, "https://badsite.com/x"),                # exact blocklisted
            (3, "https://notbadsite.com/x"),             # NOT a dot-suffix match
            (4, "https://ok.example.com/free-CASINO-chips"),
            (5, "https://ok.example.com/" + "y" * 300),
            (6, "https://en.example.org/wiki/Fine"),
            (7, "not a url at all"),
        ],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: r
        for r in url_filter(pages, ["badsite.com"], max_len=128).collect()
    }
    assert out[0]["reason"] == "scheme"
    assert out[1]["reason"] == "domain" and out[1]["host"] == "cdn.eu.badsite.com"
    assert out[2]["reason"] == "domain"
    assert out[3]["reason"] is None and out[3]["kept"]
    assert out[4]["reason"] == "pattern"
    assert out[5]["reason"] == "length"
    assert out[6]["kept"]
    assert out[7]["reason"] == "scheme"


def test_url_filter_plan_is_rowlocal(spark):
    """No join, no exchange, no python worker: the blocklist is a literal
    array and every rule is a codegen expression."""
    from pyspider_spark.operators.corpus import url_filter

    pages = spark.createDataFrame(
        [(i, f"https://h{i}.example.com/{i}") for i in range(10)],
        "doc_id long, url string",
    )
    plan = _plan(url_filter(pages, ["badsite.com"]))
    for op in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan


# --- span_dedup ----------------------------------------------------------------


def test_span_dedup_planted(spark):
    plant = "a b c d e f g h i j k l"  # 12 tokens -> 3 shared 10-grams
    rows = [
        (0, plant + " unique zero tail words here"),
        (1, plant + " different one ending entirely"),
        (2, "nothing shared with anyone else in this document at all ok"),
        (3, None),
    ]
    from pyspider_spark.operators.corpus import span_dedup

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in span_dedup(docs, n=10, min_docs=2).collect()}
    # docs 0/1 share exactly the 3 grams fully inside the planted prefix
    # (grams crossing into the doc-specific tail differ)
    assert out[0]["dup_spans"] == 3 and out[1]["dup_spans"] == 3
    assert out[0]["n_spans"] == 8  # 17 tokens -> 8 distinct 10-grams
    assert out[2]["dup_spans"] == 0 and out[2]["n_spans"] == 2
    assert out[3]["n_spans"] == 0 and out[3]["dup_spans"] == 0


def test_span_dedup_exact_duplicate_docs_share_all_spans(spark):
    from pyspider_spark.operators.corpus import span_dedup

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, text) for i in range(3)], "doc_id long, text string"
    )
    out = span_dedup(docs, n=10, min_docs=2).collect()
    assert all(r["dup_spans"] == r["n_spans"] > 0 for r in out)


def test_span_dedup_survives_no_broadcast(spark):
    """Corpus x corpus: span_dedup must not DEPEND on broadcasting the
    dup-span set (at 100 TB it is itself corpus-scale). With broadcast
    disabled entirely the plan still runs as a shuffle join and yields
    identical results — i.e. no F.broadcast hint is baked in; Catalyst
    is free to broadcast when stats say small, shuffle when not."""
    from pyspider_spark.operators.corpus import span_dedup

    docs = spark.createDataFrame(
        [(i, "common shared prefix sentence tokens here now ok fine yes plus w%d" % (i % 2))
         for i in range(20)],
        "doc_id long, text string",
    )
    base = sorted(map(tuple, span_dedup(docs, n=10, min_docs=2).collect()))
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = span_dedup(docs, n=10, min_docs=2)
        assert "BroadcastHashJoin" not in _plan(out)
        assert sorted(map(tuple, out.collect())) == base
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


# --- deterministic training-shard assignment ---------------------------------


def test_training_shards_matches_python_mirror(spark):
    """Shard, in-shard position, and exclusive token offset all match a
    hashlib mirror of the same permutation — the layout is deterministic,
    not RNG."""
    import hashlib
    import re

    from pyspider_spark.operators.corpus import training_shards

    rows = [(i, ("tok " * (i % 7 + 1)).strip() if i % 11 else None)
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, training_shards(docs, n_shards=8, seed=3).collect()))

    def key(i):
        return int(hashlib.md5(f"shuffle:3{i}".encode()).hexdigest()[:14], 16)

    per_shard: dict[int, list] = {}
    for i, t in rows:
        n = len(re.findall(r"[a-z0-9]+", (t or "").lower()))
        per_shard.setdefault(key(i) % 8, []).append((key(i), i, n))
    want = []
    for shard, members in per_shard.items():
        off = 0
        for pos, (_, i, n) in enumerate(sorted(members)):
            want.append((i, n, shard, pos, off))
            off += n
    assert got == sorted(want)


def test_training_shards_rerun_and_partitioning_invariant(spark):
    """Same layout on rerun and at any input partitioning (resume-safe
    writer contract)."""
    from pyspider_spark.operators.corpus import training_shards

    rows = [(i, "w%d x y" % i) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, training_shards(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, training_shards(docs.repartition(16)).collect()))
    assert a == b


def test_training_shards_plan(spark):
    """Scale contract: one hash exchange on the shard key, no global
    ordering — no rangepartitioning, no single-partition exchange."""
    from pyspider_spark.operators.corpus import training_shards

    rows = [(i, "a b c") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plan = _plan(training_shards(docs, n_shards=8))
    assert "rangepartitioning" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --- cross-document duplicated-substring spans --------------------------------


def _py_dup_spans(rows, n=4, min_docs=2):
    """Pure-Python mirror of dup_substring_spans (hashing elided: grouping
    by the gram string is equivalent absent collisions)."""
    import re

    grams = {}  # doc -> [(pos, gram)]
    for i, t in rows:
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        grams[i] = [
            (p, " ".join(toks[p : p + n])) for p in range(len(toks) - n + 1)
        ]
    docfreq = {}
    for i, gs in grams.items():
        for g in {g for _, g in gs}:
            docfreq[g] = docfreq.get(g, 0) + 1
    out = []
    for i, gs in grams.items():
        hits = sorted(p for p, g in gs if docfreq[g] >= min_docs)
        if not hits:
            continue
        start = prev = hits[0]
        cnt = 1
        for p in hits[1:]:
            if p - prev > n:
                out.append((i, start, prev + n - 1, prev + n - start, cnt))
                start, cnt = p, 0
            prev = p
            cnt += 1
        out.append((i, start, prev + n - 1, prev + n - start, cnt))
    return sorted(out)


def test_dup_substring_spans_matches_python_mirror(spark):
    """Spans, 0-based token positions, and gram counts all match a
    pure-Python mirror, including adjacent-interval merge, within-doc
    repeats of a cross-doc gram, and docs below the gram length."""
    from pyspider_spark.operators.corpus import dup_substring_spans

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, f"intro words here {shared} middle filler {shared} tail end pad"),
        (1, f"{shared} unrelated suffix goes on and on"),
        (2, "completely different text with no duplication at all indeed"),
        (3, "tiny"),
        (4, None),
        (5, f"prefix {shared} and also completely different text with no"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, dup_substring_spans(docs, n=4, min_docs=2).collect())
    )
    assert got == _py_dup_spans(rows, n=4, min_docs=2)
    assert got  # non-vacuous


def test_dup_substring_spans_min_docs_excludes_within_doc_repeats(spark):
    """A gram repeated twice inside ONE doc but present nowhere else does
    not reach min_docs=2 (frequency counts distinct documents)."""
    from pyspider_spark.operators.corpus import dup_substring_spans

    rows = [
        (0, "only here only here only here only here"),
        (1, "nothing shared with the first document at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert dup_substring_spans(docs, n=4, min_docs=2).count() == 0


def test_dup_substring_spans_partitioning_invariant(spark):
    from pyspider_spark.operators.corpus import dup_substring_spans

    base = "the common run of tokens shared by many documents here"
    rows = [(i, base + f" unique{i} suffix{i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, dup_substring_spans(docs.coalesce(1), n=5).collect()))
    b = sorted(
        map(tuple, dup_substring_spans(docs.repartition(16), n=5).collect())
    )
    assert a == b and a


def test_dup_substring_spans_plan_no_broadcast_no_cartesian(spark):
    """Scale contract: corpus x corpus — the dup-gram join must stay a
    shuffle join (no broadcast of a corpus-scale set), and there is no
    cartesian product anywhere."""
    from pyspider_spark.operators.corpus import dup_substring_spans

    rows = [(i, "a b c d e f g h") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(dup_substring_spans(docs, n=4))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        out = dup_substring_spans(docs, n=4).count()
        assert out == 30  # every doc is one maximal span of the shared text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def _py_apply_cuts(rows, n, min_docs):
    """Pure-Python mirror of apply_span_cuts over the span mirror."""
    import re

    spans = {}
    for i, s, e, _tok, _g in _py_dup_spans(rows, n, min_docs):
        spans.setdefault(i, []).append((s, e))
    out = []
    for i, t in rows:
        toks = re.findall(r"[a-z0-9]+", (t or "").lower())
        cut = spans.get(i, [])
        kept = [
            w for p, w in enumerate(toks)
            if not any(s <= p <= e for s, e in cut)
        ]
        out.append((i, " ".join(kept), len(toks), len(toks) - len(kept)))
    return sorted(out)


def test_apply_span_cuts_matches_python_mirror(spark):
    """The cleaned token stream, total and removed counts all match the
    pure-Python mirror — including docs with two disjoint cuts, docs
    with no cuts (pass-through), short docs, and null text."""
    from pyspider_spark.operators.corpus import apply_span_cuts

    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, f"intro words here {shared} middle filler {shared} tail end pad"),
        (1, f"{shared} unrelated suffix goes on and on"),
        (2, "completely different text with no duplication at all indeed"),
        (3, "tiny"),
        (4, None),
        (5, f"prefix {shared} and also completely different text with no"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, apply_span_cuts(docs, n=4, min_docs=2).collect()))
    want = _py_apply_cuts(rows, n=4, min_docs=2)
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[0][3] > 0          # duplicated doc actually lost tokens
    assert by_id[3] == (3, "tiny", 1, 0)  # untouched doc kept everything
    assert by_id[4] == (4, "", 0, 0)  # null text -> empty stream


def test_apply_span_cuts_every_doc_survives(spark):
    """The output is one row per input doc — even a doc whose ENTIRE
    token stream is duplicated comes back (empty text_cut), so the
    operator composes with downstream joins without row loss."""
    from pyspider_spark.operators.corpus import apply_span_cuts

    dup = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [(0, dup), (1, dup), (2, "nothing shared here at all")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in apply_span_cuts(docs, n=4, min_docs=2).collect()}
    assert len(out) == 3
    assert out[0]["text_cut"] == "" and out[0]["n_removed"] == 8
    assert out[1]["text_cut"] == "" and out[1]["n_removed"] == 8
    assert out[2]["n_removed"] == 0


def test_apply_span_cuts_edit_is_rowlocal(spark):
    """The edit never explodes tokens to rows: the only exchanges are the
    span pipeline's (gram groupBy + doc-keyed joins); the token filter is
    an expression. Guard: no Generate node downstream of the final join
    (the span side's posexplode is upstream of the island merge)."""
    from pyspider_spark.operators.corpus import apply_span_cuts

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon " * 3) for i in range(6)],
        "doc_id long, text string",
    )
    plan = _plan(apply_span_cuts(docs, n=4, min_docs=2))
    # the final projection computes text_cut via filter(...) lambda —
    # visible as a higher-order filter over _w, not a Generate/explode
    tail = plan.split("Generate")[-1]
    assert "array_join" in tail  # rebuild happens AFTER the last explode


# --- interleaved span packing ------------------------------------------------


def test_pack_interleaved_spans_semantics(spark):
    """Greedy packing: media spans are atomic (never straddle), order is
    preserved, an overflowing span opens the next sequence, an oversized
    text span gets its own sequence; zero-cost spans stay in place."""
    from pyspider_spark.operators.corpus import pack_interleaved_spans

    rows = [
        (1, [("text", "one two three four", None, 0),
             ("media", None, "img://a", 1),
             ("text", "five six", None, 2),
             ("link", "https://x", None, 3)]),
        (2, [("text", " ", None, 0), ("media", None, "img://b", 1)]),
        (3, [("text", "w " * 100, None, 0), ("text", "tail", None, 1)]),
        (4, []),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    out = {(r["doc_id"], r["ord"]): (r["kind"], r["cost"], r["seq"])
           for r in pack_interleaved_spans(df, max_tokens=10,
                                           media_tokens=8).collect()}
    assert out[(1, 1)] == ("text", 4, 0)
    assert out[(1, 2)] == ("media", 8, 1)   # 4+8 > 10: media opens seq 1 whole
    assert out[(1, 3)] == ("text", 2, 1)    # 8+2 = 10 fits
    assert out[(1, 4)] == ("link", 1, 2)    # 10+1 > 10
    assert out[(2, 1)] == ("text", 0, 0)    # blank text costs 0
    assert out[(2, 2)] == ("media", 8, 0)
    assert out[(3, 1)] == ("text", 100, 0)  # oversized: own sequence, flagged
    assert out[(3, 2)] == ("text", 1, 1)
    assert (4, 1) not in out                # empty doc emits nothing

    # per-sequence budget invariant on a larger random-ish corpus
    import hashlib
    big = [(i, [("text",
                 " ".join(hashlib.md5(f"{i}-{j}-{w}".encode()).hexdigest()[:4]
                          for w in range(1 + (i * 7 + j) % 9)),
                 None, j) if (i + j) % 4 else ("media", None, f"img://{i}-{j}", j)
                for j in range(12)])
           for i in range(40)]
    bigdf = spark.createDataFrame(
        big,
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    packed = pack_interleaved_spans(bigdf, max_tokens=16, media_tokens=6)
    from pyspark.sql import functions as F
    totals = packed.groupBy("doc_id", "seq").agg(
        F.sum("cost").alias("n"), F.count("*").alias("k")).collect()
    for r in totals:
        # a sequence only exceeds the budget when it is a single oversized span
        assert r["n"] <= 16 or r["k"] == 1, r

    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # row-local fold: zero shuffle
