"""Dedup blocking soundness + hot-bucket guards (VERDICT r01 items 1b/6).

The simhash pigeonhole scheme must find pairs at ANY distance <= the
requested max_hamming — the round-1 bug was a fixed 4-chunk split that
silently dropped hamming-4..6 pairs whose differing bits spread across all
4 chunks.
"""

from pyspark.sql import functions as F

from pyspider_spark.operators.dedup import (
    lsh_candidate_pairs,
    simhash_chunk_plan,
    simhash_near_pairs,
)


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc long, simhash long"
    )


def test_chunk_plan_sound():
    # pigeonhole: need more chunks than the max distance
    for d in range(0, 8):
        n_chunks, chunk_bits = simhash_chunk_plan(d)
        assert n_chunks > d
        assert n_chunks * chunk_bits == 56


def test_simhash_planted_pair_hamming5(spark):
    """Differing bits spread across all 4 of the old 14-bit chunks — the
    round-1 4-chunk blocking missed exactly this shape."""
    base = 0x00AA55AA55AA55  # arbitrary 56-bit signature
    flipped = base
    for pos in (0, 14, 28, 42, 43):  # 5 bits, one+ in every 14-bit quarter
        flipped ^= 1 << pos
    noise = [0x0F0F0F0F0F0F0F ^ (i << 20) for i in range(10)]
    df = _sig_df(spark, [base, flipped] + noise)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(df, max_hamming=6).collect()
    }
    assert pairs.get((0, 1)) == 5


def test_simhash_all_distances_up_to_max(spark):
    """Exhaustive: for every d <= max_hamming, a planted pair at exactly
    distance d (bits spread maximally) is found."""
    base = 0x00123456789ABC
    max_h = 6
    n_chunks, chunk_bits = simhash_chunk_plan(max_h)
    rows, expected = [base], {}
    for d in range(1, max_h + 1):
        sig = base
        for j in range(d):  # one flipped bit per chunk -> worst spread
            sig ^= 1 << (j * chunk_bits)
        expected[(0, len(rows))] = d
        rows.append(sig)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(_sig_df(spark, rows), max_hamming=max_h).collect()
    }
    for pair, d in expected.items():
        assert got.get(pair) == d, f"missed planted pair at hamming {d}"


def test_simhash_hot_block_guard(spark):
    """A block holding 30% of docs must be dropped, not joined O(n^2):
    pair output stays bounded and unrelated planted pairs still surface."""
    hot = [0x00FFFFFFFFFFFF] * 60  # identical sigs: collide in EVERY chunk
    planted = [0x00000000000F0F, 0x00000000000F0E]  # hamming 1
    df = _sig_df(spark, hot + planted)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(df, max_hamming=3, max_block_size=50).collect()
    }
    assert (60, 61) in pairs  # planted pair survives
    assert len(pairs) == 1  # hot block contributed nothing (guard dropped it)


def test_lsh_hot_bucket_guard(spark):
    """Same guard on the MinHash LSH bucket join."""
    # 40 docs with identical signatures (one giant bucket) + 1 distinct
    rows = [(i, *[7] * 8) for i in range(40)] + [(40, *range(100, 108))]
    df = spark.createDataFrame(
        rows, "doc long, " + ", ".join(f"h{i} long" for i in range(8))
    )
    pairs = lsh_candidate_pairs(df, bands=2, rows=4, max_bucket_size=10).collect()
    assert pairs == []  # hot bucket dropped; distinct doc matches nothing


def test_bucket_guards_use_no_window(spark):
    """The guard must be groupBy+join (partial agg), not a window sort."""
    df = _sig_df(spark, [1, 2, 3])
    plan = simhash_near_pairs(df, max_hamming=3)._jdf.queryExecution().toString()
    assert "Window" not in plan
    sigs = spark.createDataFrame(
        [(0, *range(8))], "doc long, " + ", ".join(f"h{i} long" for i in range(8))
    )
    plan2 = lsh_candidate_pairs(sigs, bands=2, rows=4)._jdf.queryExecution().toString()
    assert "Window" not in plan2


def test_array_form_signatures_match_grouped_and_shuffle_free(spark):
    """VERDICT r04 item 6: the per-row array signatures must equal the
    grouped (explode + groupBy) signatures exactly, and their plan must
    contain NO exchange at all (the signature groupBy was minhash's
    dominant remaining shuffle)."""
    from pyspider_spark.operators.dedup import (
        minhash_signatures,
        minhash_signatures_from_sets,
        shingle_sets,
        shingles,
    )

    docs = spark.createDataFrame(
        [(f"d{i}", f"some shared text body {i % 3} tail {i}") for i in range(40)],
        "doc_id string, text string",
    )
    grouped = minhash_signatures(shingles(docs, k=4), 16)
    arrform = minhash_signatures_from_sets(shingle_sets(docs, k=4), 16)
    key = lambda r: r["doc"]
    assert sorted(map(tuple, grouped.collect()), key=lambda t: t[0]) == sorted(
        map(tuple, arrform.collect()), key=lambda t: t[0]
    )
    plan = arrform._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffle by construction


def test_estimate_prefilter_preserves_results(spark):
    """The opt-in estimate prefilter (100-TB lever for non-broadcastable
    set tables) must not change the verified pair set at the default
    margin on a corpus with real near-dups."""
    from pyspider_spark.operators.dedup import minhash_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(
        map(tuple, minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4,
                                 threshold=0.6).collect())
    )
    pref = sorted(
        map(tuple, minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4,
                                 threshold=0.6, est_margin=0.25).collect())
    )
    assert base == pref and len(base) > 0


# --- incremental (new-vs-archive) minhash dedup --------------------------------


def _inc_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows_old = [
        (0, base),
        (1, base.replace("today", "tonight")),     # near-dup of 0
        (2, "entirely different archive content with nothing shared at all"),
    ]
    rows_new = [
        (10, base),                                 # near-dup of old 0 and 1
        (11, "fresh unrelated increment text that matches no archive doc"),
        (12, base),                                 # also dups old 0 — and new 10
    ]
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    return mk(rows_new), mk(rows_old)


def test_incremental_minhash_semantics(spark):
    """New docs pair against the archive only: new-new duplicates (10,12)
    never appear, archive-archive duplicates (0,1) never appear, and an
    exact recrawl pairs at jaccard 1.0."""
    from pyspider_spark.operators.dedup import incremental_minhash_pairs

    new_docs, old_docs = _inc_docs(spark)
    got = {
        (r["doc_new"], r["doc_old"]): r["jaccard"]
        for r in incremental_minhash_pairs(
            new_docs, old_docs, k=5, n_hashes=32, bands=8, rows=4, threshold=0.5
        ).collect()
    }
    assert (10, 0) in got and got[(10, 0)] == 1.0   # exact recrawl
    assert (12, 0) in got
    assert all(n in (10, 11, 12) and o in (0, 1, 2) for n, o in got)
    assert (10, 12) not in got and (12, 10) not in got  # new-new excluded
    assert 11 not in {n for n, _ in got}            # unrelated stays unpaired


def test_incremental_minhash_archive_never_self_joins(spark):
    """THE incremental contract: the archive's band table appears exactly
    once per join side pair — there is no old-x-old bucket self-join in
    the plan (count the band-table scans feeding joins: 2 sides total for
    the pair join, not 3+)."""
    from pyspider_spark.operators.dedup import incremental_minhash_pairs

    new_docs, old_docs = _inc_docs(spark)
    out = incremental_minhash_pairs(new_docs, old_docs, threshold=0.5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the batch pipeline's self-join signature is a doc_a < doc_b filter;
    # the incremental plan must not contain one
    assert "doc_a" not in plan
    got = out.count()
    assert got >= 2  # and it still finds the planted cross pairs


def test_incremental_minhash_hot_archive_bucket_guarded(spark):
    """An archive bucket larger than max_bucket_size drops before the
    probe join (template pages in the archive can't quadratically explode
    an increment probe)."""
    from pyspider_spark.operators.dedup import incremental_minhash_pairs

    boiler = "identical template page body repeated across the whole archive"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(20)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(100, boiler)], "doc_id long, text string")
    hits = incremental_minhash_pairs(
        new, old, threshold=0.5, max_bucket_size=10
    ).count()
    assert hits == 0  # every archive bucket for the template exceeds 10


def test_incremental_minhash_probe_from_storage(spark, tmp_path):
    """The deployment path: materialize the archive index
    (minhash_archive_index) to parquet at snapshot time, read it back,
    probe the increment against the STORED rows — identical output to
    the self-contained incremental_minhash_pairs."""
    from pyspider_spark.operators.dedup import (
        incremental_minhash_pairs,
        incremental_minhash_probe,
        minhash_archive_index,
    )

    new_docs, old_docs = _inc_docs(spark)
    direct = sorted(
        map(tuple, incremental_minhash_pairs(
            new_docs, old_docs, threshold=0.5
        ).collect())
    )
    bands_df, sets_df = minhash_archive_index(old_docs)
    bands_df.write.mode("overwrite").parquet(str(tmp_path / "bands"))
    sets_df.write.mode("overwrite").parquet(str(tmp_path / "sets"))
    stored = sorted(
        map(tuple, incremental_minhash_probe(
            new_docs,
            spark.read.parquet(str(tmp_path / "bands")),
            spark.read.parquet(str(tmp_path / "sets")),
            threshold=0.5,
        ).collect())
    )
    assert stored == direct and len(direct) >= 2


# --- AllPairs exact prefix-filter join ---------------------------------------


def _brute_jaccard_pairs(rows, num, den, n):
    """Brute-force all-pairs word-ngram Jaccard — the completeness oracle
    the prefix filter must equal exactly."""
    import re

    sets = {}
    for d, t in rows:
        w = re.findall("[a-z0-9]+", (t or "").lower())
        sets[d] = {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if not sets[a] or not sets[b]:
                continue
            ni = len(sets[a] & sets[b])
            nu = len(sets[a]) + len(sets[b]) - ni
            if ni * den >= num * nu:
                out[(a, b)] = ni / nu
    return out


def test_allpairs_exact_equals_brute_force(spark):
    """The defining property of AllPairs: the prefix-filtered join loses
    NOTHING — output identical to brute-force all-pairs at the threshold,
    including pairs near the boundary and across doc-length skew."""
    from pyspider_spark.operators.dedup import allpairs_exact_pairs

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        (0, base),
        (1, base),  # identical -> J=1
        (2, base.replace("today", "tonight")),  # near boundary
        (3, base + " and then some extra trailing words appear here"),
        (4, "completely different text about spark shuffles and joins"),
        (5, "completely different text about spark shuffles and joins ok"),
        (6, ""),  # empty: never pairs
        (7, "tiny doc"),  # < n words: empty gram set, never pairs
        (8, base.replace("quick", "slow").replace("lazy", "busy")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for num, den in [(1, 2), (7, 10), (9, 10)]:
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in allpairs_exact_pairs(docs, num, den, ngram=3).collect()
        }
        want = _brute_jaccard_pairs(rows, num, den, 3)
        assert set(got) == set(want), (num, den)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-12


def test_allpairs_guard_mirrors_and_partition_invariance(spark):
    """max_bucket_size drops hot PREFIX buckets deterministically (the
    oracle mirrors the same bound), None disables the guard entirely,
    and results are invariant to input partitioning."""
    from pyspider_spark.operators.dedup import allpairs_exact_pairs

    # 6 identical docs: every prefix token is shared by all 6
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(6)]
    rows += [(10, "totally unrelated words live in this document body")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = allpairs_exact_pairs(docs, 4, 5, ngram=3, max_bucket_size=None).collect()
    assert len(full) == 15  # C(6,2)
    guarded = allpairs_exact_pairs(docs, 4, 5, ngram=3, max_bucket_size=5).collect()
    assert guarded == []  # every prefix bucket has 6 > 5 members

    a = sorted(
        map(tuple, allpairs_exact_pairs(docs.coalesce(1), 4, 5, ngram=3).collect())
    )
    b = sorted(
        map(tuple, allpairs_exact_pairs(docs.repartition(16), 4, 5, ngram=3).collect())
    )
    assert a == b == sorted(map(tuple, full))


def test_allpairs_plan_keyed_joins_only(spark):
    """Plan contract: every join in the AllPairs plan is keyed (hash or
    sort-merge) — no cartesian / broadcast-nested-loop anywhere."""
    from pyspider_spark.operators.dedup import allpairs_exact_pairs

    rows = [(i, "w%d x%d common tail words here okay" % (i % 4, i % 3)) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    plan = (
        allpairs_exact_pairs(docs, 4, 5, ngram=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        allpairs_exact_pairs(docs, 0, 5)
    with _pytest.raises(ValueError):
        allpairs_exact_pairs(docs, 6, 5)


def test_dedup_keep_best_semantics_and_plan(spark):
    """Winner per component is the highest-quality member (id tie-break),
    singletons are kept, and the corpus side sees only broadcast joins —
    no sort-merge join, no corpus-wide window."""
    from pyspider_spark.operators.dedup import dedup_keep_best
    from pyspider_spark.functions.text import quality_score

    rows = [
        (0, "short"),
        (1, "the and of to is " * 30),   # high quality (stopword-rich, long)
        (2, "zz!! ## $$ %% ^^ && **"),   # low quality (punct-heavy)
        (3, "the and of to is " * 30),   # same text as 1 -> same score; id 1 wins
        (4, "lonely singleton document"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 2), (1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    out = dedup_keep_best(docs, pairs)
    got = {r["doc_id"]: (r["component"], r["is_kept"]) for r in out.collect()}
    # one component {0,1,2,3} (min id 0), winner = doc 1 (highest quality)
    assert got[0] == (0, False)
    assert got[1] == (0, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)  # ties with 1 on score, loses on id
    assert got[4] == (4, True)   # singleton kept, own component
    q = {r["doc_id"]: r["q"] for r in docs.select(
        "doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert q[1] == q[3] and q[1] > q[2]

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # winners via partial-agg max-of-struct


# --- winnowing (MOSS) partial-overlap ----------------------------------------


def _py_winnow(text, k=8, w=4):
    """Pure-Python winnowing mirror (value-min windows, distinct set)."""
    import hashlib
    import re

    t = re.sub(r"\s+", " ", (text or "").lower())
    n = max(len(t) - k + 1, 1)
    hs = [int(hashlib.md5(t[p:p + k].encode()).hexdigest()[:14], 16)
          for p in range(n)]
    m = max(len(hs) - w + 1, 1)
    return {min(hs[i:i + w]) for i in range(m)}


def test_winnow_fingerprints_match_python_mirror(spark):
    from pyspider_spark.operators.dedup import winnow_fingerprints

    rows = [
        (0, "The quick brown fox jumps over the lazy dog"),
        (1, "short"),
        (2, "Multiple   spaces\tand\nnewlines  normalize to one"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: set(r["fps"])
           for r in winnow_fingerprints(docs, k=8, w=4).collect()}
    for d, t in rows:
        assert got[d] == _py_winnow(t, 8, 4), d


def test_winnow_finds_planted_partial_overlap(spark):
    """The winnowing guarantee: a lifted passage inside two otherwise
    unrelated long pages surfaces as a pair, even though whole-document
    similarity is tiny (minhash at 0.6 finds nothing)."""
    from pyspider_spark.operators.dedup import minhash_dedup, winnow_overlap_pairs

    lift = ("this exact paragraph was copied verbatim between two pages "
            "and is long enough to guarantee many shared fingerprints")
    page_a = ("completely original opening about databases and storage " * 6
              + lift + " trailing content regarding query planners " * 6)
    page_b = ("an unrelated essay on sailing knots and rope care " * 6
              + lift + " closing notes about tide tables and charts " * 6)
    rows = [(0, page_a), (1, page_b)] + [
        (i, "filler document %d with its own words entirely " % i * 8)
        for i in range(2, 10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in winnow_overlap_pairs(docs, k=8, w=4, min_shared=3).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 3
    # whole-doc fuzzy dedup misses it:
    mh = minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4, threshold=0.6)
    assert {(r["doc_a"], r["doc_b"]) for r in mh.collect()
            if (r["doc_a"], r["doc_b"]) == (0, 1)} == set()


def test_winnow_guard_and_partition_invariance(spark):
    from pyspider_spark.operators.dedup import winnow_overlap_pairs

    rows = [(i, "identical boilerplate footer text shared by every page "
                "on this entire site without any variation at all")
            for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # every fingerprint appears on all 8 docs: guard at 5 drops them all
    assert winnow_overlap_pairs(docs, max_bucket_size=5).collect() == []
    full = winnow_overlap_pairs(docs, max_bucket_size=1000)
    assert full.count() == 28  # C(8,2)

    a = sorted(map(tuple, winnow_overlap_pairs(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, winnow_overlap_pairs(docs.repartition(16)).collect()))
    assert a == b

    plan = full._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- leakage-safe split ------------------------------------------------------


def test_leakage_safe_split_semantics(spark):
    """Near-dup docs always land in the SAME split (the whole point);
    every doc gets exactly one split; assignment is deterministic and
    partition-invariant; proportions track the fractions."""
    from pyspider_spark.operators.dedup import leakage_safe_split, minhash_dedup

    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a slow waltz under paper lanterns in the town square ")
    import hashlib

    def salad(i):
        # genuinely distinct docs: hex-token word salad (digit-only
        # variation would make every filler a near-dup of every other
        # at char-shingle threshold 0.6 — one giant component)
        return " ".join(
            hashlib.md5(f"{i}-{j}".encode()).hexdigest()[:10] for j in range(25)
        )

    rows = [(0, base * 3), (1, base * 3 + "tiny tail"), (2, base * 3 + "x")]
    rows += [(i, salad(i)) for i in range(3, 303)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    out = leakage_safe_split(docs, fractions=(0.8, 0.1, 0.1), threshold=0.6)
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == len(rows)  # exactly one row per doc

    # the planted near-dup cluster shares one component and one split
    assert got[0]["component"] == got[1]["component"] == got[2]["component"] == 0
    assert got[0]["split"] == got[1]["split"] == got[2]["split"]

    # stronger: EVERY minhash pair's endpoints agree on the split
    pairs = minhash_dedup(docs, k=5, n_hashes=32, bands=8, rows=4, threshold=0.6)
    for p in pairs.collect():
        assert got[p["doc_a"]]["split"] == got[p["doc_b"]]["split"], p

    # proportions: 303 docs at 80/10/10 — binomial 3-sigma is ~±7%
    from collections import Counter

    frac = Counter(r["split"] for r in got.values())
    assert 0.70 <= frac["train"] / len(rows) <= 0.90
    assert frac["val"] > 0 and frac["test"] > 0

    # deterministic + partition-invariant
    again = {r["doc_id"]: (r["component"], r["bucket"], r["split"])
             for r in leakage_safe_split(
                 docs.repartition(16), fractions=(0.8, 0.1, 0.1), threshold=0.6
             ).collect()}
    assert again == {d: (r["component"], r["bucket"], r["split"])
                     for d, r in got.items()}


def test_leakage_safe_split_validates_fractions(spark):
    import pytest as _pytest

    from pyspider_spark.operators.dedup import leakage_safe_split

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        leakage_safe_split(docs, fractions=(0.5, 0.1, 0.1))


def test_winnow_contamination_scoring(spark):
    """A benchmark doc lifted verbatim into the corpus scores ~1.0; a
    benchmark doc with a pasted corpus passage scores in between; a
    clean benchmark doc scores ~0. Hot corpus fingerprints cost probe
    rows, never pair rows (no doc-x-doc table in the plan)."""
    import hashlib

    from pyspider_spark.operators.dedup import winnow_contamination

    def salad(tag, n=30):
        return " ".join(
            hashlib.md5(f"{tag}-{j}".encode()).hexdigest()[:10] for j in range(n)
        )

    leaked = salad("leaked")
    passage = salad("passage", 12)
    corpus_rows = [(100 + i, salad(f"corpus{i}")) for i in range(20)]
    corpus_rows += [(200, leaked), (201, "intro " + passage + " outro")]
    bench_rows = [
        (1, leaked),                              # fully contaminated
        (2, salad("clean-bench")),                # clean
        (3, salad("half-a", 10) + " " + passage), # partial
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")

    out = winnow_contamination(corpus, bench, k=8, w=4)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["frac"] == 1.0
    assert got[2]["frac"] <= 0.05
    assert 0.2 <= got[3]["frac"] <= 0.9
    for r in got.values():
        assert r["n_fps"] > 0 and 0 <= r["n_hit"] <= r["n_fps"]

    # scale shape: no pair-shaped join — the probe is one long-key join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ensemble_near_dup_votes(spark):
    """A verbatim-ish near-dup is confirmed by multiple families; a pair
    only one family can see (a lifted paragraph inside otherwise
    unrelated pages -> winnow only) is vetoed at min_votes=2 but
    reported at min_votes=1 with the right flags."""
    import hashlib

    from pyspider_spark.operators.dedup import ensemble_near_dup

    def salad(tag, n=40):
        return " ".join(
            hashlib.md5(f"{tag}-{j}".encode()).hexdigest()[:8] for j in range(n)
        )

    base = ("the quick brown fox jumps over the lazy dog while the band "
            "plays a slow waltz under paper lanterns in the square ") * 3
    lift = salad("lifted-passage", 14)
    rows = [
        (0, base), (1, base + "tiny tail"),              # multi-family dup
        (2, salad("page-a", 30) + " " + lift),           # winnow-only pair
        (3, lift + " " + salad("page-b", 30)),
        (4, salad("clean")),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    strict = {(r["doc_a"], r["doc_b"]): r
              for r in ensemble_near_dup(docs, min_votes=2,
                                         winnow_min_shared=3).collect()}
    assert (0, 1) in strict and strict[(0, 1)]["votes"] >= 2
    assert (2, 3) not in strict                     # single-family veto

    loose = {(r["doc_a"], r["doc_b"]): r
             for r in ensemble_near_dup(docs, min_votes=1,
                                        winnow_min_shared=3).collect()}
    r23 = loose[(2, 3)]
    assert r23["by_winnow"] and not r23["by_minhash"] and r23["votes"] == 1
    assert not any(4 in p for p in loose)           # clean doc pairs nothing
