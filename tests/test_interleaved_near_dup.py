"""Doc-level near-dup over interleaved text+media documents: the two
modalities must vote independently (a text mirror with fresh images is NOT
a media match and vice versa), the evidence values must be exact, and the
plan must stay bucketed (no all-pairs anywhere)."""

from pyspark.sql import functions as F

from pyspider_spark.operators.dedup import interleaved_near_dup

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def _doc(doc_id, text_chunks, media_refs):
    spans, off = [], 0
    for t, r in zip(text_chunks, media_refs):
        spans.append(("text", t, None, off))
        spans.append(("media", None, r, off + 1))
        off += 2
    return (doc_id, spans)


def _hashes(spark, rows):
    return spark.createDataFrame(rows, "media_ref string, phash long")


BODY_A = "the quick brown fox jumps over the lazy dog again and again today"
BODY_B = "completely different prose about distributed query engines at scale"


def test_modalities_vote_independently(spark):
    docs = spark.createDataFrame(
        [
            _doc("mirror1", [BODY_A, BODY_A], ["m1", "m2"]),
            _doc("mirror2", [BODY_A, BODY_A], ["m1x", "m2x"]),  # near-dup media
            _doc("textfarm", [BODY_A, BODY_A], ["m7", "m8"]),   # same text, fresh media
            _doc("stock", [BODY_B, BODY_B], ["m1", "m9"]),      # reuses m1 verbatim
            _doc("loner", ["nothing shared here at all", "x"], ["m5", "m6"]),
        ],
        SPAN_SCHEMA,
    )
    # md5-derived hashes (dense, pairwise hamming ~32 — sparse hand values
    # like 0 / 1<<20 are all within hamming 2 of each other and pair
    # spuriously); m1x/m2x are planted 2-bit perturbations
    import hashlib

    def h(name):
        return int.from_bytes(
            hashlib.md5(name.encode()).digest()[:8], "big", signed=True
        )

    hashes = _hashes(spark, [
        ("m1", h("m1")), ("m1x", h("m1") ^ 3), ("m2", h("m2")),
        ("m2x", h("m2") ^ 6), ("m7", h("m7")), ("m8", h("m8")),
        ("m9", h("m9")), ("m5", h("m5")), ("m6", h("m6")),
    ])
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in interleaved_near_dup(
            docs, hashes, min_votes=1, minhash_threshold=0.7,
            media_max_hamming=3, media_min_overlap=0.5,
        ).collect()
    }
    both = rows[("mirror1", "mirror2")]
    assert both["by_text"] and both["by_media"] and both["votes"] == 2
    assert both["text_jaccard"] == 1.0 and both["media_overlap"] == 1.0
    farm1 = rows[("mirror1", "textfarm")]
    assert farm1["by_text"] and not farm1["by_media"] and farm1["votes"] == 1
    assert farm1["media_overlap"] is None
    stock = rows[("mirror1", "stock")]
    assert stock["by_media"] and not stock["by_text"]
    assert stock["media_overlap"] == 0.5  # one of two refs matched (identity m1)
    assert not any("loner" in k for pair in rows for k in pair)


def test_span_order_not_array_order_defines_text(spark):
    """Text evidence must follow span OFFSETS, not array position: two docs
    with the same chunks in different array order but identical offsets
    are exact text dups; swapped offsets are not (different concat)."""
    c1, c2 = "alpha beta gamma delta epsilon zeta", "one two three four five six"
    rows = [
        ("a", [("text", c1, None, 0), ("text", c2, None, 2)]),
        ("b", [("text", c2, None, 2), ("text", c1, None, 0)]),  # shuffled array
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = interleaved_near_dup(
        docs, _hashes(spark, [("zzz", 1)]), min_votes=1, minhash_threshold=0.9
    ).collect()
    assert len(out) == 1 and out[0]["text_jaccard"] == 1.0


def test_no_allpairs_in_plan(spark):
    docs = spark.createDataFrame(
        [_doc(f"d{i}", [f"text number {i} body", "tail"], [f"m{i}", f"n{i}"])
         for i in range(20)],
        SPAN_SCHEMA,
    )
    hashes = _hashes(spark, [(f"m{i}", i << 8) for i in range(20)]
                     + [(f"n{i}", -(i + 1) << 16) for i in range(20)])
    df = interleaved_near_dup(docs, hashes)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    df.collect()  # runs
