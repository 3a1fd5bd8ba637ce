"""Text analysis for training-data pipelines (SURVEY.md §2 extras):
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything is JVM-side expression API (whole-stage codegen) — no Python in
the hot path. Each helper returns a Column so operators compose; the exact
same semantics are mirrored in __spark_entry__.oracle_sql for the DuckDB
correctness gate, so formulas deliberately stick to ANSI-expressible
primitives (length/regexp/md5/case).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny marker-word lists per language (public-knowledge stopwords)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "de", "que", "es"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/null-safe."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish proxy: word pieces + digits + punctuation as separate tokens
    (a regex segmentation, not a trained merge table)."""
    t = F.coalesce(text, F.lit(""))
    pieces = F.regexp_count(t, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))
    return pieces


def punct_ratio(text: Column) -> Column:
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    punct = F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]"))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n.cast("double"))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = LANG_MARKERS[lang]
    t = F.lower(F.coalesce(text, F.lit("")))
    hits = sum(
        (F.regexp_count(t, F.lit(rf"\b{w}\b")) for w in words), F.lit(0)
    )
    toks = token_count(text)
    return F.when(toks == 0, F.lit(0.0)).otherwise(hits.cast("double") / toks.cast("double"))


def quality_score(text: Column) -> Column:
    """Length / punctuation / stopword linear score clipped to [0, 1].
    Deliberately simple and SQL-mirrorable."""
    n = F.length(F.coalesce(text, F.lit(""))).cast("double")
    len_term = F.least(n / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(text, "en")
    pr = punct_ratio(text)
    raw = F.lit(0.5) * len_term + F.lit(2.0) * sw - F.lit(1.0) * pr + F.lit(0.3)
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))


def lang_guess(text: Column) -> Column:
    """Marker-word vote: the language with the most stopword hits wins;
    CJK-codepoint presence short-circuits to 'zh'. Deterministic CASE
    expression (mirrored 1:1 in the DuckDB oracle)."""
    t = F.lower(F.coalesce(text, F.lit("")))
    votes = {
        lang: sum((F.regexp_count(t, F.lit(rf"\b{w}\b")) for w in ws), F.lit(0))
        for lang, ws in LANG_MARKERS.items()
    }
    has_cjk = F.regexp_count(t, F.lit(r"[\x{4e00}-\x{9fff}]")) > 0
    best = F.greatest(*votes.values())
    out = F.lit("unknown")
    # ties break by fixed lang order (en, de, fr, es) — first max wins
    for lang in reversed(["en", "de", "fr", "es"]):
        out = F.when((votes[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return F.when(has_cjk, F.lit("zh")).otherwise(out)


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (content-defined identity for exact dedup; SQL-mirrorable)."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", " ")
    return F.md5(norm)


def rolling_hash64(text: Column) -> Column:
    """64-bit rolling-style hash (xxhash64 of the normalized text) for
    cheap join keys; NOT SQL-portable — used by rows-only operators."""
    norm = F.regexp_replace(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+", " ")
    return F.xxhash64(norm)
