"""P2 response accessors over raw bytes: encoding detection + .text /
.json for a binary ``content`` column (reference semantics:
pyspider/libs/response.py:60-163 and get_encoding at response.py:211-234,
re-expressed — not copied — as an Arrow-batched kernel).

Detection order (same as the reference):
  1. charset parameter of the Content-Type header (quotes stripped)
  2. <meta charset=...> / <meta ... content="...charset=..."> / <?xml
     encoding=...> regexes over the first 1000 bytes
  3. statistical detection (charset_normalizer — chardet's successor —
     gated behind an import so the kernel degrades to step 4 without it)
  4. utf-8
plus the gb2312 → gb18030 upgrade (gb18030 is the superset; real pages
labelled gb2312 routinely contain gb18030-only codepoints).

Decoding is inherently per-row Python (bytes.decode with errors=replace),
so this is a pandas UDF — Arrow batches in, one decode call per row, no
Python-object serialization beyond the batch. ``.json`` stays JVM-side
via try_parse_json (VariantType — schema-less like the reference's
json.loads). ``.doc``/``.etree`` (pyquery/lxml DOM) are out of scope:
lxml is absent here and DOM selection belongs to the span-extraction
design (SURVEY §1.5).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

try:  # statistical fallback, optional
    from charset_normalizer import from_bytes as _cn_from_bytes
except ImportError:  # pragma: no cover
    _cn_from_bytes = None

_CHARSET_HDR_RE = re.compile(r"charset=[\"']*([^\"';\s]+)", re.I)
_META_CHARSET_RE = re.compile(r"<meta.*?charset=[\"']*(.+?)[\"'>]", re.I)
_META_PRAGMA_RE = re.compile(r"<meta.*?content=[\"']*;?charset=(.+?)[\"'>]", re.I)
_XML_RE = re.compile(r"^<\?xml.*?encoding=[\"']*(.+?)[\"'>]")


def detect_encoding(content: bytes | None, content_type: str | None) -> str:
    """Scalar reference implementation (the UDF vectorizes over this)."""
    encoding = None
    if content_type:
        m = _CHARSET_HDR_RE.search(content_type)
        if m:
            encoding = m.group(1).strip("'\"")
    if not encoding and content:
        head = content[:1000].decode("latin-1", "replace")
        found = (
            _META_CHARSET_RE.findall(head)
            + _META_PRAGMA_RE.findall(head)
            + _XML_RE.findall(head)
        )
        encoding = found[0] if found else None
    if not encoding and content and _cn_from_bytes is not None:
        best = _cn_from_bytes(content[:600]).best()
        encoding = best.encoding if best else None
    if encoding and encoding.lower() == "gb2312":
        encoding = "gb18030"
    return encoding or "utf-8"


def decode_text(content: bytes | None, encoding: str) -> str:
    """content.decode(encoding, 'replace'); unknown codec falls back to
    utf-8 (reference text property's LookupError path)."""
    if not content:
        return ""
    try:
        return content.decode(encoding, "replace")
    except LookupError:
        return content.decode("utf-8", "replace")


@F.pandas_udf(StringType())
def encoding_udf(content: pd.Series, content_type: pd.Series) -> pd.Series:
    return pd.Series(
        [detect_encoding(c, ct) for c, ct in zip(content, content_type)]
    )


@F.pandas_udf(StringType())
def text_udf(content: pd.Series, encoding: pd.Series) -> pd.Series:
    return pd.Series([decode_text(c, e or "utf-8") for c, e in zip(content, encoding)])


def with_response_text(
    df: DataFrame, content_col: str = "content",
    content_type_col: str = "content_type",
    encoding_out: str = "encoding", text_out: str = "text",
) -> DataFrame:
    """Adds ``encoding`` + ``text`` columns decoded from raw bytes."""
    return df.withColumn(
        encoding_out, encoding_udf(F.col(content_col), F.col(content_type_col))
    ).withColumn(text_out, text_udf(F.col(content_col), F.col(encoding_out)))


def response_json(text: Column) -> Column:
    """.json accessor: schema-less parse, NULL on invalid — JVM-side
    (VariantType), mirroring json.loads-or-None."""
    return F.try_parse_json(text)
