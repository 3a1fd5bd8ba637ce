"""URL kernel: canonicalization, taskid, host extraction, host bucketing.

Semantics re-expressed from the reference (NOT copied):
  - canonical form: /root/reference/pyspider/libs/url.py:29-70 (`_build_url`
    + `quote_chinese`): strip, IDNA-encode netloc, default path '/',
    percent-encode non-ASCII bytes; relative hrefs joined against the page
    URL (response.doc absolutizes links, libs/response.py:127-146).
  - taskid = md5(canonical url): pyspider/libs/base_handler.py:342-344.

Hot path is JVM-side (md5, parse_url, xxhash64). Canonicalization needs
IDNA/percent-encoding, so it is a *vectorized* pandas UDF: the overwhelmingly
common case (absolute ASCII http(s) URL with a path) is handled with pandas
vector string ops; only the residue (relative refs, missing path, non-ASCII)
drops to a per-element fallback inside the Arrow batch.
"""

from __future__ import annotations

from urllib.parse import urljoin, urlparse, urlunparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

N_HOST_BUCKETS = 64


def canonicalize_url(href: str, base: str | None = None) -> str | None:
    """Scalar canonicalizer (single source of truth; the pandas UDF's slow
    path and the pure-Python model simulation both call this)."""
    if href is None:
        return None
    url = href.strip()
    if base:
        url = urljoin(base, url)
    scheme, netloc, path, params, query, fragment = urlparse(url)
    try:
        netloc = netloc.encode("idna").decode("utf-8")
    except UnicodeError:
        netloc = netloc.lower()
    if not path:
        path = "/"
    out = urlunparse([scheme, netloc, path, params, query, fragment])
    # percent-encode non-ASCII bytes (reference quote_chinese semantics)
    if out.isascii():
        return out
    return "".join(
        chr(b) if b < 128 else "%%%02X" % b for b in out.encode("utf-8")
    )


def _canonicalize_batch(href: pd.Series, base: pd.Series) -> pd.Series:
    # Fast path: absolute ASCII http(s) URL that already has a path and no
    # whitespace padding — identity. Vectorized checks only.
    stripped = href.fillna("")
    fast = (
        stripped.str.match(r"^https?://[\x21-\x7e]+/", na=False)
        & ~stripped.str.contains(r"[^\x20-\x7e]|^\s|\s$", regex=True, na=False)
    )
    out = stripped.copy()
    slow_idx = out.index[~fast]
    if len(slow_idx):
        out.loc[slow_idx] = [
            canonicalize_url(h, b)
            for h, b in zip(stripped.loc[slow_idx], base.loc[slow_idx].fillna(""))
        ]
    out[href.isna()] = None
    return out


@F.pandas_udf(StringType())
def canonicalize_pudf(href: pd.Series, base: pd.Series) -> pd.Series:  # type: ignore[misc]
    return _canonicalize_batch(href, base)


def canonical(href: Column, base: Column | None = None) -> Column:
    base = base if base is not None else F.lit(None).cast("string")
    return canonicalize_pudf(href, base)


def taskid_of(url: Column) -> Column:
    """md5(canonical url) — base_handler.py:342-344 / libs/utils.py:20."""
    return F.md5(url)


def host_of(url: Column) -> Column:
    """Lower-cased hostname; JVM-side (no Python)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


def path_of(url: Column) -> Column:
    return F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("/"))


def host_bucket(host: Column, n_buckets: int = N_HOST_BUCKETS) -> Column:
    """Stable shard of the host space. The frontier is partitioned by
    (project, host_bucket): rank-select windows and URL-seen anti-joins are
    then partition-local, and a hot host is confined to one bucket which AQE
    skew-split + salting handle (see operators/frontier.select_wave)."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")
