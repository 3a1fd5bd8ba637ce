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


_SCHEME_RE = r"[A-Za-z][A-Za-z0-9+.\-]*"


def _lower_scheme(s: pd.Series) -> pd.Series:
    """Vectorized scheme lowercasing: split at '://', lower the left part."""
    parts = s.str.extract(rf"^({_SCHEME_RE})(://.*)$")
    has = parts[0].notna()
    out = s.copy()
    out[has] = parts.loc[has, 0].str.lower() + parts.loc[has, 1]
    return out


_ABS_RE = r"^(?P<sc>[A-Za-z][A-Za-z0-9+.\-]*)(?P<au>://[^/?#\s]+)(?P<rest>[/?#].*|)$"
_ORIGIN_RE = r"^(?P<sc>[A-Za-z][A-Za-z0-9+.\-]*)(?P<au>://[^/?#]+)"


def _canonicalize_batch(href: pd.Series, base: pd.Series) -> pd.Series:
    """Vectorized canonicalizer (byte-identical to ``canonicalize_url``;
    property-tested). PyArrow-compute path (RE2, C++ SIMD) with a pandas
    fallback; only exotic residue (non-ASCII, path-relative refs) drops to
    the per-element scalar.

    Classes:
      A. absolute ASCII URL with a path  → lower-scheme, else identity
      D. absolute ASCII URL missing path → insert '/', lower-scheme
      C. root-relative ASCII '/x' + absolute ASCII base → origin + href
      E. everything else → scalar fallback
    """
    try:
        return _canonicalize_batch_arrow(href, base)
    except Exception:  # pragma: no cover - env without arrow compute
        return _canonicalize_batch_pandas(href, base)


def _canonicalize_batch_arrow(href: pd.Series, base: pd.Series) -> pd.Series:
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.utf8_trim_whitespace(pa.Array.from_pandas(href.fillna("").astype(str)))
    b = pa.Array.from_pandas(base.fillna("").astype(str))
    ascii_ok = pc.invert(pc.match_substring_regex(s, r"[^\x20-\x7e]"))

    m = pc.extract_regex(s, _ABS_RE)
    is_abs = pc.and_(pc.is_valid(m), ascii_ok)
    sc = pc.utf8_lower(pc.struct_field(m, "sc"))
    au = pc.struct_field(m, "au")
    rest = pc.struct_field(m, "rest")
    mid = pc.if_else(pc.starts_with(rest, "/"), pa.scalar(""), pa.scalar("/"))
    abs_out = pc.binary_join_element_wise(sc, au, mid, rest, pa.scalar(""))

    is_rel = pc.and_(
        pc.and_(pc.starts_with(s, "/"), pc.invert(pc.starts_with(s, "//"))), ascii_ok
    )
    bm = pc.extract_regex(b, _ORIGIN_RE)
    b_ok = pc.and_(
        pc.is_valid(bm), pc.invert(pc.match_substring_regex(b, r"[^\x20-\x7e]"))
    )
    origin = pc.binary_join_element_wise(
        pc.utf8_lower(pc.struct_field(bm, "sc")), pc.struct_field(bm, "au"), pa.scalar("")
    )
    rel_out = pc.binary_join_element_wise(origin, s, pa.scalar(""))
    is_rel_ok = pc.and_(is_rel, b_ok)

    out_arr = pc.if_else(
        is_abs, abs_out, pc.if_else(is_rel_ok, rel_out, pa.scalar(None, pa.string()))
    )
    out = out_arr.to_pandas()
    covered = pc.or_(is_abs, is_rel_ok).to_pandas().fillna(False)

    rest_idx = out.index[~covered]
    if len(rest_idx):
        sp = s.to_pandas()
        out.loc[rest_idx] = [
            canonicalize_url(h, bb)
            for h, bb in zip(sp.loc[rest_idx], base.fillna("").loc[rest_idx])
        ]
    out[href.isna()] = None
    return out


def _canonicalize_batch_pandas(href: pd.Series, base: pd.Series) -> pd.Series:
    s = href.fillna("").str.strip()
    b = base.fillna("")
    is_ascii = ~s.str.contains(r"[^\x20-\x7e]", regex=True, na=False)

    out = pd.Series(index=s.index, dtype=object)

    # ONE structural pass: absolute URLs split into scheme/authority/rest
    m = s.str.extract(rf"^({_SCHEME_RE})(://[^/?#\s]+)([/?#].*)?$")
    scheme, auth, rest = m[0], m[1], m[2].fillna("")
    absolute = scheme.notna() & is_ascii
    starts_slash = rest.str.startswith("/")

    # A: has a path → lower-scheme only; D: no path → insert '/'
    a = absolute & starts_slash
    if a.any():
        out[a] = scheme[a].str.lower() + auth[a] + rest[a]
    d = absolute & ~starts_slash
    if d.any():
        out[d] = scheme[d].str.lower() + auth[d] + "/" + rest[d]
    done = absolute.copy()

    # C: root-relative '/x' (not '//x') against an absolute ASCII base →
    # origin + href (= urljoin semantics)
    c = ~done & is_ascii & s.str.startswith("/") & ~s.str.startswith("//")
    if c.any():
        bc = b[c]
        base_ok = ~bc.str.contains(r"[^\x20-\x7e]", regex=True, na=False)
        bm = bc.str.extract(rf"^({_SCHEME_RE})(://[^/?#]+)")
        cc_local = base_ok & bm[0].notna()
        cc = pd.Series(False, index=s.index)
        cc[c] = cc_local
        if cc.any():
            out[cc] = bm[0][cc_local].str.lower() + bm[1][cc_local] + s[cc]
            done |= cc

    # E: residue → scalar fallback (exact reference semantics)
    rest_idx = out.index[~done]
    if len(rest_idx):
        out.loc[rest_idx] = [
            canonicalize_url(h, bb) for h, bb in zip(s.loc[rest_idx], b.loc[rest_idx])
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


def curl_to_crawl_kwargs(curl_cmd: str) -> dict:
    """P5: import a `curl ...` command line as crawl kwargs (reference
    behavior: pyspider/libs/url.py:73-123 — own implementation, shlex
    tokenization with a small option table instead of a flag state loop).

    Driver-side helper used at seed time (no Spark involvement): returns
    {urls, method?, data?, headers?, use_gzip?}.
    """
    import shlex

    toks = shlex.split(curl_cmd)
    if not toks or toks[0] != "curl":
        raise ValueError("not a curl command")
    out: dict = {}
    headers: dict[str, str] = {}
    urls: list[str] = []
    it = iter(toks[1:])
    for tok in it:
        if tok == "--compressed":
            out["use_gzip"] = True
        elif tok in ("-H", "--header"):
            key, _, value = next(it).partition(":")
            if value:
                headers[key.strip()] = value.strip()
        elif tok in ("-d", "--data"):
            out["data"] = next(it)
        elif tok == "--data-binary":
            v = next(it)
            out["data"] = v[1:] if v.startswith("$") else v
        elif tok in ("-X", "--request"):
            out["method"] = next(it)
        elif tok.startswith("-"):
            raise ValueError(f"unsupported curl option: {tok}")
        else:
            urls.append(tok)
    if not urls:
        raise ValueError("curl: no URL given")
    out["urls"] = urls
    if headers:
        out["headers"] = headers
    return out


def host_bucket(host: Column, n_buckets: int = N_HOST_BUCKETS) -> Column:
    """Stable shard of the host space. The frontier is partitioned by
    (project, host_bucket): rank-select windows and URL-seen anti-joins are
    then partition-local, and a hot host is confined to one bucket which AQE
    skew-split + salting handle (see operators/frontier.select_wave)."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")
