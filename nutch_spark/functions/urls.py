"""URL canonicalization, hashing, partitioning and representative-URL
choice — the URL-seen contract.

Pure-Python kernels (unit-tested against the reference's vectors) plus
Arrow-vectorized pandas UDF wrappers for DataFrame use. Semantics:

* ``normalize_basic`` — reference BasicURLNormalizer.java:53-143,
  vectors at TestBasicURLNormalizer.java:38-98.
* ``normalize_regex`` — reference RegexURLNormalizer.java:162-313 with
  the default rule set of conf/regex-normalize.xml.template.
* ``url_hash31`` — reference Generator.HashComparator.hash
  (Generator.java:407-415): reversed-byte 31-multiplier hash used to
  interleave hosts inside a fetch partition.
* ``choose_repr`` — reference URLUtil.chooseRepr (URLUtil.java:325-425).
* ``get_domain`` — reference URLUtil.getDomainName (URLUtil.java:94-114)
  driven by a public-suffix table.
"""

from __future__ import annotations

import re
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType

# ---------------------------------------------------------------------------
# URL parsing (mirrors java.net.URL component splitting)
# ---------------------------------------------------------------------------

_URL_RE = re.compile(
    r"^(?P<proto>[a-zA-Z][a-zA-Z0-9+.-]*):"
    r"(?://(?P<auth>[^/?#]*))?"
    r"(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?"
    r"(?:#(?P<ref>.*))?$",
    re.S,
)

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}


class ParsedURL:
    __slots__ = ("proto", "host", "port", "path", "query", "ref")

    def __init__(self, proto, host, port, path, query, ref):
        self.proto = proto
        self.host = host
        self.port = port
        self.path = path
        self.query = query
        self.ref = ref

    @property
    def file(self) -> str:
        """path + query, the java.net.URL#getFile analog."""
        if self.query is not None:
            return f"{self.path}?{self.query}"
        return self.path


def parse_url(url: str) -> ParsedURL | None:
    m = _URL_RE.match(url)
    if not m:
        return None
    proto = m.group("proto")
    auth = m.group("auth")
    host, port = None, -1
    if auth is not None:
        # strip userinfo
        if "@" in auth:
            auth = auth.rsplit("@", 1)[1]
        if ":" in auth:
            host, _, p = auth.rpartition(":")
            if p.isdigit():
                port = int(p)
            elif p == "":
                port = -1
            else:
                return None
        else:
            host = auth
    return ParsedURL(proto, host, port, m.group("path"),
                     m.group("query"), m.group("ref"))


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 including removal of leading ``/../`` segments,
    matching BasicURLNormalizer.getFileWithNormalizedPath
    (BasicURLNormalizer.java:112-143)."""
    out: list[str] = []
    i, n = 0, len(path)
    while i < n:
        if path.startswith("../", i):
            i += 3
        elif path.startswith("./", i):
            i += 2
        elif path.startswith("/./", i):
            i += 2  # leave the trailing "/"
        elif path == "/." or path[i:] == "/.":
            out.append("/")
            break
        elif path.startswith("/../", i):
            i += 3  # leave the trailing "/"
            if out:
                out.pop()
        elif path[i:] == "/..":
            if out:
                out.pop()
            out.append("/")
            break
        elif path[i:] in (".", ".."):
            break
        else:
            j = path.find("/", i + 1)
            if j == -1:
                j = n
            seg = path[i:j]
            # collapse empty segments ("//") except a trailing slash,
            # matching java.net.URI.normalize as exercised by
            # TestBasicURLNormalizer.java:86-95
            if seg != "/" or j == n:
                out.append(seg)
            i = j
    return "".join(out)


# pattern gate: only normalize paths containing /. or ./ or //
# (BasicURLNormalizer.java:50-51)
_HAS_NORMALIZABLE = re.compile(r"/[./]|[.]/")


def normalize_basic(url: str) -> str | None:
    """Port of BasicURLNormalizer.normalize (BasicURLNormalizer.java:53-110).

    Returns the normalized URL or None if malformed."""
    if url == "":
        return url
    url = url.strip()
    u = parse_url(url)
    if u is None or u.host is None and u.proto in _DEFAULT_PORTS:
        return None

    proto = u.proto.lower()
    host, port, path, query = u.host, u.port, u.path, u.query
    changed = proto != u.proto or not url.startswith(u.proto)

    if proto in ("http", "https", "ftp"):
        if host is not None:
            lhost = host.lower()
            if lhost != host:
                host = lhost
                changed = True
        if port == _DEFAULT_PORTS.get(proto):
            port = -1
            changed = True
        if (path == "" and query is None):
            path = "/"
            changed = True
        if u.ref is not None:
            changed = True
        if _HAS_NORMALIZABLE.search(path):
            path2 = _remove_dot_segments(path)
            if path2 == "":
                path2 = "/"
            if path2 != path:
                path = path2
                changed = True

    if not changed:
        return url
    portpart = f":{port}" if port != -1 else ""
    querypart = f"?{query}" if query is not None else ""
    if host is None:
        return f"{proto}:{path}{querypart}"
    return f"{proto}://{host}{portpart}{path}{querypart}"


# ---------------------------------------------------------------------------
# Regex normalizer — default rules of conf/regex-normalize.xml.template
# ---------------------------------------------------------------------------

# (pattern, substitution) applied in order, all occurrences
# (RegexURLNormalizer.java:173-186 uses matcher.replaceAll)
DEFAULT_REGEX_RULES: tuple[tuple[str, str], ...] = (
    # strip session ids
    (r"(?i)(;?\b_?(l|j|bv_)?(sid|phpsessid|sessionid)=.*?)(\?|&|#|$)", r"\4"),
    # strip interpage anchors
    (r"#.*?(\?|&|$)", r"\1"),
    # ?& -> ?
    (r"\?&", "?"),
    # && -> &
    (r"&{2,}", "&"),
    # trailing ? & .
    (r"[?&.]$", ""),
    # file://+ -> file:/
    (r"^file://+", "file:/"),
    # duplicate slashes (not after protocol colon)
    (r"(?<!:)/{2,}", "/"),
)

_COMPILED_DEFAULT_RULES = tuple(
    (re.compile(p), s) for p, s in DEFAULT_REGEX_RULES
)


def normalize_regex(url: str, rules=None) -> str:
    compiled = _COMPILED_DEFAULT_RULES if rules is None else tuple(
        (re.compile(p), s) for p, s in rules
    )
    for pat, sub in compiled:
        url = pat.sub(sub, url)
    return url


def canonicalize(url: str) -> str | None:
    """Full chain: Basic then Regex (urlnormalizer.order,
    nutch-default.xml:1040)."""
    out = normalize_basic(url)
    if out is None or out == "":
        return out
    return normalize_regex(out)


# ---------------------------------------------------------------------------
# Host / domain / queue id
# ---------------------------------------------------------------------------

# Full effective-TLD table (2,675 entries: IANA TLDs + registrar-managed
# public suffixes), the same data set the reference loads from
# conf/domain-suffixes.xml via DomainSuffixesReader — every entry is a
# member regardless of status, matching DomainSuffixes.isDomainSuffix.
from ._domain_suffixes import DOMAIN_SUFFIXES as _SUFFIXES

_IP_RE = re.compile(r"^(\d{1,3}\.){3}\d{1,3}$")


def get_host(url: str) -> str | None:
    """Lowercased hostname (URLUtil.java:427-433)."""
    u = parse_url(url)
    if u is None or u.host is None:
        return None
    return u.host.lower()


def get_domain(url_or_host: str) -> str | None:
    """Registered-domain extraction (URLUtil.getDomainName,
    URLUtil.java:94-114): shortest host suffix whose parent is a
    public suffix; IPs pass through."""
    if "://" in url_or_host or url_or_host.startswith(("http:", "ftp:")):
        host = get_host(url_or_host)
    else:
        host = url_or_host.lower()
    if host is None:
        return None
    if host.endswith("."):
        host = host[:-1]
    if _IP_RE.match(host):
        return host
    # exact URLUtil.getDomainName walk: strip leading labels until the
    # remainder (candidate minus its first label) is a known suffix —
    # then the candidate is the registered domain. When no dot remains,
    # Java's substring(indexOf('.')+1) == substring(0) re-tests the
    # whole candidate, so a bare known TLD returns itself ("com"→"com")
    # and an unknown last label falls out as-is ("…com.nn"→"nn").
    candidate = host
    while True:
        idx = candidate.find(".")
        sub = candidate[idx + 1:]
        if sub in _SUFFIXES:
            return candidate
        candidate = sub
        if idx < 0:
            return candidate


def get_domain_suffix(url_or_host: str) -> str | None:
    """The matched public suffix itself (URLUtil.getDomainSuffix,
    URLUtil.java:119-139): first candidate-minus-leading-label that is
    a known suffix, walking left to right; IPs and unknown tails yield
    None. ``http://com`` yields ``com`` (the no-dot re-test)."""
    if "://" in url_or_host or url_or_host.startswith(("http:", "ftp:")):
        host = get_host(url_or_host)
    else:
        host = url_or_host.lower()
    if host is None:
        return None
    if host.endswith("."):
        host = host[:-1]
    if _IP_RE.match(host):
        return None
    candidate = host
    while True:
        idx = candidate.find(".")
        sub = candidate[idx + 1:]
        if sub in _SUFFIXES:
            return sub
        candidate = sub
        if idx < 0:
            return None


def queue_id(url: str, mode: str = "byHost") -> str | None:
    """Fetch queue key ``proto://host`` lowercased
    (FetchItem.java:64-101)."""
    u = parse_url(url)
    if u is None or u.host is None:
        return None
    if mode == "byDomain":
        key = get_domain(u.host.lower())
    else:
        key = u.host.lower()
    return f"{u.proto.lower()}://{key}"


# ---------------------------------------------------------------------------
# Fetchlist ordering hash (Generator.HashComparator.hash,
# Generator.java:407-415)
# ---------------------------------------------------------------------------

def url_hash31(url: str) -> int:
    """hash = 31*hash + byte, iterating bytes last-to-first, int32
    wraparound. Later bytes are more significant so sorting by the hash
    breaks up per-host runs."""
    h = 1
    b = url.encode("utf-8")
    for i in range(len(b) - 1, -1, -1):
        v = b[i] if b[i] < 128 else b[i] - 256  # signed byte
        h = (31 * h + v) & 0xFFFFFFFF
    if h >= 0x80000000:
        h -= 0x100000000
    return h


def _url_hash31_series(s: pd.Series) -> pd.Series:
    """Vectorized url_hash31 over a batch.

    Closed form of the byte loop: processing bytes last-to-first from
    h=1 gives h = 31^L + Σ b[i]·31^i (mod 2^32) with signed bytes.
    Computed with numpy over the concatenated byte buffer — per-string
    segment sums via wraparound uint64 cumsum (no per-row Python loop;
    the input_hint mandates vectorized UDFs throughout)."""
    mask = s.notna()
    vals = s[mask]
    if len(vals) == 0:
        return pd.Series([None] * len(s), index=s.index, dtype="Int32")
    enc = [u.encode("utf-8") for u in vals]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64,
                       count=len(enc))
    data = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
    data = np.where(data >= 128, data - 256, data)       # signed bytes
    starts = np.zeros(len(enc) + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    pos = np.arange(len(data), dtype=np.int64) \
        - np.repeat(starts[:-1], lens)
    maxlen = int(lens.max(initial=0))
    pows = np.empty(maxlen + 1, dtype=np.uint64)
    pows[0] = 1
    for i in range(1, maxlen + 1):
        pows[i] = (pows[i - 1] * np.uint64(31)) & np.uint64(0xFFFFFFFF)
    terms = (data.astype(np.uint64) & np.uint64(0xFFFFFFFF)) * pows[pos]
    with np.errstate(over="ignore"):
        csum = np.concatenate(
            [np.zeros(1, dtype=np.uint64), np.cumsum(terms)])
    segsum = csum[starts[1:]] - csum[starts[:-1]]   # wraps mod 2^64 ok
    h = (segsum + pows[lens]) & np.uint64(0xFFFFFFFF)
    out32 = h.astype(np.uint32).astype(np.int32)    # two's complement
    out = pd.Series([None] * len(s), index=s.index, dtype="Int32")
    out[mask] = out32
    return out


# ---------------------------------------------------------------------------
# Representative URL for redirects (URLUtil.chooseRepr,
# URLUtil.java:325-425)
# ---------------------------------------------------------------------------

def choose_repr(src: str, dst: str, temp: bool) -> str:
    su, du = parse_url(src), parse_url(dst)
    if su is None or du is None or su.host is None or du.host is None:
        return dst
    src_domain = get_domain(su.host.lower())
    dst_domain = get_domain(du.host.lower())
    src_file, dst_file = su.file, du.file
    src_root = src_file in ("/", "")
    dst_root = dst_file in ("/", "")

    if src_domain != dst_domain:
        return dst
    if not temp:
        return src if src_root else dst
    # temporary redirect
    if src_root and not dst_root:
        return src
    if not src_root and dst_root:
        return dst
    if not src_root and not dst_root and su.host == du.host:
        n_src = len(src_file.split("/"))
        n_dst = len(dst_file.split("/"))
        if n_src != n_dst:
            return dst if n_dst < n_src else src
        return dst if len(dst_file) < len(src_file) else src
    n_src = len(su.host.split("."))
    n_dst = len(du.host.split("."))
    return dst if n_dst < n_src else src


def resolve_url(base: str, target: str) -> str | None:
    """Outlink resolution against a base URL (URLUtil.resolveURL)."""
    from urllib.parse import urljoin
    try:
        out = urljoin(base, target)
    except ValueError:
        return None
    return out if "://" in out or out.startswith("mailto:") else None


# ---------------------------------------------------------------------------
# pandas UDF wrappers (Arrow-vectorized; the only Python in the hot path)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=1)
def spark_udfs():
    """Registered once per process; importable from executors."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def canonicalize_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: canonicalize(u) if u is not None else None)

    @pandas_udf(StringType())
    def host_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: get_host(u) if u is not None else None)

    @pandas_udf(StringType())
    def domain_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: get_domain(u) if u is not None else None)

    @pandas_udf(IntegerType())
    def url_hash_udf(urls: pd.Series) -> pd.Series:
        return _url_hash31_series(urls).astype("Int32")

    @pandas_udf(StringType())
    def queue_id_udf(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: queue_id(u) if u is not None else None)

    @pandas_udf(StringType())
    def suffix_udf(urls: pd.Series) -> pd.Series:
        return urls.map(
            lambda u: get_domain_suffix(u) if u is not None else None)

    return {
        "canonicalize": canonicalize_udf,
        "host": host_udf,
        "domain": domain_udf,
        "url_hash": url_hash_udf,
        "queue_id": queue_id_udf,
        "suffix": suffix_udf,
    }


def host_col(url) -> "F.Column":
    """JVM-side host extraction (lowercased, no port) for the common
    scheme://host/... shape — stays inside whole-stage codegen; NULL
    when the url has no authority."""
    c = F.col(url) if isinstance(url, str) else url
    h = F.lower(F.regexp_extract(
        c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))
    return F.when(h != "", h)


def queue_id_col(url) -> "F.Column":
    """JVM-side fetch-queue key ``proto://host`` lowercased
    (FetchItem.java:64-101, byHost mode)."""
    c = F.col(url) if isinstance(url, str) else url
    proto = F.lower(F.regexp_extract(
        c, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    return F.when(proto != "",
                  F.concat(proto, F.lit("://"), host_col(c)))


def with_host(df, url_col: str = "url", out: str = "host"):
    """JVM-side host column (see host_col). Used on hot paths instead
    of the pandas UDF."""
    return df.withColumn(
        out, F.coalesce(host_col(url_col), F.lit("")))
