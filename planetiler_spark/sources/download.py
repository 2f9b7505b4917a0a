"""Download/bootstrap utilities — util/Downloader.java:65-345 and
util/Geofabrik.java:26-134 re-expressed with the stdlib HTTP client.

Semantics ported:
  - HEAD with redirect following (max 5), content-length + Accept-Ranges
    detection (Downloader.httpHead:243-263);
  - chunked RANGED download: the tmp file is pre-sized, fixed-size ranges
    are fetched concurrently by a bounded thread pool and written at their
    offsets, each range retries independently with its progress counter
    rewound (httpDownload:264-336), then one atomic rename publishes;
  - up-to-date skip when the existing output's size equals the remote size
    (downloadIfNecessary:196-200);
  - Geofabrik index search: token-set match on ids, then exact name, then
    approximate name, each tier erroring on multiple matches
    (Geofabrik.searchIndexForDownloadUrl:73-103).

No network exists in this sandbox, so tests drive everything against an
in-process HTTP server (tests/test_download.py) — the same way the
pushgateway client is verified.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

MAX_REDIRECTS = 5  # Downloader.java:67
DEFAULT_CHUNK_SIZE = 64 * 1024 * 1024
USER_AGENT = "planetiler_spark-downloader"


@dataclass
class ResourceMetadata:
    """Downloader.ResourceMetadata:348."""
    canonical_url: str
    size: int | None
    accept_range: bool


def _head_once(url: str, timeout: float) -> tuple[ResourceMetadata, str | None]:
    req = urllib.request.Request(url, method="HEAD",
                                 headers={"User-Agent": USER_AGENT})
    # handle redirects manually so MAX_REDIRECTS is enforced like the
    # reference (urllib would follow silently)
    opener = urllib.request.build_opener(_NoRedirect())
    try:
        resp = opener.open(req, timeout=timeout)
    except urllib.error.HTTPError as e:
        if 300 <= e.code < 400:
            loc = e.headers.get("Location")
            if not loc:
                raise IOError(f"received {e.code} but no location header from {url}")
            return ResourceMetadata(url, None, False), loc
        raise
    if resp.status != 200:
        raise IOError(f"bad response: {resp.status}")
    cl = resp.headers.get("Content-Length")
    accept = "bytes" in (resp.headers.get_all("Accept-Ranges") or [])
    return ResourceMetadata(url, int(cl) if cl is not None else None, accept), None


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


def head(url: str, timeout: float = 30.0) -> ResourceMetadata:
    """HEAD following up to MAX_REDIRECTS redirects
    (httpHeadFollowRedirects:236-241)."""
    from urllib.parse import urljoin
    for _ in range(MAX_REDIRECTS + 1):
        meta, redirect = _head_once(url, timeout)
        if redirect is None:
            meta.canonical_url = url  # GETs go to the post-redirect URL
            return meta
        url = urljoin(url, redirect)
    raise IOError(f"exceeded {MAX_REDIRECTS} redirects for {url}")


def open_stream(url: str, timeout: float = 30.0, start: int | None = None,
                end: int | None = None):
    """GET, optionally with a half-open [start, end) Range header
    (openStreamRange:115)."""
    headers = {"User-Agent": USER_AGENT}
    if start is not None:
        headers["Range"] = f"bytes={start}-{end - 1}"
    req = urllib.request.Request(url, headers=headers)
    return urllib.request.urlopen(req, timeout=timeout)


class Progress:
    """Thread-safe downloaded-bytes counter (rewindable on chunk retry)."""

    def __init__(self):
        self._n = 0
        self._lock = threading.Lock()

    def inc(self, n: int):
        with self._lock:
            self._n += n

    @property
    def bytes(self) -> int:
        with self._lock:
            return self._n


class _RangeUnsupported(IOError):
    """Server advertised Accept-Ranges but answered a ranged GET with 200
    (full body) — fall back to one single-stream download instead of letting
    every chunk write the whole body at its own offset concurrently."""


def download(url: str, output: str, threads: int = 4,
             chunk_size: int = DEFAULT_CHUNK_SIZE, retries: int = 2,
             retry_wait: float = 1.0, timeout: float = 30.0,
             progress: Progress | None = None,
             _limiter: threading.Semaphore | None = None) -> int:
    """Download `url` to `output` (Downloader.downloadIfNecessary +
    httpDownload). Returns bytes downloaded (0 = already up to date).
    `_limiter` caps in-flight chunk fetches across concurrent resources
    (Downloader.java runs everything on ONE bounded executor)."""
    meta = head(url, timeout)
    try:
        if meta.size is not None and os.path.getsize(output) == meta.size:
            return 0  # already up-to-date (:196-200)
    except OSError:
        pass
    progress = progress or Progress()
    url = meta.canonical_url  # Downloader downloads from canonicalUrl (:267)
    tmp = output + "_inprogress"
    os.makedirs(os.path.dirname(os.path.abspath(output)), exist_ok=True)

    ranged = meta.accept_range and threads > 1 and meta.size is not None
    size = meta.size if meta.size is not None else None
    if ranged:
        chunks = [(s, min(s + chunk_size, size))
                  for s in range(0, size, chunk_size)]
    else:
        chunks = [(0, size)]

    # pre-size the tmp file so every chunk writes at its own offset (0 when
    # the size is unknown — a 0-byte body must publish a 0-byte file, not a
    # 1-byte NUL placeholder)
    with open(tmp, "wb") as f:
        f.truncate(size or 0)

    import contextlib
    limiter = _limiter or contextlib.nullcontext()

    def fetch(rng, use_range):
        start, end = rng
        for attempt in range(retries + 1):
            wrote = 0
            try:
                with limiter, open(tmp, "r+b") as fc:
                    fc.seek(start)
                    src = (open_stream(url, timeout, start, end)
                           if use_range else open_stream(url, timeout))
                    with src:
                        if use_range and src.status != 206 \
                                and not src.headers.get("Content-Range"):
                            raise _RangeUnsupported(url)
                        offset = start
                        while end is None or offset < end:
                            buf = src.read(16384)
                            if not buf:
                                break
                            fc.write(buf)
                            offset += len(buf)
                            wrote += len(buf)
                            progress.inc(len(buf))
                        if end is None:
                            # streamed unknown-size body: trim the tail a
                            # shorter retry could otherwise leave behind
                            fc.truncate(offset)
                    if end is not None and offset < end:
                        raise IOError(f"unexpected EOF at {offset}/{end}")
                return
            except _RangeUnsupported:
                raise
            except IOError:
                if attempt == retries:
                    raise
                progress.inc(-wrote)  # rewind the counter (:329)
                time.sleep(retry_wait)

    try:
        try:
            if len(chunks) == 1:
                fetch(chunks[0], ranged)
            else:
                with ThreadPoolExecutor(max_workers=threads) as pool:
                    for f in [pool.submit(fetch, c, True) for c in chunks]:
                        f.result()
        except _RangeUnsupported:
            # one plain GET from scratch (the concurrent 200-bodied chunk
            # writes may have scribbled anywhere in tmp)
            progress.inc(-progress.bytes)
            with open(tmp, "wb") as f:
                f.truncate(size or 0)
            fetch((0, size), False)
        os.replace(tmp, output)  # atomic publish
    finally:
        try:
            os.unlink(tmp)
        except FileNotFoundError:
            pass
    return progress.bytes


class Downloader:
    """Multi-resource downloader (Downloader.add:144 / run:162): resources
    download concurrently, each chunked internally; per-id progress counters
    are exposed for a ProgressLogger."""

    def __init__(self, threads: int = 4, chunk_size: int = DEFAULT_CHUNK_SIZE,
                 retries: int = 2, retry_wait: float = 1.0):
        self.threads = threads
        self.chunk_size = chunk_size
        self.retries = retries
        self.retry_wait = retry_wait
        self._items: list[tuple[str, str, str]] = []
        self.progress: dict[str, Progress] = {}

    def add(self, id: str, url: str, output: str) -> "Downloader":
        self._items.append((id, url, output))
        self.progress[id] = Progress()
        return self

    def run(self):
        # one shared permit pool across ALL resources: total in-flight chunk
        # fetches never exceed `threads` (Downloader.java uses one bounded
        # executor; without this, connections = resources x threads)
        limiter = threading.Semaphore(self.threads)
        with ThreadPoolExecutor(max_workers=max(len(self._items), 1)) as pool:
            futs = [pool.submit(download, url, out, self.threads,
                                self.chunk_size, self.retries,
                                self.retry_wait, 30.0, self.progress[i],
                                limiter)
                    for i, url, out in self._items]
            for f in futs:
                f.result()


# --- Geofabrik catalog (util/Geofabrik.java) ---------------------------------

GEOFABRIK_INDEX_URL = "https://download.geofabrik.de/index-v1-nogeom.json"
_TOKEN_SPLIT = re.compile(r"[^a-z]+")


def _tokenize(s: str) -> frozenset[str]:
    return frozenset(t for t in _TOKEN_SPLIT.split(s.lower()) if t)


def geofabrik_search(search: str, index) -> str:
    """index-v1-nogeom.json search (searchIndexForDownloadUrl:73-103):
    exact-id match beats exact-name beats approximate-name; >1 match in the
    winning tier is an error. `index` is the parsed JSON dict or text."""
    if isinstance(index, (str, bytes)):
        index = json.loads(index)
    tokens = _tokenize(search)
    ids, exact, approx = [], [], []
    for feature in index.get("features", []):
        p = feature.get("properties", {})
        urls = p.get("urls", {})
        if "pbf" not in urls:
            continue
        # PropertiesJson.ids():119-128 = [id, name, iso3166-1, iso3166-2]
        cand_ids = [p.get("id", ""), p.get("name", "")] \
            + list(p.get("iso3166-1:alpha2") or []) \
            + list(p.get("iso3166-2") or [])
        if any(_tokenize(c) == tokens for c in cand_ids if c):
            ids.append(p)
        elif _tokenize(p.get("name", "")) == tokens:
            exact.append(p)
        elif _tokenize(p.get("name", "")) >= tokens:
            approx.append(p)
    for tier, values in (("exact ID matches", ids),
                         ("exact name matches", exact),
                         ("approximate name matches", approx)):
        if len(values) > 1:
            raise ValueError(f"Multiple {tier} for '{search}': "
                             + ", ".join(v["id"] for v in values))
        if values:
            return values[0]["urls"]["pbf"]
    raise ValueError(f"No matches for '{search}'")


def geofabrik_download_url(search: str, index_url: str = GEOFABRIK_INDEX_URL,
                           timeout: float = 30.0) -> str:
    """Resolve a `--download` area name to its .osm.pbf URL
    (Geofabrik.getDownloadUrl:46)."""
    with open_stream(index_url, timeout) as f:
        return geofabrik_search(search, f.read().decode())


# --- AWS S3 public OSM buckets (util/AwsOsm.java:25-99) -----------------------

OSM_PDS_URL = "https://osm-pds.s3.amazonaws.com/"
OVERTURE_URL = "https://overturemaps-us-west-2.s3.amazonaws.com/"
MAX_S3_PAGES = 100  # AwsOsm.java:26


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_s3_index(xml_text) -> tuple[list[str], str | None]:
    """One ListObjectsV2 page -> (keys, continuation token or None)
    (AwsOsm.IndexXml/ContentXml, namespace-tolerant)."""
    import xml.etree.ElementTree as ET
    root = ET.fromstring(xml_text)
    keys, token, truncated = [], None, False
    for child in root:
        tag = _strip_ns(child.tag)
        if tag == "Contents":
            for sub in child:
                if _strip_ns(sub.tag) == "Key":
                    keys.append(sub.text or "")
        elif tag == "NextContinuationToken":
            token = child.text
        elif tag == "IsTruncated":
            truncated = (child.text or "").strip().lower() == "true"
    return keys, (token if truncated else None)


def list_s3_bucket(bucket_url: str, timeout: float = 30.0) -> list[str]:
    """Page through ?list-type=2 with continuation tokens
    (AwsOsm.getAndCacheIndex:54-75)."""
    from urllib.parse import quote
    keys: list[str] = []
    next_param = ""
    for page in range(MAX_S3_PAGES + 1):
        if page == MAX_S3_PAGES:
            raise ValueError(f"Too many entries in {bucket_url} to page through")
        with open_stream(f"{bucket_url}?list-type=2{next_param}", timeout) as f:
            page_keys, token = parse_s3_index(f.read())
        keys.extend(page_keys)
        if token is None:
            return keys
        next_param = "&continuation-token=" + quote(token)
    return keys


def aws_osm_search(search: str, keys: list[str],
                   bucket_url: str = OSM_PDS_URL) -> str:
    """'latest' -> lexicographically last .osm.pbf; else the unique
    `/planet-<search>.osm.pbf` (AwsOsm.searchIndexForDownloadUrl:80-99)."""
    if search.lower() == "latest":
        cands = sorted(bucket_url + k for k in keys if k.endswith(".osm.pbf"))
        if not cands:
            raise ValueError("Unable to find latest AWS osm download URL")
        return cands[-1]
    results = [bucket_url + k for k in keys
               if k.endswith(f"/planet-{search}.osm.pbf")]
    if not results:
        raise ValueError(f"Unable to find AWS osm download URL for {search}")
    if len(results) > 1:
        raise ValueError(
            f"Found multiple AWS osm download URLs for {search}: {results}")
    return results[0]


def aws_osm_download_url(search: str, bucket_url: str = OSM_PDS_URL,
                         timeout: float = 30.0) -> str:
    """AwsOsm.getDownloadUrl:49 — resolve `--download planet:latest` etc."""
    return aws_osm_search(search, list_s3_bucket(bucket_url, timeout),
                          bucket_url)
