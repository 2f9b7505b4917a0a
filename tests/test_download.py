"""Download / Geofabrik / Wikidata clients (sources/download.py,
sources/wikidata.py) driven against in-process HTTP servers — the sandbox
has no network, so the wire protocols are verified locally end-to-end.
Reference: util/Downloader.java, util/Geofabrik.java, util/Wikidata.java."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from planetiler_spark.sources import download as dl
from planetiler_spark.sources import wikidata as wd

PAYLOAD = bytes(range(256)) * 1000  # 256 KB, recognizable at any offset


class _FileServer(BaseHTTPRequestHandler):
    """Static payload with HEAD + Range support, an optional redirect hop,
    and a configurable number of mid-stream failures per range."""
    fail_first = 0
    fails = {}
    requests: list = []

    def _common(self):
        type(self).requests.append((self.command, self.path,
                                    self.headers.get("Range")))

    def do_HEAD(self):
        self._common()
        if self.path == "/redirect":
            self.send_response(302)
            self.send_header("Location", "/file")
            self.end_headers()
            return
        if self.path == "/loop":
            self.send_response(302)
            self.send_header("Location", "/loop")
            self.end_headers()
            return
        if self.path == "/empty":
            # no Content-Length: unknown size, 0-byte body
            self.send_response(200)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(PAYLOAD)))
        if self.path != "/noranges":
            self.send_header("Accept-Ranges", "bytes")
        self.end_headers()

    def do_GET(self):
        self._common()
        rng = self.headers.get("Range")
        if self.path == "/empty":
            self.send_response(200)
            self.end_headers()
            return
        if self.path == "/liar" and rng:
            # advertises Accept-Ranges but ignores Range: 200 + full body
            self.send_response(200)
            self.send_header("Content-Length", str(len(PAYLOAD)))
            self.end_headers()
            self.wfile.write(PAYLOAD)
            return
        body = PAYLOAD
        status = 200
        if rng:
            start, end = rng.split("=")[1].split("-")
            start, end = int(start), int(end) + 1
            key = (start, end)
            n = type(self).fails.get(key, 0)
            if n < type(self).fail_first:
                type(self).fails[key] = n + 1
                # fail mid-stream: send half the range then hang up
                body = PAYLOAD[start:end]
                self.send_response(206)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body[: len(body) // 2])
                self.wfile.flush()
                self.connection.close()
                return
            body = PAYLOAD[start:end]
            status = 206
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def server():
    _FileServer.requests = []
    _FileServer.fails = {}
    _FileServer.fail_first = 0
    srv = HTTPServer(("127.0.0.1", 0), _FileServer)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_head_follows_redirects_and_reads_metadata(server):
    meta = dl.head(f"{server}/redirect")
    assert meta.size == len(PAYLOAD)
    assert meta.accept_range
    with pytest.raises(IOError, match="redirects"):
        dl.head(f"{server}/loop")


def test_chunked_ranged_download(server, tmp_path):
    out = tmp_path / "d" / "file.bin"
    n = dl.download(f"{server}/file", str(out), threads=4,
                    chunk_size=50_000)
    assert out.read_bytes() == PAYLOAD
    assert n == len(PAYLOAD)
    # it really went through ranged GETs: ceil(256000/50000) = 6 ranges
    gets = [r for r in _FileServer.requests if r[0] == "GET"]
    assert len(gets) == 6 and all(r[2] for r in gets)
    # up-to-date skip: same size -> no GET at all
    before = len(_FileServer.requests)
    assert dl.download(f"{server}/file", str(out)) == 0
    assert all(r[0] == "HEAD" for r in _FileServer.requests[before:])


def test_download_without_range_support(server, tmp_path):
    out = tmp_path / "file.bin"
    dl.download(f"{server}/noranges", str(out), threads=4, chunk_size=50_000)
    assert out.read_bytes() == PAYLOAD
    gets = [r for r in _FileServer.requests if r[0] == "GET"]
    assert len(gets) == 1 and gets[0][2] is None  # single full-body GET


def test_empty_body_unknown_size_publishes_zero_bytes(server, tmp_path):
    # ADVICE r4: truncate(size or 1) published a 1-byte NUL file for a 0-byte
    # body with no Content-Length
    out = tmp_path / "empty.bin"
    n = dl.download(f"{server}/empty", str(out), threads=4)
    assert out.read_bytes() == b"" and n == 0


def test_range_liar_falls_back_to_single_stream(server, tmp_path):
    # ADVICE r4: a server that advertises Accept-Ranges but answers 200 must
    # not have every chunk scribble the full body at its own offset
    out = tmp_path / "liar.bin"
    n = dl.download(f"{server}/liar", str(out), threads=4, chunk_size=50_000)
    assert out.read_bytes() == PAYLOAD
    assert n == len(PAYLOAD)  # progress rewound before the fallback stream
    gets = [r for r in _FileServer.requests if r[0] == "GET"]
    assert gets[-1][2] is None  # final fetch was a plain un-ranged GET


def test_chunk_retry_rewinds_progress(server, tmp_path):
    _FileServer.fail_first = 1  # every range fails once mid-stream
    out = tmp_path / "file.bin"
    prog = dl.Progress()
    dl.download(f"{server}/file", str(out), threads=2, chunk_size=100_000,
                retries=2, retry_wait=0.01, progress=prog)
    assert out.read_bytes() == PAYLOAD
    assert prog.bytes == len(PAYLOAD)  # rewound partial counts exactly


def test_downloader_multi_resource(server, tmp_path):
    d = (dl.Downloader(threads=2, chunk_size=100_000)
         .add("a", f"{server}/file", str(tmp_path / "a.bin"))
         .add("b", f"{server}/file", str(tmp_path / "b.bin")))
    d.run()
    assert (tmp_path / "a.bin").read_bytes() == PAYLOAD
    assert d.progress["a"].bytes == len(PAYLOAD)
    assert d.progress["b"].bytes == len(PAYLOAD)


GEOFABRIK_INDEX = {
    "features": [
        {"properties": {"id": "monaco", "name": "Monaco",
                        "urls": {"pbf": "https://x/monaco.osm.pbf"}}},
        {"properties": {"id": "massachusetts", "name": "us/massachusetts",
                        "iso3166-2": ["US-MA"],
                        "urls": {"pbf": "https://x/ma.osm.pbf"}}},
        {"properties": {"id": "georgia-us", "name": "Georgia (US State)",
                        "urls": {"pbf": "https://x/georgia-us.osm.pbf"}}},
        {"properties": {"id": "georgia", "name": "Georgia",
                        "urls": {"pbf": "https://x/georgia.osm.pbf"}}},
        {"properties": {"id": "noformat", "name": "No PBF Here",
                        "urls": {"shp": "https://x/no.shp.zip"}}},
    ]
}


def test_geofabrik_search_tiers():
    # exact id
    assert dl.geofabrik_search("monaco", GEOFABRIK_INDEX).endswith("monaco.osm.pbf")
    # iso code counts as an id
    assert dl.geofabrik_search("us-ma", GEOFABRIK_INDEX).endswith("ma.osm.pbf")
    # id tier beats name tier: "georgia" matches id=georgia exactly even
    # though "Georgia (US State)" approx-contains it
    assert dl.geofabrik_search("georgia", GEOFABRIK_INDEX).endswith("/georgia.osm.pbf")
    # approximate-name multi-match is only an error when it's the deciding tier
    assert dl.geofabrik_search("georgia us state",
                               GEOFABRIK_INDEX).endswith("georgia-us.osm.pbf")
    # entries without a pbf url are invisible
    with pytest.raises(ValueError, match="No matches"):
        dl.geofabrik_search("no pbf here maybe", GEOFABRIK_INDEX)
    with pytest.raises(ValueError, match="No matches"):
        dl.geofabrik_search("atlantis", GEOFABRIK_INDEX)


# --- wikidata ------------------------------------------------------------------

SPARQL_RESPONSE = {
    "results": {"bindings": [
        {"id": {"value": "http://www.wikidata.org/entity/Q1"},
         "label": {"xml:lang": "en", "value": "one"}},
        {"id": {"value": "http://www.wikidata.org/entity/Q1"},
         "label": {"xml:lang": "de", "value": "eins"}},
        {"id": {"value": "http://www.wikidata.org/entity/Q2"},
         "label": {"xml:lang": "en", "value": "two"}},
    ]}
}


class _Sparql(BaseHTTPRequestHandler):
    queries: list = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        type(self).queries.append((self.headers.get("Content-Type"),
                                   self.headers.get("Accept"), body))
        out = json.dumps(SPARQL_RESPONSE).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):
        pass


def test_wikidata_query_roundtrip():
    srv = HTTPServer(("127.0.0.1", 0), _Sparql)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        got = wd.query_wikidata([1, 2],
                                endpoint=f"http://127.0.0.1:{srv.server_port}")
        assert got == {1: {"en": "one", "de": "eins"}, 2: {"en": "two"}}
        ct, accept, body = _Sparql.queries[-1]
        assert ct == "application/sparql-query"
        assert accept == "application/sparql-results+json"
        # the reference's exact query text (Wikidata.java:335-340)
        assert body == ("SELECT ?id ?label where { VALUES ?id "
                        "{ wd:Q1 wd:Q2 } ?id (owl:sameAs* / rdfs:label) "
                        "?label }")
    finally:
        srv.shutdown()


def test_qid_parsing():
    assert wd.parse_qid("Q123") == 123
    assert wd.parse_qid("  Q77;Q88") == 77
    assert wd.parse_qid("nope") == 0
    assert wd.qid_from_iri("http://www.wikidata.org/entity/Q9141") == 9141


def test_translations_file_roundtrip_and_expiry(tmp_path):
    p = str(tmp_path / "wikidata.json")
    wd.append_translations(p, {5: {"en": "five"}}, now_ms=1000)
    wd.append_translations(p, {6: {"en": "six"}}, now_ms=9000)
    all_ = wd.load_translations(p)
    assert all_ == {5: {"en": "five"}, 6: {"en": "six"}}
    # max-age drop: entries older than (now - max_age) are re-fetch candidates
    fresh = wd.load_translations(p, max_age_ms=5000, now_ms=10_000)
    assert fresh == {6: {"en": "six"}}
    # update_limit caps how many old entries are dropped per load
    capped = wd.load_translations(p, max_age_ms=1, update_limit=0,
                                  now_ms=10_000_000)
    assert capped == {}


def test_spark_fetch_flow(tmp_path, spark):
    srv = HTTPServer(("127.0.0.1", 0), _Sparql)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame(
            [(1, {"wikidata": "Q1", "name": "x"}),
             (2, {"wikidata": "Q2"}),
             (3, {"wikidata": "bogus"}),
             (4, {"name": "no qid"}),
             (5, {"wikidata": "Q1"})],  # duplicate qid
            "id long, tags map<string,string>")
        out = str(tmp_path / "wikidata.json")
        n = wd.fetch(df, out, endpoint=f"http://127.0.0.1:{srv.server_port}")
        assert n == 2  # Q1, Q2 — deduped, bogus/missing skipped
        tdf = wd.translations_df(spark, out)
        rows = {(r.qid, r.lang): r.name for r in tdf.collect()}
        assert rows == {(1, "en"): "one", (1, "de"): "eins", (2, "en"): "two"}
        # second fetch: everything cached, no new qids
        assert wd.fetch(df, out,
                        endpoint=f"http://127.0.0.1:{srv.server_port}") == 0
    finally:
        srv.shutdown()


def test_download_follows_redirect_to_canonical(server, tmp_path):
    out = tmp_path / "file.bin"
    dl.download(f"{server}/redirect", str(out), threads=2, chunk_size=100_000)
    assert out.read_bytes() == PAYLOAD
    # the ranged GETs hit the canonical /file URL, not /redirect
    gets = [r for r in _FileServer.requests if r[0] == "GET"]
    assert gets and all(p == "/file" for _, p, _ in gets)


# --- AWS S3 bucket index (AwsOsm.java) -----------------------------------------

S3_PAGE1 = """<?xml version="1.0" encoding="UTF-8"?>
<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
  <IsTruncated>true</IsTruncated>
  <NextContinuationToken>tok+1</NextContinuationToken>
  <Contents><Key>2021/planet-210426.osm.pbf</Key></Contents>
  <Contents><Key>2021/planet-210426.osm.pbf.md5</Key></Contents>
</ListBucketResult>"""
S3_PAGE2 = """<?xml version="1.0" encoding="UTF-8"?>
<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">
  <IsTruncated>false</IsTruncated>
  <Contents><Key>2021/planet-210503.osm.pbf</Key></Contents>
</ListBucketResult>"""


class _S3(BaseHTTPRequestHandler):
    def do_GET(self):
        body = (S3_PAGE2 if "continuation-token=tok%2B1" in self.path
                else S3_PAGE1).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_aws_osm_pagination_and_search():
    srv = HTTPServer(("127.0.0.1", 0), _S3)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        bucket = f"http://127.0.0.1:{srv.server_port}/"
        keys = dl.list_s3_bucket(bucket)
        assert keys == ["2021/planet-210426.osm.pbf",
                        "2021/planet-210426.osm.pbf.md5",
                        "2021/planet-210503.osm.pbf"]
        assert dl.aws_osm_search("latest", keys, bucket).endswith(
            "planet-210503.osm.pbf")
        assert dl.aws_osm_search("210426", keys, bucket).endswith(
            "planet-210426.osm.pbf")
        with pytest.raises(ValueError, match="Unable to find"):
            dl.aws_osm_search("999999", keys, bucket)
        assert dl.aws_osm_download_url("latest", bucket).endswith(
            "planet-210503.osm.pbf")
    finally:
        srv.shutdown()
