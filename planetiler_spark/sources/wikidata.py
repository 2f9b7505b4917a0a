"""Wikidata name-translation fetcher — util/Wikidata.java:61-475 re-expressed
Spark-first.

The reference streams the OSM input, collects every feature's `wikidata=Q…`
tag, POSTs batches of qids to the Wikidata SPARQL endpoint, and appends
ndjson lines `[qid, {lang: label}, updated_ms]` to a translations file that
profiles later join against. Here:

  - qid EXTRACTION is distributed: one column-pruned Spark pass over the
    OSM element tags (the 100 TB-shaped part — the qid set is tiny relative
    to the input, so the distinct collect is bounded);
  - the SPARQL client builds the reference's exact query text
    (Wikidata.java:335-340: `VALUES ?id { wd:Q… } ?id (owl:sameAs* /
    rdfs:label) ?label`), POSTs with the same content-type/accept headers,
    retries, and parses the standard sparql-results+json bindings;
  - the translations FILE FORMAT is the reference's ndjson (load:212-247
  semantics incl. max-age expiry and the update-limit cap), and
  `translations_df` exposes it as a (qid, lang, name) DataFrame for
  broadcast enrichment joins.

No network in this sandbox: tests run the client against an in-process
HTTP SPARQL stub (tests/test_download.py).
"""

from __future__ import annotations

import json
import re
import time
import urllib.request

SPARQL_ENDPOINT = "https://query.wikidata.org/bigdata/namespace/wdq/sparql"
_QID = re.compile(r"Q(\d+)")
_IRI = re.compile(r"http://www.wikidata.org/entity/Q(\d+)")


def parse_qid(value) -> int:
    """`wikidata=Q123` tag value -> 123, or 0 if invalid
    (Wikidata.parseQid:259-268)."""
    if value is None:
        return 0
    m = _QID.search(str(value))
    return int(m.group(1)) if m else 0


def qid_from_iri(iri: str) -> int:
    """`http://www.wikidata.org/entity/Q123` -> 123
    (extractIdFromWikidataIRI:248-256)."""
    m = _IRI.match(iri)
    if not m:
        raise ValueError(f"unexpected wikidata IRI: {iri}")
    return int(m.group(1))


def build_query(qids) -> str:
    """The reference's exact SPARQL text (Wikidata.java:335-340), whitespace
    collapsed the same way."""
    qid_list = " ".join(f"wd:Q{int(q)}" for q in qids)
    query = f"""
      SELECT ?id ?label where {{
        VALUES ?id {{ {qid_list} }} ?id (owl:sameAs* / rdfs:label) ?label
      }}
      """
    return re.sub(r"\s+", " ", query).strip()


def parse_results(payload) -> dict[int, dict[str, str]]:
    """sparql-results+json -> {qid: {lang: label}} (parseResults:91-108)."""
    if isinstance(payload, (bytes, str)):
        payload = json.loads(payload)
    out: dict[int, dict[str, str]] = {}
    for row in payload["results"]["bindings"]:
        qid = qid_from_iri(row["id"]["value"])
        label = row["label"]
        out.setdefault(qid, {})[label["xml:lang"]] = label["value"]
    return out


def query_wikidata(qids, endpoint: str = SPARQL_ENDPOINT, retries: int = 2,
                   retry_wait: float = 1.0, timeout: float = 30.0
                   ) -> dict[int, dict[str, str]]:
    """POST one batch of qids (queryWikidata:330-366)."""
    qids = list(qids)
    if not qids:
        return {}
    req = urllib.request.Request(
        endpoint, data=build_query(qids).encode(),
        headers={"User-Agent": "planetiler_spark-wikidata",
                 "Accept": "application/sparql-results+json",
                 "Content-Type": "application/sparql-query"},
        method="POST")
    for attempt in range(retries + 1):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return parse_results(resp.read())
        except OSError:
            if attempt == retries:
                raise
            time.sleep(retry_wait)


# --- translations file (ndjson lines [qid, {lang: label}, updated_ms]) -------

def append_translations(path: str, results: dict[int, dict[str, str]],
                        now_ms: int | None = None):
    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    with open(path, "a") as f:
        for qid in sorted(results):
            f.write(json.dumps([qid, results[qid], now_ms],
                               separators=(",", ":")) + "\n")


def load_translations(path_or_lines, max_age_ms: int = 0,
                      update_limit: int = 0, now_ms: int | None = None
                      ) -> dict[int, dict[str, str]]:
    """Wikidata.load:212-247: entries older than max_age are DROPPED (so
    they get re-fetched), but at most `update_limit` of them (0 = no cap on
    drops when max_age set; matches updateLimit<=0)."""
    if isinstance(path_or_lines, str):
        try:
            with open(path_or_lines) as f:
                lines = f.readlines()
        except FileNotFoundError:
            return {}
    else:
        lines = list(path_or_lines)
    now_ms = int(time.time() * 1000) if now_ms is None else now_ms
    limit_ms = (now_ms - max_age_ms) if max_age_ms > 0 else None
    out: dict[int, dict[str, str]] = {}
    dropped = 0
    for line in lines:
        line = line.strip()
        if not line:
            continue
        node = json.loads(line)
        qid = int(node[0])
        updated = int(node[2]) if len(node) > 2 else 0
        if (limit_ms is not None and updated < limit_ms
                and (update_limit <= 0 or dropped < update_limit)):
            dropped += 1
            continue
        out.setdefault(qid, {}).update(node[1])
    return out


# --- Spark surfaces -----------------------------------------------------------

def extract_qids(elements_df, tags_col: str = "tags"):
    """Distributed qid extraction from OSM element tags: one column-pruned
    pass, Catalyst-native regexp, distinct — the filter(:272-297) stage as a
    DataFrame plan instead of a driver stream."""
    from pyspark.sql import functions as F
    return (elements_df
            .select(F.regexp_extract(F.col(tags_col).getItem("wikidata"),
                                     r"Q(\d+)", 1).alias("q"))
            .filter(F.col("q") != "")
            .select(F.col("q").cast("long").alias("qid"))
            .filter(F.col("qid") > 0)
            .distinct())


def fetch(elements_df, outfile: str, endpoint: str = SPARQL_ENDPOINT,
          batch_size: int = 5000, max_age_ms: int = 0,
          update_limit: int = 0, tags_col: str = "tags") -> int:
    """The full fetch flow (Wikidata.fetch:116-178): load existing
    translations, extract qids distributively, fetch only the missing ones
    in batches, append to `outfile`. Returns the number of qids fetched."""
    existing = load_translations(outfile, max_age_ms, update_limit)
    qids = [r.qid for r in extract_qids(elements_df, tags_col).collect()
            if r.qid not in existing]
    fetched = 0
    for i in range(0, len(qids), batch_size):
        batch = qids[i:i + batch_size]
        append_translations(outfile, query_wikidata(batch, endpoint))
        fetched += len(batch)
    return fetched


def translations_df(spark, path: str):
    """Translations file -> (qid, lang, name) DataFrame, the broadcast side
    of the name-enrichment join (WikidataTranslations.TranslationProvider)."""
    data = load_translations(path)
    rows = [(qid, lang, name)
            for qid, langs in data.items()
            for lang, name in sorted(langs.items())]
    return spark.createDataFrame(rows, "qid long, lang string, name string")
