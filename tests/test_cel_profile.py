"""CEL-subset scripts, tag_mappings typed getters, and FeatureGeometry
dispatch (the round-2 custommap-parity surface: ConfigExpressionScript.java:23,
TagValueProducer.java:24-48, FeatureGeometry.java:11-38)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from planetiler_spark.kernels import geom as gk
from planetiler_spark.plans import cel
from planetiler_spark.plans import profile as pr


# --- cel parser / emitter ----------------------------------------------------

def test_is_script():
    assert cel.is_script("${ feature.tags.x }")
    assert cel.is_script("  ${ 1 + 2 }  ")
    assert not cel.is_script("plain")
    assert cel.is_escaped_script("\\${ not evaluated }")
    assert cel.unescape("\\${ x }") == "${ x }"


def test_cel_rejects_unknown():
    with pytest.raises(cel.CelError):
        cel.compile_script("${ system('rm') }").sql(cel.Env(lambda k: (k, "str")))
    with pytest.raises(cel.CelError):
        cel.compile_script("${ feature.id }")
    with pytest.raises(cel.CelError):
        # unknown identifiers resolve at sql() time (still driver-side,
        # before any plan executes) — match_key/match_value are env vars now
        cel.compile_script("${ unknown_var }").sql(
            cel.Env(lambda k: (k, "str")))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, {"lang": "en", "nc": "450", "name": "Alpha"}),
        (2, {"lang": "fr", "nc": "120", "name": "Beta"}),
        (3, {"lang": "de", "nc": "oops"}),
        (4, {"nc": "300"}),
    ]
    return spark.createDataFrame(rows, "id int, tags map<string,string>")


def _eval(spark, docs, script, mappings=None):
    ref = pr.spark_tag_ref(mappings or {}, "tags")
    col = F.expr(cel.script_sql(script, ref, "spark"))
    return {r.id: r.v for r in docs.select("id", col.alias("v")).collect()}


def test_cel_spark_eval(spark, docs):
    got = _eval(spark, docs, "${ coalesce(feature.tags.lang, 'unknown') }")
    assert got == {1: "en", 2: "fr", 3: "de", 4: "unknown"}
    got = _eval(spark, docs, "${ feature.tags.lang == 'en' ? 'E' : 'O' }")
    assert got == {1: "E", 2: "O", 3: "O", 4: "O"}
    got = _eval(spark, docs, "${ long(feature.tags.nc) >= 300 }")
    assert got == {1: True, 2: False, 3: False, 4: True}
    got = _eval(spark, docs, "${ 'p-' + feature.tags.lang }")
    assert got[1] == "p-en" and got[4] is None  # null propagates through ||
    got = _eval(spark, docs, "${ has(feature.tags.name) && matches(feature.tags.name, '^A') }")
    assert got == {1: True, 2: False, 3: False, 4: False}


def test_cel_duckdb_equivalence(spark, docs):
    """Same script, both dialects, same results — the oracle contract."""
    import duckdb
    flat = docs.select(
        "id", F.col("tags").getItem("lang").alias("lang"),
        F.col("tags").getItem("nc").alias("nc"),
        F.col("tags").getItem("name").alias("name")).toPandas()
    con = duckdb.connect()
    con.register("flat", flat)
    colmap = {"lang": "lang", "nc": "nc", "name": "name"}
    for script in (
        "${ coalesce(feature.tags.lang, 'unknown') }",
        "${ feature.tags.lang == 'en' ? 'E' : 'O' }",
        "${ replace(coalesce(feature.tags.name, ''), '[aeiou]', '_') }",
        "${ min(long(feature.tags.nc), 200) }",
        "${ nullif(feature.tags.lang, 'de') }",
    ):
        spark_vals = _eval(spark, docs, script)
        dsql = cel.script_sql(script, pr.duckdb_tag_ref({}, colmap), "duckdb")
        duck_vals = dict(con.execute(f"SELECT id, {dsql} FROM flat").fetchall())
        assert spark_vals == duck_vals, script


# --- tag_mappings ------------------------------------------------------------

def test_tag_mappings_parse():
    schema = pr.parse_schema("""
tag_mappings:
  layer: long
  bridge: boolean
  chars: {input: nc, type: long}
layers:
- id: x
  features:
  - include_when: {layer: 1}
""")
    assert schema.tag_mappings == {
        "layer": ("layer", "long"), "bridge": ("bridge", "boolean"),
        "chars": ("nc", "long")}


def test_typed_matching(spark):
    rows = [(1, {"layer": "1"}), (2, {"layer": "01 "}), (3, {"layer": "2"}),
            (4, {"bridge": "yes"}), (5, {"bridge": "no"}), (6, {"bridge": "0"})]
    df = spark.createDataFrame(rows, "id int, tags map<string,string>")
    mappings = {"layer": ("layer", "long"), "bridge": ("bridge", "boolean")}
    got = {r.id for r in df.filter(
        pr._leaf_column(F.col("tags"), "layer", 1, mappings)).collect()}
    assert got == {1, 2}  # '01 ' parses to long 1 (forgiving leading-int)
    got = {r.id for r in df.filter(
        pr._leaf_column(F.col("tags"), "bridge", True, mappings)).collect()}
    assert got == {4}  # Parse.bool: only no/false/0 are false; missing = null


def test_mapped_key_missing_and_any_read_input_tag(spark):
    """ADVICE r4: `key: ""` (match-when-missing) and `key: __any__` must read
    the tag_mappings INPUT tag (TagValueProducer.java:34-41), not the output
    key — in BOTH dialects."""
    import duckdb
    rows = [(1, {"nc": "5"}), (2, {"chars": "5"}), (3, {"nc": ""}), (4, {})]
    df = spark.createDataFrame(rows, "id int, tags map<string,string>")
    mappings = {"chars": ("nc", "long")}
    # match-when-missing: rows whose INPUT tag `nc` is missing or EMPTY =
    # {2, 3, 4} (row 3 carries nc="")
    got = {r.id for r in df.filter(
        pr._leaf_column(F.col("tags"), "chars", "", mappings)).collect()}
    assert got == {2, 3, 4}
    # presence: rows that HAVE the input tag = {1, 3}
    got = {r.id for r in df.filter(
        pr._leaf_column(F.col("tags"), "chars", "__any__", mappings)).collect()}
    assert got == {1, 3}
    # DuckDB side agrees (colmap keyed by input tag name)
    con = duckdb.connect()
    flat = df.select("id", F.col("tags").getItem("nc").alias("nc"),
                     F.col("tags").getItem("chars").alias("chars")).toPandas()
    con.register("flat", flat)
    colmap = {"nc": "nc", "chars": "chars"}
    sql = pr._leaf_sql(colmap, "chars", "", mappings)
    assert {r[0] for r in con.execute(
        f"SELECT id FROM flat WHERE {sql}").fetchall()} == {2, 3, 4}
    sql = pr._leaf_sql(colmap, "chars", "__any__", mappings)
    assert {r[0] for r in con.execute(
        f"SELECT id FROM flat WHERE {sql}").fetchall()} == {1, 3}


def test_wildcard_empty_value_cross_engine(spark):
    """ADVICE r4: a `%`-wildcard whose regex legitimately matches the empty
    string must agree cross-engine (rlike vs regexp_matches, not
    regexp_extract(...) <> '')."""
    import duckdb
    rows = [(1, {"ref": ""}), (2, {"ref": "A1"}), (3, {})]
    df = spark.createDataFrame(rows, "id int, tags map<string,string>")
    got = {r.id for r in df.filter(
        pr._leaf_column(F.col("tags"), "ref", "%")).collect()}
    con = duckdb.connect()
    flat = df.select("id", F.col("tags").getItem("ref").alias("ref")).toPandas()
    con.register("flat", flat)
    sql = pr._leaf_sql({"ref": "ref"}, "ref", "%")
    duck = {r[0] for r in con.execute(
        f"SELECT id FROM flat WHERE {sql}").fetchall()}
    assert got == duck == {1, 2}


def test_attr_typed_copy(spark):
    df = spark.createDataFrame([(1, {"h": "12m"})], "id int, tags map<string,string>")
    schema = pr.parse_schema("""
tag_mappings:
  height: {input: h, type: long}
layers:
- id: x
  features:
  - include_when: {h: __any__}
    attributes:
    - key: height
      tag_value: height
""")
    out = pr.apply_schema(df, schema).collect()
    assert out[0].attrs["height"] == "12"


# --- geometry dispatch -------------------------------------------------------

def test_point_on_surface_with_hole():
    shell = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    hole = np.array([[3, 3], [7, 3], [7, 7], [3, 7], [3, 3]], dtype=float)
    px, py = gk.point_on_surface([shell, hole])
    assert py == 5.0
    # the bisector intervals are [0,3] and [7,10]; midpoint of a widest one
    assert px in (1.5, 8.5)
    inside = gk.points_in_polygon(np.array([px]), np.array([py]), [shell, hole])
    assert inside[0]


def test_geometry_dispatch(spark):
    shell = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    concave = np.array([[0, 0], [4, 0], [4, 4], [2, 1], [0, 4], [0, 0]], dtype=float)
    line = np.array([[0, 0], [10, 0]], dtype=float)
    rows = [
        (1, {"k": "sq"}, gk.wkb_polygon([shell]), "polygon"),
        (2, {"k": "cv"}, gk.wkb_polygon([concave]), "polygon"),
        (3, {"k": "ln"}, gk.wkb_linestring(line), "linestring"),
    ]
    df = spark.createDataFrame(
        rows, "id long, tags map<string,string>, geom_wkb binary, geom_type string")
    rules = pr.parse_profile("""
layers:
- id: centroids
  features:
  - geometry: polygon_centroid
    include_when: {k: sq}
- id: convex_only
  features:
  - geometry: polygon_centroid_if_convex
    include_when: {k: [sq, cv]}
- id: midpoints
  features:
  - geometry: line_midpoint
    include_when: {k: ln}
- id: wrong_type
  features:
  - geometry: polygon_centroid
    include_when: {k: ln}        # line feature -> filtered by geometry test
""")
    out = {(r.layer, r.id): (r.px, r.py, r.emitted)
           for r in pr.transform_geometry(df, rules).collect()}
    assert out[("centroids", 1)] == (2.0, 2.0, True)
    assert out[("midpoints", 3)] == (5.0, 0.0, True)
    # convex square -> centroid; concave -> point_on_surface fallback
    assert out[("convex_only", 1)] == (2.0, 2.0, True)
    cx, cy, ok = out[("convex_only", 2)]
    assert ok and gk.points_in_polygon(np.array([cx]), np.array([cy]), [concave])[0]
    assert ("wrong_type", 3) not in out  # geometry test rejected the line


def test_unsupported_geometry_raises():
    # split_line is supported since round 3 (split_line_ways); a made-up
    # transform must still be rejected at schema-compile time
    with pytest.raises(ValueError, match="bogus_transform"):
        pr.parse_schema("""
layers:
- id: x
  features:
  - geometry: bogus_transform
    include_when: {k: v}
""")
    schema = pr.parse_schema("""
layers:
- id: x
  features:
  - geometry: split_line
    include_when: {k: v}
""")
    assert schema.rules[0].geometry == "split_line"


def test_point_on_line_interior_vertex(spark):
    """point_on_line == JTS InteriorPointLine: the interior vertex nearest
    the (length-weighted) centroid, not the midpoint."""
    import numpy as np
    from planetiler_spark.kernels import geom as gk

    line = np.array([[0.0, 0.0], [1.0, 0.0], [9.0, 0.0], [10.0, 0.0]])
    rules = pr.parse_schema("""
layers:
- id: pol
  features:
  - geometry: point_on_line
    include_when: {k: v}
""").rules
    df = spark.createDataFrame(
        [(1, {"k": "v"}, bytes(gk.wkb_linestring(line)), "linestring")],
        "id long, tags map<string,string>, geom_wkb binary, geom_type string")
    out = pr.transform_geometry(df, rules).collect()
    assert len(out) == 1
    # centroid_x = (1*0.5 + 8*5 + 1*9.5)/10 = 5.0 -> nearest interior vertex
    # among x=1 and x=9 is tied at distance 4 -> JTS keeps the FIRST
    assert (out[0].px, out[0].py) == (1.0, 0.0)
