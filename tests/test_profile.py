"""YAML query-language tests — the custommap ConfiguredProfile analog
(model: MultiExpressionTest.java 758 LoC, validator SchemaSpecification)."""

import pytest

from pyspark.sql import functions as F

from planetiler_spark.plans import profile as pr

SCHEMA_YAML = """
layers:
- id: water
  features:
  - geometry: polygon
    min_zoom: 4
    include_when:
      __all__:              # mapping entries OR by default (reference parity)
        natural: water
        class: [lake, river]
    exclude_when:
      intermittent: "yes"   # quoted: bare `yes` is YAML boolean true
    attributes:
    - key: class
      tag_value: class
    - key: kind
      value: water
- id: poi
  features:
  - geometry: point
    min_zoom: 10
    include_when:
      __any__:
      - amenity: __any__     # key present with any value (null/__any__);
                             # an explicit "" would mean match-when-MISSING
      - name: "%cafe%"
    attributes:
    - key: name
      tag_value: name
      min_zoom: 12
"""


@pytest.fixture(scope="module")
def rules():
    return pr.parse_profile(SCHEMA_YAML)


@pytest.fixture(scope="module")
def features(spark):
    rows = [
        (1, {"natural": "water", "class": "lake"}),
        (2, {"natural": "water", "class": "river", "intermittent": "yes"}),
        (3, {"natural": "water", "class": "pond"}),
        (4, {"amenity": "bench"}),
        (5, {"name": "corner cafe west"}),
        (6, {"name": "bookshop"}),
        (7, {"natural": "water", "class": "lake", "amenity": "fountain"}),
    ]
    return spark.createDataFrame(rows, "id long, tags map<string,string>")


def test_parse(rules):
    assert [r.layer for r in rules] == ["water", "poi"]
    assert rules[0].min_zoom == 4
    assert rules[0].attributes[1].value == "water"


def test_rule_matching(spark, features, rules):
    out = pr.apply_profile(features, rules).select("id", "layer").collect()
    got = sorted((r.id, r.layer) for r in out)
    # 1: water(lake) yes; 2: excluded (intermittent); 3: pond not in list;
    # 4: amenity present -> poi; 5: %cafe% -> poi; 6: no; 7: both layers
    assert got == [(1, "water"), (4, "poi"), (5, "poi"), (7, "poi"), (7, "water")]


def test_attrs_copied_and_constant(spark, features, rules):
    out = {r.id: r.attrs for r in
           pr.apply_profile(features, rules).filter("layer = 'water'").collect()}
    assert out[1] == {"class": "lake", "kind": "water"}
    assert out[7]["kind"] == "water"


def test_zoom_gated_attrs(spark, features, rules):
    matched = pr.apply_profile(features, rules).filter("layer = 'poi'")
    exploded = matched.select(
        "id", "attrs", F.explode(F.sequence("min_zoom", "max_zoom")).alias("zoom"))
    resolved = pr.resolve_attrs_at_zoom(exploded, rules)
    rows = resolved.filter("id = 5").collect()
    by_zoom = {r.zoom: r.attrs for r in rows}
    assert "name" not in by_zoom[10]   # gated below min_zoom 12
    assert by_zoom[12].get("name") == "corner cafe west"


def test_sql_generator_equivalence(spark, features, rules):
    """cond_to_sql over flat columns == cond_to_column over the map."""
    import duckdb
    flat = features.select(
        "id",
        F.col("tags").getItem("natural").alias("natural"),
        F.col("tags").getItem("class").alias("class"),
        F.col("tags").getItem("intermittent").alias("intermittent"),
        F.col("tags").getItem("amenity").alias("amenity"),
        F.col("tags").getItem("name").alias("name"),
    ).toPandas()
    con = duckdb.connect()
    con.register("flat", flat)
    colmap = {c: f'"{c}"' for c in ["natural", "class", "intermittent", "amenity", "name"]}
    for rule in rules:
        sql = pr.cond_to_sql(rule.include_when, colmap)
        if rule.exclude_when:
            sql = f"({sql}) AND NOT {pr.cond_to_sql(rule.exclude_when, colmap)}"
        duck_ids = {r[0] for r in con.execute(
            f"SELECT id FROM flat WHERE {sql}").fetchall()}
        spark_ids = {r.id for r in features.filter(
            pr.rule_match_column(rule, F.col("tags"))).collect()}
        assert duck_ids == spark_ids, rule.layer


def test_split_line_dispatch(spark):
    """`geometry: split_line` end-to-end (FeatureGeometry.java:36-37 ->
    FeatureCollector.splitLine:142-159, OsmWaySplitter.getSplitIndices:40-52,
    OsmReader.asSplitLine:866-879): ways matched by the rule split at
    intersection nodes, junction duplicated, segment ids renumbered by the
    power-of-10 multiplier; non-matching ways are not split."""
    from planetiler_spark.plans import profile as pr

    schema = pr.parse_schema("""
layers:
- id: roads
  features:
  - geometry: split_line
    include_when: {highway: residential}
""")
    assert any(r.geometry == "split_line" for r in schema.rules)
    ways = spark.createDataFrame([
        (1, {"highway": "residential"}, [10, 11, 12, 13, 14]),
        (2, {"highway": "residential"}, [20, 12, 21]),
        (3, {"highway": "service"}, [10, 11, 12]),   # not matched: no split
        (4, {"highway": "residential"}, [40, 41]),
    ], "id long, tags map<string,string>, refs array<long>")
    out = pr.split_line_ways(ways, schema.rules)
    rows = {(r.way_id, r.seg): (r.split_id, r.refs) for r in out.collect()}
    # way 1 splits at node 12 (shared with way 2); way 3 excluded so node 11
    # is NOT an intersection; multiplier = 10 (max matched way id 4)
    assert rows == {
        (1, 0): (1, [10, 11, 12]),
        (1, 1): (11, [12, 13, 14]),
        (2, 0): (2, [20, 12]),
        (2, 1): (12, [12, 21]),
        (4, 0): (4, [40, 41]),
    }
    assert all(r.layer == "roads" for r in out.collect())
