"""ForwardingProfile handler composition (ForwardingProfile.java:44-173):
layer handlers + filters + post-processors compose into one unioned plan,
with only/exclude layer selection and dependency exemptions."""

import pytest
from pyspark.sql import functions as F

from planetiler_spark.plans import forwarding as fw
from planetiler_spark.plans import profile as pr


@pytest.fixture(scope="module")
def features(spark):
    rows = [
        (1, {"natural": "water", "name": "lake a"}),
        (2, {"highway": "primary", "name": "main st"}),
        (3, {"natural": "water"}),
        (4, {"building": "yes"}),
    ]
    return spark.createDataFrame(rows, "id long, tags map<string,string>")


def _water_handler():
    return fw.LayerHandler(
        name="water",
        matches=lambda tags: F.coalesce(tags.getItem("natural") == "water", F.lit(False)),
        process=lambda df: df.withColumn("kind", F.lit("polygon")),
        post_process=lambda df: df.withColumn("post", F.lit("merged")))


def _road_handler():
    return fw.LayerHandler(
        name="roads",
        matches=lambda tags: tags.getItem("highway").isNotNull(),
        process=lambda df: df.withColumn("kind", F.lit("line")))


def test_compose_and_dispatch(features):
    fp = fw.ForwardingProfile()
    assert fp.register_handler(_water_handler())
    assert fp.register_handler(_road_handler())
    got = fp.process(features).collect()
    by_layer = {}
    for r in got:
        by_layer.setdefault(r.layer, set()).add(r.id)
    assert by_layer == {"water": {1, 3}, "roads": {2}}
    # per-layer post-processor ran only on its layer
    assert all(r.post == "merged" for r in got if r.layer == "water")


def test_only_and_exclude_layers(features):
    fp = fw.ForwardingProfile(only_layers=["roads"])
    assert not fp.register_handler(_water_handler())
    assert fp.register_handler(_road_handler())
    assert {r.layer for r in fp.process(features).collect()} == {"roads"}

    fp2 = fw.ForwardingProfile(exclude_layers=["roads"])
    assert fp2.register_handler(_water_handler())
    assert not fp2.register_handler(_road_handler())


def test_layer_dependencies():
    # water_name depends on water: selecting only water_name keeps water
    fp = fw.ForwardingProfile(only_layers=["water_name"],
                              depends_on={"water_name": ["water"]})
    assert fp.cares_about_layer("water")
    assert fp.cares_about_layer("water_name")
    assert not fp.cares_about_layer("roads")


def test_tile_post_processor_and_finish(features):
    fp = fw.ForwardingProfile()
    fp.register_handler(_road_handler())
    fp.register_tile_post_processor(lambda df: df.filter(F.col("id") > 0))
    seen = []
    fp.register_finish_handler(seen.append)
    assert fp.process(features).count() == 1
    fp.finish("osm")
    assert seen == ["osm"]


def test_from_schema_bridge(features, spark):
    schema = pr.parse_schema("""
layers:
- id: named
  features:
  - include_when: {name: __any__}
    attributes:
    - key: n
      tag_value: name
""")
    fp = fw.from_schema(schema)
    got = {r.id: r.attrs.get("n") for r in fp.process(features).collect()}
    assert got == {1: "lake a", 2: "main st"}
