"""Schema validator (`verify`) tests.

Ports the reference's test vectors:
- SchemaValidatorTest.java:71-135 (custommap): the water-polygon CsvSource
  truth table over a compiled YAML schema, including allow_extra_tags and
  min_size assertions.
- BaseSchemaValidatorTest.java:183-221: wrong-number-of-features failures.
- SchemaValidator.java:53-73: examples embedded in the schema, referenced by
  relative path, or passed as a separate spec file.

Plus: the reference's shipped shortbread.spec.yml examples that exercise the
schema surface this engine compiles (subset documented in the test).
"""

import subprocess
import sys
from pathlib import Path

import pytest

from planetiler_spark.plans import validator as V
from planetiler_spark.plans.profile import parse_schema

WATER_SCHEMA = """
sources:
  osm:
    type: osm
layers:
- id: water
  features:
  - source: osm
    geometry: polygon
    min_size: 10
    include_when:
      natural: water
    attributes:
    - key: natural
      tag_value: natural
"""


def water_spec(layer="water", geometry="polygon", tags="natural: water",
               extra=""):
    tag_block = ""
    if tags:
        tag_block = "\n".join("      " + line for line in tags.split("\n"))
        tag_block = "    tags:\n" + tag_block
    return f"""
examples:
- name: test output
  input:
    source: osm
    geometry: polygon
    tags:
      natural: water
  output:
    layer: {layer}
    geometry: {geometry}
    {extra}
{tag_block}
"""


# SchemaValidatorTest.java CsvSource rows: (should_pass, layer, geometry,
# tags, extra yaml on the output feature)
WATER_VECTORS = [
    (True, "water", "polygon", "natural: water", ""),
    (True, "water", "polygon", "", ""),
    (True, "water", "polygon", "natural: water\nother: null", ""),
    (False, "water", "polygon", "natural: null", ""),
    (False, "water2", "polygon", "natural: water", ""),
    (False, "water", "line", "natural: water", ""),
    (False, "water", "polygon", "natural: water2", ""),
    (False, "water", "polygon", "natural: water\nother: value", ""),
    (True, "water", "polygon", "natural: water", "allow_extra_tags: true"),
    (True, "water", "polygon", "natural: water", "allow_extra_tags: false"),
    (True, "water", "polygon", "", "allow_extra_tags: true"),
    (False, "water", "polygon", "", "allow_extra_tags: false"),
    (True, "water", "polygon", "", "min_size: 10"),
    (False, "water", "polygon", "", "min_size: 9"),
]


@pytest.mark.parametrize("should_pass,layer,geometry,tags,extra", WATER_VECTORS)
def test_water_polygon_vectors(spark, should_pass, layer, geometry, tags, extra):
    results = V.validate(spark, WATER_SCHEMA,
                         water_spec(layer, geometry, tags, extra))
    assert len(results) == 1
    assert results[0].example.name == "test output"
    assert results[0].ok == should_pass, results[0].issues


def test_wrong_number_of_features(spark):
    # BaseSchemaValidatorTest.java:183-221 — expected 0 but schema emits 1,
    # then expected 2 but schema emits 1
    spec0 = """
examples:
- name: test output
  input: {source: osm, geometry: polygon, tags: {natural: water}}
  output:
"""
    r = V.validate(spark, WATER_SCHEMA, spec0)
    assert not r[0].ok
    assert "Different number of elements, expected=0 actual=1" in r[0].issues

    spec2 = """
examples:
- name: test output
  input: {source: osm, geometry: polygon, tags: {natural: water}}
  output:
  - {layer: water, geometry: polygon, tags: {natural: water}}
  - {layer: water2, geometry: polygon, tags: {natural: water2}}
"""
    r = V.validate(spark, WATER_SCHEMA, spec2)
    assert not r[0].ok
    assert "Different number of elements, expected=2 actual=1" in r[0].issues


def test_readable_diffs(spark):
    r = V.validate(spark, WATER_SCHEMA, water_spec(layer="water2"))
    assert any('feature[0].layer: expected <"water2"> actual <"water">'
               == i for i in r[0].issues), r[0].issues
    r = V.validate(spark, WATER_SCHEMA, water_spec(tags="natural: water2"))
    assert any('feature[0].tags["natural"]: expected <"water2"> '
               'actual <"water">' == i for i in r[0].issues), r[0].issues


def test_min_zoom_and_point_transform(spark):
    # a polygon_centroid rule emits POINT geometry; min_zoom asserted
    schema = """
layers:
- id: poi
  features:
  - geometry: polygon_centroid
    min_zoom: 7
    include_when: {amenity: __any__}
    attributes:
    - key: kind
      tag_value: amenity
"""
    spec = """
examples:
- name: centroid is a point
  input: {source: osm, geometry: polygon, tags: {amenity: cafe}}
  output: {layer: poi, geometry: point, min_zoom: 7, tags: {kind: cafe}}
- name: wrong expected geometry fails
  input: {source: osm, geometry: polygon, tags: {amenity: cafe}}
  output: {layer: poi, geometry: polygon, min_zoom: 7}
"""
    r = V.validate(spark, schema, spec)
    assert r[0].ok, r[0].issues
    assert not r[1].ok
    assert any(".geometry" in i for i in r[1].issues)


def test_multiple_output_features_greedy_match(spark):
    # two layers from one input; expectations listed in either order must
    # match via the proximity comparator (BaseSchemaValidator:212-235)
    schema = """
layers:
- id: water_polygons
  features:
  - geometry: polygon
    min_zoom: 4
    include_when: {natural: glacier}
    attributes: [{key: kind, value: glacier}]
- id: water_labels
  features:
  - geometry: polygon_point_on_surface
    min_zoom: 14
    include_when: {natural: glacier}
    attributes: [{key: kind, value: glacier}, {key: name, tag_value: name}]
"""
    spec = """
examples:
- name: glacier both orders
  input: {source: osm, geometry: polygon, tags: {natural: glacier, name: G}}
  output:
  - {layer: water_labels, geometry: point, min_zoom: 14,
     tags: {kind: glacier, name: G}}
  - {layer: water_polygons, geometry: polygon, min_zoom: 4,
     tags: {kind: glacier}}
"""
    r = V.validate(spark, schema, spec)
    assert r[0].ok, r[0].issues


def test_conditional_attribute_and_match_value(spark):
    # AttributeDefinition include_when/else + type: match_value
    schema = """
layers:
- id: transit
  features:
  - geometry: line
    include_when:
      railway: [rail, tram]
    attributes:
    - key: kind
      type: match_value
    - key: electrified
      value: yes
      include_when: {electrified: contact_line}
      else: no
    - key: tunnel
      value: true
      include_when: {tunnel: __any__}
"""
    spec = """
examples:
- name: electrified tram with value from match
  input: {source: osm, geometry: line,
          tags: {railway: tram, electrified: contact_line}}
  output: {layer: transit, geometry: line,
           tags: {kind: tram, electrified: yes}}
- name: plain rail hits the else branch, tunnel attr omitted
  input: {source: osm, geometry: line, tags: {railway: rail}}
  output:
    layer: transit
    geometry: line
    allow_extra_tags: false
    tags: {kind: rail, electrified: no}
- name: tunnel attr present only when tagged
  input: {source: osm, geometry: line, tags: {railway: rail, tunnel: yes}}
  output: {layer: transit, geometry: line,
           tags: {kind: rail, tunnel: true}}
"""
    r = V.validate(spark, schema, spec)
    for res in r:
        assert res.ok, (res.example.name, res.issues)


def test_zoom_gated_attr_at_zoom(spark):
    schema = """
layers:
- id: place
  features:
  - geometry: point
    include_when: {place: city}
    attributes:
    - key: name
      tag_value: name
      min_zoom: 8
"""
    spec = """
examples:
- name: name hidden below its min_zoom
  input: {source: osm, geometry: point, tags: {place: city, name: X}}
  output:
    layer: place
    geometry: point
    at_zoom: 7
    allow_extra_tags: false
    tags: {}
- name: name visible at its min_zoom
  input: {source: osm, geometry: point, tags: {place: city, name: X}}
  output: {layer: place, geometry: point, at_zoom: 8, tags: {name: X}}
"""
    r = V.validate(spark, schema, spec)
    for res in r:
        assert res.ok, (res.example.name, res.issues)


def test_spec_resolution(tmp_path):
    # SchemaValidator.java:53-73 — three ways to find the examples
    schema_yaml = WATER_SCHEMA + "\n" + water_spec()
    p1 = tmp_path / "embedded.yml"
    p1.write_text(schema_yaml)
    ex, watch = V.resolve_spec(p1, None)
    assert len(ex) == 1 and ex[0].name == "test output"
    assert watch == [p1]

    spec_file = tmp_path / "spec.yml"
    spec_file.write_text(water_spec())
    p2 = tmp_path / "relative.yml"
    p2.write_text(WATER_SCHEMA + "\nexamples: spec.yml\n")
    ex, watch = V.resolve_spec(p2, None)
    assert len(ex) == 1
    assert spec_file in watch

    ex, watch = V.resolve_spec(p2, str(spec_file))
    assert len(ex) == 1


def test_cli_exit_codes(tmp_path):
    good = tmp_path / "good.yml"
    good.write_text(WATER_SCHEMA + "\n" + water_spec())
    bad = tmp_path / "bad.yml"
    bad.write_text(WATER_SCHEMA + "\n" + water_spec(layer="nope"))
    env_ok = subprocess.run(
        [sys.executable, "-m", "planetiler_spark.plans.validator", str(good)],
        capture_output=True, text=True, cwd=str(Path(__file__).parent.parent))
    assert env_ok.returncode == 0, env_ok.stdout + env_ok.stderr
    assert " PASS " in env_ok.stdout and "1 passed" in env_ok.stdout
    env_bad = subprocess.run(
        [sys.executable, "-m", "planetiler_spark.plans.validator", str(bad)],
        capture_output=True, text=True, cwd=str(Path(__file__).parent.parent))
    assert env_bad.returncode == 1
    assert " FAIL " in env_bad.stdout and "1 failed" in env_bad.stdout


REF_SAMPLES = Path("/root/reference/planetiler-custommap/src/main/resources/samples")


@pytest.mark.skipif(not REF_SAMPLES.exists(), reason="reference not present")
def test_shortbread_spec_all_examples(spark):
    """Run ALL of the reference's own shortbread.spec.yml examples through
    the compiled shortbread.yml schema — every single one must PASS. This
    exercises the full schema surface: boolean matching, tag copies,
    constants, conditional attributes with else fallbacks, geometry
    transforms, `feature.area` in CEL, `.split()/.map()/size()/max()` list
    macros, typed `population` parsing, and the empty-string-drops-attr
    rule (ConfiguredFeature.java:333)."""
    schema_text = (REF_SAMPLES / "shortbread.yml").read_text()
    spec = V.load_spec((REF_SAMPLES / "shortbread.spec.yml").read_text())
    schema = parse_schema(schema_text)
    results = V.validate(spark, schema, spec)
    assert len(results) == 67
    failures = [(r.example.name, r.issues) for r in results if not r.ok]
    assert not failures, failures
