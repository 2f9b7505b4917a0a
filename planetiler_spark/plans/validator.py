"""Schema validator — the reference's `verify` CLI surface.

Reference: validator/BaseSchemaValidator.java:35 (comparison semantics,
PASS/FAIL output, watch loop), validator/SchemaSpecification.java:20-82 (the
spec YAML model), custommap/validator/SchemaValidator.java:20 (examples
embedded in the schema, referenced by relative path, or passed separately).

A spec is a list of examples, each an input source feature plus the expected
output vector-tile features:

    examples:
    - name: test output
      input:  {source: osm, geometry: polygon, tags: {natural: water}}
      output:
      - layer: water
        geometry: polygon
        min_zoom: 4            # optional; omitted fields are not checked
        tags: {natural: water} # expected values; `allow_extra_tags: false`
                               # additionally rejects unexpected tags

All examples are validated in ONE Spark pass: they become a tiny DataFrame
(example_id, geom_type, tags map) and run through the SAME compiled profile
(rule_match_column / attr_column) that the production pipeline uses — the
validator exercises the real plan, not a reimplementation of matching.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from pathlib import Path

import yaml
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, MapType, StringType, StructField,
                               StructType, IntegerType)

from . import profile as _profile
from .profile import (GEOMETRY_TRANSFORMS, Schema, attr_column, canon_tag,
                      min_zoom_column, parse_schema, rule_match_column,
                      geometry_type_matches)

# GeoUtils.java:64,69 — spherical-area constants (validated: reproduces the
# reference's own shortbread.spec.yml waterway=dock way_area to the last bit)
AVERAGE_WORLD_RADIUS_METERS = 6_371_008.8
_AREA_FACTOR = AVERAGE_WORLD_RADIUS_METERS * AVERAGE_WORLD_RADIUS_METERS / 2.0


def _ring_area_meters(ring: list[tuple[float, float]]) -> float:
    """GeoUtils.ringAreaMeters:665-676 ("Some Algorithms for Polygons on a
    Sphere", JPL 07-03): closed lat/lon ring -> approximate area in m²."""
    import math
    rad = math.pi / 180.0
    n = len(ring) - 1
    total = 0.0
    for i in range(n):
        lower_x = ring[i][0] * rad
        mid_y = ring[0 if i + 1 == n else i + 1][1] * rad
        upper_x = ring[(i + 2) % n if i + 2 >= n else i + 2][0] * rad
        total += (upper_x - lower_x) * math.sin(mid_y)
    return abs(total) * _AREA_FACTOR


def _parse_wkt_rings(wkt: str) -> list[list[list[tuple[float, float]]]]:
    """Minimal WKT polygon parser: POLYGON/MULTIPOLYGON -> [[rings]];
    non-areal geometries -> []."""
    import re as _re
    head = wkt.strip().split("(")[0].strip().upper()
    if head not in ("POLYGON", "MULTIPOLYGON"):
        return []
    def _rings(text: str) -> list[list[tuple[float, float]]]:
        out = []
        for t in _re.findall(r"\(([^()]+)\)", text):
            pts = []
            for pair in t.split(","):
                xy = pair.split()
                pts.append((float(xy[0]), float(xy[1])))
            out.append(pts)
        return out

    if head == "POLYGON":
        return [_rings(wkt)]
    # MULTIPOLYGON: preserve the shell/hole grouping — each `((...),(...))`
    # group is one polygon whose first ring is the shell and the rest holes
    # (a flat ring list would ADD hole areas to feature.area instead of
    # subtracting them).
    groups = _re.findall(r"\(\s*\([^()]*\)(?:\s*,\s*\([^()]*\))*\s*\)", wkt)
    return [_rings(g) for g in groups]


def _example_area_m2(geometry: str) -> float:
    """feature.area for an example's input geometry (GeoUtils.areaInMeters:
    shell minus holes, summed over polygons)."""
    g = geometry.strip().lower()
    if g == "polygon":
        wkt = "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"
    elif g in ("point", "line"):
        return 0.0
    else:
        wkt = geometry
    total = 0.0
    for poly in _parse_wkt_rings(wkt):
        if not poly:
            continue
        total += _ring_area_meters(poly[0])
        for hole in poly[1:]:
            total -= _ring_area_meters(hole)
    return total

# PlanetilerConfig defaults the validator needs (PlanetilerConfig.java:50-80):
# minFeatureSizeBelowMaxZoom=1px, minFeatureSizeAtMaxZoom=256/4096, maxzoom
# for rendering 14; SchemaSpecification.atZoom defaults to MAX_MAXZOOM=16.
MAX_MAXZOOM = 16
DEFAULT_MAXZOOM = 14
MIN_SIZE_BELOW_MAXZOOM = 1.0
MIN_SIZE_AT_MAXZOOM = 256.0 / 4096.0


@dataclass
class OutputFeature:
    layer: str | None = None
    geometry: str | None = None
    min_zoom: int | None = None
    max_zoom: int | None = None
    min_size: float | None = None
    at_zoom: int = MAX_MAXZOOM
    allow_extra_tags: bool = True
    tags: dict = field(default_factory=dict)


@dataclass
class Example:
    name: str
    source: str | None
    geometry: str
    tags: dict
    output: list[OutputFeature]


@dataclass
class ExampleResult:
    example: Example
    issues: list[str]

    @property
    def ok(self) -> bool:
        return not self.issues


def load_spec(doc) -> list[Example]:
    """Parse a spec document (dict, YAML text, or Path). The `output` of an
    example may be a single mapping or a list (ACCEPT_SINGLE_VALUE_AS_ARRAY,
    SchemaSpecification.java:34)."""
    if isinstance(doc, Path):
        doc = doc.read_text()
    if isinstance(doc, str):
        doc = yaml.safe_load(doc) or {}
    out = []
    for ex in doc.get("examples") or []:
        inp = ex.get("input") or {}
        raw = ex.get("output")
        raw = [] if raw is None else (raw if isinstance(raw, list) else [raw])
        feats = []
        for f in raw:
            f = f or {}
            feats.append(OutputFeature(
                layer=f.get("layer"),
                geometry=f.get("geometry"),
                min_zoom=f.get("min_zoom"),
                max_zoom=f.get("max_zoom"),
                min_size=(float(f["min_size"])
                          if f.get("min_size") is not None else None),
                at_zoom=(int(f["at_zoom"])
                         if f.get("at_zoom") is not None else MAX_MAXZOOM),
                allow_extra_tags=(True if f.get("allow_extra_tags") is None
                                  else bool(f["allow_extra_tags"])),
                tags=f.get("tags") or {},
            ))
        out.append(Example(
            name=ex.get("name") or "unnamed example",
            source=inp.get("source"),
            geometry=inp.get("geometry") or "point",
            tags=inp.get("tags") or {},
            output=feats,
        ))
    return out


def _input_geom_type(geometry: str) -> str:
    """Named geometry or WKT -> type label (BaseSchemaValidator.parseGeometry
    :135-149 accepts "point"/"line"/"polygon" or any WKT string)."""
    g = geometry.strip()
    low = g.lower()
    if low in ("point", "line", "polygon"):
        return "line" if low == "line" else low
    head = low.split("(")[0].strip()
    wkt_types = {"point": "point", "multipoint": "point",
                 "linestring": "line", "multilinestring": "line",
                 "polygon": "polygon", "multipolygon": "polygon"}
    if head in wkt_types:
        return wkt_types[head]
    raise ValueError(
        f'Bad geometry: "{geometry}", must be "point" "line" "polygon" '
        "or a valid WKT string.")


def _rule_output_geometry(rule) -> str:
    """The geometry type a rule EMITS: point-emitting transforms yield
    points; pass-throughs keep the (required or input) type."""
    required, kernel = GEOMETRY_TRANSFORMS[rule.geometry]
    if kernel in (None, "split_line"):
        return required  # None = same as input
    return "point"


def _effective_min_size(rule, out_geom: str, at_zoom: int) -> float:
    """FeatureCollector.getMinPixelSizeAtZoom (FeatureCollector.java:690-692);
    points are never size-filtered (:564-565)."""
    if out_geom == "point":
        return 0.0
    if at_zoom == DEFAULT_MAXZOOM:
        return MIN_SIZE_AT_MAXZOOM
    return rule.min_size if rule.min_size is not None else MIN_SIZE_BELOW_MAXZOOM


def run_examples(spark, schema: Schema, examples: list[Example]):
    """One Spark pass over all examples: (example_id, geom_type, tags) rows
    through every compiled rule; returns {example_id: [matched rule rows]}.
    Each row: (rule_idx, attrs dict)."""
    rows = []
    for i, ex in enumerate(examples):
        tags = {str(k): canon_tag(v) for k, v in ex.tags.items()
                if v is not None}
        rows.append((i, ex.source, _input_geom_type(ex.geometry), tags,
                     _example_area_m2(ex.geometry)))
    st = StructType([StructField("example_id", IntegerType()),
                     StructField("source", StringType()),
                     StructField("geom_type", StringType()),
                     StructField("tags", MapType(StringType(), StringType())),
                     StructField("__area_m2", DoubleType())])
    df = spark.createDataFrame(rows, st)
    tags = F.col("tags")
    mappings = schema.tag_mappings
    parts = []
    skipped = []
    # expose feature.area to compiled CEL scripts for the duration of the
    # rule compilation (each row carries its precomputed spherical area)
    _profile.CEL_EXTRA_VARS["feature.area"] = ("__area_m2", "num")
    try:
        _compile_rule_parts(df, schema, tags, mappings, parts, skipped)
    finally:
        _profile.CEL_EXTRA_VARS.pop("feature.area", None)
    if skipped:
        print("warning: %d rule(s) skipped (uncompilable): %s" %
              (len(skipped), "; ".join(f"{l}/{g}: {m[:80]}"
                                       for l, g, m in skipped[:5])),
              file=sys.stderr)
    if not parts:
        return {}
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    matched: dict[int, list] = {}
    for r in union.collect():
        matched.setdefault(r["example_id"], []).append(
            (r["rule_idx"], int(r["min_zoom"]), dict(r["attrs"] or {})))
    return matched


def _compile_rule_parts(df, schema, tags, mappings, parts, skipped):
    for idx, rule in enumerate(schema.rules):
        required, _ = GEOMETRY_TRANSFORMS[rule.geometry]
        try:
            attr_pairs = []
            for a in rule.attributes:
                try:
                    col = attr_column(a, tags, mappings, "tags", rule)
                except Exception as e:
                    # an uncompilable ATTRIBUTE is omitted (and reported),
                    # not fatal to the rule — matching still validates
                    skipped.append((rule.layer, f"attr:{a.key}", str(e)))
                    continue
                attr_pairs.extend([F.lit(a.key), col])
            attrs_col = (F.map_filter(F.create_map(*attr_pairs),
                                      lambda k, v: v.isNotNull())
                         if attr_pairs else F.create_map())
            part = (df.filter(rule_match_column(rule, tags, mappings, "tags"))
                    .filter(geometry_type_matches(F.col("geom_type"), required)))
            if rule.source is not None:
                part = part.filter(F.col("source").isNull() |
                                   (F.col("source") == rule.source))
            parts.append(part.select(
                "example_id", F.lit(idx).alias("rule_idx"),
                min_zoom_column(rule, tags, mappings, "tags")
                .alias("min_zoom"),
                attrs_col.alias("attrs")))
        except Exception as e:  # an uncompilable rule must not sink the run
            skipped.append((rule.layer, rule.geometry, str(e)))


def _gate_attrs(rule, attrs: dict, at_zoom: int) -> dict:
    """getAttrsAtZoom analog: drop attrs outside their zoom gate."""
    gated = dict(attrs)
    for a in rule.attributes:
        lo = a.min_zoom if a.min_zoom is not None else 0
        hi = a.max_zoom if a.max_zoom is not None else MAX_MAXZOOM
        if a.key in gated and not (lo <= at_zoom <= hi):
            del gated[a.key]
    return gated


def _fmt(o) -> str:
    if o is None:
        return "null"
    if isinstance(o, str):
        return '"%s"' % o
    if isinstance(o, bool):
        return "true" if o else "false"
    return str(o)


def _check(field_name: str, issues: list[str], expected, actual,
           ignore_when_null: bool = True):
    """BaseSchemaValidator.validate(:237-245): record a readable diff line on
    mismatch; numbers compare by canonical string (int/long leniency)."""
    if ignore_when_null and expected is None:
        return
    if expected != actual:
        if (isinstance(expected, (int, float)) and isinstance(actual, (int, float))
                and not isinstance(expected, bool) and not isinstance(actual, bool)
                and float(expected) == float(actual)):
            return
        # cross-libm leniency: Java's Math.sin and C libm can differ in the
        # last ulp, so a spherical-area expectation computed by the Java
        # reference may be one representable double away from ours. Accept
        # numbers within 1e-12 relative (a few ulps), nothing looser.
        try:
            import math
            fe, fa = float(expected), float(actual)
            if (math.isfinite(fe) and math.isfinite(fa)
                    and math.isclose(fe, fa, rel_tol=1e-12, abs_tol=0.0)):
                return
        except (TypeError, ValueError):
            pass
        issues.append(f"{field_name}: expected <{_fmt(expected)}> "
                      f"actual <{_fmt(actual)}>")


def _proximity(expected: OutputFeature, rule, out_geom: str, attrs: dict) -> int:
    score = 2 if expected.layer == rule.layer else 0
    score += 1 if expected.geometry == out_geom else 0
    for k, v in expected.tags.items():
        if k in attrs:
            score += 1
            if attrs[k] == canon_tag(v):
                score += 1
    return score


def _validate_example(schema: Schema, ex: Example, rows: list) -> list[str]:
    issues: list[str] = []
    expected = ex.output
    if len(rows) != len(expected):
        issues.append("Different number of elements, expected=%d actual=%d"
                      % (len(expected), len(rows)))
        return issues
    in_geom = _input_geom_type(ex.geometry)
    pool = list(rows)
    for i, exp in enumerate(expected):
        best = max(pool, key=lambda r: _proximity(
            exp, schema.rules[r[0]],
            _rule_output_geometry(schema.rules[r[0]]) or in_geom, r[2]))
        pool.remove(best)
        rule_idx, row_min_zoom, attrs = best
        rule = schema.rules[rule_idx]
        out_geom = _rule_output_geometry(rule) or in_geom
        attrs = _gate_attrs(rule, attrs, exp.at_zoom)
        prefix = "feature[%d]" % i
        _check(prefix + ".layer", issues, exp.layer, rule.layer)
        _check(prefix + ".minzoom", issues, exp.min_zoom, row_min_zoom)
        _check(prefix + ".maxzoom", issues, exp.max_zoom, rule.max_zoom)
        _check(prefix + ".minsize", issues, exp.min_size,
               _effective_min_size(rule, out_geom, exp.at_zoom))
        _check(prefix + ".geometry", issues, exp.geometry, out_geom)
        seen = set(attrs)
        for tag, value in exp.tags.items():
            _check('%s.tags["%s"]' % (prefix, tag), issues,
                   canon_tag(value), attrs.get(tag), ignore_when_null=False)
            seen.discard(tag)
        if not exp.allow_extra_tags:
            for tag in sorted(seen):
                _check('%s.tags["%s"]' % (prefix, tag), issues,
                       None, attrs.get(tag), ignore_when_null=False)
    return issues


def validate(spark, schema, spec) -> list[ExampleResult]:
    """Validate `schema` (Schema, YAML text, or Path) against `spec`
    (SchemaValidator.validate analog). Returns one result per example."""
    if isinstance(schema, Path):
        schema = schema.read_text()
    if isinstance(schema, str):
        schema = parse_schema(schema)
    examples = spec if isinstance(spec, list) else load_spec(spec)
    matched = run_examples(spark, schema, examples)
    results = []
    for i, ex in enumerate(examples):
        try:
            issues = _validate_example(schema, ex, matched.get(i, []))
        except Exception as e:  # a broken example fails, not the whole run
            issues = ["%s: %s" % (type(e).__name__, e)]
        results.append(ExampleResult(ex, issues))
    return results


def resolve_spec(schema_path: Path, spec_arg: str | None):
    """SchemaValidator.validate(:53-73): examples may live in a separate spec
    file, be embedded in the schema YAML, or be a relative path under the
    schema's `examples:` key. Returns (examples, watched paths)."""
    watch = [schema_path]
    if spec_arg:
        p = Path(spec_arg)
        watch.append(p)
        return load_spec(p), watch
    doc = yaml.safe_load(schema_path.read_text()) or {}
    ex = doc.get("examples")
    if isinstance(ex, str):
        p = Path(ex)
        if not p.is_absolute():
            p = schema_path.parent / p
        watch.append(p)
        return load_spec(p), watch
    return load_spec(doc), watch


PASS = "\x1b[1;30;42m PASS \x1b[0m"
FAIL = "\x1b[1;37;41m FAIL \x1b[0m"


def print_results(results: list[ExampleResult], out=sys.stdout) -> bool:
    passed = failed = 0
    print("\nValidating...\n", file=out)
    for r in results:
        if r.ok:
            passed += 1
            print(f"{PASS} {r.example.name}", file=out)
        else:
            failed += 1
            print(f"{FAIL} {r.example.name}", file=out)
            for issue in r.issues:
                print(f"  ●     {issue}", file=out)
    summary = []
    if failed or not results:
        summary.append(f"{failed} failed")
    if passed or not results:
        summary.append(f"{passed} passed")
    if passed and failed:
        summary.append(f"{passed + failed} total")
    print("\n" + ", ".join(summary), file=out)
    return failed == 0


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(
        description="verify a YAML schema against its example spec "
                    "(the reference's `verify schema.yml` CLI)")
    ap.add_argument("schema", help="schema YAML file")
    ap.add_argument("--spec", default=None,
                    help="spec YAML (default: schema's own examples)")
    ap.add_argument("--watch", action="store_true",
                    help="re-run when the schema or spec file changes")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .appName("planetiler_spark_verify")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    schema_path = Path(args.schema)

    def run_once() -> tuple[bool, list[Path]]:
        try:
            examples, watch = resolve_spec(schema_path, args.spec)
            results = validate(spark, schema_path, examples)
            return print_results(results), watch
        except Exception as e:
            print(f"Malformed input:\n    {type(e).__name__}: {e}",
                  file=sys.stderr)
            return False, [schema_path]

    ok, watch = run_once()
    if args.watch:
        print("\nWatching filesystem for changes...")
        stamps = {p: p.stat().st_mtime if p.exists() else 0 for p in watch}
        while True:
            time.sleep(0.3)
            now = {p: p.stat().st_mtime if p.exists() else 0 for p in watch}
            if now != stamps:
                ok, watch = run_once()
                stamps = {p: p.stat().st_mtime if p.exists() else 0
                          for p in watch}
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
