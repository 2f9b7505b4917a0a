"""YAML schema "query language" -> compiled Spark plan.

Reference: planetiler-custommap (SchemaConfig.java:45-51, ConfiguredProfile
.java:33, ConfiguredFeature.java:33, configschema/FeatureItem.java:8-21,
BooleanExpressionParser.java:27, expression/Expression.java:35).

A schema is layers[].features[] rules:

    layers:
    - id: water
      features:
      - geometry: polygon
        min_zoom: 4
        include_when:
          natural: water          # tag equality
          class: [lake, river]    # any-of (MatchAny)
          name: "%lake%"          # contains (Expression.java MatchAny %..%)
          ref: ""                 # key present, any value (match-everything)
        exclude_when: {...}
        attributes:
        - key: class
          tag_value: class        # copy from tag
        - key: kind
          value: water            # constant
          min_zoom: 6             # zoom-gated attr (ZoomFunction)

Boolean YAML combinators: `__any__` (OR, the default across a mapping's
entries is AND like the reference), `__all__`, `__not__`.

The compiler emits the SAME predicate tree two ways:
  - `cond_to_column` -> a Catalyst Column over a `tags: map<string,string>`
    column (constant folding / CSE / pushdown are free, SURVEY §4), and
  - `cond_to_sql`    -> ANSI SQL over flat columns (for the DuckDB oracle),
so rule matching is verified cross-engine bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import cel

# FeatureGeometry.java:11-38 — the full transform enum. Each maps to
# (required input geometry or None=any, point-emitting kernel or None=pass).
GEOMETRY_TRANSFORMS = {
    "any": (None, None),
    "point": ("point", None),
    "line": ("line", None),
    "polygon": ("polygon", None),
    "polygon_centroid": ("polygon", "centroid"),
    "line_centroid": ("line", "centroid"),
    "line_midpoint": ("line", "midpoint"),
    "centroid": (None, "centroid"),
    "polygon_centroid_if_convex": ("polygon", "centroid_if_convex"),
    "polygon_point_on_surface": ("polygon", "point_on_surface"),
    # FeatureGeometry maps point_on_line to FeatureCollector::pointOnSurface,
    # which for a line is JTS InteriorPointLine: the interior VERTEX nearest
    # the centroid (endpoints only for 2-point lines) — not the midpoint
    "point_on_line": ("line", "line_interior"),
    "innermost_point": (None, "innermost_point"),
    # FeatureCollector::splitLine — emits one line feature per segment of a
    # way split at intersection nodes (OsmWaySplitter); handled at the OSM
    # source level by split_line_ways below, not by the point dispatch
    "split_line": ("line", "split_line"),
}


def split_line_rules(rules: list["Rule"]) -> list["Rule"]:
    return [r for r in rules if r.geometry == "split_line"]


def split_line_ways(ways: DataFrame, rules: list["Rule"],
                    tags_col: str = "tags", mappings: dict | None = None,
                    renumber: bool = True) -> DataFrame:
    """`geometry: split_line` dispatch (FeatureGeometry.java:36-37 ->
    FeatureCollector.splitLine:142-159; ConfiguredProfile marks matching ways
    via splitOsmWayAtIntersections:191-197): filter the OSM ways table to the
    ways matched by any split_line rule, split them at intersection nodes
    (sources/osm.split_ways_at_intersections), and emit one row per segment
    per matching rule, tagged with the rule's layer.

    Input ways: DataFrame(id, tags, refs). Output: (layer, way_id, seg,
    split_id, refs, tags)."""
    from ..sources.osm import split_ways_at_intersections

    srules = split_line_rules(rules)
    if not srules:
        raise ValueError("no split_line rules in schema")
    tags = F.col(tags_col)
    any_match = None
    for rule in srules:
        c = rule_match_column(rule, tags, mappings, tags_col)
        any_match = c if any_match is None else (any_match | c)
    marked = ways.filter(any_match)
    segs = split_ways_at_intersections(
        marked.select("id", "refs"), renumber=renumber)
    segs = segs.join(marked.select(F.col("id").alias("way_id"), tags_col),
                     "way_id")
    out = None
    for rule in srules:
        part = (segs.filter(rule_match_column(rule, F.col(tags_col),
                                              mappings, tags_col))
                .select(F.lit(rule.layer).alias("layer"), "way_id", "seg",
                        "split_id", "refs", tags_col))
        out = part if out is None else out.unionByName(part)
    return out


@dataclass
class AttrSpec:
    key: str
    value: str | None = None       # constant, or a `${ ... }` script (cel.py)
    tag_value: str | None = None   # copy from this tag (via tag_mappings)
    min_zoom: int | None = None
    max_zoom: int | None = None


@dataclass
class Rule:
    layer: str
    geometry: str = "any"
    min_zoom: int = 0
    max_zoom: int = 14
    include_when: dict | None = None
    exclude_when: dict | None = None
    attributes: list[AttrSpec] = field(default_factory=list)


@dataclass
class Schema:
    """Parsed schema: rules + tag_mappings (SchemaConfig.java:20
    inputMappings -> TagValueProducer.java:24-48: each OUTPUT key maps to an
    input tag plus a forgiving type conversion)."""
    rules: list[Rule] = field(default_factory=list)
    tag_mappings: dict[str, tuple[str, str]] = field(default_factory=dict)
    # out_key -> (input_key, type); type in string|long|integer|double|
    #            boolean|direction|get_tag


def parse_schema(text: str) -> Schema:
    doc = yaml.safe_load(text)
    mappings: dict[str, tuple[str, str]] = {}
    for key, spec in (doc.get("tag_mappings") or {}).items():
        if isinstance(spec, str):
            mappings[key] = (key, spec)
        else:  # {input: other_key, type: t} — rename + convert
            mappings[key] = (spec.get("input", key), spec.get("type", "get_tag"))
    rules = []
    for layer in doc.get("layers", []):
        for feat in layer.get("features", []):
            geom = feat.get("geometry", "any")
            if geom not in GEOMETRY_TRANSFORMS:
                raise ValueError(f"unsupported geometry transform {geom!r} "
                                 f"(supported: {sorted(GEOMETRY_TRANSFORMS)})")
            rules.append(Rule(
                layer=layer["id"],
                geometry=geom,
                min_zoom=int(feat.get("min_zoom", 0)),
                max_zoom=int(feat.get("max_zoom", 14)),
                include_when=feat.get("include_when"),
                exclude_when=feat.get("exclude_when"),
                attributes=[AttrSpec(
                    key=a["key"], value=a.get("value"),
                    tag_value=a.get("tag_value"),
                    min_zoom=a.get("min_zoom"), max_zoom=a.get("max_zoom"),
                ) for a in feat.get("attributes", [])],
            ))
    return Schema(rules=rules, tag_mappings=mappings)


def parse_profile(text: str) -> list[Rule]:
    return parse_schema(text).rules


# --- typed tag getters (TagValueProducer + DataType/Parse.java semantics) ----

def convert_sql(expr: str, typ: str) -> str:
    """Forgiving tag-string conversion fragment (portable Spark/DuckDB SQL):
    Parse.bool:114 (false only for no/false/0), parseIntSubstring:73
    (leading-integer), Parse.direction."""
    if typ in ("string", "get_tag", None):
        return expr
    if typ in ("long", "integer"):
        return (f"CAST(nullif(regexp_extract({expr}, '^(-?[0-9]+)', 1), '')"
                " AS BIGINT)")
    if typ == "double":
        return (f"CAST(nullif(regexp_extract({expr}, '^(-?[0-9]+[.]?[0-9]*)', 1), '')"
                " AS DOUBLE)")
    if typ == "boolean":
        return (f"(CASE WHEN {expr} IS NULL THEN NULL "
                f"WHEN {expr} IN ('no', 'false', '0') THEN FALSE ELSE TRUE END)")
    if typ == "direction":
        return (f"(CASE WHEN {expr} IN ('-1', 'backward', 'down') THEN -1 "
                f"WHEN {expr} IN ('1', 'yes', 'true', 'forward', 'up') THEN 1 "
                f"ELSE 0 END)")
    raise ValueError(f"unknown tag_mappings type {typ!r}")


def _typ_label(typ: str) -> str:
    if typ in ("long", "integer", "double", "direction"):
        return "num"
    if typ == "boolean":
        return "bool"
    return "str"


def spark_tag_ref(mappings: dict[str, tuple[str, str]], tags_col: str = "tags"):
    """cel.TagRef over a Spark map<string,string> column, honoring
    tag_mappings renames + conversions."""
    def ref(key: str) -> tuple[str, str]:
        ik, typ = mappings.get(key, (key, "string"))
        safe = ik.replace("'", "''")
        return convert_sql(f"{tags_col}['{safe}']", typ), _typ_label(typ)
    return ref


def duckdb_tag_ref(mappings: dict[str, tuple[str, str]], colmap: dict[str, str]):
    """cel.TagRef over flat oracle columns."""
    def ref(key: str) -> tuple[str, str]:
        ik, typ = mappings.get(key, (key, "string"))
        return convert_sql(colmap[ik], typ), _typ_label(typ)
    return ref


# --- predicate compiler (BooleanExpressionParser.java:27 semantics) -----------

def _leaf_column(tags: Column, key: str, val,
                 mappings: dict | None = None, tags_name: str = "tags") -> Column:
    """Null-safe leaf: a missing tag never matches (and never poisons a
    surrounding NOT with SQL three-valued NULL). Keys with a tag_mapping
    compare the CONVERTED value (TagValueProducer semantics: a `long`-typed
    key matches the numeric literal, not its string spelling)."""
    if mappings and key in mappings:
        ik, typ = mappings[key]
        conv = convert_sql(f"{tags_name}['{ik}']", typ)
        if val == "" or val is None:
            return F.expr(f"({conv}) IS NOT NULL")
        if isinstance(val, list):
            parts = [_leaf_column(tags, key, x, mappings, tags_name) for x in val]
            out = parts[0]
            for p in parts[1:]:
                out = out | p
            return out
        lit = str(val) if _typ_label(typ) == "num" else f"'{str(val)}'"
        if _typ_label(typ) == "bool":
            lit = "TRUE" if str(val).lower() in ("true", "yes", "1") else "FALSE"
        return F.expr(f"COALESCE(({conv}) = {lit}, FALSE)")
    v = tags.getItem(key)
    if val == "" or val is None:
        return v.isNotNull()                      # match-everything-with-key
    if isinstance(val, list):
        parts = [_leaf_column(tags, key, x) for x in val]
        out = parts[0]
        for p in parts[1:]:
            out = out | p
        return out
    s = str(val)
    if s.startswith("%") and s.endswith("%") and len(s) > 2:
        return v.isNotNull() & v.contains(s[1:-1])
    return F.coalesce(v == s, F.lit(False))


def cond_to_column(cond, tags: Column, mappings: dict | None = None,
                   tags_name: str = "tags") -> Column:
    """YAML boolean tree -> Catalyst Column. A mapping is AND of its entries;
    `__any__` is OR; `__not__` negates; a list under `__any__`/`__all__`
    holds sub-trees."""
    if cond is None:
        return F.lit(True)
    sub = []
    for k, v in cond.items():
        if k == "__any__":
            parts = [cond_to_column(c, tags, mappings, tags_name) for c in _as_list(v)]
            out = parts[0]
            for p in parts[1:]:
                out = out | p
            sub.append(out)
        elif k == "__all__":
            parts = [cond_to_column(c, tags, mappings, tags_name) for c in _as_list(v)]
            out = parts[0]
            for p in parts[1:]:
                out = out & p
            sub.append(out)
        elif k == "__not__":
            sub.append(~cond_to_column(v, tags, mappings, tags_name))
        else:
            sub.append(_leaf_column(tags, k, v, mappings, tags_name))
    out = sub[0]
    for p in sub[1:]:
        out = out & p
    return out


def _as_list(v):
    return v if isinstance(v, list) else [v]


def _sql_quote(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def _leaf_sql(colmap: dict[str, str], key: str, val,
              mappings: dict | None = None) -> str:
    if mappings and key in mappings:
        ik, typ = mappings[key]
        conv = convert_sql(colmap[ik], typ)
        if val == "" or val is None:
            return f"({conv}) IS NOT NULL"
        if isinstance(val, list):
            return "(" + " OR ".join(_leaf_sql(colmap, key, x, mappings) for x in val) + ")"
        if _typ_label(typ) == "num":
            lit = str(val)
        elif _typ_label(typ) == "bool":
            lit = "TRUE" if str(val).lower() in ("true", "yes", "1") else "FALSE"
        else:
            lit = _sql_quote(val)
        return f"COALESCE(({conv}) = {lit}, FALSE)"
    col = colmap[key]
    if val == "" or val is None:
        return f"{col} IS NOT NULL"
    if isinstance(val, list):
        return "(" + " OR ".join(_leaf_sql(colmap, key, x) for x in val) + ")"
    s = str(val)
    if s.startswith("%") and s.endswith("%") and len(s) > 2:
        return f"({col} IS NOT NULL AND position({_sql_quote(s[1:-1])} IN {col}) > 0)"
    return f"COALESCE({col} = {_sql_quote(s)}, FALSE)"


def cond_to_sql(cond, colmap: dict[str, str], mappings: dict | None = None) -> str:
    """Same tree -> ANSI SQL over flat columns (DuckDB oracle side)."""
    if cond is None:
        return "TRUE"
    sub = []
    for k, v in cond.items():
        if k == "__any__":
            sub.append("(" + " OR ".join(cond_to_sql(c, colmap, mappings) for c in _as_list(v)) + ")")
        elif k == "__all__":
            sub.append("(" + " AND ".join(cond_to_sql(c, colmap, mappings) for c in _as_list(v)) + ")")
        elif k == "__not__":
            sub.append(f"(NOT {cond_to_sql(v, colmap, mappings)})")
        else:
            sub.append(_leaf_sql(colmap, k, v, mappings))
    return "(" + " AND ".join(sub) + ")"


# --- rule application (ConfiguredProfile.processFeature analog) ---------------

def rule_match_column(rule: Rule, tags: Column, mappings: dict | None = None,
                      tags_name: str = "tags") -> Column:
    m = cond_to_column(rule.include_when, tags, mappings, tags_name)
    if rule.exclude_when:
        m = m & ~cond_to_column(rule.exclude_when, tags, mappings, tags_name)
    return m


def attr_column(a: AttrSpec, tags: Column, mappings: dict | None = None,
                tags_name: str = "tags") -> Column:
    """One attribute value -> Column: constant, `${ ... }` script
    (ConfigExpressionScript.java:23 — compiled to a codegen'd expression, no
    UDF), or tag copy via the typed getter (TagValueProducer)."""
    if a.tag_value:
        if mappings and a.tag_value in mappings:
            ik, typ = mappings[a.tag_value]
            return F.expr(convert_sql(f"{tags_name}['{ik}']", typ)).cast("string")
        return tags.getItem(a.tag_value)
    if cel.is_script(a.value):
        ref = spark_tag_ref(mappings or {}, tags_name)
        return F.expr(cel.script_sql(a.value, ref, "spark")).cast("string")
    if cel.is_escaped_script(a.value):
        return F.lit(cel.unescape(a.value))
    return F.lit(a.value)


def attr_sql(a: AttrSpec, colmap: dict[str, str],
             mappings: dict | None = None) -> str:
    """The same attribute for the DuckDB oracle (flat columns)."""
    if a.tag_value:
        ik, typ = (mappings or {}).get(a.tag_value, (a.tag_value, "string"))
        return f"CAST({convert_sql(colmap[ik], typ)} AS VARCHAR)"
    if cel.is_script(a.value):
        ref = duckdb_tag_ref(mappings or {}, colmap)
        return f"CAST({cel.script_sql(a.value, ref, 'duckdb')} AS VARCHAR)"
    if cel.is_escaped_script(a.value):
        return _sql_quote(cel.unescape(a.value))
    return _sql_quote(a.value)


def apply_profile(df: DataFrame, rules: list[Rule],
                  tags_col: str = "tags",
                  mappings: dict | None = None) -> DataFrame:
    """features -> matched (feature row, layer, min/max zoom, attrs map).
    Compiled as filtered unions (the MultiExpression index compiles away at
    the driver, SURVEY §4: Catalyst CSE keeps shared predicates cheap)."""
    tags = F.col(tags_col)
    parts = []
    for rule in rules:
        attr_pairs = []
        for a in rule.attributes:
            attr_pairs.extend([F.lit(a.key),
                               attr_column(a, tags, mappings, tags_col)])
        sel = (df.filter(rule_match_column(rule, tags, mappings, tags_col))
               .withColumn("layer", F.lit(rule.layer))
               .withColumn("min_zoom", F.lit(rule.min_zoom))
               .withColumn("max_zoom", F.lit(rule.max_zoom))
               .withColumn("attrs", F.create_map(*attr_pairs) if attr_pairs
                           else F.create_map()))
        parts.append(sel)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def apply_schema(df: DataFrame, schema: Schema,
                 tags_col: str = "tags") -> DataFrame:
    return apply_profile(df, schema.rules, tags_col, schema.tag_mappings)


# --- geometry dispatch (FeatureGeometry.java:11-38) ---------------------------

_GEOM_OUT_SCHEMA = ("id long, layer string, kind string, px double, py double, "
                    "emitted boolean")


def geometry_type_matches(geom_type_col: Column, required: str | None) -> Column:
    """GeometryType.featureTest analog: a `polygon_*` rule only accepts
    polygon features, etc.; None accepts anything."""
    if required is None:
        return F.lit(True)
    if required == "line":
        return geom_type_col.isin("line", "linestring")
    if required == "polygon":
        return geom_type_col.isin("polygon", "multipolygon")
    return geom_type_col == required


def transform_geometry(df: DataFrame, rules: list[Rule],
                       wkb_col: str = "geom_wkb",
                       type_col: str = "geom_type",
                       tags_col: str = "tags",
                       mappings: dict | None = None) -> DataFrame:
    """Apply each rule's FeatureGeometry transform to its matched features:
    point-emitting transforms (centroid / point_on_surface / innermost_point /
    line_midpoint / centroid_if_convex) run the geometry kernels inside an
    Arrow batch; pass-through geometries emit the original anchor. Output is
    one point row per (feature, rule) — `emitted=False` rows mark
    centroid_if_convex rejections (kept so counts reconcile).

    Reference: FeatureGeometry.java geometryFactory dispatch +
    FeatureCollector.java:96-325 (centroid:189, pointOnSurface:205,
    innermostPoint:214, centroidIfConvex:197 falls back to pointOnSurface for
    concave polygons)."""
    import pandas as pd
    from ..kernels import geom as gk

    tags = F.col(tags_col)
    parts = []
    for idx, rule in enumerate(rules):
        if rule.geometry == "split_line":
            # line-emitting transform, dispatched at the OSM source level by
            # split_line_ways() (needs way/node topology, not WKB)
            continue
        req, kernel = GEOMETRY_TRANSFORMS[rule.geometry]
        matched = (df.filter(rule_match_column(rule, tags, mappings, tags_col))
                   .filter(geometry_type_matches(F.col(type_col), req))
                   .select("id", F.lit(rule.layer).alias("layer"),
                           F.lit(rule.geometry).alias("kind"),
                           F.col(wkb_col).alias("wkbv"),
                           F.col(type_col).alias("typv")))
        parts.append((kernel, matched))

    def make_transform(kernel):
        def run(batches):
            for pdf in batches:
                rows = {k: [] for k in ("id", "layer", "kind", "px", "py", "emitted")}
                for r in pdf.itertuples(index=False):
                    typ, geom_parts = gk.parse_wkb(bytes(r.wkbv))
                    px, py, ok = _apply_point_kernel(gk, kernel, typ, geom_parts)
                    rows["id"].append(int(r.id))
                    rows["layer"].append(r.layer)
                    rows["kind"].append(r.kind)
                    rows["px"].append(px)
                    rows["py"].append(py)
                    rows["emitted"].append(ok)
                yield pd.DataFrame(rows)
        return run

    out = None
    for kernel, matched in parts:
        if kernel is None:
            sel = matched.mapInPandas(make_transform("centroid"), _GEOM_OUT_SCHEMA)
        else:
            sel = matched.mapInPandas(make_transform(kernel), _GEOM_OUT_SCHEMA)
        out = sel if out is None else out.unionByName(sel)
    return out


def _apply_point_kernel(gk, kernel: str, typ: str, parts):
    """(px, py, emitted) for one geometry. parse_wkb shapes: point -> (x,y),
    linestring -> (N,2) array, polygon -> [rings], multipolygon -> [[rings]]
    (first polygon used — the reference's centroid covers the whole
    collection; a one-polygon fixture keeps this exact)."""
    import numpy as np
    if typ == "point":
        return float(parts[0]), float(parts[1]), True
    if typ == "multipolygon":
        typ, parts = "polygon", parts[0]
    if typ == "linestring":
        line = parts
        if kernel == "midpoint":
            seg = np.sqrt(((line[1:] - line[:-1]) ** 2).sum(axis=1))
            total = seg.sum()
            if total == 0:
                return float(line[0][0]), float(line[0][1]), True
            half = total / 2.0
            acc = np.concatenate([[0.0], np.cumsum(seg)])
            i = int(np.searchsorted(acc, half) - 1)
            t = (half - acc[i]) / seg[i]
            p = line[i] + t * (line[i + 1] - line[i])
            return float(p[0]), float(p[1]), True
        if kernel == "line_interior":
            # JTS InteriorPointLine: interior vertex nearest the centroid,
            # endpoints considered only when there is no interior vertex
            cx, cy = gk.line_centroid(line)
            pts = line[1:-1] if len(line) > 2 else line
            d = (pts[:, 0] - cx) ** 2 + (pts[:, 1] - cy) ** 2
            i = int(np.argmin(d))
            return float(pts[i][0]), float(pts[i][1]), True
        cx, cy = gk.line_centroid(line)  # length-weighted (JTS semantics)
        return float(cx), float(cy), True
    # polygon
    rings = parts
    if kernel == "centroid":
        cx, cy = gk.polygon_centroid(rings)  # hole-aware (JTS semantics)
        return float(cx), float(cy), True
    if kernel == "centroid_if_convex":
        if gk.is_convex(rings[0]):
            cx, cy = gk.polygon_centroid(rings)
        else:  # FeatureCollector.centroidIfConvex falls back to pointOnSurface
            cx, cy = gk.point_on_surface(rings)
        return float(cx), float(cy), True
    if kernel in ("point_on_surface",):
        cx, cy = gk.point_on_surface(rings)
        return float(cx), float(cy), True
    if kernel == "innermost_point":
        cx, cy = gk.innermost_point(rings, tolerance=0.05)
        return float(cx), float(cy), True
    raise ValueError(f"unknown geometry kernel {kernel}")


def resolve_attrs_at_zoom(df: DataFrame, rules: list[Rule],
                          zoom_col: str = "zoom") -> DataFrame:
    """Zoom-gated attributes (util/ZoomFunction.java:13-45): after the zoom
    explode, null out attr values outside their [min_zoom, max_zoom] range."""
    z = F.col(zoom_col)
    gated = {}
    for rule in rules:
        for a in rule.attributes:
            if a.min_zoom is not None or a.max_zoom is not None:
                lo = a.min_zoom if a.min_zoom is not None else 0
                hi = a.max_zoom if a.max_zoom is not None else 14
                gated.setdefault(a.key, (lo, hi))
    out = df
    for key, (lo, hi) in gated.items():
        out = out.withColumn(
            "attrs",
            F.when(z.between(lo, hi), F.col("attrs"))
            .otherwise(F.map_filter(F.col("attrs"), lambda k, v: k != F.lit(key))))
    return out
