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

Boolean YAML combinators: `__any__`, `__all__`, `__not__`. A mapping's
entries combine with OR by default (BooleanExpressionParser.java:78-80 —
`parse(object)` collects with `Expression::or`); use `__all__` for AND.

The compiler emits the SAME predicate tree two ways:
  - `cond_to_column` -> a Catalyst Column over a `tags: map<string,string>`
    column (constant folding / CSE / pushdown are free, SURVEY §4), and
  - `cond_to_sql`    -> ANSI SQL over flat columns (for the DuckDB oracle),
so rule matching is verified cross-engine bit-for-bit.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import cel

# Extra CEL environment variables (name -> (sql, type)) merged into every
# compiled script. The validator injects {"feature.area": ("__area_m2",
# "num")} here while it runs (each example row carries its precomputed
# spherical area); production flows leave it empty.
CEL_EXTRA_VARS: dict = {}


def _cel_vars(match_vars: dict | None = None) -> dict | None:
    merged = {**CEL_EXTRA_VARS, **(match_vars or {})}
    return merged or None


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
    # conditional attributes (configschema/AttributeDefinition.java:8-21):
    # emit the value only when include_when/exclude_when hold, else emit
    # `else` (or omit the attribute entirely when no `else` is given)
    include_when: dict | None = None
    exclude_when: dict | None = None
    else_value: str | None = None
    # `type:` — either `match_key`/`match_value` (ConfiguredFeature.java:235:
    # the include_when tag key/value that caused the feature to match) or a
    # data-type conversion name for convert_sql
    typ: str | None = None


@dataclass
class Rule:
    layer: str
    geometry: str = "any"
    # FeatureItem `source` — which input source this rule consumes (None =
    # any); the validator matches it against each example's input.source
    source: str | None = None
    min_zoom: int = 0
    max_zoom: int = 14
    # FeatureItem min_zoom `{default_value, overrides: {zoom: cond}}` form
    # (ConfigExpressionParser.java:93-96 + parseMatch:137-146: ORDERED match,
    # first condition that holds wins, else default_value). Stored as
    # [(zoom, cond-tree)] in YAML order; min_zoom holds the default.
    min_zoom_overrides: list = field(default_factory=list)
    # FeatureItem min_size -> FeatureCollector.setMinPixelSize (default 1px
    # below maxzoom; validator compares it when a spec asserts min_size)
    min_size: float | None = None
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
            src = feat.get("source")
            if isinstance(src, list):
                src = src[0] if len(src) == 1 else None  # multi-source = any
            def _zoom(v, default):
                # FeatureItem min_zoom/max_zoom may also be an expression —
                # unsupported forms fall back to the default
                return int(v) if isinstance(v, (int, float)) else default
            mz, mz_overrides = feat.get("min_zoom"), []
            if (isinstance(mz, dict)
                    and set(mz) == {"default_value", "overrides"}):
                mz_overrides = [(int(z), cond)
                                for z, cond in (mz["overrides"] or {}).items()]
                mz = mz.get("default_value")
            rules.append(Rule(
                layer=layer["id"],
                geometry=geom,
                source=src,
                min_zoom=_zoom(mz, 0),
                min_zoom_overrides=mz_overrides,
                max_zoom=_zoom(feat.get("max_zoom"), 14),
                min_size=(float(feat["min_size"])
                          if feat.get("min_size") is not None else None),
                include_when=feat.get("include_when"),
                exclude_when=feat.get("exclude_when"),
                attributes=[AttrSpec(
                    key=a["key"], value=a.get("value"),
                    tag_value=a.get("tag_value"),
                    min_zoom=(a.get("min_zoom")
                              if isinstance(a.get("min_zoom"), int) else None),
                    max_zoom=(a.get("max_zoom")
                              if isinstance(a.get("max_zoom"), int) else None),
                    include_when=a.get("include_when"),
                    exclude_when=a.get("exclude_when"),
                    else_value=a.get("else"),
                    typ=a.get("type"),
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
        # translate strips grouping commas first (Parse.retryParseNumber:54
        # falls back to NumberFormat, which accepts "123,123")
        return (f"CAST(nullif(regexp_extract(translate({expr}, ',', ''),"
                " '^(-?[0-9]+)', 1), '') AS BIGINT)")
    if typ == "double":
        return (f"CAST(nullif(regexp_extract(translate({expr}, ',', ''),"
                " '^(-?[0-9]+[.]?[0-9]*)', 1), '') AS DOUBLE)")
    if typ == "boolean":
        return (f"(CASE WHEN {expr} IS NULL THEN NULL "
                f"WHEN {expr} IN ('no', 'false', '0') THEN FALSE ELSE TRUE END)")
    if typ == "direction":
        return (f"(CASE WHEN {expr} IN ('-1', 'backward', 'down') THEN -1 "
                f"WHEN {expr} IN ('1', 'yes', 'true', 'forward', 'up') THEN 1 "
                f"ELSE 0 END)")
    raise ValueError(f"unknown tag_mappings type {typ!r}")


def convert_column(col: Column, typ: str) -> Column:
    """convert_sql's Column-side twin, for values already materialized as a
    Column (structured `{type: ..., value: ...}` expressions)."""
    if typ in ("string", "get_tag", None):
        return col
    s = F.translate(col, ",", "")
    if typ in ("long", "integer"):
        v = F.regexp_extract(s, "^(-?[0-9]+)", 1)
        return F.when(v == "", F.lit(None)).otherwise(v).cast("bigint")
    if typ == "double":
        v = F.regexp_extract(s, "^(-?[0-9]+[.]?[0-9]*)", 1)
        return F.when(v == "", F.lit(None)).otherwise(v).cast("double")
    if typ == "boolean":
        return (F.when(col.isNull(), F.lit(None).cast("boolean"))
                .when(col.isin("no", "false", "0"), F.lit(False))
                .otherwise(F.lit(True)))
    if typ == "direction":
        return (F.when(col.isin("-1", "backward", "down"), F.lit(-1))
                .when(col.isin("1", "yes", "true", "forward", "up"), F.lit(1))
                .otherwise(F.lit(0)))
    raise ValueError(f"unknown type {typ!r}")


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
    # NOTE: a boolean leaf (e.g. `tunnel: true`) is an EXACT string match on
    # its canonical spelling (Expression.MatchAny.from:404-423 stringifies
    # with String.valueOf -> "true"/"false"); canon_tag below mirrors that.
    # The presence/missing checks read the MAPPED input tag when the key has a
    # tag_mapping rename (TagValueProducer.java:34-41: the getter reads the
    # `input:` tag, not the output key), same as the typed-comparison branch.
    ik = mappings[key][0] if (mappings and key in mappings) else key
    if _is_any(val):
        return tags.getItem(ik).isNotNull()
    if val == "":
        # matchWhenMissing (Expression.java:423,485): `key: ""` matches
        # features where the tag is missing or empty
        v = tags.getItem(ik)
        return v.isNull() | (v == "")
    if mappings and key in mappings:
        ik, typ = mappings[key]
        conv = convert_sql(f"{tags_name}['{ik}']", typ)
        if isinstance(val, list):
            parts = [_leaf_column(tags, key, x, mappings, tags_name) for x in val]
            out = parts[0]
            for p in parts[1:]:
                out = out | p
            return out
        lit = str(val) if _typ_label(typ) == "num" else f"'{canon_tag(val)}'"
        if _typ_label(typ) == "bool":
            lit = "TRUE" if str(val).lower() in ("true", "yes", "1") else "FALSE"
        return F.expr(f"COALESCE(({conv}) = {lit}, FALSE)")
    v = tags.getItem(key)
    if isinstance(val, list):
        parts = [_leaf_column(tags, key, x) for x in val]
        out = parts[0]
        for p in parts[1:]:
            out = out | p
        return out
    s = canon_tag(val)
    rx = _wildcard_regex(s)
    if rx is not None:
        return F.coalesce(v.rlike(rx), F.lit(False))
    return F.coalesce(v == s, F.lit(False))


def cond_to_column(cond, tags: Column, mappings: dict | None = None,
                   tags_name: str = "tags") -> Column:
    """YAML boolean tree -> Catalyst Column. A mapping is OR of its entries
    (BooleanExpressionParser.java:78-80: the default collector is
    Expression::or); `__all__` ANDs its children; `__not__` negates; a list
    under `__any__`/`__all__` holds sub-trees. `__all__` may also hold a
    mapping, whose entries are then ANDed (tagCriterionToExpression:108).
    A bare string condition is `__any__` (always true) or a `${...}` boolean
    script; a list ORs its members (BooleanExpressionParser.parse:83-94)."""
    if cond is None:
        return F.lit(True)
    if isinstance(cond, str):
        if cond.strip().lower() == "__any__":
            return F.lit(True)
        if cel.is_script(cond):
            ref = spark_tag_ref(mappings or {}, tags_name)
            sql = cel.script_sql(cond, ref, 'spark', _cel_vars())
            return F.expr(f"COALESCE(({sql}), FALSE)")
        raise ValueError(f"unsupported condition string {cond!r}")
    if isinstance(cond, list):
        parts = [cond_to_column(c, tags, mappings, tags_name) for c in cond]
        out = parts[0]
        for p in parts[1:]:
            out = out | p
        return out
    sub = []
    for k, v in cond.items():
        if k == "__any__":
            parts = [cond_to_column(c, tags, mappings, tags_name) for c in _as_list(v)]
            out = parts[0]
            for p in parts[1:]:
                out = out | p
            sub.append(out)
        elif k == "__all__":
            if isinstance(v, dict):
                parts = [_group_column(kk, vv, tags, mappings, tags_name)
                         for kk, vv in v.items()]
            else:
                parts = [cond_to_column(c, tags, mappings, tags_name)
                         for c in _as_list(v)]
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
        out = out | p
    return out


def _group_column(k, v, tags, mappings, tags_name) -> Column:
    """One mapping entry as a sub-expression (used when a mapping's entries
    must be combined with AND under `__all__`)."""
    if k in ("__any__", "__all__", "__not__"):
        return cond_to_column({k: v}, tags, mappings, tags_name)
    return _leaf_column(tags, k, v, mappings, tags_name)


def _as_list(v):
    return v if isinstance(v, list) else [v]


def _is_any(val) -> bool:
    """`__any__` wildcard value (BooleanExpressionParser.java:33 IS_ANY):
    match any feature that has the key at all. A null value means the same
    (BooleanExpressionParser.java:117: `value == null || IS_ANY.test(...)`).
    NOTE: an explicit empty string is NOT this — `key: ""` matches when the
    tag is MISSING or empty (Expression.java:423 matchWhenMissing)."""
    if val is None:
        return True
    return isinstance(val, str) and val.strip().lower() == "__any__"


def _esc(s: str) -> str:
    return str(s).replace("'", "''")


_WILDCARD_RE = re.compile(r"(?<!\\)%")


def _wildcard_regex(s: str) -> str | None:
    """planetiler `%` wildcards -> anchored regex (Expression.java:416,
    wildcardToRegex:433-459: unescaped `%` spans anything, `\\%` is a
    literal percent). Returns None when the value has no wildcard."""
    if not _WILDCARD_RE.search(s):
        return None
    parts = _WILDCARD_RE.split(s)
    return "^" + ".*".join(re.escape(p.replace("\\%", "%")) for p in parts) + "$"


def _sql_quote(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def _leaf_sql(colmap: dict[str, str], key: str, val,
              mappings: dict | None = None) -> str:
    ik = mappings[key][0] if (mappings and key in mappings) else key
    if _is_any(val):
        return f"{colmap[ik]} IS NOT NULL"
    if val == "":
        # matchWhenMissing: tag missing or empty (reads the mapped input tag,
        # TagValueProducer.java:34-41 — keep in lockstep with _leaf_column)
        return f"({colmap[ik]} IS NULL OR {colmap[ik]} = '')"
    if mappings and key in mappings:
        ik, typ = mappings[key]
        conv = convert_sql(colmap[ik], typ)
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
    if isinstance(val, list):
        return "(" + " OR ".join(_leaf_sql(colmap, key, x) for x in val) + ")"
    s = canon_tag(val)
    if s.startswith("%") and s.endswith("%") and len(s) > 2 and "%" not in s[1:-1]:
        return f"({col} IS NOT NULL AND position({_sql_quote(s[1:-1])} IN {col}) > 0)"
    rx = _wildcard_regex(s)
    if rx is not None:
        # regexp_matches (not regexp_extract(...) <> ''): an empty whole-match
        # (e.g. pattern `^.*$` on an empty tag value) IS a match — Spark's
        # rlike says TRUE, and the extracted-text comparison would say FALSE,
        # a cross-engine gate hash mismatch waiting to happen.
        return f"COALESCE(regexp_matches({col}, {_sql_quote(rx)}), FALSE)"
    return f"COALESCE({col} = {_sql_quote(s)}, FALSE)"


def cond_to_sql(cond, colmap: dict[str, str], mappings: dict | None = None) -> str:
    """Same tree -> ANSI SQL over flat columns (DuckDB oracle side). Mapping
    entries OR by default, exactly as cond_to_column."""
    if cond is None:
        return "TRUE"
    if isinstance(cond, str):
        if cond.strip().lower() == "__any__":
            return "TRUE"
        if cel.is_script(cond):
            ref = duckdb_tag_ref(mappings or {}, colmap)
            sql = cel.script_sql(cond, ref, 'duckdb', _cel_vars())
            return f"COALESCE(({sql}), FALSE)"
        raise ValueError(f"unsupported condition string {cond!r}")
    if isinstance(cond, list):
        return "(" + " OR ".join(cond_to_sql(c, colmap, mappings)
                                 for c in cond) + ")"
    sub = []
    for k, v in cond.items():
        if k == "__any__":
            sub.append("(" + " OR ".join(cond_to_sql(c, colmap, mappings) for c in _as_list(v)) + ")")
        elif k == "__all__":
            if isinstance(v, dict):
                parts = [_group_sql(kk, vv, colmap, mappings)
                         for kk, vv in v.items()]
            else:
                parts = [cond_to_sql(c, colmap, mappings) for c in _as_list(v)]
            sub.append("(" + " AND ".join(parts) + ")")
        elif k == "__not__":
            sub.append(f"(NOT {cond_to_sql(v, colmap, mappings)})")
        else:
            sub.append(_leaf_sql(colmap, k, v, mappings))
    return "(" + " OR ".join(sub) + ")"


def _group_sql(k, v, colmap, mappings) -> str:
    if k in ("__any__", "__all__", "__not__"):
        return cond_to_sql({k: v}, colmap, mappings)
    return _leaf_sql(colmap, k, v, mappings)


# --- rule application (ConfiguredProfile.processFeature analog) ---------------

def min_zoom_column(rule: Rule, tags: Column, mappings: dict | None = None,
                    tags_name: str = "tags") -> Column:
    """Per-feature min_zoom: the FIRST matching override wins (ordered match,
    ConfigExpressionParser.parseMatch:137-146), else the default."""
    if not rule.min_zoom_overrides:
        return F.lit(rule.min_zoom)
    out = None
    for z, cond in rule.min_zoom_overrides:
        c = cond_to_column(cond, tags, mappings, tags_name)
        out = F.when(c, F.lit(z)) if out is None else out.when(c, F.lit(z))
    return out.otherwise(F.lit(rule.min_zoom))


def rule_match_column(rule: Rule, tags: Column, mappings: dict | None = None,
                      tags_name: str = "tags") -> Column:
    m = cond_to_column(rule.include_when, tags, mappings, tags_name)
    if rule.exclude_when:
        m = m & ~cond_to_column(rule.exclude_when, tags, mappings, tags_name)
    return m


def _match_leaves(cond) -> list[tuple[str, object]]:
    """Ordered (tag key, leaf value) pairs of a boolean tree — the candidate
    `match_key` sources (the reference's MultiExpression match keys)."""
    out: list[tuple[str, object]] = []
    if cond is None:
        return out
    for k, v in cond.items():
        if k in ("__any__", "__all__"):
            for c in _as_list(v):
                out.extend(_match_leaves(c))
        elif k == "__not__":
            continue  # a negated leaf never *causes* a match
        else:
            out.append((k, v))
    return out


def match_key_column(rule: Rule, tags: Column, mappings: dict | None = None,
                     tags_name: str = "tags") -> Column:
    """`${match_key}` (Contexts.java:448-454): the first include_when tag key
    whose leaf matched this feature, as a CASE expression (no UDF)."""
    out = None
    for k, v in _match_leaves(rule.include_when):
        ik = (mappings or {}).get(k, (k, None))[0]
        c = _leaf_column(tags, k, v, mappings, tags_name)
        out = F.when(c, F.lit(ik)) if out is None else out.when(c, F.lit(ik))
    return out if out is not None else F.lit(None).cast("string")


class _SparkTagsColmap(dict):
    """colmap view of a map<string,string> tags column, so the _leaf_sql text
    compiler serves the Spark side too (key -> tags['key'])."""

    def __init__(self, tags_name: str):
        super().__init__()
        self.tags_name = tags_name

    def __missing__(self, key):
        return f"{self.tags_name}['{_esc(key)}']"


def match_vars_sql(rule: Rule, colmap: dict, mappings: dict | None = None
                   ) -> dict[str, tuple[str, str]]:
    """`match_key`/`match_value` as SQL CASE text over `colmap` columns, for
    embedding inside compiled CEL scripts (cel.Env.vars)."""
    key_whens, val_whens = [], []
    for k, v in _match_leaves(rule.include_when):
        ik = (mappings or {}).get(k, (k, None))[0]
        cond = _leaf_sql(colmap, k, v, mappings)
        key_whens.append(f"WHEN {cond} THEN '{_esc(ik)}'")
        val_whens.append(f"WHEN {cond} THEN {colmap[ik]}")
    if not key_whens:
        return {"match_key": ("NULL", "str"), "match_value": ("NULL", "str")}
    return {
        "match_key": ("(CASE " + " ".join(key_whens) + " END)", "str"),
        "match_value": ("(CASE " + " ".join(val_whens) + " END)", "str"),
    }


_DEFAULTISH = re.compile(r"^_*(default_value|otherwise|default)_*$")


def _tag_copy_column(key: str, typ: str | None, mappings: dict | None,
                     tags_name: str) -> Column:
    """Typed tag copy (TagValueProducer): honors tag_mappings renames, then
    an attribute-level `type` conversion."""
    if mappings and key in mappings:
        ik, mtyp = mappings[key]
        return F.expr(convert_sql(f"{tags_name}['{_esc(ik)}']", mtyp)).cast("string")
    if typ and typ not in ("match_key", "match_value"):
        return F.expr(convert_sql(f"{tags_name}['{_esc(key)}']", typ)).cast("string")
    return F.expr(f"{tags_name}['{_esc(key)}']")


def value_column(obj, tags: Column, mappings: dict | None = None,
                 tags_name: str = "tags", rule: Rule | None = None) -> Column:
    """ConfigExpressionParser.parse value forms (ConfigExpressionParser.java:
    70-115) -> Column: scalar constants, `${...}` scripts, `{coalesce: [...]}`,
    `{tag_value: k}`, `{value: x}`, `{type: t, ...}` casts, `{match: ...}` /
    `{default_value, overrides}` / bare match maps+lists (parseMatch:118-150:
    ORDERED, first condition wins)."""
    if obj is None:
        return F.lit(None).cast("string")
    if cel.is_script(obj):
        ref = spark_tag_ref(mappings or {}, tags_name)
        vars = _cel_vars(match_vars_sql(rule, _SparkTagsColmap(tags_name),
                                        mappings) if rule is not None else None)
        return F.expr(cel.script_sql(obj, ref, "spark", vars)).cast("string")
    if cel.is_escaped_script(obj):
        return F.lit(cel.unescape(obj))
    if isinstance(obj, dict):
        keys = set(obj)
        if "type" in keys and keys != {"type"}:
            rest = {k: v for k, v in obj.items() if k != "type"}
            inner = rest if len(rest) > 1 else next(iter(rest.values()))
            if len(rest) == 1 and next(iter(rest)) in ("value", "tag_value"):
                inner = rest  # keep the wrapper's meaning
            col = value_column(inner, tags, mappings, tags_name, rule)
            return convert_column(col, str(obj["type"])).cast("string")
        if keys == {"coalesce"} and isinstance(obj["coalesce"], list):
            return F.coalesce(*[value_column(i, tags, mappings, tags_name, rule)
                                for i in obj["coalesce"]])
        if keys == {"tag_value"}:
            return _tag_copy_column(str(obj["tag_value"]), None, mappings,
                                    tags_name)
        if keys == {"value"}:
            return value_column(obj["value"], tags, mappings, tags_name, rule)
        if keys == {"default_value", "overrides"}:
            return _match_value_column(obj["overrides"], obj["default_value"],
                                       tags, mappings, tags_name, rule)
        if keys == {"match"}:
            return _match_value_column(obj["match"], None, tags, mappings,
                                       tags_name, rule)
        return _match_value_column(obj, None, tags, mappings, tags_name, rule)
    if isinstance(obj, list):
        return _match_value_column(obj, None, tags, mappings, tags_name, rule)
    return F.lit(canon_tag(obj))


def _match_value_column(match, default, tags, mappings, tags_name,
                        rule) -> Column:
    """parseMatch (ConfigExpressionParser.java:118-150): a list of
    `{if, value}` cases (+ trailing `{else}`), or a map of `value: condition`
    entries where a condition spelled `default_value`/`otherwise`/`default`
    marks the fallback. First matching condition wins."""
    whens = []
    if isinstance(match, list):
        for item in match:
            if not isinstance(item, dict):
                continue
            if set(item) == {"if", "value"}:
                whens.append((cond_to_column(item["if"], tags, mappings, tags_name),
                              value_column(item["value"], tags, mappings,
                                           tags_name, rule)))
            elif set(item) == {"else"}:
                default = item["else"]
                break
    elif isinstance(match, dict):
        for val, cond in match.items():
            if isinstance(cond, str) and _DEFAULTISH.match(cond.strip()):
                default = val
            else:
                whens.append((cond_to_column(cond, tags, mappings, tags_name),
                              value_column(val, tags, mappings, tags_name,
                                           rule)))
    out = None
    for c, v in whens:
        out = F.when(c, v) if out is None else out.when(c, v)
    dflt = value_column(default, tags, mappings, tags_name, rule)
    return dflt if out is None else out.otherwise(dflt)


def _attr_value_column(a: AttrSpec, tags: Column, mappings: dict | None,
                       tags_name: str, rule: Rule | None) -> Column:
    if a.typ == "match_key" and rule is not None:
        return match_key_column(rule, tags, mappings, tags_name)
    if a.typ == "match_value" and rule is not None:
        return tags.getItem(match_key_column(rule, tags, mappings, tags_name))
    if a.tag_value:
        return _tag_copy_column(a.tag_value, a.typ, mappings, tags_name)
    if a.value is None:
        # key-only attribute: implicit copy of the tag with the same name
        # (ConfiguredFeature attribute with neither value nor tag_value)
        return _tag_copy_column(a.key, a.typ, mappings, tags_name)
    base = value_column(a.value, tags, mappings, tags_name, rule)
    if a.typ and a.typ not in ("match_key", "match_value"):
        # attribute-level `type:` also coerces computed `value:` producers
        # (ConfiguredFeature attributeValueProducer wraps the whole
        # expression in a TypeConversion cast, not just tag copies)
        return convert_column(base, a.typ).cast("string")
    return base


def attr_column(a: AttrSpec, tags: Column, mappings: dict | None = None,
                tags_name: str = "tags", rule: Rule | None = None) -> Column:
    """One attribute value -> Column: constant, `${ ... }` script
    (ConfigExpressionScript.java:23 — compiled to a codegen'd expression, no
    UDF), tag copy via the typed getter (TagValueProducer), match_key/value
    capture, or a conditional value (include_when/exclude_when/else:
    AttributeDefinition.java:8-21) — a NULL result means "omit this attr".
    ConfiguredFeature.java:328-339 ordering: empty-string results become null,
    and the `else` fallback applies whenever the value is null — even when
    the condition matched but the producer yielded nothing."""
    base = _attr_value_column(a, tags, mappings, tags_name, rule)
    base = F.when(base == "", F.lit(None)).otherwise(base)
    if a.include_when is not None or a.exclude_when is not None:
        cond = cond_to_column(a.include_when, tags, mappings, tags_name)
        if a.exclude_when:
            cond = cond & ~cond_to_column(a.exclude_when, tags, mappings,
                                          tags_name)
        base = F.when(cond, base)
    if a.else_value is not None:
        return F.coalesce(base, F.lit(canon_tag(a.else_value)))
    return base


def canon_tag(v) -> str | None:
    """Canonical string form of a typed YAML tag value, shared by the schema
    compiler and the validator so both sides of a comparison stringify
    identically (booleans lowercase and doubles formatted like Java's
    String.valueOf — Spark's double->string cast follows Double.toString)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v.is_integer() and abs(v) < 1e7:
            return str(int(v))
        return _java_double_str(v)
    return str(v)


def _java_double_str(v: float) -> str:
    """Java Double.toString: plain decimal for 1e-3 <= |v| < 1e7, otherwise
    `d.dddEn` scientific notation with one digit before the point."""
    from decimal import Decimal
    if v != v or v in (float("inf"), float("-inf")):
        return str(v)
    a = abs(v)
    if a != 0 and (a < 1e-3 or a >= 1e7):
        sign, digits, exp = Decimal(repr(a)).as_tuple()
        ds = "".join(map(str, digits)).rstrip("0") or "0"
        e = len(digits) + exp - 1
        mant = ds[0] + "." + (ds[1:] or "0")
        return ("-" if v < 0 else "") + mant + "E" + str(e)
    s = repr(v)
    if "." not in s and "e" not in s and "E" not in s:
        s += ".0"
    return s


def _tag_copy_sql(key: str, typ: str | None, colmap: dict,
                  mappings: dict | None) -> str:
    if mappings and key in mappings:
        ik, mtyp = mappings[key]
        return f"CAST({convert_sql(colmap[ik], mtyp)} AS VARCHAR)"
    if typ and typ not in ("match_key", "match_value"):
        return f"CAST({convert_sql(colmap[key], typ)} AS VARCHAR)"
    return colmap[key]


def value_sql(obj, colmap: dict, mappings: dict | None = None,
              rule: Rule | None = None) -> str:
    """value_column's DuckDB-oracle twin — same ConfigExpression forms."""
    if obj is None:
        return "NULL"
    if cel.is_script(obj):
        ref = duckdb_tag_ref(mappings or {}, colmap)
        vars = _cel_vars(match_vars_sql(rule, colmap, mappings)
                         if rule is not None else None)
        return f"CAST({cel.script_sql(obj, ref, 'duckdb', vars)} AS VARCHAR)"
    if cel.is_escaped_script(obj):
        return _sql_quote(cel.unescape(obj))
    if isinstance(obj, dict):
        keys = set(obj)
        if "type" in keys and keys != {"type"}:
            rest = {k: v for k, v in obj.items() if k != "type"}
            inner = rest if len(rest) > 1 else next(iter(rest.values()))
            if len(rest) == 1 and next(iter(rest)) in ("value", "tag_value"):
                inner = rest
            base = value_sql(inner, colmap, mappings, rule)
            return f"CAST({convert_sql(base, str(obj['type']))} AS VARCHAR)"
        if keys == {"coalesce"} and isinstance(obj["coalesce"], list):
            return ("COALESCE(" + ", ".join(
                value_sql(i, colmap, mappings, rule)
                for i in obj["coalesce"]) + ")")
        if keys == {"tag_value"}:
            return _tag_copy_sql(str(obj["tag_value"]), None, colmap, mappings)
        if keys == {"value"}:
            return value_sql(obj["value"], colmap, mappings, rule)
        if keys == {"default_value", "overrides"}:
            return _match_value_sql(obj["overrides"], obj["default_value"],
                                    colmap, mappings, rule)
        if keys == {"match"}:
            return _match_value_sql(obj["match"], None, colmap, mappings, rule)
        return _match_value_sql(obj, None, colmap, mappings, rule)
    if isinstance(obj, list):
        return _match_value_sql(obj, None, colmap, mappings, rule)
    return _sql_quote(canon_tag(obj))


def _match_value_sql(match, default, colmap, mappings, rule) -> str:
    whens = []
    if isinstance(match, list):
        for item in match:
            if not isinstance(item, dict):
                continue
            if set(item) == {"if", "value"}:
                whens.append((cond_to_sql(item["if"], colmap, mappings),
                              value_sql(item["value"], colmap, mappings, rule)))
            elif set(item) == {"else"}:
                default = item["else"]
                break
    elif isinstance(match, dict):
        for val, cond in match.items():
            if isinstance(cond, str) and _DEFAULTISH.match(cond.strip()):
                default = val
            else:
                whens.append((cond_to_sql(cond, colmap, mappings),
                              value_sql(val, colmap, mappings, rule)))
    dflt = value_sql(default, colmap, mappings, rule)
    if not whens:
        return dflt
    body = " ".join(f"WHEN {c} THEN {v}" for c, v in whens)
    return f"(CASE {body} ELSE {dflt} END)"


def attr_sql(a: AttrSpec, colmap: dict[str, str],
             mappings: dict | None = None, rule: Rule | None = None) -> str:
    """The same attribute for the DuckDB oracle (flat columns)."""
    if a.typ in ("match_key", "match_value") and rule is not None:
        base = match_vars_sql(rule, colmap, mappings)[a.typ][0]
    elif a.tag_value:
        base = _tag_copy_sql(a.tag_value, a.typ, colmap, mappings)
    elif a.value is None:
        base = _tag_copy_sql(a.key, a.typ, colmap, mappings)
    else:
        base = value_sql(a.value, colmap, mappings, rule)
        if a.typ and a.typ not in ("match_key", "match_value"):
            base = f"CAST({convert_sql(base, a.typ)} AS VARCHAR)"
    # ConfiguredFeature.java:328-339: "" -> null, then the `else` fallback
    # fills ANY null (mirrors attr_column exactly for oracle parity)
    base = f"NULLIF({base}, '')"
    if a.include_when is not None or a.exclude_when is not None:
        cond = cond_to_sql(a.include_when, colmap, mappings)
        if a.exclude_when:
            cond = (f"({cond} AND NOT "
                    f"{cond_to_sql(a.exclude_when, colmap, mappings)})")
        base = f"(CASE WHEN {cond} THEN {base} END)"
    if a.else_value is not None:
        return f"COALESCE({base}, {_sql_quote(canon_tag(a.else_value))})"
    return base


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
                               attr_column(a, tags, mappings, tags_col, rule)])
        # NULL attr values mean "omit" (conditional attrs with no else)
        attrs_col = (F.map_filter(F.create_map(*attr_pairs),
                                  lambda k, v: v.isNotNull())
                     if attr_pairs else F.create_map())
        sel = (df.filter(rule_match_column(rule, tags, mappings, tags_col))
               .withColumn("layer", F.lit(rule.layer))
               .withColumn("min_zoom",
                           min_zoom_column(rule, tags, mappings, tags_col))
               .withColumn("max_zoom", F.lit(rule.max_zoom))
               .withColumn("attrs", attrs_col))
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
