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


@dataclass
class AttrSpec:
    key: str
    value: str | None = None       # constant
    tag_value: str | None = None   # copy from this tag
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


def parse_profile(text: str) -> list[Rule]:
    doc = yaml.safe_load(text)
    rules = []
    for layer in doc.get("layers", []):
        for feat in layer.get("features", []):
            rules.append(Rule(
                layer=layer["id"],
                geometry=feat.get("geometry", "any"),
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
    return rules


# --- predicate compiler (BooleanExpressionParser.java:27 semantics) -----------

def _leaf_column(tags: Column, key: str, val) -> Column:
    """Null-safe leaf: a missing tag never matches (and never poisons a
    surrounding NOT with SQL three-valued NULL)."""
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


def cond_to_column(cond, tags: Column) -> Column:
    """YAML boolean tree -> Catalyst Column. A mapping is AND of its entries;
    `__any__` is OR; `__not__` negates; a list under `__any__`/`__all__`
    holds sub-trees."""
    if cond is None:
        return F.lit(True)
    sub = []
    for k, v in cond.items():
        if k == "__any__":
            parts = [cond_to_column(c, tags) for c in _as_list(v)]
            out = parts[0]
            for p in parts[1:]:
                out = out | p
            sub.append(out)
        elif k == "__all__":
            parts = [cond_to_column(c, tags) for c in _as_list(v)]
            out = parts[0]
            for p in parts[1:]:
                out = out & p
            sub.append(out)
        elif k == "__not__":
            sub.append(~cond_to_column(v, tags))
        else:
            sub.append(_leaf_column(tags, k, v))
    out = sub[0]
    for p in sub[1:]:
        out = out & p
    return out


def _as_list(v):
    return v if isinstance(v, list) else [v]


def _sql_quote(s: str) -> str:
    return "'" + str(s).replace("'", "''") + "'"


def _leaf_sql(colmap: dict[str, str], key: str, val) -> str:
    col = colmap[key]
    if val == "" or val is None:
        return f"{col} IS NOT NULL"
    if isinstance(val, list):
        return "(" + " OR ".join(_leaf_sql(colmap, key, x) for x in val) + ")"
    s = str(val)
    if s.startswith("%") and s.endswith("%") and len(s) > 2:
        return f"({col} IS NOT NULL AND position({_sql_quote(s[1:-1])} IN {col}) > 0)"
    return f"COALESCE({col} = {_sql_quote(s)}, FALSE)"


def cond_to_sql(cond, colmap: dict[str, str]) -> str:
    """Same tree -> ANSI SQL over flat columns (DuckDB oracle side)."""
    if cond is None:
        return "TRUE"
    sub = []
    for k, v in cond.items():
        if k == "__any__":
            sub.append("(" + " OR ".join(cond_to_sql(c, colmap) for c in _as_list(v)) + ")")
        elif k == "__all__":
            sub.append("(" + " AND ".join(cond_to_sql(c, colmap) for c in _as_list(v)) + ")")
        elif k == "__not__":
            sub.append(f"(NOT {cond_to_sql(v, colmap)})")
        else:
            sub.append(_leaf_sql(colmap, k, v))
    return "(" + " AND ".join(sub) + ")"


# --- rule application (ConfiguredProfile.processFeature analog) ---------------

def rule_match_column(rule: Rule, tags: Column) -> Column:
    m = cond_to_column(rule.include_when, tags)
    if rule.exclude_when:
        m = m & ~cond_to_column(rule.exclude_when, tags)
    return m


def apply_profile(df: DataFrame, rules: list[Rule],
                  tags_col: str = "tags") -> DataFrame:
    """features -> matched (feature row, layer, min/max zoom, attrs map).
    Compiled as filtered unions (the MultiExpression index compiles away at
    the driver, SURVEY §4: Catalyst CSE keeps shared predicates cheap)."""
    tags = F.col(tags_col)
    parts = []
    for rule in rules:
        attr_pairs = []
        for a in rule.attributes:
            v = tags.getItem(a.tag_value) if a.tag_value else F.lit(a.value)
            attr_pairs.extend([F.lit(a.key), v])
        sel = (df.filter(rule_match_column(rule, tags))
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
