"""Handler-composition profile API — the ForwardingProfile analog.

Reference: ForwardingProfile.java:44-173 composes a profile from registered
per-layer handlers: FeatureProcessors with filter expressions (dispatched
through a MultiExpression index), per-layer post-processors, tile
post-processors, finish callbacks, and only_layers/exclude_layers selection
with a dependsOnLayer exemption map (OpenMapTilesProfile is the canonical
user).

Spark-first shape: a handler's `process` is a DataFrame TRANSFORMATION, so
"dispatch via the multi-expression index" compiles to filtered unions that
Catalyst CSEs/prunes (the same driver-side compilation as
plans/profile.apply_profile), and post-processors are DataFrame->DataFrame
stages appended per layer — declarative plan composition, not per-feature
callbacks."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class LayerHandler:
    """One layer's processing unit (ForwardingProfile.HandlerForLayer +
    FeatureProcessor + optional LayerPostProcessor).

    - `matches(tags) -> Column`: which source features this handler consumes
      (None = all, like registerSourceHandler with a match-everything filter)
    - `process(df) -> DataFrame`: emitted feature rows for this layer
    - `post_process(df) -> DataFrame`: per-layer post-processing before tile
      encoding (LayerPostProcessor.postProcess)
    """
    name: str
    process: Callable[[DataFrame], DataFrame]
    matches: Callable[[Column], Column] | None = None
    post_process: Callable[[DataFrame], DataFrame] | None = None


@dataclass
class ForwardingProfile:
    """Composable profile: register handlers, then `process(features)` builds
    ONE unioned plan over all selected layers.

    only_layers / exclude_layers mirror the config arguments
    (ForwardingProfile.java:59-61); depends_on maps dependent layer ->
    dependency layers so selecting a dependent keeps its dependencies
    registered (dependsOnLayer:105-118)."""
    only_layers: list[str] = field(default_factory=list)
    exclude_layers: list[str] = field(default_factory=list)
    depends_on: dict[str, list[str]] = field(default_factory=dict)
    handlers: list[LayerHandler] = field(default_factory=list)
    tile_post_processors: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    finish_handlers: list[Callable[[str], None]] = field(default_factory=list)

    def cares_about_layer(self, layer: str) -> bool:
        """ForwardingProfile.caresAboutLayer:85-97: selected directly, or a
        dependency of some selected layer."""
        selected = ((not self.only_layers or layer in self.only_layers)
                    and layer not in self.exclude_layers)
        if selected:
            return True
        for dependent, deps in self.depends_on.items():
            if layer in deps and self.cares_about_layer(dependent):
                return True
        return False

    def register_handler(self, handler: LayerHandler) -> bool:
        """Registers unless only/exclude rules out the layer (and nothing
        depends on it); returns whether it was kept."""
        if not self.cares_about_layer(handler.name):
            return False
        self.handlers.append(handler)
        return True

    def register_tile_post_processor(self, fn: Callable[[DataFrame], DataFrame]):
        self.tile_post_processors.append(fn)

    def register_finish_handler(self, fn: Callable[[str], None]):
        self.finish_handlers.append(fn)

    def process(self, features: DataFrame, tags_col: str = "tags") -> DataFrame:
        """All handlers over one source -> unioned per-layer feature rows
        (each handler's output gains a `layer` column; a feature matching
        several handlers lands in several layers, exactly like the reference's
        indexed dispatch calling every matching FeatureProcessor)."""
        if not self.handlers:
            raise ValueError("no handlers registered")
        tags = F.col(tags_col)
        parts = []
        for h in self.handlers:
            matched = features.filter(h.matches(tags)) if h.matches else features
            out = h.process(matched).withColumn("layer", F.lit(h.name))
            if h.post_process is not None:
                out = h.post_process(out)
            parts.append(out)
        result = parts[0]
        for p in parts[1:]:
            # layers may emit different columns (post-processors add their
            # own); missing columns null-fill like the reference's per-layer
            # attribute maps
            result = result.unionByName(p, allowMissingColumns=True)
        for tp in self.tile_post_processors:
            result = tp(result)
        return result

    def finish(self, source_name: str):
        """FinishHandler callbacks after a source completes
        (ForwardingProfile.finish)."""
        for fn in self.finish_handlers:
            fn(source_name)


def from_schema(schema, geometry: bool = False) -> ForwardingProfile:
    """Bridge: compile a parsed YAML Schema (plans/profile.parse_schema) into
    a ForwardingProfile — each rule becomes a LayerHandler whose `matches` is
    the rule's boolean tree and whose `process` attaches the rule's
    attributes (ConfiguredProfile is itself a ForwardingProfile in the
    reference)."""
    from . import profile as pr

    fp = ForwardingProfile()
    for rule in schema.rules:
        def make(rule=rule):
            def matches(tags):
                return pr.rule_match_column(rule, tags, schema.tag_mappings)

            def process(df):
                attr_pairs = []
                for a in rule.attributes:
                    attr_pairs.extend([F.lit(a.key),
                                       pr.attr_column(a, F.col("tags"),
                                                      schema.tag_mappings)])
                return df.withColumn(
                    "attrs",
                    F.create_map(*attr_pairs) if attr_pairs else F.create_map())
            return matches, process
        m, p = make()
        fp.register_handler(LayerHandler(name=rule.layer, matches=m, process=p))
    return fp
