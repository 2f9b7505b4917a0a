"""Single entry point for every runnable task — the reference's Main.java
dispatcher (planetiler-dist Main.java:30-120) re-expressed:

    python -m planetiler_spark <task> [args...]

Like the reference, a bare ``schema.yml`` first argument is shorthand for
the configured-map task, and an unrecognized task prints the registry and
exits 1. (The reference's default task is its bundled openmaptiles
profile, which is a separate repository — here the default prints usage.)
"""

from __future__ import annotations

import re
import sys


def _custom(argv):
    """generate-custom: YAML schema -> tile archive (ConfiguredMapMain)."""
    from .plans import pipeline
    return pipeline.main(argv)


def _verify_schema(argv):
    from .plans import validator
    return validator.main(argv)


def _verify_mbtiles(argv):
    from .plans import cli_tools
    return cli_tools.verify_main(argv)


def _compare(argv):
    from .plans import cli_tools
    return cli_tools.compare_main(argv)


def _stats(argv):
    from .plans import cli_tools
    return cli_tools.stats_main(argv)


def _top_osm_tiles(argv):
    from .plans import cli_tools
    return cli_tools.top_osm_tiles_main(argv)


def _example_toilets(argv):
    from .examples import toilets_overlay
    return toilets_overlay.main(argv)


def _example_bikeroutes(argv):
    from .examples import bike_route_overlay
    return bike_route_overlay.main(argv)


def _osm_qa(argv):
    from .examples import osm_qa_tiles
    return osm_qa_tiles.main(argv)


def _example_overture(argv):
    from .examples import overture_basemap
    return overture_basemap.main(argv)


def _verify_monaco(argv):
    from .plans import cli_tools
    return cli_tools.verify_monaco_main(argv)


ENTRY_POINTS = {
    "generate-custom": _custom,
    "custom": _custom,
    "example-toilets": _example_toilets,
    "example-bikeroutes": _example_bikeroutes,
    "example-qa": _osm_qa,
    "osm-qa": _osm_qa,
    "example-overture": _example_overture,
    "overture": _example_overture,
    "verify": _verify_schema,
    "verify-custom": _verify_schema,
    "verify-schema": _verify_schema,
    "verify-mbtiles": _verify_mbtiles,
    "verify-monaco": _verify_monaco,
    "stats": _stats,
    "top-osm-tiles": _top_osm_tiles,
    "compare": _compare,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: python -m planetiler_spark <task> [args...]",
              file=sys.stderr)
        print("possibilities: " + ", ".join(sorted(ENTRY_POINTS)),
              file=sys.stderr)
        return 1
    task = argv[0].strip().lower()
    if re.match(r"^.*\.ya?ml$", task):
        # Main.java:99-101: a schema file IS the task
        return _custom(["--schema", argv[0], *argv[1:]]) or 0
    fn = ENTRY_POINTS.get(task)
    if fn is None:
        print(f"Unrecognized task: {task}", file=sys.stderr)
        print("possibilities: " + ", ".join(sorted(ENTRY_POINTS)),
              file=sys.stderr)
        return 1
    return fn(argv[1:]) or 0


if __name__ == "__main__":
    sys.exit(main())
