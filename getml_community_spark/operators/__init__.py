from . import aggregates, gapfill, rollup  # noqa: F401
