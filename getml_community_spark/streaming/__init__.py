from . import stream_rollup  # noqa: F401
