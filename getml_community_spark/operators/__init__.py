from . import (  # noqa: F401
    aggregates,
    asof_join,
    dedup,
    gapfill,
    multimodal,
    rollup,
    similarity,
    textstats,
)
