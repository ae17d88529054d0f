"""RollupSpec — the engine's declarative job spec.

This plays the role of the reference's Placeholder/DataModel
(helpers/Placeholder.hpp:27-101: which tables join on what, over which
time windows): a serializable description of WHAT to maintain, hashed
into a fingerprint that keys checkpoint state (the analogue of the
reference's build-history fingerprints, DataFrameTracker.hpp:24-61).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class RollupSpec:
    source_col: str = "source"
    ts_col: str = "event_time"
    value_col: str = "n_tok"
    doc_id_col: str = "doc_id"
    tiers: tuple[str, ...] = ("1m", "1h", "1d")
    compress_tier: str = "1m"
    compress_value: str = "rate"
    # retention per tier, seconds of history kept relative to the newest
    # day in the table; None = keep forever
    retention_seconds: dict = field(
        default_factory=lambda: {"1m": None, "1h": None, "1d": None}
    )
    # when set, the job ALSO maintains mergeable histogram tiers
    # (operators/histquantile.py) at every tier, bin = floor(value /
    # hist_bin_width) — cascaded by adding counts, same day
    # partitioning / lineage / retention as the core tiers
    hist_bin_width: float | None = None
    # store per-segment t/v min-max chunk-index columns with the Gorilla
    # blobs so query_segments can prune without decoding. Default on;
    # a store whose older segments predate the index reads back with
    # NULL metadata (SnapshotTable additive schema evolution) and
    # query_segments decodes-not-prunes those segments — mixed stores
    # stay correct without a rewrite
    segment_stats: bool = True
    # when set, the job ALSO maintains mergeable HLL distinct-count
    # tiers (operators/distinct.py) of this column at every tier —
    # sketches union losslessly through the cascade, same day
    # partitioning / lineage / retention as the core tiers
    distinct_col: str | None = None
    hll_lg_k: int = 12

    def spec_hash(self) -> str:
        payload = json.dumps(asdict(self), sort_keys=True, default=str)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]
