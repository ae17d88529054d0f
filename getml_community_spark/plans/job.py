"""RollupJob — the resumable tiered-rollup pipeline.

One run: for every not-yet-done input day partition, compute the 1m
tier, cascade 1h and 1d, Gorilla-compress the configured tier, append
everything to snapshot tables, emit one lineage row per (tier, day),
and apply retention. Resume-safety comes from snapshot isolation:

- the DONE set is read from the OUTPUT TABLE's current manifest (which
  day partitions exist), not from a side file — an append that crashed
  before its manifest commit is invisible, so re-running it cannot
  duplicate rows;
- day partitions are independent units (tier buckets nest within days),
  so partial progress is always a consistent prefix of the final state;
- lineage reconciliation (Σ rows_in per day == input rows) is a pytest
  invariant.

Scale notes: the per-day filter prunes the parquet scan to pending
partitions (partition pruning — the semi-join prune of the reference's
tsindex build, helpers/DataFrame.cpp:306-318); all pending days are
processed in ONE Spark job per tier (no per-day driver loop); rows_in
per day comes from the same shuffle as the rollup itself.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..checkpoint import JobState, LineageLog, SnapshotTable
from ..functions.gorilla import compress_rollup
from ..operators.gapfill import gapfill
from ..operators.rollup import TIER_SECONDS, rollup_cascade, rollup_from_raw
from .rollup_spec import RollupSpec

__all__ = ["RollupJob"]


class RollupJob:
    def __init__(
        self,
        spark: SparkSession,
        spec: RollupSpec,
        input_path: str,
        out_root: str,
        job_id: str = "rollup",
    ):
        self.spark = spark
        self.spec = spec
        self.input_path = input_path
        self.out_root = out_root
        self.job_id = job_id
        self.tables = {
            tier: SnapshotTable(f"{out_root}/agg_{tier}", partition_by=["day"])
            for tier in spec.tiers
        }
        self.hist_tables = (
            {
                tier: SnapshotTable(f"{out_root}/hist_{tier}", partition_by=["day"])
                for tier in spec.tiers
            }
            if spec.hist_bin_width
            else {}
        )
        self.dist_tables = (
            {
                tier: SnapshotTable(f"{out_root}/dist_{tier}", partition_by=["day"])
                for tier in spec.tiers
            }
            if spec.distinct_col
            else {}
        )
        self.segments = SnapshotTable(f"{out_root}/segments", partition_by=["day"])
        self.lineage = LineageLog(f"{out_root}/lineage")
        self.state = JobState(f"{out_root}/state")
        # A SnapshotTable root as input (e.g. the streaming-ingest
        # store) is detected by its manifest layout and read through the
        # manifest — NEVER spark.read on its raw data/ dir (post-
        # compaction it holds multiple append dirs with different
        # layouts). It also unlocks the incremental fingerprint path in
        # run() via changes().
        import os as _os

        self.input_table = (
            SnapshotTable(input_path)
            if _os.path.exists(_os.path.join(input_path, "HEAD"))
            and _os.path.isdir(_os.path.join(input_path, "snapshots"))
            else None
        )

    # ------------------------------------------------------------ #
    def _input(self, snapshot_id: str | None = None) -> DataFrame:
        """``snapshot_id`` (snapshot-table inputs only) pins the read to
        one manifest version so data, fingerprints and the recorded
        input snapshot are consistent even while a streaming writer
        commits concurrently."""
        if self.input_table is not None and (
            snapshot_id or self.input_table.current_snapshot_id()
        ):
            df = self.input_table.read(self.spark, snapshot_id=snapshot_id)
        else:
            # drop Spark's shared file-status cache for the path:
            # late-data appends since the last read of this path would
            # otherwise be invisible to the fingerprint scan within one
            # driver process
            try:
                self.spark.catalog.refreshByPath(self.input_path)
            except Exception:  # noqa: BLE001 — path not yet read anywhere
                pass
            df = self.spark.read.parquet(self.input_path)
        if "event_date" not in df.columns:
            df = df.withColumn("event_date", F.to_date(self.spec.ts_col))
        return df

    def input_snapshot_id(self) -> str:
        """Fingerprint of the input (footer-file listing) — the job's
        'input snapshot id'. Snapshot-table inputs use the table's own
        manifest snapshot id (Iceberg semantics, and the anchor for the
        incremental changes() path)."""
        if self.input_table is not None:
            sid = self.input_table.current_snapshot_id()
            if sid:
                return sid
        import hashlib
        import os

        h = hashlib.sha256()
        for root, _, files in sorted(os.walk(self.input_path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    h.update(f"{p}:{os.path.getsize(p)}".encode())
        return h.hexdigest()[:16]

    def _refresh_day_stats(
        self, inp: DataFrame, last: dict | None, in_snap: str | None = None
    ):
        """(day_stats, fps, all_days) for a CHANGED input snapshot.

        Snapshot-table inputs whose recorded snapshot is still an
        ancestor of HEAD take the incremental path: ``changes()`` lists
        only the data dirs appended since the last run, ONE small scan
        over that delta yields the touched days, and fingerprints are
        recomputed for those days only (a day-partitioned input prunes
        the re-fingerprint read to those partitions; untouched days
        reuse the recorded fingerprint — appends never mutate existing
        dirs, so an untouched day is bit-identical by construction).
        At 10^12 rows this turns the per-run reconcile cost from
        O(full input) into O(delta + touched days). Falls back to the
        full one-scan fingerprint when the chain is broken (input
        compacted / base expired / first run)."""
        if (
            self.input_table is not None
            and last is not None
            and last.get("snapshot")
            and last.get("fps") is not None
        ):
            try:
                # on_delete="error": a retention delete between the
                # recorded and pinned snapshots may have removed rows
                # from days whose fingerprints we are about to REUSE —
                # the broad fallback below then recomputes the full
                # per-day fingerprint (mirrors the on_replace
                # compaction fallback; r5 ADVICE item #1)
                delta = self.input_table.changes(
                    self.spark,
                    last["snapshot"],
                    to_snapshot_id=in_snap,
                    on_delete="error",
                )
                if "event_date" not in delta.columns:
                    delta = delta.withColumn(
                        "event_date", F.to_date(self.spec.ts_col)
                    )
                touched = sorted(
                    str(r[0])
                    for r in delta.select("event_date").distinct().collect()
                )
                # all_days from the MANIFEST iff the table is partitioned
                # by event_date ITSELF: read() restores the event_date
                # column from those partition values, so distinct column
                # values == distinct manifest values BY CONSTRUCTION and
                # the day list costs zero scans — the piece that keeps
                # reconcile O(delta) instead of O(table) at 10^12 rows.
                # Any other partition key (arbitrary "day" renderings —
                # round-5 review) or an unpartitioned table falls back
                # to one column-pruned distinct scan.
                parts = self.input_table.partitions(in_snap)
                if parts and all(
                    set(p) == {"event_date"} and p["event_date"] is not None
                    for p in parts
                ):
                    all_days = sorted({str(p["event_date"]) for p in parts})
                else:
                    all_days = [
                        str(r[0])
                        for r in inp.select("event_date")
                        .distinct()
                        .orderBy("event_date")
                        .collect()
                    ]
                new_stats = (
                    self._day_stats(
                        inp.where(F.col("event_date").isin(touched))
                    )
                    if touched
                    else {}
                )
                fps = {
                    d: v
                    for d, v in last["fps"].items()
                    if d in set(all_days)
                }
                fps.update({d: [s[0], s[1]] for d, s in new_stats.items()})
                return new_stats, fps, all_days
            except Exception:  # noqa: BLE001 — any broken-chain shape
                # (non-ancestor ValueError, expired dirs surfacing as
                # AnalysisException from the delta read, ...): the full
                # one-scan fingerprint below is always a safe fallback
                pass
        day_stats = self._day_stats(inp)
        return (
            day_stats,
            {d: [s[0], s[1]] for d, s in day_stats.items()},
            sorted(day_stats),
        )

    def _day_stats(self, inp: DataFrame) -> dict:
        """Per-day (rows, hash-sum, token-sum) in ONE column-pruned
        aggregation scan. The hash-sum is the order-insensitive input
        fingerprint (late-data detection); rows/tokens feed lineage. At
        100 TB this single scan replaces three (distinct days,
        fingerprints, in-stats) on the snapshot-changed path."""
        h = F.xxhash64(
            F.col(self.spec.ts_col).cast("string"),
            F.col(self.spec.value_col),
            F.col(self.spec.source_col),
        )
        return {
            str(r["event_date"]): (int(r["rows"]), int(r["hs"]), int(r["toks"]))
            for r in inp.groupBy("event_date")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum(h).alias("hs"),
                F.coalesce(F.sum(self.spec.value_col), F.lit(0)).alias("toks"),
            )
            .collect()
        }

    def _done_days(self, tier: str) -> set[str]:
        table = self.tables[tier]
        return {p.get("day") for p in table.partitions() if p.get("day")}

    def _all_tables(self) -> dict:
        """Every table family this spec maintains, keyed by display name
        — THE single source of truth for reconcile/delete/retention/
        compaction loops (a family forgotten in one of those silently
        corrupts re-rolls)."""
        return {
            **dict(self.tables),
            **{f"hist_{t}": tbl for t, tbl in self.hist_tables.items()},
            **{f"dist_{t}": tbl for t, tbl in self.dist_tables.items()},
            "segments": self.segments,
        }

    def _tier_required(self, tier: str, day: str, frontier: str) -> bool:
        """Is ``day`` still inside ``tier``'s retention window (measured
        from the newest committed day, like apply_retention)?"""
        import datetime as dt

        keep_s = (self.spec.retention_seconds or {}).get(tier)
        if keep_s is None:
            return True
        cutoff = dt.date.fromisoformat(frontier) - dt.timedelta(seconds=keep_s)
        return dt.date.fromisoformat(day) >= cutoff

    def _reconcile_done(self, input_days: set[str] | None = None) -> set[str]:
        """A day is DONE iff every tier THAT IS STILL REQUIRED TO HOLD IT
        (i.e. inside that tier's retention window) has it, and the
        segments table (keep-forever) has it. A crash between tier
        commits leaves a day partially committed; those days are
        repaired by deleting their partitions everywhere (metadata-only)
        and recomputing the whole day — snapshot isolation makes the
        repair itself crash-safe.

        Retention-awareness matters (round-1 ADVICE, high): a day whose
        fine-tier partitions were expired BY POLICY is complete, not
        crash-partial — treating it as partial deleted retained
        coarse-tier history and reprocessed expired days forever.

        Repair is restricted to ``input_days`` (round-5 review): a day
        the raw input no longer holds CANNOT be recomputed, so deleting
        its partitions would permanently destroy history instead of
        repairing it — e.g. enabling hist/dist tiers on a long-lived
        store makes every pre-existing day "partial" w.r.t. the new
        (empty) family; days still in the input re-roll with the new
        family included (a deliberate, complete backfill), days the
        input has rotated out are preserved as-is (the new family just
        never covers them)."""
        tier_days = {t: self._done_days(t) for t in self.spec.tiers}
        hist_days = {
            t: {p.get("day") for p in tbl.partitions() if p.get("day")}
            for t, tbl in self.hist_tables.items()
        }
        dist_days = {
            t: {p.get("day") for p in tbl.partitions() if p.get("day")}
            for t, tbl in self.dist_tables.items()
        }
        seg_days = {
            p.get("day") for p in self.segments.partitions() if p.get("day")
        }
        present: set[str] = set().union(
            seg_days, *tier_days.values(), *hist_days.values(), *dist_days.values()
        )
        if not present:
            return set()
        frontier = max(present)
        complete = {
            d
            for d in present
            if d in seg_days
            and all(
                d in tier_days[t] or not self._tier_required(t, d, frontier)
                for t in self.spec.tiers
            )
            and all(
                d in hist_days[t] or not self._tier_required(t, d, frontier)
                for t in self.hist_tables
            )
            and all(
                d in dist_days[t] or not self._tier_required(t, d, frontier)
                for t in self.dist_tables
            )
        }
        partial = present - complete
        if input_days is not None:
            partial &= input_days
        if partial:
            for table in self._all_tables().values():
                table.delete_partitions(lambda p: p.get("day") in partial)
        return complete

    # ------------------------------------------------------------ #
    def _maintain_family(
        self,
        prefix: str,
        tables: dict,
        base_df: DataFrame,
        cascade_fn,
        pending: list,
        in_stats: dict,
        in_snap: str,
        lineage_rows: list,
    ) -> None:
        """Cascade one auxiliary tier family (hist/dist) through every
        tier: cache → per-day row counts → append → lineage → mark,
        releasing each tier's cache as soon as the next is materialized
        (a long-lived driver otherwise accumulates block-manager
        storage across run() calls — round-5 review)."""
        spec_hash = self.spec.spec_hash()
        base_tier = self.spec.tiers[0]
        cur = base_df.withColumn("day", F.to_date("bucket_start"))
        prev = None
        for tier in self.spec.tiers:
            if tier != base_tier:
                cur = cascade_fn(cur.drop("day"), tier).withColumn(
                    "day", F.to_date("bucket_start")
                ).where(F.col("day").isin(pending))
            cur = cur.cache()
            out = {
                str(r["day"]): r["rows"]
                for r in cur.groupBy("day")
                .agg(F.count(F.lit(1)).alias("rows"))
                .collect()
            }
            snap = tables[tier].append(cur)
            lineage_rows += [
                {
                    "job_id": self.job_id,
                    "spec_hash": spec_hash,
                    "tier": f"{prefix}_{tier}",
                    "partition_id": d,
                    "snapshot_id": snap,
                    "rows_in": in_stats.get(d, (0, 0))[0]
                    if tier == base_tier
                    else 0,
                    "rows_out": out.get(d, 0),
                    "bytes_compressed": 0,
                    "wall_seconds": 0.0,
                    "committed_at": time.time(),
                }
                for d in pending
            ]
            self.state.mark(
                spec_hash, in_snap, [(f"{prefix}_{tier}", d) for d in pending]
            )
            if prev is not None:
                prev.unpersist()
            prev = cur
        if prev is not None:
            prev.unpersist()

    def run(self, max_partitions: int | None = None) -> dict:
        """Process up to ``max_partitions`` pending input days (None =
        all); returns a summary. Call again to resume/finish."""
        spec, spark = self.spec, self.spark
        t0 = time.time()
        # resolve the input snapshot FIRST and pin every read to it:
        # a streaming writer committing between "read data" and "record
        # snapshot" must not let fps recorded under the new id describe
        # the old data (round-5 review — the gap batch would never roll)
        in_snap = self.input_snapshot_id()
        import os as _os

        pin = (
            in_snap
            if self.input_table is not None
            and _os.path.exists(
                _os.path.join(
                    self.input_table.root, "snapshots", f"{in_snap}.json"
                )
            )
            else None  # plain-dir input, or empty table (file-walk id)
        )
        inp = self._input(snapshot_id=pin)
        spec_hash = spec.spec_hash()

        # ---- late-data detection (round-1 ADVICE, medium) ----
        # The skip decision is keyed on (spec_hash, per-day input
        # fingerprint), not just output-partition presence: when the
        # global input snapshot changed, ONE _day_stats scan yields the
        # day list, the fingerprints AND the lineage row/token counts;
        # committed days whose fingerprint changed are re-rolled.
        # Unchanged snapshot = fast path: fingerprints are reused and
        # only the (cheap, single-column) day listing is scanned.
        last = self.state.last_input(spec_hash)
        day_stats: dict | None = None
        if last is not None and last.get("snapshot") == in_snap:
            fps = last["fps"]
            all_days = [
                str(r[0])
                for r in inp.select("event_date").distinct().orderBy("event_date").collect()
            ]
        else:
            day_stats, fps, all_days = self._refresh_day_stats(
                inp, last, in_snap=pin
            )
        done = self._reconcile_done(input_days=set(all_days))
        if day_stats is not None and last is not None:
            # only INPUT-PRESENT days can be "changed" (round-5 review):
            # a day the input rotated out is retained history, not late
            # data — deleting it would destroy it with nothing to
            # re-roll from. Every table family is deleted together: a
            # stale hist/dist partition surviving the re-roll would be
            # double-appended (duplicate rows on read).
            changed = {
                d
                for d in done
                if d in fps and fps[d] != last.get("fps", {}).get(d)
            }
            if changed:
                for table in self._all_tables().values():
                    table.delete_partitions(lambda p: p.get("day") in changed)
                done -= changed

        pending = [d for d in all_days if d not in done]
        if max_partitions is not None:
            pending = pending[:max_partitions]
        summary = {
            "job_id": self.job_id,
            "spec_hash": spec_hash,
            "input_snapshot": in_snap,
            "days_total": len(all_days),
            "days_done_before": len(done),
            "days_processed": len(pending),
            "tokens_processed": 0,
        }
        if not pending:
            self.state.record_input(spec_hash, in_snap, fps)
            summary["wall_seconds"] = time.time() - t0
            return summary

        sel = inp.where(F.col("event_date").isin(pending))
        # rows_in + token volume per pending day — already computed by
        # the _day_stats scan on the snapshot-changed path; otherwise
        # one pruned agg over the pending days only
        in_stats = (
            {
                d: (day_stats[d][0], day_stats[d][2])
                for d in pending
                if d in day_stats
            }
            if day_stats is not None
            else {}
        )
        # pending days the (incremental or fast-path) stats pass didn't
        # cover — e.g. never-processed old days outside the delta — get
        # one pruned agg over exactly those days
        missing = [d for d in pending if d not in in_stats]
        if missing:
            in_stats.update(
                {
                    str(r["event_date"]): (r["rows"], r["toks"])
                    for r in sel.where(F.col("event_date").isin(missing))
                    .groupBy("event_date")
                    .agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.sum(spec.value_col).alias("toks"),
                    )
                    .collect()
                }
            )
        summary["tokens_processed"] = int(sum(t for _, t in in_stats.values()))

        # ---- tier 0 from raw (one Spark job for ALL pending days) ----
        base_tier = spec.tiers[0]
        agg = rollup_from_raw(
            sel, base_tier, spec.source_col, spec.ts_col, spec.value_col
        ).withColumn("day", F.to_date("bucket_start"))
        agg = agg.cache()
        out_stats = {
            str(r["day"]): r["rows"]
            for r in agg.groupBy("day").agg(F.count(F.lit(1)).alias("rows")).collect()
        }
        snap = self.tables[base_tier].append(agg)
        lineage_rows = [
            {
                "job_id": self.job_id,
                "spec_hash": spec_hash,
                "tier": base_tier,
                "partition_id": d,
                "snapshot_id": snap,
                "rows_in": in_stats.get(d, (0, 0))[0],
                "rows_out": out_stats.get(d, 0),
                "bytes_compressed": 0,
                "wall_seconds": 0.0,
                "committed_at": time.time(),
            }
            for d in pending
        ]
        self.state.mark(spec_hash, in_snap, [(base_tier, d) for d in pending])

        # ---- cascade tiers (from the tier below, pending days only) ----
        lower = agg
        for tier in spec.tiers[1:]:
            rolled = rollup_cascade(lower.drop("day"), tier).withColumn(
                "day", F.to_date("bucket_start")
            )
            rolled = rolled.where(F.col("day").isin(pending)).cache()
            t_out = {
                str(r["day"]): r["rows"]
                for r in rolled.groupBy("day").agg(F.count(F.lit(1)).alias("rows")).collect()
            }
            tsnap = self.tables[tier].append(rolled)
            lineage_rows += [
                {
                    "job_id": self.job_id,
                    "spec_hash": spec_hash,
                    "tier": tier,
                    "partition_id": d,
                    "snapshot_id": tsnap,
                    "rows_in": out_stats.get(d, 0),
                    "rows_out": t_out.get(d, 0),
                    "bytes_compressed": 0,
                    "wall_seconds": 0.0,
                    "committed_at": time.time(),
                }
                for d in pending
            ]
            self.state.mark(spec_hash, in_snap, [(tier, d) for d in pending])
            if lower is not agg:
                lower.unpersist()
            lower = rolled
        if lower is not agg:
            lower.unpersist()

        # ---- auxiliary tier families (hist / dist), when configured ----
        if self.hist_tables:
            from ..operators.histquantile import hist_cascade, hist_rollup_from_raw

            self._maintain_family(
                "hist",
                self.hist_tables,
                hist_rollup_from_raw(
                    sel,
                    base_tier,
                    value_col=spec.value_col,
                    bin_width=spec.hist_bin_width,
                    source_col=spec.source_col,
                    ts_col=spec.ts_col,
                ),
                hist_cascade,
                pending,
                in_stats,
                in_snap,
                lineage_rows,
            )
        if self.dist_tables:
            from ..operators.distinct import hll_cascade, hll_rollup_from_raw

            self._maintain_family(
                "dist",
                self.dist_tables,
                hll_rollup_from_raw(
                    sel,
                    base_tier,
                    distinct_col=spec.distinct_col,
                    source_col=spec.source_col,
                    ts_col=spec.ts_col,
                    lg_k=spec.hll_lg_k,
                ),
                hll_cascade,
                pending,
                in_stats,
                in_snap,
                lineage_rows,
            )

        # ---- Gorilla compression of the configured tier ----
        segs = compress_rollup(
            agg.drop("day"),
            ts_col="bucket_start",
            value_col=spec.compress_value,
            source_col="source",
            with_stats=spec.segment_stats,
        ).cache()
        seg_stats = {
            str(r["day"]): (r["n"], r["b"])
            for r in segs.groupBy("day")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("bytes_compressed").alias("b"))
            .collect()
        }
        ssnap = self.segments.append(segs)
        lineage_rows += [
            {
                "job_id": self.job_id,
                "spec_hash": spec_hash,
                "tier": f"segments[{spec.compress_tier}]",
                "partition_id": d,
                "snapshot_id": ssnap,
                "rows_in": out_stats.get(d, 0),
                "rows_out": seg_stats.get(d, (0, 0))[0],
                "bytes_compressed": int(seg_stats.get(d, (0, 0))[1] or 0),
                "wall_seconds": 0.0,
                "committed_at": time.time(),
            }
            for d in pending
        ]
        self.lineage.append(lineage_rows)
        segs.unpersist()
        agg.unpersist()
        self.state.record_input(spec_hash, in_snap, fps)

        # ---- retention: metadata-only expiry per tier ----
        self.apply_retention()

        summary["wall_seconds"] = time.time() - t0
        summary["snapshot_ids"] = {base_tier: snap, "segments": ssnap}
        return summary

    # ------------------------------------------------------------ #
    def apply_retention(self) -> None:
        """Tier expiry (north rule): drop day partitions older than the
        tier's retention horizon, metadata-only (manifest rewrite — the
        Iceberg ``DELETE WHERE day < cutoff`` analogue)."""
        import datetime as dt

        for tier, keep_s in (self.spec.retention_seconds or {}).items():
            if keep_s is None or tier not in self.tables:
                continue
            days = sorted(self._done_days(tier))
            if not days:
                continue
            newest = dt.date.fromisoformat(max(days))
            cutoff = newest - dt.timedelta(seconds=keep_s)
            for table in [
                self.tables[tier],
                *([self.hist_tables[tier]] if tier in self.hist_tables else []),
                *([self.dist_tables[tier]] if tier in self.dist_tables else []),
            ]:
                table.delete_partitions(
                    lambda p: p.get("day")
                    and dt.date.fromisoformat(p["day"]) < cutoff
                )

    # ------------------------------------------------------------ #
    def compact(self, min_files: int = 2) -> dict:
        """Maintenance pass: rewrite fragmented day partitions of every
        tier / histogram / segment table into one file each
        (``SnapshotTable.compact_partitions``) and log one lineage row
        per table (tier=``compact[<table>]``; rows_in/rows_out carry
        files before/after — the rewrite moves files, not rows). Safe to
        run any time: compaction commits snapshots, so a concurrent
        resume sees either the old or the new layout, both complete."""
        reports, rows = {}, []
        for name, table in self._all_tables().items():
            t0 = time.time()
            rep = table.compact_partitions(self.spark, min_files=min_files)
            reports[name] = rep
            if rep["partitions"]:
                rows.append(
                    {
                        "job_id": self.job_id,
                        "spec_hash": self.spec.spec_hash(),
                        "tier": f"compact[{name}]",
                        "partition_id": f"{rep['partitions']} partitions",
                        "snapshot_id": rep["snapshot"],
                        "rows_in": rep["files_before"],
                        "rows_out": rep["files_after"],
                        "bytes_compressed": 0,
                        "wall_seconds": time.time() - t0,
                        "committed_at": time.time(),
                    }
                )
        self.lineage.append(rows)
        return reports

    def read_tier(self, tier: str) -> DataFrame:
        return self.tables[tier].read(self.spark)

    def query_compressed(
        self,
        t_from: int | None = None,
        t_to: int | None = None,
        v_from: float | None = None,
        v_to: float | None = None,
    ) -> DataFrame:
        """Point query over the job's compressed segment store with
        chunk-index pruning (requires spec.segment_stats)."""
        if not self.spec.segment_stats:
            raise ValueError("spec.segment_stats is off — no chunk index stored")
        from ..functions.gorilla import query_segments

        return query_segments(
            self.segments.read(self.spark), t_from, t_to, v_from, v_to
        )

    def _route(
        self,
        tables: dict,
        t_from: int,
        t_to: int,
        sec: int,
        allow_empty: bool = False,
    ):
        """Shared range-router core: validate alignment, pick the
        coarsest maintained tier whose width divides the step, read it
        with MANIFEST-level day pruning, filter to the exact bucket
        range. Returns (tier, rows-or-None, (d_from, d_to))."""
        import datetime as dt

        from ..operators.rollup import choose_tier

        if t_from % sec or t_to % sec:
            raise ValueError("t_from/t_to must be multiples of step_seconds")
        if t_to <= t_from:
            raise ValueError("empty range")
        tier = choose_tier(sec, [t for t in self.spec.tiers if t in tables])
        d_from = dt.datetime.fromtimestamp(t_from, dt.timezone.utc).date()
        d_to = dt.datetime.fromtimestamp(t_to - 1, dt.timezone.utc).date()

        def _in_range(p: dict) -> bool:
            d = p.get("day")
            return bool(d) and d_from <= dt.date.fromisoformat(d) <= d_to

        try:
            rows = tables[tier].read(self.spark, partition_filter=_in_range)
            rows = rows.drop("day")
            epoch = F.col("bucket_start").cast("timestamp").cast("long")
            rows = rows.where((epoch >= t_from) & (epoch < t_to))
        except FileNotFoundError:
            if not allow_empty:
                raise
            rows = None
        return tier, rows, (d_from, d_to)

    def query_range(
        self,
        t_from: int,
        t_to: int,
        step_seconds: int,
        realtime: bool = False,
    ) -> DataFrame:
        """Tier-aware range query: (source, step-bucket) core aggregates
        for epoch range ``[t_from, t_to)`` at ``step_seconds`` resolution.

        The router (Thanos downsampled-read / TimescaleDB real-time
        aggregate pattern):

        1. picks the COARSEST maintained tier whose width divides the
           step (``choose_tier``) — a 2h chart reads the 1h tier, not
           60× as many 1m rows, and never raw;
        2. prunes day partitions at the MANIFEST level
           (``SnapshotTable.read(partition_filter=...)``) — days outside
           the range never enter the plan;
        3. re-buckets with ``rollup_to_step`` (skipped when the step IS
           the tier width);
        4. with ``realtime=True``, unions an on-the-fly rollup of input
           days not yet committed to the chosen tier (the un-rolled
           head), so results are as fresh as raw without waiting for the
           next ``run()``.

        ``t_from``/``t_to`` must be step-aligned (exact bucket
        semantics). Days expired from the chosen tier by retention are
        absent from the result — query a coarser step (served by a
        longer-retained tier) for old history.
        """
        from ..operators.rollup import rollup_to_step

        sec = int(step_seconds)
        tier, rows, (d_from, d_to) = self._route(
            self.tables, t_from, t_to, sec, allow_empty=realtime
        )

        if realtime:
            from ..operators.rollup import rollup_from_raw

            done = self._done_days(tier)
            inp = self._input()
            ts_epoch = F.col(self.spec.ts_col).cast("timestamp").cast("long")
            head = inp.where(
                (F.col("event_date").cast("string") >= str(d_from))
                & (F.col("event_date").cast("string") <= str(d_to))
                & (~F.col("event_date").cast("string").isin(sorted(done)) if done else F.lit(True))
                & (ts_epoch >= t_from)
                & (ts_epoch < t_to)
            )
            head_rolled = rollup_from_raw(
                head,
                tier,
                self.spec.source_col,
                self.spec.ts_col,
                self.spec.value_col,
            )
            rows = head_rolled if rows is None else rows.unionByName(head_rolled)

        if sec != TIER_SECONDS[tier]:
            rows = rollup_to_step(rows, sec)
        return rows

    def query_range_archive(
        self, t_from: int, t_to: int, step_seconds: int
    ) -> DataFrame:
        """Serve history that retention has EXPIRED from the tier tables
        out of the keep-forever Gorilla archive: manifest-pruned day
        partitions → chunk-index-pruned blob decode (``query_segments``)
        → re-bucket the decoded ``compress_tier`` points to ``step``.

        Re-bucket rule per compressed value: cnt/sum compose by SUM,
        min/max by MIN/MAX, and rate by mass — ``sum(rate·tier_sec)/
        step`` (gap buckets carry zero mass, so sparsity is exact).
        The rate path round-trips through one IEEE divide/multiply, so
        results match a from-raw rollup to ~1 ulp, not bitwise.
        Returns (source, bucket_start, value)."""
        import datetime as dt

        from ..functions.gorilla import query_segments
        from ..operators.rollup import TIER_SECONDS as TS

        if not self.spec.segment_stats:
            raise ValueError("spec.segment_stats is off — no chunk index stored")
        sec = int(step_seconds)
        if t_from % sec or t_to % sec:
            raise ValueError("t_from/t_to must be multiples of step_seconds")
        base_sec = TS[self.spec.compress_tier]
        if sec % base_sec:
            raise ValueError(
                f"step must be a multiple of the compressed tier ({base_sec}s)"
            )
        d_from = dt.datetime.fromtimestamp(t_from, dt.timezone.utc).date()
        d_to = dt.datetime.fromtimestamp(t_to - 1, dt.timezone.utc).date()

        def _in_range(p: dict) -> bool:
            d = p.get("day")
            return bool(d) and d_from <= dt.date.fromisoformat(d) <= d_to

        segs = self.segments.read(self.spark, partition_filter=_in_range)
        pts = query_segments(segs, t_from=t_from, t_to=t_to - 1)
        bucket = (F.floor(F.col("ts") / F.lit(sec)) * F.lit(sec)).cast("long")
        v = self.spec.compress_value
        if v == "rate":
            agg = (F.sum(F.col("value") * F.lit(float(base_sec))) / F.lit(float(sec)))
        elif v in ("cnt", "sum_n_tok"):
            agg = F.sum("value")
        elif v == "min_n_tok":
            agg = F.min("value")
        elif v == "max_n_tok":
            agg = F.max("value")
        else:
            raise ValueError(f"no archive re-bucket rule for {v!r}")
        return (
            pts.groupBy("source", bucket.alias("__b"))
            .agg(agg.alias("value"))
            .select(
                "source",
                F.timestamp_seconds(F.col("__b")).alias("bucket_start"),
                "value",
            )
        )

    def query_range_quantiles(
        self,
        t_from: int,
        t_to: int,
        step_seconds: int,
        qs: tuple = (0.5, 0.95, 0.99),
    ) -> DataFrame:
        """Range-routed percentiles: serve (source, step-bucket)
        quantiles for ``[t_from, t_to)`` from the coarsest maintained
        HISTOGRAM tier whose width divides the step — same manifest
        pruning as ``query_range``, exact count-merge re-bucketing
        (``hist_to_step``), then the type-1 quantile extraction.
        Requires ``RollupSpec.hist_bin_width``."""
        if not self.hist_tables:
            raise ValueError("no histogram tiers (set RollupSpec.hist_bin_width)")
        from ..operators.histquantile import hist_quantiles, hist_to_step

        sec = int(step_seconds)
        tier, rows, _ = self._route(self.hist_tables, t_from, t_to, sec)
        if sec != TIER_SECONDS[tier]:
            rows = hist_to_step(rows, sec)
        return hist_quantiles(rows, qs=qs, bin_width=self.spec.hist_bin_width)

    def query_range_distinct(
        self, t_from: int, t_to: int, step_seconds: int
    ) -> DataFrame:
        """Range-routed distinct counts: serve (source, step-bucket)
        HLL estimates for ``[t_from, t_to)`` from the coarsest
        maintained DISTINCT tier whose width divides the step — sketch
        unions through ``hll_to_step`` are lossless, so the estimate
        equals a one-pass sketch over the same raw rows. Requires
        ``RollupSpec.distinct_col``."""
        if not self.dist_tables:
            raise ValueError("no distinct tiers (set RollupSpec.distinct_col)")
        from ..operators.distinct import hll_estimates, hll_to_step

        sec = int(step_seconds)
        tier, rows, _ = self._route(self.dist_tables, t_from, t_to, sec)
        if sec != TIER_SECONDS[tier]:
            rows = hll_to_step(rows, sec)
        return hll_estimates(rows)

    def read_hist_quantiles(self, tier: str, qs: tuple = (0.5, 0.95, 0.99)) -> DataFrame:
        """Quantiles from the maintained histogram tier (requires
        spec.hist_bin_width)."""
        if tier not in self.hist_tables:
            raise ValueError(
                f"no histogram tier {tier!r} (set RollupSpec.hist_bin_width)"
            )
        from ..operators.histquantile import hist_quantiles

        return hist_quantiles(
            self.hist_tables[tier].read(self.spark).drop("day"),
            qs=qs,
            bin_width=self.spec.hist_bin_width,
        )

    def read_distinct(self, tier: str) -> DataFrame:
        """Distinct-count estimates from the maintained HLL tier
        (requires RollupSpec.distinct_col). Exact while per-bucket
        cardinality stays in the sketch's coupon range; ±~1% beyond."""
        if tier not in self.dist_tables:
            raise ValueError(
                f"no distinct tier {tier!r} (set RollupSpec.distinct_col)"
            )
        from ..operators.distinct import hll_estimates

        return hll_estimates(self.dist_tables[tier].read(self.spark).drop("day"))

    def read_tier_dense(self, tier: str) -> DataFrame:
        return gapfill(
            self.tables[tier].read(self.spark).drop("day"), TIER_SECONDS[tier]
        )
