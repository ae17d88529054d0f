"""Real ``spark-submit --py-files`` execution — the north rule's
packaging claim, evidenced, not asserted: the engine is zipped exactly
as scripts/submit.sh does, shipped to a FRESH spark-submit driver whose
environment has no repo on PYTHONPATH (imports must resolve from the
zip), and the resumable rollup job runs end-to-end producing tier
tables + lineage. (submit.sh's Iceberg --packages needs network, so the
offline test passes the same confs explicitly.)"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on this box"
)
def test_spark_submit_pyfiles_roundtrip(spark, tmp_path):
    from getml_community_spark.datagen import write_corpus_parquet

    inp = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_corpus_parquet(spark, 2000, inp, with_tokens=False)

    zpath = str(tmp_path / "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "getml_community_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # imports MUST come from the zip
    }
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", zpath,
            "--conf", "spark.sql.ansi.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "scripts", "run_rollup_job.py"),
            inp, out,
            "--compact",
            "--query",
            str(1735689600 + 86400), str(1735689600 + 4 * 86400), "7200",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # NOT the repo — no accidental cwd imports
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    lines = [
        json.loads(l)
        for l in res.stdout.strip().splitlines()
        if l.startswith("{")
    ]
    summary = lines[0]
    assert summary["days_processed"] >= 1, summary
    # --compact and --query emitted their JSON lines
    compact = next(l for l in lines if "compact" in l)
    assert compact["compact"]["1m"]["partitions"] >= 0
    qr = next(l for l in lines if "query_range" in l)
    assert len(qr["query_range"]) > 0 and "bucket_start" in qr["query_range"][0]
    assert summary["tokens_processed"] > 0, summary
    # tier tables + lineage landed on disk
    assert os.path.isdir(os.path.join(out, "agg_1m"))
    assert os.path.isdir(os.path.join(out, "lineage"))

    # the submitted job's output equals an in-process run of the same job
    # (read via the snapshot manifest — after --compact the data/ dir
    # holds both the original append and the rewrite; only the manifest
    # defines the live set)
    from getml_community_spark.checkpoint import SnapshotTable

    got = (
        SnapshotTable(os.path.join(out, "agg_1m"), partition_by=["day"])
        .read(spark)
        .count()
    )
    from getml_community_spark.operators.rollup import rollup_from_raw

    want = rollup_from_raw(spark.read.parquet(inp), "1m").count()
    assert got == want


def test_spark_submit_stream_ingest(spark, tmp_path):
    """The streaming entry point runs under spark-submit from the
    zipped package and lands closed 1m buckets in the snapshot store."""
    import shutil
    import zipfile

    zpath = str(tmp_path / "engine.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(os.path.join(REPO, "getml_community_spark")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    inp = str(tmp_path / "corpus")
    from getml_community_spark.datagen import write_corpus_parquet

    write_corpus_parquet(spark, 800, inp, with_tokens=False)
    out = str(tmp_path / "store")

    env = {k: v for k, v in os.environ.items() if k not in ("PYTHONPATH",)}
    env["PYSPARK_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--py-files", zpath,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            os.path.join(REPO, "scripts", "run_stream_ingest.py"),
            inp, out, "--watermark", "0 seconds",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads(
        [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    )
    assert summary["agg_1m_partitions"] > 0

    from getml_community_spark.checkpoint import SnapshotTable

    t = SnapshotTable(os.path.join(out, "agg_1m"), partition_by=["day"])
    got = t.read(spark)
    assert got.count() > 0
    # streamed rows agree with the batch rollup on their keys
    from getml_community_spark.operators.rollup import rollup_from_raw

    batch = rollup_from_raw(spark.read.parquet(inp), "1m")
    joined = got.drop("day").join(batch, ["source", "bucket_start"], "left_anti")
    assert joined.count() == 0  # nothing streamed that batch doesn't have
