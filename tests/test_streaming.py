"""Structured-Streaming 1m tier == batch 1m tier (availableNow parity)."""

from __future__ import annotations

import pytest


@pytest.mark.usefixtures("spark")
def test_stream_rollup_matches_batch(spark, tmp_path):
    from getml_community_spark.datagen import write_corpus_parquet
    from getml_community_spark.operators.rollup import rollup_from_raw
    from getml_community_spark.streaming.stream_rollup import (
        stream_corpus_reader,
        stream_rollup,
    )

    path = str(tmp_path / "corpus")
    write_corpus_parquet(spark, 2000, path, with_tokens=False)

    stream = stream_corpus_reader(spark, path)
    agg = stream_rollup(stream, "1m", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("agg_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql("SELECT * FROM agg_stream").toPandas()
    want = rollup_from_raw(spark.read.parquet(path), "1m").toPandas()

    from .conftest import assert_frames_equal_unordered

    assert_frames_equal_unordered(got, want, ["source", "bucket_start"])
