"""Dedup-family scale point: minhash / simhash / embedding near-dup at
REPLICAS x the sf0.1 corpus, production configuration (caps ON).

The bench's contract queries run the trio at sf0.1 (5,000 docs) in the
oracle configuration (caps OFF, exactness-gated). This script is the
scale evidence the 100 TB story needs: the same operators, default
production caps, on a corpus 10x larger — built by replicating sf0.1
with a similarity-preserving transform:

- documents: replica r rewrites each word w to "rep<r>x<w>" iff
  xxhash64(r, w) % 10 < 3 (the prefix is alphanumeric ON PURPOSE: a
  separator like "_" would tokenize into a constant extra token shared
  by every rewritten word, which dominates the simhash bit-vote and
  collapses fingerprints — measured: 525 -> 126k pairs).
  The rewrite is a pure function of (r, word),
  so WITHIN a replica every shingle-equality relation — hence every
  exact/near-dup pair and its exact Jaccard — is preserved verbatim;
  ACROSS replicas a 5-shingle survives only if all five words are
  unrewritten in both replicas ((0.7^5)^2 ~ 2.8%), pushing cross-replica
  Jaccard far below threshold. Result: 10x the docs with the SAME
  dup-rate and cluster shape — a faithful scale-up, not a pathological
  10x-exact-copy corpus.
- embeddings: replica r flips the sign of dimension i iff
  xxhash64(r, i) % 2 == 1. Within-replica cosines are EXACTLY preserved
  (both vectors flip the same dims); cross-replica cosines are
  sign-scrambled toward 0.

Reports per-op wall (min of 2 warmed), output rows, input tokens/sec,
and the LSH bucket-occupancy tail (buckets > cap, members dropped) from
lsh_bucket_occupancy on the very bucketing the pair join uses.

Usage: python bench/dedup_scale.py [replicas] [cpus]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP = 1000


def replicate_documents(spark, replicas: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = []
    for r in range(replicas):
        words = F.split(F.col("text"), " ")
        rewritten = (
            words
            if r == 0  # replica 0 is the untouched sf0.1 corpus
            else F.transform(
                words,
                lambda w: F.when(
                    F.pmod(F.xxhash64(F.lit(r), w), F.lit(10)) < 3,
                    F.concat(F.lit(f"rep{r}x"), w),
                ).otherwise(w),
            )
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                F.array_join(rewritten, " ").alias("text"),
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def replicate_embeddings(spark, replicas: int):
    base = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    parts = []
    for r in range(replicas):
        flipped = (
            F.col("embedding")
            if r == 0
            else F.transform(
                F.col("embedding"),
                lambda x, i: F.when(
                    F.pmod(F.xxhash64(F.lit(r), i), F.lit(2)) == 1, -x
                ).otherwise(x),
            )
        )
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                flipped.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(fn, warm: int = 1, reps: int = 2) -> tuple[float, int]:
    rows = None
    for _ in range(warm):
        rows = fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        rows = fn()
        best = min(best, time.time() - t0)
    return best, rows


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )

    from getml_community_spark.operators.dedup import (
        embedding_near_dups,
        lsh_bucket_occupancy,
        minhash_lsh_dedup,
        minhash_signature,
        shingles,
        simhash_pairs,
    )
    from getml_community_spark.session import get_spark

    spark = get_spark(app_name="dedup_scale", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = replicate_documents(spark, replicas).localCheckpoint(eager=True)
    embs = replicate_embeddings(spark, replicas).localCheckpoint(eager=True)
    n_docs = docs.count()
    n_tokens = docs.agg(F.sum(F.size(F.split("text", " ")))).first()[0]
    n_vecs = embs.count()

    out: dict = {
        "replicas": replicas,
        "cpus": cpus,
        "n_docs": n_docs,
        "n_tokens": int(n_tokens),
        "n_vecs": n_vecs,
        "cap": CAP,
        "ops": {},
    }

    # occupancy tail of the EXACT bucketing minhash uses (128 hashes /
    # 32 bands, the operator default)
    sig = minhash_signature(shingles(F.col("text"), 5), 128)
    sig_tbl = docs.select(F.col("doc_id").alias("id"), sig.alias("sig"))
    banded = sig_tbl.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice(F.col("sig"), b * 4 + 1, 4)).alias(
                            "bucket"
                        ),
                    )
                    for b in range(32)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    occ = lsh_bucket_occupancy(banded, ["band", "bucket"])
    tail = occ.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n_members").alias("max_members"),
        F.sum(F.when(F.col("n_members") > CAP, F.lit(1)).otherwise(F.lit(0))).alias(
            "buckets_over_cap"
        ),
        F.sum(
            F.when(F.col("n_members") > CAP, F.col("n_members") - CAP).otherwise(
                F.lit(0)
            )
        ).alias("members_dropped"),
    ).first()
    out["minhash_bucket_occupancy"] = {
        "buckets": tail["buckets"],
        "max_members": tail["max_members"],
        "buckets_over_cap": int(tail["buckets_over_cap"]),
        "members_dropped": int(tail["members_dropped"]),
    }

    def run(name, fn):
        wall, rows = timed(fn)
        out["ops"][name] = {
            "wall_sec": round(wall, 2),
            "rows_out": rows,
            "tokens_per_sec": round(n_tokens / wall),
        }

    run(
        "minhash_dedup",
        lambda: minhash_lsh_dedup(
            docs, "text", "doc_id", threshold=0.8, verify=True, max_bucket_size=CAP
        ).count(),
    )
    run(
        "simhash_pairs",
        lambda: simhash_pairs(
            docs, "text", "doc_id", max_hamming=3, max_bucket_size=CAP
        ).count(),
    )
    run(
        "embedding_near_dups",
        lambda: embedding_near_dups(
            embs,
            "vec_id",
            "embedding",
            threshold=0.35,
            method="lsh",
            dim=64,
            max_bucket_size=CAP,
        ).count(),
    )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
