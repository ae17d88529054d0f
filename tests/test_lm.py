"""Bigram-LM quality scoring: hand-computable model on a toy corpus,
ranking sanity (natural vs gibberish), short-doc exclusion."""

from __future__ import annotations

import math

import pytest

from getml_community_spark.operators.lm import bigram_lm_score


def test_toy_corpus_hand_model(spark):
    # corpus: "a b" x3 and "a c" x1 -> c(a)=4, c(a,b)=3, c(a,c)=1, V=2
    rows = [(0, "a b"), (1, "a b"), (2, "a b"), (3, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_lm_score(df, k=0.1).collect()}
    k, V, ca = 0.1, 2.0, 4
    lp_ab = math.floor(math.log((3 + k) / (ca + k * V)) * 1e6 + 0.5) / 1e6
    lp_ac = math.floor(math.log((1 + k) / (ca + k * V)) * 1e6 + 0.5) / 1e6
    for d in (0, 1, 2):
        assert out[d]["n_bigrams"] == 1
        assert out[d]["avg_nll"] == pytest.approx(-lp_ab, abs=1e-4)
    assert out[3]["avg_nll"] == pytest.approx(-lp_ac, abs=1e-4)
    # the rarer continuation scores as less probable
    assert out[3]["avg_nll"] > out[0]["avg_nll"]


def test_gibberish_scores_worse_than_natural(spark):
    natural = "the quick brown fox jumps over the lazy dog " * 3
    rows = [(i, natural) for i in range(10)]
    rows.append((99, "zxq wvu qqq plk zxq mnb vfr zxq"))  # off-distribution
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["avg_nll"] for r in bigram_lm_score(df).collect()}
    assert out[99] > max(out[i] for i in range(10))


def test_short_docs_excluded_and_bad_k(spark):
    df = spark.createDataFrame(
        [(0, "single"), (1, "two words")], "doc_id long, text string"
    )
    out = bigram_lm_score(df).collect()
    assert [r["doc_id"] for r in out] == [1]  # <2 tokens -> no row
    with pytest.raises(ValueError):
        bigram_lm_score(df, k=0.0)


def test_broadcast_model_plan_and_fallback(spark):
    """broadcast_model=True must put the (w1, w2) model on the small
    side of a BroadcastHashJoin (corpus bigrams never shuffle);
    broadcast_model=False is the documented shuffle fallback for
    unbounded vocabularies; 'auto' under the type threshold matches the
    broadcast plan AND the broadcast/shuffle values agree exactly."""
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    plan_b = bigram_lm_score(df, broadcast_model=True)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan_b

    plan_s = bigram_lm_score(df, broadcast_model=False)._jdf.queryExecution().toString()
    # the model join must NOT be broadcast in fallback mode; the only
    # broadcast left is the scalar vocab-size cross join (nested-loop)
    assert "BroadcastHashJoin" not in plan_s

    got_b = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_lm_score(df, broadcast_model=True).collect()
    }
    got_s = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_lm_score(df, broadcast_model=False).collect()
    }
    got_a = {
        r["doc_id"]: (r["n_bigrams"], r["avg_nll"])
        for r in bigram_lm_score(df, broadcast_model="auto").collect()
    }
    assert got_b == got_s == got_a

    # auto over-threshold degrades to the shuffle plan
    plan_a0 = bigram_lm_score(
        df, broadcast_model="auto", broadcast_max_types=1
    )._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" not in plan_a0
