"""Sequence packing (concat-and-chunk), Gopher quality filter, and
n-gram decontamination — pure-Python oracles + plan assertions.

The packing invariant here is the north rule's per-row token-array
equality, applied to the operator most likely to scramble it: flattening
a source's chunks in chunk order must reproduce the source's document
token streams byte-for-byte.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from getml_community_spark.operators.packing import pack_sequences, pack_stats
from getml_community_spark.operators.textstats import (
    gopher_quality,
    ngram_contamination,
)


@pytest.fixture(scope="module")
def tok_df(spark):
    """Deterministic tokenized docs: 3 sources, doc lengths spanning
    'shorter than ctx', 'exactly ctx', 'straddles many chunks', empty."""
    rng = np.random.default_rng(7)
    rows = []
    doc_id = 0
    for src in ("a", "b", "c"):
        for _ in range(40):
            n = int(rng.integers(0, 70))  # includes empty docs
            rows.append((doc_id, src, rng.integers(0, 1000, n).tolist()))
            doc_id += 1
    # one doc far longer than ctx (straddles many chunks)
    rows.append((doc_id, "a", rng.integers(0, 1000, 500).tolist()))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "tokens"]),
        "doc_id long, source string, tokens array<int>",
    )


CTX = 32


def test_pack_sequences_token_array_equality(spark, tok_df):
    packed = pack_sequences(tok_df, CTX).orderBy("source", "chunk_id").toPandas()
    docs = (
        tok_df.where(F.size("tokens") > 0)
        .orderBy("source", "doc_id")
        .toPandas()
    )
    for src in docs["source"].unique():
        want = [t for arr in docs[docs.source == src]["tokens"] for t in arr]
        got_chunks = list(packed[packed.source == src]["tokens"])
        got = [t for arr in got_chunks for t in arr]
        assert got == want, f"token stream scrambled for source {src}"
        # every chunk except the last is exactly CTX tokens
        assert all(len(c) == CTX for c in got_chunks[:-1])
        assert 1 <= len(got_chunks[-1]) <= CTX
        # chunk ids are dense from 0
        ids = list(packed[packed.source == src]["chunk_id"])
        assert ids == list(range(len(ids)))


def test_pack_stats_matches_pack_sequences(spark, tok_df):
    stats = pack_stats(tok_df, CTX).orderBy("source", "chunk_id").toPandas()
    packed = pack_sequences(tok_df, CTX).orderBy("source", "chunk_id").toPandas()
    assert list(stats["n_tok"]) == [len(t) for t in packed["tokens"]]
    assert list(stats["sum_tok"]) == [int(sum(t)) for t in packed["tokens"]]
    assert list(stats["n_docs"]) == list(packed["n_docs"])


def test_pack_long_doc_straddles_chunks(spark):
    # one 100-token doc at offset 10 → pieces in chunks 0..3 of ctx 32
    df = spark.createDataFrame(
        [(0, "s", list(range(10))), (1, "s", list(range(100, 200)))],
        "doc_id long, source string, tokens array<int>",
    )
    packed = pack_sequences(df, 32).orderBy("chunk_id").toPandas()
    assert list(packed["chunk_id"]) == [0, 1, 2, 3]
    assert list(packed["n_docs"]) == [2, 1, 1, 1]  # doc 1 spans all four
    flat = [t for arr in packed["tokens"] for t in arr]
    assert flat == list(range(10)) + list(range(100, 200))


def test_pack_rejects_bad_ctx(spark, tok_df):
    with pytest.raises(ValueError):
        pack_sequences(tok_df, 0).collect()


def test_gopher_rules_on_crafted_docs(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and runs off to have "
        "a rest with some other animals that live nearby in the forest"
    )
    docs = [
        (0, good),  # passes everything
        (1, "short text"),  # too few words
        (2, good + " ###### " * 6),  # symbol ratio blown
        (3, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n- nine\n- ten"),  # bullets
        (4, ("same line\n" * 10) + good),  # duplicate lines
        (5, good.replace(" ", "... ")),  # ellipsis symbols
        (6, "x1 y2 " * 30),  # no stopwords, low alpha... alpha ok; stopwords=0
    ]
    out = (
        gopher_quality(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "text",
            "doc_id",
            min_words=15,
            min_stop_hits=2,
        )
        .orderBy("doc_id")
        .toPandas()
    )
    assert bool(out.loc[0, "keep"]) is True
    assert bool(out.loc[1, "keep"]) is False  # n_words < 15
    assert out.loc[2, "symbol_ratio"] > 0.1 and not out.loc[2, "keep"]
    assert out.loc[3, "bullet_frac"] >= 0.9 and not out.loc[3, "keep"]
    assert out.loc[4, "dup_line_frac"] > 0.3 and not out.loc[4, "keep"]
    assert out.loc[5, "symbol_ratio"] > 0.1 and not out.loc[5, "keep"]
    assert out.loc[6, "stop_hits"] == 0 and not out.loc[6, "keep"]


def test_gopher_is_shuffle_free(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = gopher_quality(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map


def test_ngram_contamination_counts(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # shares 'alpha beta gamma delta epsilon' (and one more 5-gram)
            (0, "alpha beta gamma delta epsilon zeta eta"),
            (1, "totally different words with no overlap at all here"),
            (2, "tiny"),  # < n words → 0 shingles
        ],
        "doc_id long, text string",
    )
    out = (
        ngram_contamination(docs, bench, "text", "doc_id", n=5)
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(out["contaminated"]) == [True, False, False]
    assert out.loc[0, "n_contaminated"] == 2  # both 5-grams hit
    assert out.loc[2, "n_shingles"] == 0


def test_ngram_contamination_broadcasts_benchmark(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    plan = (
        ngram_contamination(docs, bench, "text", "doc_id", n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus never shuffles for the probe


def test_repetition_stats_rules(spark):
    """Gopher repetition sub-table: a spammy doc trips the thresholds, a
    long clean doc passes, a too-short doc appears with zero fractions."""
    from getml_community_spark.operators.textstats import repetition_stats

    clean = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "other animals watch from a distant hill under morning light "
        "and nobody repeats anything important in this long sentence "
        "because every clause introduces fresh words and new ideas"
    )
    rows = [
        (0, clean),
        (1, "buy now " * 40),            # one 2-gram dominates
        (2, ("alpha beta gamma delta epsilon zeta " * 10) + "end"),  # dup 5-grams
        (3, "tiny"),                      # < 2 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert len(out) == 4  # short doc still present
    assert out[0]["keep_repetition"] is True
    assert out[1]["keep_repetition"] is False
    assert out[1]["top_2gram_frac"] > 0.2
    assert out[2]["keep_repetition"] is False
    assert out[2]["dup_5gram_frac"] > 0.15
    assert out[3]["top_2gram_frac"] == 0.0 and out[3]["keep_repetition"] is True


def test_top_gram_is_argmax_by_count_not_coverage(spark):
    """Round-4 advice: the top n-gram must be the MOST FREQUENT one
    (Gopher/DataTrove), not the one maximizing count*length — a longer
    but rarer gram must not win."""
    from getml_community_spark.operators.textstats import repetition_stats

    # 2-grams: "a b" occurs 5x (covered 5*3=15); "longword1 longword2"
    # occurs 2x (covered 2*19=38 > 15) — old max(count*len) picked the
    # rare long gram; the Gopher definition picks "a b".
    text = ("a b " * 5) + ("longword1 longword2 " * 2)
    df = spark.createDataFrame([(0, text.strip())], "doc_id long, text string")
    row = repetition_stats(df).collect()[0]
    ws = text.split()
    chars = len(" ".join(ws))
    # most frequent 2-gram by count is ("b a") count 4? enumerate in
    # python to stay honest about overlapping grams
    from collections import Counter

    c2 = Counter(" ".join(ws[i : i + 2]) for i in range(len(ws) - 1))
    top_count = max(c2.values())
    cands = [g for g, c in c2.items() if c == top_count]
    # tie-break: covered chars, then lexicographic
    best = max(cands, key=lambda g: (top_count * len(g), g))
    import math

    want = math.floor(top_count * len(best) / chars * 1e6 + 0.5) / 1e6
    assert row["top_2gram_frac"] == want


def test_chunk_tokens_matches_bruteforce(spark):
    import random

    from getml_community_spark.operators.packing import chunk_tokens

    rng = random.Random(7)
    rows = []
    for i in range(200):
        n = rng.choice([0, 1, 3, 7, 8, 9, 63, 64, 65, 100, 257])
        rows.append((f"d{i:03d}", [rng.randrange(1000) for _ in range(n)], f"s{i%3}"))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")

    size, stride, min_tokens = 64, 48, 8
    got = (
        chunk_tokens(df, size=size, stride=stride, min_tokens=min_tokens)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )

    exp = []
    for doc_id, toks, source in rows:
        starts = list(range(0, max(len(toks), 1), stride)) if toks else []
        for ci, s in enumerate(starts):
            ch = toks[s : s + size]
            if ci > 0 and len(ch) < min_tokens:
                continue
            exp.append((doc_id, source, ci, s, ch, len(ch)))
    exp.sort(key=lambda r: (r[0], r[2]))
    assert len(got) == len(exp)
    for r, (doc_id, source, ci, s, ch, ln) in zip(got.itertuples(index=False), exp):
        assert (r.doc_id, r.source, r.chunk_id, r.chunk_start) == (doc_id, source, ci, s)
        assert list(r.tokens) == ch and r.n_tok == ln

    # padded form: every array exactly `size` long, n_tok unchanged,
    # pad suffix all pad_id
    pad = (
        chunk_tokens(df, size=size, stride=stride, min_tokens=min_tokens, pad_id=-1)
        .toPandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert len(pad) == len(exp)
    for r, (_, _, _, _, ch, ln) in zip(pad.itertuples(index=False), exp):
        assert len(r.tokens) == size and r.n_tok == ln
        assert list(r.tokens[:ln]) == ch
        assert all(t == -1 for t in r.tokens[ln:])

    # disjoint default reassembles every document exactly
    # (token-array-equality invariant, input_hint)
    dis = chunk_tokens(df, size=size).toPandas()
    re = {}
    for r in dis.sort_values(["doc_id", "chunk_id"]).itertuples(index=False):
        re.setdefault(r.doc_id, []).extend(r.tokens)
    for doc_id, toks, _ in rows:
        if toks:
            assert re[doc_id] == toks


def test_bm25_scores_match_reference(spark):
    import math

    from getml_community_spark.operators.textstats import bm25_scores

    docs = [
        ("d1", "spark scan scan join fast"),
        ("d2", "join join join slow table"),
        ("d3", "nothing relevant here at all"),
        ("d4", "spark"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r.doc_id: r.score_micro
        for r in bm25_scores(df, ["spark", "join"]).collect()
    }
    assert set(got) == {"d1", "d2", "d4"}  # d3 has no query term

    # reference computation (same formula, same quantization)
    toks = {d: t.split() for d, t in docs}
    N = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / N
    k1, b = 1.2, 0.75
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in ("spark", "join")
    }
    exp = {}
    for d, v in toks.items():
        total = 0
        for t in ("spark", "join"):
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s = idf * (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(v) / avgdl)
            )
            total += math.floor(s * 1e6 + 0.5)
        if total:
            exp[d] = total
    assert got == exp
    # more query-term mass ranks higher
    assert got["d2"] > got["d4"]


def test_write_training_shards_roundtrip(spark, tmp_path):
    from getml_community_spark.checkpoint import SnapshotTable
    from getml_community_spark.operators.packing import write_training_shards

    rows = []
    rng = __import__("random").Random(3)
    tok = 0
    for i in range(60):
        n = rng.choice([5, 17, 40, 64, 130])
        rows.append(
            (f"d{i:03d}", list(range(tok, tok + n)), f"s{i % 2}")
        )
        tok += n
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")

    out = str(tmp_path / "shards")
    rep = write_training_shards(
        df, out, ctx_len=64, chunks_per_shard=4, drop_last=True
    )
    t = SnapshotTable(out, partition_by=["source", "shard"])
    back = t.read(spark).toPandas()
    assert rep["examples"] == len(back) > 0
    assert rep["tokens"] == 64 * len(back)  # drop_last: all full
    assert (back.n_tok == 64).all()
    assert back["tokens"].map(len).eq(64).all()
    assert rep["shards"] == len(back.groupby(["source", "shard"]))

    # shard assignment deterministic: shard == chunk_id // 4
    assert (back.shard == back.chunk_id // 4).all()

    # token-array equality through the STORE: per source, flattened
    # chunks == concatenation of docs' tokens truncated to full chunks
    for src in ("s0", "s1"):
        concat = []
        for doc_id, toks, s in rows:
            if s == src:
                concat.extend(toks)
        got = []
        for r in (
            back[back.source == src]
            .sort_values("chunk_id")
            .itertuples(index=False)
        ):
            got.extend(r.tokens)
        assert got == concat[: len(concat) - (len(concat) % 64)]

    # padded mode: arrays all ctx_len, pad suffix correct, n_tok real
    out2 = str(tmp_path / "shards2")
    rep2 = write_training_shards(
        df, out2, ctx_len=64, chunks_per_shard=4, drop_last=False, pad_id=-1
    )
    back2 = SnapshotTable(out2).read(spark).toPandas()
    assert back2["tokens"].map(len).eq(64).all()
    short = back2[back2.n_tok < 64]
    assert len(short) == 2  # one tail chunk per source
    for r in short.itertuples(index=False):
        assert all(t == -1 for t in r.tokens[r.n_tok:])
    assert rep2["tokens"] == sum(len(t) for _, t, _ in rows)

    # a second append into the same table reports ONLY its own write
    rep3 = write_training_shards(
        df, out, ctx_len=64, chunks_per_shard=4, drop_last=True
    )
    assert rep3["examples"] == rep["examples"]
    assert (
        SnapshotTable(out).read(spark).count() == 2 * rep["examples"]
    )


def _naive_bpe(word_counts, num_merges):
    """Recount-everything reference (same conventions as train_bpe:
    zip pair counts, lexicographic tie-break, left-to-right
    non-overlapping merges)."""
    from collections import Counter

    from getml_community_spark.operators.bpe import _merge_word

    words = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items() if w}
    merges = []
    for _ in range(num_merges):
        stats = Counter()
        for w, c in words.items():
            for p in zip(w, w[1:]):
                stats[p] += c
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if stats[best] <= 0:
            break
        merges.append(best)
        words = {
            _merge_word(w, best): c for w, c in words.items()
        }
    return merges


def test_bpe_train_matches_naive_reference_and_paper_example():
    import random

    from getml_community_spark.operators.bpe import (
        bpe_segment_word,
        train_bpe_from_counts,
    )

    # Sennrich et al. 2016 toy corpus: the first merges fuse the
    # frequent suffixes (tie-breaks are ours, but 'es'/'est' fusion
    # must appear among the first merges)
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_from_counts(wc, 6)
    assert ("e", "s") in merges and ("es", "t") in merges

    # incremental trainer == recount-everything reference on random
    # corpora (same conventions)
    rng = random.Random(9)
    alphabet = "abcd"
    for trial in range(5):
        wc = {
            "".join(
                rng.choice(alphabet)
                for _ in range(rng.randint(1, 6))
            ): rng.randint(1, 20)
            for _ in range(40)
        }
        assert train_bpe_from_counts(wc, 15) == _naive_bpe(wc, 15)

    # segmentation preserves the word (concat of pieces == word + </w>)
    ranks = {tuple(p): i for i, p in enumerate(train_bpe_from_counts(wc, 15))}
    for w in wc:
        pieces = bpe_segment_word(w, ranks)
        assert "".join(pieces) == w + "</w>"


def test_apply_bpe_spark_matches_driver_segmentation(spark):
    from getml_community_spark.operators.bpe import (
        apply_bpe,
        bpe_segment_word,
        train_bpe,
    )

    rows = [
        ("a", "the lowest low rates, the newest widest views!"),
        ("b", "lower and lower, newest of the new"),
        ("c", ""),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    merges = train_bpe(df, num_merges=30)
    assert merges  # trained something
    got = {r.id: r.pieces for r in apply_bpe(df, merges).collect()}

    import re

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for rid, text in rows:
        if text is None:
            assert got[rid] is None
            continue
        exp = []
        for w in re.split(r"[^a-z0-9']+", text.lower()):
            if w:
                exp.extend(bpe_segment_word(w, ranks))
        assert list(got[rid]) == exp
    # round-trip: pieces concat per doc == the tokenized words + </w>
    joined = "".join(got["a"])
    assert joined.count("</w>") == 8  # eight words in doc a


def test_apply_bpe_ids_roundtrip(spark):
    from getml_community_spark.operators.bpe import (
        apply_bpe,
        apply_bpe_ids,
        bpe_vocab,
        train_bpe,
    )

    df = spark.createDataFrame(
        [("a", "low lower lowest newest new widest wide the the the")],
        "id string, text string",
    )
    merges = train_bpe(df, num_merges=25)
    vocab = bpe_vocab(merges)
    inv = {i: p for p, i in vocab.items()}
    pieces = apply_bpe(df, merges).collect()[0].pieces
    ids = apply_bpe_ids(df, merges).collect()[0].tokens
    assert len(ids) == len(pieces)
    # ids decode back to the exact piece sequence (none unk here: all
    # chars of this corpus appear in merge sides)
    assert [inv.get(i, "<unk>") for i in ids] == list(pieces)
    # id space: contiguous, merges after base symbols, deterministic
    assert sorted(vocab.values()) == list(range(len(vocab)))


# ---- property-based fuzz (hypothesis, driver-only) ------------------ #
try:
    from hypothesis import given, settings, strategies as st

    _wc = st.dictionaries(
        st.text(alphabet="abcde'", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
        min_size=1,
        max_size=60,
    )

    @settings(max_examples=150, deadline=None)
    @given(_wc, st.integers(min_value=1, max_value=25))
    def test_bpe_trainer_fuzz(wc, n_merges):
        """Incremental-pair-stat trainer == recount-everything reference
        for arbitrary word-frequency tables (apostrophes, repeats,
        single chars included), and every trained segmentation
        reconstructs its word exactly."""
        from getml_community_spark.operators.bpe import (
            bpe_segment_word,
            train_bpe_from_counts,
        )

        merges = train_bpe_from_counts(wc, n_merges)
        assert merges == _naive_bpe(wc, n_merges)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for w in wc:
            assert "".join(bpe_segment_word(w, ranks)) == w + "</w>"

except ImportError:  # pragma: no cover — hypothesis not installed
    pass
