"""Sequence packing: concat-and-chunk pre-tokenized documents into
fixed-length training examples.

The standard LLM-training data layout ("packing"): per source, documents
are concatenated in a deterministic order and the token stream is cut
into consecutive ``ctx_len``-token chunks; a document whose tokens
straddle a chunk boundary contributes a slice to each chunk it overlaps.
This generalizes the reference's notion of deterministic row-order
materialization (its DataFrame append/slice surface,
src/python-api/getml/data/data_frame.py) to the token axis — the
operation a tokenized-corpus pipeline runs right before writing
training shards.

Distributed shape (the 100 TB plan):
- chunk assignment is pure window arithmetic per source (one shuffle on
  ``source`` for the running token offset, map-side thereafter);
- a document explodes into AT MOST ceil(n_tok/ctx_len)+1 pieces — the
  explode factor is bounded by the document's own length, never by the
  corpus;
- assembly is one groupBy on (source, chunk_id) whose state per group is
  exactly ctx_len tokens — bounded regardless of corpus size;
- everything is JVM-side Catalyst expressions (sequence/slice/flatten),
  no Python in the path.

Skew note: the per-source running offset uses a window over the whole
source; for a single pathologically hot source the window itself is the
bottleneck — upstream salting cannot apply here because the offset is a
global prefix sum per source. At 100 TB you shard hot sources into
deterministic sub-sources upstream (source, doc_id % k) if one source
exceeds an executor's scan throughput; chunk ids stay deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pack_sequences", "pack_stats", "chunk_tokens", "write_training_shards"]


def _pieces(
    df: DataFrame, ctx_len: int, tokens_col: str, id_col: str, source_col: str
) -> DataFrame:
    """Per-(doc, chunk) token slices: the shared chunk-assignment core.

    Output columns: source, chunk_id, __start (the doc's global token
    offset — the within-chunk sort key), __piece (the token slice this
    doc contributes to this chunk).
    """
    if ctx_len <= 0:
        raise ValueError("ctx_len must be positive")
    ctx = F.lit(ctx_len).cast("long")
    n = F.size(tokens_col).cast("long")
    w = Window.partitionBy(source_col).orderBy(id_col)

    # global token span of each doc within its source: [start, end)
    spans = df.where(F.size(tokens_col) > 0).select(
        source_col,
        F.col(tokens_col).alias("__toks"),
        (F.sum(n).over(w) - n).alias("__start"),
        n.alias("__n"),
    )

    # a doc spans chunks floor(start/ctx) .. floor((end-1)/ctx)
    first_c = (F.col("__start") / ctx).cast("long")
    last_c = ((F.col("__start") + F.col("__n") - 1) / ctx).cast("long")
    pieces = spans.select(
        source_col,
        "__start",
        "__toks",
        "__n",
        F.explode(F.sequence(first_c, last_c)).alias("chunk_id"),
    )
    lo = F.greatest(F.col("__start"), F.col("chunk_id") * ctx)  # global, incl
    hi = F.least(F.col("__start") + F.col("__n"), (F.col("chunk_id") + 1) * ctx)
    return pieces.select(
        source_col,
        "chunk_id",
        "__start",
        # slice() is 1-based; length = hi - lo
        F.slice(
            F.col("__toks"),
            (lo - F.col("__start") + 1).cast("int"),
            (hi - lo).cast("int"),
        ).alias("__piece"),
    )


def pack_sequences(
    df: DataFrame,
    ctx_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Pack ``tokens_col`` arrays into exact ``ctx_len``-token chunks.

    Returns one row per (source, chunk_id) with the packed ``tokens``
    array (exactly ``ctx_len`` tokens except each source's final chunk),
    ``n_tok`` and ``n_docs`` (documents contributing at least one token
    to the chunk). Order within a chunk is by the documents' global
    token offsets — i.e. the concatenation order (``id_col`` ascending
    per source).

    Invariant (pytest-enforced): flattening a source's chunks in
    chunk_id order reproduces the concatenation of its documents'
    token arrays exactly — token-array equality end-to-end.
    """
    pieces = _pieces(df, ctx_len, tokens_col, id_col, source_col)
    # assemble: per (source, chunk) state is <= ctx_len tokens
    assembled = pieces.groupBy(source_col, "chunk_id").agg(
        F.flatten(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("__start").alias("s"), F.col("__piece").alias("p")
                        )
                    )
                ),
                lambda x: x["p"],
            )
        ).alias("tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return assembled.select(
        source_col,
        "chunk_id",
        "tokens",
        F.size("tokens").cast("long").alias("n_tok"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


def pack_stats(
    df: DataFrame,
    ctx_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Chunk-level packing statistics WITHOUT materializing the packed
    arrays: (source, chunk_id, n_docs, n_tok, sum_tok). Piece length and
    piece token-sum reduce map-side BEFORE the (source, chunk_id)
    shuffle, so only three longs per piece cross the wire — the
    planner's cheap dry-run for shard sizing ahead of a real
    :func:`pack_sequences` write."""
    pieces = _pieces(df, ctx_len, tokens_col, id_col, source_col)
    per_piece = pieces.select(
        source_col,
        "chunk_id",
        F.size("__piece").cast("long").alias("__len"),
        F.aggregate(
            "__piece", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        ).alias("__sum"),
    )
    return per_piece.groupBy(source_col, "chunk_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__len").cast("long").alias("n_tok"),
        F.sum("__sum").cast("long").alias("sum_tok"),
    )


def chunk_tokens(
    df: DataFrame,
    size: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    min_tokens: int = 1,
    pad_id: int | None = None,
) -> DataFrame:
    """Per-document fixed-size token windows with optional overlap —
    the long-document splitting step (RAG chunking / HF
    ``return_overflowing_tokens``) that complements cross-document
    :func:`pack_sequences`.

    Window starts are ``0, stride, 2*stride, ...`` while the start is
    inside the document; each chunk is the next ``size`` tokens (the
    final chunk may be short). ``stride < size`` gives overlapping
    context windows; default ``stride=size`` is a disjoint split. Tail
    chunks shorter than ``min_tokens`` are dropped EXCEPT a document's
    first chunk (a short document still yields one chunk). With
    ``pad_id`` the emitted array is right-padded to exactly ``size``
    (``n_tok`` stays the unpadded length — the attention-mask
    boundary).

    Output: input columns minus ``tokens_col`` plus (chunk_id,
    chunk_start, tokens, n_tok). Input columns named like an output
    column are superseded by the chunk-level value (the corpus's
    doc-level ``n_tok`` becomes the chunk's length — the doc total is
    recoverable as the sum over its disjoint chunks).

    Scale shape: zero shuffles — pure per-row JVM expressions
    (sequence → posexplode → slice); the explode factor is bounded by
    each document's own length over ``stride``, never by the corpus.
    Skew-free by construction (no keys). At 10^12 sequences this is a
    map-only pass that pipelines into the shard writer.
    """
    stride = size if stride is None else stride
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    if min_tokens > size:
        raise ValueError("min_tokens cannot exceed size")
    n = F.size(F.col(tokens_col))
    nch = F.floor((n - F.lit(1)) / F.lit(stride)) + 1  # valid when n > 0
    starts = F.when(
        n > 0,
        F.sequence(F.lit(0).cast("long"), (nch - 1) * stride, F.lit(stride).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    passthrough = [
        c
        for c in df.columns
        if c not in (tokens_col, "chunk_id", "chunk_start", "n_tok", "tokens")
    ]
    ex = df.select(
        *passthrough,
        F.col(tokens_col).alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "chunk_start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_start") + 1, size)
    real_len = F.size(chunk)
    if pad_id is not None:
        elem_t = [f.dataType for f in df.schema.fields if f.name == tokens_col][
            0
        ].elementType.simpleString()
        chunk_out = F.concat(
            chunk,
            F.array_repeat(F.lit(pad_id).cast(elem_t), size - real_len),
        )
    else:
        chunk_out = chunk
    return (
        ex.select(
            *passthrough,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("chunk_start").cast("long").alias("chunk_start"),
            chunk_out.alias("tokens"),
            real_len.cast("long").alias("n_tok"),
        )
        .where((F.col("chunk_id") == 0) | (F.col("n_tok") >= min_tokens))
    )


def write_training_shards(
    df: DataFrame,
    out_root: str,
    ctx_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    source_col: str = "source",
    chunks_per_shard: int = 1024,
    pad_id: int | None = None,
    drop_last: bool = True,
) -> dict:
    """The pipeline's terminal step: pack the tokenized corpus into
    exact ``ctx_len``-token training examples and write them as
    deterministic shards into a snapshot-versioned store.

    - examples come from :func:`pack_sequences` (per-source concat-and-
      chunk; token-array equality invariant);
    - each source's final short chunk is dropped (``drop_last=True``,
      the usual pre-training choice) or right-padded with ``pad_id``
      (``n_tok`` keeps the real length — the attention-mask boundary);
    - ``shard = chunk_id // chunks_per_shard`` — deterministic,
      re-runnable, no global counters;
    - the write is ONE job into a
      :class:`~getml_community_spark.checkpoint.SnapshotTable`
      partitioned by (source, shard): atomic manifest commit, time
      travel, incremental `changes()` downstream, and a trainer can
      read any (source, shard) subset with manifest-level pruning.

    Returns {"snapshot", "shards", "examples", "tokens"}.

    Scale shape: pack's one window + one group-agg shuffle, then a
    map-side shard assignment; no extra shuffle (the partitioned write
    re-sorts within tasks only). Skew: a hot source serializes in
    pack's per-source prefix-sum window — shard it upstream into
    deterministic sub-sources (see pack_sequences docstring).
    """
    from ..checkpoint import SnapshotTable

    packed = pack_sequences(df, ctx_len, tokens_col, id_col, source_col)
    if drop_last and pad_id is not None:
        raise ValueError("choose drop_last OR pad_id, not both")
    if drop_last:
        packed = packed.where(F.col("n_tok") == ctx_len)
    elif pad_id is not None:
        elem_t = [
            f.dataType
            for f in df.schema.fields
            if f.name == tokens_col
        ][0].elementType.simpleString()
        packed = packed.withColumn(
            "tokens",
            F.concat(
                F.col("tokens"),
                F.array_repeat(
                    F.lit(pad_id).cast(elem_t),
                    (ctx_len - F.col("n_tok")).cast("int"),
                ),
            ),
        )
    shards = packed.withColumn(
        "shard", (F.col("chunk_id") / chunks_per_shard).cast("long")
    )
    table = SnapshotTable(out_root, partition_by=[source_col, "shard"])
    parent = table.current_snapshot_id()
    sid = table.append(shards)
    # report stats for THIS append only (incremental scan), not any
    # prior shard generations living in the same table
    written = (
        table.changes(df.sparkSession, parent)
        if parent
        else table.read(df.sparkSession)
    )
    stats = (
        written
        .agg(
            F.count(F.lit(1)).alias("examples"),
            F.sum("n_tok").alias("tokens"),
            F.countDistinct(source_col, "shard").alias("shards"),
        )
        .collect()[0]
    )
    return {
        "snapshot": sid,
        "shards": int(stats["shards"]),
        "examples": int(stats["examples"]),
        "tokens": int(stats["tokens"] or 0),
    }
