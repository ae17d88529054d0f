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

__all__ = ["pack_sequences", "pack_stats"]


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
