"""Unicode text normalization — the canonicalization step every
text-curation pipeline runs before tokenizing/fingerprinting (mixed
NFC/NFD sources hash differently: 'café' composed vs decomposed are
different byte strings but the same text).

Reference scope note: the reference engine's string ops are byte-level
(src/python-api/getml/data/columns — substr/contains/etc.); unicode
canonicalization is part of the beyond-reference curation layer, like
PII scan and quality scoring.

Spark shape: the UAX#15 normalization itself has no Catalyst builtin,
so it runs as an Arrow-batched ``pandas_udf`` over CPython's
``unicodedata`` (a C implementation — the per-row work is the unicode
algorithm itself, the same class as the numpy codec kernels; this is
NOT a row-at-a-time Python-lambda UDF). The cheap byte-level cleanups
(control-char strip, whitespace collapse) stay JVM-side regexp_replace
so Catalyst can pipeline them, and their patterns are kept inside the
Java ∩ RE2 dialect intersection so the DuckDB oracle replays them
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["normalize_text"]

# explicit classes (no \s shorthand): Java and RE2 disagree on \s edges
_CONTROL = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
_WS_RUN = "[ \\t\\n\\r]+"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    strip_control: bool = True,
    collapse_ws: bool = False,
) -> DataFrame:
    """Normalize ``text_col`` to the given UAX#15 form (NFC / NFKC /
    NFD / NFKD), optionally strip C0/DEL control characters and
    collapse whitespace runs to single spaces (with trim).

    Scale shape: map-only — zero shuffles; the UDF is Arrow-batched and
    stateless, so it pipelines with the scan at full parallelism.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(form)
    out_col = out_col or text_col

    @pandas_udf("string")
    def _norm(s):
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    col = _norm(F.col(text_col))
    if strip_control:
        col = F.regexp_replace(col, _CONTROL, "")
    if collapse_ws:
        col = F.trim(F.regexp_replace(col, _WS_RUN, " "))
    return df.withColumn(out_col, col)
