"""FastPropPipeline — the reference's Pipeline UX
(src/python-api/getml/pipeline/pipeline.py: fit / transform / to_sql)
over the Spark-native FastProp-lite enumeration.

fit(): enumerate the conditions × aggregations grid on the training
population (one multi-aggregate groupBy), optionally score features by
sampled single-feature R² against a target (the reference's selection,
FastProp.cpp:270,550) and keep the top_k. transform(): compute exactly
the fitted features for any population (same spec, new rows). to_sql():
render each fitted feature as one portable SQL expression from the
AGG_SQL templates (the reference's per-feature transpilation,
HumanReadableSQLGenerator.cpp), so the fitted pipeline can run on any
ANSI engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..operators.fastprop import fastprop_features, select_features

__all__ = ["FastPropPipeline"]


@dataclass
class FastPropPipeline:
    """Declarative feature-learning pipeline (fit → transform → to_sql).

    Join/window spec mirrors asof_features; enumeration knobs mirror
    fastprop_features. ``top_k`` with a target column at fit time turns
    on sampled-R² selection.
    """

    on: list[str] | str
    population_id: str
    pop_ts: str
    peri_ts: str
    value_cols: list[str]
    aggs: tuple[str, ...] = ("count", "sum", "avg", "min", "max")
    categorical_cols: tuple[str, ...] = ()
    n_most_frequent: int = 3
    n_lag_splits: int = 0
    same_units_pairs: tuple[tuple[str, str], ...] = ()
    horizon: float = 0.0
    memory: float | None = None
    top_k: int | None = None
    sample_fraction: float | None = None

    # fitted state
    features_: list[str] = field(default_factory=list, repr=False)
    scores_: list[tuple[str, float]] = field(default_factory=list, repr=False)
    # fit-time learned top-category VALUES per categorical column — the
    # reference stores the fitted categorical_value_ inside each feature
    # (fastprop/SQLMaker.cpp:34-36, ConditionParser.cpp:59-62) so
    # `<cat>_top<r>` means the SAME category at transform/SQL time even
    # when category frequencies shift (no train/serve skew).
    categories_: dict[str, list] = field(default_factory=dict, repr=False)
    fitted_: bool = False

    def _compute(self, population: DataFrame, peripheral: DataFrame) -> DataFrame:
        return fastprop_features(
            population,
            peripheral,
            on=self.on,
            population_id=self.population_id,
            pop_ts=self.pop_ts,
            peri_ts=self.peri_ts,
            value_cols=self.value_cols,
            aggs=self.aggs,
            categorical_cols=self.categorical_cols,
            n_most_frequent=self.n_most_frequent,
            n_lag_splits=self.n_lag_splits,
            same_units_pairs=self.same_units_pairs,
            horizon=self.horizon,
            memory=self.memory,
            fitted_categories=self.categories_ or None,
        )

    def fit(
        self,
        population: DataFrame,
        peripheral: DataFrame,
        target_col: str | None = None,
    ) -> "FastPropPipeline":
        from ..operators.fastprop import top_categories

        self.fitted_ = False
        self.categories_ = {
            ccol: top_categories(peripheral, ccol, self.n_most_frequent)
            for ccol in self.categorical_cols
        }
        out = self._compute(population, peripheral)
        enumerated = [c for c in out.columns if "__" in c]
        if target_col is not None and self.top_k is not None:
            self.scores_ = select_features(
                out,
                enumerated,
                target_col,
                k=self.top_k,
                sample_fraction=self.sample_fraction,
            )
            self.features_ = [f for f, _ in self.scores_]
        else:
            self.features_ = enumerated
            self.scores_ = []
        self.fitted_ = True
        return self

    def transform(self, population: DataFrame, peripheral: DataFrame) -> DataFrame:
        """Population id + the fitted feature columns for NEW data."""
        if not self.fitted_:
            raise RuntimeError("fit() before transform()")
        out = self._compute(population, peripheral)
        return out.select(self.population_id, *self.features_)

    def fit_transform(
        self,
        population: DataFrame,
        peripheral: DataFrame,
        target_col: str | None = None,
    ) -> DataFrame:
        return self.fit(population, peripheral, target_col).transform(
            population, peripheral
        )

    def to_sql(
        self,
        population: str = "population",
        peripheral: str = "peripheral",
        peri_key: str | None = None,
    ) -> dict[str, str]:
        """Portable SQL per fitted feature: one SELECT per feature over
        the windowed LEFT JOIN (the reference transpiles one CREATE
        TABLE per feature; any ANSI engine with the AGG_SQL dialect —
        DuckDB here — can run these)."""
        if not self.fitted_:
            raise RuntimeError("fit() before to_sql()")
        from .to_sql import AGG_SQL, _w

        on = [self.on] if isinstance(self.on, str) else list(self.on)
        peri_key = peri_key or on[0]
        join_keys = " AND ".join(f"t2.{k} = t1.{k}" for k in on)
        out: dict[str, str] = {}
        for feat in self.features_:
            agg, vc, cond = feat.split("__", 2)
            x = f"t2.{vc}"
            if cond != "all":
                x = f"CASE WHEN {self._cond_sql(cond, peripheral)} THEN t2.{vc} END"
            expr = AGG_SQL[agg].format(
                v=x, t=f"epoch(t2.{self.peri_ts})", tr=f"epoch(t1.{self.pop_ts})"
            )
            # bare alias (no quotes): feature names are valid identifiers
            # in both DuckDB and Spark SQL — double-quoted aliases would
            # parse as STRING literals on Spark with ANSI off
            out[feat] = (
                f"SELECT t1.{self.population_id}, {expr} AS {feat}\n"
                f"FROM {population} t1\n"
                f"LEFT JOIN {peripheral} t2\n"
                f"  ON {join_keys}\n"
                f" AND {_w(f't1.{self.pop_ts}', self.horizon, self.memory, f't2.{self.peri_ts}')}\n"
                f"GROUP BY t1.{self.population_id}"
            )
        return out

    # ---- persistence (reference: pipeline save/load by name,
    # pipeline/helpers2.py:95; SQL script save, sql_code.py:129) ------ #
    def save(self, path: str) -> None:
        """Serialize the spec AND the fitted state (features, scores,
        pinned categories) to one JSON file — a loaded pipeline
        transforms/transpiles identically without refitting. Fitted
        category values keep their Python TYPES through the round-trip
        (type-tagged, not stringified): a datetime/Decimal category that
        silently became a string would compare unequal against the typed
        column at transform time — exactly the train/serve skew the
        pinning exists to prevent. Unsupported types fail at save time."""
        import dataclasses
        import json

        d = dataclasses.asdict(self)
        d["categories_"] = {
            c: [_tag_category(v) for v in vals]
            for c, vals in self.categories_.items()
        }
        with open(path, "w") as f:
            json.dump(d, f, indent=1, default=_np_jsonable)

    @classmethod
    def load(cls, path: str) -> "FastPropPipeline":
        import json

        with open(path) as f:
            d = json.load(f)
        # JSON round-trips tuples as lists; restore the tuple-typed specs
        d["aggs"] = tuple(d["aggs"])
        d["categorical_cols"] = tuple(d["categorical_cols"])
        d["same_units_pairs"] = tuple(tuple(p) for p in d["same_units_pairs"])
        d["scores_"] = [tuple(s) for s in d["scores_"]]
        d["categories_"] = {
            c: [_untag_category(v) for v in vals]
            for c, vals in d.get("categories_", {}).items()
        }
        return cls(**d)

    def _cond_sql(self, cond: str, peripheral: str = "peripheral") -> str:
        """SQL predicate for an enumerated condition name."""
        if cond.startswith("lag"):
            j = int(cond[3:])
            step = float(self.memory) / self.n_lag_splits
            lo = float(self.horizon) + j * step
            hi = float(self.horizon) + (j + 1) * step
            d = f"(epoch(t1.{self.pop_ts}) - epoch(t2.{self.peri_ts}))"
            return f"{d} >= {lo} AND {d} < {hi}"
        for pop_col, peri_col in self.same_units_pairs:
            if cond == f"same_{pop_col}_{peri_col}":
                return f"t1.{pop_col} = t2.{peri_col}"
        for ccol in self.categorical_cols:
            prefix = f"{ccol}_top"
            if cond.startswith(prefix):
                r = int(cond[len(prefix):])
                # emit the FITTED value as a literal (reference embeds
                # categorical_value_ in the SQL, SQLMaker.cpp:34-36) —
                # a subquery over the serving-time peripheral would
                # silently re-learn the category (train/serve skew)
                vals = self.categories_.get(ccol, [])
                if r - 1 >= len(vals):
                    raise ValueError(
                        f"condition {cond!r} has no fitted category value"
                    )
                return f"t2.{ccol} = {_sql_literal(vals[r - 1])}"
        raise ValueError(f"unknown condition {cond!r}")


def _np_jsonable(o):
    """json.dump default hook: numpy scalars become their Python
    equivalents; anything else is a hard error (no silent str())."""
    import numpy as np

    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.bool_):
        return bool(o)
    raise TypeError(
        f"unsupported type {type(o).__name__} in pipeline state; "
        "add an explicit tag before serializing"
    )


def _tag_category(v):
    """Type-tagged JSON encoding for one fitted category value. Scalars
    that JSON represents natively pass through; temporal/decimal values
    get a {__type__, v} wrapper so load() restores the original type."""
    import datetime
    import decimal

    import numpy as np

    if isinstance(v, np.generic):
        v = v.item()
    if v is None or isinstance(v, (str, bool, int, float)):
        return v
    if isinstance(v, datetime.datetime):
        return {"__type__": "datetime", "v": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"__type__": "date", "v": v.isoformat()}
    if isinstance(v, decimal.Decimal):
        return {"__type__": "decimal", "v": str(v)}
    raise TypeError(
        f"cannot serialize fitted category value of type {type(v).__name__}"
    )


def _untag_category(v):
    import datetime
    import decimal

    if isinstance(v, dict) and "__type__" in v:
        t, raw = v["__type__"], v["v"]
        if t == "datetime":
            return datetime.datetime.fromisoformat(raw)
        if t == "date":
            return datetime.date.fromisoformat(raw)
        if t == "decimal":
            return decimal.Decimal(raw)
        raise ValueError(f"unknown category type tag {t!r}")
    return v


def _sql_literal(v) -> str:
    """Render a fitted category value as an ANSI SQL literal (typed:
    TIMESTAMP/DATE keywords for temporals so the comparison stays a
    typed one in both DuckDB and Spark, not a string coercion)."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, datetime.datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, decimal.Decimal):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"
