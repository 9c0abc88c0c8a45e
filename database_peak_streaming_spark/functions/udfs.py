"""UDF surface (SURVEY.md §2B UDF row): row UDF, vectorized pandas UDFs
(scalar / grouped-agg), and grouped-map ``applyInPandas``.

Policy (the perf contract): UDFs are the engine's escape hatch, never the
default — everything expressible as built-in column expressions stays
JVM-side.  When Python is unavoidable (numpy/scipy kernels, model
inference), it must be Arrow-vectorized: ``pandas_udf`` moves data in
columnar Arrow batches (~10-100x over row-at-a-time ``udf``, the
measured gap the reference's own ``np.frombuffer`` zero-copy decode
exploited single-node — SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Iterator  # noqa: F401 (pandas_udf type hints)

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def log1p_vec(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: numpy kernel over Arrow batches."""
    return pd.Series(np.log1p(v.to_numpy()))


#: stand-in "model" coefficients for the iterator UDF — in production
#: this is the checkpoint a worker loads ONCE and reuses across batches
_MODEL_A = 0.35
_MODEL_B = -2.0


@pandas_udf(T.DoubleType())
def model_score_iter(batches: "Iterator[pd.Series]") -> "Iterator[pd.Series]":
    """Iterator-of-Series scalar pandas UDF (SCALAR_ITER): the
    amortized-initialization form — expensive per-worker setup (a model
    checkpoint load, a tokenizer build) runs ONCE before the loop, then
    every Arrow batch streams through the loaded state.  The stand-in
    model is a logistic score over log1p(x); the differential oracle is
    the same closed form in SQL, pinning that the Python-worker path
    agrees with closed-form arithmetic to rounding precision."""
    import numpy as _np

    a, b = _MODEL_A, _MODEL_B  # <- the one-time "load"
    for s in batches:
        yield pd.Series(
            1.0 / (1.0 + _np.exp(-(a * _np.log1p(s.to_numpy()) + b)))
        )


@pandas_udf(T.DoubleType())
def weighted_mean_grouped(v: pd.Series, w: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: sum(v*w)/sum(w) per group."""
    wv = w.to_numpy()
    return float(np.average(v.to_numpy(), weights=wv)) if wv.sum() else float("nan")


def log1p_row(x: float | None) -> float | None:
    """Row-at-a-time Python UDF — kept ONLY as the anti-pattern baseline
    the bench compares against ``log1p_vec``."""
    import math

    return math.log1p(x) if x is not None else None


log1p_row_udf = F.udf(log1p_row, T.DoubleType())


def zscore_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-group normalization, the
    canonical "model-ish kernel per partition-group" shape.  Each group
    arrives as one pandas DataFrame (watch skew: a giant group = a giant
    task — salt or pre-aggregate first at scale)."""
    schema = T.StructType(
        df.schema.fields
        + [T.StructField("zscore", T.DoubleType())]
    )

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].to_numpy(dtype=float)
        sd = v.std(ddof=1)
        pdf = pdf.copy()
        pdf["zscore"] = (v - v.mean()) / sd if sd > 0 else np.zeros_like(v)
        return pdf

    return df.groupBy(group_col).applyInPandas(_z, schema=schema)
