"""Invariant tests for the round-8 fourth-batch operators (rank
statistics, changepoint, logistic IRLS step, trigram backoff LM,
product quantization).

Hash-vs-DuckDB equivalence is covered by tests/test_differential.py;
these pin the semantics the value hash hides — agreement with an
independent numpy/pandas computation of the same statistic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _table(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/{name}.parquet").to_pandas()


def test_spearman_matches_pandas(spark):
    rows = {
        r.l_returnflag: r
        for r in QUERIES["stats_spearman_corr"](spark, SF_DIR).collect()
    }
    li = _table("lineitem")
    for flag, g in li.groupby("l_returnflag"):
        rq = g["l_quantity"].rank(method="average")
        rp = g["l_extendedprice"].rank(method="average")
        rho = np.corrcoef(rq, rp)[0, 1]
        assert abs(rows[flag].spearman_rho - rho) < 1e-5, flag
        assert rows[flag].n_rows == len(g)


def test_roc_auc_matches_pairwise_count(spark):
    rows = {
        r.c_mktsegment: r
        for r in QUERIES["eval_roc_auc"](spark, SF_DIR).collect()
    }
    o = _table("orders")
    c = _table("customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["pos"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    for seg, g in j.groupby("c_mktsegment"):
        ps = g.loc[g["pos"] == 1, "o_totalprice"].to_numpy()
        ns = g.loc[g["pos"] == 0, "o_totalprice"].to_numpy()
        # independent AUC: explicit pairwise win rate with half-ties
        cmp = ps[:, None] - ns[None, :]
        auc = ((cmp > 0).sum() + 0.5 * (cmp == 0).sum()) / (
            len(ps) * len(ns)
        )
        r = rows[seg]
        assert abs(r.auc - auc) < 1e-6, seg
        assert abs(r.gini - (2 * auc - 1)) < 1e-5
        assert (r.n_pos, r.n_neg) == (len(ps), len(ns))
