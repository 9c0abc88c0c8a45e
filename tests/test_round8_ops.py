"""Invariant tests for the round-8 third-batch operators (hypothesis
tests, classical-ML pack, causal pack, retrieval eval, exact
percentiles, sketch/listagg surfaces).

Hash-vs-DuckDB equivalence for every query here is covered by
tests/test_differential.py; these pin the *semantics* the value hash
hides — agreement with an independent numpy/pure-Python computation,
leakage-freedom, estimator bounds — so a refactor that stays
hash-consistent on the fixture but breaks the math still fails loudly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _table(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/{name}.parquet").to_pandas()


def _cents(v) -> np.ndarray:
    return np.round(np.asarray(v) * 100).astype(np.int64)


def test_linreg_matches_numpy_lstsq(spark):
    row = QUERIES["ml_linreg_normal_eq"](spark, SF_DIR).collect()[0]
    li = _table("lineitem")
    x1 = np.round(li["l_quantity"]).astype(np.int64)
    x2 = _cents(li["l_discount"])  # discount * 100 = percent points
    y = np.round(li["l_extendedprice"]).astype(np.int64)
    X = np.column_stack([np.ones(len(y)), x1, x2]).astype(float)
    beta = np.linalg.lstsq(X, y.astype(float), rcond=None)[0]
    # lstsq (QR) vs the closed normal-equation form differ at the
    # conditioning floor; agreement to ~1e-5 relative is the contract
    assert abs(row.beta_quantity - beta[1]) < 1e-3
    assert abs(row.beta_discount_pct - beta[2]) < 1e-2
    assert abs(row.intercept - beta[0]) < 1e-1
    assert 0.0 < row.r_squared <= 1.0


def test_anova_matches_numpy(spark):
    row = QUERIES["stats_anova_f"](spark, SF_DIR).collect()[0]
    ev = _table("events")
    m = _cents(ev["value"]) / 100.0
    groups = [m[(ev["event_type"] == t).to_numpy()] for t in sorted(ev["event_type"].unique())]
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    n, k = sum(len(g) for g in groups), len(groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_obs == n and row.k_groups == k
    assert abs(row.f_stat - f) < 1e-4
    assert abs(row.eta_sq - ssb / (ssb + ssw)) < 1e-6


def test_mann_whitney_matches_pure_python(spark):
    row = QUERIES["stats_mann_whitney"](spark, SF_DIR).collect()[0]
    ev = _table("events")
    sel = ev[ev["event_type"].isin(["click", "purchase"])]
    m = _cents(sel["value"])
    is1 = (sel["event_type"] == "click").to_numpy()
    order = np.argsort(m, kind="stable")
    ranks = np.empty(len(m), dtype=float)
    sm = m[order]
    i = 0
    while i < len(sm):
        j = i
        while j < len(sm) and sm[j] == sm[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # midrank of 1-based i+1..j
        i = j
    r1 = ranks[is1].sum()
    n1, n2 = int(is1.sum()), int((~is1).sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    assert row.n1 == n1 and row.n2 == n2
    assert abs(row.u1 - u1) < 1e-6
    # z against the tie-corrected closed form
    _, t = np.unique(sm, return_counts=True)
    tie3 = float((t**3 - t).sum())
    nn = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1.0))))
    assert abs(row.z_stat - (u1 - n1 * n2 / 2.0) / sigma) < 1e-5


def test_conformal_qhat_is_order_statistic(spark):
    import hashlib

    rows = QUERIES["model_conformal_interval"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    bucket = ev["event_id"].map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 4
    )
    cents = _cents(ev["value"])
    for r in rows:
        sel = ev["event_type"] == r.event_type
        tr = sel & (bucket <= 1)
        pred = cents[tr.to_numpy()].sum() / (100.0 * tr.sum())
        cal = sel & (bucket == 2)
        resid = np.sort(np.abs(cents[cal.to_numpy()] / 100.0 - pred))
        k = math.ceil(0.9 * (len(resid) + 1))
        assert r.n_cal == len(resid)
        assert abs(r.qhat - resid[k - 1]) < 1e-6
        # conformal guarantee is ~90%; wide tolerance for small-n tier
        assert 0.7 <= r.coverage <= 1.0


def test_target_encoding_is_leakage_free(spark):
    import hashlib

    rows = QUERIES["feature_target_encode_oof"](spark, SF_DIR).collect()
    o, c = _table("orders"), _table("customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["fold"] = j["o_orderkey"].map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 5
    )
    j["cents"] = _cents(j["o_totalprice"])
    for r in rows:
        other = j[(j["c_mktsegment"] == r.c_mktsegment) & (j["fold"] != r.fold)]
        own = j[(j["c_mktsegment"] == r.c_mktsegment) & (j["fold"] == r.fold)]
        assert r.n_rows == len(own)
        assert abs(r.oof_encoding - other["cents"].sum() / (100.0 * len(other))) < 1e-6


def test_woe_iv_terms_nonnegative_and_partition(spark):
    rows = QUERIES["feature_woe_iv"](spark, SF_DIR).collect()
    assert len(rows) == 10
    n_orders = len(_table("orders"))
    assert sum(r.n_pos + r.n_neg for r in rows) == n_orders
    # (a-b)ln(a/b) >= 0 always — each IV term is non-negative
    assert all(r.iv_term >= 0 for r in rows)
    # NTILE balance: deciles within 1 of each other
    sizes = [r.n_pos + r.n_neg for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_cuped_matches_numpy_and_reduces_variance(spark):
    import hashlib

    row = QUERIES["ab_test_cuped"](spark, SF_DIR).collect()[0]
    ev = _table("events")
    ev["cents"] = _cents(ev["value"])
    ev["pre"] = ev["ts"] < pd.Timestamp("2024-01-16")
    g = ev.groupby("user_id").apply(
        lambda d: pd.Series(
            {
                "x": d.loc[d["pre"], "cents"].sum(),
                "y": d.loc[~d["pre"], "cents"].sum(),
            }
        ),
        include_groups=False,
    )
    arm = g.index.map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:2], 16) % 2
    )
    x, y = g["x"].to_numpy(float), g["y"].to_numpy(float)
    theta = np.cov(x, y, ddof=0)[0, 1] / np.var(x)
    t, cmask = (arm == 1), (arm == 0)
    raw = y[t].mean() - y[cmask].mean()
    adj = (y[t].mean() - theta * x[t].mean()) - (
        y[cmask].mean() - theta * x[cmask].mean()
    )
    assert abs(row.theta - theta) < 1e-4
    assert abs(row.raw_delta - raw / 100.0) < 1e-4
    assert abs(row.cuped_delta - adj / 100.0) < 1e-4
    assert 0.0 <= row.var_reduction < 1.0


def test_did_matches_pandas_cells(spark):
    row = QUERIES["orders_promo_uplift_did"](spark, SF_DIR).collect()[0]
    li, p = _table("lineitem"), _table("part")
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    # Spark ROUND is HALF_UP; np.round is half-to-even — replicate
    j["rev"] = np.floor(
        j["l_extendedprice"] * (1 - j["l_discount"]) + 0.5
    ).astype(np.int64)
    j["treated"] = j["p_type"] == "PROMO"
    j["post"] = j["l_shipdate"] >= pd.Timestamp("1998-07-01")

    def m(tr, po):
        return j.loc[(j["treated"] == tr) & (j["post"] == po), "rev"].mean()

    did = (m(True, True) - m(True, False)) - (m(False, True) - m(False, False))
    assert abs(row.did_estimate - did) < 1e-4
    assert row.n_rows == len(j)


def test_stratified_ate_weights_and_balance(spark):
    rows = QUERIES["causal_stratified_ate"](spark, SF_DIR).collect()
    assert len(rows) == 4
    n = sum(r.n_users for r in rows)
    # weighted terms recombine to the ATE of the weighted stratum effects
    ate = sum(r.weighted_term for r in rows)
    ate2 = sum(r.stratum_effect * r.n_users / n for r in rows)
    assert abs(ate - ate2) < 1e-4
    # every stratum has members in both arms (else the estimator is
    # undefined and the query would emit nulls)
    assert all(0 < r.n_treat < r.n_users for r in rows)


def test_assortativity_matches_numpy(spark):
    row = QUERIES["graph_degree_assortativity"](spark, SF_DIR).collect()[0]
    li = _table("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"])
        for i in range(len(parts)):
            for k in range(i + 1, len(parts)):
                edges.add((parts[i], parts[k]))
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    da = np.array([deg[u] for u, v in edges] + [deg[v] for u, v in edges], float)
    db = np.array([deg[v] for u, v in edges] + [deg[u] for u, v in edges], float)
    r = np.corrcoef(da, db)[0, 1]
    assert row.n_edges == len(edges)
    assert abs(row.assortativity - r) < 1e-4
    assert -1.0 <= row.assortativity <= 1.0


def test_ndcg_bounds_and_dcg_order(spark):
    row = QUERIES["eval_ndcg_bm25"](spark, SF_DIR).collect()[0]
    assert 1 <= row.k <= 10
    assert row.dcg_at_k > 0 and row.idcg_at_k > 0
    # corpus-ideal IDCG dominates any realized ranking's DCG
    assert row.dcg_at_k <= row.idcg_at_k + 1e-9
    assert 0.0 < row.ndcg_at_k <= 1.0


def test_approx_top_k_is_exact_under_capacity(spark):
    rows = QUERIES["sketch_approx_top_k"](spark, SF_DIR).collect()
    part = _table("part")
    exact = part["p_brand"].value_counts()
    assert len(rows) == len(exact)
    for r in rows:
        assert r.freq == int(exact[r.brand]), (r.brand, r.freq)
    # re-ranked deterministically: freq desc, brand asc
    key = [(-r.freq, r.brand) for r in rows]
    assert key == sorted(key)


def test_listagg_is_sorted_within_group(spark):
    rows = QUERIES["agg_listagg_sorted"](spark, SF_DIR).collect()
    part = _table("part")
    for r in rows:
        types = r.types_csv.split("|")
        assert types == sorted(types)
        expect = sorted(
            part.loc[part["p_brand"] == r.p_brand, "p_type"].unique()
        )
        assert types == expect and r.n_types == len(expect)


def test_percentile_cont_disc_conventions(spark):
    rows = QUERIES["agg_percentile_cont_disc"](spark, SF_DIR).collect()
    o = _table("orders")
    prices = _cents(o["o_totalprice"]) / 100.0
    for r in rows:
        vals = np.sort(prices[(o["o_orderstatus"] == r.o_orderstatus).to_numpy()])
        # cont = numpy's linear (n-1)p convention
        assert abs(r.p50_cont - np.percentile(vals, 50, method="linear")) < 1e-6
        assert abs(r.p90_cont - np.percentile(vals, 90, method="linear")) < 1e-6
        # disc picks an actual member value at or above the cont point
        assert r.p50_disc in vals and r.p90_disc in vals
        assert r.p90_disc >= r.p50_disc


def test_correlated_scalar_matches_dataframe_joins(spark):
    rows = {
        r.n_name: r
        for r in QUERIES["sql_correlated_scalar"](spark, SF_DIR).collect()
    }
    c, s, n = _table("customer"), _table("supplier"), _table("nation")
    building = set(c.loc[c["c_mktsegment"] == "BUILDING", "c_nationkey"])
    for _, nr in n.iterrows():
        nk = nr["n_nationkey"]
        if nk not in building:
            assert nr["n_name"] not in rows
            continue
        r = rows[nr["n_name"]]
        assert abs(r.max_acctbal - c.loc[c["c_nationkey"] == nk, "c_acctbal"].max()) < 1e-6
        assert r.n_rich_suppliers == int(
            ((s["s_nationkey"] == nk) & (s["s_acctbal"] > 5000)).sum()
        )
