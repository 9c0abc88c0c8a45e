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


def test_changepoint_matches_bruteforce(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["ts_changepoint_binseg"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    for etype, g in ev.groupby("event_type"):
        y = g.groupby("day").size().sort_index()
        days = list(y.index)
        y = y.to_numpy(dtype=float)
        n = len(y)

        def sse(a):
            return float(((a - a.mean()) ** 2).sum()) if len(a) else 0.0

        # brute force: recompute both segment SSEs per candidate split
        cand = [(sse(y[:t]) + sse(y[t:]), days[t - 1]) for t in range(1, n)]
        best = min(cand, key=lambda p: (round(p[0], 6), p[1]))
        r = rows[etype]
        assert r.split_day == best[1], etype
        assert abs(r.sse_split - best[0]) < 1e-4
        assert abs(r.sse_total - sse(y)) < 1e-4
        assert r.gain >= 0 and r.n_days == n


def test_logreg_irls_step_matches_numpy(spark):
    row = QUERIES["ml_logreg_irls_step"](spark, SF_DIR).collect()[0]
    li = _table("lineitem")
    x1 = np.round(li["l_quantity"]).astype(np.int64)
    x2 = np.round(li["l_discount"] * 100).astype(np.int64)
    y = (li["l_returnflag"] == "R").astype(np.int64).to_numpy()
    X = np.column_stack([np.ones(len(y)), x1, x2]).astype(float)
    z = 4.0 * (y - 0.5)
    # one IRLS step from beta=0 == OLS on the +/-2 working response
    beta = np.linalg.lstsq(X, z, rcond=None)[0]
    assert abs(row.beta0 - beta[0]) < 1e-4
    assert abs(row.beta_quantity - beta[1]) < 1e-6
    assert abs(row.beta_discount_pct - beta[2]) < 1e-5
    a = X @ beta
    ll = float(np.mean(np.log1p(np.exp(a)) - y * a))
    assert abs(row.avg_logloss - ll) < 1e-5
    # the step must beat the 0-step baseline ln 2
    assert row.avg_logloss < np.log(2.0)


def test_trigram_backoff_matches_pure_python(spark):
    import hashlib
    import math

    rows = {
        r.doc_id: r
        for r in QUERIES["text_trigram_backoff_lm"](spark, SF_DIR).collect()
    }
    docs = _table("documents")

    def bkt(doc_id) -> int:
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 4

    uni, bi, tri = {}, {}, {}
    n_tok = 0
    held = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        tk = text.split(" ")
        if bkt(doc_id) <= 2:
            n_tok += len(tk)
            for w in tk:
                uni[w] = uni.get(w, 0) + 1
            for i in range(len(tk) - 1):
                b = (tk[i], tk[i + 1])
                bi[b] = bi.get(b, 0) + 1
            for i in range(len(tk) - 2):
                t = (tk[i], tk[i + 1], tk[i + 2])
                tri[t] = tri.get(t, 0) + 1
        elif len(tk) >= 3:
            held.append((doc_id, tk))

    assert set(rows) == {d for d, _ in held}
    any_backoff = False
    for doc_id, tk in held:
        scores, hits, bb, ub, oov = [], 0, 0, 0, 0
        for i in range(len(tk) - 2):
            w1, w2, w3 = tk[i], tk[i + 1], tk[i + 2]
            ct = tri.get((w1, w2, w3), 0)
            if ct:
                scores.append(math.log(ct / bi[(w1, w2)]))
                hits += 1
            elif bi.get((w2, w3), 0):
                scores.append(math.log(0.4 * bi[(w2, w3)] / uni[w2]))
                bb += 1
            elif uni.get(w3, 0):
                scores.append(math.log(0.16 * uni[w3] / n_tok))
                ub += 1
            else:
                scores.append(math.log(0.16 / n_tok))
            if not uni.get(w3, 0):
                oov += 1
        r = rows[doc_id]
        assert abs(r.mean_logscore - sum(scores) / len(scores)) < 1e-5
        assert (r.n_tri_hits, r.n_bi_backoffs, r.n_uni_backoffs) == (
            hits,
            bb,
            ub,
        ), doc_id
        assert r.n_oov == oov and r.n_trigrams == len(scores)
        any_backoff = any_backoff or bb or ub or oov
    # the held-out split exists so that backoff actually fires
    assert any_backoff


def test_pq_adc_matches_numpy(spark):
    from database_peak_streaming_spark.operators.similarity import (
        N_QUERIES,
        PQ_K,
        PQ_M,
        PQ_SUB,
        TOP_K,
    )

    rows = QUERIES["ann_pq_adc"](spark, SF_DIR).collect()
    emb = _table("embeddings").sort_values("vec_id")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    cb = X[np.argsort(ids)[:PQ_K]]  # vec_id 0..15 in id order
    # encode: per subspace, nearest codebook subvector (ties -> lowest j)
    codes = np.empty((len(X), PQ_M), dtype=int)
    for m in range(PQ_M):
        sl = slice(m * PQ_SUB, (m + 1) * PQ_SUB)
        d = ((X[:, None, sl] - cb[None, :, sl]) ** 2).sum(axis=2)
        codes[:, m] = d.argmin(axis=1)  # argmin takes first == lowest j
    got = {}
    for r in rows:
        got.setdefault(r.q_id, []).append((r.vec_id, r.adc))
    for q in range(N_QUERIES):
        qi = int(np.where(ids == q)[0][0])
        lut = np.empty((PQ_M, PQ_K))
        for m in range(PQ_M):
            sl = slice(m * PQ_SUB, (m + 1) * PQ_SUB)
            lut[m] = ((X[qi, sl] - cb[:, sl]) ** 2).sum(axis=1)
        adc = np.array(
            [lut[np.arange(PQ_M), codes[i]].sum() for i in range(len(X))]
        )
        order = sorted(
            (
                (round(float(adc[i]), 6), int(ids[i]))
                for i in range(len(X))
                if ids[i] != q
            ),
        )[:TOP_K]
        want = [(v, a) for a, v in order]
        assert [(v, a) for v, a in got[q]] == want, q


def test_kendall_tau_matches_bruteforce(spark):
    rows = {
        r.l_returnflag: r
        for r in QUERIES["stats_kendall_tau_vocab"](spark, SF_DIR).collect()
    }
    li = _table("lineitem")
    li["x"] = np.round(li["l_quantity"]).astype(np.int64)
    li["y"] = np.round(li["l_discount"] * 100).astype(np.int64)
    for flag, g in li.groupby("l_returnflag"):
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        # brute force over all row pairs (feasible at sf0.001)
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        iu = np.triu_indices(len(x), k=1)
        prod = dx[iu] * dy[iu]
        conc = int((prod > 0).sum())
        disc = int((prod < 0).sum())
        n = len(x)
        n0 = n * (n - 1) // 2
        n1 = int((dx[iu] == 0).sum())
        n2 = int((dy[iu] == 0).sum())
        tau = (conc - disc) / np.sqrt(float(n0 - n1) * float(n0 - n2))
        r = rows[flag]
        assert (r.concordant, r.discordant) == (conc, disc), flag
        assert abs(r.kendall_tau_b - tau) < 1e-6
        assert r.n_rows == n


def test_temperature_mixture_invariants(spark):
    rows = QUERIES["corpus_temperature_mixture"](spark, SF_DIR).collect()
    docs = _table("documents")
    docs["n_tok"] = docs["text"].str.split(" ").str.len()
    by_src = docs.groupby("source")["n_tok"].sum()
    p = (by_src / by_src.sum()).to_dict()
    w = {s: v**0.3 for s, v in p.items()}
    tot_w = sum(w.values())
    assert abs(sum(r.temperature_share for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert abs(r.natural_share - p[r.source]) < 1e-6
        assert abs(r.temperature_share - w[r.source] / tot_w) < 1e-6
        assert abs(r.boost_factor - (w[r.source] / tot_w) / p[r.source]) < 1e-4
    # alpha < 1 flattens: smallest source must be boosted above 1
    smallest = min(rows, key=lambda r: r.n_tokens)
    largest = max(rows, key=lambda r: r.n_tokens)
    assert smallest.boost_factor > 1.0 > largest.boost_factor


def test_label_propagation_matches_pure_python(spark):
    from database_peak_streaming_spark.operators.graph import LP_ITERS

    rows = QUERIES["graph_label_propagation"](spark, SF_DIR).collect()
    o = _table("orders")
    li = _table("lineitem")
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pairs = {
        ("c:%d" % c, "s:%d" % s)
        for c, s in zip(j["o_custkey"], j["l_suppkey"])
    }
    adj = {}
    for c, s in pairs:
        adj.setdefault(c, []).append(s)
        adj.setdefault(s, []).append(c)
    labels = {n: n for n in adj}
    for _ in range(LP_ITERS):
        new = {}
        for n, nbrs in adj.items():
            counts = {}
            for nb in nbrs:
                lb = labels[nb]
                counts[lb] = counts.get(lb, 0) + 1
            new[n] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = new
    sizes = {}
    for lb in labels.values():
        sizes[lb] = sizes.get(lb, 0) + 1
    top = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.community, r.n_members) for r in rows]
    assert got == top
    assert [r.community_rank for r in rows] == list(range(1, len(top) + 1))


def test_pr_auc_matches_pure_python(spark):
    rows = {
        r.c_mktsegment: r
        for r in QUERIES["eval_pr_auc"](spark, SF_DIR).collect()
    }
    o = _table("orders")
    c = _table("customer")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["pos"] = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    for seg, g in j.groupby("c_mktsegment"):
        g = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        pos = g["pos"].to_numpy()
        cum = np.cumsum(pos)
        k = np.arange(1, len(pos) + 1)
        ap = float((cum[pos == 1] / k[pos == 1]).sum() / pos.sum())
        r = rows[seg]
        assert abs(r.avg_precision - ap) < 1e-5, seg
        # a score with signal must lift AP above prevalence... or at
        # least match the reported lift identity
        assert abs(r.lift_over_prevalence - (round(ap, 6) - pos.sum() / len(pos))) < 1e-5


def test_quantile_normalize_matches_pure_python(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["feature_quantile_normalize"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    pooled = ev.sort_values(["cents", "event_id"]).reset_index(drop=True)
    N = len(pooled)
    for etype, g in ev.groupby("event_type"):
        g = g.sort_values(["cents", "event_id"]).reset_index(drop=True)
        ng = len(g)
        r = np.arange(1, ng + 1)
        pos = ((2 * r - 1) * N + 2 * ng - 1) // (2 * ng)
        mapped = pooled["cents"].to_numpy()[pos - 1]
        row = rows[etype]
        assert row.n_rows == ng
        assert abs(row.mean_norm - mapped.sum() / (100.0 * ng)) < 1e-6
        assert abs(row.mean_raw - g["cents"].sum() / (100.0 * ng)) < 1e-6
        assert row.min_norm == round(mapped.min() / 100.0, 6)
        assert row.max_norm == round(mapped.max() / 100.0, 6)
    # the whole point: normalized marginals converge across types
    means = [r.mean_norm for r in rows.values()]
    assert max(means) - min(means) < 0.05 * max(means)


def test_longest_streak_matches_pure_python(spark):
    import datetime

    rows = {
        r.user_id: r
        for r in QUERIES["events_longest_streak"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    for uid, g in ev.groupby("user_id"):
        days = sorted(set(g["day"]))
        streaks = []
        start, ln = days[0], 1
        for prev, cur in zip(days, days[1:]):
            if (cur - prev).days == 1:
                ln += 1
            else:
                streaks.append((ln, start))
                start, ln = cur, 1
        streaks.append((ln, start))
        best = max(streaks, key=lambda s: (s[0], -s[1].toordinal()))
        r = rows[uid]
        assert r.n_active_days == len(days)
        assert r.n_streaks == len(streaks)
        assert r.longest_streak == best[0]
        assert r.longest_start == best[1], uid


def test_active_count_matches_pure_python(spark):
    rows = QUERIES["intervals_active_count_daily"](spark, SF_DIR).collect()
    o = _table("orders")
    li = _table("lineitem")
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    spans = j.groupby("o_orderkey").agg(
        start=("o_orderdate", "min"), end=("l_shipdate", "max")
    )
    deltas = {}
    one_day = pd.Timedelta(days=1)
    for s, e in zip(pd.to_datetime(spans["start"]), pd.to_datetime(spans["end"])):
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e + one_day] = deltas.get(e + one_day, 0) - 1
    run, want = 0, []
    for day in sorted(deltas):
        run += deltas[day]
        want.append((day.date(), deltas[day], run))
    assert [(r.day, r.net_change, r.open_orders) for r in rows] == want
    # the sweep must return to zero once every order closed
    assert rows[-1].open_orders == 0
    assert max(r.open_orders for r in rows) > 0


def test_ohlc_bars_match_pandas(spark):
    rows = QUERIES["window_ohlc_bars"](spark, SF_DIR).collect()
    ev = _table("events")
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    ev["hour"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    got = {(r.event_type, pd.Timestamp(r.hour)): r for r in rows}
    assert len(got) == len(rows)
    for (etype, hour), g in ev.groupby(["event_type", "hour"]):
        g = g.sort_values(["ts", "event_id"])
        r = got[(etype, hour)]
        assert r.n_events == len(g)
        assert r.open == round(g["cents"].iloc[0] / 100.0, 6)
        assert r.close == round(g["cents"].iloc[-1] / 100.0, 6)
        assert r.high == round(g["cents"].max() / 100.0, 6)
        assert r.low == round(g["cents"].min() / 100.0, 6)
        assert abs(r.turnover - g["cents"].sum() / 100.0) < 1e-6


def test_growth_accounting_matches_pure_python(spark):
    import datetime

    rows = {
        r.week: r
        for r in QUERIES["events_growth_accounting"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["week"] = (
        pd.to_datetime(ev["ts"]).dt.to_period("W-SUN").dt.start_time.dt.date
    )
    uw = {}
    for uid, wk in set(zip(ev["user_id"], ev["week"])):
        uw.setdefault(uid, []).append(wk)
    week7 = datetime.timedelta(days=7)
    agg = {}
    for uid, wks in uw.items():
        wks = sorted(wks)
        for i, wk in enumerate(wks):
            a = agg.setdefault(wk, [0, 0, 0, 0, 0])  # act,new,ret,res,chu
            a[0] += 1
            if i == 0:
                a[1] += 1
            elif wks[i - 1] == wk - week7:
                a[2] += 1
            else:
                a[3] += 1
            if i == len(wks) - 1 or wks[i + 1] > wk + week7:
                c = agg.setdefault(wk + week7, [0, 0, 0, 0, 0])
                c[4] += 1
    for wk, (act, new, ret, res, chu) in agg.items():
        if act == 0 and wk not in rows:
            continue  # churn-only weeks beyond data end have no row
        r = rows[wk]
        assert (r.n_active, r.n_new, r.n_retained, r.n_resurrected) == (
            act,
            new,
            ret,
            res,
        ), wk
        if act:
            assert r.n_churned == chu
    # identity: every active user is exactly one of new/retained/resurrected
    for r in rows.values():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected


def test_bfs_distance_matches_pure_python(spark):
    from database_peak_streaming_spark.operators.graph import BFS_HOPS

    rows = {r.dist: r.n_nodes for r in QUERIES["graph_bfs_distance"](spark, SF_DIR).collect()}
    o = _table("orders")
    li = _table("lineitem")
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pairs = {
        ("c:%d" % c, "s:%d" % s)
        for c, s in zip(j["o_custkey"], j["l_suppkey"])
    }
    adj = {}
    for c, s in pairs:
        adj.setdefault(c, set()).add(s)
        adj.setdefault(s, set()).add(c)
    deg = {n: len(v) for n, v in adj.items()}
    # undirected edges materialized both ways -> degree == neighbor count
    src = min(deg, key=lambda n: (-deg[n], n))
    dist = {src: 0}
    frontier = [src]
    for k in range(1, BFS_HOPS + 1):
        nxt = []
        for n in frontier:
            for nb in adj[n]:
                if nb not in dist:
                    dist[nb] = k
                    nxt.append(nb)
        frontier = nxt
    want = {}
    for d in dist.values():
        want[d] = want.get(d, 0) + 1
    want[BFS_HOPS + 1] = len(adj) - len(dist)
    assert rows == want


def test_cohens_d_matches_numpy(spark):
    import hashlib

    rows = {
        r.event_type: r
        for r in QUERIES["stats_cohens_d"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["arm"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 2
        for i in ev["event_id"]
    ]
    ev["v"] = np.round(ev["value"] * 100).astype(np.int64) / 100.0
    for etype, g in ev.groupby("event_type"):
        t = g.loc[g["arm"] == 1, "v"].to_numpy()
        c = g.loc[g["arm"] == 0, "v"].to_numpy()
        sp = np.sqrt(
            ((len(t) - 1) * t.var(ddof=1) + (len(c) - 1) * c.var(ddof=1))
            / (len(t) + len(c) - 2)
        )
        d = (t.mean() - c.mean()) / sp
        r = rows[etype]
        assert (r.n_treat, r.n_control) == (len(t), len(c))
        assert abs(r.cohens_d - d) < 1e-5, etype
        assert abs(r.hedges_g - d * (1 - 3 / (4 * (len(t) + len(c)) - 9))) < 1e-5
        assert abs(r.pooled_sd - sp) < 1e-4


def test_srm_check_matches_numpy(spark):
    import hashlib

    rows = {
        r.event_type: r
        for r in QUERIES["ab_srm_check"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["arm"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 2
        for i in ev["event_id"]
    ]
    for etype, g in ev.groupby("event_type"):
        nt = int(g["arm"].sum())
        nc = len(g) - nt
        exp = (nt + nc) / 2.0
        chi2 = (nt - exp) ** 2 / exp + (nc - exp) ** 2 / exp
        r = rows[etype]
        assert (r.n_treat, r.n_control) == (nt, nc)
        assert abs(r.chi2 - chi2) < 1e-6
        assert r.srm_flag == (chi2 > 3.841)


def test_lloyd_step_matches_numpy(spark):
    from database_peak_streaming_spark.operators.similarity import (
        _KMEANS_CENTROIDS,
        _LLOYD_SCALE,
    )

    rows = {
        r.bucket: r
        for r in QUERIES["ml_kmeans_lloyd_step"](spark, SF_DIR).collect()
    }
    emb = _table("embeddings")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = np.array(_KMEANS_CENTROIDS)
    # same argmin rule: |c|^2 - 2 x.c, first minimum wins (1-based)
    scores = (np.round((C * C).sum(axis=1), 9)[None, :]
              - 2.0 * X @ C.T)
    bucket = scores.argmin(axis=1) + 1
    Q = np.round(X * _LLOYD_SCALE)
    Cint = np.round(C * _LLOYD_SCALE)
    for b in sorted(set(bucket)):
        mask = bucket == b
        qb = Q[mask]
        r = rows[b]
        assert r.n_members == int(mask.sum())
        new_c = qb.mean(axis=0)
        shift = np.sqrt((((new_c - Cint[b - 1]) / _LLOYD_SCALE) ** 2).sum())
        assert abs(r.centroid_shift - shift) < 1e-5, b
        msd = ((qb - Cint[b - 1]) ** 2).sum() / (len(qb) * _LLOYD_SCALE**2)
        assert abs(r.mean_sq_dist - msd) < 1e-6
    # one step from a trained quantizer should move centroids only a
    # little relative to the cluster radius
    for r in rows.values():
        assert r.centroid_shift < np.sqrt(r.mean_sq_dist)


def test_permutation_test_matches_pure_python(spark):
    import hashlib

    row = QUERIES["stats_permutation_test"](spark, SF_DIR).collect()[0]
    ev = _table("events")
    cents = np.round(ev["value"] * 100).astype(np.int64).to_numpy()
    ids = ev["event_id"].to_numpy()

    def arm(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:2], 16) % 2

    def diff(arms):
        t, c = cents[arms == 1], cents[arms == 0]
        return t.mean() / 100.0 - c.mean() / 100.0

    obs = diff(np.array([arm(str(i)) for i in ids]))
    extreme = 0
    B = row.b_reps
    for r in range(1, B + 1):
        dr = diff(np.array([arm(f"{r}:{i}") for i in ids]))
        if abs(dr) >= abs(obs):
            extreme += 1
    assert row.n_rows == len(ids)
    assert abs(row.diff_obs - obs) < 1e-5
    assert row.n_extreme == extreme
    assert abs(row.p_value - (extreme + 1) / (B + 1)) < 1e-6
    # a null split re-randomized must NOT look significant
    assert row.p_value > 0.05


def test_textrank_matches_pure_python(spark):
    from database_peak_streaming_spark.operators.text import (
        TEXTRANK_D,
        TEXTRANK_ITERS,
        TEXTRANK_MIN_COUNT,
        TEXTRANK_TOP_K,
    )

    rows = QUERIES["text_keyphrase_textrank"](spark, SF_DIR).collect()
    docs = _table("documents")
    cu = {}
    for text in docs["text"]:
        for w in text.split(" "):
            cu[w] = cu.get(w, 0) + 1
    kept = {w for w, c in cu.items() if c >= TEXTRANK_MIN_COUNT}
    wt = {}
    for text in docs["text"]:
        tk = text.split(" ")
        for a, b in zip(tk, tk[1:]):
            if a in kept and b in kept and a != b:
                wt[(a, b)] = wt.get((a, b), 0) + 1
                wt[(b, a)] = wt.get((b, a), 0) + 1
    nodes = sorted({u for u, _ in wt})
    w_u = {}
    for (u, v), c in wt.items():
        w_u[u] = w_u.get(u, 0) + c
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(TEXTRANK_ITERS):
        inflow = {u: 0.0 for u in nodes}
        for (u, v), c in wt.items():
            inflow[v] += c / w_u[u] * rank[u]
        rank = {
            u: (1 - TEXTRANK_D) / n + TEXTRANK_D * inflow[u] for u in nodes
        }
    want = sorted(
        ((round(r, 6), w) for w, r in rank.items()),
        key=lambda t: (-t[0], t[1]),
    )[:TEXTRANK_TOP_K]
    got = [(r.rank, r.word) for r in rows]
    assert got == want


def test_incremental_minhash_invariants(spark):
    import hashlib

    from database_peak_streaming_spark.operators.dedup import (
        LSH_VERIFY_THRESHOLD,
    )

    rows = QUERIES["dedup_incremental_minhash"](spark, SF_DIR).collect()
    docs = _table("documents")
    docs["bkt"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 4
        for i in docs["doc_id"]
    ]
    batch = set(docs.loc[docs["bkt"] == 3, "doc_id"])
    base = set(docs.loc[docs["bkt"] <= 2, "doc_id"])
    toks = {
        i: set(t.split(" ")) for i, t in zip(docs["doc_id"], docs["text"])
    }
    got = {r.new_id: r for r in rows}
    # exactly one decision per batch doc, never for base docs
    assert set(got) == batch
    dropped = admitted = 0
    for r in rows:
        if r.decision == "drop":
            dropped += 1
            assert r.matched_base_id in base
            a, b = toks[r.new_id], toks[r.matched_base_id]
            jac = len(a & b) / len(a | b)
            # the reported match is a true above-threshold near-dup
            assert abs(r.match_jaccard - jac) < 1e-5
            assert r.match_jaccard >= LSH_VERIFY_THRESHOLD
        else:
            admitted += 1
            assert r.matched_base_id is None
    assert dropped > 0 and admitted > 0  # the gate actually gates
    # soundness: every admitted doc has NO base doc above threshold
    # among band-collision-free pairs is probabilistic; instead check
    # exact completeness on a sample: any batch doc with a PERFECT
    # token-set twin in base must be dropped (identical sets share all
    # bands deterministically)
    base_sets = {frozenset(toks[i]): i for i in base}
    for nid in batch:
        if frozenset(toks[nid]) in base_sets:
            assert got[nid].decision == "drop", nid


def test_fdr_bh_matches_pure_python(spark):
    import hashlib

    from database_peak_streaming_spark.operators.causal import (
        FDR_ALPHA,
        FDR_B,
    )

    rows = QUERIES["stats_fdr_bh_permutation"](spark, SF_DIR).collect()
    ev = _table("events")
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)

    def arm_of(key: str) -> int:
        return int(hashlib.md5(key.encode()).hexdigest()[:2], 16) % 2

    pv = {}
    for etype, g in ev.groupby("event_type"):
        ids = g["event_id"].to_numpy()
        cents = g["cents"].to_numpy()

        def diff(arms):
            t, c = cents[arms == 1], cents[arms == 0]
            return t.mean() / 100.0 - c.mean() / 100.0

        obs = diff(np.array([arm_of(str(i)) for i in ids]))
        extreme = sum(
            1
            for r in range(1, FDR_B + 1)
            if abs(diff(np.array([arm_of(f"{r}:{i}") for i in ids])))
            >= abs(obs)
        )
        pv[etype] = (extreme + 1) / (FDR_B + 1)
    m = len(pv)
    order = sorted(pv.items(), key=lambda kv: (kv[1], kv[0]))
    # BH step-up reference
    kmax = 0
    for k, (_, p) in enumerate(order, 1):
        if p <= k * FDR_ALPHA / m:
            kmax = k
    got = sorted(rows, key=lambda r: r.rank)
    assert [r.event_type for r in got] == [t for t, _ in order]
    for k, r in enumerate(got, 1):
        assert abs(r.p_value - order[k - 1][1]) < 1e-6
        assert r.rejected == (k <= kmax), (k, kmax)


def test_langid_kappa_matches_pure_python(spark):
    from database_peak_streaming_spark.registry import _ALL_QUERIES

    row = QUERIES["text_langid_kappa"](spark, SF_DIR).collect()[0]
    conf = _ALL_QUERIES["text_langid_confusion"](spark, SF_DIR).collect()
    n = sum(r.n_docs for r in conf)
    agree = sum(r.n_docs for r in conf if r.actual_lang == r.lang_guess)
    rows_m, cols_m = {}, {}
    for r in conf:
        rows_m[r.actual_lang] = rows_m.get(r.actual_lang, 0) + r.n_docs
        cols_m[r.lang_guess] = cols_m.get(r.lang_guess, 0) + r.n_docs
    keys = set(rows_m) | set(cols_m)
    pe = sum(rows_m.get(k, 0) * cols_m.get(k, 0) for k in keys) / (n * n)
    po = agree / n
    kappa = (po - pe) / (1 - pe)
    assert row.n_docs == n and row.n_agree == agree
    assert abs(row.observed_agreement - po) < 1e-6
    assert abs(row.chance_agreement - pe) < 1e-6
    assert abs(row.cohens_kappa - kappa) < 1e-5
    # kappa must be BELOW raw accuracy (chance correction bites)
    assert row.cohens_kappa < row.observed_agreement


def test_pvm_decomposition_sums_to_delta(spark):
    rows = QUERIES["revenue_pvm_decomposition"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        delta = r.rev_1998 - r.rev_1997
        total_eff = r.price_effect + r.volume_effect + r.mix_effect
        # the decomposition identity: the three effects sum to the
        # revenue delta exactly (up to the published rounding)
        assert abs(total_eff - delta) < 2e-4, r.part_class
    # volume effect is a UNIFORM growth fraction of base revenue —
    # the property that separates it from mix by construction
    fracs = [r.volume_effect / r.rev_1997 for r in rows]
    assert max(fracs) - min(fracs) < 1e-6


def test_max_drawdown_matches_pure_python(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["win_max_drawdown"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["pnl"] = np.round(ev["value"] * 100).astype(np.int64) - 500
    for etype, g in ev.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        cum = g["pnl"].cumsum().to_numpy()
        peak = np.maximum.accumulate(cum)
        dd = peak - cum
        r = rows[etype]
        assert r.n_events == len(g)
        assert abs(r.max_drawdown - dd.max() / 100.0) < 1e-6
        i = int(dd.argmax())  # first occurrence == (ts, id) tie-break
        assert r.trough_ts == g["ts"].iloc[i]
        assert abs(r.peak_at_trough - peak[i] / 100.0) < 1e-6


def test_tost_equivalence_matches_numpy(spark):
    import hashlib

    rows = {
        r.event_type: r
        for r in QUERIES["ab_tost_equivalence"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["arm"] = [
        int(hashlib.md5(str(i).encode()).hexdigest()[:2], 16) % 2
        for i in ev["event_id"]
    ]
    ev["v"] = np.round(ev["value"] * 100).astype(np.int64) / 100.0
    for etype, g in ev.groupby("event_type"):
        t = g.loc[g["arm"] == 1, "v"].to_numpy()
        c = g.loc[g["arm"] == 0, "v"].to_numpy()
        se = np.sqrt(t.var(ddof=1) / len(t) + c.var(ddof=1) / len(c))
        delta = t.mean() - c.mean()
        m = abs(c.mean()) * 0.02
        r = rows[etype]
        assert abs(r.delta - delta) < 1e-5
        assert abs(r.std_err - se) < 1e-5
        assert abs(r.z_lower - (delta + m) / se) < 1e-3
        assert abs(r.z_upper - (delta - m) / se) < 1e-3
        assert r.equivalent == (
            (delta + m) / se > 1.645 and (delta - m) / se < -1.645
        )
    # margin > 0 forces z_lower > z_upper structurally; at sf0.001's
    # n (~1k/stratum) the +/-2% margin is below the test's power, so
    # equivalence is NOT claimed — exactly the honest TOST behavior
    # (a wide CI proves nothing, in either direction)
    for r in rows.values():
        assert r.z_lower > r.z_upper
        assert r.margin > 0


def test_neyman_allocation_matches_numpy(spark):
    rows = {
        r.stratum: r
        for r in QUERIES["sample_neyman_allocation"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["v"] = np.round(ev["value"] * 100).astype(np.int64) / 100.0
    w = {}
    nh = {}
    for etype, g in ev.groupby("event_type"):
        nh[etype] = len(g)
        w[etype] = len(g) * g["v"].std(ddof=1)
    tw, tn = sum(w.values()), sum(nh.values())
    total_neyman = 0.0
    for etype, r in rows.items():
        assert r.n_stratum == nh[etype]
        assert abs(r.n_neyman - 1000 * w[etype] / tw) < 1e-3
        assert abs(r.n_proportional - 1000 * nh[etype] / tn) < 1e-3
        total_neyman += r.n_neyman
    # allocations exhaust the budget
    assert abs(total_neyman - 1000) < 1e-2


def test_skew_kurtosis_matches_numpy(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["stats_skew_kurtosis"](spark, SF_DIR).collect()
    }
    ev = _table("events")
    ev["v"] = np.round(ev["value"] * 100).astype(np.int64) / 100.0
    for etype, g in ev.groupby("event_type"):
        x = g["v"].to_numpy()
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        r = rows[etype]
        assert r.n_rows == len(x)
        assert abs(r.mean - mu) < 1e-6
        assert abs(r.pop_stddev - np.sqrt(m2)) < 1e-6
        assert abs(r.skewness - m3 / m2**1.5) < 1e-4, etype
        assert abs(r.excess_kurtosis - (m4 / m2**2 - 3)) < 1e-4
