"""Invariant tests for the round-9 second batch (DFT periodogram,
Ljung-Box, local clustering coefficient, k-NN LOO eval, isotonic
calibration, Friedman test, lift/gains deciles).

Hash-vs-DuckDB equivalence is covered by tests/test_differential.py;
these pin the semantics the value hash hides — agreement with an
independent numpy/pandas computation of the same statistic, plus the
structural invariants (monotone PAV fit, lift-table identities).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _table(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/{name}.parquet").to_pandas()


def _dense_hourly() -> dict[str, np.ndarray]:
    """Dense per-type hourly count series over the global hour span."""
    ev = _table("events")
    ev["h"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    h0, h1 = ev["h"].min(), ev["h"].max()
    idx = pd.date_range(h0, h1, freq="h")
    out = {}
    for etype, g in ev.groupby("event_type"):
        counts = g.groupby("h").size().reindex(idx, fill_value=0)
        out[etype] = counts.to_numpy(dtype=float)
    return out


def test_periodogram_matches_numpy(spark):
    """DFT line powers == direct numpy trig sums on the same dense
    series (to rounding), and exactly one dominant flag per type."""
    rows = QUERIES["ts_periodogram_dft"](spark, SF_DIR).collect()
    assert rows
    series = _dense_hourly()
    dom_count: dict[str, int] = {}
    for r in rows:
        x = series[r.event_type]
        n = len(x)
        assert r.n_hours == n
        t = np.arange(n, dtype=float)
        xc = x - x.mean()
        w = 2.0 * math.pi * t / r.period_hours
        c = round(float((xc * np.cos(w)).sum()) / n, 6)
        s = round(float((xc * np.sin(w)).sum()) / n, 6)
        expect = n * (c * c + s * s) / float((xc * xc).sum())
        assert abs(r.power_frac - expect) < 1e-5, (r, expect)
        assert 0.0 <= r.power_frac <= 1.0 + 1e-9
        dom_count[r.event_type] = dom_count.get(r.event_type, 0) + r.is_dominant
    assert all(v == 1 for v in dom_count.values())


def test_ljung_box_matches_numpy(spark):
    """Q statistic == the textbook n(n+2) sum r_k^2/(n-k) computed by
    numpy from the same dense series with 6dp-rounded r_k."""
    rows = QUERIES["ts_ljung_box"](spark, SF_DIR).collect()
    assert rows
    series = _dense_hourly()
    for r in rows:
        x = series[r.event_type]
        n = len(x)
        assert r.n_hours == n and r.m_lags == 12
        xc = x - x.mean()
        den = float((xc * xc).sum())
        q = 0.0
        for k in range(1, 13):
            rk = round(float((xc[k:] * xc[:-k]).sum()) / den, 6)
            q += rk * rk / (n - k)
        q *= n * (n + 2)
        assert abs(r.q_stat - q) < 1e-4, (r, q)
        assert r.white_noise_rejected == int(r.q_stat > 21.0261)


def test_clustering_coefficient_matches_bruteforce(spark):
    """Top-20 per-node triangle counts and cc == brute-force adjacency
    sets on the same part co-occurrence graph."""
    rows = QUERIES["graph_clustering_coefficient"](spark, SF_DIR).collect()
    assert rows
    li = _table("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    adj: dict[int, set[int]] = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(g["l_partkey"].unique())
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
    tri = {
        node: sum(len(adj[node] & adj[nbr]) for nbr in nbrs) // 2
        for node, nbrs in adj.items()
    }
    expect = sorted(
        ((t, node) for node, t in tri.items() if t > 0),
        key=lambda p: (-p[0], p[1]),
    )[:20]
    got = [(r.n_triangles, r.partkey) for r in rows]
    assert got == expect
    for r in rows:
        d = len(adj[r.partkey])
        assert r.degree == d
        assert abs(r.local_cc - round(2.0 * r.n_triangles / (d * (d - 1)), 6)) < 1e-9
        assert 0.0 <= r.local_cc <= 1.0


def test_knn_loo_matches_numpy(spark):
    """5-NN majority vote == numpy cosine ranking with the same
    (rounded cosine desc, vec_id) and (votes desc, label) tie-breaks."""
    rows = QUERIES["sim_knn_loo_classify"](spark, SF_DIR).collect()
    assert len(rows) == 16
    emb = _table("embeddings")
    vecs = np.stack(emb["embedding"].to_numpy())
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    by_id = {int(i): k for k, i in enumerate(ids)}
    for r in rows:
        qi = by_id[r.q_id]
        cos = np.round((vecs @ vecs[qi]) / (norms * norms[qi]), 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != r.q_id),
            key=lambda i: (-cos[i], ids[i]),
        )[:5]
        votes: dict[int, int] = {}
        for i in order:
            votes[int(labels[i])] = votes.get(int(labels[i]), 0) + 1
        pred = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert r.label_pred == pred[0] and r.votes == pred[1], r
        assert r.label_true == int(labels[qi])
        assert r.correct == int(r.label_pred == r.label_true)


def _pav_pool(w: list[int], y: list[int]) -> list[float]:
    """Classic stack-based pool-adjacent-violators on weighted bins."""
    blocks: list[list[float]] = []  # [sum_y, sum_w]
    for wi, yi in zip(w, y):
        blocks.append([float(yi), float(wi)])
        while (
            len(blocks) > 1
            and blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    out: list[float] = []
    i = 0
    for sy, sw in blocks:
        acc = 0.0
        members = 0
        while acc < sw - 1e-9:
            acc += w[i]
            i += 1
            members += 1
        out.extend([sy / sw] * members)
    return out


def test_isotonic_matches_stack_pav(spark):
    """The minimax closed form == the classic iterative PAV pooling,
    and the fit is monotone non-decreasing."""
    rows = QUERIES["model_isotonic_calibration"](spark, SF_DIR).collect()
    assert rows
    w = [r.n for r in rows]
    y = [int(round(r.frac_positive * r.n)) for r in rows]
    expect = _pav_pool(w, y)
    prev = -1.0
    for r, e in zip(rows, expect):
        assert abs(r.iso_prob - round(e, 6)) < 1e-9, (r, e)
        assert r.iso_prob >= prev - 1e-12
        prev = r.iso_prob


def test_friedman_matches_pandas(spark):
    """Q == the tie-corrected formula on pandas average ranks."""
    [r] = QUERIES["stats_friedman_test"](spark, SF_DIR).collect()
    ev = _table("events")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    daily = ev.groupby(["day", "event_type"]).size().unstack()
    daily = daily.dropna()  # complete blocks only
    n, k = daily.shape
    assert r.n_blocks == n and r.k_treatments == k
    ranks = daily.rank(axis=1, method="average")
    rj = ranks.sum(axis=0).to_numpy()
    rsq = float((ranks**2).to_numpy().sum())
    num = float(((rj - n * (k + 1) / 2.0) ** 2).sum())
    q = (k - 1) * num / (rsq - n * k * (k + 1) ** 2 / 4.0)
    assert abs(r.q_stat - q) < 1e-4, (r.q_stat, q)
    assert r.rejected_95 == int(r.q_stat > 9.4877)


def test_lift_gains_matches_pandas(spark):
    """Decile table == pandas replication of NTILE + cumulative
    ratios; lift is a weighted-monotone summary ending at exactly 1."""
    rows = QUERIES["model_lift_gains_deciles"](spark, SF_DIR).collect()
    assert len(rows) == 10
    o = _table("orders")
    score = np.round(
        1.0 / (1.0 + np.exp(-(0.35 * np.log1p(o["o_totalprice"]) - 2.0))), 6
    )
    label = o["o_orderpriority"].isin(["1-URGENT", "2-HIGH"]).astype(int)
    df = pd.DataFrame(
        {"key": o["o_orderkey"], "score": score, "label": label}
    ).sort_values(["score", "key"], ascending=[False, True])
    nrows = len(df)
    base, extra = divmod(nrows, 10)
    sizes = [base + (1 if i < extra else 0) for i in range(10)]
    pos = df["label"].to_numpy()
    tot_pos = int(pos.sum())
    start = 0
    cum_n = cum_pos = 0
    for r, sz in zip(rows, sizes):
        seg = pos[start : start + sz]
        start += sz
        cum_n += sz
        cum_pos += int(seg.sum())
        assert r.n == sz and r.n_pos == int(seg.sum()), r
        assert r.cum_pos == cum_pos
        assert abs(r.gain - round(cum_pos / tot_pos, 6)) < 1e-9
        assert abs(r.lift - round(cum_pos * nrows / (tot_pos * cum_n), 6)) < 1e-9
    assert rows[-1].gain == 1.0 and rows[-1].lift == 1.0


def test_hits_matches_python(spark):
    """Two unnormalized HITS iterations == a dict-based replication;
    integer raw scores, per-role max normalization."""
    rows = QUERIES["graph_hits_hub_authority"](spark, SF_DIR).collect()
    assert rows
    o = _table("orders")[["o_orderkey", "o_custkey"]]
    li = _table("lineitem")[["l_orderkey", "l_suppkey"]]
    e = (
        o.merge(li, left_on="o_orderkey", right_on="l_orderkey")[
            ["o_custkey", "l_suppkey"]
        ]
        .drop_duplicates()
        .to_numpy()
    )
    a1: dict[int, int] = {}
    for c, s in e:
        a1[s] = a1.get(s, 0) + 1
    h1: dict[int, int] = {}
    for c, s in e:
        h1[c] = h1.get(c, 0) + a1[s]
    a2: dict[int, int] = {}
    for c, s in e:
        a2[s] = a2.get(s, 0) + h1[c]
    h2: dict[int, int] = {}
    for c, s in e:
        h2[c] = h2.get(c, 0) + a2[s]
    for role, table in (("hub", h2), ("authority", a2)):
        expect = sorted(table.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        mx = max(table.values())
        got = [r for r in rows if r.role == role]
        assert [(r.node, r.raw_score) for r in got] == expect
        for r, (node, raw) in zip(got, expect):
            assert abs(r.score - round(raw / mx, 6)) < 1e-9
        assert got[0].score == 1.0


def test_good_turing_matches_counter(spark):
    """4-gram count-of-counts table == collections.Counter replication;
    the singleton class dominates (the regime GT exists for) and r* < r
    on the singleton class."""
    from collections import Counter

    rows = QUERIES["text_good_turing_smoothing"](spark, SF_DIR).collect()
    assert rows and rows[0].r == 1
    d = _table("documents")
    freq: Counter = Counter()
    for txt in d["text"]:
        t = txt.split(" ")
        for i in range(len(t) - 3):
            freq[" ".join(t[i : i + 4])] += 1
    coc = Counter(freq.values())
    n_tokens = sum(freq.values())
    for r in rows:
        assert r.n_r == coc[r.r], r
        assert r.n_next == coc.get(r.r + 1, 0)
        assert abs(r.r_star - round((r.r + 1) * r.n_next / r.n_r, 6)) < 1e-9
        assert abs(r.p_unseen - round(coc[1] / n_tokens, 6)) < 1e-9
    assert rows[0].n_r > sum(r.n_r for r in rows[1:])  # singleton-heavy
    assert rows[0].r_star < 1.0


def test_cochran_armitage_matches_numpy(spark):
    """Z == the textbook formula computed by numpy on day cells."""
    [r] = QUERIES["stats_cochran_armitage_trend"](spark, SF_DIR).collect()
    ev = _table("events")
    day = pd.to_datetime(ev["ts"]).dt.day.to_numpy()
    pos = (ev["event_type"] == "purchase").to_numpy().astype(int)
    days = np.unique(day)
    n_i = np.array([(day == s).sum() for s in days], dtype=float)
    r_i = np.array([pos[day == s].sum() for s in days], dtype=float)
    n, rr = n_i.sum(), r_i.sum()
    a = float((days * r_i).sum())
    b = float((days * n_i).sum())
    c = float((days * days * n_i).sum())
    z = (a - rr * b / n) / math.sqrt(
        (rr * (n - rr) / n) * (c - b * b / n)
    )
    assert r.n_total == int(n) and r.n_pos == int(rr)
    assert abs(r.z_trend - z) < 1e-4
    assert r.rejected_95 == int(abs(r.z_trend) > 1.959964)


def test_hodges_lehmann_matches_bruteforce(spark):
    """HL center == brute-force median of all Walsh averages."""
    rows = QUERIES["stats_hodges_lehmann_daily"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    for r in rows:
        x = (
            ev[ev["event_type"] == r.event_type]
            .groupby("day")
            .size()
            .to_numpy()
        )
        assert r.n_days == len(x)
        w = sorted(
            (x[i] + x[j]) / 2.0
            for i in range(len(x))
            for j in range(i, len(x))
        )
        m = len(w)
        assert r.n_pairs == m
        hl = (w[(m + 1) // 2 - 1] + w[m // 2]) / 2.0
        assert abs(r.hl_center - round(hl, 6)) < 1e-9
        assert abs(r.plain_median - float(np.median(x))) < 1e-9


def test_cross_correlation_matches_numpy(spark):
    """Lagged cross-correlation == numpy replication on the same dense
    two-column series; lag 0 equals the plain Pearson correlation and
    exactly one peak is flagged."""
    rows = QUERIES["ts_cross_correlation"](spark, SF_DIR).collect()
    assert rows and sum(r.is_peak for r in rows) == 1
    ev = _table("events")
    ev["h"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    sub = ev[ev["event_type"].isin(["click", "purchase"])]
    h0, h1 = sub["h"].min(), sub["h"].max()
    idx = pd.date_range(h0, h1, freq="h")
    x = (
        sub[sub["event_type"] == "click"].groupby("h").size()
        .reindex(idx, fill_value=0).to_numpy(dtype=float)
    )
    y = (
        sub[sub["event_type"] == "purchase"].groupby("h").size()
        .reindex(idx, fill_value=0).to_numpy(dtype=float)
    )
    n = len(x)
    xc, yc = x - x.mean(), y - y.mean()
    den = math.sqrt(float((xc * xc).sum()) * float((yc * yc).sum()))
    for r in rows:
        k = r.lag_hours
        if k >= 0:
            num = float((xc[: n - k] * yc[k:]).sum())
        else:
            num = float((xc[-k:] * yc[: n + k]).sum())
        assert abs(r.xcorr - num / den) < 1e-5, (r, num / den)
    r0 = next(r for r in rows if r.lag_hours == 0)
    assert abs(r0.xcorr - float(np.corrcoef(x, y)[0, 1])) < 1e-5


def test_runs_test_matches_python(spark):
    """Run count and z == a plain-Python replication with the same
    above/below-median sign convention."""
    rows = QUERIES["stats_runs_test"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    for r in rows:
        x = (
            ev[ev["event_type"] == r.event_type]
            .groupby("day").size().sort_index().to_numpy()
        )
        med = float(np.median(x))
        signs = [1 if v > med else 0 for v in x if v != med]
        runs = 1 + sum(
            1 for i in range(1, len(signs)) if signs[i] != signs[i - 1]
        )
        n1, n2 = sum(signs), len(signs) - sum(signs)
        assert (r.n_runs, r.n_above, r.n_below) == (runs, n1, n2), r
        mu = 2 * n1 * n2 / (n1 + n2) + 1
        var = (
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        assert abs(r.z_runs - (runs - mu) / math.sqrt(var)) < 1e-5


def test_entropy_rate_matches_python(spark):
    """Entropy rate == Counter replication; bounded by ln(k) and by
    the marginal next-state entropy (conditioning reduces entropy)."""
    from collections import Counter

    [r] = QUERIES["events_entropy_rate"](spark, SF_DIR).collect()
    ev = _table("events").sort_values(["user_id", "ts", "event_id"])
    trans: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        seq = g["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    ctot = sum(trans.values())
    ci: Counter = Counter()
    for (a, _), c in trans.items():
        ci[a] += c
    h = -sum((c / ctot) * math.log(c / ci[a]) for (a, _), c in trans.items())
    assert r.n_transitions == ctot and r.n_cells == len(trans)
    assert abs(r.entropy_rate_nats - h) < 1e-5
    assert 0.0 <= r.entropy_rate_nats <= r.max_entropy_nats + 1e-9
    assert abs(r.efficiency - r.entropy_rate_nats / r.max_entropy_nats) < 1e-4


def test_burstiness_matches_python(spark):
    """Burstiness ratios == Counter replication of df/cf and the
    Poisson expected-df formula."""
    from collections import Counter

    rows = QUERIES["text_burstiness_church_gale"](spark, SF_DIR).collect()
    assert rows
    d = _table("documents")
    df_c: Counter = Counter()
    cf_c: Counter = Counter()
    for _, row in d.iterrows():
        t = row["text"].split(" ")
        grams = [" ".join(t[i : i + 2]) for i in range(len(t) - 1)]
        cf_c.update(grams)
        df_c.update(set(grams))
    dd = len(d)
    for r in rows:
        assert r.df == df_c[r.term] and r.cf == cf_c[r.term], r
        e = dd * (1.0 - math.exp(r.cf * math.log(1.0 - 1.0 / dd)))
        assert abs(r.expected_df - e) < 1e-4
        assert abs(r.burstiness - r.df / e) < 1e-4
        assert r.cf >= 10


def test_gamma_mom_matches_numpy(spark):
    """Gamma shape/scale == numpy moments of the same within-user
    integer-second gaps."""
    rows = QUERIES["events_interarrival_gamma_mom"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events").sort_values(["user_id", "ts", "event_id"])
    # fixture ts is timestamp[us]: int64 view is MICROseconds
    ev["sec"] = pd.to_datetime(ev["ts"]).astype("int64") // 10**6
    for r in rows:
        sub = ev[ev["event_type"] == r.event_type]
        gaps = []
        for _, g in sub.groupby("user_id"):
            s = g["sec"].to_numpy()
            gaps.extend((s[1:] - s[:-1]).tolist())
        gaps = np.array(gaps, dtype=float)
        assert r.n_gaps == len(gaps)
        mean, var = gaps.mean(), gaps.var(ddof=1)
        assert abs(r.mean_gap_sec - mean) < 1e-4
        assert abs(r.gamma_shape_k - mean * mean / var) < 1e-4
        assert abs(r.gamma_scale_theta - var / mean) < 1e-4


def test_g_test_matches_python(spark):
    """G == 2*N*MI identity against the Counter contingency, and the
    X2 companion matches the direct formula."""
    from collections import Counter

    [r] = QUERIES["stats_g_test_independence"](spark, SF_DIR).collect()
    d = _table("documents")
    cells = Counter(zip(d["lang"], d["source"]))
    ri: Counter = Counter(d["lang"])
    cj: Counter = Counter(d["source"])
    n = len(d)
    g = 2.0 * sum(
        o * math.log(o / (ri[a] * cj[b] / n)) for (a, b), o in cells.items()
    )
    # FULL-grid Pearson statistic (round-10: chi2 = sum(O^2/E) - N
    # identity) — structurally-absent cells contribute E_ij each.
    x2 = sum(
        (cells.get((a, b), 0) - ri[a] * cj[b] / n) ** 2
        / (ri[a] * cj[b] / n)
        for a in ri
        for b in cj
    )
    assert r.n_docs == n
    assert r.dof == (len(ri) - 1) * (len(cj) - 1)
    assert abs(r.g_stat - g) < 1e-4
    assert abs(r.chi2_stat - x2) < 1e-4
    assert r.g_stat >= 0.0


def test_round9_stats_survive_constant_series(spark, tmp_path):
    """Degenerate-corpus guard (the ANSI divide-by-zero hazard): on a
    metronome fixture — every type fires exactly once per hour, every
    user's gaps constant — zero-variance denominators must yield NULL
    on BOTH engines (Spark nullif == DuckDB x/0), never raise."""
    import datetime as dt
    import os

    from database_peak_streaming_spark.harness.diff import (
        diff_query,
        oracle_connection,
    )
    from database_peak_streaming_spark.registry import ORACLE_SQL
    from database_peak_streaming_spark.sources.batch import TABLES

    d = tmp_path / "metronome"
    d.mkdir()
    for t in TABLES:
        if t == "events":
            continue
        os.symlink(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        for i, etype in enumerate(
            ["click", "purchase", "view", "signup", "error"]
        ):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(hours=h, minutes=i),
                    100 + i,
                    etype,
                    1.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    con = oracle_connection(str(d))
    try:
        for name in (
            "ts_periodogram_dft",
            "ts_ljung_box",
            "stats_runs_test",
            "events_interarrival_gamma_mom",
            "stats_friedman_test",
            "stats_jarque_bera",
            "stats_skew_kurtosis",
            "stats_mann_kendall_trend",
            "ts_adf_unit_root",
            "ts_kpss_stationarity",
        ):
            df = QUERIES[name](spark, str(d))
            res = diff_query(name, df, ORACLE_SQL[name], con)
            assert res.rows_match and res.hash_match, (name, res.describe())
    finally:
        con.close()


def test_jarque_bera_matches_numpy(spark):
    """JB == the n/6(g1^2 + g2^2/4) formula on numpy population
    moments of the cent-quantized values."""
    rows = QUERIES["stats_jarque_bera"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    for r in rows:
        c = np.round(
            ev.loc[ev["event_type"] == r.event_type, "value"].to_numpy() * 100
        ) / 100.0
        n = len(c)
        assert r.n_rows == n
        mu = c.mean()
        m2 = ((c - mu) ** 2).mean()
        m3 = ((c - mu) ** 3).mean()
        m4 = ((c - mu) ** 4).mean()
        g1 = round(m3 / m2**1.5, 6)
        g2 = round(m4 / m2**2 - 3.0, 6)
        jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
        assert abs(r.skewness - g1) < 1e-4
        assert abs(r.excess_kurtosis - g2) < 1e-4
        assert abs(r.jb_stat - jb) < 1e-2
        assert r.normality_rejected_95 == int(r.jb_stat > 5.9915)


def test_mann_kendall_matches_python(spark):
    """S, tie-corrected variance and Z == brute-force pair loop."""
    rows = QUERIES["stats_mann_kendall_trend"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    for r in rows:
        x = (
            ev[ev["event_type"] == r.event_type]
            .groupby("day").size().sort_index().to_numpy()
        )
        n = len(x)
        s = sum(
            np.sign(x[j] - x[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        ties = Counter(x.tolist())
        tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
        if s > 0:
            z = (s - 1) / math.sqrt(var)
        elif s < 0:
            z = (s + 1) / math.sqrt(var)
        else:
            z = 0.0
        assert r.n_days == n and r.s_stat == int(s), r
        assert abs(r.z_mk - z) < 1e-5
        assert r.rejected_95 == int(abs(r.z_mk) > 1.959964)


def test_adf_matches_numpy(spark):
    """DF rho and t == numpy least squares on the same dense hourly
    series; a mean-reverting count series rejects the unit root."""
    rows = QUERIES["ts_adf_unit_root"](spark, SF_DIR).collect()
    assert rows
    series = _dense_hourly()
    for r in rows:
        xs = series[r.event_type]
        x = xs[:-1]
        y = np.diff(xs)
        m = len(x)
        assert r.n_obs == m
        A = np.column_stack([np.ones(m), x])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        rho = coef[1]
        resid = y - A @ coef
        sigma2 = float(resid @ resid) / (m - 2)
        cxx = float(((x - x.mean()) ** 2).sum())
        t = rho / math.sqrt(sigma2 / cxx)
        assert abs(r.rho - rho) < 1e-5, (r, rho)
        assert abs(r.t_df - t) < 1e-3, (r, t)
        assert r.unit_root_rejected_95 == int(r.t_df < -2.86)
        # hourly event counts mean-revert hard: the unit root must fall
        assert r.unit_root_rejected_95 == 1


def test_kpss_matches_numpy(spark):
    """KPSS eta == numpy partial-sum replication (l = 0 form), and the
    noisy count series does NOT reject level stationarity while ADF
    does reject the unit root — the two tests agree on the same data."""
    rows = QUERIES["ts_kpss_stationarity"](spark, SF_DIR).collect()
    assert rows
    series = _dense_hourly()
    for r in rows:
        x = series[r.event_type]
        n = len(x)
        assert r.n_hours == n
        s_t = np.cumsum(x - x.mean())
        sigma2 = float(((x - x.mean()) ** 2).mean())
        eta = float((s_t**2).sum()) / (n * n * sigma2)
        assert abs(r.kpss_eta - eta) < 1e-4, (r, eta)
        assert r.stationarity_rejected_95 == int(r.kpss_eta > 0.463)


def _round6_half_up(x: float) -> float:
    """Spark/DuckDB ROUND(x, 6): half away from zero — Python's built-in
    round() is half-even, and MMR scores (0.7x - 0.3y over 6-dp grids)
    land exactly on 1e-7 half-boundaries."""
    import math as _m

    s = -1.0 if x < 0 else 1.0
    return s * _m.floor(abs(x) * 1e6 + 0.5) / 1e6


def test_mmr_matches_greedy_python(spark):
    """MMR selection == a direct greedy replication on numpy cosines,
    and the selected set is genuinely diversity-adjusted: ranks 2+ are
    ordered by mmr, not plain similarity."""
    rows = QUERIES["rag_mmr_rerank"](spark, SF_DIR).collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    emb = _table("embeddings")
    # float64 up-cast first: Spark folds float32 entries into a double
    # accumulator, so a float32 numpy dot diverges at ~1e-9
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    ids = emb["vec_id"].to_numpy()
    qi = int(np.where(ids == 0)[0][0])
    simq = np.round((vecs @ vecs[qi]) / (norms * norms[qi]), 6)
    order = sorted(
        (i for i in range(len(ids)) if ids[i] != 0),
        key=lambda i: (-simq[i], ids[i]),
    )[:20]
    pool = {int(ids[i]): i for i in order}
    sims = {
        (int(ids[i]), int(ids[j])): round(
            float(vecs[i] @ vecs[j] / (norms[i] * norms[j])), 6
        )
        for i in order
        for j in order
        if i != j
    }
    selected = []
    first = min(pool, key=lambda v: (-simq[pool[v]], v))
    selected.append((1, first, _round6_half_up(0.7 * float(simq[pool[first]]))))
    while len(selected) < 5:
        best = None
        for v, i in pool.items():
            if v in [s[1] for s in selected]:
                continue
            red = max(sims[(v, s[1])] for s in selected)
            mmr = _round6_half_up(0.7 * float(simq[i]) - 0.3 * red)
            if best is None or (-mmr, v) < (-best[1], best[0]):
                best = (v, mmr)
        selected.append((len(selected) + 1, best[0], best[1]))
    for r, (rank, vid, mmr) in zip(rows, selected):
        assert r.rank == rank and r.vec_id == vid, (r, (rank, vid, mmr))
        assert abs(r.mmr_score - mmr) < 1e-9, (r, mmr)
        assert abs(r.simq - float(simq[pool[vid]])) < 1e-9


def test_kruskal_wallis_matches_pandas(spark):
    """Tie-corrected H == pandas pooled average ranks replication."""
    [r] = QUERIES["stats_kruskal_wallis"](spark, SF_DIR).collect()
    ev = _table("events")
    m = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    types = ev["event_type"].to_numpy()
    ranks = pd.Series(m).rank(method="average").to_numpy()
    n = len(m)
    rsum = 0.0
    k = 0
    for et in np.unique(types):
        mask = types == et
        rsum += ranks[mask].sum() ** 2 / mask.sum()
        k += 1
    h_raw = 12.0 / (n * (n + 1)) * rsum - 3 * (n + 1)
    from collections import Counter

    ties = Counter(m.tolist())
    corr = 1.0 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    h = h_raw / corr
    assert r.n_total == n and r.k_groups == k
    assert abs(r.h_stat - h) < 1e-4, (r.h_stat, h)
    assert r.rejected_95 == int(r.h_stat > 9.4877)


def test_granger_matches_numpy(spark):
    """Both direction F statistics == numpy OLS SSE comparison on the
    same dense hourly pair; the restricted model never beats the full
    one (F >= 0 up to rounding)."""
    rows = QUERIES["ts_granger_lead"](spark, SF_DIR).collect()
    assert [r.direction for r in rows] == [
        "click->purchase",
        "purchase->click",
    ]
    ev = _table("events")
    ev["h"] = pd.to_datetime(ev["ts"]).dt.floor("h")
    sub = ev[ev["event_type"].isin(["click", "purchase"])]
    idx = pd.date_range(sub["h"].min(), sub["h"].max(), freq="h")
    x = (
        sub[sub["event_type"] == "click"].groupby("h").size()
        .reindex(idx, fill_value=0).to_numpy(dtype=float)
    )
    y = (
        sub[sub["event_type"] == "purchase"].groupby("h").size()
        .reindex(idx, fill_value=0).to_numpy(dtype=float)
    )

    def f_stat(target, own_lag, other_lag):
        mn = len(target)
        a_r = np.column_stack([np.ones(mn), own_lag])
        c_r, *_ = np.linalg.lstsq(a_r, target, rcond=None)
        sse_r = float(((target - a_r @ c_r) ** 2).sum())
        a_u = np.column_stack([np.ones(mn), own_lag, other_lag])
        c_u, *_ = np.linalg.lstsq(a_u, target, rcond=None)
        sse_u = float(((target - a_u @ c_u) ** 2).sum())
        return (sse_r - sse_u) / (sse_u / (mn - 3))

    f_xy = f_stat(y[1:], y[:-1], x[:-1])
    f_yx = f_stat(x[1:], x[:-1], y[:-1])
    assert rows[0].n_obs == len(y) - 1
    assert abs(rows[0].f_stat - f_xy) < 1e-3, (rows[0], f_xy)
    assert abs(rows[1].f_stat - f_yx) < 1e-3, (rows[1], f_yx)
    for r in rows:
        assert r.f_stat >= -1e-9
        assert r.predictive_95 == int(r.f_stat > 3.8415)


def test_bmp_resize_matches_direct_sampling(spark):
    """The resize path (text -> pixels -> BMP encode -> decode ->
    nearest-neighbor 4x4) == directly sampling the source characters at
    the grid offsets — proves the codec round-trip preserves geometry
    and the sampling grid is floor(k*H/4) x floor(j*16/4)."""
    rows = QUERIES["multimodal_bmp_resize_stats"](spark, SF_DIR).collect()
    assert rows
    d = _table("documents").set_index("doc_id")
    for r in rows[:50]:
        text = d.loc[r.item_id, "text"]
        raw = text.encode("utf-8")
        h = max(1, -(-len(raw) // 48))
        assert r.src_height == h and r.out_size == 4
        sums = [0, 0, 0]
        for k in range(4):
            for j in range(4):
                row_, col = (k * h) // 4, (j * 16) // 4
                base = (row_ * 16 + col) * 3
                for ch in range(3):
                    v = raw[base + ch] if base + ch < len(raw) else 0
                    sums[ch] += v
                    if k == 0 and j == 0 and ch == 0:
                        assert r.px00_r == v
        assert (r.rs_r, r.rs_g, r.rs_b) == tuple(sums), r


def test_hurst_matches_numpy(spark):
    """Mean R/S per block size and the log-log slope == a direct numpy
    replication of the textbook R/S procedure."""
    rows = QUERIES["ts_hurst_rs"](spark, SF_DIR).collect()
    assert rows
    series = _dense_hourly()
    ln = math.log
    xs = [ln(b) for b in (16, 32, 64, 128)]
    xbar = sum(xs) / 4
    sxx = sum((v - xbar) ** 2 for v in xs)
    for r in rows:
        x = series[r.event_type]
        mrs_vals = []
        for b in (16, 32, 64, 128):
            nblk = len(x) // b
            rss = []
            for g in range(nblk):
                blk = x[g * b : (g + 1) * b]
                dev = np.cumsum(blk - blk.mean())
                rng = float(dev.max() - dev.min())
                # include the implicit 0 start? the engine's M_i runs
                # i=1..b with M_b = 0 exactly, matching cumsum of
                # demeaned values whose last entry is ~0 — no extra 0
                std = float(blk.std())  # population
                if std == 0.0:
                    # engines emit NULL R/S for a constant block
                    # (nullif), and AVG skips NULLs — mirror that
                    continue
                rss.append(rng / std)
            mrs = round(sum(rss) / len(rss), 6)
            mrs_vals.append(mrs)
            got = getattr(r, f"rs_{b}")
            assert abs(got - mrs) < 1e-4, (r.event_type, b, got, mrs)
        h = sum(
            (xi - xbar) / sxx * ln(m) for xi, m in zip(xs, mrs_vals)
        )
        assert abs(r.hurst_h - h) < 1e-4, (r, h)
        assert 0.0 < r.hurst_h < 1.0
        assert r.persistent == int(r.hurst_h > 0.5)


def test_dunn_posthoc_matches_pandas(spark):
    """Pairwise Dunn z == pandas pooled-rank replication, and the pair
    frame covers exactly k(k-1)/2 lexicographic pairs."""
    rows = QUERIES["stats_dunn_posthoc"](spark, SF_DIR).collect()
    ev = _table("events")
    m = np.round(ev["value"].to_numpy() * 100).astype(np.int64)
    types = ev["event_type"].to_numpy()
    ranks = pd.Series(m).rank(method="average").to_numpy()
    n = len(m)
    groups = sorted(np.unique(types))
    k = len(groups)
    assert len(rows) == k * (k - 1) // 2
    from collections import Counter

    ties = Counter(m.tolist())
    tie_sum = sum(t**3 - t for t in ties.values())
    base = n * (n + 1) / 12.0 - tie_sum / (12.0 * (n - 1))
    stats = {
        et: (ranks[types == et].mean(), int((types == et).sum()))
        for et in groups
    }
    it = iter(rows)
    for i in range(k):
        for j in range(i + 1, k):
            r = next(it)
            assert (r.type_a, r.type_b) == (groups[i], groups[j])
            (ra, na), (rb, nb) = stats[groups[i]], stats[groups[j]]
            z = (ra - rb) / math.sqrt(base * (1.0 / na + 1.0 / nb))
            assert r.n_a == na and r.n_b == nb
            assert abs(r.z_dunn - z) < 1e-4, (r, z)
            assert r.rejected_bonf_95 == int(abs(r.z_dunn) > 2.807)


def test_abc_xyz_matrix_consistent_with_parents(spark):
    """Matrix marginals == the registered parent classifiers' own
    outputs: XYZ-marginal part counts match orders_xyz_classification,
    ABC-marginal revenue matches abc_pareto_classification, and the
    revenue shares sum to 1."""
    rows = QUERIES["orders_abc_xyz_matrix"](spark, SF_DIR).collect()
    assert rows
    xyz_rows = QUERIES["orders_xyz_classification"](spark, SF_DIR).collect()
    abc_rows = QUERIES["abc_pareto_classification"](spark, SF_DIR).collect()
    from collections import Counter

    xyz_marginal = Counter()
    abc_marginal_n = Counter()
    abc_marginal_rev = Counter()
    share_total = 0.0
    for r in rows:
        xyz_marginal[r.xyz_class] += r.n_parts
        abc_marginal_n[r.abc_class] += r.n_parts
        abc_marginal_rev[r.abc_class] += r.cell_revenue
        share_total += r.revenue_share
    expect_xyz = Counter(x.xyz_class for x in xyz_rows)
    assert xyz_marginal == expect_xyz
    for a in abc_rows:
        assert abc_marginal_n[a.abc_class] == a.n_parts, a
        assert (
            abs(abc_marginal_rev[a.abc_class] - a.class_revenue)
            / a.class_revenue
            < 1e-9
        )
    assert abs(share_total - 1.0) < 1e-5
