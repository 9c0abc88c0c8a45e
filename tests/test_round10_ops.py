"""Round-10 invariants: the area-scaled geo bench variant (grow-the-
area fixture interpretation, VERDICT r9 ask #7) and the co-occurrence
rewrite of the dedup threshold sweep.

Hash-vs-DuckDB equivalence for REGISTERED queries is covered by
tests/test_differential.py; the area-scaled geo variant is bench-only
(it is parameterized by the fixture's key offset, so it cannot carry a
static oracle in the registry) and gets its differential check here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from database_peak_streaming_spark.harness.diff import (
    diff_query,
    oracle_connection,
)
from database_peak_streaming_spark.operators.geo import (
    geo_area_scaled_oracle_sql,
    geo_area_scaled_query,
)
from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


def _table(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF_DIR}/{name}.parquet").to_pandas()


def _round_half_up(v, decimals: int = 0):
    """Half-up (away-from-zero) rounding, the rule Spark F.round and
    DuckDB ROUND share.  numpy/pandas ``.round`` is banker's half-even,
    which diverges from BOTH engines on exact .5 boundaries — the
    reference paths here must quantize the engines' way so a fixture
    value landing on a half-cent / 1e-6 boundary can't flake the test."""
    s = 10.0**decimals
    a = np.asarray(v, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * s + 0.5) / s


def test_geo_area_scaled_identity_at_base(spark):
    """With the stripe offset above max(c_custkey) every stripe index
    is 0 (the shift term is exactly +0.0), so the variant must equal
    the registered fixed-box query row for row."""
    max_key = int(_table("customer")["c_custkey"].max())
    base = QUERIES["geo_grid_radius_join"](spark, SF_DIR).collect()
    var = geo_area_scaled_query(max_key + 1)(spark, SF_DIR).collect()
    assert sorted(map(tuple, var)) == sorted(map(tuple, base))


def _three_stripe_offset() -> int:
    """An offset splitting the fixture's customers into ~3 stripes."""
    max_key = int(_table("customer")["c_custkey"].max())
    return max(1, (max_key + 1) // 3)


def test_geo_area_scaled_matches_oracle_multi_stripe(spark):
    """Differential check with a FORCED multi-stripe layout (offset =
    keyspan/3 splits the fixture's customers into 3 stripes): Spark and
    the generated DuckDB oracle agree on the same parameterization."""
    off = _three_stripe_offset()
    df = geo_area_scaled_query(off)(spark, SF_DIR)
    con = oracle_connection(SF_DIR)
    r = diff_query("geo_area_scaled", df, geo_area_scaled_oracle_sql(off), con)
    con.close()
    assert r.rows_match and r.hash_match, r.describe()


def test_geo_area_scaled_pair_volume_linear(spark):
    """The design property the deep bench tier relies on: splitting the
    SAME points into stripes keeps per-stripe density constant, so the
    qualifying-pair count under 3 stripes is ~1/3 of the fixed-box
    count (cross-stripe border pairs may add a little, never multiply).
    Verified by brute force on the synthesized coordinates."""
    from database_peak_streaming_spark.operators.geo import (
        KM_PER_DEG_LAT,
        KM_PER_DEG_LON,
        LAT0,
        LAT_SPAN,
        LON0,
        LON_SPAN,
        RADIUS_KM,
        _MOD,
        _MULT_A,
        _MULT_B,
    )

    keys = _table("customer")["c_custkey"].to_numpy(dtype=np.int64)
    off = _three_stripe_offset()
    lat = LAT0 + LAT_SPAN * ((keys * _MULT_A) % _MOD) / float(_MOD)
    lon_fixed = LON0 + LON_SPAN * ((keys * _MULT_B) % _MOD) / float(_MOD)
    lon_striped = lon_fixed + LON_SPAN * np.floor(keys / float(off))

    def n_pairs(lon):
        dx = (lon[None, :] - lon[:, None]) * KM_PER_DEG_LON
        dy = (lat[None, :] - lat[:, None]) * KM_PER_DEG_LAT
        hit = (dx * dx + dy * dy <= RADIUS_KM * RADIUS_KM) & (
            keys[:, None] < keys[None, :]
        )
        return int(hit.sum())

    fixed, striped = n_pairs(lon_fixed), n_pairs(lon_striped)
    assert striped < fixed
    # 3 stripes ~ 1/3 the density-driven pair count, within slack for
    # border pairs and sampling noise
    assert striped < 0.55 * fixed


def test_geo_haversine_swap_matches_numpy(spark):
    """The documented production-distance swap (VERDICT r9 ask #9):
    the haversine variant's top pairs == an O(n^2) numpy haversine
    brute force over the same synthesized coordinates, equality modulo
    the 3-dp presentation round."""
    from database_peak_streaming_spark.operators.geo import (
        EARTH_RADIUS_KM,
        LAT0,
        LAT_SPAN,
        LON0,
        LON_SPAN,
        RADIUS_KM,
        TOP_PAIRS,
        _MOD,
        _MULT_A,
        _MULT_B,
        geo_grid_radius_join_haversine,
    )

    got = geo_grid_radius_join_haversine(spark, SF_DIR).collect()
    assert 0 < len(got) <= TOP_PAIRS

    keys = _table("customer")["c_custkey"].to_numpy(dtype=np.int64)
    lat = np.radians(LAT0 + LAT_SPAN * ((keys * _MULT_A) % _MOD) / float(_MOD))
    lon = np.radians(LON0 + LON_SPAN * ((keys * _MULT_B) % _MOD) / float(_MOD))
    dlat = (lat[None, :] - lat[:, None]) / 2.0
    dlon = (lon[None, :] - lon[:, None]) / 2.0
    h = np.sin(dlat) ** 2 + np.cos(lat[:, None]) * np.cos(lat[None, :]) * np.sin(dlon) ** 2
    d = 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(h))
    ia, ib = np.where((d <= RADIUS_KM) & (keys[:, None] < keys[None, :]))
    brute = sorted(
        (float(d[a, b]), int(keys[a]), int(keys[b])) for a, b in zip(ia, ib)
    )[:TOP_PAIRS]
    assert sorted((r.dist_km, r.id_a, r.id_b) for r in got) == sorted(
        (round(dd, 3), a, b) for dd, a, b in brute
    )


# ---------------------------------------------------------------------------
# round-10 additions: numpy / pure-Python invariant checks (differential
# hash-parity is covered for all of these by tests/test_differential.py)
# ---------------------------------------------------------------------------


def test_pacf_matches_numpy_durbin_levinson(spark):
    """Spark acf/pacf == a from-scratch numpy ACF + Durbin-Levinson on
    the same dense daily series."""
    rows = QUERIES["ts_pacf_durbin_levinson"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.date
    d0, d1 = ev["d"].min(), ev["d"].max()
    import datetime as dt

    days = [d0 + dt.timedelta(days=i) for i in range((d1 - d0).days + 1)]
    for r in rows:
        sub = ev[ev["event_type"] == r.event_type]
        counts = sub.groupby("d").size()
        x = np.array([counts.get(d, 0) for d in days], dtype=float)
        assert r.n_days == len(x)
        mu = x.mean()
        den = ((x - mu) ** 2).sum()
        rho = [
            ((x[k:] - mu) * (x[:-k] - mu)).sum() / den for k in range(1, 6)
        ]
        for k in range(1, 6):
            assert abs(getattr(r, f"acf_{k}") - rho[k - 1]) < 1e-4
        # Durbin-Levinson
        phi_prev: list = []
        for k in range(1, 6):
            if k == 1:
                pkk = rho[0]
            else:
                num = rho[k - 1] - sum(
                    phi_prev[j - 1] * rho[k - 1 - j] for j in range(1, k)
                )
                dd = 1.0 - sum(
                    phi_prev[j - 1] * rho[j - 1] for j in range(1, k)
                )
                pkk = num / dd
            phi_prev = [
                phi_prev[j - 1] - pkk * phi_prev[k - 1 - j]
                for j in range(1, k)
            ] + [pkk]
            assert abs(getattr(r, f"pacf_{k}") - pkk) < 1e-4


def test_mcnemar_matches_pandas(spark):
    """Discordant cells == a pandas recomputation of per-user halves."""
    rows = QUERIES["stats_mcnemar_paired"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    us = pd.to_datetime(ev["ts"]).astype("int64") // 1000  # us
    mid = (us.min() + us.max()) // 2
    ev = ev.assign(h1=(us < mid).astype(int))
    for r in rows:
        sub = ev[ev["event_type"] == r.event_type]
        g = sub.groupby("user_id")["h1"].agg(["max", "min"])
        before = g["max"] == 1
        after = (1 - g["min"]) == 1
        b = int((before & ~after).sum())
        c = int((~before & after).sum())
        assert (r.before_only, r.after_only) == (b, c)
        if b + c:
            assert abs(r.chi2_mcnemar - (b - c) ** 2 / (b + c)) < 1e-4


def test_mood_matches_numpy(spark):
    """T statistic == brute-force mid-rank scores over the pooled
    two-sample values."""
    [r] = QUERIES["stats_mood_scale_test"](spark, SF_DIR).collect()
    ev = _table("events")
    types = sorted(ev["event_type"].unique())[:2]
    sub = ev[ev["event_type"].isin(types)]
    m = _round_half_up(sub["value"] * 100).astype(np.int64)
    ranks = pd.Series(m).rank(method="average").to_numpy()
    n = len(m)
    is1 = (sub["event_type"] == types[0]).to_numpy()
    t = (((ranks - (n + 1) / 2.0) ** 2)[is1]).sum()
    assert r.n_sample1 == int(is1.sum())
    assert abs(r.t_stat - t) < 1e-3
    e = is1.sum() * (n * n - 1) / 12.0
    v = is1.sum() * (n - is1.sum()) * (n + 1) * (n * n - 4) / 180.0
    assert abs(r.z_mood - (t - e) / np.sqrt(v)) < 1e-4


def test_dsir_matches_counter(spark):
    """Importance weights == a Counter-based add-1 log-ratio model."""
    from collections import Counter
    import math

    rows = QUERIES["corpus_dsir_importance"](spark, SF_DIR).collect()
    assert rows
    d = _table("documents")
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for _, row in d.iterrows():
        toks = row["text"].split(" ")
        raw.update(toks)
        if row["lang"] == "en":
            tgt.update(toks)
    v = len(raw)
    k_norm = math.log(sum(raw.values()) + v) - math.log(
        sum(tgt.values()) + v
    )
    by_id = dict(zip(d["doc_id"], d["text"]))
    for r in rows:
        toks = by_id[r.doc_id].split(" ")
        w = sum(
            math.log(tgt[t] + 1) - math.log(raw[t] + 1) for t in toks
        ) + len(toks) * k_norm
        assert r.n_tok == len(toks)
        assert abs(r.dsir_weight - w) < 1e-4
    # ranking sanity: weights descend
    ws = [r.dsir_weight for r in rows]
    assert ws == sorted(ws, reverse=True)


def test_self_bleu_matches_counter(spark):
    """Matched-occurrence fractions == a Counter df>=2 recomputation."""
    from collections import Counter

    rows = QUERIES["text_self_bleu_bigram"](spark, SF_DIR).collect()
    assert rows
    d = _table("documents")
    df_cnt: Counter = Counter()
    per_doc = {}
    for _, row in d.iterrows():
        toks = row["text"].split(" ")
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if bgs:
            per_doc[row["doc_id"]] = (row["source"], bgs)
            df_cnt.update(set(bgs))
    agg: dict = {}
    for src, bgs in per_doc.values():
        tot, match = agg.get(src, (0, 0))
        tot += len(bgs)
        match += sum(1 for b in bgs if df_cnt[b] >= 2)
        agg[src] = (tot, match)
    for r in rows:
        tot, match = agg[r.source]
        assert (r.total_bigrams, r.matched_bigrams) == (tot, match)
        assert abs(r.self_bleu_2 - match / tot) < 1e-6


def test_adamic_adar_matches_bruteforce(spark):
    """AA scores == brute-force common-neighbor 1/ln(deg) sums on the
    part co-occurrence graph."""
    import math
    from collections import defaultdict

    rows = QUERIES["graph_adamic_adar_linkpred"](spark, SF_DIR).collect()
    assert rows
    li = _table("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    by_order = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[o].add(p)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    for r in rows:
        common = nbrs[r.u] & nbrs[r.v]
        assert (r.u, r.v) not in edges
        assert r.cn == len(common) >= 2
        aa = sum(1.0 / math.log(len(nbrs[m])) for m in common)
        assert abs(r.aa_score - aa) < 1e-4


def test_gmm_step_matches_numpy(spark):
    """One EM step == a numpy recomputation with the same quantized
    responsibilities."""
    from database_peak_streaming_spark.operators.ml import (
        GMM_MU1,
        GMM_MU2,
        GMM_R_SCALE,
        GMM_SIGMA,
    )

    rows = QUERIES["ml_em_gmm_step"](spark, SF_DIR).collect()
    assert len(rows) == 2
    o = _table("orders")
    x = _round_half_up(o["o_totalprice"] * 100).astype(np.int64)
    xd = x / 100.0
    s2 = 2.0 * GMM_SIGMA**2
    p1 = 0.5 * np.exp(-((xd - GMM_MU1) ** 2) / s2)
    p2 = 0.5 * np.exp(-((xd - GMM_MU2) ** 2) / s2)
    r1u = _round_half_up(
        _round_half_up(p1 / (p1 + p2), 6) * GMM_R_SCALE
    ).astype(np.int64)
    for r, ru in zip(rows, (r1u, GMM_R_SCALE - r1u)):
        sr = float(ru.sum())
        mu = float((ru * x).sum()) / sr / 100.0
        var = float((ru.astype(object) * (x.astype(object) ** 2)).sum()) / sr / 1e4 - mu * mu
        assert abs(r.n_effective - sr / GMM_R_SCALE) < 1e-4
        assert abs(r.mu_new - mu) < 1e-3
        assert abs(r.sigma_new - np.sqrt(var)) < 1e-3


def test_spectral_entropy_consistent_with_periodogram(spark):
    """Entropy recomputed from the registered periodogram's power
    fractions equals the query's output (shared pipeline contract)."""
    import math

    ent = {
        r.event_type: r.spectral_entropy
        for r in QUERIES["ts_spectral_entropy"](spark, SF_DIR).collect()
    }
    per = QUERIES["ts_periodogram_dft"](spark, SF_DIR).collect()
    by_type: dict = {}
    for r in per:
        by_type.setdefault(r.event_type, []).append(
            (r.period_hours, r.power_frac)
        )
    for etype, pf in by_type.items():
        vals = [p for _, p in sorted(pf)]
        tot = sum(vals)
        h = -sum(
            (w / tot) * math.log(w / tot) for w in vals if w / tot > 0
        ) / math.log(6)
        assert abs(ent[etype] - h) < 1e-4
        assert 0.0 <= ent[etype] <= 1.0 + 1e-9


def test_holt_damped_matches_python_loop(spark):
    """Damped fold == an explicit python recurrence; damping pulls the
    7-day forecast toward level vs the linear twin."""
    from database_peak_streaming_spark.operators.time_windows import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_DAMP_PHI,
        HOLT_DAMP_SUM7,
    )

    rows = QUERIES["ts_holt_damped_trend"](spark, SF_DIR).collect()
    assert rows
    ev = _table("events")
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    for r in rows:
        sub = ev[ev["event_type"] == r.event_type]
        y = [
            float(_round_half_up(v, 6))
            for _, v in sorted(
                sub.groupby("day")["value"].sum().items()
            )
        ]
        l, b = y[0], y[1] - y[0]
        for v in y[1:]:
            l_new = HOLT_ALPHA * v + (1 - HOLT_ALPHA) * (
                l + HOLT_DAMP_PHI * b
            )
            b = HOLT_BETA * (l_new - l) + (1 - HOLT_BETA) * (
                HOLT_DAMP_PHI * b
            )
            l = l_new
        assert abs(r.level - l) < 1e-3
        assert abs(r.trend - b) < 1e-3
        assert abs(r.forecast_7d_damped - (l + HOLT_DAMP_SUM7 * b)) < 1e-3


def test_ppm_histogram_matches_bytes(spark):
    """Red-channel bins and RGB sum == byte-level recomputation from
    the source text (the codec contract)."""
    rows = QUERIES["multimodal_ppm_histogram"](spark, SF_DIR).collect()
    assert rows
    d = _table("documents")
    by_id = dict(zip(d["doc_id"], d["text"]))
    import math

    for r in rows[:50]:
        raw = by_id[r.item_id].encode("utf-8")
        h = max(1, math.ceil(len(raw) / 48))
        n_px = h * 16
        assert r.n_px == n_px
        rch = [
            raw[3 * k] if 3 * k < len(raw) else 0 for k in range(n_px)
        ]
        bins = [0, 0, 0, 0]
        for v in rch:
            bins[v >> 6] += 1
        assert [r.r_bin0, r.r_bin1, r.r_bin2, r.r_bin3] == bins
        assert r.sum_rgb == sum(raw)
