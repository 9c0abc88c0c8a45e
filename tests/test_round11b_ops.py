"""Round-11 second batch invariants: each new operator recomputed by an
independent pure-Python/numpy reference over the same parquet fixture
(the third engine beside Spark and the DuckDB oracle), plus codec
round-trip properties for the WAV kernel.

Hash-vs-DuckDB equivalence for the registered queries is covered by
tests/test_differential.py; this file pins the SEMANTICS the
docstrings claim.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from database_peak_streaming_spark.functions.multimodal import (
    decode_wav,
    encode_wav,
    real_codec,
)
from database_peak_streaming_spark.operators.multimodal_queries import (
    WAV_HI_ADD,
    WAV_HI_MUL,
    WAV_RATE,
)
from database_peak_streaming_spark.operators.rankstats import (
    stats_cliffs_delta_matrix,
)
from database_peak_streaming_spark.operators.text import MSTTR_SEG
from database_peak_streaming_spark.operators.time_windows import (
    PINBALL_TAUS,
    PINBALL_W,
    THETA_ALPHA,
    THETA_H,
)
from database_peak_streaming_spark.registry import QUERIES
from tests.conftest import SF_DIR


# --- WAV codec ---------------------------------------------------------


def test_wav_roundtrip_exact():
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 63, 1024):
        samples = rng.integers(-32768, 32768, size=n).astype(np.int16)
        dec, rate = decode_wav(encode_wav(samples, 44100))
        assert rate == 44100
        assert np.array_equal(dec, samples)


def test_wav_decoder_walks_chunk_list():
    """A real WAV may carry extra chunks (LIST/fact) between fmt and
    data — the parser must walk, not assume a 44-byte layout.  Also:
    odd-sized chunks pad to even offsets per RIFF."""
    samples = np.array([1, -2, 32767, -32768, 0], dtype=np.int16)
    payload = encode_wav(samples, 8000)
    head, body = payload[:36], payload[36:]
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    spliced = bytearray(head + extra + body)
    # fix the RIFF size field
    spliced[4:8] = (len(spliced) - 8).to_bytes(4, "little")
    dec, rate = decode_wav(bytes(spliced))
    assert rate == 8000
    assert np.array_equal(dec, samples)


def test_wav_decoder_rejects_non_pcm():
    samples = np.zeros(4, dtype=np.int16)
    payload = bytearray(encode_wav(samples, 8000))
    payload[20] = 3  # format tag -> IEEE float
    try:
        decode_wav(bytes(payload))
    except ValueError:
        pass
    else:
        raise AssertionError("non-PCM fmt tag must be rejected")
    # and real_codec dispatches RIFF payloads to the WAV decoder
    assert np.array_equal(
        real_codec(encode_wav(np.array([5, -6], dtype=np.int16))),
        np.array([5, -6], dtype=np.int16),
    )


def _wav_reference(text: str) -> tuple[int, int, int, int, int, int]:
    raw = text.encode("utf-8")
    n = len(raw) // 2
    vals = []
    for k in range(n):
        lo = raw[2 * k]
        hi = (raw[2 * k + 1] * WAV_HI_MUL + WAV_HI_ADD) % 256
        s = lo + 256 * hi
        vals.append(s - 65536 if s >= 32768 else s)
    if not vals:
        return 0, 0, 0, 0, 0, 0
    return (
        n,
        sum(v * v for v in vals),
        min(vals),
        max(vals),
        sum(1 for v in vals if v < 0),
        vals[0],
    )


def test_wav_query_matches_reference(spark):
    rows = {
        r.item_id: r
        for r in QUERIES["multimodal_wav_pcm_decode"](spark, SF_DIR).collect()
    }
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    neg_seen = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        n, ssq, mn, mx, nneg, first = _wav_reference(text)
        r = rows[doc_id]
        assert (
            r.n_samples,
            r.sum_sq,
            r.min_s,
            r.max_s,
            r.n_neg,
            r.first_s,
        ) == (n, ssq, mn, mx, nneg, first)
        assert r.sample_rate == WAV_RATE
        neg_seen += nneg
    # the affine high-byte transform must actually exercise the sign
    # path on this fixture, or the int16 claim is vacuous
    assert neg_seen > 0


# --- Theta method ------------------------------------------------------


def _daily(series_col: str = "value") -> pd.DataFrame:
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "ts", series_col]
    ).to_pandas()
    ev["day"] = ev["ts"].dt.date
    daily = (
        ev.groupby(["event_type", "day"])[series_col]
        .sum()
        .round(6)
        .reset_index(name="y")
    )
    return daily


def test_theta_method_matches_reference(spark):
    daily = _daily()
    out = {
        r.event_type: r
        for r in QUERIES["ts_theta_method"](spark, SF_DIR).collect()
    }
    for etype, grp in daily.groupby("event_type"):
        y = grp.sort_values("day")["y"].to_numpy(dtype=float)
        n = len(y)
        if n < 3:
            assert etype not in out
            continue
        t = np.arange(1, n + 1, dtype=float)
        b = ((n * (t * y).sum() - t.sum() * y.sum())
             / (n * (t * t).sum() - t.sum() ** 2))
        a = y.mean() - b * t.mean()
        z = 2.0 * y - (a + b * t)
        s = z[0]
        for x in z[1:]:
            s = THETA_ALPHA * x + (1 - THETA_ALPHA) * s
        fc = 0.5 * (a + b * (n + THETA_H)) + 0.5 * s
        r = out[etype]
        assert r.n_days == n
        assert abs(r.slope - b) < 1e-4
        assert abs(r.intercept - a) < 1e-3
        assert abs(r.ses_level - s) < 1e-3
        assert abs(r.forecast_7d_theta - fc) < 1e-3


# --- MSTTR -------------------------------------------------------------


def test_msttr_matches_reference(spark):
    rows = {
        r.doc_id: r
        for r in QUERIES["text_msttr_diversity"](spark, SF_DIR).collect()
    }
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    segmented_seen = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        full = len(toks) // MSTTR_SEG
        segs = [
            toks[i * MSTTR_SEG : (i + 1) * MSTTR_SEG] for i in range(full)
        ]
        r = rows[doc_id]
        assert r.n_tokens == len(toks)
        assert abs(r.ttr - len(set(toks)) / len(toks)) < 1e-6
        assert r.n_segments == full
        if full:
            want = sum(len(set(s)) for s in segs) / (MSTTR_SEG * full)
            assert abs(r.msttr - want) < 1e-6
            segmented_seen += 1
        else:
            assert r.msttr == 0.0
    assert segmented_seen > 0  # fixture must exercise full segments


def test_msttr_length_robustness():
    """The claim that motivates MSTTR over TTR: doubling a document
    (self-concatenation) halves its TTR-ish but leaves MSTTR exactly
    unchanged when the token count is a segment multiple."""
    base = ("tok%d" % (i % 40) for i in range(MSTTR_SEG * 4))
    toks = list(base)
    doubled = toks + toks

    def msttr(ts):
        full = len(ts) // MSTTR_SEG
        return sum(
            len(set(ts[i * MSTTR_SEG : (i + 1) * MSTTR_SEG]))
            for i in range(full)
        ) / (MSTTR_SEG * full)

    assert msttr(doubled) == msttr(toks)
    assert len(set(doubled)) / len(doubled) < len(set(toks)) / len(toks)


# --- Pinball -----------------------------------------------------------


def test_pinball_matches_reference(spark):
    daily = _daily()
    out = {
        (r.event_type, round(r.tau, 2)): r
        for r in QUERIES["forecast_pinball_quantile"](spark, SF_DIR).collect()
    }
    for etype, grp in daily.groupby("event_type"):
        y = grp.sort_values("day")["y"].to_numpy(dtype=float)
        for tau in PINBALL_TAUS:
            losses, covered = [], 0
            for i in range(PINBALL_W, len(y)):
                hist = np.sort(y[i - PINBALL_W : i])
                h = (PINBALL_W - 1) * tau
                lo = int(math.floor(h))
                q = hist[lo] + (h - lo) * (
                    hist[min(lo + 1, PINBALL_W - 1)] - hist[lo]
                )
                d = y[i] - q
                losses.append(round(max(tau * d, (tau - 1) * d), 6))
                covered += y[i] <= q
            if not losses:
                assert (etype, tau) not in out
                continue
            r = out[(etype, round(tau, 2))]
            assert r.n_eval == len(losses)
            assert abs(r.mean_pinball - np.mean(losses)) < 1e-6
            assert abs(r.coverage - covered / len(losses)) < 1e-6
            # coverage of a trailing-quantile forecaster should at
            # least order with tau on a stationary-ish fixture
    # monotone coverage across taus per type (weak calibration sanity)
    for etype in {k[0] for k in out}:
        cov = [out[(etype, round(t, 2))].coverage for t in PINBALL_TAUS]
        assert cov == sorted(cov)


# --- Cliff's delta -----------------------------------------------------


def test_cliffs_delta_matches_bruteforce(spark):
    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev["m"] = (ev["value"] * 100).round(0).astype(np.int64)
    groups = {t: np.sort(g["m"].to_numpy()) for t, g in ev.groupby("event_type")}
    rows = {
        (r.type_a, r.type_b): r
        for r in QUERIES["stats_cliffs_delta_matrix"](spark, SF_DIR).collect()
    }
    types = sorted(groups)
    assert len(rows) == len(types) * (len(types) - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            x, ysorted = groups[a], groups[b]
            # #(x > y) and #(x = y) via searchsorted — no pair loop
            gt = np.searchsorted(ysorted, x, side="left").sum()
            ge = np.searchsorted(ysorted, x, side="right").sum()
            ties = ge - gt
            n1, n2 = len(x), len(ysorted)
            delta = (gt - (n1 * n2 - ge)) / (n1 * n2)
            cl = (gt + 0.5 * ties) / (n1 * n2)
            r = rows[(a, b)]
            assert (r.n1, r.n2) == (n1, n2)
            assert abs(r.cliffs_delta - delta) < 1e-6
            assert abs(r.cl_effect - cl) < 1e-6
            # identity the docstring claims: delta = 2*CL - 1
            assert abs((2 * cl - 1) - delta) < 1e-12


def test_cliffs_delta_query_is_pairwise_free(spark):
    """No CartesianProduct / BroadcastNestedLoop on DATA-sized inputs:
    the only theta join allowed is the tiny type-pair grid."""
    from database_peak_streaming_spark.plans import explain as E

    df = stats_cliffs_delta_matrix(spark, SF_DIR)
    plan = E.formatted_plan(df)
    assert "CartesianProduct" not in plan


# --- k-anonymity -------------------------------------------------------


def test_k_anonymity_matches_reference(spark):
    from database_peak_streaming_spark.operators.checks import K_ANON_K

    cu = pq.read_table(
        f"{SF_DIR}/customer.parquet",
        columns=["c_mktsegment", "c_nationkey", "c_acctbal"],
    ).to_pandas()
    cu["band"] = np.floor(cu["c_acctbal"] / 1000).astype(np.int64)
    rows = {
        r.c_mktsegment: r
        for r in QUERIES["dq_k_anonymity"](spark, SF_DIR).collect()
    }
    for seg, g in cu.groupby("c_mktsegment"):
        sizes = g.groupby("c_nationkey").size()
        ldiv = g.groupby("c_nationkey")["band"].nunique()
        r = rows[seg]
        assert r.n_classes == len(sizes)
        assert r.n_rows == len(g)
        assert r.k_level == int(sizes.min())
        at_risk = int(sizes[sizes < K_ANON_K].sum())
        assert r.rows_at_risk == at_risk
        assert abs(r.pct_at_risk - 100 * at_risk / len(g)) < 1e-6
        assert r.l_floor == int(ldiv.min())


# --- path edit distance ------------------------------------------------


def test_path_edit_distance_matches_reference(spark):
    from database_peak_streaming_spark.operators.behavior import PATH_PREFIX

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    ev = pq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    paths = (
        ev.groupby("user_id")["event_type"]
        .apply(lambda s: "".join(t[0] for t in s.head(PATH_PREFIX)))
    )
    counts = paths.value_counts()
    top = counts.max()
    modal = min(p for p, c in counts.items() if c == top)
    import collections

    hist = collections.Counter(lev(p, modal) for p in paths)
    rows = QUERIES["events_path_edit_distance"](spark, SF_DIR).collect()
    assert {r.modal_path for r in rows} == {modal}
    got = {r.edit_distance: r.n_users for r in rows}
    assert got == dict(hist)
    total = sum(hist.values())
    for r in rows:
        assert abs(r.pct_users - 100 * hist[r.edit_distance] / total) < 1e-6


# --- k-truss -----------------------------------------------------------


def test_ktruss_matches_bruteforce(spark):
    from database_peak_streaming_spark.operators.graph import (
        TRUSS_MEAN_FRAC,
        TRUSS_ROUNDS,
    )

    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    edges: set[tuple[int, int]] = set()
    for _, parts in li.drop_duplicates().groupby("l_orderkey")["l_partkey"]:
        ps = sorted(set(parts))
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                edges.add((u, v))

    def support(es: set[tuple[int, int]]) -> dict[tuple[int, int], int]:
        from collections import defaultdict

        nbrs = defaultdict(set)
        for u, v in es:
            nbrs[u].add(v)
            nbrs[v].add(u)
        sup = {e: 0 for e in es}
        for u, v in es:
            for w in nbrs[u] & nbrs[v]:
                sup[(u, v)] += 1
        return sup

    rows = QUERIES["graph_ktruss_peel"](spark, SF_DIR).collect()
    assert len(rows) == TRUSS_ROUNDS
    cur = edges
    min_sup = None
    for rnd, r in zip(range(1, TRUSS_ROUNDS + 1), rows):
        sup = support(cur)
        if min_sup is None:  # adaptive: from the round-1 distribution
            min_sup = math.floor(
                TRUSS_MEAN_FRAC * sum(sup.values()) / len(sup)
            )
        surv = {e for e, s in sup.items() if s >= min_sup}
        assert r.round == rnd
        assert r.min_support == min_sup
        assert r.n_edges == len(cur)
        assert r.n_surviving == len(surv)
        assert r.n_dropped == len(cur) - len(surv)
        assert r.n_triangles == sum(sup.values()) // 3
        cur = surv
    # the peel must actually drop something in round 1 AND keep a core,
    # or the fixture makes the query vacuous
    assert rows[0].n_dropped > 0
    assert rows[-1].n_surviving > 0


def test_wav_decimate_matches_reference(spark):
    from database_peak_streaming_spark.operators.multimodal_queries import (
        WAV_DECIM,
    )

    rows = {
        r.item_id: r
        for r in QUERIES["multimodal_wav_decimate_stats"](
            spark, SF_DIR
        ).collect()
    }
    docs = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        raw = text.encode("utf-8")
        n = len(raw) // 2
        vals = []
        for k in range(0, n, WAV_DECIM):
            lo = raw[2 * k]
            hi = (raw[2 * k + 1] * WAV_HI_MUL + WAV_HI_ADD) % 256
            s = lo + 256 * hi
            vals.append(s - 65536 if s >= 32768 else s)
        r = rows[doc_id]
        assert r.n_samples == n
        assert r.n_out == len(vals)
        if vals:
            assert r.sum_sq_out == sum(v * v for v in vals)
            assert (r.min_out, r.max_out, r.first_out) == (
                min(vals), max(vals), vals[0],
            )


def test_subsequence_search_matches_reference(spark):
    from database_peak_streaming_spark.operators.time_windows import (
        SUBSEQ_TOP_K,
        SUBSEQ_W,
    )

    daily = _daily()
    wins = []
    for etype, grp in daily.groupby("event_type"):
        g = grp.sort_values("day")
        ys = g["y"].to_numpy(dtype=float)
        days = g["day"].tolist()
        for i in range(len(ys) - SUBSEQ_W + 1):
            wins.append((etype, days[i], ys[i : i + SUBSEQ_W]))
    q_type = min(w[0] for w in wins)
    q = max((w for w in wins if w[0] == q_type), key=lambda w: w[1])

    def znorm(xs):
        m, sd = xs.mean(), xs.std()
        return None if sd == 0 else (xs - m) / sd

    qz = znorm(q[2])
    scored = []
    for etype, day, xs in wins:
        if (etype, day) == (q[0], q[1]):
            continue
        z = znorm(xs)
        if z is None:
            continue
        scored.append(
            (round(float(np.sqrt(((z - qz) ** 2).sum())), 6), etype, day)
        )
    want = sorted(scored)[:SUBSEQ_TOP_K]
    rows = QUERIES["ts_subsequence_search_topk"](spark, SF_DIR).collect()
    assert len(rows) == len(want)
    for r, (d, etype, day) in zip(rows, want):
        assert (r.event_type, r.start_day) == (etype, day)
        assert abs(r.znorm_dist - d) < 1e-6
    # shape-invariance sanity: the best match beats the median match
    dists = sorted(s[0] for s in scored)
    assert want[0][0] <= dists[len(dists) // 2]


def test_kmeanspp_init_matches_reference(spark):
    import hashlib

    from database_peak_streaming_spark.operators.similarity import (
        KMPP_K,
        KMPP_SCALE,
        _kmpp_uniform,
    )

    # the uniforms really are the md5 pure function the docstring claims
    h = hashlib.md5(b"kmpp|2").hexdigest()[:13]
    assert _kmpp_uniform(2) == (int(h, 16) + 1.0) / (2.0**52 + 1.0)

    emb = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pandas().sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    Q = np.stack(
        [
            np.round(np.asarray(v, dtype=np.float64) * KMPP_SCALE).astype(
                np.int64
            )
            for v in emb["embedding"]
        ]
    )
    n = len(ids)
    picks = []
    idx1 = int(np.floor(_kmpp_uniform(1) * n))
    picks.append((1, int(ids[idx1]), 0, n))
    chosen = [Q[idx1]]
    for r in range(2, KMPP_K + 1):
        w = np.min(
            np.stack([((Q - c) ** 2).sum(axis=1) for c in chosen]), axis=0
        )
        tot = int(w.sum())
        cum = np.cumsum(w)
        target = _kmpp_uniform(r) * float(tot)
        j = int(np.searchsorted(cum.astype(np.float64), target, side="left"))
        # first index with cum >= target (float comparison as engines do)
        while float(cum[j]) < target:
            j += 1
        picks.append((r, int(ids[j]), int(w[j]), tot))
        chosen.append(Q[j])
    rows = QUERIES["ml_kmeanspp_init"](spark, SF_DIR).collect()
    got = [
        (r.round, r.vec_id, r.d2_at_pick, r.total_weight) for r in rows
    ]
    assert got == picks
    # seeding must actually spread: later rounds' total weight shrinks
    tots = [p[3] for p in picks[1:]]
    assert tots == sorted(tots, reverse=True)


def test_periodogram_stability_matches_reference(spark):
    from database_peak_streaming_spark.operators.time_windows import (
        PSTAB_PERIODS,
        PSTAB_SEG_HOURS,
    )

    ev = pq.read_table(
        f"{SF_DIR}/events.parquet", columns=["event_type", "ts"]
    ).to_pandas()
    ev["h"] = ev["ts"].dt.floor("h")
    hourly = ev.groupby(["event_type", "h"]).size().rename("x").reset_index()
    h0, h1 = hourly["h"].min(), hourly["h"].max()
    span = pd.date_range(h0, h1, freq="h")
    rows = {
        (r.event_type, r.period_hours): r
        for r in QUERIES["ts_periodogram_stability"](spark, SF_DIR).collect()
    }
    for etype in hourly["event_type"].unique():
        g = hourly[hourly["event_type"] == etype].set_index("h")["x"]
        x = g.reindex(span, fill_value=0).to_numpy(dtype=float)
        t = np.arange(len(x), dtype=float)
        nseg = len(x) // PSTAB_SEG_HOURS
        for P in PSTAB_PERIODS:
            ms = []
            for si in range(nseg):
                xs = x[si * PSTAB_SEG_HOURS : (si + 1) * PSTAB_SEG_HOURS]
                tt = t[si * PSTAB_SEG_HOURS : (si + 1) * PSTAB_SEG_HOURS]
                n = len(xs)
                mu = xs.mean()
                c = round(((xs - mu) * np.cos(2 * np.pi * tt / P)).sum() / n, 6)
                s_ = round(((xs - mu) * np.sin(2 * np.pi * tt / P)).sum() / n, 6)
                den = (xs * xs).sum() - mu * xs.sum()
                if den == 0:
                    continue
                pf = round(n * (c * c + s_ * s_) / den, 6)
                ms.append(int(round(pf * 1e6)))
            if not ms:
                assert (etype, P) not in rows
                continue
            r = rows[(etype, P)]
            k = len(ms)
            assert r.n_segments == k
            assert abs(r.mean_pf - sum(ms) / k / 1e6) < 1e-6
            var = sum(m * m for m in ms) / k - (sum(ms) / k) ** 2
            assert abs(r.sd_pf - (max(var, 0.0) ** 0.5) / 1e6) < 1e-6
            assert (r.min_pf, r.max_pf) == (min(ms) / 1e6, max(ms) / 1e6)
    # the fixture must yield multiple full segments or the spread is
    # degenerate and the stability claim untested
    assert all(r.n_segments >= 2 for r in rows.values())
