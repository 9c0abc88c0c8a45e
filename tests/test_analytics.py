"""Batch-analytics path tests (SURVEY.md §3.2): per-port regroup,
strain derivation over a tier table, and the plotting boundary."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from database_peak_streaming_spark.functions.sensor import GAUGE_FACTOR


@pytest.fixture(scope="module")
def lt_df(spark):
    """A small long-term tier: 2 channels x 2 peaks x 10 minutes."""
    t0 = dt.datetime(2024, 5, 1)
    rows = []
    for m in range(10):
        for ch in (1, 2):
            for pk in (0, 1):
                wl = 1500.0 + ch + 0.1 * pk + 0.001 * m
                rows.append((t0 + dt.timedelta(minutes=m), ch, pk, wl))
    return spark.createDataFrame(
        rows, "window_start timestamp, channel int, peak_idx int, mean_wavelength double"
    )


def test_per_port_series(spark, lt_df):
    from database_peak_streaming_spark.analytics import per_port_series

    out = per_port_series(lt_df).collect()
    assert len(out) == 4
    for r in out:
        assert len(r.ts_series) == 10
        assert r.ts_series == sorted(r.ts_series)
        # series values monotone (drift is +0.001/min)
        assert all(b > a for a, b in zip(r.wl_series, r.wl_series[1:]))


def test_derive_strain_matches_reference_formulas(spark, lt_df):
    from database_peak_streaming_spark.analytics import derive_strain

    itp, k, alpha = 21.5, 23.0, 0.55
    out = derive_strain(lt_df, itp=itp, metal_constant=k, alpha=alpha).collect()
    by_series = {}
    for r in out:
        by_series.setdefault((r.channel, r.peak_idx), []).append(r)
    for series in by_series.values():
        series.sort(key=lambda r: r.window_start)
        iwl = series[0].mean_wavelength
        for r in series:
            wl = r.mean_wavelength
            exp_total = 1e6 * ((wl - iwl) / iwl / GAUGE_FACTOR)
            exp_temp = (wl - iwl) / (wl * GAUGE_FACTOR * (k + alpha)) + itp
            assert abs(r.total_strain - exp_total) < 1e-9
            assert abs(r.temperature - exp_temp) < 1e-9
            assert abs(r.strain - (exp_total - exp_temp)) < 1e-9
        # baseline row: zero strain by definition (analyze_data.py:35)
        assert series[0].total_strain == 0.0


def test_plot_frames_boundary(spark, lt_df):
    from database_peak_streaming_spark.analytics import derive_strain, to_plot_frames

    frames = to_plot_frames(derive_strain(lt_df))
    assert set(frames) == {1, 2}
    for ch, pdf in frames.items():
        assert isinstance(pdf, pd.DataFrame)
        assert len(pdf) == 20  # 2 peaks x 10 minutes
        assert {"window_start", "strain", "temperature"} <= set(pdf.columns)


def test_render_svg_plot_sink(spark, lt_df, tmp_path):
    """S12 closure: the SVG sink emits well-formed XML with one panel
    per channel and one polyline per (channel, peak) series, each
    polyline carrying one point per window — the reference's
    per-port subplot loops (analyze_data.py:53-91) without the
    matplotlib dependency."""
    import xml.etree.ElementTree as ET

    from database_peak_streaming_spark.analytics import render_svg

    out = tmp_path / "lt.svg"
    svg = render_svg(lt_df, str(out))
    assert out.read_text() == svg

    root = ET.fromstring(svg)  # well-formed
    ns = "{http://www.w3.org/2000/svg}"
    panels = root.findall(f"{ns}g")
    assert len(panels) == 2  # channels 1, 2
    for panel in panels:
        lines = panel.findall(f"{ns}polyline")
        assert len(lines) == 2  # peaks 0, 1
        for line in lines:
            assert len(line.get("points").split()) == 10  # 10 windows
    # y-scaling sanity: every coordinate stays inside the viewBox
    w, h = float(root.get("width")), float(root.get("height"))
    for line in root.iter(f"{ns}polyline"):
        for pt in line.get("points").split():
            x, y = map(float, pt.split(","))
            assert 0 <= x <= w and 0 <= y <= h
