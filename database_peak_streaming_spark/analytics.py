"""Batch analytics over the tiered store — the reference's
``analyze_data.py`` path (SURVEY.md §3.2), Spark-first.

Reference flow: ``SELECT *`` both lt tables -> positional id re-join ->
per-port column grouping from first-row counts -> per-series plot
(``analyze_data.py:44-91``).  Here: one conformed long-form table, a
windowed first-value baseline, pure-column derivation, and a single
``toPandas`` at the plotting boundary — the only driver-side hop, after
all reduction has happened distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from database_peak_streaming_spark.functions import sensor


def per_port_series(lt: DataFrame) -> DataFrame:
    """Per-port ordered series regroup (A8, ``analyze_data.py:66-82``):
    one row per (channel, peak_idx) carrying the time-ordered series —
    the distributed form of the reference's per-port plot loops."""
    return (
        lt.groupBy("channel", "peak_idx")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("window_start", "mean_wavelength"))
            ).alias("series")
        )
        .select(
            "channel",
            "peak_idx",
            F.transform("series", lambda s: s["window_start"]).alias("ts_series"),
            F.transform("series", lambda s: s["mean_wavelength"]).alias("wl_series"),
        )
        .orderBy("channel", "peak_idx")
    )


def derive_strain(
    lt: DataFrame,
    itp: float = 21.5,
    metal_constant: float = 23.0,
    alpha: float = 0.55,
) -> DataFrame:
    """Full P12 derivation over the long-term tier
    (``analyze_data.py:30-41``): per-series first-value baseline (iwl),
    then total_strain / temperature / strain columns."""
    w = Window.partitionBy("channel", "peak_idx").orderBy("window_start")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    iwl = F.first("mean_wavelength").over(w_all)
    total = sensor.total_strain(F.col("mean_wavelength"), F.col("iwl"))
    temp = sensor.temperature(
        F.col("mean_wavelength"),
        F.col("iwl"),
        F.lit(itp),
        metal_constant=metal_constant,
        alpha=alpha,
    )
    return (
        lt.withColumn("iwl", iwl)
        .withColumn("total_strain", total)
        .withColumn("temperature", temp)
        .withColumn("strain", sensor.strain(F.col("total_strain"), F.col("temperature")))
    )


def render_svg(
    derived: DataFrame,
    path: str,
    value_col: str = "mean_wavelength",
    width: int = 960,
    panel_height: int = 220,
    margin: int = 40,
) -> str:
    """S12 plot sink, closed for real: render the per-channel series to
    a standalone SVG file with NO plotting dependency (the reference's
    ``plt.subplot(2,1,i)`` + per-port ``plt.plot`` loops at
    ``analyze_data.py:53-91``; matplotlib is not in this environment, so
    the figure is emitted as hand-built SVG markup — same visual
    semantics: one stacked panel per channel, one polyline per peak
    series over time).

    The engine-side contract is unchanged: all reduction happens
    distributed, and only the to-be-plotted points (windowed means, a
    bounded aggregate) cross the driver boundary.  Returns the SVG text
    (also written to ``path``)."""
    rows = (
        derived.select("channel", "peak_idx", "window_start", value_col)
        .orderBy("channel", "peak_idx", "window_start")
        .collect()
    )
    by_channel: dict[int, dict[int, list[tuple[float, float]]]] = {}
    for r in rows:
        ts = r["window_start"].timestamp()
        by_channel.setdefault(int(r["channel"]), {}).setdefault(
            int(r["peak_idx"]), []
        ).append((ts, float(r[value_col])))

    channels = sorted(by_channel)
    height = margin + len(channels) * (panel_height + margin)
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">'
    ]
    palette = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd", "#8c564b"]
    for pi, ch in enumerate(channels):
        panel_top = margin + pi * (panel_height + margin)
        pts = [p for series in by_channel[ch].values() for p in series]
        x0, x1 = min(p[0] for p in pts), max(p[0] for p in pts)
        y0, y1 = min(p[1] for p in pts), max(p[1] for p in pts)
        xspan = (x1 - x0) or 1.0
        yspan = (y1 - y0) or 1.0
        out.append(
            f'<g data-channel="{ch}">'
            f'<rect x="{margin}" y="{panel_top}" width="{width - 2 * margin}"'
            f' height="{panel_height}" fill="none" stroke="#999"/>'
            f'<text x="{margin}" y="{panel_top - 6}" font-size="12">'
            f"channel {ch} — {value_col}</text>"
        )
        for peak_idx in sorted(by_channel[ch]):
            series = by_channel[ch][peak_idx]
            coords = " ".join(
                f"{margin + (t - x0) / xspan * (width - 2 * margin):.1f},"
                f"{panel_top + panel_height - (v - y0) / yspan * panel_height:.1f}"
                for t, v in series
            )
            color = palette[peak_idx % len(palette)]
            out.append(
                f'<polyline data-peak="{peak_idx}" points="{coords}" '
                f'fill="none" stroke="{color}" stroke-width="1.5"/>'
            )
        out.append("</g>")
    out.append("</svg>")
    svg = "\n".join(out)
    with open(path, "w") as f:
        f.write(svg)
    return svg


def to_plot_frames(derived: DataFrame) -> dict[int, "object"]:
    """The plotting boundary (S12): one pandas frame per channel, indexed
    by window_start — hand directly to matplotlib outside the engine.
    The reduction (windowing, baselines, derivation) already ran
    distributed; only the to-be-plotted points cross to the driver."""
    pdf = derived.select(
        "channel", "peak_idx", "window_start", "mean_wavelength",
        "total_strain", "temperature", "strain",
    ).toPandas()
    return {
        int(ch): g.sort_values(["peak_idx", "window_start"]).reset_index(drop=True)
        for ch, g in pdf.groupby("channel")
    }
