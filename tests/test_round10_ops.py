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
