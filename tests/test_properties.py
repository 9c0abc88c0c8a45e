"""Property-based and bulk-random tests (SURVEY.md §5.5).

Hypothesis drives the pure-Python pieces (binary codec roundtrip,
canonicalizer invariants) where examples are cheap; the Spark kernels get
one bulk job over many random rows instead of a job per example.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


@st.composite
def _frame_case(draw):
    counts = draw(
        st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=8)
    )
    n = sum(counts)
    wls = draw(
        st.lists(
            st.floats(
                min_value=1000.0, max_value=2000.0, allow_nan=False, width=64
            ),
            min_size=n,
            max_size=n,
        )
    )
    return counts, wls


@given(_frame_case(), st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_binary_frame_roundtrip_property(case, serial):
    """encode -> decode is the identity on (counts, wavelengths) layout
    (hyperion.py:432-453 format)."""
    from database_peak_streaming_spark.sources.binary import (
        _decode_one,
        encode_peaks_frame,
    )

    counts, wls = case
    frame = encode_peaks_frame(serial, 1_700_000_000, 0, counts, wls)
    rows = list(_decode_one(frame, num_channels=len(counts)))
    assert len(rows) == len(wls)
    flat_back = [r[4] for r in rows]
    assert flat_back == wls
    # channel boundaries respected
    per_channel = {}
    for _, _, ch, pk, _wl in rows:
        per_channel.setdefault(ch, []).append(pk)
    for ch, n in enumerate(counts, start=1):
        assert len(per_channel.get(ch, [])) == n


@given(
    st.lists(
        st.tuples(
            st.integers(-1000, 1000),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.text(max_size=8),
        ),
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_value_hash_order_insensitive(rows):
    """The differential hash must not depend on row order or column
    order (the driver sorts columns by name; rows are a set)."""
    import random

    from database_peak_streaming_spark.harness.diff import value_hash

    cols = ["a", "b", "c"]
    h1 = value_hash(cols, rows)
    shuffled = rows[:]
    random.Random(0).shuffle(shuffled)
    assert value_hash(cols, shuffled) == h1
    # column permutation with matching tuple permutation
    perm_rows = [(r[2], r[0], r[1]) for r in rows]
    assert value_hash(["c", "a", "b"], perm_rows) == h1


def test_canonical_value_edge_cases():
    from database_peak_streaming_spark.harness.diff import _canon_value

    assert _canon_value(None) == "<NULL>"
    assert _canon_value(-0.0) == "0.000000"
    assert _canon_value(float("nan")) == "NaN"
    assert _canon_value(True) == "true"
    assert _canon_value(1.0000004) == _canon_value(1.0000004123)


def test_reslice_bulk_random_matches_numpy(spark):
    """100 random ragged (counts, flat) rows through the Catalyst kernel
    in ONE job, each compared to numpy slicing."""
    from database_peak_streaming_spark.functions import sensor

    rng = np.random.default_rng(123)
    rows = []
    for _ in range(100):
        counts = rng.integers(0, 5, size=rng.integers(1, 9)).tolist()
        flat = rng.uniform(1500, 1600, size=sum(counts)).tolist()
        rows.append((counts, flat))
    df = spark.createDataFrame(rows, "c array<int>, f array<double>")
    got = df.select(
        "c", "f", sensor.reslice_ragged(F.col("f"), F.col("c")).alias("s")
    ).collect()
    for r in got:
        bounds = np.cumsum(r.c)
        expected, start = [], 0
        for b, n in zip(bounds, r.c):
            expected.append(r.f[start : start + n])
            start += n
        assert r.s == expected


@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    split=st.integers(min_value=0, max_value=59),
)
@settings(max_examples=200, deadline=None)
def test_ema_kernel_batch_split_invariant(values, split):
    """The EMA processor must be batch-boundary invariant: feeding a
    series as one batch or split at ANY point yields identical output —
    the ValueState carries exactly the information the recurrence needs.
    Cross-checked against pandas ewm(adjust=False)."""
    import numpy as np
    import pandas as pd

    from database_peak_streaming_spark.streaming.stateful import (
        EMA_ALPHA,
        EmaSmoother,
    )

    class _Stub:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, t):
            self.v = t

    def run(batches):
        proc = EmaSmoother()
        proc._state = _Stub()
        out = []
        t0 = pd.Timestamp("2024-01-01")
        i = 0
        for b in batches:
            if not b:
                continue
            pdf = pd.DataFrame({
                "channel": [1] * len(b),
                "ts": [t0 + pd.Timedelta(seconds=i + j) for j in range(len(b))],
                "value": b,
            })
            i += len(b)
            out.extend(next(proc.handleInputRows((1,), iter([pdf]), None))["ema"])
        return out

    whole = run([values])
    cut = min(split, len(values))
    parts = run([values[:cut], values[cut:]])
    assert len(whole) == len(parts) == len(values)
    assert all(abs(a - b) < 1e-9 for a, b in zip(whole, parts))
    want = pd.Series(values).ewm(alpha=EMA_ALPHA, adjust=False).mean()
    assert np.allclose(whole, want, atol=1e-9)


@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=30, deadline=None)
def test_micros_fixed_point_equals_decimal_sum(values):
    """The long micro-unit path (operators/common.micros + from_micros)
    must reproduce the DECIMAL(28,6) exact sum bit-for-bit for every
    value in the money/quantity domain — the invariant the q1/q3/q5/q18
    rewrites rely on."""
    import decimal

    ref = sum(
        decimal.Decimal(v).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
        for v in values
    )
    micros = sum(
        int(
            decimal.Decimal(v)
            .quantize(decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP)
            .scaleb(6)
        )
        for v in values
    )
    assert decimal.Decimal(micros).scaleb(-6) == ref


def test_micros_spark_matches_dsum(spark):
    """End-to-end on the engine: dsum (split-limb long path) and the
    micros/from_micros long path produce identical doubles over a
    sign-mixed in-contract column (2-decimal money values — the
    fixture's domain)."""
    from database_peak_streaming_spark.operators.common import (
        dsum,
        from_micros,
        micros,
    )

    df = spark.range(10_000).select(
        (((F.col("id") - 5000) * 37) / 100.0).alias("x")
    )
    a = df.agg(dsum("x", "s")).collect()[0].s
    b = df.agg(from_micros(F.sum(micros("x")), "s")).collect()[0].s
    assert a == b


def test_micros_double_fast_path_equals_decimal_cast(spark):
    """The micros contract: for <= 6-fractional-digit values inside the
    magnitude bound, the pure-double floor(x*1e6 + 0.5) form equals the
    DECIMAL(18,6) cast bit-for-bit — including negatives (HALF_UP is
    away-from-zero) and the compound 6-digit money chain q1 uses."""
    from database_peak_streaming_spark.operators.common import micros

    base = spark.range(20_000).select(
        (F.col("id") - 10_000).alias("k"),
        # 2-digit money value
        (((F.col("id") - 10_000) * 137) / 100.0).alias("price"),
        # 2-digit rate in [-0.5, 0.5)
        (((F.col("id") % 100) - 50) / 100.0).alias("rate"),
    )
    cases = {
        "price": F.col("price"),
        # 4- and 6-digit compounds (the q1 disc_price / charge shapes)
        "disc": F.col("price") * (1 - F.col("rate")),
        "charge": F.col("price") * (1 - F.col("rate")) * (1 + F.col("rate")),
        # magnitude edge: near the 4e9 bound, still 2 digits
        "big": F.col("k") * 399_999.99,
    }
    for name, c in cases.items():
        mism = (
            base.select(
                micros(c).alias("fast"),
                (c.cast("decimal(18,6)") * 1000000).cast("long").alias("ref"),
            )
            .where(F.col("fast") != F.col("ref"))
            .count()
        )
        assert mism == 0, f"{name}: {mism} divergent rows"


def test_micros_raises_beyond_magnitude_bound(spark):
    """Inputs beyond the exact fast-path bound must raise, never
    silently lose exactness."""
    import pytest as _pytest

    from database_peak_streaming_spark.operators.common import micros

    df = spark.range(10).select((F.lit(5.0e9) + F.col("id")).alias("x"))
    with _pytest.raises(Exception, match="micros"):
        df.select(micros("x").alias("m")).collect()


def test_dsum_bounded_raises_on_long_overflow(spark):
    """The boundedness guard is enforced, not documented: feeding
    dsum_bounded a group whose long micro-unit partial wraps must raise,
    never return a silently wrong 'exact' sum.  200 rows of 1e11 sum to
    2e19 micro-units > 2^63."""
    import pytest as _pytest

    from database_peak_streaming_spark.operators.common import dsum_bounded

    # 3000 rows of 3.9e9 stay inside the micros magnitude bound but
    # their micro-unit sum (1.17e19) exceeds 2^63.
    df = spark.range(3000).select(F.lit(3.9e9).alias("x"))
    with _pytest.raises(Exception, match="overflow"):
        df.agg(dsum_bounded("x", "s")).collect()


def test_merge_micros_checked_raises_on_overflowed_partial(spark):
    """Two-phase form: a phase-1 partial that wrapped (try_sum -> NULL)
    must fail the phase-2 merge."""
    import pytest as _pytest

    from database_peak_streaming_spark.operators.common import (
        merge_micros_checked,
        micros_partial,
    )

    df = spark.range(6000).select(
        (F.col("id") % 2).alias("g"), F.lit(3.9e9).alias("x")
    )
    part = df.groupBy("g").agg(micros_partial("x", "_m"))
    with _pytest.raises(Exception, match="overflow"):
        part.groupBy().agg(merge_micros_checked("_m", "s")).collect()


def test_merge_micros_checked_ok_within_bounds(spark):
    """Control: the guarded path returns the exact decimal sum when the
    partial stays in range."""
    from database_peak_streaming_spark.operators.common import (
        dsum,
        merge_micros_checked,
        micros_partial,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 7).alias("g"),
        ((F.col("id") - 5000) * 0.123456).alias("x"),
    )
    part = df.groupBy("g", F.spark_partition_id().alias("_p")).agg(
        micros_partial("x", "_m")
    )
    got = {
        r.g: r.s
        for r in part.groupBy("g").agg(merge_micros_checked("_m", "s")).collect()
    }
    want = {r.g: r.s for r in df.groupBy("g").agg(dsum("x", "s")).collect()}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_zorder_arithmetic_matches_bit_interleave(spark, pts):
    """The arithmetic-only Morton expression (storage._zexpr — shared
    verbatim with the DuckDB oracle) must equal true bit interleaving
    for every 8-bit coordinate pair."""
    from pyspark.sql import functions as SF

    from database_peak_streaming_spark.operators.storage import _zexpr

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pts, "x: long, y: long").select(
        "x", "y", SF.expr(_zexpr("x", "y", "DIV")).alias("z")
    )
    for r in df.collect():
        assert r.z == morton(r.x, r.y), (r.x, r.y, r.z)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=512
    ),
    st.integers(min_value=1, max_value=192_000),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    """encode_wav o decode_wav is the identity on any mono int16
    stream at any sample rate — the hypothesis twin of the fixed-case
    suite in tests/test_round11b_ops.py."""
    import numpy as np

    from database_peak_streaming_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    arr = np.array(samples, dtype=np.int16)
    dec, got_rate = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    assert np.array_equal(dec, arr)


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=1,
        max_size=64,
    ),
    st.binary(min_size=0, max_size=32),
)
@settings(max_examples=40, deadline=None)
def test_wav_decoder_survives_injected_chunk(samples, junk):
    """The chunk walk must skip ANY well-formed unknown chunk between
    fmt and data (with RIFF even-offset padding), not just the LIST
    chunk the fixed test injects."""
    import numpy as np

    from database_peak_streaming_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    arr = np.array(samples, dtype=np.int16)
    payload = encode_wav(arr, 8000)
    head, body = payload[:36], payload[36:]
    chunk = b"junk" + len(junk).to_bytes(4, "little") + junk
    if len(junk) % 2:
        chunk += b"\x00"  # RIFF pads odd chunks to even offsets
    spliced = bytearray(head + chunk + body)
    spliced[4:8] = (len(spliced) - 8).to_bytes(4, "little")
    dec, rate = decode_wav(bytes(spliced))
    assert rate == 8000
    assert np.array_equal(dec, arr)
