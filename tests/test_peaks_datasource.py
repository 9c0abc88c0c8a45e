"""The peaksbin Python DataSource must decode byte-identically to the
mapInPandas path (sources/binary.py) and parallelize one partition per
file."""

from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture()
def tmpdir_():
    d = tempfile.mkdtemp(prefix="dps-peaksbin-test")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _fixture_frames(n_frames: int, num_channels: int = 4) -> list[bytes]:
    from database_peak_streaming_spark.sources.binary import encode_peaks_frame

    frames = []
    for i in range(n_frames):
        counts = [(i + c) % 3 + 1 for c in range(num_channels)]
        wavelengths = [
            1500.0 + i + k / 10 for k in range(sum(counts))
        ]
        frames.append(
            encode_peaks_frame(
                serial_number=1000 + i,
                timestamp_int=1_700_000_000 + i,
                timestamp_frac=i * 1000,
                counts=counts,
                wavelengths=wavelengths,
            )
        )
    return frames


def test_datasource_matches_mapinpandas_decode(spark, tmpdir_):
    from pyspark.sql import functions as F

    from database_peak_streaming_spark.sources.binary import decode_peaks_frames
    from database_peak_streaming_spark.sources.peaks_datasource import (
        PeaksBinaryDataSource,
        write_peaks_file,
    )

    frames = _fixture_frames(9)
    # 3 files -> 3 partitions
    for i in range(3):
        write_peaks_file(f"{tmpdir_}/part_{i}.peaks", frames[i * 3 : (i + 1) * 3])

    spark.dataSource.register(PeaksBinaryDataSource)
    via_source = (
        spark.read.format("peaksbin")
        .option("num_channels", 4)
        .load(tmpdir_)
    )
    assert via_source.rdd.getNumPartitions() == 3

    frames_df = spark.createDataFrame(
        [(f,) for f in frames], "frame binary"
    )
    via_mapinpandas = decode_peaks_frames(frames_df, num_channels=4)

    key = ["serial_number", "channel", "peak_idx"]
    a = sorted(
        (r.serial_number, r.channel, r.peak_idx, r.wavelength, r.ts)
        for r in via_source.collect()
    )
    b = sorted(
        (r.serial_number, r.channel, r.peak_idx, r.wavelength, r.ts)
        for r in via_mapinpandas.collect()
    )
    assert len(a) > 0
    assert a == b

    # Catalyst-side ops compose: projection + filter over the source
    n_ch1 = via_source.filter(F.col("channel") == 1).count()
    assert n_ch1 == sum(1 for r in a if r[1] == 1)


def test_datasource_truncated_file_fails_loudly(spark, tmpdir_):
    from database_peak_streaming_spark.sources.peaks_datasource import (
        PeaksBinaryDataSource,
        write_peaks_file,
    )

    frames = _fixture_frames(2)
    write_peaks_file(f"{tmpdir_}/ok.peaks", frames)
    with open(f"{tmpdir_}/ok.peaks", "ab") as f:
        f.write(b"\x40\x00\x00\x00partial")  # claims 64 bytes, has 7

    spark.dataSource.register(PeaksBinaryDataSource)
    with pytest.raises(Exception, match="truncated"):
        (
            spark.read.format("peaksbin")
            .option("num_channels", 4)
            .load(tmpdir_)
            .collect()
        )


def test_datasource_stream_matches_batch(spark, tmpdir_):
    """The streaming half of the format (SimpleDataSourceStreamReader)
    must emit exactly the batch reader's rows over the same files, and
    replaying a committed offset range (readBetweenOffsets — what
    checkpoint recovery calls) must reproduce its batch."""
    import os

    from database_peak_streaming_spark.sources.peaks_datasource import (
        PeaksBinaryDataSource,
        PeaksBinarySimpleStreamReader,
        write_peaks_file,
    )

    frames = _fixture_frames(6)
    write_peaks_file(os.path.join(tmpdir_, "a.peaks"), frames[:3])
    write_peaks_file(os.path.join(tmpdir_, "b.peaks"), frames[3:])
    spark.dataSource.register(PeaksBinaryDataSource)

    collected = []
    q = (
        spark.readStream.format("peaksbin")
        .option("num_channels", "4")
        .load(tmpdir_)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _: collected.extend(df.collect()))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        spark.read.format("peaksbin")
        .option("num_channels", "4")
        .load(tmpdir_)
        .collect()
    )
    key = lambda r: (r.serial_number, r.ts, r.channel, r.peak_idx)
    assert sorted(collected, key=key) == sorted(batch, key=key)

    # deterministic replay of the first file's offset range
    rdr = PeaksBinarySimpleStreamReader({"path": tmpdir_, "num_channels": "4"})
    replay = list(
        rdr.readBetweenOffsets({"files_consumed": 0}, {"files_consumed": 1})
    )
    batch_a = [
        r
        for r in batch
        if r.serial_number in {1000, 1001, 1002}
    ]
    assert len(replay) == len(batch_a)


def test_datasource_write_read_roundtrip(spark, tmpdir_):
    """Full custom-format round-trip through the DataSourceWriter: read
    .peaks -> filter -> write .peaks via df.write.format('peaksbin')
    -> read back; the surviving rows must be value-identical and the
    dropped channel absent."""
    import os

    from database_peak_streaming_spark.sources.peaks_datasource import (
        PeaksBinaryDataSource,
        write_peaks_file,
    )

    spark.dataSource.register(PeaksBinaryDataSource)
    src = f"{tmpdir_}/src"
    os.makedirs(src)
    write_peaks_file(f"{src}/a.peaks", _fixture_frames(6))
    write_peaks_file(f"{src}/b.peaks", _fixture_frames(5))

    df = (
        spark.read.format("peaksbin")
        .option("num_channels", "4")
        .load(src)
    )
    kept = df.where("channel <> 2")
    dst = f"{tmpdir_}/dst"
    (
        kept.write.format("peaksbin")
        .option("num_channels", "4")
        .mode("overwrite")
        .save(dst)
    )
    assert any(f.endswith(".peaks") for f in os.listdir(dst))
    back = (
        spark.read.format("peaksbin")
        .option("num_channels", "4")
        .load(dst)
    )
    key = lambda r: (r.serial_number, r.ts, r.channel, r.peak_idx)
    want = sorted(kept.collect(), key=key)
    got = sorted(back.collect(), key=key)
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert key(g) == key(w)
        assert abs(g.wavelength - w.wavelength) < 1e-12
    assert back.where("channel = 2").count() == 0
    # overwrite mode really replaces: a second write leaves only its
    # own parts
    kept.limit(0).write.format("peaksbin").option("num_channels", "4").mode(
        "overwrite"
    ).save(dst)
    back2 = (
        spark.read.format("peaksbin").option("num_channels", "4").load(dst)
    )
    assert back2.count() == 0


def test_write_rejects_split_or_duplicated_frames(spark, tmpdir_):
    """The writer's frame-integrity invariant (round-6 ADVICE): rows of
    one (serial_number, ts) frame scattered across partitions, or
    duplicated (serial, ts, channel, peak_idx) rows, must FAIL the
    write loudly — before the guard they re-encoded silently with wrong
    counts and renumbered peak_idx, corrupting the round-trip."""
    import os

    import pytest

    from database_peak_streaming_spark.sources.peaks_datasource import (
        PeaksBinaryDataSource,
        write_peaks_file,
    )

    spark.dataSource.register(PeaksBinaryDataSource)
    src = f"{tmpdir_}/src"
    os.makedirs(src)
    write_peaks_file(f"{src}/a.peaks", _fixture_frames(6))
    df = (
        spark.read.format("peaksbin").option("num_channels", "4").load(src)
    )

    # frames split across partitions: round-robin repartition scatters a
    # frame's rows, so some partition sees a non-contiguous peak_idx run
    with pytest.raises(Exception, match="peak_idx"):
        df.repartition(8).write.format("peaksbin").option(
            "num_channels", "4"
        ).mode("overwrite").save(f"{tmpdir_}/bad1")

    # duplicated rows inside one partition: same loud failure
    with pytest.raises(Exception, match="peak_idx"):
        df.unionAll(df).coalesce(1).write.format("peaksbin").option(
            "num_channels", "4"
        ).mode("overwrite").save(f"{tmpdir_}/bad2")

    # the documented remedy makes the same data writable again:
    # repartition by the frame key restores frame-local completeness
    dst = f"{tmpdir_}/good"
    df.repartition("serial_number", "ts").write.format("peaksbin").option(
        "num_channels", "4"
    ).mode("overwrite").save(dst)
    back = (
        spark.read.format("peaksbin").option("num_channels", "4").load(dst)
    )
    assert back.count() == df.count()


def test_datasource_stream_write_roundtrip(spark, tmpdir_):
    """The full custom-format STREAMING pipe: readStream(peaksbin) ->
    writeStream(peaksbin) under availableNow must publish files whose
    batch read is value-identical to the source, and a re-delivered
    epoch (commit called again with the same batchId) must not
    double-publish."""
    import os

    from database_peak_streaming_spark.sources.peaks_datasource import (
        PeaksBinaryDataSource,
        PeaksBinaryStreamWriter,
        write_peaks_file,
    )

    spark.dataSource.register(PeaksBinaryDataSource)
    src = f"{tmpdir_}/src"
    os.makedirs(src)
    frames = _fixture_frames(6)
    write_peaks_file(f"{src}/a.peaks", frames[:3])
    write_peaks_file(f"{src}/b.peaks", frames[3:])

    dst = f"{tmpdir_}/dst"
    q = (
        spark.readStream.format("peaksbin")
        .option("num_channels", "4")
        .load(src)
        .writeStream.format("peaksbin")
        .option("num_channels", "4")
        .option("path", dst)
        .option("checkpointLocation", f"{tmpdir_}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def read_all(path):
        return (
            spark.read.format("peaksbin")
            .option("num_channels", "4")
            .load(path)
            .collect()
        )

    key = lambda r: (r.serial_number, r.ts, r.channel, r.peak_idx)
    got, want = read_all(dst), read_all(src)
    assert sorted(got, key=key) == sorted(want, key=key)
    # only published top-level files are visible; staging is drained
    assert not os.listdir(os.path.join(dst, "_staging"))
    published = [f for f in os.listdir(dst) if f.endswith(".peaks")]
    assert published and all(f.startswith("batch-") for f in published)

    # exactly-once: a re-delivered epoch with already-committed batchId
    # discards its staged duplicates instead of publishing them
    w = PeaksBinaryStreamWriter({"path": dst, "num_channels": "4"}, 4)
    committed = [b for b in os.listdir(os.path.join(dst, "_commits"))]
    assert committed, "no commit markers written"
    batch_id = int(sorted(committed)[0])
    staged = os.path.join(dst, "_staging", "part-redelivery.peaks")
    write_peaks_file(staged, frames[:1])

    class _Msg:
        path = staged

    w.commit([_Msg()], batch_id)
    assert not os.path.exists(staged)
    assert sorted(read_all(dst), key=key) == sorted(want, key=key)
