"""Live TCP socket ingest for the peaks wire format (S1, the last
reference-topology gap): ``readStream.format("socket")`` →
``decode_peaks_frames`` → ``window_means``.

Reference parity (hyperion.py:284-312, wired at
database_peak_streaming.py:112,116): the reference opens a TCP
connection to the instrument, reads length-prefixed binary frames on an
asyncio loop, parses each, and pushes dicts onto a bounded queue that
the 97 ms collection loop drains.  Here the same topology is declared,
not hand-scheduled:

* the **connect → read loop** is Spark's socket source (one long-lived
  connection owned by the driver; micro-batches are formed by the
  engine — the bounded-queue backpressure S5 becomes trigger pacing);
* **framing** (S2's recv-carry-over) is newline delimitation: each
  frame travels as one base64 line, so partial-read reassembly lives in
  the source, exactly why SURVEY §2A marks S2 "n/a by design";
* **parse** (S4) is the same Arrow-batched ``decode_peaks_frames``
  kernel the file/replay paths use — the decode is distributed to
  executors, not run on the driver's event loop;
* downstream (window means → tiered epoch sink) is byte-identical to
  the replay pipeline, which is what the e2e test asserts.

Scale note: a socket source is single-connection by construction (one
instrument = one TCP stream, as in the reference); throughput scales in
the decode/aggregate stages, which repartition across executors.  Many
instruments = many sources unioned, each its own connection.

The base64-per-line transport is the demo/test encoding; a production
deployment would swap the source for a Kafka topic carrying the same
binary frames and keep every line below unchanged
(``F.unbase64`` → the Kafka ``value`` column).
"""

from __future__ import annotations

import base64
import socket
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_peak_streaming_spark.sources.binary import decode_peaks_frames


def peaks_socket_stream(
    spark: SparkSession, host: str, port: int, num_channels: int = 8
) -> DataFrame:
    """Long-form decoded peaks stream from a live TCP endpoint emitting
    one base64-encoded binary frame per line."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    frames = lines.select(F.unbase64(F.col("value")).alias("frame"))
    return decode_peaks_frames(frames, num_channels=num_channels)


class FrameServer:
    """Minimal single-connection TCP server for tests/demos: accepts one
    client (the Spark socket source) and writes each binary frame as a
    base64 line.  Keeps the connection open until ``close()`` — the
    socket source treats a peer close as end-of-stream/error, so the
    server outlives the streaming query."""

    def __init__(self, frames: list[bytes]):
        self._frames = frames
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(1)
        self._conn: socket.socket | None = None
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self.sent = threading.Event()

    @property
    def port(self) -> int:
        return self._srv.getsockname()[1]

    def start(self) -> "FrameServer":
        self._thread.start()
        return self

    def _serve(self) -> None:
        conn, _ = self._srv.accept()
        self._conn = conn
        payload = b"".join(
            base64.b64encode(f) + b"\n" for f in self._frames
        )
        conn.sendall(payload)
        self.sent.set()

    def close(self) -> None:
        for s in (self._conn, self._srv):
            if s is not None:
                try:
                    s.close()
                except OSError:  # pragma: no cover - teardown best effort
                    pass
