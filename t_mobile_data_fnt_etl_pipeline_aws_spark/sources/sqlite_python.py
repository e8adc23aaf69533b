"""Partition-bounded SQL-database ingest via the Python Data Source API.

The JDBC ``partitionColumn / lowerBound / upperBound / numPartitions``
pattern, implemented against stdlib ``sqlite3`` (this container ships no
JDBC driver jars — SURVEY §2.1): ``partitions()`` splits the key range
into exactly N disjoint ``WHERE col >= lo AND col < hi`` slices, each
executor task opens its OWN connection and pulls ONLY its slice, and
the range predicate executes INSIDE the database — source-side
filtering, the DB analogue of parquet pushdown. A single-partition
database read would serialize a multi-TB table through one task no
matter how big the cluster, which is exactly why Spark's JDBC source
demands explicit bounds.

Generalized over (table, schema, partition column) so one source class
serves both the plain partitioned scan (q_scan_sqlite_partitioned) and
FEDERATED plans that join a database dimension against parquet facts
(q_join_federated_sources) — heterogeneous sources composing in one
Catalyst plan is the federation pattern every warehouse edge runs.

Reference repo has no code (/root/reference/README.md:1-2); the
surface follows SURVEY §2.1's ingest contract.
"""

from __future__ import annotations

import re
import sqlite3

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    """Reject anything but a plain SQL identifier — table/column names are
    interpolated into SQL text (sqlite placeholders can't bind
    identifiers), so caller-supplied option strings must not be able to
    smuggle SQL (``t; DROP TABLE``)."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


def _check_ident_list(csv: str) -> str:
    for part in csv.split(","):
        _check_ident(part.strip())
    return csv


def load_table_to_sqlite(
    db_path: str, table: str, create_sql: str, rows, index_col: str
) -> tuple[int, int]:
    """Fixture helper: load rows into a fresh sqlite table + key index;
    returns (min, max) of the index column."""
    _check_ident(table)
    _check_ident(index_col)
    rows = list(rows)
    con = sqlite3.connect(db_path)
    try:
        con.execute(create_sql)
        if rows:
            placeholders = ",".join("?" * len(rows[0]))
            con.executemany(
                f"INSERT INTO {table} VALUES ({placeholders})", rows
            )
        con.execute(
            f"CREATE INDEX idx_{table}_{index_col} ON {table}({index_col})"
        )
        con.commit()
        lo, hi = con.execute(
            f"SELECT min({index_col}), max({index_col}) FROM {table}"
        ).fetchone()
        return lo, hi
    finally:
        con.close()


def make_sqlite_source():
    """Build the DataSource class lazily (keeps pyspark imports out of
    executor-side module import)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RangePartition(InputPartition):
        def __init__(self, db, lo, hi):
            self.db, self.lo, self.hi = db, lo, hi

    class SqliteRangeReader(DataSourceReader):
        def __init__(self, options):
            self.db = options["path"]
            self.table = _check_ident(options["table"])
            # comma-separated, schema order
            self.cols = _check_ident_list(options["columns"])
            self.key = _check_ident(options["partitioncolumn"])
            self.lo = int(options["lowerbound"])
            self.hi = int(options["upperbound"])
            self.n = int(options.get("numpartitions", "8"))

        def partitions(self):
            # exactly n even slices regardless of span % n (a naive
            # fixed-step range() mints an n+1th sliver partition)
            span = self.hi + 1 - self.lo
            n = min(self.n, max(1, span))
            bounds = [self.lo + (span * i) // n for i in range(n)]
            bounds.append(self.hi + 1)
            return [
                _RangePartition(self.db, a, b)
                for a, b in zip(bounds, bounds[1:])
            ]

        def read(self, part):
            # each task opens its own connection and pulls ONLY its
            # key slice — the predicate executes inside the database
            import sqlite3 as _sq

            c = _sq.connect(part.db)
            try:
                yield from c.execute(
                    f"SELECT {self.cols} FROM {self.table} "
                    f"WHERE {self.key} >= ? AND {self.key} < ?",
                    (part.lo, part.hi),
                )
            finally:
                c.close()

    class SqliteRangeSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "sqlite_range"

        def schema(self) -> str:
            return self.options["ddl"]

        def reader(self, schema) -> SqliteRangeReader:
            return SqliteRangeReader(self.options)

    return SqliteRangeSource
