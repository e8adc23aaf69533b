"""Miniature log-structured table format: versioned snapshot manifests
over immutable parquet files — the Iceberg/Delta metadata pattern
(snapshot isolation, time travel, stats-based file skipping, compaction)
built from first principles on plain parquet + JSON, no table-format
jars (none ship in this container — SURVEY §2.1 documents the exclusion
class).

Layout of a table directory::

    <table>/data/<uuid>.parquet      immutable data files, never rewritten
    <table>/_log/v00001.json         one manifest per committed version

Each manifest is a FULL snapshot (the Iceberg style): the complete list
of live data files at that version, each with per-file column stats
(min/max harvested from the parquet FOOTER at commit time — the same
metadata plane q_sink_rowgroup_stats_audit audits). That buys four
capabilities a raw parquet directory cannot offer:

* **time travel** — ``read_version(v)`` plans from v's manifest, so an
  as-of read is reproducible forever regardless of later appends;
* **snapshot isolation** — readers never see a half-written commit: data
  files land first under uuid names, the manifest rename is the atomic
  commit point;
* **file skipping** — ``prune_files`` intersects a predicate range with
  each file's [min, max] WITHOUT opening data files: metadata-plane
  planning, O(#files) on kilobyte manifests. At 100 TB this is the
  difference between listing+reading everything and reading only the
  few files a time-range predicate touches (manifests themselves would
  be a distributed scan at production file counts);
* **compaction** — ``commit_replace`` publishes a new live set (the
  OPTIMIZE shape) while every older version stays readable, because
  superseded files are never deleted (vacuum would be a separate,
  explicitly destructive operation).

Readers pass the selected file list straight to ``spark.read.parquet``,
so Catalyst still applies row-group pushdown INSIDE surviving files —
manifest pruning composes with, not replaces, PushedFilters.

Reference repo publishes no code (/root/reference/README.md:1-2); the
surface follows public Iceberg/Delta-log semantics.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _file_stats(path: str, stat_cols: list[str]) -> dict:
    """Per-file min/max for stat_cols from the parquet footer (strings
    via str() so JSON can carry timestamps/dates losslessly enough for
    range pruning — pruning compares the same str form)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {}
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        for i in range(rgm.num_columns):
            col = rgm.column(i)
            name = col.path_in_schema
            if name not in stat_cols:
                continue
            s = col.statistics
            if s is None or not s.has_min_max:
                continue
            lo, hi = s.min, s.max
            ent = out.setdefault(name, [lo, hi])
            ent[0] = min(ent[0], lo)
            ent[1] = max(ent[1], hi)
    return {k: [str(v[0]), str(v[1])] for k, v in out.items()}


def current_version(table_dir: str) -> int:
    logs = sorted(glob.glob(os.path.join(_log_dir(table_dir), "v*.json")))
    return int(os.path.basename(logs[-1])[1:-5]) if logs else 0


def read_manifest(table_dir: str, version: int) -> dict:
    path = os.path.join(_log_dir(table_dir), f"v{version:05d}.json")
    with open(path) as fh:
        return json.load(fh)


def _stage_files(
    df: DataFrame, table_dir: str, stat_cols: list[str]
) -> list[dict]:
    """Land df as immutable uuid-named data files (invisible to every
    manifest until a commit references them); returns their manifest
    entries with footer-harvested stats."""
    os.makedirs(_data_dir(table_dir), exist_ok=True)
    staging = os.path.join(table_dir, f"_staging_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)
    entries = []
    for f in sorted(glob.glob(os.path.join(staging, "*.parquet"))):
        dest = os.path.join(_data_dir(table_dir), f"{uuid.uuid4().hex}.parquet")
        os.rename(f, dest)
        entries.append({"path": dest, "stats": _file_stats(dest, stat_cols)})
    return entries


def _publish(table_dir: str, version: int, op: str, files: list[dict]) -> int:
    """Atomic commit point: write-then-rename the manifest."""
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    manifest = {"version": version, "op": op, "files": files}
    tmp = os.path.join(_log_dir(table_dir), f".v{version:05d}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(_log_dir(table_dir), f"v{version:05d}.json"))
    return version


def commit_append(
    df: DataFrame, table_dir: str, stat_cols: list[str], op: str = "append"
) -> int:
    """Append commit: new manifest = previous live set + df's files."""
    new = _stage_files(df, table_dir, stat_cols)
    prev = current_version(table_dir)
    files = list(read_manifest(table_dir, prev)["files"]) if prev else []
    return _publish(table_dir, prev + 1, op, files + new)


def commit_replace(
    df: DataFrame, table_dir: str, stat_cols: list[str], op: str = "compact"
) -> int:
    """REPLACE commit (the OPTIMIZE/compaction shape): the new manifest
    lists ONLY df's freshly landed files — the previous live set is
    superseded, NOT deleted, so every older version stays readable
    (time travel across compaction). No intermediate manifest is ever
    visible: files stage first, one rename publishes the new set."""
    new = _stage_files(df, table_dir, stat_cols)
    return _publish(table_dir, current_version(table_dir) + 1, op, new)


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: plan from the (as-of) manifest's file list."""
    v = current_version(table_dir) if version is None else version
    files = [f["path"] for f in read_manifest(table_dir, v)["files"]]
    return spark.read.parquet(*files)


def diff_files(table_dir: str, v_from: int, v_to: int) -> list[str]:
    """Incremental-consumption diff: data files live at v_to that were
    not live at v_from (v_from=0 == everything). For append-only
    history the file-set diff IS the row-level delta, because files are
    immutable and never rewritten in place; across a REPLACE commit the
    diff returns the rewritten files (consumers downstream of a
    compaction must dedupe by row identity — the documented CDF caveat
    real table formats share)."""
    new = {f["path"] for f in read_manifest(table_dir, v_to)["files"]}
    old = (
        {f["path"] for f in read_manifest(table_dir, v_from)["files"]}
        if v_from
        else set()
    )
    return sorted(new - old)


def vacuum(table_dir: str, retain_last: int = 1) -> tuple[int, int]:
    """Physically delete data files referenced ONLY by manifests older
    than the last ``retain_last`` versions, and drop those expired
    manifests. THE ONE DESTRUCTIVE OPERATION in this format — time
    travel ends at the retention horizon, which is why real formats
    gate it behind a retention window instead of bundling it into
    compaction. Returns (n_deleted, n_kept)."""
    cur = current_version(table_dir)
    if retain_last < 1:
        raise ValueError("retain_last must be >= 1")
    horizon = max(1, cur - retain_last + 1)
    live: set[str] = set()
    for v in range(horizon, cur + 1):
        live |= {f["path"] for f in read_manifest(table_dir, v)["files"]}
    deleted = 0
    for f in glob.glob(os.path.join(_data_dir(table_dir), "*.parquet")):
        if f not in live:
            os.remove(f)
            deleted += 1
    for v in range(1, horizon):
        path = os.path.join(_log_dir(table_dir), f"v{v:05d}.json")
        if os.path.exists(path):
            os.remove(path)
    return deleted, len(live)


def prune_files(
    table_dir: str, version: int, col: str, lo: str, hi: str
) -> tuple[list[str], int]:
    """Stats-based file skipping: files whose [min, max] for ``col``
    intersects [lo, hi] (string compare — the manifest stores str(stat),
    which orders correctly for ISO timestamps and zero-padded numerics).
    Returns (surviving file paths, total file count at that version)."""
    manifest = read_manifest(table_dir, version)
    keep = []
    for f in manifest["files"]:
        st = f["stats"].get(col)
        if st is None:  # no stats -> cannot skip, must read
            keep.append(f["path"])
        elif not (st[1] < lo or st[0] > hi):
            keep.append(f["path"])
    return keep, len(manifest["files"])
