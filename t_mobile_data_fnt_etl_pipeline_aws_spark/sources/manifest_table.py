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
  explicitly destructive operation);
* **optimistic concurrency** — the commit point is create-exclusive
  (``os.link``), so two writers racing the same version number cannot
  both win: the loser gets ``CommitConflictError`` and retries against
  the advanced snapshot (automatic for appends, which commute; an
  ``expected_base`` pin or a losing REPLACE surfaces the conflict);
* **additive schema evolution** — every manifest records the committed
  table schema; ``read_version`` pins it on the scan, so files written
  before a column existed null-fill it (reader-schema resolution, the
  Avro analogue) without an O(#files) mergeSchema footer sweep.

Readers pass the selected file list straight to ``spark.read.parquet``,
so Catalyst still applies row-group pushdown INSIDE surviving files —
manifest pruning composes with, not replaces, PushedFilters.

Reference repo publishes no code (/root/reference/README.md:1-2); the
surface follows public Iceberg/Delta-log semantics.
"""

from __future__ import annotations

import datetime
import decimal
import glob
import json
import math
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflictError(RuntimeError):
    """Raised when a commit loses the race for its version number: the
    manifest file already exists, meaning another writer (or a replayed
    micro-batch) published that version first. The loser must re-read
    ``current_version`` and retry (optimistic concurrency) or drop the
    duplicate (idempotent replay)."""


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_log")


def _data_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "data")


def _json_stat(v):
    """Encode one footer min/max as a native JSON value whose comparison
    semantics prune_files can honor TYPED (int/float stay numbers —
    lexicographic "9" > "11" was a silent-row-drop bug for numerics):

    * int/float/str pass through (ISO date/timestamp strings order
      correctly as strings);
    * date/datetime -> isoformat string with a SPACE separator
      (string-order-safe, and byte-compatible with the
      "YYYY-MM-DD HH:MM:SS" bounds callers pass — a 'T' separator
      would wrongly skip on same-day boundaries, since
      'T' > ' ' > any digit at the separator position);
    * bytes -> utf-8 decode, or None (no stats) if not decodable;
    * Decimal -> [nextafter-down, nextafter-up] float widening, applied
      by the caller per bound side — float() alone can round a true min
      UP across a predicate bound and wrongly skip a file;
    * anything else -> None (conservative: file cannot be skipped).
    Returns (value, kind) where kind is "lo"/"hi"-agnostic except for
    Decimal, which returns the raw Decimal for the caller to widen.
    """
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, decimal.Decimal):
        return v  # caller widens per side
    return None


def _widen(v, side: str):
    """Decimal -> conservatively widened float (min rounds down, max
    rounds up) so float precision loss can never cause a wrong skip."""
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return math.nextafter(f, -math.inf if side == "lo" else math.inf)
    return v


def _file_stats(path: str, stat_cols: list[str]) -> dict:
    """Per-file min/max for stat_cols from the parquet footer, stored as
    native JSON types (numbers stay numbers; dates/timestamps as ISO
    strings) so prune_files compares typed values, never str() forms."""
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
    stats = {}
    for k, (lo, hi) in out.items():
        jlo = _json_stat(lo)
        jhi = _json_stat(hi)
        if jlo is None or jhi is None:
            continue  # unencodable -> omit stats -> file never skipped
        stats[k] = [_widen(jlo, "lo"), _widen(jhi, "hi")]
    return stats


def current_version(table_dir: str) -> int:
    logs = sorted(glob.glob(os.path.join(_log_dir(table_dir), "v*.json")))
    return int(os.path.basename(logs[-1])[1:-5]) if logs else 0


def read_manifest(table_dir: str, version: int) -> dict:
    path = os.path.join(_log_dir(table_dir), f"v{version:05d}.json")
    with open(path) as fh:
        return json.load(fh)


#: Bloom sizing: ~9.6 bits/row + 7 probes ≈ 1% false-positive rate (the
#: standard m/n=9.6, k=7 point on the bloom curve).
_BLOOM_BITS_PER_ROW = 10
_BLOOM_K = 7


def _splitmix64(v):
    """Vectorized splitmix64 finalizer (public-domain mixing constants,
    Steele et al. 2014) — numpy uint64 arithmetic wraps mod 2^64, which
    is exactly the algorithm's arithmetic."""
    import numpy as np

    v = v.astype(np.uint64, copy=True)
    v += np.uint64(0x9E3779B97F4A7C15)
    v ^= v >> np.uint64(30)
    v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(27)
    v *= np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(31)
    return v


def _bloom_positions(vals, m_bits: int):
    """k bit positions per value via double hashing g_i = h1 + i*h2
    (Kirsch & Mitzenmacher 2006: two independent hashes give k
    asymptotically independent probes)."""
    import numpy as np

    h1 = _splitmix64(vals)
    h2 = _splitmix64(vals ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    m = np.uint64(m_bits)
    return [
        ((h1 + np.uint64(i) * h2) % m).astype(np.int64)
        for i in range(_BLOOM_K)
    ]


def _file_bloom(path: str, col: str) -> dict | None:
    """Per-file bloom filter over an integer column, built from the
    staged parquet with one vectorized numpy pass and stored base64 in
    the manifest. Returns None (no filter -> file never skipped) for
    non-integer columns."""
    import base64

    import numpy as np
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=[col])
    arr = tbl.column(0).combine_chunks()
    try:
        vals = arr.to_numpy(zero_copy_only=False)
    except Exception:
        return None
    if vals.dtype.kind not in "iu":
        return None
    vals = vals.astype(np.uint64)
    m_bits = max(64, int(len(vals)) * _BLOOM_BITS_PER_ROW)
    bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    for pos in _bloom_positions(vals, m_bits):
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return {
        "m": m_bits,
        "k": _BLOOM_K,
        "bits": base64.b64encode(bits.tobytes()).decode("ascii"),
    }


def _bloom_maybe_contains(bloom: dict, value: int) -> bool:
    import base64

    import numpy as np

    bits = np.frombuffer(base64.b64decode(bloom["bits"]), dtype=np.uint8)
    # Mask to 64 bits BEFORE the uint64 construction: the build path
    # wraps signed ints two's-complement via astype(uint64), but
    # np.array([negative], dtype=np.uint64) raises OverflowError on
    # NumPy >= 2 — probe and build must hash identically (ADVICE r12).
    vals = np.array([value & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    for pos in _bloom_positions(vals, int(bloom["m"])):
        p = int(pos[0])
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True


def _stage_files(
    df: DataFrame,
    table_dir: str,
    stat_cols: list[str],
    bloom_cols: list[str] | None = None,
) -> list[dict]:
    """Land df as immutable uuid-named data files (invisible to every
    manifest until a commit references them); returns their manifest
    entries with footer-harvested stats, the footer row count (powers
    metadata-only COUNT/MIN/MAX), and optional per-file bloom filters
    for point-lookup skipping."""
    import pyarrow.parquet as pq

    os.makedirs(_data_dir(table_dir), exist_ok=True)
    staging = os.path.join(table_dir, f"_staging_{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)
    entries = []
    for f in sorted(glob.glob(os.path.join(staging, "*.parquet"))):
        # Spark emits zero-row part files for empty partitions; a real
        # format never registers them (they carry no stats and would
        # defeat every files_with_stats == n_files exactness check).
        if pq.ParquetFile(f).metadata.num_rows == 0:
            continue
        dest = os.path.join(_data_dir(table_dir), f"{uuid.uuid4().hex}.parquet")
        os.rename(f, dest)
        entry = {
            "path": dest,
            "rows": pq.ParquetFile(dest).metadata.num_rows,
            "stats": _file_stats(dest, stat_cols),
        }
        blooms = {
            c: b
            for c in (bloom_cols or [])
            if (b := _file_bloom(dest, c)) is not None
        }
        if blooms:
            entry["bloom"] = blooms
        entries.append(entry)
    shutil.rmtree(staging, ignore_errors=True)  # _SUCCESS/.crc leftovers
    return entries


def _publish(
    table_dir: str,
    version: int,
    op: str,
    files: list[dict],
    schema: list[list[str]] | None = None,
) -> int:
    """Atomic CREATE-EXCLUSIVE commit point: write the manifest to a tmp
    name, then ``os.link`` it to its final version name. link(2) fails
    with EEXIST if the version was already published — a plain rename
    would silently REPLACE it, letting two racing writers both "win" the
    same version and orphan one side's data files. Losers get
    CommitConflictError and must retry against the advanced version."""
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    manifest = {"version": version, "op": op, "files": files}
    if schema is not None:
        manifest["schema"] = schema
    tmp = os.path.join(
        _log_dir(table_dir), f".v{version:05d}.{uuid.uuid4().hex[:8]}.tmp"
    )
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    final = os.path.join(_log_dir(table_dir), f"v{version:05d}.json")
    try:
        os.link(tmp, final)
    except FileExistsError as exc:
        raise CommitConflictError(
            f"version {version} already committed in {table_dir}"
        ) from exc
    finally:
        os.unlink(tmp)
    return version


def _schema_entry(df: DataFrame) -> list[list[str]]:
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def _merged_schema(
    prev_schema: list[list[str]] | None, df: DataFrame
) -> list[list[str]]:
    """Additive schema evolution (the only kind this format supports,
    like raw parquet + mergeSchema): the committed schema is the prior
    table schema plus any NEW columns df introduces, in prior-first
    order. A column present in both must keep its type — type changes
    and renames are rejected (rename is indistinguishable from
    drop+add on a columnar file format without field IDs)."""
    new = _schema_entry(df)
    if not prev_schema:
        return new
    prev_types = {n: t for n, t in prev_schema}
    for n, t in new:
        if n in prev_types and prev_types[n] != t:
            raise ValueError(
                f"schema evolution: column {n!r} type change "
                f"{prev_types[n]} -> {t} is not supported (add-only)"
            )
    return [list(e) for e in prev_schema] + [
        [n, t] for n, t in new if n not in prev_types
    ]


def table_schema(table_dir: str, version: int | None = None) -> list[list[str]]:
    v = current_version(table_dir) if version is None else version
    return read_manifest(table_dir, v).get("schema") or []


def commit_append(
    df: DataFrame,
    table_dir: str,
    stat_cols: list[str],
    op: str = "append",
    expected_base: int | None = None,
    retry_conflicts: bool = True,
    bloom_cols: list[str] | None = None,
) -> int:
    """Append commit: new manifest = previous live set + df's files.

    Optimistic concurrency: ``expected_base`` pins the version the
    writer planned against — if another writer advanced the table
    first, CommitConflictError (no blind clobber). Without a pin,
    version-number races are retried by default (appends commute: the
    staged files are re-merged onto the advanced live set — the Delta
    "win the next version" protocol for non-conflicting commits).

    Staging discipline (ADVICE r12): the base pin and the schema merge
    are validated BEFORE any parquet lands in data/, and a raise out of
    the commit deletes whatever was staged — a rejected commit must not
    orphan unreferenced data files (an external retry would otherwise
    stage a second copy and only a vacuum would reclaim the first)."""
    prev0 = current_version(table_dir)
    if expected_base is not None and prev0 != expected_base:
        raise CommitConflictError(
            f"expected base version {expected_base}, table is at {prev0}"
        )
    prev_manifest0 = read_manifest(table_dir, prev0) if prev0 else {}
    _merged_schema(prev_manifest0.get("schema"), df)  # reject before staging
    new = _stage_files(df, table_dir, stat_cols, bloom_cols)
    try:
        while True:
            prev = current_version(table_dir)
            if expected_base is not None and prev != expected_base:
                raise CommitConflictError(
                    f"expected base version {expected_base}, table is at {prev}"
                )
            prev_manifest = read_manifest(table_dir, prev) if prev else {}
            files = list(prev_manifest.get("files", []))
            schema = _merged_schema(prev_manifest.get("schema"), df)
            try:
                return _publish(table_dir, prev + 1, op, files + new, schema)
            except CommitConflictError:
                if expected_base is not None or not retry_conflicts:
                    raise
    except BaseException:
        for f in new:  # staged but never referenced by any manifest
            try:
                os.unlink(f["path"])
            except OSError:
                pass
        raise


def commit_replace(
    df: DataFrame, table_dir: str, stat_cols: list[str], op: str = "compact"
) -> int:
    """REPLACE commit (the OPTIMIZE/compaction shape): the new manifest
    lists ONLY df's freshly landed files — the previous live set is
    superseded, NOT deleted, so every older version stays readable
    (time travel across compaction). No intermediate manifest is ever
    visible: files stage first, one create-exclusive link publishes the
    new set. A version race is NOT retried: a replace that lost to a
    concurrent append would silently drop the appended rows, so the
    loser must re-plan from the new snapshot (real formats abort
    OPTIMIZE the same way)."""
    new = _stage_files(df, table_dir, stat_cols)
    prev = current_version(table_dir)
    prev_manifest = read_manifest(table_dir, prev) if prev else {}
    schema = _merged_schema(prev_manifest.get("schema"), df)
    return _publish(table_dir, prev + 1, op, new, schema)


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: plan from the (as-of) manifest's file list.

    The read uses the manifest's COMMITTED schema (reader-schema
    resolution, the Avro analogue): files written before a column was
    added lack it in their footers, and pinning the manifest schema on
    the scan makes Spark null-fill the missing column instead of
    failing or silently dropping it — additive schema evolution without
    a mergeSchema footer sweep (O(1) metadata instead of O(#files) at
    planning time)."""
    v = current_version(table_dir) if version is None else version
    manifest = read_manifest(table_dir, v)
    files = [f["path"] for f in manifest["files"]]
    schema = manifest.get("schema")
    reader = spark.read
    if schema:
        reader = reader.schema(", ".join(f"`{n}` {t}" for n, t in schema))
    return reader.parquet(*files)


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
    table_dir: str, version: int, col: str, lo, hi
) -> tuple[list[str], int]:
    """Stats-based file skipping: files whose [min, max] for ``col``
    intersects [lo, hi], compared TYPED — the manifest stores native
    JSON values (numbers as numbers, dates/timestamps as ISO strings),
    so a numeric predicate [10, 11] correctly keeps a file with range
    [9, 12] instead of the lexicographic "9" > "11" wrong-skip. Bounds
    whose type doesn't match the stored stat type keep the file
    (conservative: never skip on an incomparable predicate).
    Returns (surviving file paths, total file count at that version)."""
    manifest = read_manifest(table_dir, version)
    keep = []
    for f in manifest["files"]:
        st = f["stats"].get(col)
        if st is None or not _can_skip(st[0], st[1], lo, hi):
            keep.append(f["path"])
    return keep, len(manifest["files"])


#: ISO day-only form ('2020-01-05') vs any ISO temporal form (day-only,
#: or with a space/'T'-separated time part).
_ISO_DAY = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_ISO_TEMPORAL = re.compile(r"^\d{4}-\d{2}-\d{2}([ T].*)?$")


def _pad_temporal(s: str, side: str) -> str:
    """Widen a day-only ISO string to the full-day interval bound for
    ``side``: a DATE stat/predicate '2020-01-05' stands for the whole
    day, so as a LOWER bound it reads 00:00:00 and as an UPPER bound
    23:59:59.999999 — otherwise a timestamp-style predicate bound
    ('2020-01-05 00:00:00') compares lexicographically ABOVE the bare
    day string and a file whose max date equals the predicate's lower
    bound is wrongly skipped (ADVICE r12: same silent-row-loss class as
    the 'T'-separator bug)."""
    if _ISO_DAY.match(s):
        return s + (" 00:00:00" if side == "lo" else " 23:59:59.999999")
    return s


def _can_skip(fmin, fmax, lo, hi) -> bool:
    """True only when the file range [fmin, fmax] PROVABLY misses the
    predicate range [lo, hi] under type-consistent comparison.

    Strings get one extra normalization layer for temporal shapes:
    manifest DATE stats are day-only ISO strings while callers may pass
    timestamp-style bounds (and vice versa), and the two shapes do NOT
    order correctly against each other lexicographically. If every
    operand looks ISO-temporal, day-only operands are padded to their
    full-day interval bound and 'T' separators normalized to the
    manifest's space form; a mix of temporal and free-text strings is
    incomparable — keep the file."""
    numeric = (int, float)
    if isinstance(fmin, numeric) and isinstance(fmax, numeric):
        if not (isinstance(lo, numeric) and isinstance(hi, numeric)):
            return False
        return float(fmax) < float(lo) or float(fmin) > float(hi)
    if isinstance(fmin, str) and isinstance(fmax, str):
        if not (isinstance(lo, str) and isinstance(hi, str)):
            return False
        temporal = [bool(_ISO_TEMPORAL.match(s)) for s in (fmin, fmax, lo, hi)]
        if any(temporal):
            if not all(temporal):
                return False  # temporal vs free-text: incomparable
            fmin, fmax, lo, hi = (
                s.replace("T", " ", 1) for s in (fmin, fmax, lo, hi)
            )
            fmin, lo = _pad_temporal(fmin, "lo"), _pad_temporal(lo, "lo")
            fmax, hi = _pad_temporal(fmax, "hi"), _pad_temporal(hi, "hi")
        return fmax < lo or fmin > hi
    return False


def prune_files_multi(
    table_dir: str, version: int, preds: dict
) -> tuple[list[str], int]:
    """CONJUNCTIVE multi-column stats pruning: ``preds`` maps column ->
    (lo, hi); a file is skipped when ANY predicate's range provably
    misses that file's [min, max] (AND semantics — all predicates must
    be satisfiable for a row to survive, so one disjoint dimension is
    enough to skip). Typed comparison, keep-on-incomparable, same as
    prune_files. This is what makes a Z-ORDERED layout pay off: the
    interleave keeps every clustered dimension's per-file range narrow,
    so a multi-dimensional predicate box skips on whichever dimension
    misses."""
    manifest = read_manifest(table_dir, version)
    keep = []
    for f in manifest["files"]:
        skip = False
        for col, (lo, hi) in preds.items():
            st = f["stats"].get(col)
            if st is not None and _can_skip(st[0], st[1], lo, hi):
                skip = True
                break
        if not skip:
            keep.append(f["path"])
    return keep, len(manifest["files"])


def prune_files_bloom(
    table_dir: str, version: int, col: str, value: int
) -> tuple[list[str], int]:
    """POINT-LOOKUP file skipping via per-file bloom filters: keep only
    files whose bloom for ``col`` maybe-contains ``value`` (files
    without a bloom are always kept — the filter is an optimization,
    never a correctness dependency; false positives read a file for
    nothing, false negatives cannot happen)."""
    manifest = read_manifest(table_dir, version)
    keep = []
    for f in manifest["files"]:
        bloom = (f.get("bloom") or {}).get(col)
        if bloom is None or _bloom_maybe_contains(bloom, value):
            keep.append(f["path"])
    return keep, len(manifest["files"])


def table_stats(
    table_dir: str, version: int | None = None, col: str | None = None
) -> dict:
    """METADATA-ONLY aggregates: exact row count (sum of footer counts
    recorded at commit time) and, for ``col``, the table-wide min/max
    (fold of per-file stats) — answered from the manifest alone, zero
    data files opened. The COUNT is always exact (immutable files,
    exact footer counts) PROVIDED every live entry carries a 'rows'
    field — files_with_rows == n_files tells the caller; a manifest
    written by an older layout (or a hand-edited entry) without 'rows'
    would otherwise silently undercount (ADVICE r12). MIN/MAX are exact
    whenever every live file carries stats for the column
    (files_with_stats == n_files tells the caller; decimals are stored
    conservatively widened, so a decimal column reports bounds, not
    exact extrema — callers needing exactness check the kind flag)."""
    v = current_version(table_dir) if version is None else version
    manifest = read_manifest(table_dir, v)
    out = {
        "n_rows": sum(f.get("rows", 0) for f in manifest["files"]),
        "n_files": len(manifest["files"]),
        "files_with_rows": sum(1 for f in manifest["files"] if "rows" in f),
    }
    if col is not None:
        lo = hi = None
        n_with = 0
        for f in manifest["files"]:
            st = f["stats"].get(col)
            if st is None:
                continue
            n_with += 1
            lo = st[0] if lo is None else min(lo, st[0])
            hi = st[1] if hi is None else max(hi, st[1])
        out["min"] = lo
        out["max"] = hi
        out["files_with_stats"] = n_with
    return out


def commit_rewrite(
    df_new: DataFrame,
    table_dir: str,
    stat_cols: list[str],
    replaced_paths: list[str],
    op: str = "merge",
) -> int:
    """COPY-ON-WRITE rewrite commit (the Delta/Iceberg MERGE shape):
    the new manifest = (previous live set minus ``replaced_paths``) +
    df_new's freshly staged files. Untouched files carry over by
    REFERENCE — zero data movement for them; only the files a merge
    actually hits are rewritten (callers find those via
    prune_files/prune_files_multi on the merge-key range, so the
    rewrite cost is proportional to the DATA TOUCHED, not the table).
    Superseded files stay on disk for time travel; vacuum reclaims
    them. A version race is not retried (a rewrite that lost to a
    concurrent commit must re-plan from the new snapshot — same rule
    as commit_replace)."""
    replaced = set(replaced_paths)
    new = _stage_files(df_new, table_dir, stat_cols)
    prev = current_version(table_dir)
    prev_manifest = read_manifest(table_dir, prev) if prev else {}
    unknown = replaced - {f["path"] for f in prev_manifest.get("files", [])}
    if unknown:
        raise ValueError(f"replaced paths not in live set: {sorted(unknown)}")
    keep = [
        f for f in prev_manifest.get("files", []) if f["path"] not in replaced
    ]
    schema = _merged_schema(prev_manifest.get("schema"), df_new)
    return _publish(table_dir, prev + 1, op, keep + new, schema)
