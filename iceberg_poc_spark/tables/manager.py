"""Snapshot-committed partitioned tables over parquet — the engine's table
layer, re-implementing the reference's Iceberg surface Spark-first.

Reference parity map (SURVEY.md §2A):

- atomic multi-file append commit (#20, ``BulkParquetToIcebergAtomicMultipart
  .java:97-101``): every :meth:`ParquetTableManager.append` stages parquet
  files invisibly, then publishes ONE manifest via atomic rename — readers
  see the whole batch or none of it.
- hidden partitioning (#12-#14, ``aig/AIGEventsTableCreator.java:166-172``,
  ``HiddenPartitionLoader.java:205-232``): partition values derive from data
  through transforms (identity / years / months / days / hours / truncate /
  bucket — the Iceberg transform set, ``aig/PartitionSpecTest.java:22-29``);
  the user schema never shows them and per-record routing is automatic
  (``partitionBy`` on write) instead of the reference's hand-grouped writes
  (#15-#16, ``:358-362,385-394``).
- filtered scan with partition pruning (#5, ``aig/TimeBasedPartitioning
  Examples.java:180-195``): :meth:`scan` transforms predicate bounds into
  partition-value space and plans only matching files from the manifest —
  the ``planTasks()`` analogue; row-level residual filtering still happens
  in Spark (and parquet min/max pushdown applies within files).
- snapshot/metadata inspection (#27-#28, ``aig/PartitionValueDebugger
  .java:164-196``): :meth:`snapshots` / :meth:`files` / :meth:`partitions`
  metadata DataFrames; time travel via ``read(snapshot_id=...)``.
- table property tuning (#24, ``aig/AIGEventsTableCreator.java:184-191``):
  zstd + 128 MB target file size stored as properties and honored by
  :meth:`compact` (the ``rewrite_data_files`` analogue).
- schema evolution (§1.4): :meth:`add_column`; old files read as NULL for
  new columns, exactly like Iceberg.
- named refs (beyond the reference, ≙ Iceberg branches/tags): commits CAS a
  per-branch head pointer over globally-numbered snapshots;
  :meth:`create_branch` + ``append(ref=...)`` + :meth:`fast_forward` is the
  write-audit-publish flow, :meth:`cherry_pick` the selective publish,
  :meth:`create_tag` an immutable pin that :meth:`expire_snapshots`
  honors.

Scale notes: the commit protocol is O(1) driver-side (one JSON rename);
data moves only through executor-parallel ``df.write``. Manifests list
file-level partition values + row counts, so pruning is metadata-only.
At real 100 TB deployment this layer swaps for the Iceberg Spark catalog
(same API shape; see ``iceberg_conf``) — the rest of the engine is
agnostic because queries only see DataFrames.
"""

from __future__ import annotations

import base64
import json
import os
import uuid
import weakref
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _nested_nullable(dt: DataType) -> DataType:
    """Strip NOT NULL flags from nested struct/array/map members. Parquet
    round-trips nested data as nullable, so casting read data back to a
    declared schema with non-nullable nested fields is both impossible
    (Spark refuses the cast) and meaningless; top-level required-ness stays
    on the StructField and is unaffected."""
    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _nested_nullable(f.dataType), True, f.metadata)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_nested_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_nested_nullable(dt.keyType), _nested_nullable(dt.valueType), True)
    return dt

def _norm_stat(v: Any) -> Any:
    """Normalize a stats/literal value for manifest storage & comparison:
    temporals → ISO strings (lexicographic order == chronological order),
    bytes → utf-8 text."""
    import datetime as dt

    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    return v


def _stats_may_match(entry: dict, col: str, op: str, lit_v: Any) -> bool:
    """File-skip test against the manifest's per-file column min/max and
    null counts (the Iceberg column-stats / ``null_value_counts`` pruning
    analogue). Conservative on any type mismatch or missing stats."""
    nc = (entry.get("nulls") or {}).get(col)
    if op == "isnull":
        # a file with ZERO nulls in the column cannot satisfy IS NULL —
        # the prune that makes "find un-enriched rows" skip every
        # fully-enriched file at the manifest
        return nc is None or nc > 0
    if op == "notnull":
        return nc is None or nc < entry.get("records", float("inf"))
    if nc is not None and nc == entry.get("records"):
        # every value is NULL: no comparison/membership predicate matches
        return False
    s = (entry.get("stats") or {}).get(col)
    if not s:
        return True
    mn, mx = s
    if op == "in":
        # file may match if ANY member can fall in [mn, mx]
        for v in lit_v:
            b = _norm_stat(v)
            if isinstance(b, bool) or not isinstance(b, (int, float, str)):
                return True
            if isinstance(b, str) != isinstance(mn, str):
                return True
            try:
                if mn <= b <= mx:
                    return True
            except TypeError:
                return True
        return False
    b = _norm_stat(lit_v)
    if isinstance(b, bool) or not isinstance(b, (int, float, str)):
        return True
    if isinstance(b, str) != isinstance(mn, str):
        return True
    try:
        return {
            "==": mn <= b <= mx,
            ">=": mx >= b,
            ">": mx > b,
            "<=": mn <= b,
            "<": mn < b,
        }.get(op, True)
    except TypeError:
        return True


def _seg_may_match(
    spec: list["Transform"], stats: dict | None, where: list
) -> bool:
    """Can ANY file in this segment match? Conservative segment-level
    pre-prune over the segment's [min, max] partition-value summary —
    IDENTITY transforms only (derived transforms' value ordering doesn't
    follow the source column's, so per-file _may_match keeps those).
    Unknown stats, unknown ops, or incomparable types keep the segment;
    every surviving entry is still checked per-file."""
    if not stats:
        return True
    parts = stats.get("p")
    if not parts:
        return True
    ident = {t.source: t.field_name for t in spec if t.kind == "identity"}
    for col, op, lit in where:
        fname = ident.get(col)
        if fname is None or fname not in parts:
            continue
        mn, mx = parts[fname]
        # the summary coerces numeric-looking partition STRINGS to
        # numbers (lexicographic "13" < "2" would mis-bound); mirror
        # that on the predicate literal, or a string-typed point lookup
        # against a numeric summary would TypeError into the
        # conservative keep-everything path and never prune a segment.
        # EQUALITY/MEMBERSHIP ONLY: string equality implies numeric
        # equality, so == / in stay a superset after coercion. Range
        # ops on a string-typed column compare LEXICOGRAPHICALLY at row
        # level ('1000' <= '9' is true) while the coerced summary would
        # compare numerically (1000 <= 9 is false) — coercing there
        # falsely prunes segments whose rows match (e.g. an equality
        # delete whose key set exceeds the point-key limit and arrives
        # as min/max string bounds would silently no-op). For those the
        # uncoerced str-vs-number compare TypeErrors into the
        # conservative keep path below.
        if isinstance(mn, (int, float)) and op in ("==", "in"):
            def _co(v):
                if isinstance(v, str):
                    for cast in (int, float):
                        try:
                            return cast(v)
                        except (TypeError, ValueError):
                            continue
                return v

            lit = [_co(v) for v in lit] if op == "in" else _co(lit)
        try:
            # boundary partitions are KEPT for > / < exactly like the
            # per-entry rule (_may_match), so the segment filter is
            # always a superset of the per-entry result — planned-file
            # counts are identical with or without segment summaries
            if op == "==" and not (mn <= lit <= mx):
                return False
            if op == "in" and not any(mn <= v <= mx for v in lit):
                return False
            if op in (">", ">=") and not mx >= lit:
                return False
            if op in ("<", "<=") and not mn <= lit:
                return False
        except TypeError:
            continue  # incomparable literal: keep the segment
    return True


def _may_match(spec: list["Transform"], entry: dict, where: list) -> bool:
    """Can this data file contain rows satisfying ALL predicates? Maps each
    predicate bound into partition-value space via the spec's transforms
    (order-preserving ones only) and tests the file's manifest partition
    values; additionally tests per-file column min/max stats (so sorted/
    clustered files are skipped even on non-partition columns).
    Conservative: unknown/unmappable → keep. Boundary partitions are kept
    for > / < (partition granularity); the row-level residual filter
    finishes the job."""
    for col, op, lit_v in where:
        if not _stats_may_match(entry, col, op, lit_v):
            return False
    if not _bloom_may_match(entry, where):
        return False
    for col, op, lit_v in where:
        if op in ("isnull", "notnull"):
            continue  # NULL never maps through a partition transform
        for t in spec:
            if t.source != col or not t.order_preserving:
                continue
            pv = entry["partition"].get(t.field_name)
            if pv is None:
                continue
            if op == "in":
                # membership maps through ANY deterministic transform:
                # x IN (v1..vn) => f(x) IN (f(v1)..f(vn))
                try:
                    bounds = {str(t.literal_to_partition(v)) for v in lit_v}
                except (ValueError, AttributeError):
                    continue
                if str(pv) not in bounds:
                    return False
                continue
            try:
                bound = t.literal_to_partition(lit_v)
            except (ValueError, AttributeError):
                continue
            if isinstance(bound, (int, float)) and not isinstance(pv, (int, float)):
                try:
                    pv = type(bound)(pv)
                except (TypeError, ValueError):
                    continue
            else:
                pv, bound = str(pv), str(bound)
            ok = {
                "==": pv == bound,
                ">=": pv >= bound,
                "<=": pv <= bound,
                ">": pv >= bound,
                "<": pv <= bound,
            }.get(op, True)
            if not ok:
                return False
    return True


def _collect_column_stats(md) -> dict[str, list]:
    """Per-file [min, max] for top-level primitive columns, folded over
    row groups (≙ the column bounds Iceberg writes into manifests — the
    reference gets only record counts, #17/#19). Columns with any missing
    row-group stats are omitted (conservative)."""
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    dropped: set[str] = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            name = c.path_in_schema
            if "." in name or name in dropped:
                continue  # nested leaves: skip (top-level pruning only)
            st = c.statistics
            if st is None or not st.has_min_max:
                dropped.add(name)
                continue
            mn, mx = _norm_stat(st.min), _norm_stat(st.max)
            if not isinstance(mn, (int, float, str)) or isinstance(mn, bool):
                dropped.add(name)
                continue
            if isinstance(mn, float) and (mn != mn or mx != mx):  # NaN
                dropped.add(name)
                continue
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return {
        k: [mins[k], maxs[k]] for k in mins if k not in dropped
    }


def _collect_null_counts(md) -> dict[str, int]:
    """Per-file null counts for top-level columns, folded over row groups
    (≙ Iceberg's manifest ``null_value_counts``): drives IS NULL /
    IS NOT NULL file pruning and lets all-null files skip comparison
    predicates even though they carry no min/max. Columns missing a
    null count in ANY row group are omitted (conservative)."""
    counts: dict[str, int] = {}
    dropped: set[str] = set()
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            name = c.path_in_schema
            if "." in name or name in dropped:
                continue
            st = c.statistics
            if st is None or st.null_count is None:
                dropped.add(name)
                continue
            counts[name] = counts.get(name, 0) + int(st.null_count)
    return {k: v for k, v in counts.items() if k not in dropped}


# ------------------------------------------------------- bloom file index
# Per-file Bloom filters on designated columns (≙ Iceberg's
# ``write.parquet.bloom-filter-enabled.column.X`` / Puffin index blobs):
# point lookups on a NON-partition, NON-clustered column prune files at the
# manifest — the capability that makes "fetch document 123456789" a
# handful-of-files read on a 100 TB table instead of a full scan. Enabled
# via table properties (see ``ParquetTableManager`` BLOOM_* constants);
# every write path computes the filter per data file and stores it
# self-described in the manifest entry: {"m": bits, "k": hashes, "b": b64}.

# ------------------------------------------------------ check constraints
# Write-time data-quality gate (≙ Delta Lake CHECK constraints / the
# Iceberg "validation before commit" pattern): table properties
# ``constraints.check.<name> = <boolean SQL expr>`` are enforced on every
# INGEST path (append / overwrite / dynamic partition overwrite / upsert)
# — a batch with any row where a check is not TRUE (false OR null) is
# rejected atomically: nothing is staged, no snapshot is created, the
# table is byte-identical. Enforcement is one map-side pass over the
# incoming BATCH (a global partial-agg of violation counts — no shuffle,
# never a table scan), so the gate costs O(batch) at any table size.
CONSTRAINT_PROP_PREFIX = "constraints.check."

# declared write clustering (≙ Iceberg write.sort-order /
# write.distribution-mode): see ParquetTableManager._write_files
SORT_ORDER_PROP = "write.sort-order"
DISTRIBUTION_PROP = "write.distribution-mode"
RANGE_PARTITIONS_PROP = "write.range-partitions"  # explicit range buckets
RANGE_PARTITIONS_DEFAULT = 8


class ConstraintViolation(ValueError):
    """An ingest batch failed a ``constraints.check.*`` table property."""


class CompactionConflict(RuntimeError):
    """A targeted rewrite aborted because a concurrent commit removed a
    file it planned to rewrite (Iceberg rewrite_data_files validation
    semantics). The table is untouched; retry or let the next trigger
    cover it."""


class TxnConflictError(RuntimeError):
    """A published transaction entry could not be applied because a
    foreign commit invalidated it in the publish→apply window. The
    record is aborted (tombstoned, never replayed); entries already
    applied keep their effect — each is itself a consistent snapshot."""


class RollbackConflictError(TxnConflictError):
    """A catalog-level transaction rollback found a member table's head
    advanced past the target transaction while the rollback was in
    flight. The rollback record is aborted (never clobbers the newer
    commit); member tables already rolled back keep their rollback —
    each is itself a consistent snapshot — and the error names the
    conflicting table so the caller can retry or reconcile."""


# fully-applied txns leave a durable `<seq>.applied` record (what
# rollback_transaction resolves against); keep only the newest N so the
# txns dir — which _publish_txn lists on every allocation — stays O(N +
# outstanding), not O(all-time txns). GC of seq s requires N newer
# applied records to exist IN the dir, so the allocation max can never
# regress below an already-used seq.
TXN_APPLIED_KEEP = 64


# upsert_equality auto-runs compact_deletes once any file's delete stack
# reaches this depth (0/absent = off); BENCH_MOR.json measures the curve
DELETE_COMPACT_THRESHOLD_PROP = "write.delete.compact-threshold"

# append auto-runs compact_partitions once any partition's file count
# reaches this depth (0/absent = off) — the data-file twin of the delete
# threshold: streaming micro-appends self-heal without an external
# scheduler. The trigger check is metadata-only; only partitions that
# meet compact_partitions' own criteria (>= threshold files, at least
# one small) are rewritten, every other partition keeps file identity.
# Connector-face writes (df.write.format("snaptable")) commit from a
# session-less Python worker and cannot compact inline — run
# compact_partitions from a maintenance job there.
COMPACT_THRESHOLD_PROP = "write.compact-threshold"

# segmented-manifest tuning (manifest-list indirection): entries per
# segment file, and how many consecutive small pieces accumulate before
# a commit coalesces them into fresh target-sized segments. Both are
# table properties so tests can exercise multi-segment layouts with a
# handful of files.
SEGMENT_TARGET_PROP = "meta.segment-target-entries"
SEGMENT_MERGE_RUN_PROP = "meta.segment-merge-run"

# columnar segment codec: each manifest segment persists as ONE parquet
# file with typed columns for the universally-present entry fields plus
# a JSON spill column for the irregular rest (delete attachments, bloom
# filters, writer schemas, ...). Planning reads ONLY the columns it
# needs — `path` for a broad scan, (path, partition, records, bytes)
# for the files/partitions metadata tables — at Arrow speed, and whole
# segments can be handed to executors for distributed entry pruning
# (≙ Iceberg planning big scans against Avro manifests it reads
# distributed, instead of driver-side JSON).
_SEG_BASE_KEYS = ("path", "partition", "records", "bytes")


def _seg_encode_parquet(path: str, entries: list[dict]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as papq

    rest_rows: list[str | None] = []
    for e in entries:
        rest = {k: v for k, v in e.items() if k not in _SEG_BASE_KEYS}
        rest_rows.append(json.dumps(rest, sort_keys=True) if rest else None)
    tab = pa.table(
        {
            "path": pa.array(
                [e.get("path") for e in entries], type=pa.string()
            ),
            "partition": pa.array(
                [
                    json.dumps(e["partition"], sort_keys=True)
                    if "partition" in e
                    else None
                    for e in entries
                ],
                type=pa.string(),
            ),
            "records": pa.array(
                [e.get("records") for e in entries], type=pa.int64()
            ),
            "bytes": pa.array(
                [e.get("bytes") for e in entries], type=pa.int64()
            ),
            "rest": pa.array(rest_rows, type=pa.string()),
        }
    )
    # exclusive create preserves the old "x"-mode immutability contract
    with open(path, "xb") as f:
        papq.write_table(tab, f, compression="zstd")


def _batch_json(cells) -> list:
    """Parse a vector of JSON-object strings in ONE ``json.loads`` call
    (wrap in an array) — a single C-speed parse instead of one Python
    call per entry; this keeps columnar decode at least as fast as the
    old whole-segment ``json.load``."""
    out = [None] * len(cells)
    idx = [i for i, s in enumerate(cells) if s]
    if idx:
        parsed = json.loads("[" + ",".join(cells[i] for i in idx) + "]")
        for i, o in zip(idx, parsed):
            out[i] = o
    return out


def _seg_rows_to_entries(
    paths, parts, recs, byts, rests
) -> list[dict]:
    """Column vectors -> exact entry dicts (shared by the driver decode
    and the executor-parallel pruning kernel). A key absent at encode
    time is absent after decode — entries round-trip exactly."""
    part_objs = _batch_json(parts)
    rest_objs = _batch_json(rests)
    out: list[dict] = []
    for p, part, r, b, rest in zip(paths, part_objs, recs, byts, rest_objs):
        e: dict = {}
        if p is not None:
            e["path"] = p
        if part is not None:
            e["partition"] = part
        if r is not None:
            e["records"] = r
        if b is not None:
            e["bytes"] = b
        if rest is not None:
            e.update(rest)
        out.append(e)
    return out


def _seg_decode_parquet(path: str) -> list[dict]:
    import pyarrow.parquet as papq

    tab = papq.read_table(path)
    return _seg_rows_to_entries(
        tab.column("path").to_pylist(),
        tab.column("partition").to_pylist(),
        tab.column("records").to_pylist(),
        tab.column("bytes").to_pylist(),
        tab.column("rest").to_pylist(),
    )


BLOOM_COLS_PROP = "index.bloom.columns"  # comma-separated column names
BLOOM_BITS_PROP = "index.bloom.bits"  # filter size in bits (default 65536)
BLOOM_HASHES_PROP = "index.bloom.hashes"  # hash count k (default 6)
BLOOM_DEFAULT_BITS = 65536
BLOOM_DEFAULT_HASHES = 6

# per-file NDV sketches (≙ Iceberg Puffin "apache-datasketches" blobs +
# the `ndv` entry in partition/file stats): comma-separated columns for
# which every write records a mergeable HLL distinct sketch per data
# file — Spark's hll_sketch_agg (Apache DataSketches HLL_4), so the
# planner-grade global/partial NDV folds from manifests alone, zero
# data reads, union-mergeable across any file subset
NDV_COLS_PROP = "stats.ndv.columns"
NDV_LGK_PROP = "stats.ndv.lgk"  # sketch precision (default 12 ≈ 1.6% err)
NDV_DEFAULT_LGK = 12


def _parse_dtype(dtype: str) -> DataType:
    """DDL type string -> DataType (via a throwaway single-field struct)."""
    return StructType().add("x", dtype).fields[0].dataType


def _bloom_positions(v: Any, m_bits: int, k: int) -> list[int]:
    """k bit positions for a value: md5 over (seed || normalized-str),
    first 8 digest bytes mod m. Deterministic across processes (no
    PYTHONHASHSEED dependence) so a filter written by one job is readable
    by every later scan."""
    import hashlib as _hl

    b = str(_norm_stat(v)).encode("utf-8")
    return [
        int.from_bytes(_hl.md5(bytes([i]) + b).digest()[:8], "big") % m_bits
        for i in range(k)
    ]


def _bloom_build(values, m_bits: int, k: int) -> str:
    import base64

    bits = bytearray(m_bits // 8)
    for v in values:
        if v is None:
            continue
        for p in _bloom_positions(v, m_bits, k):
            bits[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(bits)).decode("ascii")


def _bloom_may_contain(bl: dict, v: Any) -> bool:
    import base64

    bits = base64.b64decode(bl["b"])
    return all(
        (bits[p >> 3] >> (p & 7)) & 1
        for p in _bloom_positions(v, int(bl["m"]), int(bl["k"]))
    )


def _bloom_may_match(entry: dict, where: list) -> bool:
    """File-skip test against per-file Bloom filters: definite-absence on
    equality/membership predicates prunes the file. Conservative — only a
    negative filter answer (never-inserted) skips; range ops pass."""
    for col, op, lit_v in where:
        bl = (entry.get("bloom") or {}).get(col)
        if not bl:
            continue
        if op == "==":
            if not _bloom_may_contain(bl, lit_v):
                return False
        elif op == "in":
            if not any(_bloom_may_contain(bl, v) for v in lit_v):
                return False
    return True


def _tz_free_lit(v: Any) -> Column:
    """Literal that is insensitive to the PYTHON PROCESS timezone.

    ``F.lit(naive datetime)`` converts wall time -> epoch micros through
    the driver process's local tz (the TZ env var), NOT the session tz —
    so under TZ=America/New_York with a UTC session the literal lands 4-5
    hours off and a ``>= midnight`` scan bound silently drops the whole
    boundary day (caught by the r6 sf0.01 oracle sweep on
    q_scan_iceberg). Naive temporals go through a string->TIMESTAMP_NTZ
    cast instead, which is wall-clock-exact under any process/session tz
    (table timestamps read as NTZ via inferTimestampNTZ)."""
    import datetime as dt

    if isinstance(v, dt.datetime) and v.tzinfo is None:
        return F.lit(v.isoformat(sep=" ")).cast("timestamp_ntz")
    if isinstance(v, dt.date) and not isinstance(v, dt.datetime):
        return F.lit(v.isoformat()).cast("date")
    return F.lit(v)


def _json_lit(v: Any):
    """Manifest/record-storable literal: temporals -> ISO strings (the
    stats comparisons cast implicitly at read)."""
    if isinstance(v, (list, tuple, set)):
        return [_json_lit(x) for x in v]
    n = _norm_stat(v)
    return n if isinstance(n, (int, float, str, bool)) else str(n)


def _null_safe_eq(left: DataFrame, right: DataFrame, cols: list[str]) -> Column:
    """Null-safe equi-join condition over ``cols`` (Iceberg equality
    deletes match NULL keys to NULL values; plain ``on=cols`` would never
    match them). ``<=>`` is still an equi-join predicate, so Spark plans
    a hash/broadcast join, not a cartesian."""
    cond = left[cols[0]].eqNullSafe(right[cols[0]])
    for c in cols[1:]:
        cond = cond & left[c].eqNullSafe(right[c])
    return cond


def _predicate(where: list) -> Column | None:
    """AND of (col, op, literal) triples as a Column; None if empty."""
    pred = None
    for col, op, lit_v in where:
        c = F.col(col)
        if op == "isnull":
            p = c.isNull()
        elif op == "notnull":
            p = c.isNotNull()
        elif op == "in":
            p = c.isin(list(lit_v))
        else:
            v = _tz_free_lit(lit_v)
            p = {"==": c == v, ">=": c >= v, "<=": c <= v, ">": c > v, "<": c < v}[op]
        pred = p if pred is None else (pred & p)
    return pred


# ----------------------------------------------------------------- transforms


@dataclass(frozen=True)
class Transform:
    """A hidden-partition transform: derives a partition value column from a
    source column (Iceberg transform semantics)."""

    kind: str
    source: str
    arg: int | None = None

    @property
    def field_name(self) -> str:
        if self.kind == "identity":
            return self.source
        if self.arg is not None:
            return f"{self.source}_{self.kind}{self.arg}"
        return f"{self.source}_{self.kind}"

    def expr(self) -> Column:
        c = F.col(self.source)
        if self.kind == "identity":
            return c
        if self.kind == "years":
            return F.year(c)
        if self.kind == "months":
            return F.year(c) * 100 + F.month(c)
        if self.kind == "days":
            return F.date_format(c, "yyyy-MM-dd")
        if self.kind == "hours":
            return F.date_format(c, "yyyy-MM-dd-HH")
        if self.kind == "truncate":
            return (c - (c % F.lit(self.arg))).cast("long")
        if self.kind == "bucket":
            return F.pmod(F.xxhash64(c), F.lit(self.arg))
        raise ValueError(f"unknown transform {self.kind}")

    # ---- predicate-bound mapping for pruning (value-space -> part-space)
    def literal_to_partition(self, v: Any) -> Any:
        import datetime as dt

        if self.kind == "identity":
            return v
        if isinstance(v, str) and self.kind in ("years", "months", "days", "hours"):
            v = dt.datetime.fromisoformat(v)
        if self.kind == "years":
            return v.year
        if self.kind == "months":
            return v.year * 100 + v.month
        if self.kind == "days":
            return v.strftime("%Y-%m-%d")
        if self.kind == "hours":
            return v.strftime("%Y-%m-%d-%H")
        if self.kind == "truncate":
            return v - (v % self.arg)
        raise ValueError(f"transform {self.kind} cannot map range literals")

    @property
    def order_preserving(self) -> bool:
        return self.kind in ("identity", "years", "months", "days", "hours", "truncate")


def identity(col: str) -> Transform:
    return Transform("identity", col)


def years(col: str) -> Transform:
    return Transform("years", col)


def months(col: str) -> Transform:
    return Transform("months", col)


def days(col: str) -> Transform:
    return Transform("days", col)


def hours(col: str) -> Transform:
    return Transform("hours", col)


def truncate(col: str, width: int) -> Transform:
    return Transform("truncate", col, width)


def bucket(col: str, n: int) -> Transform:
    return Transform("bucket", col, n)


# ------------------------------------------------------------------- manager

# Reference-parity default properties (aig/AIGEventsTableCreator.java:184-191)
DEFAULT_PROPERTIES = {
    "write.format.default": "parquet",
    "write.parquet.compression-codec": "zstd",
    "write.target-file-size-bytes": str(128 * 1024 * 1024),
}


class _SegCache(OrderedDict):
    """Per-warehouse segment cache: (table, segment-id) -> entry list,
    carrying its own cached-entry counter so size bookkeeping stays
    coherent with THIS dict's lifetime (not a shared side table that a
    registry eviction could desynchronize). Ordered so eviction is true
    LRU: every put AND hit moves the key to the MRU end — a plain dict
    keeps a re-assigned key at its ORIGINAL position, where it could
    become "oldest", halt the eviction loop, and leave the cache above
    its entry budget until a later put."""

    __slots__ = ("entries",)

    def __init__(self) -> None:
        super().__init__()
        self.entries = 0


class ParquetTableManager:
    """Warehouse of snapshot-committed partitioned parquet tables.

    Layout per table::

        <warehouse>/<name>/
            data/...partition dirs.../part-*.parquet
            _staging/<uuid>/           (invisible until commit)
            _meta/v{N}.json            (manifest: files + stats + schema)
            _meta/current              (atomic pointer to live version)
    """

    # warehouse abspath -> {(table, segment-id): parsed entry list}.
    # Segments are immutable once written and uuid-named (ids never
    # recur), so a PROCESS-wide cache is always coherent — and it must
    # be process-wide, not per-instance: connector writes and streaming
    # micro-batches construct a fresh manager per call, which would
    # otherwise re-decode the whole inventory every batch.
    # LRU across warehouses (move-to-end on every manager construct):
    # a hot long-lived warehouse stays cached no matter how many
    # throwaway tmp warehouses a pytest/notebook session opens after it
    # — FIFO would evict it mid-use and silently re-decode.
    _SEG_CACHES: "OrderedDict[str, _SegCache]" = OrderedDict()

    # warehouses cached at once — a long pytest/notebook session touches
    # hundreds of throwaway warehouses; without a bound the shared cache
    # would pin every one of them for the process lifetime
    SEG_CACHE_MAX_WAREHOUSES = 32
    # per-warehouse segment-entry bound: one huge warehouse must not
    # grow the process cache without limit. At ~200 B of dict refs per
    # entry this caps driver heap near 100 MB per warehouse; past it the
    # OLDEST segments drop (append-mostly workloads keep re-reading the
    # newest) and re-decode on demand.
    SEG_CACHE_MAX_ENTRIES_PER_WAREHOUSE = 500_000

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        self._in_txn_repair = False
        key = os.path.abspath(warehouse)
        self._seg_key = key
        cache = self._SEG_CACHES.get(key)
        if cache is None:
            while len(self._SEG_CACHES) >= self.SEG_CACHE_MAX_WAREHOUSES:
                self._SEG_CACHES.popitem(last=False)  # LRU eviction
            cache = self._SEG_CACHES[key] = _SegCache()
        else:
            self._SEG_CACHES.move_to_end(key)
        self._seg_cache = cache
        os.makedirs(warehouse, exist_ok=True)

    def _seg_cache_put(self, key: tuple[str, str], entries: list[dict]) -> None:
        """Insert a decoded segment under the per-warehouse entry budget:
        past SEG_CACHE_MAX_ENTRIES_PER_WAREHOUSE the OLDEST cached
        segments drop (append-mostly readers keep hitting the newest)
        and re-decode on demand — one huge warehouse can no longer grow
        the process cache without bound. The entry counter lives ON the
        cache dict itself, so a warehouse LRU-evicted from the shared
        registry while a live manager still holds its dict keeps a
        coherent private count (and a re-registered warehouse starts at
        zero instead of inheriting a stale total)."""
        cache = self._seg_cache
        prev = cache.get(key)
        if prev is not None:
            cache.entries -= len(prev)
        cache[key] = entries
        cache.move_to_end(key)  # re-assignment must land at the MRU end
        cache.entries += len(entries)
        while (
            cache.entries > self.SEG_CACHE_MAX_ENTRIES_PER_WAREHOUSE
            and len(cache) > 1
        ):
            oldest = next(iter(cache))
            if oldest == key:  # never evict the segment just inserted
                break
            cache.entries -= len(cache.pop(oldest))

    def _seg_cache_drop(self, key: tuple[str, str]) -> None:
        """Remove one segment from the cache, keeping the size book."""
        prev = self._seg_cache.pop(key, None)
        if prev is not None:
            self._seg_cache.entries -= len(prev)

    # ---------------------------------------------------------------- paths
    def _dir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _meta_dir(self, name: str) -> str:
        return os.path.join(self._dir(name), "_meta")

    def _manifest_path(self, name: str, version: int) -> str:
        return os.path.join(self._meta_dir(name), f"v{version}.json")

    def _heads_dir(self, name: str, ref: str) -> str:
        return os.path.join(self._meta_dir(name), "heads", ref)

    def _tag_path(self, name: str, tag: str) -> str:
        return os.path.join(self._meta_dir(name), "tags", tag)

    def _ref_head(self, name: str, ref: str = "main") -> tuple[int, int]:
        """(seq, manifest_version) of a branch head, or (-1, -1) if the
        branch has no commits. The head is the highest ``seq-*`` file; each
        seq file appears atomically WITH its content (hard-linked from a
        fully-written temp file), so readers never observe a half-written
        pointer.

        Read-repair: a PUBLISHED multi-table transaction whose head
        advances were interrupted (crash between the txn record landing
        and the per-table applies) is rolled forward for ``name`` before
        the head is resolved — so once the txn record exists, no reader
        can ever observe this table without the txn's effect (the
        no-partial-visibility half of :meth:`transaction`)."""
        if not self._in_txn_repair:
            self._repair_txns(name)
        d = self._heads_dir(name, ref)
        try:
            entries = [fn for fn in os.listdir(d) if fn.startswith("seq-")]
        except FileNotFoundError:
            return (-1, -1)
        if not entries:
            return (-1, -1)
        top = max(entries)
        with open(os.path.join(d, top)) as f:
            return (int(top[4:]), int(f.read().strip()))

    def _current_version(self, name: str) -> int:
        _seq, v = self._ref_head(name, "main")
        if v < 0:
            raise FileNotFoundError(f"table {name!r} does not exist")
        return v

    # -------------------------------------------------- segmented manifests
    # Manifest-list indirection (≙ Iceberg's manifest-list -> manifest-file
    # two-level metadata, the design that makes commit metadata O(delta)):
    # a snapshot's file inventory is stored as IMMUTABLE segment files
    # (_meta/segs/<id>.json, each a list of entries) plus a per-snapshot
    # ordered segment-id list in the manifest JSON. An append reuses every
    # base segment by reference and writes ONE new segment with its own
    # files; a delete-attach rewrites ONLY the segment(s) holding the
    # touched entries. Without this, every micro-append to a 1M-file table
    # re-serializes (and every read re-parses) the full inventory —
    # the stand-in's one true 100 TB metadata ceiling (r8 verdict lead
    # item; reference dependency surface pom.xml:37-64).
    #
    # Facade contract: _load_manifest still returns a plain dict whose
    # "files" key is the FULL materialized entry list, so the 3,000-line
    # consumer surface is unchanged. The entries are SHARED with the
    # process-wide segment cache (a load is O(entry refs), never a
    # per-entry copy — metadata ops stay sub-linear in inventory size).
    # INVARIANT: consumers MUST NOT mutate an entry in place — copy it
    # (`e = dict(e)`) and REPLACE it in the list, as every attach site
    # does. Commit-time segment reuse is decided by entry-object identity
    # runs, so an in-place mutation would be lost to segment reuse even
    # before cache aliasing is considered (test_segments.py pins both).
    #
    # Read side: per-SEGMENT partition summaries ("seg_stats": [min,max]
    # per identity-partition value, computed once at segment write) let
    # scan() skip whole segments before touching their entries —
    # Iceberg's manifest-file partition-summary trick — so a partition-
    # scoped scan's pruning loop is O(segments + matching entries), not
    # O(table), and BENCH_META.json shows point-scan planning flat
    # across a 100x file-count spread. The one remaining O(table) term
    # is the ref-extend materialization per _load_manifest (cheap Python
    # refs, no JSON); a fully lazy facade isn't worth the consumer-
    # contract risk at current scales.

    def _segs_dir(self, name: str) -> str:
        return os.path.join(self._meta_dir(name), "segs")

    def _seg_path(self, name: str, segid: str) -> str:
        """Canonical (COLUMNAR parquet) segment file path. Segments are
        stored columnar — ≙ Iceberg's Avro manifests, readable by Spark
        itself — so planning can read just the columns it needs (`path`
        for broad scans, prunable fields for metadata tables) at Arrow
        speed, or hand whole segments to executors, instead of JSON-
        parsing every entry in driver Python."""
        return os.path.join(self._segs_dir(name), f"{segid}.parquet")

    def _seg_path_legacy(self, name: str, segid: str) -> str:
        """Pre-columnar JSON segment path (read-compat only: tables
        written before the parquet format keep working; new segments are
        always parquet)."""
        return os.path.join(self._segs_dir(name), f"{segid}.json")

    def _seg_entries(self, name: str, segid: str) -> list[dict]:
        """Parsed entries of one immutable segment (process-cached)."""
        key = (name, segid)
        hit = self._seg_cache.get(key)
        if hit is not None:
            self._seg_cache.move_to_end(key)  # LRU: hits refresh recency
        if hit is None:
            p = self._seg_path(name, segid)
            if os.path.exists(p):
                hit = _seg_decode_parquet(p)
            else:
                with open(self._seg_path_legacy(name, segid)) as f:
                    hit = json.load(f)
            self._seg_cache_put(key, hit)
        return hit

    def _manifest_raw(self, name: str, version: int) -> dict:
        """The manifest JSON as stored — 'segments' ids, no
        materialization. Metadata-only callers (segment reaping) use
        this to stay O(1) in inventory size."""
        with open(self._manifest_path(name, version)) as f:
            return json.load(f)

    def _load_manifest(self, name: str, version: int | None = None) -> dict:
        v = self._current_version(name) if version is None else version
        with open(self._manifest_path(name, v)) as f:
            m = json.load(f)
        if "segments" in m:
            seg_ids = m.pop("segments")
            # per-segment partition summaries ride along for scan-time
            # segment pruning; stashed under a helper key so consumer
            # dict(m) copies can never persist a stale copy
            m["_seg_stats"] = m.pop("seg_stats", {})
            # cold-load prefetch: columnar segment decode releases the
            # GIL in Arrow, so uncached segments load threaded — the
            # one-time materialization cost of a large inventory drops
            # ~4x on a hot box (subsequent loads are pure cache refs)
            cold = [
                sid
                for sid in seg_ids
                if (name, sid) not in self._seg_cache
                and os.path.exists(self._seg_path(name, sid))
            ]
            if len(cold) > 4:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=8) as pool:
                    for sid, entries in zip(
                        cold,
                        pool.map(
                            lambda s: _seg_decode_parquet(
                                self._seg_path(name, s)
                            ),
                            cold,
                        ),
                    ):
                        self._seg_cache_put((name, sid), entries)
            files: list[dict] = []
            layout: list[tuple[str, int]] = []
            for sid in seg_ids:
                entries = self._seg_entries(name, sid)
                # entries are SHARED with the immutable segment cache —
                # O(refs) per load, no per-entry copy; safe because every
                # mutation site copies the entry before changing it (the
                # same invariant commit-time identity reuse already
                # requires — an in-place mutator would lose its write to
                # segment reuse even with defensive copies here)
                files.extend(entries)
                layout.append((sid, len(entries)))
            m["files"] = files
            # commit-time segment-reuse bookkeeping: the handed-out entry
            # objects in base order + the segment spans they came from.
            # Kept as live references (never persisted — _alloc_version
            # strips them) so id() stays unambiguous for the run matcher.
            m["_seg_layout"] = layout
            m["_base_entries"] = list(files)
        return m

    def _plan_segments(
        self, name: str, manifest: dict
    ) -> list[tuple[str | None, list[dict]]]:
        """Ordered (segment-id | None, entries) plan for a manifest about
        to be persisted: a base segment whose entry OBJECTS survive as an
        intact contiguous run in manifest["files"] is reused by id (None
        entries slot carries its live objects for possible merging); all
        other entries become new segments. Pure pointer walk — O(len
        files) with zero JSON work, so commit planning never re-reads the
        inventory."""
        files = manifest.get("files") or []
        base = manifest.get("_base_entries")
        layout = manifest.get("_seg_layout")
        plan: list[tuple[str | None, list[dict]]] = []
        if not base or not layout:
            if files:
                plan.append((None, list(files)))
            return plan
        pos = {id(e): i for i, e in enumerate(base)}
        starts: dict[int, tuple[str, int]] = {}
        off = 0
        for sid, cnt in layout:
            if cnt:
                starts[off] = (sid, cnt)
            off += cnt
        i, n = 0, len(files)
        buf: list[dict] = []
        while i < n:
            p = pos.get(id(files[i]))
            if p is not None and p in starts:
                sid, cnt = starts[p]
                if i + cnt <= n and all(
                    pos.get(id(files[i + k])) == p + k
                    for k in range(1, cnt)
                ):
                    if buf:
                        plan.append((None, buf))
                        buf = []
                    plan.append((sid, files[i : i + cnt]))
                    i += cnt
                    continue
            buf.append(files[i])
            i += 1
        if buf:
            plan.append((None, buf))
        return plan

    @staticmethod
    def _seg_summary(entries: list[dict]) -> dict:
        """Per-segment partition summary for scan-time segment pruning:
        entry count + [min, max] of each partition value whose type is
        homogeneous and orderable. Computed ONCE when a segment is
        written (O(delta)); carried by reference afterwards.

        Besides the partition [min, max] bounds the summary carries the
        fields that let planning stay O(segments) driver-side:
        ``clean`` (no entry needs delete filters / external-read
        handling — a broad scan over all-clean segments can plan from
        the segments' ``path`` columns alone, never materializing entry
        dicts), ``lay`` (distinct partition-key layouts, for the
        single-group fast read), and ``rec``/``byt`` rollups (snapshot
        inspection without touching entries)."""
        summary: dict = {"n": len(entries)}
        recs = [e.get("records") for e in entries]
        byts = [e.get("bytes") for e in entries]
        if all(isinstance(r, int) for r in recs):
            summary["rec"] = sum(recs)
        if all(isinstance(b, int) for b in byts):
            summary["byt"] = sum(byts)
        # per-partition rollup (≙ Iceberg partition statistics files):
        # [n_files, n_records, n_bytes] keyed by the canonical partition
        # JSON. Computed once per written segment (O(delta)); the table-
        # level partitions view then folds these maps across segments —
        # O(segments x partitions-per-segment), entries never decoded.
        try:
            pr: dict[str, list[int]] = {}
            for e in entries:
                k = json.dumps(e["partition"], sort_keys=True)
                slot = pr.setdefault(k, [0, 0, 0])
                slot[0] += 1
                slot[1] += int(e["records"])
                slot[2] += int(e["bytes"])
            summary["pr"] = pr
        except (KeyError, TypeError, ValueError):
            pass  # fabricated/partial entries: fold falls back to decode
        summary["clean"] = not any(
            e.get("deletes")
            or e.get("eq_deletes")
            or e.get("pos_deletes")
            or e.get("external")
            for e in entries
        )
        # any externally-registered (add_files) entry in this segment?
        # Managed writes are uuid-named — unique by construction — so a
        # manifest whose every segment says ext=False passes the MoR
        # basename-uniqueness guard O(segments), no entry walk
        summary["ext"] = any(bool(e.get("external")) for e in entries)
        try:
            summary["lay"] = sorted(
                {tuple(sorted(e["partition"])) for e in entries}
            )
        except KeyError:
            pass  # a partition-less fabricated entry: no layout summary
        parts: dict[str, list] = {}
        cols: set[str] | None = None
        for e in entries:
            p = e.get("partition") or {}
            cols = set(p) if cols is None else cols & set(p)
        for c in cols or set():
            vals = [e["partition"][c] for e in entries]
            if any(v is None for v in vals):
                continue
            # partition values serialize as strings (hive layout);
            # min/max must live in the domain predicates compare in, so
            # coerce numerics (lexicographic "13" < "2" would otherwise
            # wrongly bound the segment). Coerce ONLY when strings are
            # present: int() on an already-numeric 7.5 silently
            # truncates to 7 and the [7,7] bound would prune the
            # segment a ==7.5 scan needs (raw numeric values reach the
            # manifest via add_files' partition_values)
            if any(isinstance(v, str) for v in vals):
                for cast in (int, float):
                    try:
                        vals = [cast(v) for v in vals]
                        break
                    except (TypeError, ValueError):
                        continue
            # NaN poisons min()/max() (every comparison is False, so the
            # first element wins regardless of the rest): a [nan, nan]
            # bound would prune segments whose OTHER values match —
            # breaking the summary-is-a-superset invariant. No summary
            # for a column carrying NaN; per-entry _may_match still
            # applies its own NaN rules.
            if any(isinstance(v, float) and v != v for v in vals):
                continue
            try:
                parts[c] = [min(vals), max(vals)]
            except TypeError:
                continue  # mixed types: no summary for this column
        if parts:
            summary["p"] = parts
        return summary

    def _write_segments(
        self, name: str, manifest: dict
    ) -> tuple[list[str], dict]:
        """Persist a manifest's inventory as segment files; returns the
        ordered segment-id list. Reused segments cost zero I/O. Runs of
        >= merge-run consecutive small pieces (tiny reused segments from
        past micro-appends + the new delta) coalesce into fresh
        target-sized segments, so the per-snapshot segment count stays
        O(files/target + merge-run) under streaming micro-appends —
        amortized O(1) extra writes per commit (≙ Iceberg's
        commit-time manifest merging, min-count-to-merge)."""
        props = manifest.get("properties", {}) or {}

        def _prop(key: str, dflt: int) -> int:
            try:
                return max(1, int(props.get(key, dflt)))
            except (TypeError, ValueError):
                return dflt

        target = _prop(SEGMENT_TARGET_PROP, 512)
        merge_run = _prop(SEGMENT_MERGE_RUN_PROP, 16)
        # a piece is mergeable while under-full; merged output is emitted
        # in FULL target-sized chunks, so re-merging can't cascade and the
        # amortized extra write per commit stays O(delta)
        small = target - 1
        plan = self._plan_segments(name, manifest)
        prior_stats = manifest.get("_seg_stats") or {}
        out_ids: list[str] = []
        out_stats: dict[str, dict] = {}

        def emit_new(entries: list[dict]) -> None:
            if not entries:
                return
            os.makedirs(self._segs_dir(name), exist_ok=True)
            for j in range(0, len(entries), target):
                chunk = entries[j : j + target]
                sid = f"s-{uuid.uuid4().hex[:16]}"
                _seg_encode_parquet(self._seg_path(name, sid), chunk)
                self._seg_cache_put((name, sid), [dict(e) for e in chunk])
                out_ids.append(sid)
                out_stats[sid] = self._seg_summary(chunk)

        def reuse(sid: str, es: list[dict]) -> None:
            out_ids.append(sid)
            # carry the summary by reference; compute once for segments
            # predating the stats format (migration, never repeated)
            out_stats[sid] = prior_stats.get(sid) or self._seg_summary(es)

        run: list[tuple[str | None, list[dict]]] = []

        def flush() -> None:
            if not run:
                return
            if len(run) >= merge_run:
                emit_new([e for _sid, es in run for e in es])
            else:
                for sid, es in run:
                    if sid is not None:
                        reuse(sid, es)
                    else:
                        emit_new(es)
            run.clear()

        for sid, es in plan:
            if len(es) <= small:
                run.append((sid, es))
            else:
                flush()
                if sid is not None:
                    reuse(sid, es)
                else:
                    emit_new(es)
        flush()
        return out_ids, out_stats

    def _max_manifest_version(self, name: str) -> int:
        meta = self._meta_dir(name)
        best = -1
        try:
            for fn in os.listdir(meta):
                if fn.startswith("v") and fn.endswith(".json"):
                    try:
                        best = max(best, int(fn[1:-5]))
                    except ValueError:
                        pass
        except FileNotFoundError:
            pass
        return best

    def _alloc_version(self, name: str, manifest: dict) -> int:
        """Allocate a globally-unique snapshot id by exclusive-create of
        the manifest file at max+1 (ids are shared across all branches, as
        in Iceberg).

        Persistence is SEGMENTED: the inventory goes to immutable segment
        files (unchanged base segments reused by reference — zero bytes
        rewritten), and the manifest JSON stores only the segment-id list
        plus table metadata, so a micro-append's commit I/O is O(delta)
        no matter how many files the table holds. The in-memory manifest
        dict (facade "files" + reuse bookkeeping) is left intact for the
        caller's CAS retry loop."""
        seg_ids, seg_stats = self._write_segments(name, manifest)
        persist = {
            k: v
            for k, v in manifest.items()
            if k
            not in ("files", "_base_entries", "_seg_layout", "_seg_stats")
        }
        persist["segments"] = seg_ids
        persist["seg_stats"] = seg_stats
        while True:
            v = self._max_manifest_version(name) + 1
            manifest["version"] = v
            persist["version"] = v
            try:
                with open(self._manifest_path(name, v), "x") as f:
                    json.dump(persist, f)
                return v
            except FileExistsError:
                continue

    def _link_pointer(self, path: str, content: str) -> bool:
        """Atomically publish ``content`` at ``path`` iff it doesn't exist
        (hard link from a written temp = exclusive create WITH content).
        Returns False if another writer won."""
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = os.path.join(
            os.path.dirname(path), f".tmp.{uuid.uuid4().hex}"
        )
        with open(tmp, "w") as f:
            f.write(content)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    def _commit(
        self,
        name: str,
        manifest: dict,
        rebase=None,
        ref: str = "main",
        keep_ndv: bool = False,
    ) -> int:
        """Atomic commit to a branch: allocate the manifest (globally-
        numbered snapshot), then advance the branch head by exclusive-create
        of the next ``seq`` pointer — a lock-free compare-and-swap. Readers
        resolve the head pointer first, so they always see a complete
        snapshot — all-or-nothing visibility exactly like the reference's
        single AppendFiles.commit().

        ``rebase(head_manifest) -> manifest`` re-derives the commit on top
        of a concurrently-advanced branch state (Iceberg's retry semantics
        for appends: re-stage the same added files on the new base instead
        of clobbering the winner's files). A manifest whose head-advance
        lost the CAS is left orphaned and reaped by
        :meth:`expire_snapshots`."""
        os.makedirs(self._meta_dir(name), exist_ok=True)
        import time as _time

        manifest["committed_at"] = _time.time()
        # txn stamps belong ONLY to snapshots _apply_txn/_apply_upsert
        # hand-link; call sites here build manifests by mutating the
        # loaded head dict, which would otherwise inherit the parent's
        # stamp and make a plain append impersonate a txn member (breaks
        # rollback_transaction's has-the-table-advanced guard) — and an
        # inherited txn_entry would false-positive a later DDL entry's
        # idempotence walk (a staged DDL silently skipped)
        manifest.pop("txn", None)
        manifest.pop("txn_entry", None)
        # the table-level NDV blob is valid only for the exact file set
        # the maintaining APPEND computed it for — any other op that
        # inherited it from the loaded head dict would serve stale
        # estimates (CoW delete shrank the data; overwrite replaced it).
        # Only append() re-derives and keeps it (keep_ndv=True, its
        # rebase re-deriving against the winner); everything else drops
        # to the per-file sketch fold, which is always correct.
        if not keep_ndv:
            manifest.pop("ndv_tbl", None)
        while True:
            seq, cur = self._ref_head(name, ref)
            if (
                rebase is not None
                and manifest.get("parent") is not None
                and cur != manifest["parent"]
            ):
                manifest = rebase(self._load_manifest(name, cur))
                manifest.pop("txn", None)
                manifest.pop("txn_entry", None)
                if not keep_ndv:
                    manifest.pop("ndv_tbl", None)
            version = self._alloc_version(name, manifest)
            seq_path = os.path.join(
                self._heads_dir(name, ref), f"seq-{seq + 1:09d}"
            )
            if self._link_pointer(seq_path, str(version)):
                return version

    # ----------------------------------------------------------------- DDL
    def create_table(
        self,
        name: str,
        schema: StructType,
        partition_by: list[Transform] | None = None,
        properties: dict[str, str] | None = None,
    ) -> None:
        if self.exists(name):
            raise ValueError(f"table {name!r} already exists")
        props = dict(DEFAULT_PROPERTIES)
        props.update(properties or {})
        spec = [
            {"kind": t.kind, "source": t.source, "arg": t.arg}
            for t in (partition_by or [])
        ]
        manifest = {
            "operation": "create",
            "parent": None,
            "schema": json.loads(schema.json()),
            "spec": spec,
            "properties": props,
            "files": [],
        }
        os.makedirs(os.path.join(self._dir(name), "data"), exist_ok=True)
        self._commit(name, manifest)

    def exists(self, name: str) -> bool:
        return self._ref_head(name, "main")[1] >= 0

    def _spec(self, manifest: dict) -> list[Transform]:
        return [
            Transform(s["kind"], s["source"], s.get("arg"))
            for s in manifest["spec"]
        ]

    def schema(self, name: str, manifest: dict | None = None) -> StructType:
        m = self._load_manifest(name) if manifest is None else manifest
        return StructType.fromJson(m["schema"])

    def properties(
        self, name: str, manifest: dict | None = None
    ) -> dict[str, str]:
        m = self._load_manifest(name) if manifest is None else manifest
        return m["properties"]

    def set_properties(self, name: str, props: dict[str, str]) -> int:
        m = self._load_manifest(name)
        m["properties"].update(props)
        m["operation"] = "set-properties"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def add_column(
        self, name: str, col: str, dtype: str, default: Any = None
    ) -> int:
        """Schema evolution: append an optional column. Existing data files
        are untouched; reads project NULL for them (Iceberg semantics).

        ``default`` sets an INITIAL DEFAULT (≙ Iceberg v3
        initial-default / SQL ``ADD COLUMN ... DEFAULT``): rows written
        BEFORE this commit read the default instead of NULL, while rows
        written after keep their explicit values — including genuine
        NULLs (presence is decided per data file by its recorded writer
        schema, never by value coalescing). Metadata-only either way: no
        file is rewritten, old files resolve the default at read time."""
        m = self._load_manifest(name)
        # single source of truth with the transactional DDL path: the
        # same validation + schema mutation _apply_txn replays
        m["schema"] = _apply_schema_ddl(
            m["schema"],
            {
                "kind": "add-column",
                "col": col,
                "dtype": dtype,
                **({"default": default} if default is not None else {}),
            },
        )
        m["operation"] = "add-column"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def drop_column(self, name: str, col: str) -> int:
        """Schema evolution: drop a column. Metadata-only — data files keep
        the physical column; the explicit read schema simply stops
        projecting it (Iceberg semantics). Partition source columns cannot
        be dropped while a transform references them."""
        m = self._load_manifest(name)
        schema = StructType.fromJson(m["schema"])
        if col not in schema.fieldNames():
            raise ValueError(f"no such column {col!r}")
        if any(t.source == col for t in self._spec(m)):
            raise ValueError(
                f"{col!r} is a partition source; drop the partition field first"
            )
        # outstanding MoR deletes bind by name; dropping the column would
        # leave the read path unable to apply them
        for e in m["files"]:
            if any(
                any(c == col for c, _op, _v in dw)
                for dw in e.get("deletes", [])
            ) or any(col in d["cols"] for d in e.get("eq_deletes", [])):
                raise ValueError(
                    f"column {col!r} has outstanding merge-on-read "
                    f"deletes; run rewrite_deletes() before dropping"
                )
        if any(col in g["cols"] for g in m.get("global_eq_deletes", [])):
            raise ValueError(
                f"column {col!r} keys outstanding global equality "
                f"deletes; run rewrite_deletes() before dropping"
            )
        m["schema"] = json.loads(
            StructType([f for f in schema.fields if f.name != col]).json()
        )
        m["operation"] = "drop-column"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def rename_column(self, name: str, old: str, new: str) -> int:
        """Schema evolution: rename a column, metadata-only (≙ Iceberg
        ``ALTER TABLE ... RENAME COLUMN``, which resolves via field IDs).
        The field records its former names in metadata; reads coalesce the
        historical names so files written before the rename still resolve.
        Renaming a partition source is rejected (transforms bind by name
        here, and identity sources are baked into hive paths)."""
        m = self._load_manifest(name)
        schema = StructType.fromJson(m["schema"])
        if old not in schema.fieldNames():
            raise ValueError(f"no such column {old!r}")
        if new in schema.fieldNames():
            raise ValueError(f"column {new!r} already exists")
        if any(t.source == old for t in self._spec(m)):
            raise ValueError(f"{old!r} is a partition source; cannot rename")
        # merge-on-read delete predicates bind by column NAME (Iceberg
        # binds by field id); renaming under outstanding deletes would
        # silently unbind them — materialize first
        for e in m["files"]:
            for dw in e.get("deletes", []):
                if any(c == old for c, _op, _v in dw):
                    raise ValueError(
                        f"column {old!r} has outstanding merge-on-read "
                        f"deletes; run rewrite_deletes() before renaming"
                    )
            for d in e.get("eq_deletes", []):
                if old in d["cols"]:
                    raise ValueError(
                        f"column {old!r} keys outstanding equality "
                        f"deletes; run rewrite_deletes() before renaming"
                    )
        if any(old in g["cols"] for g in m.get("global_eq_deletes", [])):
            raise ValueError(
                f"column {old!r} keys outstanding global equality "
                f"deletes; run rewrite_deletes() before renaming"
            )
        fields = []
        for f in schema.fields:
            if f.name == old:
                meta = dict(f.metadata)
                meta["former_names"] = list(
                    dict.fromkeys([*meta.get("former_names", []), old])
                )
                fields.append(StructField(new, f.dataType, f.nullable, meta))
            else:
                fields.append(f)
        m["schema"] = json.loads(StructType(fields).json())
        m["operation"] = "rename-column"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def add_partition_field(self, name: str, transform: Transform) -> int:
        """Partition-spec evolution (≙ ``ALTER TABLE ... ADD PARTITION
        FIELD``, aig/TimeBasedPartitioningExamples.java:211-216): future
        writes partition by the extended spec; existing files keep their
        old layout and are never rewritten. Pruning stays correct on both:
        a file missing the new partition value is conservatively kept."""
        m = self._load_manifest(name)
        schema = StructType.fromJson(m["schema"])
        if transform.source not in schema.fieldNames():
            raise ValueError(f"no such column {transform.source!r}")
        if any(
            t.field_name == transform.field_name for t in self._spec(m)
        ):
            raise ValueError(f"partition field {transform.field_name!r} already in spec")
        m["spec"] = m["spec"] + [
            {"kind": transform.kind, "source": transform.source, "arg": transform.arg}
        ]
        m["operation"] = "add-partition-field"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def drop_partition_field(self, name: str, field_name: str) -> int:
        """Partition-spec evolution (≙ ``ALTER TABLE ... DROP PARTITION
        FIELD``, aig/TimeBasedPartitioningExamples.java:218-221): future
        writes stop partitioning by the field; existing files keep their
        layout and their manifest partition values still prune."""
        m = self._load_manifest(name)
        spec = self._spec(m)
        if not any(t.field_name == field_name for t in spec):
            raise ValueError(f"no partition field {field_name!r} in spec")
        m["spec"] = [
            s
            for s, t in zip(m["spec"], spec)
            if t.field_name != field_name
        ]
        m["operation"] = "drop-partition-field"
        m["parent"] = m["version"]
        return self._commit(name, m)

    # value-preserving widenings Iceberg allows (no file rewrite needed:
    # reads up-cast old files through the align-cast in _read_files)
    _WIDENINGS = {("integer", "long"), ("float", "double")}

    def widen_column(self, name: str, col: str, to_type: str) -> int:
        """Schema evolution: widen a column's type in place (int→long,
        float→double — the promotions Iceberg permits). Metadata-only:
        existing files keep the narrow type and reads cast up; anything
        else would silently corrupt values and is rejected."""
        m = self._load_manifest(name)
        # single source of truth with the transactional DDL path
        m["schema"] = _apply_schema_ddl(
            m["schema"],
            {"kind": "widen-column", "col": col, "to_type": to_type},
        )
        m["operation"] = "widen-column"
        m["parent"] = m["version"]
        return self._commit(name, m)

    # --------------------------------------------------------------- writes
    def _write_files(
        self,
        name: str,
        df: DataFrame,
        spec: list[Transform],
        sort_within: list[Column] | None = None,
        manifest: dict | None = None,
    ) -> list[dict]:
        """Write df as parquet into an invisible staging dir (hidden
        partition columns derived, hive layout), then move the files under
        data/ keeping their partition subpaths. Returns file entries with
        partition values + stats for the manifest.

        ``sort_within`` (expressions over the data columns) sorts rows
        inside each task before writing — compaction passes its sort/
        z-order keys here so the clustering survives the partition
        co-location shuffle below (sorting before that shuffle would be
        undone by it).

        Declared clustering (≙ Iceberg's ``write.sort-order`` +
        ``write.distribution-mode=range`` table properties): when the
        table carries ``write.sort-order`` and no explicit sort is
        passed, every write sorts within tasks by those columns; with
        ``write.distribution-mode=range`` an UNPARTITIONED table is
        additionally range-repartitioned on them first, so each data
        file covers a disjoint value range and manifest min/max stats
        prune range scans on a NON-partition column from the first
        append on — no compaction pass needed."""
        staging = os.path.join(self._dir(name), "_staging", uuid.uuid4().hex)
        part_cols = [t.field_name for t in spec]
        data_cols = list(df.columns)  # writer schema, recorded per entry
        try:
            props = self.properties(name, manifest)
        except (FileNotFoundError, KeyError):
            props = {}
        range_dist = False
        if sort_within is None:
            order_cols = [
                c.strip()
                for c in props.get(SORT_ORDER_PROP, "").split(",")
                if c.strip() and c.strip() in data_cols
            ]
            if order_cols:
                sort_within = [F.col(c) for c in order_cols]
                range_dist = (
                    props.get(DISTRIBUTION_PROP, "") == "range"
                    and not part_cols
                )
        out = df
        for t in spec:
            if t.kind != "identity":
                out = out.withColumn(t.field_name, t.expr())
        if part_cols:
            # co-locate each partition value in one task: one file per
            # partition per append instead of one per (task x partition) —
            # the small-files guard that matters under frequent appends.
            out = out.repartition(*[F.col(c) for c in part_cols])
        elif range_dist:
            # explicit bucket count: AQE would coalesce a small range
            # shuffle into one partition and erase the file-level
            # disjointness the clustering exists for; at scale this knob
            # tracks target file size (≙ Iceberg's advisory partition
            # size under range distribution)
            n_range = int(
                props.get(RANGE_PARTITIONS_PROP, RANGE_PARTITIONS_DEFAULT)
            )
            out = out.repartitionByRange(n_range, *sort_within)
        if sort_within:
            out = out.sortWithinPartitions(
                *[F.col(c) for c in part_cols], *sort_within
            )
        writer = out.write.mode("overwrite").option("compression", "zstd")
        if part_cols:
            writer = writer.partitionBy(*part_cols)
        writer.parquet(staging)

        # bloom index config (properties of the table's main head; see
        # module-level BLOOM_* docs). On a real cluster the writing TASK
        # computes the filter inline while streaming rows out (exactly
        # what Iceberg's parquet bloom writer does); the stand-in reads
        # back ONLY the indexed columns of each staged file — a
        # column-pruned, per-file pass, same asymptotics as the stats
        # footer walk below.
        bloom_cols = [
            c.strip()
            for c in props.get(BLOOM_COLS_PROP, "").split(",")
            if c.strip()
        ]
        bloom_bits = max(
            64, int(props.get(BLOOM_BITS_PROP, BLOOM_DEFAULT_BITS)) // 8 * 8
        )
        bloom_k = int(props.get(BLOOM_HASHES_PROP, BLOOM_DEFAULT_HASHES))

        entries: list[dict] = []
        data_root = os.path.join(self._dir(name), "data")
        for root, _dirs, files in os.walk(staging):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                src = os.path.join(root, fn)
                rel = os.path.relpath(root, staging)
                # partition values from the hive path (k=v dirs)
                pvals: dict[str, Any] = {}
                if rel != ".":
                    for seg in rel.split(os.sep):
                        k, _, v = seg.partition("=")
                        pvals[k] = v
                dst_dir = os.path.join(data_root, rel) if rel != "." else data_root
                os.makedirs(dst_dir, exist_ok=True)
                dst = os.path.join(dst_dir, f"{uuid.uuid4().hex}.parquet")
                os.replace(src, dst)
                import pyarrow.parquet as pq

                md = pq.ParquetFile(dst).metadata
                entry = {
                    "path": os.path.relpath(dst, self._dir(name)),
                    "partition": pvals,
                    "records": md.num_rows,
                    "bytes": os.path.getsize(dst),
                    "stats": _collect_column_stats(md),
                    "nulls": _collect_null_counts(md),
                    # writer schema: which table columns this file
                    # physically holds — what decides initial-default
                    # resolution (absent column -> default; present
                    # column -> its values, NULLs included)
                    "cols": data_cols,
                }
                present = [
                    c for c in bloom_cols if c in md.schema.to_arrow_schema().names
                ]
                if present:
                    tbl = pq.read_table(dst, columns=present)
                    entry["bloom"] = {
                        c: {
                            "m": bloom_bits,
                            "k": bloom_k,
                            "b": _bloom_build(
                                tbl.column(c).to_pylist(), bloom_bits, bloom_k
                            ),
                        }
                        for c in present
                    }
                entries.append(entry)
        self._attach_ndv_sketches(name, entries, data_cols, props)
        import shutil

        # remove only THIS call's staging dir — concurrent writers stage
        # under sibling uuids in _staging/ at the same time
        shutil.rmtree(staging, ignore_errors=True)
        return entries

    def _attach_ndv_sketches(
        self,
        name: str,
        entries: list[dict],
        data_cols: list[str],
        props: dict,
    ) -> None:
        """Per-file mergeable NDV sketches for the columns named by the
        ``stats.ndv.columns`` table property (≙ Iceberg Puffin
        theta/HLL blobs; here Spark's native ``hll_sketch_agg`` —
        Apache DataSketches HLL_4, fixed internal hash so estimates are
        deterministic). ONE distributed job over just-written files —
        O(delta) like the footer stats walk, grouped by
        ``input_file_name`` so the sketch state stays bounded per task
        regardless of file size — then the serialized sketches ride the
        manifest entries base64-encoded (``ndv_sk``). Readers fold
        global or per-subset NDV from manifests alone via
        ``hll_union_agg`` — zero data reads (:meth:`ndv_estimates`)."""
        ndv_cols = [
            c.strip()
            for c in props.get(NDV_COLS_PROP, "").split(",")
            if c.strip() and c.strip() in data_cols
        ]
        if not ndv_cols or not entries or self.spark is None:
            return
        try:
            lgk = int(props.get(NDV_LGK_PROP, NDV_DEFAULT_LGK))
        except (TypeError, ValueError):
            lgk = NDV_DEFAULT_LGK
        paths = [os.path.join(self._dir(name), e["path"]) for e in entries]
        sk_rows = (
            self.spark.read.parquet(*paths)
            .select(F.input_file_name().alias("_f"), *ndv_cols)
            .groupBy("_f")
            .agg(
                *[
                    F.hll_sketch_agg(c, F.lit(lgk)).alias(c)
                    for c in ndv_cols
                ]
            )
            .collect()
        )
        from urllib.parse import unquote

        by_base = {os.path.basename(e["path"]): e for e in entries}
        for r in sk_rows:
            base = os.path.basename(r["_f"])
            # input_file_name() is a percent-encoded URI; managed file
            # names are uuid hex (raw match), but be robust anyway
            e = by_base.get(base) or by_base.get(unquote(base))
            if e is None:
                continue
            sk = {}
            for c in ndv_cols:
                raw = r[c]
                if raw is not None:  # all-NULL column: no sketch
                    sk[c] = base64.b64encode(bytes(raw)).decode("ascii")
            e["ndv_sk"] = sk
        # always set when profiling ran — {} means "profiled, nothing
        # found" (all-NULL or ZERO-ROW files, which produce no group
        # row), distinguishing it from an unsketched file; a None here
        # would break the table-level blob chain for every later append
        for e in entries:
            e.setdefault("ndv_sk", {})

    def _ndv_union_blob(
        self, parent_m: dict, new_entries: list[dict]
    ) -> dict | None:
        """O(delta) maintenance of the TABLE-LEVEL NDV sketch blob
        (``ndv_tbl``, ≙ Iceberg's snapshot-scoped Puffin statistics
        file): union the parent's running per-column sketch with the
        new files' sketches in one tiny job — the serve path then reads
        O(columns), flat in file count. Returns None (blob chain
        broken, readers fall back to the always-correct per-file fold)
        when any new file was written unsketched or the parent carries
        files but no blob. Per-column ``n`` counts contributing files
        so coverage stays honest for columns added to the profile
        late."""
        if self.spark is None or not new_entries:
            return None
        if any(e.get("ndv_sk") is None for e in new_entries):
            return None
        prev = parent_m.get("ndv_tbl")
        if prev is None and parent_m.get("files"):
            return None
        n_profiled = len(new_entries) + (int(prev["n"]) if prev else 0)
        rows = [
            (c, base64.b64decode(b))
            for e in new_entries
            for c, b in e["ndv_sk"].items()
        ]
        if prev:
            rows += [
                (c, base64.b64decode(b))
                for c, b in prev.get("cols", {}).items()
            ]
        if not rows:
            return {"n": n_profiled, "cols": {}}
        merged = (
            self.spark.createDataFrame(rows, "c string, sk binary")
            .groupBy("c")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .collect()
        )
        return {
            "n": n_profiled,
            "cols": {
                r["c"]: base64.b64encode(bytes(r["sk"])).decode("ascii")
                for r in merged
            },
        }

    def analyze_ndv(self, name: str, columns: list[str] | None = None) -> int:
        """≙ ``ANALYZE TABLE ... COMPUTE STATISTICS`` / Iceberg's Puffin
        stats generation: backfill NDV sketches for every live file that
        lacks them (zero-copy ``add_files`` onboarding, files written
        before the property was set) with ONE column-pruned job over
        only the missing files — O(missing), not O(table) — then
        rebuild the table-level blob from all files' sketches and
        commit. After this, both the per-file fold and the O(columns)
        serve path cover the whole table, and subsequent appends resume
        O(delta) blob maintenance on the repaired chain. ``columns``
        defaults to the ``stats.ndv.columns`` property."""
        m = self._load_manifest(name)
        props = m.get("properties") or {}
        cols = columns or [
            c.strip()
            for c in props.get(NDV_COLS_PROP, "").split(",")
            if c.strip()
        ]
        if not cols:
            raise ValueError(
                f"analyze_ndv({name!r}): no columns — pass columns= or "
                f"set the {NDV_COLS_PROP!r} table property"
            )
        try:
            lgk = int(props.get(NDV_LGK_PROP, NDV_DEFAULT_LGK))
        except (TypeError, ValueError):
            lgk = NDV_DEFAULT_LGK
        missing = [e for e in m["files"] if e.get("ndv_sk") is None]
        # sketch map keyed by entry PATH, applied to entry COPIES below:
        # manifest entries are shared by reference with the immutable
        # segment cache, and _plan_segments reuses unchanged segments by
        # identity — mutating a cached entry in place would never reach
        # disk (the backfill would evaporate on cache eviction/restart)
        new_sk: dict[str, dict] = {e["path"]: {} for e in missing}
        if missing:
            self._require_unique_basenames(name, m, "analyze_ndv")
            by_base: dict[str, str] = {}
            for e in missing:
                p = (
                    e["path"]
                    if os.path.isabs(e["path"])
                    else os.path.join(self._dir(name), e["path"])
                )
                by_base[os.path.basename(p)] = e["path"]
            paths = [
                e["path"]
                if os.path.isabs(e["path"])
                else os.path.join(self._dir(name), e["path"])
                for e in missing
            ]
            # files may physically lack some profiled columns (external
            # onboarding, pre-evolution writes): sketch only what each
            # file carries; absent columns contribute nothing, exactly
            # like all-NULL ones. Zero-row files produce no group row
            # and keep their pre-seeded {} ("profiled, nothing found").
            sk_rows = (
                self.spark.read.schema(self.schema(name, m))
                .parquet(*paths)
                .select(F.input_file_name().alias("_f"), *cols)
                .groupBy("_f")
                .agg(
                    *[
                        F.hll_sketch_agg(c, F.lit(lgk)).alias(c)
                        for c in cols
                    ]
                )
                .collect()
            )
            from urllib.parse import unquote

            for r in sk_rows:
                base = os.path.basename(r["_f"])
                # input_file_name() returns a percent-encoded URI: try
                # the raw basename first (uuid-named managed files),
                # then the decoded form (external files with specials)
                path = by_base.get(base) or by_base.get(unquote(base))
                if path is None:
                    continue
                new_sk[path] = {
                    c: base64.b64encode(bytes(r[c])).decode("ascii")
                    for c in cols
                    if r[c] is not None
                }

        def apply_and_blob(manifest: dict) -> dict:
            out = dict(manifest)
            out["files"] = [
                {**e, "ndv_sk": new_sk[e["path"]]}
                if e.get("ndv_sk") is None and e["path"] in new_sk
                else e
                for e in manifest["files"]
            ]
            out["ndv_tbl"] = self._ndv_blob_of(out["files"])
            out["operation"] = "analyze-ndv"
            out["parent"] = manifest["version"]
            return out

        return self._commit(
            name, apply_and_blob(m), rebase=apply_and_blob, keep_ndv=True
        )

    def _ndv_blob_of(self, files: list[dict]) -> dict:
        """Union ALL files' sketches into the table-level blob shape
        ({col: {sk, n}}) with one tiny job — the O(files) rebuild
        analyze_ndv pays once and the O(delta) append maintenance
        avoids."""
        rows = [
            (c, base64.b64decode(b))
            for e in files
            for c, b in (e.get("ndv_sk") or {}).items()
        ]
        n_profiled = sum(1 for e in files if e.get("ndv_sk") is not None)
        if not rows:
            return {"n": n_profiled, "cols": {}}
        merged = (
            self.spark.createDataFrame(rows, "c string, sk binary")
            .groupBy("c")
            .agg(F.hll_union_agg("sk").alias("sk"))
            .collect()
        )
        return {
            "n": n_profiled,
            "cols": {
                r["c"]: base64.b64encode(bytes(r["sk"])).decode("ascii")
                for r in merged
            },
        }

    def ndv_estimates(self, name: str, version: int | None = None):
        """Fold per-file NDV sketches into global estimates — a
        manifest-only read (O(files) sketch rows through one tiny
        ``hll_union_agg`` job, zero data files opened; ≙ reading
        Iceberg's Puffin ndv stats instead of scanning). Returns a
        DataFrame (col_name, ndv_est, n_sketches): ``n_sketches`` is
        how many files carried a sketch for the column, so callers can
        detect partial coverage (files onboarded via add_files have no
        sketches) instead of trusting an under-counted fold.

        Serve path: when the manifest carries the maintained
        table-level blob (``ndv_tbl``, kept O(delta) by append commits
        and dropped by any other file-changing op), the estimate reads
        O(columns) — FLAT in file count; otherwise it folds the
        per-file sketches, O(files)."""
        m = self._load_manifest(name, version)
        blob = m.get("ndv_tbl")
        if blob is not None:
            if not blob.get("cols"):
                return self.spark.createDataFrame(
                    [],
                    "col_name string, ndv_est bigint, n_sketches bigint",
                )
            brows = [
                (c, base64.b64decode(b), int(blob["n"]))
                for c, b in sorted(blob["cols"].items())
            ]
            return self.spark.createDataFrame(
                brows, "col_name string, sk binary, n_sketches bigint"
            ).select(
                "col_name",
                F.hll_sketch_estimate("sk").cast("bigint").alias("ndv_est"),
                "n_sketches",
            )
        rows = [
            (c, base64.b64decode(b64))
            for e in m["files"]
            for c, b64 in (e.get("ndv_sk") or {}).items()
        ]
        if not rows:
            return self.spark.createDataFrame(
                [], "col_name string, ndv_est bigint, n_sketches bigint"
            )
        # coverage counts PROFILED files (ndv_sk present, possibly {}):
        # a zero-row or all-NULL file is covered — it has no values to
        # count — while a file onboarded sketch-less is genuinely not
        n_profiled = sum(
            1 for e in m["files"] if e.get("ndv_sk") is not None
        )
        return (
            self.spark.createDataFrame(rows, "col_name string, sk binary")
            .groupBy("col_name")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk"))
                .cast("bigint")
                .alias("ndv_est"),
            )
            .withColumn("n_sketches", F.lit(n_profiled).cast("bigint"))
        )

    def _enforce_constraints(
        self, name: str, df: DataFrame, manifest: dict | None = None
    ) -> None:
        """Reject the batch if any ``constraints.check.*`` property is not
        TRUE for every row (null-hostile on purpose: a data-quality gate
        that lets NULL slide is not a gate). One pass, map-side partial
        counts, raises :class:`ConstraintViolation` with per-check
        violation counts; the caller has staged nothing yet, so rejection
        leaves no snapshot and no orphan files."""
        try:
            props = self.properties(name, manifest)
        except (FileNotFoundError, KeyError):
            return
        checks = {
            k[len(CONSTRAINT_PROP_PREFIX):]: v
            for k, v in props.items()
            if k.startswith(CONSTRAINT_PROP_PREFIX)
        }
        if not checks:
            return
        counts = df.select(
            *[
                F.sum(
                    F.when(F.expr(expr), F.lit(0)).otherwise(F.lit(1))
                ).alias(cname)
                for cname, expr in checks.items()
            ]
        ).first()
        bad = {c: counts[c] for c in checks if counts[c]}
        if bad:
            detail = ", ".join(
                f"{c!r} ({checks[c]}): {n} row(s)" for c, n in sorted(bad.items())
            )
            raise ConstraintViolation(
                f"ingest into {name!r} rejected — check constraint(s) "
                f"violated: {detail}"
            )

    def _merge_schema(self, name: str, df: DataFrame) -> None:
        """Auto-evolve the table so the incoming batch fits (≙ Iceberg's
        ``write.spark.accept-any-schema`` + Spark's ``mergeSchema`` write
        option): unseen top-level columns are ADDED (nullable, metadata-
        only), and an incoming column whose type is a widening promotion
        of the table's (int→bigint, float→double) WIDENS it. Everything
        else — drops, renames, narrowing, nested restructures — still
        requires explicit DDL: silent destructive evolution is how
        pipelines eat their own schemas."""
        types = {
            f.name: f.dataType.typeName() for f in self.schema(name).fields
        }
        for f in df.schema.fields:
            if f.name not in types:
                self.add_column(name, f.name, f.dataType.simpleString())
            elif (types[f.name], f.dataType.typeName()) in self._WIDENINGS:
                self.widen_column(name, f.name, f.dataType.typeName())

    def append(
        self,
        name: str,
        df: DataFrame,
        ref: str = "main",
        merge_schema: bool = False,
        snapshot_properties: dict[str, str] | None = None,
    ) -> int:
        """Atomic multi-file append: all files of this call become visible
        in ONE commit (reference #20/#21: the whole parallel bulk load lands
        as a single snapshot). ``ref`` targets a branch — the
        write-audit-publish staging path: append to an audit branch,
        validate it, then :meth:`fast_forward` main.

        Default schema discipline: the batch is aligned to the TABLE
        schema (extra df columns dropped, missing ones NULL).
        ``merge_schema=True`` first auto-evolves the table to fit the
        batch (see :meth:`_merge_schema`), so new columns land instead
        of being dropped.

        ``snapshot_properties`` merge into the committed manifest's
        properties ATOMICALLY with the data (rebase-safe) — the
        snapshot-summary-property shape streaming sinks use to carry an
        epoch marker inside the very commit it marks (a separate
        set-properties commit would leave a crash window where the data
        landed unmarked and a replay duplicates it).

        Auto-maintenance: with the ``write.compact-threshold`` table
        property set (an int), an append that leaves any partition's
        file count at/over the threshold triggers
        :meth:`compact_partitions` inline (min_files = threshold) — the
        count check is metadata-only, so streaming micro-appends
        (foreachBatch → append) self-heal their fragmentation without
        an external scheduler, and untouched partitions keep file
        identity (≙ Iceberg's commit-triggered table maintenance,
        the data-file twin of ``write.delete.compact-threshold``)."""
        if merge_schema:
            self._merge_schema(name, df)
        _seq, head = self._ref_head(name, ref)
        if head < 0:
            raise ValueError(f"branch {ref!r} does not exist on {name!r}")
        m = self._load_manifest(name, head)
        spec = self._spec(m)
        # one manifest load serves the whole append (schema, constraints,
        # write properties, threshold check): metadata cost per streaming
        # micro-append is O(1) manifest materializations, not four.
        # Schema stays TABLE-level (main's head) as in Iceberg — only a
        # main-branch append can reuse m for it.
        schema_cols = [
            f.name
            for f in self.schema(name, m if ref == "main" else None).fields
        ]
        aligned = df.select(
            *[
                F.col(c) if c in df.columns else F.lit(None).alias(c)
                for c in schema_cols
            ]
        )
        props_m = m if ref == "main" else None  # properties are table-level
        self._enforce_constraints(name, aligned, props_m)
        new_files = self._write_files(name, aligned, spec, manifest=props_m)
        ndv_blob = self._ndv_union_blob(m, new_files)
        m["files"] = m["files"] + new_files
        m["operation"] = "append"
        m["parent"] = m["version"]
        if ndv_blob is not None:
            m["ndv_tbl"] = ndv_blob
        else:  # unsketched batch: an inherited blob would under-count
            m.pop("ndv_tbl", None)
        if snapshot_properties:
            m["properties"] = {
                **(m.get("properties") or {}),
                **snapshot_properties,
            }

        def rebase(cur_m: dict) -> dict:
            # lost-update protection: re-stage OUR files on the advanced
            # base (the concurrent winner's files are in cur_m already)
            out = dict(cur_m)
            out["files"] = cur_m["files"] + new_files
            out["operation"] = "append"
            out["parent"] = cur_m["version"]
            blob = self._ndv_union_blob(cur_m, new_files)
            if blob is not None:
                out["ndv_tbl"] = blob
            else:
                out.pop("ndv_tbl", None)
            if snapshot_properties:
                out["properties"] = {
                    **(cur_m.get("properties") or {}),
                    **snapshot_properties,
                }
            return out

        v = self._commit(name, m, rebase=rebase, ref=ref, keep_ndv=True)
        # threshold + counts from the manifest already in hand — the
        # hot append path pays no extra manifest load; compact_partitions
        # re-derives against the true head if the trigger fires (a
        # rebased concurrent append can only make counts HIGHER, and the
        # loser's own trigger covers that commit)
        # defensive parse: an unparsable property value must never fail
        # the append AFTER its commit already landed — maintenance is
        # opt-in metadata, not a correctness surface
        try:
            thresh = int(m.get("properties", {}).get(COMPACT_THRESHOLD_PROP, 0))
        except (TypeError, ValueError):
            thresh = 0
        if thresh > 0 and ref == "main" and self.spark is not None:
            counts: dict[tuple, int] = {}
            for e in m["files"]:
                k = tuple(sorted(e["partition"].items()))
                counts[k] = counts.get(k, 0) + 1
            if any(c >= thresh for c in counts.values()):
                try:
                    # adopt the compaction COMMIT's version only if it
                    # actually rewrote: the no-op path (a concurrent
                    # compaction already defragmented) returns the head
                    # it examined, which can be a FOREIGN commit's id —
                    # callers pin the returned version for tags/time
                    # travel, so it must be a snapshot this call made
                    res = self.compact_partitions(name, min_files=thresh)
                    if res.get("rewritten"):
                        v = res["version"]
                except CompactionConflict:
                    # two concurrent appends both crossed the threshold
                    # and raced their compactions: the loser's rewrite
                    # aborts (files it planned were already rewritten).
                    # Maintenance is best-effort — the append itself
                    # committed, and the winner's compaction (or the
                    # next append's trigger) covers the fragmentation.
                    # ONLY this race is swallowed: genuine failures (and
                    # txn-repair conflicts surfacing through the head
                    # reads) still propagate.
                    pass
        return v

    def add_files(
        self,
        name: str,
        paths: list[str],
        partition_values: dict[str, Any] | None = None,
        ref: str = "main",
    ) -> int:
        """Zero-copy onboarding of EXISTING parquet files (≙ Iceberg's
        ``add_files`` procedure / ``migrate``): register the files in one
        atomic commit without reading or rewriting a single data row —
        only footers are opened, yielding the same manifest metadata a
        written file gets (row counts, per-column min/max, null counts),
        so stats/partition pruning works on registered files from the
        first scan. This is how 100 TB of raw hive parquet becomes a
        managed table in seconds instead of a full rewrite.

        The files stay where they are: entries carry ABSOLUTE paths and
        an ``external`` marker, and :meth:`expire_snapshots` never
        deletes data the table doesn't own (delete files later attached
        to them are still owned and reaped normally). Bloom indexes are
        not built (that would need a data pass — the zero-copy point);
        stats pruning still applies.

        Partition values for pruning: hive-style ``col=value`` path
        segments matching IDENTITY partition fields are parsed per file
        — scoped to segments BELOW a passed directory root, or to the
        trailing contiguous ``col=value`` chain above a directly-passed
        file (ancestor directories that merely look like ``col=value``
        never inject values);
        ``partition_values`` overrides/supplies values for all files.
        Identity fields with no value from either source raise (pruning
        would silently degrade); non-identity (derived) transform fields
        must come via ``partition_values`` if at all — absent values
        only cost pruning, never correctness, since scan predicates are
        always re-applied row-level as residuals. Schema discipline:
        each file must share at least one column with the table schema;
        absent table columns resolve exactly like evolved-away columns
        (NULL / initial-default), extra file columns are ignored by the
        explicit read schema.
        """
        import pyarrow.parquet as pq

        _seq, head = self._ref_head(name, ref)
        if head < 0:
            raise ValueError(f"branch {ref!r} does not exist on {name!r}")
        m = self._load_manifest(name, head)
        spec = self._spec(m)
        ident = {t.field_name for t in spec if t.kind == "identity"}
        # always the BRANCH-HEAD manifest's schema — for a non-main ref
        # whose schema diverged from main, validating file columns
        # against main's schema would accept/reject the wrong columns
        schema_cols = {f.name for f in self.schema(name, m).fields}
        # directories expand to their parquet files recursively (the
        # hive-layout onboarding shape: pass the dataset root, partition
        # values parse from each file's own col=value segments).
        # Partition parsing is SCOPED to what the caller passed: for a
        # directory, only segments BELOW that root; for a directly-passed
        # file, only the trailing contiguous col=value chain above it —
        # an ancestor directory that merely happens to be named
        # col=value (e.g. /data/env=prod/...) must never inject a
        # partition value, or manifest pruning silently drops rows.
        flat: list[tuple[str, list[str]]] = []
        for p in paths:
            ap = os.path.abspath(p)
            if os.path.isdir(ap):
                for root, _dirs, fns in sorted(os.walk(ap)):
                    rel = os.path.relpath(root, ap)
                    segs = [] if rel == "." else rel.split(os.sep)
                    flat.extend(
                        (os.path.join(root, fn), segs)
                        for fn in sorted(fns)
                        if fn.endswith(".parquet")
                    )
            else:
                chain: list[str] = []
                for seg in reversed(os.path.dirname(ap).split(os.sep)):
                    k, eq, _v = seg.partition("=")
                    if eq and k:
                        chain.append(seg)
                    else:
                        break
                flat.append((ap, list(reversed(chain))))
        if not flat:
            raise ValueError(f"add_files: no parquet files under {paths!r}")
        # duplicate guard (Iceberg add_files' check_duplicate_files):
        # re-registering a path would double every row on read.
        # Basename COLLISIONS are allowed — Spark's partitionBy reuses
        # one task file name across partition dirs, so hive datasets
        # collide routinely — but the row-level MoR machinery keys rows
        # by basename (_file_name), so ITS entry points refuse tables
        # with colliding basenames (_require_unique_basenames; compact()
        # rewrites externals into uuid names and clears the state)
        known_paths = {e["path"] for e in m["files"]}
        for ap, _segs in flat:
            if ap in known_paths:
                raise ValueError(f"add_files: {ap} is already registered")
            known_paths.add(ap)
        entries: list[dict] = []
        for ap, psegs in flat:
            md = pq.ParquetFile(ap).metadata
            fcols = [
                c for c in md.schema.to_arrow_schema().names if c in schema_cols
            ]
            if not fcols:
                raise ValueError(
                    f"{ap}: no column overlaps the table schema"
                )
            pvals: dict[str, Any] = {}
            for seg in psegs:
                k, eq, v = seg.partition("=")
                if eq and k in ident:
                    # hive escaping: writers percent-encode specials and
                    # spell NULL as __HIVE_DEFAULT_PARTITION__; the raw
                    # token would round-trip corrupted (and the null
                    # marker would defeat the missing-value error below)
                    if v == "__HIVE_DEFAULT_PARTITION__":
                        continue
                    from urllib.parse import unquote

                    pvals[k] = unquote(v)
            if partition_values:
                pvals.update(partition_values)
            missing = ident - set(pvals)
            if missing:
                raise ValueError(
                    f"{ap}: no partition value for identity field(s) "
                    f"{sorted(missing)} — pass partition_values or use a "
                    f"hive col=value layout"
                )
            # NORMALIZE to strings — the invariant every managed write
            # establishes (partition values come from hive path
            # segments): a raw int passed via partition_values would
            # otherwise never compare equal to the managed side's
            # string, so dynamic partition overwrite / merge partition
            # selection would silently MISS the external entry and
            # duplicate its rows (caught by test_segment_model's
            # add_files -> overwrite sequence). Rendering follows
            # Spark's hive writer: booleans lowercase, datetimes
            # isoformat with a space; pass exotic types (floats with
            # scientific rendering) as pre-rendered STRINGS if exact
            # partition matching against managed writes matters.
            def _hive_val(v: Any):
                import datetime as _dt

                if v is None or isinstance(v, str):
                    return v
                if isinstance(v, bool):
                    return "true" if v else "false"
                if isinstance(v, _dt.datetime):
                    return v.isoformat(sep=" ")
                return str(v)

            pvals = {
                k: _hive_val(v)
                for k, v in pvals.items()
                if k in {t.field_name for t in spec}
            }
            entries.append(
                {
                    "path": ap,
                    "partition": pvals,
                    "records": md.num_rows,
                    "bytes": os.path.getsize(ap),
                    "stats": _collect_column_stats(md),
                    "nulls": _collect_null_counts(md),
                    "cols": fcols,
                    "external": True,
                }
            )
        m["files"] = m["files"] + entries
        m["operation"] = "add-files"
        m["parent"] = m["version"]

        def rebase(cur_m: dict) -> dict:
            out = dict(cur_m)
            out["files"] = cur_m["files"] + entries
            out["operation"] = "add-files"
            out["parent"] = cur_m["version"]
            return out

        return self._commit(name, m, rebase=rebase, ref=ref)

    # ------------------------------------------------- multi-table commits
    def _txns_dir(self) -> str:
        return os.path.join(self.warehouse, "_txns")

    def _txn_marker(self, seq: str, idx: int, table: str) -> str:
        # per-ENTRY granularity: one transaction may stage several ops
        # against the same table (append + upsert), each needing its own
        # applied-marker — a per-table marker would skip the second op
        return os.path.join(self._txns_dir(), f"{seq}.done.{idx}.{table}")

    def transaction(self) -> "Transaction":
        """Open a multi-table transaction (≙ Iceberg catalog multi-table
        transactions; the single-table :meth:`_commit` CAS is the
        degenerate case): stage appends, upserts, and schema DDL
        (add/widen — see :class:`Transaction`) on ANY number of tables, then
        land them with ONE atomic publish — fact and dims together or
        not at all, the backfill-consistency shape.

        Protocol (all-or-nothing visibility on a plain filesystem):

        1. ``stage``: each :meth:`Transaction.append` writes its data
           files immediately (parallel, expensive part) but advances no
           head — invisible, crash leaves only orphans.
        2. ``publish``: ONE exclusive-create of a txn record listing
           every (table, ref, added-files) — this is the commit point.
        3. ``apply``: per-table head CAS advances, idempotent.

        A crash between publish and apply cannot expose partial state:
        every head resolution (:meth:`_ref_head`) first rolls forward
        published-but-unapplied transactions for that table, so readers
        either see no effect (pre-publish) or, on first contact with ANY
        involved table, that table's full txn effect. Applies are
        idempotent (a table whose head already contains the staged files
        is skipped; per-table done-markers short-circuit), so concurrent
        repairers and the committing writer never double-append.

        Conflict semantics: if a :class:`TxnConflictError` aborts the
        apply (a foreign DDL invalidated a staged entry in the
        publish→apply window), member-table entries applied BEFORE the
        conflicting one stay applied — the record is aborted, not
        compensated. "Together or not at all" therefore holds against
        crashes (roll-forward repair) but not against concurrent
        conflicting DDL; callers needing atomicity under concurrent DDL
        must serialize schema changes with transactions externally."""
        return Transaction(self)

    def _publish_txn(self, entries: list[dict]) -> str:
        """Exclusive-create the txn record — the single commit point."""
        os.makedirs(self._txns_dir(), exist_ok=True)
        payload = json.dumps({"entries": entries}, sort_keys=True)
        while True:
            # allocate over EVERY txn-* name, dotted artifacts included:
            # a fully-applied txn prunes its pending record but leaves
            # <seq>.applied and markers behind — counting only pending
            # records would REUSE the pruned seq, silently aliasing the
            # new txn onto the old one's applied record (and from there,
            # rollback_transaction onto the wrong tables)
            used = [0]
            for fn in os.listdir(self._txns_dir()):
                if fn.startswith("txn-"):
                    digits = fn[4:].split(".", 1)[0]
                    if digits.isdigit():
                        used.append(int(digits))
            seq = f"txn-{max(used) + 1:09d}"
            if self._link_pointer(
                os.path.join(self._txns_dir(), seq), payload
            ):
                return seq

    def _apply_txn(self, seq: str, record: dict) -> dict[str, int]:
        """Idempotently roll a published txn forward on every table it
        touches; returns {table: head version after apply}."""
        prev, self._in_txn_repair = self._in_txn_repair, True
        try:
            out: dict[str, int] = {}
            for idx, entry in enumerate(record["entries"]):
                name, ref = entry["table"], entry.get("ref", "main")
                added = entry.get("added", [])
                marker = self._txn_marker(seq, idx, name)
                if not os.path.exists(marker):
                    if entry.get("op") == "upsert":
                        self._apply_upsert(
                            name, ref, {**entry, "txn": seq}
                        )
                    elif entry.get("op") == "rollback":
                        # txn-scoped rollback: CAS the head to a rollback
                        # manifest of the pre-txn snapshot's file set.
                        # Idempotent via the head's own txn stamp, so a
                        # crashed rollback replays cleanly.
                        import time as _time

                        while True:
                            seq_head, cur = self._ref_head(name, ref)
                            cm = self._load_manifest(name, cur)
                            if (
                                cm.get("txn") == seq
                                and cm["operation"] == "rollback"
                            ):
                                break  # a concurrent repairer applied it
                            # re-validate INSIDE the CAS loop: the head
                            # must still belong to the txn being undone
                            # (rollback_transaction's pre-publish guard
                            # has a TOCTOU window — a foreign commit
                            # landing between guard and CAS, or between
                            # a crash after _publish_txn and a repair
                            # replay, must abort the rollback, never be
                            # clobbered by it). The exclusive-create CAS
                            # on seq_head+1 makes this airtight: if our
                            # link wins, nothing landed after the check.
                            undoes = entry.get("undoes")
                            if (
                                undoes is not None
                                and cm.get("txn") != undoes
                            ):
                                self._abort_txn(seq, record)
                                raise RollbackConflictError(
                                    f"table {name!r} advanced past "
                                    f"transaction {undoes!r} while the "
                                    f"rollback was in flight (head txn "
                                    f"is {cm.get('txn')!r}); rollback "
                                    f"{seq!r} aborted"
                                )
                            nm = dict(self._load_manifest(name, entry["to"]))
                            nm.pop("txn_entry", None)
                            nm["operation"] = "rollback"
                            nm["parent"] = cur
                            nm["txn"] = seq
                            nm["committed_at"] = _time.time()
                            version = self._alloc_version(name, nm)
                            if self._link_pointer(
                                os.path.join(
                                    self._heads_dir(name, ref),
                                    f"seq-{seq_head + 1:09d}",
                                ),
                                str(version),
                            ):
                                break
                    elif entry.get("op") == "ddl":
                        # schema DDL staged inside the transaction: apply
                        # against the CURRENT head's schema (rebase-safe
                        # over foreign appends, which never change the
                        # schema). Idempotence: the committed manifest is
                        # stamped with (txn, txn_entry); a repairer walks
                        # the txn-stamped ancestry for this entry index.
                        import time as _time

                        while True:
                            seq_head, cur = self._ref_head(name, ref)
                            # FULL-ancestry idempotence scan for this
                            # entry's (txn, txn_entry) stamp — not just
                            # the txn-stamped head prefix: a crash after
                            # the DDL's head CAS but before its marker
                            # write, followed by a foreign commit on
                            # top, leaves the applied DDL below a
                            # foreign manifest. The scan must run BEFORE
                            # re-applying, not only in the conflict
                            # handler: a no-op re-apply (e.g. widen to a
                            # type already in place) raises nothing, so
                            # an error-path-only scan would re-commit a
                            # duplicate entry stamp whose later rollback
                            # resolves pre_txn to the foreign head.
                            applied, v = False, cur
                            while v is not None:
                                try:
                                    # metadata-only walk: raw manifest
                                    # (txn/txn_entry/parent), never the
                                    # materialized inventory — a deep
                                    # ancestry scan must stay O(history),
                                    # not O(history x files)
                                    mm = self._manifest_raw(name, v)
                                except FileNotFoundError:
                                    # expired history: dangling parent
                                    # pointer — stop the walk (never
                                    # crash-loop repair)
                                    break
                                if (
                                    mm.get("txn") == seq
                                    and mm.get("txn_entry") == idx
                                ):
                                    applied = True
                                    break
                                v = mm.get("parent")
                            if applied:
                                break
                            cm = self._load_manifest(name, cur)
                            nm = dict(cm)
                            try:
                                nm["schema"] = _apply_schema_ddl(
                                    cm["schema"], entry
                                )
                            except ValueError as exc:
                                # the full scan above already proved this
                                # entry never applied — a foreign DDL
                                # invalidated it in the publish->apply
                                # window: abort the record instead of
                                # poisoning repair
                                self._abort_txn(seq, record)
                                raise TxnConflictError(
                                    f"table {name!r}: staged DDL no "
                                    f"longer applies ({exc}); txn {seq!r} "
                                    "aborted"
                                ) from exc
                            nm["operation"] = entry["kind"]
                            nm["parent"] = cur
                            nm["txn"] = seq
                            nm["txn_entry"] = idx
                            nm["committed_at"] = _time.time()
                            version = self._alloc_version(name, nm)
                            if self._link_pointer(
                                os.path.join(
                                    self._heads_dir(name, ref),
                                    f"seq-{seq_head + 1:09d}",
                                ),
                                str(version),
                            ):
                                break
                    else:
                        added_paths = {e["path"] for e in added}
                        while True:
                            seq_head, cur = self._ref_head(name, ref)
                            m = self._load_manifest(name, cur)
                            if added_paths <= {
                                e["path"] for e in m["files"]
                            }:
                                break  # a concurrent repairer applied it
                            nm = dict(m)
                            # never inherit the parent's entry stamp: it
                            # would false-positive a later DDL entry's
                            # idempotence walk
                            nm.pop("txn_entry", None)
                            # files changed without blob maintenance:
                            # an inherited NDV blob would serve stale
                            nm.pop("ndv_tbl", None)
                            nm["files"] = m["files"] + added
                            nm["operation"] = "txn-append"
                            nm["parent"] = cur
                            nm["txn"] = seq
                            import time as _time

                            # fresh commit instant — inheriting the
                            # parent's would corrupt TIMESTAMP AS OF
                            nm["committed_at"] = _time.time()
                            version = self._alloc_version(name, nm)
                            if self._link_pointer(
                                os.path.join(
                                    self._heads_dir(name, ref),
                                    f"seq-{seq_head + 1:09d}",
                                ),
                                str(version),
                            ):
                                break
                    self._link_pointer(marker, "done")
                out[name] = self._ref_head(name, ref)[1]
            # durable applied-record (name contains "." so pending-repair
            # scans skip it): what rollback_transaction resolves a txn id
            # against after the live record below is pruned
            self._link_pointer(
                os.path.join(self._txns_dir(), f"{seq}.applied"),
                json.dumps(record, sort_keys=True),
            )
            # fully applied: prune the record + markers (pending scans on
            # every head resolution stay O(outstanding), not O(history))
            for idx, entry in enumerate(record["entries"]):
                try:
                    os.remove(self._txn_marker(seq, idx, entry["table"]))
                except FileNotFoundError:
                    pass
            try:
                os.remove(os.path.join(self._txns_dir(), seq))
            except FileNotFoundError:
                pass
            self._gc_applied_txns()
            return out
        finally:
            self._in_txn_repair = prev

    def _gc_applied_txns(self) -> None:
        """Keep only the newest ``TXN_APPLIED_KEEP`` ``<seq>.applied``
        records so the txns dir (listed by every ``_publish_txn``
        allocation) stays O(KEEP + outstanding) instead of growing one
        file per all-time transaction. Deleting ``s.applied`` requires
        KEEP newer applied records to be present in the dir, so the
        allocation max never regresses below a used seq. A rollback of a
        GC'd transaction fails with the existing 'no applied record'
        error — rollbacks target recent txns by design."""
        d = self._txns_dir()
        try:
            applied = sorted(
                fn for fn in os.listdir(d) if fn.endswith(".applied")
            )
        except FileNotFoundError:
            return
        for fn in applied[: max(0, len(applied) - TXN_APPLIED_KEEP)]:
            try:
                os.remove(os.path.join(d, fn))
            except FileNotFoundError:
                pass
        aborted = sorted(
            fn for fn in os.listdir(d) if fn.endswith(".aborted")
        )
        for fn in aborted[: max(0, len(aborted) - TXN_APPLIED_KEEP)]:
            try:
                os.remove(os.path.join(d, fn))
            except FileNotFoundError:
                pass

    def _abort_txn(self, seq: str, record: dict) -> None:
        """Consume a published-but-unappliable txn record (rollback
        conflict): prune the live record + markers and leave a durable
        ``<seq>.aborted`` tombstone, so crash repair never replays it
        and the abort is diagnosable after the fact."""
        self._link_pointer(
            os.path.join(self._txns_dir(), f"{seq}.aborted"),
            json.dumps(record, sort_keys=True),
        )
        for idx, entry in enumerate(record["entries"]):
            try:
                os.remove(self._txn_marker(seq, idx, entry["table"]))
            except FileNotFoundError:
                pass
        try:
            os.remove(os.path.join(self._txns_dir(), seq))
        except FileNotFoundError:
            pass

    def rollback_transaction(self, txn_id: str) -> dict[str, int]:
        """Catalog-level undo of an APPLIED multi-table transaction: roll
        every member table back to its pre-txn head — all of them or none
        (≙ what Iceberg's per-table ``rollback_to_snapshot`` cannot give a
        multi-table commit). The rollback is itself a transaction: ONE
        exclusive-create of a rollback txn record is the commit point,
        then idempotent per-table head CASes with the same crash repair
        as forward applies (a reader touching any member table rolls the
        whole rollback forward — crash-injection pytest in
        tests/test_table_manager.py).

        Safety: refuses if any member table's head has advanced past the
        transaction's snapshots (rolling back would silently drop the
        later commits). Returns {table: head version after rollback}.

        Conflict semantics: the pre-publish guard re-validates inside
        each table's CAS loop; if a foreign commit slips in mid-apply a
        :class:`RollbackConflictError` aborts the record with member
        tables rolled back BEFORE the conflict left rolled back — abort,
        not compensation (mirror of :meth:`transaction`'s conflict
        contract). Crash-interruption, by contrast, is fully repaired:
        roll-forward on next contact completes ALL member rollbacks."""
        ap = os.path.join(self._txns_dir(), f"{txn_id}.applied")
        try:
            with open(ap) as f:
                record = json.loads(f.read())
        except FileNotFoundError:
            raise ValueError(
                f"transaction {txn_id!r} has no applied record (not "
                "committed, or already rolled back)"
            ) from None
        entries: list[dict] = []
        seen: set[tuple[str, str]] = set()
        for e in record["entries"]:
            name, ref = e["table"], e.get("ref", "main")
            if (name, ref) in seen:
                continue  # one rollback per table covers all its entries
            seen.add((name, ref))
            _seq, head = self._ref_head(name, ref)
            # walk the ancestry: the head must still be a snapshot of
            # THIS txn (possibly the last of several); the parent of the
            # txn's earliest snapshot is the pre-txn state
            v: int | None = head
            m = self._load_manifest(name, v)
            if m.get("txn") != txn_id:
                raise ValueError(
                    f"table {name!r} advanced past transaction {txn_id!r} "
                    f"(head {head} is not a txn snapshot); rolling back "
                    "would drop later commits"
                )
            while v is not None:
                m = self._load_manifest(name, v)
                if m.get("txn") != txn_id:
                    break
                pre_txn, v = m.get("parent"), m.get("parent")
            if pre_txn is None:
                # the txn spans the table's first snapshot: there is no
                # pre-txn state to restore, and passing None into
                # _load_manifest would resolve to the CURRENT head,
                # silently making the rollback a no-op of itself
                raise ValueError(
                    f"transaction {txn_id!r} created table {name!r}'s "
                    "first snapshot; there is no pre-transaction state "
                    "to roll back to (drop the table instead)"
                )
            entries.append(
                {
                    "table": name,
                    "ref": ref,
                    "op": "rollback",
                    "to": pre_txn,
                    # _apply_txn re-validates the head against this id
                    # inside its CAS loop — closes the guard→CAS TOCTOU
                    "undoes": txn_id,
                }
            )
        seq = self._publish_txn(entries)
        out = self._apply_txn(seq, {"entries": entries})
        # consume the applied record: a second rollback of the same txn
        # is an error, not a no-op re-roll
        try:
            os.remove(ap)
        except FileNotFoundError:
            pass
        return out

    def _repair_txns(self, name: str) -> None:
        """Roll forward any published-but-unapplied transaction touching
        ``name`` (and, transitively, every table in those records —
        repair is per-record, keeping the all-or-nothing story)."""
        d = self._txns_dir()
        try:
            records = sorted(
                fn
                for fn in os.listdir(d)
                if fn.startswith("txn-") and "." not in fn[4:]
            )
        except FileNotFoundError:
            return
        for seq in records:
            try:
                with open(os.path.join(d, seq)) as f:
                    record = json.loads(f.read())
            except (FileNotFoundError, json.JSONDecodeError):
                continue  # pruned (fully applied) by a concurrent repairer
            if any(e["table"] == name for e in record["entries"]):
                try:
                    self._apply_txn(seq, record)
                except TxnConflictError:
                    # the record is already aborted (tombstoned + pruned)
                    # by _apply_txn; a reader doing crash repair must not
                    # fail head resolution over someone else's dead
                    # record — only the direct committing caller raises
                    continue

    def overwrite_partitions(
        self, name: str, df: DataFrame, ref: str = "main"
    ) -> int:
        """Dynamic partition overwrite (≙ Iceberg's dynamic ``overwrite``
        / Spark ``partitionOverwriteMode=dynamic``): atomically replace
        EXACTLY the partitions the new data touches; every other
        partition keeps its files untouched. The idempotent-backfill
        primitive — re-running a day's job replaces that day, never
        truncates the table.

        Concurrency: rebases over commits that only touched OTHER
        partitions; a concurrent commit that added files into a partition
        being replaced aborts (its rows would be silently dropped —
        Iceberg's validation semantics).

        ``ref`` targets a branch — the write-audit-publish staging shape
        for backfills: overwrite on the audit branch, diff it against
        main (:meth:`diff_refs`), then :meth:`fast_forward`."""
        _seq, head = self._ref_head(name, ref)
        if head < 0:
            raise ValueError(f"branch {ref!r} does not exist on {name!r}")
        m = self._load_manifest(name, head)
        spec = self._spec(m)
        if not spec:
            raise ValueError(
                "dynamic partition overwrite needs a partitioned table "
                "(use overwrite for full replacement)"
            )
        schema_cols = [f.name for f in self.schema(name).fields]
        aligned = df.select(
            *[
                F.col(c) if c in df.columns else F.lit(None).alias(c)
                for c in schema_cols
            ]
        )
        self._enforce_constraints(name, aligned)
        new_files = self._write_files(name, aligned, spec)
        touched = {tuple(sorted(e["partition"].items())) for e in new_files}
        base_files_in_touched = {
            e["path"]
            for e in m["files"]
            if tuple(sorted(e["partition"].items())) in touched
        }

        def apply(base: dict) -> dict:
            for e in base["files"]:
                if (
                    tuple(sorted(e["partition"].items())) in touched
                    and e["path"] not in base_files_in_touched
                ):
                    raise RuntimeError(
                        "concurrent commit added files into a partition "
                        "being overwritten; aborting"
                    )
            out = dict(base)
            out["files"] = [
                e
                for e in base["files"]
                if tuple(sorted(e["partition"].items())) not in touched
            ] + new_files
            out["operation"] = "overwrite-partitions"
            out["parent"] = base["version"]
            return out

        return self._commit(name, apply(m), rebase=apply, ref=ref)

    def overwrite(self, name: str, df: DataFrame) -> int:
        m = self._load_manifest(name)
        self._enforce_constraints(name, df)
        new_files = self._write_files(name, df, self._spec(m))
        m["files"] = new_files
        m["operation"] = "overwrite"
        m.pop("global_eq_deletes", None)  # no pre-overwrite file survives
        m.pop("global_pos_deletes", None)
        m["parent"] = m["version"]
        return self._commit(name, m)

    # --------------------------------------------------- row-level (CoW)
    @staticmethod
    def _manifest_spans(m: dict) -> list[tuple[str | None, list[dict]]]:
        """m["files"] sliced back into its segment spans (sid, entries),
        aligned with _seg_layout; one (None, files) span when the
        manifest predates segments or the list was already rewritten.
        Slices are ref-copies in original order, so extending an output
        list with a whole span preserves the contiguous identity runs
        commit-time segment reuse matches on."""
        files = m.get("files") or []
        layout = m.get("_seg_layout")
        if not layout or sum(c for _, c in layout) != len(files):
            return [(None, files)]
        spans: list[tuple[str | None, list[dict]]] = []
        off = 0
        for sid, cnt in layout:
            spans.append((sid, files[off : off + cnt]))
            off += cnt
        return spans

    def _split_files(
        self, m: dict, where: list
    ) -> tuple[list[dict], list[dict]]:
        """(possibly-affected, provably-untouched) file partition.

        Segment-level pre-prune first (same _seg_may_match the scan path
        uses): a segment whose [min, max] partition summary excludes the
        predicate moves to untouched WHOLESALE — per-entry _may_match
        runs only over matching segments' entries, so planning a
        partition-scoped delete/update against a million-file table is
        O(segments + matching entries), not O(table)."""
        spec = self._spec(m)
        seg_stats = m.get("_seg_stats") or {}
        affected, untouched = [], []
        for sid, chunk in self._manifest_spans(m):
            if (
                sid is not None
                and where
                and not _seg_may_match(spec, seg_stats.get(sid), where)
            ):
                untouched.extend(chunk)
                continue
            for e in chunk:
                (affected if _may_match(spec, e, where) else untouched).append(
                    e
                )
        return affected, untouched

    def delete(
        self,
        name: str,
        where: list[tuple[str, str, Any]] | None = None,
        mode: str = "cow",
        equality: list[str] | None = None,
        keys: DataFrame | None = None,
    ) -> int:
        """Row-level DELETE (≙ Iceberg row-level deletes; the reference
        has no row-level ops at all). NULL-predicate rows are kept, per
        SQL DELETE semantics.

        ``mode="cow"`` (default): copy-on-write — only files whose
        partition values / stats can contain matching rows are rewritten.
        Write cost proportional to affected data, reads stay pure scans.

        ``mode="mor"``: merge-on-read (≙ Iceberg v2 delete files) — NO
        data file is rewritten; the delete predicate is attached to the
        affected manifest entries and every subsequent read applies
        NOT(predicate) to those files. Write cost is one metadata commit
        regardless of table size — the right trade for frequent small
        deletes (GDPR erasure streams) — while reads pay a filter until
        :meth:`rewrite_deletes` (or any rewriting op touching the file)
        folds the deletes in. Both modes commit atomically and
        time-travel correctly: prior snapshots keep the pre-delete
        entries.

        ``equality=[cols] + keys=<DataFrame>``: EQUALITY delete (≙
        Iceberg v2 equality-delete files — the streaming-CDC-upsert
        shape): instead of a predicate, the rows to delete are identified
        by a SET OF KEY TUPLES. ``keys`` must carry exactly the
        ``equality`` columns; it is deduplicated and written as parquet
        delete file(s) under ``deletes/``, and each CURRENT data file
        whose column stats / partition values can overlap the key range
        gets the delete file attached to its manifest entry. Reads
        anti-join the delete set (null-safe, so a NULL key deletes NULL
        rows) against exactly the affected files. Sequence semantics
        match Iceberg: the delete binds only to files present at commit
        time — rows APPENDED AFTERWARDS with the same keys are NOT
        affected, which is what makes delete-then-reinsert (CDC upsert
        replay) correct. With ``mode="cow"`` the affected files are
        instead rewritten immediately via the same anti-join."""
        m = self._load_manifest(name)
        if equality is not None:
            if keys is None:
                raise ValueError("equality delete requires keys=")
            if where is not None:
                raise ValueError("pass either where= or equality=, not both")
            return self._delete_equality(name, m, equality, keys, mode)
        if where is None:
            raise ValueError("predicate delete requires where=")
        affected, untouched = self._split_files(m, where)
        if not affected:
            return m["version"]  # provably nothing to delete: no-op
        if mode == "mor":
            where_json = [[c, op, _json_lit(v)] for c, op, v in where]
            for e in affected:
                e = dict(e)
                e["deletes"] = [*e.get("deletes", []), where_json]
                untouched.append(e)
            m["files"] = untouched
            m["operation"] = "delete-mor"
            m["parent"] = m["version"]
            return self._commit(name, m)
        if mode != "cow":
            raise ValueError(f"unknown delete mode {mode!r}")
        df = self._read_files(name, m, affected)
        keep = df.filter(~F.coalesce(_predicate(where), F.lit(False)))
        new_files = self._write_files(name, keep, self._spec(m))
        m["files"] = untouched + new_files
        m["operation"] = "delete"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def _delete_equality(
        self,
        name: str,
        m: dict,
        equality: list[str],
        keys: DataFrame,
        mode: str,
    ) -> int:
        """Write an equality-delete file and attach it (mor) or fold it
        (cow). Affected-file selection maps the key set's per-column
        [min, max] range through the SAME stats/partition-transform
        pruning a scan uses, so a point-keyed delete touches only the
        files that can hold those keys — at 100 TB the delete commit cost
        is O(matching files' metadata), never a table pass."""
        schema = StructType.fromJson(m["schema"])
        names = {f.name for f in schema.fields}
        missing = [c for c in equality if c not in names]
        if missing:
            raise ValueError(f"equality columns not in schema: {missing}")
        if sorted(keys.columns) != sorted(equality):
            raise ValueError(
                f"keys columns {keys.columns} != equality {equality}"
            )
        types = {f.name: f.dataType for f in schema.fields}
        dkeys = keys.select(
            *[F.col(c).cast(types[c]).alias(c) for c in equality]
        ).distinct()
        del_entries: list[dict] = []
        if mode == "mor":
            # write-first: the key set's ONE source-lineage job is the
            # delete-file write; the pruning predicate is then derived
            # from the tiny written parquet instead of re-running the
            # source scan for a collect and a bounds agg (2 extra jobs
            # per delete commit before this reorder). Same Spark-side
            # value semantics — the probe reads the file back through
            # the session, not pyarrow, so collected key values convert
            # exactly as before. The basename-uniqueness guard runs
            # later, just before the attach, so a no-op delete (empty
            # keys, nothing bound) stays a silent no-op even on a
            # colliding-basename table — the pre-reorder contract.
            del_entries = self._write_eq_delete_files(name, dkeys, equality)
            dkeys = self.spark.read.schema(
                StructType(
                    [StructField(c, types[c], True) for c in equality]
                )
            ).parquet(
                *[
                    os.path.join(self._dir(name), d["path"])
                    for d in del_entries
                ]
            )
        def _discard_written() -> None:
            # nothing references the just-written delete file(s) yet —
            # remove them so no-op/error paths can't orphan parquet
            # under deletes/ (expire_snapshots' ttl sweep is the
            # backstop for crashes that skip even this)
            for d in del_entries:
                try:
                    os.remove(os.path.join(self._dir(name), d["path"]))
                except OSError:
                    pass

        try:
            return self._delete_equality_bound(
                name, m, equality, dkeys, mode, del_entries, _discard_written
            )
        except BaseException:
            _discard_written()
            raise

    def _delete_equality_bound(
        self,
        name: str,
        m: dict,
        equality: list[str],
        dkeys: DataFrame,
        mode: str,
        del_entries: list[dict],
        _discard_written,
    ) -> int:
        """Predicate/split/attach half of :meth:`_delete_equality` —
        runs after the delete file is staged; any raise before the
        commit is cleaned up by the caller's discard wrapper."""
        where_bounds, has_null_keys = self._eq_key_predicate(dkeys, equality)
        if not where_bounds and not has_null_keys:
            _discard_written()  # wrote for nothing: empty key set
            return m["version"]  # empty key set: no-op
        spec = self._spec(m)
        seg_stats = m.get("_seg_stats") or {}
        affected, untouched = [], []
        allowed: dict[str, set[str]] | None = None
        allowed_known = False
        for sid, chunk in self._manifest_spans(m):
            # segment-level pre-prune (identity-partition summaries):
            # a non-overlapping segment's entries go untouched WHOLESALE
            # — per-entry stats/bucket checks run only over matching
            # segments, so a point-keyed delete against a million-file
            # table plans O(segments + matching entries). NULL keys
            # disable it (min/max never covers NULL), same per-entry
            # rule as below.
            if (
                not has_null_keys
                and sid is not None
                and where_bounds
                and not _seg_may_match(spec, seg_stats.get(sid), where_bounds)
            ):
                untouched.extend(chunk)
                continue
            if not allowed_known:
                # the single-row bucket probe job runs at most once no
                # matter how many spans match; the filter itself is pure
                # and applied per chunk
                allowed = self._bucket_allowed(m, spec, where_bounds)
                allowed_known = True
            cand = chunk if allowed is None else self._bucket_filter(
                chunk, allowed
            )
            pruned = set(map(id, cand))
            for e in chunk:
                hit = id(e) in pruned and _may_match(spec, e, where_bounds)
                # NULL keys carry no range info; stats can't exclude a
                # file for them (min/max never covers NULL)
                (affected if hit or has_null_keys else untouched).append(e)
        if not affected:
            _discard_written()  # keys bind to no current file
            return m["version"]
        if mode == "cow":
            df = self._read_files(name, m, affected)
            cond = _null_safe_eq(df, dkeys, equality)
            kept = df.join(dkeys, on=cond, how="left_anti")
            new_files = self._write_files(name, kept, spec)
            m["files"] = untouched + new_files
            m["operation"] = "delete"
            m["parent"] = m["version"]
            return self._commit(name, m)
        if mode != "mor":
            raise ValueError(f"unknown delete mode {mode!r}")
        # the equality MoR read/fold path scopes delete applicability via
        # a basename-keyed seq map — colliding external basenames would
        # duplicate data rows through that left join. Checked HERE (after
        # the no-op early returns) so provably-empty deletes never raise.
        self._require_unique_basenames(name, m, "delete(mode='mor')")
        for e in affected:
            e = dict(e)
            e["eq_deletes"] = [*e.get("eq_deletes", []), *del_entries]
            untouched.append(e)
        m["files"] = untouched
        m["operation"] = "delete-mor"
        m["parent"] = m["version"]
        return self._commit(name, m)

    # exact-membership pruning bound: key sets at or under this size are
    # collected driver-side and prune as `col IN (...)` — through bucket
    # transforms and gappy stats — instead of a coarse min/max range.
    # 1024 keys x a scalar is a trivial driver/manifest payload; a GDPR
    # erasure batch or CDC epoch is typically far smaller.
    EQ_POINT_KEY_LIMIT = 1024

    def _eq_key_predicate(
        self, dkeys: DataFrame, equality: list[str]
    ) -> tuple[list[tuple[str, str, Any]], bool]:
        """(pruning predicate, has_null_keys) for an equality key set.

        Small single-column sets become an exact ``IN`` membership test —
        which :func:`_may_match` maps through ANY deterministic transform
        and :meth:`_prune_buckets` maps through bucket transforms, so a
        point-keyed delete on a bucket-partitioned table attaches to only
        the matching buckets' files (the 100 TB GDPR-erasure shape).
        Larger or composite key sets fall back to per-column min/max
        ranges from one tiny agg job."""
        if len(equality) == 1:
            col = equality[0]
            sample = dkeys.limit(self.EQ_POINT_KEY_LIMIT + 1).collect()
            if len(sample) <= self.EQ_POINT_KEY_LIMIT:
                vals = [r[col] for r in sample]
                nonnull = [v for v in vals if v is not None]
                where = [(col, "in", nonnull)] if nonnull else []
                return where, len(nonnull) < len(vals)
        bounds = dkeys.agg(
            *[F.min(c).alias(f"mn_{c}") for c in equality],
            *[F.max(c).alias(f"mx_{c}") for c in equality],
            *[F.count(c).alias(f"nn_{c}") for c in equality],
            F.count(F.lit(1)).alias("n_all"),
        ).first()
        where_bounds: list[tuple[str, str, Any]] = []
        for c in equality:
            if bounds[f"mn_{c}"] is not None:
                where_bounds.append((c, ">=", bounds[f"mn_{c}"]))
            if bounds[f"mx_{c}"] is not None:
                where_bounds.append((c, "<=", bounds[f"mx_{c}"]))
        has_null_keys = any(
            bounds[f"nn_{c}"] < bounds["n_all"] for c in equality
        )
        return where_bounds, has_null_keys

    def _write_eq_delete_files(
        self, name: str, dkeys: DataFrame, equality: list[str]
    ) -> list[dict]:
        """Persist a deduplicated key set as parquet equality-delete
        file(s) under ``deletes/``; returns manifest-attachable entries."""
        return [
            {
                "path": os.path.relpath(dst, self._dir(name)),
                "cols": list(equality),
                "bytes": os.path.getsize(dst),
            }
            for dst in self._stage_delete_parquet(name, dkeys, "eqdel")
        ]

    def read_with_positions(
        self,
        name: str,
        snapshot_id: int | None = None,
        ref: str | None = None,
        tag: str | None = None,
    ) -> DataFrame:
        """Snapshot read carrying ``_file_name`` / ``_pos`` coordinate
        columns — what an audit query selects from to build the
        ``positions`` input of :meth:`delete_positions` (outstanding MoR
        deletes are already applied, so coordinates always name live
        rows)."""
        m = self._load_manifest(name, self._resolve(name, snapshot_id, ref, tag))
        return self._read_files(name, m, m["files"], with_positions=True)

    def _require_unique_basenames(self, name: str, m: dict, op: str) -> None:
        """Row-level MoR machinery (positional-delete coordinates,
        sequence-number scoping) keys files by BASENAME (``_file_name``)
        — unique by construction for managed writes (uuid names), but
        externally registered files (:meth:`add_files`) may collide
        (Spark's partitionBy reuses one task file name across partition
        dirs). Refuse with a remedy instead of corrupting silently.

        O(segments) fast path: managed writes are uuid-named (unique by
        construction), so when EVERY segment summary records ext=False
        (no add_files entries anywhere) the walk is skipped entirely —
        at 1M files the guard costs a dict scan over segment summaries,
        not an inventory pass. Summaries predating the flag (or spans
        out of alignment after an in-memory rewrite) fall back to the
        full walk."""
        stats = m.get("_seg_stats") or {}
        layout = m.get("_seg_layout")
        if (
            layout
            and sum(c for _, c in layout) == len(m.get("files") or [])
            and all(
                (stats.get(sid) or {}).get("ext") is False
                for sid, _cnt in layout
            )
        ):
            return
        seen: set[str] = set()
        for e in m["files"]:
            bn = os.path.basename(e["path"])
            if bn in seen:
                raise ValueError(
                    f"{op}: table {name!r} holds files with colliding "
                    f"basenames ({bn!r}, externally registered) — "
                    f"row-level deletes key rows by file name; run "
                    f"compact() first to rewrite them under unique names"
                )
            seen.add(bn)

    def delete_positions(self, name: str, positions: DataFrame) -> int:
        """POSITIONAL delete, merge-on-read (≙ Iceberg v2 position-delete
        files — the third delete class next to predicate and equality
        MoR). ``positions`` carries (``_file_name``, ``_pos``): physical
        data-file name + 0-based row ordinal, the coordinates
        :meth:`read_with_positions` emits. The pairs are written as
        parquet delete file(s) under ``deletes/`` and attached to EXACTLY
        the named files' manifest entries — no stats guesswork, perfect
        attachment — and every read anti-joins the (file, row) set for
        just those files. No data file is rewritten; commit cost is
        O(delete set).

        This is the only delete class that can remove ONE of two
        physically identical rows (predicate and equality deletes name
        values, which both copies share) — i.e. the surgical tool for
        post-hoc dedup of an already-committed corpus. Later appends are
        naturally unaffected (new files have new names); renames/drops of
        columns don't unbind it (positions are name-agnostic).
        :meth:`rewrite_deletes` folds it in; :meth:`expire_snapshots`
        GCs the delete files once unreferenced."""
        if sorted(positions.columns) != ["_file_name", "_pos"]:
            raise ValueError(
                f"positions needs exactly (_file_name, _pos); got "
                f"{positions.columns}"
            )
        m = self._load_manifest(name)
        self._require_unique_basenames(name, m, "delete_positions")
        by_fn = {os.path.basename(e["path"]): e for e in m["files"]}
        dpos = positions.distinct()
        touched = [r["_file_name"] for r in dpos.select("_file_name").distinct().collect()]
        unknown = [fn for fn in touched if fn not in by_fn]
        if unknown:
            raise ValueError(
                f"positions reference files not in the current snapshot: "
                f"{unknown[:3]}{'...' if len(unknown) > 3 else ''}"
            )
        if not touched:
            return m["version"]  # empty delete set: no-op
        del_entries = self._write_pos_delete_files(name, dpos)
        m["files"] = self._attach_pos_deletes(m["files"], touched, del_entries)
        m["operation"] = "delete-mor"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def _stage_delete_parquet(
        self, name: str, df: DataFrame, prefix: str
    ) -> list[str]:
        """Write ``df`` via a private staging dir and promote each part
        file into ``deletes/`` under a uuid name — THE delete-file
        staging workflow (coordinate, equality, and DV writers all ride
        it); returns the promoted absolute paths."""
        del_dir = os.path.join(self._dir(name), "deletes")
        staging = os.path.join(self._dir(name), "_staging", uuid.uuid4().hex)
        df.write.mode("overwrite").option("compression", "zstd").parquet(
            staging
        )
        os.makedirs(del_dir, exist_ok=True)
        import shutil as _sh

        out: list[str] = []
        for fn in sorted(os.listdir(staging)):
            if not fn.endswith(".parquet"):
                continue
            dst = os.path.join(del_dir, f"{prefix}-{uuid.uuid4().hex}.parquet")
            os.replace(os.path.join(staging, fn), dst)
            out.append(dst)
        _sh.rmtree(staging, ignore_errors=True)
        return out

    def _write_pos_delete_files(self, name: str, dpos: DataFrame) -> list[dict]:
        """Persist a deduplicated (file, row) coordinate set as parquet
        position-delete file(s) under ``deletes/``."""
        return [
            {
                "path": os.path.relpath(dst, self._dir(name)),
                "bytes": os.path.getsize(dst),
            }
            for dst in self._stage_delete_parquet(name, dpos, "posdel")
        ]

    def _write_dv_files(self, name: str, dv: DataFrame) -> list[dict]:
        """Persist a per-file DELETION VECTOR table as parquet under
        ``deletes/`` (≙ Iceberg v3 deletion vectors: positions stored
        compressed per file instead of one row per coordinate). Two
        formats, detected from the written schema:

        - BITMAP (current writer): one row per data file carrying
          ``words: array<struct<w, b>>`` — 64-bit word bitmaps, the
          dense-container half of Iceberg v3's roaring DV spec — plus a
          per-row ``n`` bit count. Descriptors carry ``dv: True`` and
          ``dvf: 2``.
        - sorted ``positions`` array (read-compat with pre-bitmap DV
          history): ``dv: True``, no ``dvf``.

        Both record ``n_pos`` — the TOTAL coordinate count (footer leaf
        counts for lists; a one-column driver read of the tiny per-file
        ``n`` rollup for bitmaps) — because a compressed DV's on-disk
        bytes under-represent the exploded rows the read-side anti-join
        materializes; the 64 MB broadcast guard must see coordinates,
        not compressed bytes."""
        import pyarrow.parquet as pq

        out: list[dict] = []
        for dst in self._stage_delete_parquet(name, dv, "dv"):
            pf = pq.ParquetFile(dst)
            md = pf.metadata
            names = set(pf.schema_arrow.names)
            entry = {
                "path": os.path.relpath(dst, self._dir(name)),
                "bytes": os.path.getsize(dst),
                "dv": True,
            }
            if "words" in names:
                ncol = pq.read_table(dst, columns=["n"])["n"]
                entry["n_pos"] = int(
                    sum(v.as_py() or 0 for v in ncol)
                )
                entry["dvf"] = 2
            else:
                n_pos = 0
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for c in range(g.num_columns):
                        col = g.column(c)
                        if col.path_in_schema.startswith("positions."):
                            n_pos += col.num_values
                entry["n_pos"] = int(n_pos)
            out.append(entry)
        return out

    def _global_pos_coords(self, name: str, gpos: list[dict]) -> DataFrame:
        """(_file_name, _pos) coordinates of a global positional-delete
        descriptor list — reading each storage class natively
        (coordinate files select, DV files explode their position
        lists). THE single format dispatch: the fold's input and the
        read path's anti-join side both come through here."""
        coord_g = [g for g in gpos if not g.get("dv")]
        dv_list = [g for g in gpos if g.get("dv") and g.get("dvf") != 2]
        dv_bmp = [g for g in gpos if g.get("dv") and g.get("dvf") == 2]
        parts: list[DataFrame] = []
        if coord_g:
            parts.append(
                self.spark.read.parquet(
                    *[
                        os.path.join(self._dir(name), g["path"])
                        for g in coord_g
                    ]
                ).select("_file_name", "_pos")
            )
        if dv_list:
            parts.append(
                self.spark.read.parquet(
                    *[
                        os.path.join(self._dir(name), g["path"])
                        for g in dv_list
                    ]
                ).select(
                    "_file_name", F.explode("positions").alias("_pos")
                )
            )
        if dv_bmp:
            # bitmap DV: word w contributes position w*64+i for every
            # set bit i — pure JVM expressions, no Python in the path
            parts.append(
                self.spark.read.parquet(
                    *[
                        os.path.join(self._dir(name), g["path"])
                        for g in dv_bmp
                    ]
                )
                .select("_file_name", F.explode("words").alias("wd"))
                .select(
                    "_file_name",
                    F.explode(
                        F.expr(
                            "filter(transform(sequence(0, 63), i -> "
                            "IF((shiftright(wd.b, i) & 1) = 1, "
                            "wd.w * 64 + CAST(i AS BIGINT), "
                            "CAST(NULL AS BIGINT))), "
                            "x -> x IS NOT NULL)"
                        )
                    ).alias("_pos"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @staticmethod
    def _gpos_est_bytes(gpos: list[dict]) -> int:
        """Broadcast-budget estimate of a global positional-delete set:
        coordinate files count their on-disk bytes (the calibration the
        64 MB guard was built on — ~10 B per zstd coordinate row); DV
        descriptors contribute their COORDINATE COUNT at the same ~10 B
        equivalence, since their own on-disk bytes under-represent the
        exploded rows the join materializes."""
        return sum(
            g["n_pos"] * 10
            if g.get("dv") and "n_pos" in g
            else g.get("bytes", 0)
            for g in gpos
        )

    @staticmethod
    def _attach_pos_deletes(
        files: list[dict], touched: list[str], del_entries: list[dict]
    ) -> list[dict]:
        out_files = []
        touched_set = set(touched)
        for e in files:
            if os.path.basename(e["path"]) in touched_set:
                e = dict(e)
                e["pos_deletes"] = [*e.get("pos_deletes", []), *del_entries]
            out_files.append(e)
        return out_files

    def upsert_equality(
        self, name: str, df: DataFrame, keys: list[str], ref: str = "main"
    ) -> int:
        """Merge-on-read UPSERT in ONE commit (≙ an Iceberg v2 streaming
        upsert epoch: equality-delete file + data files under one
        snapshot/sequence number — the shape a CDC `foreachBatch` sink
        commits per micro-batch). The incoming rows' key tuples become an
        equality-delete file attached to the stats-overlapping EXISTING
        files (old versions of those keys vanish), and the incoming rows
        land as new data files the delete does NOT bind to — so the
        commit atomically replaces each key's row(s). NO existing file is
        rewritten; cost is one metadata commit + the new rows' write,
        regardless of table size. Rows sharing a key within ``df`` all
        survive (dedupe upstream per batch — Iceberg's upsert contract).
        Readers pay the anti-join until :meth:`compact_deletes` /
        :meth:`rewrite_deletes`.

        Auto-maintenance: with the ``write.delete.compact-threshold``
        table property set (an int; BENCH_MOR.json measures ~10 as the
        point the stacked-epoch read tax turns superlinear), an upsert
        that leaves any file's delete stack at/over the threshold
        triggers :meth:`compact_deletes` inline — the stack depth check
        is metadata-only, and the read tax stays bounded without an
        external maintenance scheduler (≙ Iceberg's
        commit-triggered table maintenance)."""
        entry = self._stage_upsert(name, df, keys)
        v = self._apply_upsert(name, ref, entry)
        # defensive parse (the data-compact twin's discipline): a bad
        # property value must never fail the upsert AFTER its commit
        try:
            thresh = int(
                self.properties(name).get(DELETE_COMPACT_THRESHOLD_PROP, 0)
            )
        except (TypeError, ValueError):
            thresh = 0
        if thresh > 0 and ref == "main" and self.spark is not None:
            m = self._load_manifest(name)
            if any(
                len(e.get("eq_deletes", [])) >= thresh for e in m["files"]
            ):
                # adopt the fold COMMIT's version only if it actually
                # folded — the no-op path (a concurrent fold already
                # flattened the stacks) returns the head it examined,
                # which can be a foreign commit's id
                nv, did = self._compact_deletes(name)
                if did:
                    v = nv
        return v

    def _stage_upsert(
        self,
        name: str,
        df: DataFrame,
        keys: list[str],
        schema_json: dict | None = None,
    ) -> dict:
        """Run the DATA half of an upsert epoch (distributed writes of
        the new rows + the key-set delete file, plus the pruning bounds),
        with no head advance — the JSON-able entry is applied later by
        :meth:`_apply_upsert` (directly, or through a multi-table
        :class:`Transaction`). ``schema_json`` overrides the alignment
        schema — a Transaction passes its staged-DDL projection so an
        upsert staged after an add_column writes the evolved shape
        instead of silently dropping the new column."""
        m = self._load_manifest(name)
        self._require_unique_basenames(name, m, "upsert")
        schema = StructType.fromJson(schema_json or m["schema"])
        schema_cols = [f.name for f in schema.fields]
        missing = [c for c in keys if c not in schema_cols]
        if missing:
            raise ValueError(f"equality columns not in schema: {missing}")
        aligned = df.select(
            *[
                F.col(f.name)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
        self._enforce_constraints(name, aligned)
        types = {f.name: f.dataType for f in schema.fields}
        dkeys = aligned.select(
            *[F.col(c).cast(types[c]).alias(c) for c in keys]
        ).distinct()
        where, has_null_keys = self._eq_key_predicate(dkeys, keys)
        del_entries = self._write_eq_delete_files(name, dkeys, keys)
        new_files = self._write_files(name, aligned, self._spec(m))
        return {
            "op": "upsert",
            "added": new_files,
            "eq_deletes": del_entries,
            "bounds": [[c, op, _json_lit(v)] for c, op, v in where],
            "null_keys": has_null_keys,
        }

    def _apply_upsert(self, name: str, ref: str, entry: dict) -> int:
        """Idempotent head advance of a staged upsert: attach the delete
        file to every CURRENT stats-overlapping file (apply-time head —
        commits that won meanwhile correctly fall under the delete, per
        sequence ordering), then add the epoch's own files exempt."""
        bounds = [tuple(b) for b in entry["bounds"]]
        empty_keys = not bounds and not entry["null_keys"]
        added_paths = {e["path"] for e in entry["added"]}
        while True:
            seq_head, cur = self._ref_head(name, ref)
            m = self._load_manifest(name, cur)
            if added_paths <= {e["path"] for e in m["files"]}:
                return cur  # already applied (idempotent replay)
            spec = self._spec(m)
            pruned = set(
                id(e)
                for e in self._prune_buckets(m, spec, m["files"], bounds)
            )
            out_files: list[dict] = []
            for e in m["files"]:
                if not empty_keys and (
                    (id(e) in pruned and _may_match(spec, e, bounds))
                    or entry["null_keys"]
                ):
                    e = dict(e)
                    e["eq_deletes"] = [
                        *e.get("eq_deletes", []),
                        *entry["eq_deletes"],
                    ]
                out_files.append(e)
            nm = dict(m)
            nm.pop("txn_entry", None)
            # the upsert adds files without blob maintenance: an
            # inherited NDV blob would exclude every upserted value
            nm.pop("ndv_tbl", None)
            nm["files"] = out_files + entry["added"]
            nm["operation"] = "upsert"
            nm["parent"] = cur
            if entry.get("txn"):
                nm["txn"] = entry["txn"]
            else:
                # a plain upsert on top of a txn snapshot must not
                # inherit the parent's txn stamp — it would impersonate
                # a txn member and let rollback_transaction roll it away
                nm.pop("txn", None)
            import time as _time

            nm["committed_at"] = _time.time()
            version = self._alloc_version(name, nm)
            if self._link_pointer(
                os.path.join(
                    self._heads_dir(name, ref), f"seq-{seq_head + 1:09d}"
                ),
                str(version),
            ):
                return version

    def rewrite_deletes(self, name: str) -> int:
        """Materialize merge-on-read deletes (≙ Iceberg
        ``rewrite_position_delete_files`` + data-file rewrite): ONLY the
        files carrying delete predicates OR equality-delete files are
        read (deletes applied) and rewritten clean; every delete-free
        file survives untouched. After this, reads of the new snapshot
        pay no delete filters, and the delete files become unreferenced
        (reaped by :meth:`expire_snapshots` once no surviving snapshot
        points at them). No-op if nothing carries deletes."""
        m = self._load_manifest(name)
        gdels = m.get("global_eq_deletes", [])
        g_max = max((g.get("max_seq", 1 << 62) for g in gdels), default=-1)
        gpos = m.get("global_pos_deletes", [])
        gp_max = max((g.get("max_seq", 1 << 62) for g in gpos), default=-1)

        def _dirty(e: dict) -> bool:
            if e.get("deletes") or e.get("eq_deletes") or e.get("pos_deletes"):
                return True
            # sequence-scoped global deletes guard every file older than
            # the newest folded delete (a folded positional coordinate
            # can only name files that existed at its birth)
            seq = e.get("seq", 1 << 62)
            return (bool(gdels) and seq < g_max) or (
                bool(gpos) and seq < gp_max
            )

        dirty = [e for e in m["files"] if _dirty(e)]
        if not dirty:
            return m["version"]
        # the fold below (and the MoR read applying the deletes) keys
        # rows by basename; colliding external names would misattribute
        # coordinates / duplicate rows through basename joins
        self._require_unique_basenames(name, m, "rewrite_deletes")
        clean = [e for e in m["files"] if not _dirty(e)]
        df = self._read_files(name, m, dirty)
        new_files = self._write_files(name, df, self._spec(m))
        m["files"] = clean + new_files
        m["operation"] = "rewrite-deletes"
        m.pop("global_eq_deletes", None)  # every guarded file rewritten
        m.pop("global_pos_deletes", None)
        m["parent"] = m["version"]
        return self._commit(name, m)

    def _birth_versions(self, name: str) -> dict[str, int]:
        """First snapshot version referencing each data-file path / each
        attached equality-delete path, walking the main chain root→head.
        Versions are globally monotone along the chain (allocation is
        max+1), so birth version IS the Iceberg data sequence number: a
        delete applies to exactly the files with a SMALLER birth.

        Expired history: when the walk hits a pruned manifest, births
        first observed at the OLDEST loadable manifest are upper bounds,
        not truths — those paths are omitted (their entries just keep
        per-file stacks). Per-entry ``seq`` stamps from a prior
        compaction are authoritative and survive any expiry, so a table
        compacted at least once never loses fold eligibility."""
        chain: list[dict] = []
        v: int | None = self._current_version(name)
        complete = True
        try:
            while v is not None:
                mm = self._load_manifest(name, v)
                chain.append(mm)
                v = mm.get("parent")
        except FileNotFoundError:
            complete = False
        births: dict[str, int] = {}
        for mm in reversed(chain):  # oldest → newest
            ver = mm["version"]
            for e in mm["files"]:
                births.setdefault(e["path"], ver)
                for d in e.get("eq_deletes", []):
                    births.setdefault(d["path"], ver)
                for d in e.get("pos_deletes", []):
                    births.setdefault(d["path"], ver)
        if not complete and chain:
            oldest = chain[-1]["version"]
            births = {p: b for p, b in births.items() if b != oldest}
        for e in self._load_manifest(name)["files"]:
            if "seq" in e:
                births[e["path"]] = e["seq"]
        return births

    def compact_deletes(self, name: str) -> int:
        """Public wrapper over :meth:`_compact_deletes` (same contract,
        version-only return — the int every existing caller expects)."""
        v, _changed = self._compact_deletes(name)
        return v

    def _compact_deletes(self, name: str) -> tuple[int, bool]:
        """Fold stacked merge-on-read delete files into SEQUENCE-SCOPED
        GLOBAL deletes without touching any data file (≙ Iceberg's v2
        equality-delete design, where one delete file + sequence numbers
        guard the whole table — and the delete-file half of
        rewrite_position_delete_files): the per-entry equality-delete
        stacks union into ONE table-level delete file per key-column set
        carrying ``(keys..., __del_seq = birth version of the folded
        delete)``, per-key MAX (a later delete of the same key subsumes
        an earlier one); every data-file entry is stamped with its own
        birth version (``seq``). The read side then applies ONE
        broadcast anti-join per key-column set — condition
        ``keys match AND __del_seq > file seq`` — instead of one
        anti-join per (file-group × epoch): plan complexity O(1) in the
        number of stacked epochs, which BENCH_MOR.json shows is the
        actual read tax (the delete files themselves are tiny; the 100
        per-group anti-joins were the cost). Correctness of the seq
        scoping: an upsert epoch's delete file is only ever attached to
        files that existed BEFORE its commit, so ``delete birth > file
        birth`` reproduces the explicit attachment exactly (stats-pruned
        attachments it re-adds are no-ops — no matching keys); each
        epoch's own files share the delete's birth version and are
        exempt by the strict inequality, exactly Iceberg's same-sequence
        rule. Stacked POSITIONAL delete files merge per stack (they bind
        by physical coordinates, no seq needed). Falls back to per-stack
        merging when expired history prevents the birth walk.
        Row-visible state is unchanged (oracle-pinned by
        q_compact_deletes + value-identity pytest); superseded delete
        files become unreferenced and are reaped by
        :meth:`expire_snapshots`."""
        m = self._load_manifest(name)
        births = self._birth_versions(name)
        gdels = list(m.get("global_eq_deletes", []))
        has_eq = any(e.get("eq_deletes") for e in m["files"])
        has_pos = any(e.get("pos_deletes") for e in m["files"])
        if not has_eq and not has_pos:
            return m["version"], False
        # seq_df scoping and coordinate folds below are basename-keyed;
        # refuse colliding external basenames before any of that work
        self._require_unique_basenames(name, m, "compact_deletes")
        files = [dict(e) for e in m["files"]]
        changed = False
        # stamp every known-birth entry's data sequence number up front —
        # both delete classes' global folds scope by it, and the
        # unstamped-skip read fast path relies on "unstamped = younger
        # than every folded delete"
        for e in files:
            if e["path"] in births:
                e["seq"] = births[e["path"]]

        if has_eq:
            # fold eligibility: entry birth known AND every attached
            # delete provably younger than the entry (always true for
            # upsert epochs; unknown births from expired pre-compaction
            # history, or a hypothetical op carrying attachments onto
            # NEWER rewritten files, keep their per-entry stacks and take
            # the per-stack merge below instead)
            by_cols: dict[tuple, dict[str, int]] = {}
            for e in files:
                if e["path"] in births:
                    e["seq"] = births[e["path"]]
                eds = e.get("eq_deletes", [])
                if (
                    eds
                    and e["path"] in births
                    and all(
                        births.get(d["path"], -1) > births[e["path"]]
                        for d in eds
                    )
                ):
                    for d in eds:
                        by_cols.setdefault(tuple(d["cols"]), {})[
                            d["path"]
                        ] = births[d["path"]]
                    e["eq_deletes"] = []
            for cols, paths in by_cols.items():
                # ONE multi-path read over every folded epoch file of
                # this key-column set, with the per-file birth seq
                # restored through a broadcast file-name -> seq map join
                # (file names are uuid-unique within the table). The
                # previous per-file read-then-union loop scheduled one
                # Spark job PER epoch — pure job-submission overhead
                # that dominated a 100-epoch fold (BENCH_MOR.json
                # fix_sec measures the collapse).
                pmap = self.spark.createDataFrame(
                    [(os.path.basename(p), b) for p, b in paths.items()],
                    "__fn string, __del_seq long",
                )
                merged = (
                    self.spark.read.parquet(
                        *[os.path.join(self._dir(name), p) for p in paths]
                    )
                    .select(
                        *cols, F.col("_metadata.file_name").alias("__fn")
                    )
                    .join(F.broadcast(pmap), "__fn")
                    .select(*cols, "__del_seq")
                )
                max_seq = max(paths.values())
                prior = [g for g in gdels if tuple(g["cols"]) == cols]
                if prior:
                    # prior global files already carry __del_seq — one
                    # more multi-path read, not one per file
                    merged = merged.unionByName(
                        self.spark.read.parquet(
                            *[
                                os.path.join(self._dir(name), g["path"])
                                for g in prior
                            ]
                        ).select(*cols, "__del_seq")
                    )
                    for g in prior:
                        max_seq = max(max_seq, g.get("max_seq", max_seq))
                        gdels.remove(g)
                keys = (
                    merged.groupBy(*cols)
                    .agg(F.max("__del_seq").alias("__del_seq"))
                    .coalesce(1)
                )
                new_g = self._write_eq_delete_files(name, keys, list(cols))
                for g in new_g:
                    g["max_seq"] = max_seq
                gdels.extend(new_g)
            if by_cols:
                m["global_eq_deletes"] = gdels
                changed = True
            # unfoldable entries (unknown births): merge each distinct
            # remaining stack into one file per key-column set instead
            stacks: dict[str, list[dict]] = {}
            for e in files:
                if len(e.get("eq_deletes", [])) > 1:
                    stacks.setdefault(
                        json.dumps(e["eq_deletes"], sort_keys=True), []
                    ).append(e)
            for ek, es in stacks.items():
                eq_by_cols: dict[tuple, list[dict]] = {}
                for d in json.loads(ek):
                    eq_by_cols.setdefault(tuple(d["cols"]), []).append(d)
                merged_eq: list[dict] = []
                for cols, ds in eq_by_cols.items():
                    if len(ds) == 1:
                        merged_eq.extend(ds)
                        continue
                    keys = self.spark.read.parquet(
                        *[
                            os.path.join(self._dir(name), d["path"])
                            for d in ds
                        ]
                    ).distinct()
                    merged_eq.extend(
                        self._write_eq_delete_files(
                            name, keys.coalesce(1), list(cols)
                        )
                    )
                for e in es:
                    if e["eq_deletes"] != merged_eq:
                        e["eq_deletes"] = merged_eq
                        changed = True

        # positional deletes: fold EVERY known-birth entry's stack into
        # ONE table-level coordinate file (global_pos_deletes) stamped
        # with max_seq = newest folded file's birth. Coordinates bind by
        # physical (file_name, pos) — uuid file names can never recur —
        # so a global coordinate set is semantically identical to the
        # per-entry attachments; what it buys is PLAN shape: entries
        # stop differing by pos-delete stack, read groups collapse, and
        # the whole read pays ONE broadcast coordinate anti-join no
        # matter how many positional epochs stacked up (the eq fold's
        # O(1)-in-epochs property, extended to the third delete class).
        # Entries with unknown births must keep per-entry stacks (the
        # unstamped-files-skip fast path in _read_files would otherwise
        # skip THEIR deletes); they take the per-stack merge below.
        gpos = list(m.get("global_pos_deletes", []))
        pos_fold: dict[str, int] = {}
        for e in files:
            pds = e.get("pos_deletes", [])
            if (
                pds
                and e["path"] in births
                and all(births.get(d["path"], -1) >= 0 for d in pds)
            ):
                e["seq"] = births[e["path"]]
                for d in pds:
                    pos_fold[d["path"]] = births[d["path"]]
                e["pos_deletes"] = []
        if pos_fold:
            # fold target is a DELETION-VECTOR file (Iceberg v3 DV
            # direction): one row PER DATA FILE carrying its sorted
            # deleted-position list — RLE/delta-friendly columnar
            # storage, and the read side recovers coordinates with one
            # explode of a tiny broadcast (value-identical to the
            # coordinate form, oracle-pinned). Prior global files may
            # be either format (coordinate from pre-DV history, DV from
            # a previous fold): read each class natively and union.
            merged = self._global_pos_coords(
                name,
                [{"path": p} for p in pos_fold] + gpos,
            )
            # BITMAP encoding (≙ Iceberg v3 DV spec direction: roaring
            # bitmaps per data file — our 64-bit word rows are exactly
            # roaring's dense "bitmap container" shape, in a form Spark
            # reads natively): position p lives in word p>>6 at bit
            # p&63, so a file's delete set stores ceil(density*rows/64)
            # 16-byte rows instead of 8 bytes PER position — up to 32x
            # smaller at full density, where the old sorted-list DV was
            # largest. bit_count() sums give n_pos (the broadcast-guard
            # coordinate count) in the same pass.
            dv = (
                merged.distinct()
                .select(
                    "_file_name",
                    F.shiftright("_pos", 6).alias("w"),
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT),"
                        " CAST(pmod(_pos, 64) AS INT))"
                    ).alias("bit"),
                )
                .groupBy("_file_name", "w")
                .agg(F.expr("bit_or(bit)").alias("b"))
                .groupBy("_file_name")
                .agg(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("w"), F.col("b")))
                    ).alias("words"),
                    F.expr("CAST(sum(bit_count(b)) AS BIGINT)").alias("n"),
                )
                .coalesce(1)
            )
            max_seq = max(
                list(pos_fold.values())
                + [g.get("max_seq", 1 << 62) for g in gpos]
            )
            new_g = self._write_dv_files(name, dv)
            for g in new_g:
                g["max_seq"] = max_seq
            m["global_pos_deletes"] = new_g
            changed = True

        pos_stacks: dict[str, list[dict]] = {}
        for e in files:
            if len(e.get("pos_deletes", [])) > 1:
                pos_stacks.setdefault(
                    json.dumps(e["pos_deletes"], sort_keys=True), []
                ).append(e)
        for pk, es in pos_stacks.items():
            dpos = (
                self.spark.read.parquet(
                    *[
                        os.path.join(self._dir(name), d["path"])
                        for d in json.loads(pk)
                    ]
                )
                .select("_file_name", "_pos")
                .distinct()
            )
            merged_pos = self._write_pos_delete_files(name, dpos.coalesce(1))
            for e in es:
                e["pos_deletes"] = merged_pos
                changed = True

        if not changed:
            return m["version"], False
        m["files"] = files
        m["operation"] = "compact-deletes"
        m["parent"] = m["version"]
        return self._commit(name, m), True

    def update(
        self,
        name: str,
        set_exprs: dict[str, Column],
        where: list[tuple[str, str, Any]],
        mode: str = "cow",
    ) -> int:
        """Row-level UPDATE. ``mode="cow"`` (default), copy-on-write over
        possibly-affected files: matching rows get ``set_exprs`` applied,
        others are rewritten verbatim; provably-untouched files are not
        rewritten.

        ``mode="mor"``: merge-on-read (≙ Iceberg's MERGE-ON-READ update:
        position-delete file + replacement data files under ONE
        snapshot). The matched rows' (file, row) coordinates become a
        positional delete retiring the OLD versions in place, and the
        updated copies land as new data files — NO existing file is
        rewritten, write cost is O(matched rows), not O(affected files).
        The frequent-small-update shape at 100 TB: a CoW update of 1k
        rows spread over 1k large files rewrites TBs; the MoR update
        writes kilobytes. Reads pay the coordinate anti-join until
        :meth:`rewrite_deletes` folds it."""
        m = self._load_manifest(name)
        affected, untouched = self._split_files(m, where)
        if not affected:
            return m["version"]
        hit = F.coalesce(_predicate(where), F.lit(False))
        if mode == "mor":
            # positional coordinates key rows by basename — colliding
            # externally-registered names would retire same-position rows
            # in the WRONG partition's same-named file (silent corruption)
            self._require_unique_basenames(name, m, "update(mode='mor')")
            df = self._read_files(name, m, affected, with_positions=True)
            matched = df.filter(hit)
            dpos = matched.select("_file_name", "_pos").distinct()
            touched = [
                r["_file_name"]
                for r in dpos.select("_file_name").distinct().collect()
            ]
            if not touched:
                return m["version"]  # predicate matched no rows: no-op
            updated = matched.drop("_file_name", "_pos")
            for col, expr in set_exprs.items():
                updated = updated.withColumn(col, expr)
            new_files = self._write_files(name, updated, self._spec(m))
            del_entries = self._write_pos_delete_files(name, dpos)
            m["files"] = (
                self._attach_pos_deletes(m["files"], touched, del_entries)
                + new_files
            )
            m["operation"] = "update-mor"
            m["parent"] = m["version"]
            return self._commit(name, m)
        if mode != "cow":
            raise ValueError(f"unknown update mode {mode!r}")
        df = self._read_files(name, m, affected)
        for col, expr in set_exprs.items():
            df = df.withColumn(col, F.when(hit, expr).otherwise(F.col(col)))
        new_files = self._write_files(name, df, self._spec(m))
        m["files"] = untouched + new_files
        m["operation"] = "update"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def merge(
        self,
        name: str,
        source: DataFrame,
        on: list[str],
        delete_when: Column | None = None,
        not_matched_by_source: str | None = None,
        not_matched_by_source_set: dict[str, Column] | None = None,
        not_matched_by_source_where: list[tuple[str, str, Any]] | None = None,
    ) -> int:
        """MERGE upsert (≙ Iceberg ``MERGE INTO``): target rows whose key
        appears in ``source`` are replaced by the source row; unmatched
        source rows are inserted.

        ``delete_when`` adds the ``WHEN MATCHED AND <cond> THEN DELETE``
        clause — the CDC-apply shape: a source row satisfying the
        condition (evaluated against the RAW source, so an ``op`` flag
        column that is not part of the table schema works) removes its
        matched target row instead of replacing it. Deletes, updates, and
        inserts land in ONE atomic commit.

        ``not_matched_by_source`` ("delete" or "update") adds the Spark 4
        / SQL:2023 ``WHEN NOT MATCHED BY SOURCE THEN DELETE / UPDATE SET
        not_matched_by_source_set`` clause — the FULL-SYNC shape: target
        rows whose key is ABSENT from the source are deleted (or
        updated), making the table mirror the source after the commit.
        ``not_matched_by_source_where`` is the clause's ``AND <cond>``,
        as manifest-prunable (col, op, literal) triples: it both gates
        the row-level action AND prunes files — a sync scoped to one
        partition (the common incremental-mirror shape) rewrites ONLY
        that partition's files, every other file survives by reference.
        Without it, every target file is affected (any row could be
        unmatched — exactly SQL's semantics and cost).

        Copy-on-write at partition granularity: the source's partition
        values (derived through the table's transforms — a small driver-
        side set, exactly what Iceberg reads from manifests) select the
        files that can hold matched keys; only those are rewritten, plus
        new files for the source rows. With no partition spec (or NULL
        partition values in the source) it degrades to a full rewrite.
        The source must cover the table schema's columns (missing ones
        land as NULL for inserted rows — align beforehand if not)."""
        m = self._load_manifest(name)
        spec = self._spec(m)
        schema_cols = [f.name for f in StructType.fromJson(m["schema"]).fields]

        def project(df: DataFrame) -> DataFrame:
            return df.select(
                *[
                    F.col(c) if c in df.columns else F.lit(None).alias(c)
                    for c in schema_cols
                ]
            )

        if not_matched_by_source not in (None, "delete", "update"):
            raise ValueError(
                "not_matched_by_source must be 'delete' or 'update'"
            )
        if not_matched_by_source == "update" and not not_matched_by_source_set:
            raise ValueError(
                "not_matched_by_source='update' requires "
                "not_matched_by_source_set"
            )
        # partition-value selection sees EVERY source row (upserts AND
        # deletes): a delete row's partition must be rewritten too
        pval_src = project(source)
        match_keys = source.select(on).distinct()
        if delete_when is not None:
            hit = F.coalesce(delete_when, F.lit(False))
            source = source.filter(~hit)
        src = project(source)
        affected, untouched = m["files"], []
        if spec:
            pvals = (
                pval_src.select(
                    *[t.expr().cast("string").alias(t.field_name) for t in spec]
                )
                .distinct()
                .collect()
            )
            keys = {tuple(str(v) for v in r) for r in pvals}
            if not any(v == "None" for k in keys for v in k):
                affected, untouched = [], []
                for e in m["files"]:
                    fk = tuple(
                        str(e["partition"].get(t.field_name)) for t in spec
                    )
                    (affected if fk in keys else untouched).append(e)
        if not_matched_by_source is not None:
            # the clause can touch rows no source partition points at:
            # widen the affected set to files that may hold rows
            # satisfying its condition (all files when unconditioned) —
            # SQL semantics at manifest-pruned cost
            if not_matched_by_source_where is None:
                affected, untouched = m["files"], []
            else:
                cond_aff, _cond_unt = self._split_files(
                    m, not_matched_by_source_where
                )
                aff_ids = {id(e) for e in affected} | {
                    id(e) for e in cond_aff
                }
                affected = [e for e in m["files"] if id(e) in aff_ids]
                untouched = [
                    e for e in m["files"] if id(e) not in aff_ids
                ]
        target = self._read_files(name, m, affected)
        survivors = target.join(match_keys, on, "left_anti")
        if not_matched_by_source is not None:
            cond = (
                _predicate(not_matched_by_source_where)
                if not_matched_by_source_where
                else None
            )
            cond = F.lit(True) if cond is None else F.coalesce(
                cond, F.lit(False)
            )
            if not_matched_by_source == "delete":
                survivors = survivors.filter(~cond)
            else:
                for col, expr in (not_matched_by_source_set or {}).items():
                    survivors = survivors.withColumn(
                        col, F.when(cond, expr).otherwise(F.col(col))
                    )
        merged = survivors.unionByName(src)
        new_files = self._write_files(name, merged, spec)
        m["files"] = untouched + new_files
        m["operation"] = "merge"
        m["parent"] = m["version"]
        return self._commit(name, m)

    # ---------------------------------------------------------------- reads
    def _read_files(
        self,
        name: str,
        manifest: dict,
        files: list[dict],
        with_positions: bool = False,
    ) -> DataFrame:
        """Plan a read over manifest-listed files.

        ``with_positions=True`` appends ``_file_name`` / ``_pos`` columns
        (physical data file name + 0-based row ordinal, from Spark's
        ``_metadata`` hidden columns) — the coordinates
        :meth:`delete_positions` consumes. They reflect the PHYSICAL file
        layout, so they are stable across reads and unaffected by the
        delete filters applied below.

        Files are grouped by their hive partition layout (the key set of
        their manifest partition values) so partition-spec evolution works:
        files written under different specs live at different path depths,
        and each group is read with its own layout then unioned — mixing
        depths in one ``spark.read`` would trip partition discovery.

        Each group reads with an EXPLICIT schema instead of mergeSchema:
        evolved-away columns come back NULL, and files written before a
        ``widen_column`` read through Spark's parquet widening promotion
        (int32→long, float→double) — mergeSchema would refuse that merge.
        Renamed columns resolve via ``former_names`` field metadata:
        the read schema carries every historical name and the projection
        coalesces them (a file has exactly one of the names). Path-only
        partition columns are typed string and dropped; their parse type
        never matters.

        Merge-on-read deletes: a file entry may carry ``deletes`` — the
        predicate list(s) of :meth:`delete` commits made in ``mor`` mode
        — and/or ``eq_deletes`` — parquet key-set delete files of
        equality-delete commits — and/or ``pos_deletes`` — parquet
        (file, row-ordinal) coordinate files of positional-delete
        commits. Files are additionally grouped by their delete sets;
        each group's read applies NOT(predicate) per predicate delete, a
        null-safe broadcast anti-join per equality-delete column set,
        and a broadcast (file, row) anti-join per positional delete, so
        readers see the post-delete state without any file having been
        rewritten."""
        schema = StructType.fromJson(manifest["schema"])
        gdels = manifest.get("global_eq_deletes", [])
        gpos = manifest.get("global_pos_deletes", [])
        if not any("seq" in e for e in files):
            # only unstamped (post-compaction) files planned: younger than
            # every folded delete — skip the global anti-joins entirely
            # (folded positional coordinates can only name files that
            # existed at fold time, all of which are stamped)
            gdels = []
            gpos = []
        if not files:
            if with_positions:
                schema = schema.add("_file_name", StringType()).add(
                    "_pos", "long"
                )
            return self.spark.createDataFrame([], schema)
        names = {f.name for f in schema.fields}
        former = {
            f.name: [
                n
                for n in f.metadata.get("former_names", [])
                if n not in names
            ]
            for f in schema.fields
        }
        # initial-default columns (Iceberg v3 semantics): a file whose
        # recorded writer schema lacks the column reads the default for
        # every row; files that HAVE it keep their values, genuine NULLs
        # included. Legacy entries without a recorded writer schema are
        # treated as holding every column (NULL-preserving).
        dflt = {
            f.name: (f.metadata["initial_default"], f.dataType)
            for f in schema.fields
            if "initial_default" in (f.metadata or {})
        }
        # a renamed column's files recorded the OLD name in their writer
        # schema — presence must resolve through every historical name
        dflt_names = {
            f.name: {f.name, *f.metadata.get("former_names", [])}
            for f in schema.fields
            if f.name in dflt
        }
        groups: dict[tuple, list[dict]] = {}
        for e in files:
            dkey = json.dumps(e.get("deletes", []), sort_keys=True)
            ekey = json.dumps(e.get("eq_deletes", []), sort_keys=True)
            pkey = json.dumps(e.get("pos_deletes", []), sort_keys=True)
            ecols = e.get("cols")
            absent = tuple(
                sorted(
                    c
                    for c in dflt
                    if ecols is not None and not (dflt_names[c] & set(ecols))
                )
            )
            ext = bool(e.get("external"))
            # external groups additionally split by partition VALUES and
            # by file column set: hive-layout files don't physically
            # carry identity partition columns, so the read restores
            # them from the manifest — which needs one literal per
            # group, i.e. value-homogeneous groups
            extkey = (
                (
                    ext,
                    tuple(sorted(e["partition"].items())),
                    tuple(e.get("cols") or ()),
                )
                if ext
                else (ext, (), ())
            )
            groups.setdefault(
                (tuple(sorted(e["partition"])), dkey, ekey, pkey, absent, extkey),
                [],
            ).append(e)

        parts: list[DataFrame] = []
        for (layout, dkey, ekey, pkey, absent, extkey), entries in groups.items():
            external = extkey[0]
            hidden = [k for k in layout if k not in names]
            read_schema = StructType(
                [
                    StructField(f.name, _nested_nullable(f.dataType), True)
                    for f in schema.fields
                ]
                + [
                    StructField(n, _nested_nullable(f.dataType), True)
                    for f in schema.fields
                    for n in former[f.name]
                ]
                + [StructField(h, StringType(), True) for h in hidden]
            )
            # external (add_files-registered) entries live OUTSIDE the
            # table dir: no basePath (Spark requires every input under
            # it), no hive path parsing — their partition metadata is
            # manifest-only, and identity partition columns are
            # physically present in the files
            reader = self.spark.read
            if not external:
                reader = reader.option(
                    "basePath", os.path.join(self._dir(name), "data")
                )
            df = reader.schema(read_schema).parquet(
                *[os.path.join(self._dir(name), e["path"]) for e in entries]
            )
            if external:
                # restore identity partition columns hive layouts strip
                # from the data files: manifest value -> typed literal
                # (the group is partition-value- and column-homogeneous
                # by construction of extkey above)
                evals = dict(extkey[1])
                ecols = set(extkey[2])
                for f in schema.fields:
                    if f.name in evals and f.name not in ecols:
                        df = df.withColumn(
                            f.name,
                            F.lit(evals[f.name]).cast(
                                _nested_nullable(f.dataType)
                            ),
                        )
            pos_dels = json.loads(pkey)
            meta_cols = (
                [
                    F.col("_metadata.file_name").alias("_file_name"),
                    F.col("_metadata.row_index").alias("_pos"),
                ]
                if (with_positions or pos_dels or gdels or gpos)
                else []
            )
            def _field_expr(f: StructField) -> Column:
                if f.name in absent:
                    v, dt = dflt[f.name]
                    return F.lit(v).cast(_nested_nullable(dt)).alias(f.name)
                if former[f.name]:
                    return (
                        F.coalesce(
                            F.col(f.name), *[F.col(n) for n in former[f.name]]
                        )
                        .cast(_nested_nullable(f.dataType))
                        .alias(f.name)
                    )
                return F.col(f.name).cast(_nested_nullable(f.dataType))

            proj = df.select(
                *[_field_expr(f) for f in schema.fields], *meta_cols
            )
            for dw in json.loads(dkey):
                pred = _predicate([tuple(w) for w in dw])
                if pred is not None:
                    proj = proj.filter(~F.coalesce(pred, F.lit(False)))
            # equality deletes: null-safe anti-join per key-column set;
            # delete files sharing a column set are unioned into ONE
            # anti-join (one shuffle-free broadcast for typical key-set
            # sizes — the set is 32-byte-keys small next to the data)
            eq_by_cols: dict[tuple, list[str]] = {}
            for d in json.loads(ekey):
                eq_by_cols.setdefault(tuple(d["cols"]), []).append(d["path"])
            for cols, dpaths in eq_by_cols.items():
                # explicit read schema (current table types — widening
                # promotion covers pre-widen delete files, same as data
                # files) skips a footer-inference job per key set; no
                # .distinct(): each delete file is written deduplicated
                # and an anti-join is insensitive to build-side
                # duplicates across epochs — the removed Exchange +
                # HashAggregate pair was pure per-read overhead
                types = {f.name: f.dataType for f in schema.fields}
                dels = self.spark.read.schema(
                    StructType(
                        [StructField(c, types[c], True) for c in cols]
                    )
                ).parquet(
                    *[os.path.join(self._dir(name), p) for p in dpaths]
                )
                total_bytes = sum(
                    d.get("bytes", 0)
                    for d in json.loads(ekey)
                    if tuple(d["cols"]) == cols
                )
                if total_bytes < 64 * 1024 * 1024:
                    dels = F.broadcast(dels)
                proj = proj.join(
                    dels,
                    on=_null_safe_eq(proj, dels, list(cols)),
                    how="left_anti",
                )
            # positional deletes: anti-join on the physical (file, row)
            # coordinate — applies to exactly the named rows, which is
            # what lets one of two IDENTICAL rows be removed (a shape no
            # predicate or key set can express). The delete set is
            # (file_name, pos) pairs — broadcast-small next to the data.
            if pos_dels:
                # explicit schema + no .distinct() — same rationale as
                # the equality path above (coordinate files are written
                # deduplicated; anti-join tolerates cross-epoch dups)
                pd_df = self.spark.read.schema(
                    "_file_name string, _pos long"
                ).parquet(
                    *[
                        os.path.join(self._dir(name), d["path"])
                        for d in pos_dels
                    ]
                ).select("_file_name", "_pos")
                proj = proj.join(
                    F.broadcast(pd_df), on=["_file_name", "_pos"], how="left_anti"
                )
            if meta_cols and not with_positions and not gdels and not gpos:
                proj = proj.drop("_file_name", "_pos")
            parts.append(proj)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if gpos:
            # global positional deletes (compact_deletes): ONE broadcast
            # coordinate anti-join for the whole read, regardless of how
            # many positional epochs were folded. Coordinates bind by
            # physical (file_name, pos); uuid names never recur, so no
            # seq condition is needed row-side — max_seq on the
            # descriptor only drives the unstamped-skip fast path above
            # and rewrite_deletes' dirty test.
            gp_df = self._global_pos_coords(name, gpos).distinct()
            # same broadcast-size discipline as the equality path: a
            # coordinate set that outgrew broadcast (billions of folded
            # deletes between rewrites) falls back to a shuffle
            # anti-join — rewrite_deletes is the pressure valve there
            if self._gpos_est_bytes(gpos) < 64 * 1024 * 1024:
                gp_df = F.broadcast(gp_df)
            out = out.join(
                gp_df, on=["_file_name", "_pos"], how="left_anti"
            )
        if gdels:
            # sequence-scoped GLOBAL equality deletes (compact_deletes):
            # ONE broadcast anti-join per key-column set over the whole
            # read — condition `keys match AND __del_seq > file seq` —
            # regardless of how many epochs were folded. The per-row file
            # seq comes from a broadcast join against the O(files)
            # manifest map; entries without a stamp (appended after the
            # compaction) get NULL, which no __del_seq compares above, so
            # no folded delete ever touches them (they are younger than
            # every folded delete by construction).
            seq_df = self.spark.createDataFrame(
                [
                    (os.path.basename(e["path"]), e.get("seq"))
                    for e in files
                ],
                "_file_name string, __file_seq long",
            )
            out = out.join(F.broadcast(seq_df), on="_file_name", how="left")
            for g in gdels:
                dels = self.spark.read.parquet(
                    os.path.join(self._dir(name), g["path"])
                )
                cond = _null_safe_eq(out, dels, list(g["cols"])) & (
                    dels["__del_seq"] > out["__file_seq"]
                )
                out = out.join(F.broadcast(dels), on=cond, how="left_anti")
        if gdels or gpos:
            # the coordinate/name-keyed joins floated _file_name to the
            # front — restore the canonical column order callers rely on
            out = out.select(
                *[f.name for f in schema.fields],
                *(["_file_name", "_pos"] if with_positions else []),
            )
        return out

    def _resolve(
        self,
        name: str,
        snapshot_id: int | None = None,
        ref: str | None = None,
        as_of: float | str | None = None,
    ) -> int:
        """Resolve a read target: explicit snapshot id > commit-time
        bound (``as_of``: epoch seconds or an ISO-8601 UTC instant — the
        ``TIMESTAMP AS OF`` analogue, resolving to the newest main-chain
        snapshot committed at or before the bound) > tag > branch > main
        head."""
        if snapshot_id is not None:
            return snapshot_id
        if as_of is not None:
            try:  # DataSource options arrive as strings — epoch first
                bound = float(as_of)
            except (TypeError, ValueError):
                import datetime as _dt

                d = _dt.datetime.fromisoformat(str(as_of))
                if d.tzinfo is None:
                    d = d.replace(tzinfo=_dt.timezone.utc)
                bound = d.timestamp()
            best = -1
            for v in self._ancestors(name, self._current_version(name)):
                # raw manifest — committed_at is a top-level key; as-of
                # resolution must not materialize every ancestor's
                # inventory
                m = self._manifest_raw(name, v)
                if m.get("committed_at", float("-inf")) <= bound:
                    best = max(best, v)
            if best < 0:
                raise ValueError(
                    f"no snapshot of {name!r} committed at or before {as_of!r}"
                )
            return best
        if ref is not None and ref != "main":
            tag = self._tag_path(name, ref)
            if os.path.exists(tag):
                with open(tag) as f:
                    return int(f.read().strip())
            _seq, v = self._ref_head(name, ref)
            if v >= 0:
                return v
            raise ValueError(f"no branch or tag {ref!r} on table {name!r}")
        return self._current_version(name)

    def read(
        self,
        name: str,
        snapshot_id: int | None = None,
        ref: str | None = None,
        as_of: float | str | None = None,
    ) -> DataFrame:
        """Read the table at the current snapshot, a historical snapshot
        (time travel ≙ Iceberg ``VERSION AS OF``), a named branch/tag
        (≙ ``VERSION AS OF 'ref'``), or the newest snapshot committed at
        or before an instant (``as_of`` ≙ ``TIMESTAMP AS OF``).

        All-clean snapshots plan from the columnar segments' path
        columns (O(segments) driver work); anything carrying deletes,
        externals, or schema-evolution state takes the materialized
        path.

        Snapshot read plans are CACHED per (session, manifest identity):
        a snapshot's file set and delete state are immutable while the
        snapshot exists, so the logical plan is too — re-reading the
        same version re-uses the built DataFrame instead of re-issuing
        the per-group reader calls (≙ Iceberg's catalog metadata cache;
        a long-running service reads a hot table thousands of times per
        metadata change). Keyed on the manifest file's (path, mtime_ns,
        size, inode) so a table dropped and recreated in place can
        never serve a stale plan — the inode closes the coarse-mtime
        corner where drop+recreate yields a same-size manifest within
        one mtime tick (a fresh file is a fresh inode) — plus a WEAK
        reference to the SparkSession (live weakrefs compare by
        referent and a dead ref never equals a live one, so
        ``newSession()`` siblings / restarted sessions can't collide
        even under id() reuse, and the cache pins no stopped session's
        JVM state: entries whose session was collected are purged at
        store time)."""
        v = self._resolve(name, snapshot_id, ref, as_of)
        mp = self._manifest_path(name, v)
        try:
            st = os.stat(mp)
            key = (
                weakref.ref(self.spark),
                mp,
                st.st_mtime_ns,
                st.st_size,
                st.st_ino,
            )
        except (FileNotFoundError, TypeError):
            key = None
        if key is not None:
            hit = self._READ_PLANS.get(key)
            if hit is not None:
                self._READ_PLANS.move_to_end(key)
                return hit
        try:
            raw = self._manifest_raw(name, v)
        except FileNotFoundError:
            raw = None
        if raw is not None and "segments" in raw:
            plan = self._broad_plan(name, raw)
            if plan is not None:
                df = self._read_clean_paths(name, raw, plan)
                self._read_plan_store(key, df)
                return df
        m = self._load_manifest(name, v)
        df = self._read_files(name, m, m["files"])
        self._read_plan_store(key, df)
        return df

    # (session weakref, manifest path, mtime_ns, size, inode) -> DataFrame
    _READ_PLANS: "OrderedDict[tuple, DataFrame]" = OrderedDict()
    READ_PLAN_CACHE_MAX = 256

    def _read_plan_store(self, key: tuple | None, df: DataFrame) -> None:
        if key is None:
            return
        # drop plans bound to garbage-collected sessions first — they
        # can never hit again and would otherwise pin JVM-side state
        # until LRU churn reaches them (bounded scan: cache <= 256)
        for k in [k for k in self._READ_PLANS if k[0]() is None]:
            del self._READ_PLANS[k]
        self._READ_PLANS[key] = df
        while len(self._READ_PLANS) > self.READ_PLAN_CACHE_MAX:
            self._READ_PLANS.popitem(last=False)

    # ----------------------------------------------------- branches & tags
    def create_branch(
        self, name: str, branch: str, at_snapshot: int | None = None
    ) -> int:
        """Create a mutable named ref at ``at_snapshot`` (default: main
        head). Appends with ``ref=branch`` advance only the branch — the
        write-audit-publish staging pattern (≙ Iceberg branching)."""
        if branch == "main":
            raise ValueError("'main' is reserved")
        base = (
            self._current_version(name) if at_snapshot is None else at_snapshot
        )
        if not os.path.exists(self._manifest_path(name, base)):
            raise ValueError(f"snapshot {base} does not exist on {name!r}")
        seq_path = os.path.join(self._heads_dir(name, branch), "seq-000000000")
        if not self._link_pointer(seq_path, str(base)):
            raise ValueError(f"branch {branch!r} already exists on {name!r}")
        return base

    def create_tag(self, name: str, tag: str, at_snapshot: int | None = None) -> int:
        """Create an immutable named snapshot pointer (≙ Iceberg tags).
        Tagged snapshots survive :meth:`expire_snapshots`."""
        base = (
            self._current_version(name) if at_snapshot is None else at_snapshot
        )
        if not os.path.exists(self._manifest_path(name, base)):
            raise ValueError(f"snapshot {base} does not exist on {name!r}")
        if not self._link_pointer(self._tag_path(name, tag), str(base)):
            raise ValueError(f"tag {tag!r} already exists on {name!r}")
        return base

    def drop_branch(self, name: str, branch: str) -> None:
        if branch == "main":
            raise ValueError("cannot drop 'main'")
        import shutil

        shutil.rmtree(self._heads_dir(name, branch))

    def drop_tag(self, name: str, tag: str) -> None:
        os.remove(self._tag_path(name, tag))

    # ------------------------------------------------- per-ref retention
    # ≙ Iceberg's per-ref retention knobs (`max-ref-age-ms`,
    # `min-snapshots-to-keep`): the production cleanup contract for WAP
    # audit branches and quarantine tags — without it every staging
    # branch pins its history forever. Policies live per ref under
    # _meta/<table>/refprops/ and are honored by expire_snapshots:
    # over-age refs are REMOVED (their snapshots then expire by the
    # normal rules), a branch with max-snapshot-age-ms stops pinning
    # ancestors older than that age, and min-snapshots-to-keep FLOORS
    # that age-based expiry (newest N always survive). `main` is
    # governed by expire_snapshots' own keep_last/older_than arguments,
    # never by a ref policy.

    def _ref_props_path(self, name: str, ref: str) -> str:
        return os.path.join(self._meta_dir(name), "refprops", f"{ref}.json")

    def set_ref_policy(
        self,
        name: str,
        ref: str,
        max_ref_age_ms: float | None = None,
        min_snapshots_to_keep: int | None = None,
        max_snapshot_age_ms: float | None = None,
    ) -> None:
        """Attach a retention policy to a branch or tag (replaces any
        prior policy for that ref). Knob semantics match Iceberg's
        same-named ref properties exactly:

        - ``max_ref_age_ms``: the REF itself is removed once its pointer
          is older than this; its snapshots then expire normally.
        - ``max_snapshot_age_ms`` (branches only): branch ANCESTRY stops
          pinning snapshots committed longer ago than this — the knob
          that actually expires branch history.
        - ``min_snapshots_to_keep`` (branches only): a retention FLOOR
          on ``max_snapshot_age_ms`` — the newest N ancestors survive
          age-based expiry regardless of age. By itself it expires
          NOTHING (a branch with only this knob still pins its full
          ancestry), exactly like Iceberg, where it never acts alone."""
        if ref == "main":
            raise ValueError(
                "main's retention is keep_last/older_than on "
                "expire_snapshots, not a ref policy"
            )
        is_branch = self._ref_head(name, ref)[1] >= 0
        is_tag = os.path.exists(self._tag_path(name, ref))
        if not (is_branch or is_tag):
            raise ValueError(f"no branch or tag {ref!r} on table {name!r}")
        if min_snapshots_to_keep is not None and is_tag:
            raise ValueError(
                "min_snapshots_to_keep applies to branches only"
            )
        if max_snapshot_age_ms is not None and is_tag:
            raise ValueError(
                "max_snapshot_age_ms applies to branches only"
            )
        os.makedirs(
            os.path.dirname(self._ref_props_path(name, ref)), exist_ok=True
        )
        with open(self._ref_props_path(name, ref), "w") as f:
            json.dump(
                {
                    "max_ref_age_ms": max_ref_age_ms,
                    "min_snapshots_to_keep": min_snapshots_to_keep,
                    "max_snapshot_age_ms": max_snapshot_age_ms,
                },
                f,
            )

    def _ref_policy(self, name: str, ref: str) -> dict:
        try:
            with open(self._ref_props_path(name, ref)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _ref_age_ms(self, name: str, ref: str) -> float:
        """Age of a ref = time since its pointer was last WRITTEN (a
        branch ages from its newest head-advance, a tag from creation)
        — so an active audit branch never expires mid-use."""
        import time as _time

        d = self._heads_dir(name, ref)
        if os.path.isdir(d):
            seqs = [fn for fn in os.listdir(d) if fn.startswith("seq-")]
            if seqs:
                newest = max(
                    os.path.getmtime(os.path.join(d, fn)) for fn in seqs
                )
                return (_time.time() - newest) * 1000.0
        tp = self._tag_path(name, ref)
        if os.path.exists(tp):
            return (_time.time() - os.path.getmtime(tp)) * 1000.0
        return 0.0

    # ----------------------------------------------------- versioned views
    # ≙ the Iceberg VIEW SPEC: a catalog object holding VERSIONED SQL
    # definitions — every replace appends an immutable new version, old
    # versions stay readable (time travel over the view DEFINITION, the
    # analytics-contract audit trail: "what did the KPI view compute
    # last quarter?"). Definitions are text; resolution happens through
    # spark.sql at read time, so a view over snaptable-backed temp
    # views composes with table time travel.

    def _views_dir(self, view: str) -> str:
        return os.path.join(self.warehouse, "_views", view)

    def _view_version_path(self, view: str, version: int) -> str:
        return os.path.join(self._views_dir(view), f"v{version}.json")

    def create_view(self, view: str, sql: str) -> int:
        """Create version 1 of a named SQL view. Fails if it exists."""
        if os.path.isdir(self._views_dir(view)):
            raise ValueError(f"view {view!r} already exists")
        os.makedirs(self._views_dir(view), exist_ok=True)
        return self._write_view_version(view, sql)

    def replace_view(self, view: str, sql: str) -> int:
        """Append a new immutable version (CREATE OR REPLACE VIEW): the
        head definition changes, every prior version stays readable."""
        if not os.path.isdir(self._views_dir(view)):
            raise ValueError(f"view {view!r} does not exist")
        return self._write_view_version(view, sql)

    def _write_view_version(self, view: str, sql: str) -> int:
        import time as _time

        while True:
            v = self._max_view_version(view) + 1
            try:
                with open(self._view_version_path(view, v), "x") as f:
                    json.dump(
                        {"version": v, "sql": sql, "created_at": _time.time()},
                        f,
                    )
                return v
            except FileExistsError:
                continue  # concurrent definer won this number: next

    def _max_view_version(self, view: str) -> int:
        best = 0
        try:
            for fn in os.listdir(self._views_dir(view)):
                if fn.startswith("v") and fn.endswith(".json"):
                    try:
                        best = max(best, int(fn[1:-5]))
                    except ValueError:
                        pass
        except FileNotFoundError:
            pass
        return best

    def view_sql(
        self,
        view: str,
        version: int | None = None,
        as_of: float | str | None = None,
    ) -> str:
        """The SQL text of a view version: explicit ``version``, or the
        newest version created at or before ``as_of`` (``TIMESTAMP AS
        OF`` over view DEFINITIONS), or the head."""
        if version is None and as_of is not None:
            try:
                bound = float(as_of)
            except (TypeError, ValueError):
                import datetime as _dt

                d = _dt.datetime.fromisoformat(str(as_of))
                if d.tzinfo is None:
                    d = d.replace(tzinfo=_dt.timezone.utc)
                bound = d.timestamp()
            best = -1
            for vv in range(1, self._max_view_version(view) + 1):
                with open(self._view_version_path(view, vv)) as f:
                    rec = json.load(f)
                if rec["created_at"] <= bound:
                    best = vv
            if best < 0:
                raise ValueError(
                    f"no version of view {view!r} at or before {as_of!r}"
                )
            version = best
        if version is None:
            version = self._max_view_version(view)
        if version < 1:
            raise ValueError(f"view {view!r} does not exist")
        p = self._view_version_path(view, version)
        if not os.path.exists(p):
            raise ValueError(f"view {view!r} has no version {version}")
        with open(p) as f:
            return json.load(f)["sql"]

    def read_view(
        self,
        view: str,
        version: int | None = None,
        as_of: float | str | None = None,
    ) -> DataFrame:
        """Evaluate a view version through ``spark.sql`` — the renamed
        tables/temp views its text references resolve in the session,
        so a view over snaptable temp views composes with table time
        travel."""
        return self.spark.sql(self.view_sql(view, version, as_of))

    def install_view(self, view: str, version: int | None = None) -> None:
        """Bind a view version into the session as a TEMP VIEW under its
        own name, so plain ``spark.sql('SELECT ... FROM <view>')``
        works — the SQL-surface face of the versioned catalog entry."""
        self.spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {view} AS "
            + self.view_sql(view, version)
        )

    def view_versions(self, view: str) -> DataFrame:
        """Version history (≙ Iceberg view-spec ``versions`` metadata)."""
        rows = []
        for vv in range(1, self._max_view_version(view) + 1):
            p = self._view_version_path(view, vv)
            if os.path.exists(p):
                with open(p) as f:
                    rec = json.load(f)
                rows.append((vv, rec["sql"], float(rec["created_at"])))
        return self.spark.createDataFrame(
            rows, "version INT, sql STRING, created_at DOUBLE"
        )

    def drop_view(self, view: str) -> None:
        import shutil as _sh

        if not os.path.isdir(self._views_dir(view)):
            raise ValueError(f"view {view!r} does not exist")
        _sh.rmtree(self._views_dir(view))

    def rewrite_segments(self, name: str) -> int:
        """Rebin the current snapshot's manifest segments into fresh
        target-sized ones (≙ Iceberg's ``rewrite_manifests`` maintenance
        action): a long run of micro-appends leaves one under-full
        segment per commit beyond what commit-time merging coalesced —
        planning then touches O(commits) segment files. This rewrites
        the SEGMENTS ONLY: every data-file entry survives by value
        (zero data I/O, path identity pinned in tests), the snapshot's
        row-visible state is unchanged, and superseded segment files are
        reaped by :meth:`expire_snapshots` once unreferenced. Commit
        cost is an explicit O(table-entries) re-encode — the same deal
        Iceberg's action makes; run it on maintenance cadence, not per
        commit."""
        m = self._load_manifest(name)
        # drop the reuse bookkeeping so every entry re-bins into fresh
        # target-sized segments instead of surviving by identity run
        m.pop("_seg_layout", None)
        m.pop("_base_entries", None)
        m["files"] = list(m["files"])
        m["operation"] = "rewrite-manifests"
        m["parent"] = m["version"]
        return self._commit(name, m)

    def refs(self, name: str) -> DataFrame:
        """All named refs (≙ Iceberg ``.refs`` metadata table)."""
        rows = [("main", "branch", self._current_version(name))]
        heads = os.path.join(self._meta_dir(name), "heads")
        if os.path.isdir(heads):
            for b in sorted(os.listdir(heads)):
                if b != "main":
                    rows.append((b, "branch", self._ref_head(name, b)[1]))
        tags = os.path.join(self._meta_dir(name), "tags")
        if os.path.isdir(tags):
            for t in sorted(os.listdir(tags)):
                with open(os.path.join(tags, t)) as f:
                    rows.append((t, "tag", int(f.read().strip())))
        return self.spark.createDataFrame(
            rows, "ref STRING, type STRING, snapshot_id INT"
        )

    def _ancestors(self, name: str, version: int) -> list[int]:
        """Snapshot ids reachable from ``version`` via parent links (stops
        at expired history)."""
        out, v = [], version
        while v is not None and os.path.exists(self._manifest_path(name, v)):
            out.append(v)
            # raw manifest: the parent link must not materialize the
            # whole inventory per hop (chains are walked inside expiry
            # and as-of resolution)
            v = self._manifest_raw(name, v).get("parent")
        return out

    def fast_forward(self, name: str, branch: str, ref: str = "main") -> int:
        """Advance ``ref`` (default main) to ``branch``'s head — the
        publish step of write-audit-publish. Fails unless the target head
        descends from the current ``ref`` head (same rule as Iceberg's
        ``fast_forward`` procedure); lock-free CAS retries if ``ref``
        moves concurrently."""
        while True:
            seq, cur = self._ref_head(name, ref)
            _bseq, target = self._ref_head(name, branch)
            if target < 0:
                raise ValueError(f"no branch {branch!r} on table {name!r}")
            if target == cur:
                return cur
            if cur >= 0 and cur not in self._ancestors(name, target):
                raise ValueError(
                    f"{ref!r} (at {cur}) is not an ancestor of "
                    f"{branch!r} (at {target}); not a fast-forward"
                )
            seq_path = os.path.join(
                self._heads_dir(name, ref), f"seq-{seq + 1:09d}"
            )
            if self._link_pointer(seq_path, str(target)):
                return target

    def cherry_pick(self, name: str, snapshot_id: int, ref: str = "main") -> int:
        """Re-apply one append snapshot's added files on top of ``ref``'s
        head (≙ Iceberg ``cherrypick_snapshot`` — the other WAP publish
        path, when only SOME audited commits should ship). Only append
        snapshots are cherry-pickable; a file already present on the
        target head aborts (double-publish guard)."""
        snap = self._load_manifest(name, snapshot_id)
        if snap["operation"] != "append":
            raise ValueError(
                f"snapshot {snapshot_id} is {snap['operation']!r}: only "
                "append snapshots can be cherry-picked"
            )
        parent = snap.get("parent")
        parent_paths = (
            {e["path"] for e in self._load_manifest(name, parent)["files"]}
            if parent is not None
            else set()
        )
        added = [e for e in snap["files"] if e["path"] not in parent_paths]

        def apply(base: dict) -> dict:
            clash = {e["path"] for e in base["files"]} & {
                e["path"] for e in added
            }
            if clash:
                raise ValueError(
                    f"cherry-pick of {snapshot_id} conflicts: "
                    f"{len(clash)} file(s) already on target"
                )
            out = dict(base)
            out["files"] = base["files"] + added
            out["operation"] = "append"
            out["parent"] = base["version"]
            return out

        _seq, head = self._ref_head(name, ref)
        return self._commit(
            name, apply(self._load_manifest(name, head)), rebase=apply, ref=ref
        )

    def _prune_buckets(
        self, m: dict, spec: list["Transform"], files: list[dict], where: list
    ) -> list[dict]:
        """Drop files whose bucket partition value cannot hold any literal
        of an ``==``/``in`` predicate on the bucket's source column.
        Bucket transforms are not order-preserving, so :func:`_may_match`
        skips them; membership still maps exactly: x IN (v1..vn) =>
        bucket(x) IN (bucket(v1)..bucket(vn)). The literals are hashed
        with the writer's own expression (xxhash64 after a cast to the
        column's declared type — hash input type changes the hash) in one
        single-row driver job. Conservative: files from a spec generation
        without the bucket value are kept."""
        allowed = self._bucket_allowed(m, spec, where)
        if allowed is None:
            return files
        return self._bucket_filter(files, allowed)

    @staticmethod
    def _bucket_probes(
        m: dict, spec: list["Transform"], where: list
    ) -> list[tuple[str, Column]]:
        schema = StructType.fromJson(m["schema"])
        probes: list[tuple[str, Column]] = []
        for col, op, lit_v in where:
            if op not in ("==", "in"):
                continue
            vals = lit_v if op == "in" else [lit_v]
            for t in spec:
                if t.kind != "bucket" or t.source != col:
                    continue
                dt = schema[col].dataType
                for v in vals:
                    probes.append(
                        (
                            t.field_name,
                            F.pmod(F.xxhash64(F.lit(v).cast(dt)), F.lit(t.arg)),
                        )
                    )
        return probes

    def _bucket_allowed(
        self, m: dict, spec: list["Transform"], where: list
    ) -> dict[str, set[str]] | None:
        """allowed bucket values for a predicate, or None when bucket
        pruning does not apply (no bucket probes, or a metadata-only
        manager without a session — conservative, keep all files)."""
        probes = self._bucket_probes(m, spec, where)
        if not probes or self.spark is None:
            return None
        return self._bucket_allowed_cached(probes)

    def _bucket_allowed_cached(
        self, probes: list[tuple[str, Column]]
    ) -> dict[str, set[str]]:
        """field -> allowed bucket-value strings for a probe list — ONE
        single-row driver job, computed once per (delete/scan) call and
        reusable across every segment span."""
        row = self.spark.range(1).select(
            *[c.alias(f"b{i}") for i, (_f, c) in enumerate(probes)]
        ).collect()[0]
        allowed: dict[str, set[str]] = {}
        for i, (fname, _c) in enumerate(probes):
            allowed.setdefault(fname, set()).add(str(row[i]))
        return allowed

    @staticmethod
    def _bucket_filter(
        files: list[dict], allowed: dict[str, set[str]]
    ) -> list[dict]:
        return [
            e
            for e in files
            if all(
                e["partition"].get(f) is None
                or str(e["partition"].get(f)) in vs
                for f, vs in allowed.items()
            )
        ]

    def scan(
        self, name: str, where: list[tuple[str, str, Any]] | None = None
    ) -> tuple[DataFrame, int, int]:
        """Filtered scan with manifest-level partition pruning — the
        ``newScan().filter().planTasks()`` analogue (reference #5).

        ``where`` is a list of (column, op, literal) with op in
        {==, >=, <=, >, <, in, isnull, notnull} (for ``in`` the literal
        is a list of members; for isnull/notnull it is ignored — pass
        None). Null-predicate pruning runs on the manifest's per-file
        null counts: IS NULL skips zero-null files, IS NOT NULL skips
        all-null files, and an all-null column fails every comparison
        even without min/max stats. Predicates on partition-transform source
        columns prune files by their manifest partition values, and ALL
        predicates are still applied row-level as residuals. Equality and
        membership predicates additionally prune through BUCKET
        transforms (Iceberg bucket-pruning for point lookups): the
        literal's bucket is computed with the same xxhash64 the writer
        used — one driver-side single-row job per scan, never a data
        pass — and only files of matching buckets are planned.
        Returns (df, files_planned, files_total).

        Planning is O(segments) driver-side against the COLUMNAR
        segment manifests: a selective scan materializes only the
        segments its summary pruning keeps (executor-parallel above
        ``SCAN_DIST_SEGMENTS`` surviving segments — the Iceberg
        distributed-planning shape); a broad scan over an all-clean
        snapshot plans from the segments' ``path`` columns alone at
        Arrow speed, never building per-entry dicts. Snapshots whose
        state needs the full entry semantics (delete attachments,
        external files, schema defaults/renames, legacy JSON segments)
        fall back to materialized planning — identical results, just
        driver-side."""
        fast = self._plan_scan_fast(name, where)
        if fast is not None:
            raw, files, paths_layout, total = fast
            if paths_layout is not None:
                df = self._read_clean_paths(name, raw, paths_layout)
                planned = total
            else:
                spec = self._spec(raw)
                files = self._prune_buckets(raw, spec, files, where or [])
                planned = len(files)
                df = self._read_files(name, raw, files)
            pred = _predicate(where or [])
            if pred is not None:
                df = df.filter(pred)
            return df, planned, total
        m = self._load_manifest(name)
        spec = self._spec(m)
        files = m["files"]
        total = len(files)
        # SEGMENT-level pre-prune (Iceberg's manifest-file partition-
        # summary trick): identity-partition predicates are checked once
        # against each segment's [min, max] partition summary, so a
        # partition-scoped scan of a million-file table evaluates
        # per-entry predicates only over the matching segments' entries
        # — O(segments + survivors), not O(table). Purely an upper-bound
        # filter: every surviving entry still passes _may_match below.
        layout = m.get("_seg_layout")
        seg_stats = m.get("_seg_stats")
        if layout and seg_stats and where:
            cand: list[dict] = []
            off = 0
            for sid, cnt in layout:
                if _seg_may_match(spec, seg_stats.get(sid), where):
                    cand.extend(files[off : off + cnt])
                off += cnt
        else:
            cand = files
        files = [e for e in cand if _may_match(spec, e, where or [])]
        files = self._prune_buckets(m, spec, files, where or [])
        df = self._read_files(name, m, files)
        pred = _predicate(where or [])
        if pred is not None:
            df = df.filter(pred)
        return df, len(files), total

    # surviving-segment count at or above which entry pruning runs
    # executor-parallel over the columnar segment files instead of in
    # driver Python (class attr so tests can force either path)
    SCAN_DIST_SEGMENTS = 64

    def _plan_scan_fast(self, name, where):
        """O(segments) scan planning against the raw (unmaterialized)
        manifest. Returns ``(raw, files, paths_layout, total)`` — with
        either ``files`` (pruned entry dicts, selective scan) or
        ``paths_layout`` (``(paths, layout)``, broad all-clean scan) set
        — or None when this snapshot's state needs the materialized
        path."""
        try:
            v = self._current_version(name)
            raw = self._manifest_raw(name, v)
        except FileNotFoundError:
            return None
        segs = raw.get("segments")
        if segs is None:
            return None
        stats = raw.get("seg_stats") or {}
        if any("n" not in (stats.get(sid) or {}) for sid in segs):
            return None
        spec = self._spec(raw)
        total = sum(stats[sid]["n"] for sid in segs)
        w = where or []
        if w:
            surv = [
                sid
                for sid in segs
                if _seg_may_match(spec, stats.get(sid), w)
            ]
            files = self._pruned_entries(name, surv, spec, w)
            if files is None:
                return None
            return raw, files, None, total
        plan = self._broad_plan(name, raw)
        if plan is None:
            return None
        return raw, None, plan, total

    def _broad_plan(self, name: str, raw: dict):
        """(paths, layout) for a broad read of an all-clean snapshot —
        plannable from the columnar segments' ``path`` columns alone —
        or None when entry-level semantics are required."""
        segs = raw.get("segments")
        stats = raw.get("seg_stats") or {}
        if segs is None:
            return None
        if raw.get("global_eq_deletes") or raw.get("global_pos_deletes"):
            return None
        schema = StructType.fromJson(raw["schema"])
        for f in schema.fields:
            md = f.metadata or {}
            if md.get("former_names") or "initial_default" in md:
                return None
        lays: set[tuple] = set()
        for sid in segs:
            ss = stats.get(sid) or {}
            if not ss.get("clean") or "lay" not in ss:
                return None
            lays.update(tuple(l) for l in ss["lay"])
        if len(lays) > 1:
            return None
        paths = self._collect_seg_paths(name, segs)
        if paths is None:
            return None
        layout = list(next(iter(lays))) if lays else []
        return paths, layout

    def _collect_seg_paths(self, name: str, sids: list[str]):
        """Every entry path across ``sids`` — from the process cache
        when hot, else a vectorized single-column Arrow read of each
        columnar segment (no entry dicts). None if any segment predates
        the columnar format."""
        import pyarrow.parquet as papq

        def _one(sid: str):
            cached = self._seg_cache.get((name, sid))
            if cached is not None:
                return [e["path"] for e in cached]
            p = self._seg_path(name, sid)
            if not os.path.exists(p):
                return None
            return (
                papq.read_table(p, columns=["path"]).column(0).to_pylist()
            )

        if len(sids) > 4:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=8) as pool:
                chunks = list(pool.map(_one, sids))
        else:
            chunks = [_one(sid) for sid in sids]
        out: list[str] = []
        for c in chunks:
            if c is None:
                return None
            out.extend(c)
        return out

    def _pruned_entries(self, name: str, sids: list[str], spec, where):
        """Entries of the surviving segments that pass per-entry stats
        pruning. Driver-side for small segment counts; above
        ``SCAN_DIST_SEGMENTS`` the prune runs EXECUTOR-PARALLEL over
        the columnar segment files (one Arrow kernel per batch, only
        survivors come back to the driver) — the shape that keeps
        planning a 1M-file table off the driver's critical path."""
        if (
            len(sids) >= self.SCAN_DIST_SEGMENTS
            and self.spark is not None
        ):
            seg_paths = [self._seg_path(name, sid) for sid in sids]
            if all(os.path.exists(p) for p in seg_paths):
                return self._prune_entries_distributed(
                    seg_paths, spec, where
                )
        out: list[dict] = []
        for sid in sids:
            try:
                entries = self._seg_entries(name, sid)
            except FileNotFoundError:
                return None
            out.extend(e for e in entries if _may_match(spec, e, where))
        return out

    def _prune_entries_distributed(self, seg_paths, spec, where):
        """Executor-parallel entry pruning: Spark reads the columnar
        segment files (one task per segment split), reconstructs entries
        Arrow-batch-wise, applies the SAME ``_may_match`` kernel the
        driver path uses, and ships back only survivors as JSON —
        planning I/O and CPU scale out with the cluster, the driver
        parses O(survivors)."""
        sdf = self.spark.read.schema(
            "path string, partition string, records long, bytes long, "
            "rest string"
        ).parquet(*seg_paths)

        def _prune(batches):
            import pyarrow as pa

            for batch in batches:
                ents = _seg_rows_to_entries(
                    batch.column("path").to_pylist(),
                    batch.column("partition").to_pylist(),
                    batch.column("records").to_pylist(),
                    batch.column("bytes").to_pylist(),
                    batch.column("rest").to_pylist(),
                )
                keep = [
                    json.dumps(e, sort_keys=True)
                    for e in ents
                    if _may_match(spec, e, where)
                ]
                if keep:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array(keep, type=pa.string())], names=["e"]
                    )

        return [
            json.loads(r.e)
            for r in sdf.mapInArrow(_prune, "e string").collect()
        ]

    def _read_clean_paths(self, name: str, raw: dict, paths_layout):
        """Single-group read of an all-clean snapshot from its path list
        — the read half of the broad fast plan. Matches _read_files'
        one-group behavior exactly for the state _broad_plan admits (no
        deletes, no externals, no renamed/defaulted columns): basePath +
        explicit schema, hive partition columns restored by Spark's path
        parsing, path-only partition columns dropped."""
        paths, layout = paths_layout
        schema = StructType.fromJson(raw["schema"])
        names = {f.name for f in schema.fields}
        hidden = [k for k in layout if k not in names]
        read_schema = StructType(
            [
                StructField(f.name, _nested_nullable(f.dataType), True)
                for f in schema.fields
            ]
            + [StructField(h, StringType(), True) for h in hidden]
        )
        if not paths:
            return self.spark.createDataFrame([], schema)
        df = (
            self.spark.read.option(
                "basePath", os.path.join(self._dir(name), "data")
            )
            .schema(read_schema)
            .parquet(*[os.path.join(self._dir(name), p) for p in paths])
        )
        return df.select(
            *[
                F.col(f.name).cast(_nested_nullable(f.dataType))
                for f in schema.fields
            ]
        )

    # ------------------------------------------------------------- metadata
    def snapshots(self, name: str, ref: str = "main") -> DataFrame:
        """Snapshot history of a branch — the parent chain from its head
        (≙ ``table.snapshots()`` iteration, reference #27,
        aig/PartitionValueDebugger.java:164-196). With branches, snapshot
        ids are global but each branch sees only its own lineage."""
        rows = []
        for v in sorted(self._ancestors(name, self._resolve(name, ref=ref))):
            raw = self._manifest_raw(name, v)
            stats = raw.get("seg_stats") or {}
            segs = raw.get("segments")
            if segs is not None and all(
                {"n", "rec", "byt"} <= set(stats.get(sid) or ())
                for sid in segs
            ):
                # O(segments) rollup from the per-segment summaries —
                # snapshot inspection never touches entries
                n_f = sum(stats[sid]["n"] for sid in segs)
                n_r = sum(stats[sid]["rec"] for sid in segs)
                n_b = sum(stats[sid]["byt"] for sid in segs)
            else:
                m = self._load_manifest(name, v)
                n_f = len(m["files"])
                n_r = int(sum(e["records"] for e in m["files"]))
                n_b = int(sum(e["bytes"] for e in m["files"]))
            rows.append(
                (
                    raw["version"],
                    raw.get("parent"),
                    raw["operation"],
                    n_f,
                    int(n_r),
                    int(n_b),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "snapshot_id INT, parent INT, operation STRING, n_files INT, "
            "n_records BIGINT, total_bytes BIGINT",
        )

    def files(self, name: str, snapshot_id: int | None = None) -> DataFrame:
        """``files`` METADATA TABLE (≙ Iceberg ``table$files``): one row
        per live data file with its manifest metadata. Against columnar
        segments this is a DISTRIBUTED read — Spark scans the segment
        parquet files directly (column-pruned to the four exposed
        fields), so inspecting a 1M-file inventory is an executor job,
        not a driver materialization."""
        v = (
            self._current_version(name)
            if snapshot_id is None
            else snapshot_id
        )
        raw = self._manifest_raw(name, v)
        segs = raw.get("segments")
        if segs is not None and self.spark is not None:
            seg_paths = [self._seg_path(name, sid) for sid in segs]
            if seg_paths and all(os.path.exists(p) for p in seg_paths):
                return self.spark.read.schema(
                    "path string, partition string, records long, "
                    "bytes long"
                ).parquet(*seg_paths)
        m = self._load_manifest(name, v)
        rows = [
            (
                e["path"],
                json.dumps(e["partition"], sort_keys=True),
                int(e["records"]),
                int(e["bytes"]),
            )
            for e in m["files"]
        ]
        return self.spark.createDataFrame(
            rows, "path STRING, partition STRING, records BIGINT, bytes BIGINT"
        )

    def partitions(self, name: str) -> DataFrame:
        return (
            self.files(name)
            .groupBy("partition")
            .agg(
                F.count("*").alias("n_files"),
                F.sum("records").alias("n_records"),
                F.sum("bytes").alias("total_bytes"),
            )
        )

    def partition_stats(
        self, name: str, snapshot_id: int | None = None
    ) -> DataFrame:
        """``partitions`` served from MAINTAINED stats (≙ Iceberg's
        partition statistics files): every segment records its
        per-partition [n_files, n_records, n_bytes] rollup in the
        manifest's segment summary when it is WRITTEN (O(delta) at
        commit — reused segments keep their rollups by reference), so
        this read folds O(segments x partitions-per-segment) summary
        maps with ZERO entry decodes and zero data reads — while
        :meth:`partitions` recomputes the same table from the full file
        inventory every call. Value-identical to :meth:`partitions` at
        every snapshot (gated in tests); segments predating the rollup
        field fall back to a one-time entry decode."""
        v = (
            self._current_version(name)
            if snapshot_id is None
            else snapshot_id
        )
        folded = self._fold_partition_stats(name, v)
        if folded is None:
            # legacy non-segmented manifest: recompute from the
            # inventory AT THE REQUESTED SNAPSHOT (partitions() always
            # reads the head)
            return (
                self.files(name, v)
                .groupBy("partition")
                .agg(
                    F.count("*").alias("n_files"),
                    F.sum("records").alias("n_records"),
                    F.sum("bytes").alias("total_bytes"),
                )
            )
        return self.spark.createDataFrame(
            [(k, *vals) for k, vals in sorted(folded.items())],
            "partition STRING, n_files BIGINT, n_records BIGINT, "
            "total_bytes BIGINT",
        )

    def _fold_partition_stats(
        self, name: str, version: int
    ) -> dict[str, list[int]] | None:
        """The maintained-stats fold shared by :meth:`partition_stats`
        and the ``snaptable`` connector's ``partitions`` metadata table:
        canonical-partition-JSON -> [n_files, n_records, n_bytes],
        O(segments x partitions-per-segment) with zero entry decodes on
        current-format segments. None for legacy non-segmented
        manifests (callers recompute from the inventory)."""
        raw = self._manifest_raw(name, version)
        segs = raw.get("segments")
        if segs is None:
            return None
        seg_stats = raw.get("seg_stats", {})
        folded: dict[str, list[int]] = {}
        for sid in segs:
            pr = (seg_stats.get(sid) or {}).get("pr")
            if pr is None:  # pre-rollup segment: decode once, same math
                pr = {}
                for e in self._seg_entries(name, sid):
                    k = json.dumps(e["partition"], sort_keys=True)
                    slot = pr.setdefault(k, [0, 0, 0])
                    slot[0] += 1
                    slot[1] += int(e["records"])
                    slot[2] += int(e["bytes"])
            for k, (nf, nr, nb) in pr.items():
                slot = folded.setdefault(k, [0, 0, 0])
                slot[0] += nf
                slot[1] += nr
                slot[2] += nb
        return folded

    def rollback(self, name: str, snapshot_id: int) -> int:
        m = self._load_manifest(name, snapshot_id)
        m["operation"] = "rollback"
        m["parent"] = self._current_version(name)
        return self._commit(name, m)

    def read_incremental(
        self, name: str, from_snapshot: int, to_snapshot: int | None = None
    ) -> DataFrame:
        """Rows appended strictly after ``from_snapshot`` up to
        ``to_snapshot`` (≙ Iceberg incremental scan, the CDC-lite pattern
        that lets a downstream job process only the new data each run).
        Like Iceberg, only append snapshots are readable incrementally —
        a replace/delete/merge in the range raises (its files mix old and
        new rows)."""
        to_v = self._current_version(name) if to_snapshot is None else to_snapshot
        m_to = self._load_manifest(name, to_v)
        chain: list[dict] = []  # (from, to] walking parent links
        v: int | None = to_v
        while v is not None and v != from_snapshot:
            m = self._load_manifest(name, v)
            # compact-deletes is row-equivalent and adds no data files:
            # incremental reads walk straight through it (maintenance
            # must not break downstream incremental consumers)
            if m["operation"] not in ("append", "compact-deletes"):
                raise ValueError(
                    f"snapshot {v} is {m['operation']!r}: incremental read "
                    "only spans append snapshots (Iceberg semantics)"
                )
            chain.append(m)
            v = m.get("parent")
        if v is None:
            raise ValueError(
                f"snapshot {from_snapshot} is not an ancestor of {to_v}"
            )
        seen = {e["path"] for e in self._load_manifest(name, from_snapshot)["files"]}
        new_files: list[dict] = []
        for m in reversed(chain):
            for e in m["files"]:
                if e["path"] not in seen:
                    seen.add(e["path"])
                    new_files.append(e)
        return self._read_files(name, m_to, new_files)

    def changelog(
        self, name: str, from_snapshot: int, to_snapshot: int | None = None
    ) -> DataFrame:
        """Row-level change stream between two snapshots (≙ Iceberg's
        ``create_changelog_view`` / Delta's change data feed): every row
        inserted or deleted in ``(from_snapshot, to_snapshot]``, tagged
        with ``_change_type`` ('insert' | 'delete') and the
        ``_snapshot_id`` that committed it, in commit order. An update is
        its delete+insert pair, per CDC convention.

        Semantics per commit, derived from the manifest file diff (never
        a full-table diff — only the files each commit touched are read):

        - ``append``: rows of the added files are inserts.
        - ``replace`` / ``rewrite-deletes`` (compaction): skipped — the
          data is equivalent by construction.
        - copy-on-write ``overwrite``/``delete``/``update``/``merge``:
          rows of removed files are deletes, rows of added files are
          inserts, and carry-over rows (unchanged rows rewritten only
          because they shared a file with a changed row — Iceberg's
          'carry-over' class) are cancelled with an ``exceptAll`` in each
          direction, scoped to the affected files only.
        - ``delete-mor``: no file moved; the rows matching the
          newly-attached delete predicates (evaluated against the file's
          PARENT-visible content, so stacked deletes don't double-count)
          are deletes.

        Rows are read under each commit's own schema and aligned by name
        (columns added later read as NULL for earlier commits)."""
        from functools import reduce as _reduce

        to_v = self._current_version(name) if to_snapshot is None else to_snapshot
        chain: list[dict] = []
        v: int | None = to_v
        while v is not None and v != from_snapshot:
            m = self._load_manifest(name, v)
            chain.append(m)
            v = m.get("parent")
        if v is None:
            raise ValueError(
                f"snapshot {from_snapshot} is not an ancestor of {to_v}"
            )
        parts: list[DataFrame] = []
        for m in reversed(chain):  # commit order
            op = m["operation"]
            if op in ("replace", "rewrite-deletes", "compact-deletes", "rollback"):
                continue  # row-equivalent by construction: no changes
            pm = self._load_manifest(name, m["parent"])
            parent_files = {e["path"]: e for e in pm["files"]}
            child_files = {e["path"]: e for e in m["files"]}
            added = [e for p, e in child_files.items() if p not in parent_files]
            removed = [e for p, e in parent_files.items() if p not in child_files]
            ins = self._read_files(name, m, added) if added else None
            dels = self._read_files(name, pm, removed) if removed else None
            # merge-on-read: same path, more delete predicates than before
            for p, e in child_files.items():
                pe = parent_files.get(p)
                if pe is None:
                    continue
                old_n = len(pe.get("deletes", []))
                new_preds = e.get("deletes", [])[old_n:]
                if new_preds:
                    conds = [
                        F.coalesce(
                            _predicate([tuple(c) for c in w]), F.lit(False)
                        )
                        for w in new_preds
                    ]
                    hit = self._read_files(name, pm, [pe]).filter(
                        _reduce(lambda a, b: a | b, conds)
                    )
                    dels = hit if dels is None else dels.unionByName(hit)
                # equality deletes: rows of the file's PARENT-visible
                # content matching the newly-attached key set (semi-join
                # per key-column set; parent visibility means stacked
                # deletes never double-count a row)
                old_e = len(pe.get("eq_deletes", []))
                new_eq = e.get("eq_deletes", [])[old_e:]
                by_cols: dict[tuple, list[str]] = {}
                for d in new_eq:
                    by_cols.setdefault(tuple(d["cols"]), []).append(d["path"])
                for cols, dpaths in by_cols.items():
                    dk = self.spark.read.parquet(
                        *[os.path.join(self._dir(name), dp) for dp in dpaths]
                    ).distinct()
                    base = self._read_files(name, pm, [pe])
                    hit = base.join(
                        F.broadcast(dk),
                        on=_null_safe_eq(base, dk, list(cols)),
                        how="left_semi",
                    )
                    dels = hit if dels is None else dels.unionByName(hit)
                # positional deletes: parent-visible rows of the file at
                # the newly-deleted (file, row) coordinates
                old_p = len(pe.get("pos_deletes", []))
                new_pos = e.get("pos_deletes", [])[old_p:]
                if new_pos:
                    pk = (
                        self.spark.read.parquet(
                            *[
                                os.path.join(self._dir(name), d["path"])
                                for d in new_pos
                            ]
                        )
                        .select("_file_name", "_pos")
                        .distinct()
                    )
                    base = self._read_files(
                        name, pm, [pe], with_positions=True
                    )
                    hit = base.join(
                        F.broadcast(pk), on=["_file_name", "_pos"], how="left_semi"
                    ).drop("_file_name", "_pos")
                    dels = hit if dels is None else dels.unionByName(hit)
            if ins is not None and dels is not None:
                ins, dels = ins.exceptAll(dels), dels.exceptAll(ins)
            for df, tag in ((ins, "insert"), (dels, "delete")):
                if df is not None:
                    parts.append(
                        df.withColumn("_change_type", F.lit(tag)).withColumn(
                            "_snapshot_id", F.lit(int(m["version"]))
                        )
                    )
        if not parts:
            schema = self.schema(name).add("_change_type", "string").add(
                "_snapshot_id", "long"
            )
            return self.spark.createDataFrame([], schema)
        return _reduce(
            lambda a, b: a.unionByName(b, allowMissingColumns=True), parts
        )

    def diff_refs(
        self, name: str, to_ref: str, from_ref: str = "main"
    ) -> DataFrame:
        """Row-level change stream between two REFS — "what would
        publishing this branch change?", the write-audit-publish review
        step: diff the audit branch against main BEFORE
        :meth:`fast_forward`, inspect/validate the +/- rows, then
        publish. Same per-commit manifest-diff semantics as
        :meth:`changelog` (appends → inserts, overwrites → delete+insert
        with carry-over cancellation, MoR deletes surfaced), and the
        same precondition as fast_forward itself: ``from_ref``'s head
        must be an ancestor of ``to_ref``'s head — so the diff is
        exactly the commit chain a publish would make visible, and
        applying it to ``from_ref`` reproduces the branch head
        row-for-row (the fast-forward-equivalence invariant, pytest in
        tests/test_table_manager.py)."""
        _s, frm = self._ref_head(name, from_ref)
        _s2, to = self._ref_head(name, to_ref)
        if frm < 0:
            raise ValueError(f"ref {from_ref!r} does not exist on {name!r}")
        if to < 0:
            raise ValueError(f"ref {to_ref!r} does not exist on {name!r}")
        return self.changelog(name, from_snapshot=frm, to_snapshot=to)

    def expire_snapshots(
        self,
        name: str,
        keep_last: int = 1,
        orphan_ttl_s: float | None = None,
        older_than: float | None = None,
    ) -> dict[str, int]:
        """Retire expired snapshots and delete data files no surviving
        snapshot references (≙ Iceberg ``expire_snapshots`` +
        ``remove_orphan_files`` — the maintenance loop that stops
        metadata and storage growing without bound under streaming
        appends + compaction). Time travel remains valid only for
        surviving snapshots.

        Retention policy: without ``older_than``, keep the newest
        ``keep_last`` snapshots of the main chain (count-based). With
        ``older_than`` (epoch seconds), production AGE-based retention:
        every main-chain snapshot committed at/after the cutoff survives,
        plus the newest ``keep_last`` regardless of age (the head can
        never expire) — ≙ Iceberg's ``expire_snapshots(older_than=...,
        retain_last=...)``. Either way, EVERYTHING reachable from any
        branch head or tag is ref-pinned and survives (Iceberg: refs pin
        history) — except as a PER-REF POLICY (:meth:`set_ref_policy`)
        says otherwise: an over-``max_ref_age_ms`` branch/tag is removed
        here (then expires normally), a branch with
        ``max_snapshot_age_ms`` stops pinning ancestors older than that
        age, and ``min_snapshots_to_keep`` floors that expiry with the
        newest N (by itself it expires nothing — Iceberg semantics).
        ``orphan_ttl_s`` additionally removes crashed writers'
        staging dirs whose newest write is older than the ttl (≙
        remove_orphan_files' ``older_than`` guard: never set it below
        the longest plausible in-flight write)."""
        main_chain = sorted(
            self._ancestors(name, self._current_version(name))
        )
        keep = set(main_chain[-keep_last:])
        if older_than is not None:
            # raw manifests: the age check must not materialize
            # inventories for snapshots about to be dropped
            keep |= {
                v
                for v in main_chain
                if self._manifest_raw(name, v).get("committed_at", 0.0)
                >= older_than
            }
        # per-ref retention (≙ Iceberg max-ref-age-ms /
        # min-snapshots-to-keep): over-age refs are REMOVED here — their
        # snapshots then expire by the normal rules below — and a branch
        # carrying min_snapshots_to_keep pins only its newest N
        # ancestors instead of its whole history. Refs without a policy
        # keep today's conservative behavior (full ancestry pinned).
        removed_refs = 0
        heads = os.path.join(self._meta_dir(name), "heads")
        if os.path.isdir(heads):
            for b in os.listdir(heads):
                if b == "main":
                    continue
                pol = self._ref_policy(name, b)
                age_cap = pol.get("max_ref_age_ms")
                if (
                    age_cap is not None
                    and self._ref_age_ms(name, b) > age_cap
                ):
                    self.drop_branch(name, b)
                    removed_refs += 1
                    continue
                anc = self._ancestors(name, self._ref_head(name, b)[1])
                # per-ref max_snapshot_age_ms expires branch ancestry;
                # min_snapshots_to_keep FLOORS it (newest N survive any
                # age) and by itself expires nothing — Iceberg's exact
                # split of the two knobs (min-snapshots-to-keep is never
                # a cap; a policy-less or age-less branch pins its full
                # ancestry)
                snap_age_cap = pol.get("max_snapshot_age_ms")
                if snap_age_cap is not None:
                    import time as _time

                    floor_n = max(1, int(pol.get("min_snapshots_to_keep") or 1))
                    cutoff = _time.time() - snap_age_cap / 1000.0
                    anc = [
                        v
                        for i, v in enumerate(anc)
                        if i < floor_n
                        or self._manifest_raw(name, v).get(
                            "committed_at", 0.0
                        )
                        >= cutoff
                    ]
                keep |= set(anc)
        tags = os.path.join(self._meta_dir(name), "tags")
        if os.path.isdir(tags):
            for t in os.listdir(tags):
                pol = self._ref_policy(name, t)
                age_cap = pol.get("max_ref_age_ms")
                if (
                    age_cap is not None
                    and self._ref_age_ms(name, t) > age_cap
                ):
                    self.drop_tag(name, t)
                    removed_refs += 1
                    continue
                with open(os.path.join(tags, t)) as f:
                    keep |= set(self._ancestors(name, int(f.read().strip())))
        # everything else — expired main history AND orphaned loser
        # manifests from lost commit CASes — goes
        drop = [
            v
            for v in range(self._max_manifest_version(name) + 1)
            if v not in keep and os.path.exists(self._manifest_path(name, v))
        ]
        def _paths(entry: dict, owned_only: bool = False) -> list[str]:
            # a manifest entry references its data file AND any
            # equality-/position-delete files attached to it — all live.
            # owned_only (the REMOVAL walk) excludes external data files
            # (add_files-registered): the table never owns them, so
            # expiry must never delete them — their attached delete
            # files ARE table-owned and reap normally
            data = (
                []
                if owned_only and entry.get("external")
                else [entry["path"]]
            )
            return (
                data
                + [d["path"] for d in entry.get("eq_deletes", [])]
                + [d["path"] for d in entry.get("pos_deletes", [])]
            )

        live: set[str] = set()
        live_segs: set[str] = set()
        for v in keep:
            mm = self._load_manifest(name, v)
            live_segs.update(sid for sid, _ in mm.get("_seg_layout") or [])
            for e in mm["files"]:
                live.update(_paths(e))
            live.update(
                g["path"]
                for g in (
                    mm.get("global_eq_deletes", [])
                    + mm.get("global_pos_deletes", [])
                )
            )
        removed_files = removed_snaps = 0
        drop_segs: set[str] = set()
        for v in drop:
            dm = self._load_manifest(name, v)
            drop_segs.update(sid for sid, _ in dm.get("_seg_layout") or [])
            dropped_paths = [
                p for e in dm["files"] for p in _paths(e, owned_only=True)
            ] + [
                g["path"]
                for g in (
                    dm.get("global_eq_deletes", [])
                    + dm.get("global_pos_deletes", [])
                )
            ]
            for p in dropped_paths:
                if p not in live:
                    fp = os.path.join(self._dir(name), p)
                    if os.path.exists(fp):
                        os.remove(fp)
                        removed_files += 1
                    live.add(p)  # count each orphan once
            os.remove(self._manifest_path(name, v))
            removed_snaps += 1
        # segment files no surviving snapshot references (metadata twin
        # of the data-file reap above; dropped AFTER every dropped
        # manifest's inventory was materialized)
        for sid in drop_segs - live_segs:
            for sp in (
                self._seg_path(name, sid),
                self._seg_path_legacy(name, sid),
            ):
                if os.path.exists(sp):
                    os.remove(sp)
            self._seg_cache_drop((name, sid))
        # crash-orphaned segments: a writer that died between segment
        # write and manifest create leaves segments NO manifest ever
        # referenced — invisible to the drop-based reap above. Age-gate
        # them like staging dirs (an in-flight commit's segments are
        # always younger than any sane ttl).
        if orphan_ttl_s is not None:
            import time as _time

            segs_dir = self._segs_dir(name)
            if os.path.isdir(segs_dir):
                now = _time.time()
                for fn in os.listdir(segs_dir):
                    sid = os.path.splitext(fn)[0] if "." in fn else fn
                    p = os.path.join(segs_dir, fn)
                    if (
                        sid not in live_segs
                        and now - os.path.getmtime(p) > orphan_ttl_s
                    ):
                        os.remove(p)
                        self._seg_cache_drop((name, sid))
            # delete files no manifest ever referenced (a writer that
            # crashed between staging the equality/positional delete
            # parquet and committing the attach — the write-first delete
            # path's crash window): same age gate, same invariant (every
            # REFERENCED delete file is in `live` via _paths/global
            # descriptors above, so only true orphans can pass)
            del_dir = os.path.join(self._dir(name), "deletes")
            if os.path.isdir(del_dir):
                now = _time.time()
                for fn in os.listdir(del_dir):
                    rel = os.path.join("deletes", fn)
                    p = os.path.join(del_dir, fn)
                    if (
                        rel not in live
                        and now - os.path.getmtime(p) > orphan_ttl_s
                    ):
                        os.remove(p)
        # orphaned staging from crashed writers (≙ remove_orphan_files'
        # other half): a staging dir is invisible by design, so one whose
        # last write is older than orphan_ttl_s can only be a crash
        # leftover — no writer stages for that long before committing
        removed_staging = 0
        if orphan_ttl_s is not None:
            import shutil as _sh
            import time as _time

            sdir = os.path.join(self._dir(name), "_staging")
            if os.path.isdir(sdir):
                now = _time.time()
                for d in os.listdir(sdir):
                    p = os.path.join(sdir, d)
                    newest = max(
                        (
                            os.path.getmtime(os.path.join(root, f))
                            for root, _dd, ff in os.walk(p)
                            for f in ff
                        ),
                        default=os.path.getmtime(p),
                    )
                    if now - newest > orphan_ttl_s:
                        _sh.rmtree(p, ignore_errors=True)
                        removed_staging += 1
        return {
            "snapshots": removed_snaps,
            "files": removed_files,
            "refs": removed_refs,
            "staging": removed_staging,
        }

    # ------------------------------------------------------------ compaction
    def compact_partitions(
        self,
        name: str,
        small_file_bytes: int | None = None,
        min_files: int = 2,
    ) -> dict[str, int]:
        """Targeted maintenance — the 100 TB-viable form of :meth:`compact`:
        rewrite ONLY partitions fragmented by frequent small appends
        (>= ``min_files`` files with at least one under ``small_file_bytes``,
        default a quarter of the target file size). Everything else is
        untouched — a full-table rewrite is infeasible once the table is
        large, and unnecessary: streaming ingest fragments the recent
        partitions only.

        Concurrency: commits with a rebase that keeps files added by a
        concurrent append; a concurrent commit that removed any file being
        rewritten aborts the rewrite (Iceberg ``rewrite_data_files``
        validation semantics)."""
        m = self._load_manifest(name)
        target = int(
            m["properties"].get("write.target-file-size-bytes", 128 * 1024 * 1024)
        )
        small = small_file_bytes if small_file_bytes is not None else target // 4
        groups: dict[tuple, list[dict]] = {}
        for e in m["files"]:
            groups.setdefault(tuple(sorted(e["partition"].items())), []).append(e)
        affected: list[dict] = []
        for entries in groups.values():
            if len(entries) >= min_files and any(e["bytes"] < small for e in entries):
                affected.extend(entries)
        if not affected:
            return {"version": m["version"], "rewritten": 0, "added": 0}
        df = self._read_files(name, m, affected)
        if not self._spec(m):
            # partitioned tables coalesce through _write_files' partition
            # co-location shuffle; an UNPARTITIONED rewrite has no such
            # shuffle, and the file source assigns each small file its
            # own task (openCost-dominated splits), so without an
            # explicit repartition the "compaction" would re-emit one
            # small file per input file — size the output to the target
            df = df.repartition(
                int(max(1, -(-sum(e["bytes"] for e in affected) // target)))
            )
        new_files = self._write_files(name, df, self._spec(m))
        rewritten = {e["path"] for e in affected}

        def apply(base: dict) -> dict:
            paths = {e["path"] for e in base["files"]}
            if not rewritten <= paths:
                raise CompactionConflict(
                    "concurrent commit removed files being rewritten; aborting"
                )
            out = dict(base)
            out["files"] = [
                e for e in base["files"] if e["path"] not in rewritten
            ] + new_files
            out["operation"] = "rewrite-data-files"
            out["parent"] = base["version"]
            return out

        v = self._commit(name, apply(m), rebase=apply)
        return {"version": v, "rewritten": len(rewritten), "added": len(new_files)}

    _ZBITS = 16  # bin resolution per z-order dimension

    def _zvalue(self, m: dict, cols: list[str]) -> Column:
        """Z-order key: each column is uniformly binned to _ZBITS bits
        between its manifest-global min and max (the stats already in the
        manifest — no extra pass over the data), and the bins'
        bits are interleaved. Pure JVM expressions (shift/and/or), no UDF.
        Numeric and timestamp columns only; NULL and degenerate (min==max)
        values bin to 0."""
        schema = StructType.fromJson(m["schema"])
        n = len(cols)
        binned = []
        for c in cols:
            dt = schema[c].dataType.typeName()
            if dt not in {
                "integer", "long", "short", "byte", "float", "double",
                "timestamp", "timestamp_ntz", "date",
            }:
                raise ValueError(f"zorder column {c!r} has type {dt}; only "
                                 "numeric/timestamp/date columns are supported")
            stats = [e["stats"][c] for e in m["files"] if c in e.get("stats", {})]
            if not stats:
                raise ValueError(f"no column stats for zorder column {c!r}")
            lo = min(s[0] for s in stats)
            hi = max(s[1] for s in stats)
            v = F.col(c)
            if dt in {"timestamp", "timestamp_ntz"}:
                # manifest stats are ISO strings; epoch-seconds both sides
                # (UTC — bin edges only affect locality, never correctness)
                import calendar
                import datetime as _dt

                lo = calendar.timegm(_dt.datetime.fromisoformat(lo).timetuple())
                hi = calendar.timegm(_dt.datetime.fromisoformat(hi).timetuple())
                v = v.cast("timestamp").cast("double")
            elif dt == "date":
                import datetime as _dt

                epoch = _dt.date(1970, 1, 1).toordinal()
                lo = _dt.date.fromisoformat(lo).toordinal() - epoch
                hi = _dt.date.fromisoformat(hi).toordinal() - epoch
                v = F.datediff(v, F.lit("1970-01-01"))
            v = v.cast("double")
            if hi <= lo:
                binned.append(F.lit(0).cast("long"))
                continue
            scale = (2**self._ZBITS - 1) / float(hi - lo)
            b = F.floor((v - F.lit(float(lo))) * F.lit(scale)).cast("long")
            binned.append(
                F.coalesce(F.greatest(F.least(b, F.lit(2**self._ZBITS - 1)),
                                      F.lit(0)), F.lit(0))
            )
        z = F.lit(0).cast("long")
        for bit in range(self._ZBITS):
            for j, b in enumerate(binned):
                z = z.bitwiseOR(
                    F.shiftleft(b.bitwiseAND(F.lit(1 << bit)), bit * (n - 1) + j)
                )
        return z

    def compact(
        self,
        name: str,
        target_bytes: int | None = None,
        sort_by: list[str] | None = None,
        zorder: list[str] | None = None,
    ) -> int:
        """``rewrite_data_files`` analogue: coalesce small files per
        partition up to write.target-file-size-bytes, commit as a REPLACE
        snapshot. After streaming/micro-batch appends this is what keeps
        scans fast (reference sets the target size, #24; real compaction is
        north-star).

        ``sort_by`` additionally clusters the rewrite (range partition +
        sort within files, ≙ ``rewrite_data_files(strategy => 'sort')``):
        each output file then covers a narrow value range, so parquet
        min/max row-group stats prune scans on those columns — the cheap
        80% of what Z-ordering buys, for single-column-dominant filters.

        ``zorder`` clusters on the interleaved-bits space-filling curve
        (≙ ``rewrite_data_files(strategy => 'sort', sort_order =>
        'zorder(a, b)')``): every listed dimension gets narrow per-file
        min/max ranges simultaneously, so predicates on ANY of them skip
        files — what a linear sort only gives its leading column."""
        m = self._load_manifest(name)
        target = target_bytes or int(
            m["properties"].get("write.target-file-size-bytes", 128 * 1024 * 1024)
        )
        spec = self._spec(m)
        df = self._read_files(name, m, m["files"])
        total_bytes = sum(e["bytes"] for e in m["files"])
        n_out = int(max(1, -(-total_bytes // target)))  # ceil
        if sort_by and zorder:
            raise ValueError("sort_by and zorder are mutually exclusive")
        if zorder:
            cluster = [self._zvalue(m, zorder)]
        elif sort_by:
            cluster = [F.col(c) for c in sort_by]
        else:
            cluster = None
        if cluster:
            df = df.repartitionByRange(n_out, *cluster)
        else:
            df = df.repartition(n_out)
        new_files = self._write_files(name, df, spec, sort_within=cluster)
        m["files"] = new_files
        m["operation"] = "replace"
        # every file was rewritten post-delete: folded global deletes are
        # fully materialized (their seq guards would no-op against the
        # fresh births anyway) — drop them so expiry can reap the files
        m.pop("global_eq_deletes", None)
        m.pop("global_pos_deletes", None)
        m["parent"] = m["version"]
        return self._commit(name, m)


_INT_RANGES = {
    "byte": (-(1 << 7), (1 << 7) - 1),
    "short": (-(1 << 15), (1 << 15) - 1),
    "integer": (-(1 << 31), (1 << 31) - 1),
    "long": (-(1 << 63), (1 << 63) - 1),
}


def _validate_initial_default(default: Any, dtype: str) -> None:
    """Reject an initial default that doesn't fit the declared type at
    DDL time — otherwise the two read faces diverge (Spark's lenient
    cast silently truncates, the connector's Arrow cast raises)."""
    t = _parse_dtype(dtype).typeName()
    bad = (
        (t in _INT_RANGES and (isinstance(default, bool)
                               or not isinstance(default, int)
                               or not _INT_RANGES[t][0] <= default
                               <= _INT_RANGES[t][1]))
        or (t in ("float", "double") and (isinstance(default, bool)
                                          or not isinstance(default,
                                                            (int, float))))
        or (t == "string" and not isinstance(default, str))
        or (t == "boolean" and not isinstance(default, bool))
    )
    if bad:
        raise ValueError(
            f"initial default {default!r} does not fit column type {dtype}"
        )


def _apply_schema_ddl(schema_json: dict, entry: dict) -> dict:
    """Validate + apply one staged-DDL txn entry to a schema — shared by
    stage-time validation (fail fast, before any publish) and apply-time
    re-derivation (rebase-safe over foreign appends; a foreign DDL that
    invalidates the entry raises and aborts the record)."""
    schema = StructType.fromJson(schema_json)
    kind = entry["kind"]
    if kind == "add-column":
        col, dtype = entry["col"], entry["dtype"]
        default = entry.get("default")
        if col in schema.fieldNames():
            raise ValueError(f"column {col!r} already exists")
        if any(
            col in f.metadata.get("former_names", []) for f in schema.fields
        ):
            raise ValueError(f"{col!r} is a former name of a renamed column")
        if default is not None:
            _validate_initial_default(default, dtype)
        if default is not None:
            schema = schema.add(
                StructField(
                    col,
                    _parse_dtype(dtype),
                    True,
                    {"initial_default": _norm_stat(default)},
                )
            )
        else:
            schema = schema.add(col, dtype, True)
    elif kind == "widen-column":
        col, to_type = entry["col"], entry["to_type"]
        if col not in schema.fieldNames():
            raise ValueError(f"no such column {col!r}")
        old = schema[col].dataType.typeName()
        if (
            old,
            to_type,
        ) not in ParquetTableManager._WIDENINGS and old != to_type:
            raise ValueError(
                f"cannot widen {col!r} {old} -> {to_type}: only "
                f"{sorted(ParquetTableManager._WIDENINGS)} are "
                "value-preserving"
            )
        fields = [
            StructField(
                f.name,
                StructType.fromDDL(f"x {to_type}")[0].dataType
                if f.name == col
                else f.dataType,
                f.nullable,
                f.metadata,
            )
            for f in schema.fields
        ]
        schema = StructType(fields)
    else:
        raise ValueError(f"unknown DDL kind {kind!r}")
    return json.loads(schema.json())


class Transaction:
    """Staged multi-table commit — see
    :meth:`ParquetTableManager.transaction` for the protocol. Appends,
    upserts, and SCHEMA DDL (add_column / widen_column): each
    :meth:`append` runs the distributed write NOW, so ``commit()`` is
    pure metadata. A staged DDL applies atomically with the data —
    appends staged after it write files under the evolved schema, and
    the rollback of a committed txn restores the pre-txn schema along
    with the pre-txn file set (the rollback manifest IS the pre-txn
    manifest). rename_column / drop_column are REFUSED inside
    transactions: both carry merge-on-read delete-binding guards that
    must be evaluated against the head they commit on, and a txn's
    publish→apply window would reorder them past foreign epochs."""

    def __init__(self, mgr: ParquetTableManager):
        self.mgr = mgr
        self._staged: list[dict] = []
        self._done = False
        # per-(table, ref) schema as projected by staged DDL, so later
        # staged appends align (and write) the evolved shape
        self._schemas: dict[tuple[str, str], dict] = {}

    def _head_schema(self, name: str, ref: str, m: dict) -> dict:
        return self._schemas.get((name, ref), m["schema"])

    def add_column(
        self,
        name: str,
        col: str,
        dtype: str,
        default: Any = None,
        ref: str = "main",
    ) -> "Transaction":
        """Stage ``add_column`` to land atomically with the txn's data
        (the evolve-then-backfill shape: new column + the backfill that
        fills it, one commit point across any number of tables)."""
        return self._stage_ddl(
            name,
            ref,
            {"kind": "add-column", "col": col, "dtype": dtype,
             **({"default": default} if default is not None else {})},
        )

    def widen_column(
        self, name: str, col: str, to_type: str, ref: str = "main"
    ) -> "Transaction":
        """Stage ``widen_column`` (int→long, float→double) to land
        atomically with the txn's data."""
        return self._stage_ddl(
            name, ref, {"kind": "widen-column", "col": col, "to_type": to_type}
        )

    def rename_column(self, *_a, **_k):
        raise ValueError(
            "rename_column is not supported inside a transaction: its "
            "merge-on-read delete-binding guard must be evaluated on the "
            "head it commits against; run it as a standalone commit"
        )

    def drop_column(self, *_a, **_k):
        raise ValueError(
            "drop_column is not supported inside a transaction: its "
            "merge-on-read delete-binding guard must be evaluated on the "
            "head it commits against; run it as a standalone commit"
        )

    def _stage_ddl(self, name: str, ref: str, spec: dict) -> "Transaction":
        if self._done:
            raise ValueError("transaction already committed")
        mgr = self.mgr
        _seq, head = mgr._ref_head(name, ref)
        if head < 0:
            raise ValueError(f"branch {ref!r} does not exist on {name!r}")
        m = mgr._load_manifest(name, head)
        # fail fast at stage time against head schema + prior staged DDL
        projected = _apply_schema_ddl(self._head_schema(name, ref, m), spec)
        self._schemas[(name, ref)] = projected
        self._staged.append(
            {"table": name, "ref": ref, "op": "ddl", **spec}
        )
        return self

    def append(self, name: str, df: DataFrame, ref: str = "main") -> "Transaction":
        if self._done:
            raise ValueError("transaction already committed")
        mgr = self.mgr
        _seq, head = mgr._ref_head(name, ref)
        if head < 0:
            raise ValueError(f"branch {ref!r} does not exist on {name!r}")
        m = mgr._load_manifest(name, head)
        fields = StructType.fromJson(self._head_schema(name, ref, m)).fields
        aligned = df.select(
            *[
                F.col(f.name)
                if f.name in df.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in fields
            ]
        )
        files = mgr._write_files(name, aligned, mgr._spec(m))
        for s in self._staged:
            if (
                s["table"] == name
                and s.get("ref", "main") == ref
                and s.get("op") is None
                # never merge across a staged-DDL boundary: post-DDL
                # appends must apply AFTER the schema change
                and (name, ref) not in self._schemas
            ):
                s["added"] = s["added"] + files
                return self
        self._staged.append({"table": name, "ref": ref, "added": files})
        return self

    def upsert(
        self, name: str, df: DataFrame, keys: list[str], ref: str = "main"
    ) -> "Transaction":
        """Stage a merge-on-read upsert epoch (equality-delete file + the
        batch's data files — :meth:`ParquetTableManager.upsert_equality`
        semantics) to land atomically with the transaction's other
        staged operations: the fact-and-dim-CDC-epoch-together shape.
        The delete file's attachment to existing files is resolved at
        APPLY time against the then-current head, so commits that win
        in between correctly fall under the delete (sequence order).
        An upsert staged AFTER a staged DDL aligns (and writes) the
        evolved schema, same as :meth:`append`."""
        if self._done:
            raise ValueError("transaction already committed")
        entry = self.mgr._stage_upsert(
            name, df, keys, schema_json=self._schemas.get((name, ref))
        )
        self._staged.append({"table": name, "ref": ref, **entry})
        return self

    def commit(self) -> dict[str, int]:
        """Publish the txn record (the atomic commit point), then apply
        the per-table head advances. Returns {table: new version}. A
        crash after publish is repaired by the next reader of any
        involved table; a crash before publish leaves only invisible
        staged files."""
        if self._done:
            raise ValueError("transaction already committed")
        if not self._staged:
            raise ValueError("nothing staged")
        self._done = True
        seq = self.mgr._publish_txn(self._staged)
        self.txn_id = seq  # handle for rollback_transaction
        return self.mgr._apply_txn(seq, {"entries": self._staged})


# --------------------------------------------------- Iceberg (env-gated)


def iceberg_conf(warehouse: str, catalog: str = "lake") -> dict[str, str]:
    """Spark conf for a real Iceberg catalog — used when the
    iceberg-spark-runtime jar is on the classpath (not bundled in this
    container; set SPARK_GRAFT_ICEBERG_JAR to enable). The engine's table
    layer then swaps for native ``CREATE TABLE ... USING iceberg`` with the
    same transform set (PARTITIONED BY (tenant, days(ts), ...)) — the
    deployment target the reference hand-rolls against AWS Glue
    (Main.java:46-53)."""
    conf = {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
    jar = os.environ.get("SPARK_GRAFT_ICEBERG_JAR")
    if jar:
        conf["spark.jars"] = jar
    return conf
