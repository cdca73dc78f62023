"""Snapshot-manifest tables: lakehouse commit semantics on plain parquet.

The reference runs its tables on Iceberg/Delta/Hudi — snapshot commits,
`rewrite_data_files` compaction + `expire_snapshots`
(pipelines/01-kafka-flink-iceberg/Makefile:186-221,
iceberg_maintenance_dag.py:30-80), Hudi upsert
(pipelines/22-hudi-cdc-storage/spark/jobs/silver_transform.py:101-114).
delta-spark is unavailable in this environment, but the COMMIT PROTOCOL
those formats share does not need a library — it is a filesystem
discipline, implemented here from first principles:

* a table is a directory of immutable, uniquely-named parquet files
  plus `_manifests/v{NNNNNN}.json`, each manifest listing exactly the
  files that make up one snapshot;
* readers resolve the highest manifest version and read ONLY its file
  list — a half-written data file or an in-flight compaction is
  invisible because no manifest references it yet (snapshot isolation
  without locks);
* writers stage data files first, then publish with an `O_CREAT|O_EXCL`
  create of the next version file — the filesystem arbitrates racing
  committers, the loser gets `CommitConflict` and retries on the new
  snapshot (optimistic concurrency, the Delta protocol's shape);
* old manifests stay readable (time travel) until `expire` removes
  manifests and `vacuum` deletes data files no retained snapshot
  references — the Iceberg maintenance pair.

At 100 TB the same layout holds: manifests are O(files) metadata, data
files never move or mutate, and compaction is a rewrite + one metadata
commit. Manifests additionally carry per-file column MIN/MAX stats
(read from the parquet footers at commit — the Iceberg manifest-entry
`lower_bounds`/`upper_bounds` idea), so point/range reads prune files
BEFORE Spark plans the scan. (Production formats add a catalog/log
store for cross-writer atomicity on object stores without atomic
create — out of scope here.)
"""

from __future__ import annotations

import datetime
import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(Exception):
    """Another writer published this version first — reload and retry."""


def zorder_key(c1, c2, bits: int = 21) -> Column:
    """Morton (Z-order) interleave of two non-negative integer columns
    — the multi-column clustering key. `write(cluster_by=["_z"])` over
    this key gives every file a bounded range in BOTH dimensions, so
    min/max skipping prunes on either predicate column; linear
    clustering on one column prunes only that column. ``bits`` bounds
    each input (values >= 2^bits interleave but lose locality in the
    high bits). Pure JVM bit arithmetic — whole-stage-codegen-able,
    no UDF."""
    x = F.col(c1) if isinstance(c1, str) else c1
    y = F.col(c2) if isinstance(c2, str) else c2
    x, y = x.cast("long"), y.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        # disjoint bit positions → addition IS the bitwise OR here
        z = (
            z
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


_MANIFEST_DIR = "_manifests"
_BATCHES_MARKER = "_batches"  # durable committed-batch-id log (streaming sink)


@dataclass(frozen=True)
class Snapshot:
    version: int
    files: tuple[str, ...]  # relative to the table root
    operation: str
    committed_at: float
    # per-file column stats: {rel_path: {col: {"min", "max", "null_count",
    # "num_rows"}}}; {} for pre-stats manifests (no pruning, still correct)
    stats: dict = field(default_factory=dict)
    # table schema as Spark JSON — schema evolution is a METADATA event
    # (Delta's metadata action): readers apply this union schema, so a
    # file written before a column existed reads as NULLs instead of the
    # column silently vanishing when that file gets schema-sampled.
    # None for pre-schema manifests (reader falls back to mergeSchema).
    schema_json: str | None = None
    # merge-on-read deletion vectors: {data_file_rel: dv_parquet_rel}.
    # The DV parquet holds (file_path, row_index) rows to SKIP; a file
    # absent here reads whole. {} for CoW-only / pre-DV manifests.
    dvs: dict = field(default_factory=dict)


def _stat_encode(v):
    """JSON-safe, ORDER-PRESERVING encoding for stat bounds and predicate
    values: dates/timestamps render as ISO strings (lexicographic order
    == chronological order at fixed precision), numbers/strings/bools
    pass through, anything else (binary, nested) is unprunable.

    Timezone discipline: pyarrow returns parquet TIMESTAMP (adjusted-to-
    UTC) stats as tz-AWARE datetimes, while predicate values are usually
    tz-NAIVE session wall-clock. Rendering both through the same naive
    strftime would let a string compare wrongly prove a file disjoint in
    a non-UTC session. Aware values are therefore normalized to UTC and
    encoded as a ``["utc", iso]`` list; naive values stay plain strings.
    The two encodings deliberately do NOT inter-compare — list vs str
    raises TypeError, which `_provably_empty` treats as "keep the file"
    — so mixed-awareness comparisons can never prune (pruning is never
    a correctness decision; the exact filter still runs on the scan)."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        # fixed-width so lexicographic compare stays chronological
        if v.tzinfo is not None:
            return [
                "utc",
                v.astimezone(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f"),
            ]
        return v.strftime("%Y-%m-%dT%H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    return None


_OPS = ("==", "!=", "<", "<=", ">", ">=", "in")


def _bloom_encode(v) -> str | None:
    """Type-tagged rendering for bloom membership. ONLY types whose
    equality is exact and whose rendering cannot collide across types
    are bloomable (bool/int/str/date): floats (binary-vs-decimal
    rendering) and TIMESTAMPS (naive/aware ambiguity — see
    `_stat_encode`) are excluded, because a bloom MISS prunes the
    file, so any encoding mismatch between written value and predicate
    value would silently drop matching rows. Plain DATEs are safe:
    calendar equality has no timezone to disagree about. The datetime
    check must precede the date check — datetime SUBCLASSES date, and
    letting a timestamp slip through as "d:" would resurrect exactly
    the awareness hazard the exclusion exists for. Returns None for
    unbloomable values."""
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, str):
        return f"s:{v}"
    if isinstance(v, datetime.datetime):
        return None
    if isinstance(v, datetime.date):
        return f"d:{v.isoformat()}"
    return None


def _bloom_build(values, m_bits: int, k: int = 4) -> dict | None:
    """Bloom filter over a file's column values → {"b": hex, "m", "k",
    "t": type tag}, or None when any value is unbloomable OR the values
    mix type tags (the whole column opts out for this file — absent
    bloom never prunes). The written column's tag rides in the entry so
    the read side can refuse to prune on a CROSS-TYPE predicate: a str
    '7' probe against an int-column bloom is a guaranteed encoding miss,
    but Spark's exact filter would match via implicit cast — pruning on
    that miss would be a correctness decision, which blooms must never
    make. md5-derived bit positions: stable across processes, engines
    and Python hash seeds."""
    bits = 0
    tag = None
    for v in values:
        if v is None:
            continue  # equality predicates never match NULL
        enc = _bloom_encode(v)
        if enc is None:
            return None
        t = enc[: enc.index(":")]
        if tag is None:
            tag = t
        elif t != tag:
            return None  # mixed-type column: no single tag to pin
        h = hashlib.md5(enc.encode("utf-8")).digest()
        for i in range(k):
            bits |= 1 << (int.from_bytes(h[i * 4 : (i + 1) * 4], "big") % m_bits)
    if tag is None:
        return None  # all-NULL: min/max null accounting prunes, not blooms
    return {"b": format(bits, "x"), "m": m_bits, "k": k, "t": tag}


def _bloom_maybe_contains(bloom: dict, value) -> bool:
    """False ONLY when the bloom proves the value absent (all-bits test
    failed) AND the predicate value's type tag matches the column's
    written tag; True on any doubt — unbloomable predicate value,
    malformed entry, missing or mismatched tag (cross-type equality may
    still match via Spark's implicit cast) — so bloom pruning stays a
    pure optimization, never a correctness decision."""
    enc = _bloom_encode(value)
    if enc is None or not isinstance(bloom, dict) or "b" not in bloom:
        return True
    if bloom.get("t") != enc[: enc.index(":")]:
        return True  # cross-type (or legacy untagged) probe: can't prove absent
    bits = int(bloom["b"], 16)
    m_bits, k = int(bloom["m"]), int(bloom["k"])
    h = hashlib.md5(enc.encode("utf-8")).digest()
    return all(
        (bits >> (int.from_bytes(h[i * 4 : (i + 1) * 4], "big") % m_bits)) & 1
        for i in range(k)
    )


def _provably_empty(file_stats: dict, predicate: list[tuple]) -> bool:
    """True only when the file's stats for some conjunct PROVE no row
    can satisfy it: [min, max] disjoint from the predicate range, or —
    for equality — a bloom-filter miss. Unknown stats / incomparable
    types → False (keep the file)."""
    for col, op, value in predicate:
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r}; use one of {_OPS}")
        s = file_stats.get(col)
        if not s:
            continue
        if op == "in":
            # the disjunctive op (col ∈ values): the file is provably
            # empty only when EVERY value is provably absent — the
            # write-side mirror of `read_any_of`'s any-of file test.
            # An empty value list matches no row: always provably empty.
            if all(
                _provably_empty(file_stats, [(col, "==", v)]) for v in value
            ):
                return True
            continue
        if op == "==" and "bloom" in s and value is not None:
            if not _bloom_maybe_contains(s["bloom"], value):
                return True
        lo, hi, nulls, rows = s.get("min"), s.get("max"), s.get("null_count"), s.get("num_rows")
        v = _stat_encode(value)
        if v is None:
            continue
        # an all-NULL file matches no comparison predicate
        if nulls is not None and rows is not None and nulls == rows:
            return True
        if lo is None or hi is None:
            continue
        try:
            if op == "==" and (v < lo or v > hi):
                return True
            if op == "!=" and lo == hi == v and not nulls:
                return True
            if op == "<" and lo >= v:
                return True
            if op == "<=" and lo > v:
                return True
            if op == ">" and hi <= v:
                return True
            if op == ">=" and hi < v:
                return True
        except TypeError:
            continue  # cross-type compare: keep the file
    return False


def _predicate_column(predicate: list[tuple]) -> Column:
    """The same conjunction as a Spark filter — applied on top of the
    pruned scan so results are exact however coarse the stats are."""
    cond = F.lit(True)
    for col, op, value in predicate:
        c = F.col(col)
        if op == "in":
            vals = list(value)
            cond = cond & (c.isin(vals) if vals else F.lit(False))
            continue
        cond = cond & {
            "==": c == value, "!=": c != value,
            "<": c < value, "<=": c <= value,
            ">": c > value, ">=": c >= value,
        }[op]
    return cond


def _footer_stats(abs_path: str) -> dict:
    """Per-column min/max/null_count/num_rows from the parquet FOOTER
    (no data pages read) — the same numbers Iceberg persists as
    manifest-entry bounds. Columns missing stats in ANY row group are
    recorded without bounds (unprunable); nested columns are skipped."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(abs_path).metadata
    out: dict = {}
    dropped: set = set()
    for rg in range(meta.num_row_groups):
        g = meta.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name or name in dropped:
                continue
            s = col.statistics
            ent = out.setdefault(
                name, {"min": None, "max": None, "null_count": 0, "num_rows": 0}
            )
            ent["num_rows"] += g.num_rows
            if s is None or s.null_count is None:
                dropped.add(name)
                continue
            ent["null_count"] += s.null_count
            if g.num_rows == s.null_count:
                continue  # all-NULL group: no bounds to merge, still prunable
            if not s.has_min_max:
                dropped.add(name)
                continue
            lo, hi = _stat_encode(s.min), _stat_encode(s.max)
            if lo is None or hi is None:
                dropped.add(name)
                continue
            ent["min"] = lo if ent["min"] is None or lo < ent["min"] else ent["min"]
            ent["max"] = hi if ent["max"] is None or hi > ent["max"] else ent["max"]
    # a column with unusable stats in ANY row group carries no entry at
    # all — conservatively unprunable rather than partially accounted
    for name in dropped:
        out.pop(name, None)
    return out


class ManifestTable:
    """A parquet table whose visible state is defined by its latest
    version manifest, never by directory listing."""

    def __init__(
        self,
        path: str,
        bloom_cols: list[str] | None = None,
        bloom_bits: int = 8192,
        bloom_max_ndv: int = 2000,
    ):
        """``bloom_cols`` opts columns into per-file BLOOM skipping for
        equality predicates (the Delta/Iceberg bloom-index class):
        min/max bounds prune range queries but do nothing for point
        lookups on high-cardinality columns whose per-file ranges all
        overlap — a bloom miss proves the key absent and skips the
        file. Write-time cost: one column read per staged file (unlike
        the footer-only min/max pass — that is the same trade Delta's
        bloom index makes). ``bloom_bits`` sizes the filter (8192 bits
        = 1 KiB/col/file ≈ 2% false-positive at 1k distinct values);
        files with more than ``bloom_max_ndv`` distinct values skip the
        bloom (a saturated filter prunes nothing and bloats the
        manifest). Bloom entries ride in the per-file stats, so readers
        need no table-level config and tables written with different
        settings interoperate; false positives only cost an un-pruned
        file — never correctness (the exact filter still runs).

        The table path is canonicalized (``os.path.realpath``) at init,
        and deletion vectors key rows on the TABLE-RELATIVE file path
        (scheme + this directory stripped from the scan's
        ``_metadata.file_path`` before both write and anti-join — see
        `_dv_key_col`), so DV identity survives any path-identity drift:
        symlinked or relative handles, AND physically moving the table
        directory (the stable-file-id property production formats get
        from their metadata layer). Migration note for tables whose DVs
        were written by versions that stored ABSOLUTE scan URIs: reads
        normalize the stored rows through the same stripper, which
        recovers them as long as the directory has not moved since —
        run `compact()` (it applies and clears vectors) before moving
        such a table or re-pointing a symlinked handle recorded under
        a different realpath."""
        self.path = os.path.realpath(path)
        self.bloom_cols = list(bloom_cols or [])
        self.bloom_bits = bloom_bits
        self.bloom_max_ndv = bloom_max_ndv
        os.makedirs(os.path.join(self.path, _MANIFEST_DIR), exist_ok=True)

    def _dv_key_col(self, fp: Column) -> Column:
        """Normalize a file-path value to the TABLE-RELATIVE form DV
        rows key on: strip an optional URI scheme plus this table's
        canonical directory (``file:///root/t/data-x/p.parquet`` and
        ``/root/t/data-x/p.parquet`` both become ``data-x/p.parquet``).
        Applied identically to the scan's ``_metadata.file_path`` at
        write AND read, and to stored DV rows (which recovers
        legacy absolute-URI vectors on an unmoved table), so the
        anti-join key is relocation-proof by construction."""
        import re as _re

        pat = (
            "^([a-zA-Z][a-zA-Z0-9+.-]*:)?/*"
            + _re.escape(self.path.lstrip("/"))
            + "/"
        )
        return F.regexp_replace(fp, pat, "")

    # -- snapshot resolution ------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.path, _MANIFEST_DIR, f"v{version:06d}.json")

    def versions(self) -> list[int]:
        names = os.listdir(os.path.join(self.path, _MANIFEST_DIR))
        return sorted(
            int(n[1:7]) for n in names if n.startswith("v") and n.endswith(".json")
        )

    def snapshot(self, version: int | None = None) -> Snapshot:
        vs = self.versions()
        if not vs:
            return Snapshot(version=0, files=(), operation="empty", committed_at=0.0)
        v = version if version is not None else vs[-1]
        if v not in vs:
            raise ValueError(f"version {v} expired or never existed; have {vs}")
        with open(self._manifest_path(v)) as f:
            m = json.load(f)
        return Snapshot(
            version=v,
            files=tuple(m["files"]),
            operation=m["operation"],
            committed_at=m["committed_at"],
            stats=m.get("stats", {}),
            schema_json=m.get("schema"),
            dvs=m.get("dvs", {}),
        )

    # -- read ---------------------------------------------------------------

    def files_for(
        self, predicate: list[tuple] | None = None, version: int | None = None
    ) -> list[str]:
        """The snapshot's file list, pruned by per-file min/max stats.

        ``predicate`` is a conjunction of ``(col, op, value)`` triples,
        op ∈ {==, !=, <, <=, >, >=, in} (``in`` takes a value LIST —
        the disjunctive point-lookup shape GDPR id-set erasure needs;
        a file survives iff its stats admit at least one value, the
        write-side mirror of `read_any_of`). A file is skipped only when its
        stats PROVE no row can match (min/max disjoint from the
        predicate range) — files without stats for the column, or with
        incomparable types, are conservatively kept, so pruning is
        always an optimization, never a correctness decision."""
        snap = self.snapshot(version)
        if not predicate:
            return list(snap.files)
        return [
            f
            for f in snap.files
            if not _provably_empty(snap.stats.get(f, {}), predicate)
        ]

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        predicate: list[tuple] | None = None,
    ) -> DataFrame:
        """Read one immutable snapshot (latest by default; pass a version
        for time travel). An empty table reads as an empty frame only if
        a schema-bearing snapshot ever existed — reading version 0 of a
        never-written table is an error by design.

        With ``predicate`` (see `files_for`), the scan opens ONLY the
        files whose stats admit a match — file-level data skipping, the
        half of partition pruning Iceberg/Delta do from manifest stats —
        and the row-level filter is applied on top, so the result is
        exactly the predicate rows regardless of how coarse the stats
        are. At 100 TB this is the difference between a full-table scan
        and touching a handful of files for a date-range query."""
        snap = self.snapshot(version)
        if not snap.files:
            raise ValueError(f"{self.path} has no committed snapshot to read")
        files = self.files_for(predicate, version)
        if not files:
            # every file pruned: empty frame with the table's schema
            df = self._read_files(spark, [snap.files[0]], snap)
            return df.filter(F.lit(False))
        df = self._read_files_applying_dvs(spark, files, snap)
        if predicate:
            df = df.filter(_predicate_column(predicate))
        return df

    def read_any_of(
        self,
        spark: SparkSession,
        col: str,
        values: list,
        version: int | None = None,
    ) -> DataFrame:
        """Point-lookup scan for ``col ∈ values`` — the DISJUNCTIVE form
        of `read`'s conjunctive predicate, in ONE job: a file is opened
        iff its stats (min/max, bloom when present) admit AT LEAST ONE
        of the values; a single DV-applying scan over the surviving
        files takes an IN-list row filter on top. This is the probe
        shape index readers need (IVF-PQ probed cells, a BM25 query
        vocabulary against clustered postings): per-value `read()`
        calls would each plan a separate scan+job, multiplying job
        overhead by |values| for the same bytes."""
        snap = self.snapshot(version)
        if not snap.files:
            raise ValueError(f"{self.path} has no committed snapshot to read")
        vals = list(values)
        empty_schema = lambda: self._read_files(  # noqa: E731
            spark, [snap.files[0]], snap
        ).filter(F.lit(False))
        if not vals:
            return empty_schema()
        files = [
            f
            for f in snap.files
            if any(
                not _provably_empty(snap.stats.get(f, {}), [(col, "==", v)])
                for v in vals
            )
        ]
        if not files:
            return empty_schema()
        return self._read_files_applying_dvs(spark, files, snap).filter(
            F.col(col).isin(vals)
        )

    def _read_files(self, spark: SparkSession, files: list[str], snap: Snapshot) -> DataFrame:
        """Scan table-relative files under the snapshot's schema
        contract: the manifest-tracked union schema when present (files
        written before a column existed read that column as NULL),
        else parquet mergeSchema (pre-schema manifests) — never a
        single-file schema sample, which silently drops late columns."""
        paths = [os.path.join(self.path, f) for f in files]
        if snap.schema_json:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(snap.schema_json))
            return spark.read.schema(schema).parquet(*paths)
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def _read_files_applying_dvs(
        self, spark: SparkSession, files: list[str], snap: Snapshot
    ) -> DataFrame:
        """Scan ``files`` with the snapshot's deletion vectors applied:
        rows whose (file_path, row_index) appear in a referenced DV are
        anti-joined away. Files without a DV take the plain fast path
        (no metadata columns, no join)."""
        with_dv = [f for f in files if f in snap.dvs]
        if not with_dv:
            return self._read_files(spark, files, snap)
        # split the scan: only DV-bearing files pay the metadata
        # projection + anti-join; everything else reads plain and
        # unions back — in the common shape (a handful of files carry
        # vectors after a selective delete) most of the table keeps the
        # vector-free fast path
        plain = [f for f in files if f not in snap.dvs]
        dv_paths = sorted({snap.dvs[f] for f in with_dv})
        df = self._read_files(spark, with_dv, snap).select(
            "*",
            self._dv_key_col(F.col("_metadata.file_path")).alias("_dv_fp"),
            F.col("_metadata.row_index").alias("_dv_ri"),
        )
        # stored rows pass through the same normalizer: new DVs are
        # already relative (no-op), legacy absolute-URI DVs recover
        dv = spark.read.parquet(*[os.path.join(self.path, d) for d in dv_paths]).select(
            self._dv_key_col(F.col("file_path")).alias("_dv_fp"),
            F.col("row_index").alias("_dv_ri"),
        )
        # no broadcast hint: AQE broadcasts small vectors at runtime and
        # falls back to a shuffled anti-join when a vector outgrows it
        out = df.join(dv, ["_dv_fp", "_dv_ri"], "left_anti").drop("_dv_fp", "_dv_ri")
        if plain:
            out = self._read_files(spark, plain, snap).unionByName(out)
        return out

    # -- write / commit -----------------------------------------------------

    def _stage(self, df: DataFrame) -> list[str]:
        """Write data files under a unique staging name, return their
        table-relative paths. Files are invisible until a manifest
        references them."""
        stage_rel = f"data-{uuid.uuid4().hex[:12]}"
        stage_abs = os.path.join(self.path, stage_rel)
        df.write.mode("overwrite").parquet(stage_abs)
        rels = []
        for root, _dirs, names in os.walk(stage_abs):
            for n in names:
                if n.endswith(".parquet"):
                    rels.append(os.path.relpath(os.path.join(root, n), self.path))
        return sorted(rels)

    def _merged_schema_json(self, base_json: str | None, df: DataFrame) -> str:
        """Union the committed table schema with an incoming frame's:
        existing columns must keep their type (no silent widening —
        evolve explicitly via overwrite), new columns append. The
        result is the metadata-tracked schema every reader applies."""
        from pyspark.sql.types import StructType

        if not base_json:
            return df.schema.json()
        base = StructType.fromJson(json.loads(base_json))
        by_name = {f.name: f for f in base.fields}
        out = list(base.fields)
        for f in df.schema.fields:
            have = by_name.get(f.name)
            if have is None:
                out.append(f)
            elif have.dataType != f.dataType:
                raise ValueError(
                    f"schema evolution conflict on column {f.name!r}: committed "
                    f"{have.dataType.simpleString()} vs incoming "
                    f"{f.dataType.simpleString()} — type changes require an "
                    "explicit overwrite"
                )
        return StructType(out).json()

    def _stats_for(self, files: list[str]) -> dict:
        """Footer min/max stats per staged file — O(files) metadata reads,
        no data pages (the cost Iceberg pays at commit for its
        manifest-entry bounds) — plus, for opted-in ``bloom_cols``, a
        per-file equality bloom (one column read per file, see
        ``__init__``)."""
        out = {f: _footer_stats(os.path.join(self.path, f)) for f in files}
        if self.bloom_cols:
            import pyarrow.parquet as pq

            for f in files:
                pf = pq.ParquetFile(os.path.join(self.path, f))
                present = [c for c in self.bloom_cols if c in pf.schema_arrow.names]
                if not present:
                    continue
                tbl = pf.read(columns=present)
                for c in present:
                    distinct = set(tbl.column(c).to_pylist())
                    distinct.discard(None)
                    if not distinct or len(distinct) > self.bloom_max_ndv:
                        continue  # saturated/empty blooms prune nothing
                    bloom = _bloom_build(distinct, self.bloom_bits)
                    if bloom is not None:
                        out[f].setdefault(c, {})["bloom"] = bloom
        return out

    def _commit(
        self,
        version: int,
        files: list[str],
        operation: str,
        stats: dict | None = None,
        schema_json: str | None = None,
        dvs: dict | None = None,
    ) -> Snapshot:
        """Publish `files` as snapshot `version` — atomically, via
        O_CREAT|O_EXCL on the version file: exactly one racing writer
        can create it; everyone else gets CommitConflict."""
        payload = json.dumps(
            {
                "files": files,
                "operation": operation,
                "committed_at": time.time(),
                "stats": stats or {},
                "schema": schema_json,
                "dvs": dvs or {},
            }
        )
        try:
            fd = os.open(
                self._manifest_path(version), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} of {self.path} was committed concurrently"
            ) from e
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        return self.snapshot(version)

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        cluster_by: list[str] | None = None,
        n_files: int | None = None,
        expected_base_version: int | None = None,
    ) -> Snapshot:
        """Commit a new snapshot: `overwrite` replaces the visible file
        set, `append` extends it. Data is staged before the metadata
        commit, so a crash mid-write leaves the table at its previous
        snapshot (plus orphan files for `vacuum`).

        ``cluster_by`` range-partitions and sorts the data on the given
        columns before writing (Delta OPTIMIZE ZORDER / Iceberg
        sort-order analogue for the linear case): each file then covers
        a narrow, mostly disjoint value range, which is what makes the
        footer min/max stats in `files_for` actually prune — stats on
        randomly-laid-out files overlap everywhere and skip nothing.
        At 100 TB, clustering the write is the difference between the
        manifest's data skipping touching 1% of files and 100%.
        ``n_files`` pins the range-partition count (size files toward
        the 128 MB target); left None, AQE sizes them — which on small
        relations coalesces to one file and leaves nothing to skip.

        ``expected_base_version`` makes the commit a TRUE compare-and-
        swap on the snapshot the caller decided from: the write raises
        `CommitConflict` unless the table is still at exactly that
        version, and the O_EXCL version-file create then guarantees the
        commit lands at ``expected_base_version + 1`` or not at all.
        Without it, `write` re-snapshots after staging and commits on
        whatever base it finds — fine for blind appends, but any caller
        that READ state to decide WHAT to write (an id stamped with the
        target version, an overwrite replacing rows it just rebuilt)
        must pin the base or a concurrent commit silently invalidates
        the decision (the Delta/Iceberg optimistic-concurrency check)."""
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode}")
        if cluster_by:
            cols = [F.col(c) for c in cluster_by]
            if n_files:
                df = df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)
            else:
                df = df.repartitionByRange(*cols).sortWithinPartitions(*cols)
        new_files = self._stage(df)
        new_stats = self._stats_for(new_files)
        base = self.snapshot()
        if expected_base_version is not None and base.version != expected_base_version:
            raise CommitConflict(
                f"{self.path}: expected base version {expected_base_version}, "
                f"found {base.version} — a concurrent commit landed first"
            )
        if mode == "overwrite":
            files, stats, dvs = new_files, new_stats, {}
            schema = df.schema.json()  # overwrite (re)sets the table schema
        else:
            files = list(base.files) + new_files
            stats = {**base.stats, **new_stats}
            schema = self._merged_schema_json(base.schema_json, df)
            dvs = dict(base.dvs)  # appended files are DV-free; kept ones ride
        return self._commit(base.version + 1, files, mode, stats, schema, dvs)

    def append_with_retry(
        self,
        df: DataFrame,
        max_attempts: int = 5,
        cluster_by: list[str] | None = None,
        n_files: int | None = None,
    ) -> Snapshot:
        """Optimistic-concurrency APPEND: the Delta/Iceberg conflict
        rule that append-only commits never semantically conflict —
        they only ADD files — so a racer that loses the version CAS
        (`CommitConflict`) can rebase on the winner's snapshot and
        retry, and every writer's rows land exactly once. Each retry
        re-stages the data (write stages before commit), so an
        abandoned attempt leaves only vacuum-able orphans, never
        table-visible rows. Overwrite/delete are deliberately NOT
        retried here: their outcome depends on the base state, so a
        blind rebase would silently drop the winner's effects — those
        callers must re-read and re-decide."""
        last: CommitConflict | None = None
        for _ in range(max_attempts):
            try:
                return self.write(
                    df, mode="append", cluster_by=cluster_by, n_files=n_files
                )
            except CommitConflict as exc:
                last = exc
        raise CommitConflict(
            f"append lost the version race {max_attempts} times: {last}"
        )

    def merge_upsert(
        self,
        updates: DataFrame,
        key_cols: list[str],
        precombine_col: str,
    ) -> Snapshot:
        """MERGE INTO analogue (Hudi upsert semantics via
        `maintenance.merge_upsert`): read latest snapshot, resolve one
        row per key (greatest precombine, updates win ties), commit the
        result as a new snapshot."""
        from .maintenance import merge_upsert

        spark = updates.sparkSession
        existing = self.read(spark)
        merged = merge_upsert(existing, updates, key_cols, precombine_col)
        return self.write(merged, mode="overwrite")

    def delete_where(
        self,
        spark: SparkSession,
        predicate: list[tuple],
        merge_on_read: bool = False,
    ) -> Snapshot:
        """DELETE WHERE, scoped by stats to ONLY the files that admit a
        match; files the manifest stats PROVE unaffected carry into the
        new snapshot by reference — a metadata no-op either way.

        Copy-on-write (default, Delta/Iceberg CoW): the admitting files
        are rewritten without the matching rows. At 100 TB a selective
        delete then rewrites a handful of files, not the table — the
        read-side skipping stats double as the write-side blast radius.

        ``merge_on_read=True`` writes DELETION VECTORS instead (the
        Delta DV / Iceberg positional-delete path): no data file is
        rewritten — one small sidecar parquet of (file_path, row_index)
        positions is staged and the snapshot maps each touched file to
        it; readers anti-join it away. The write costs one scan of the
        touched files and O(deleted rows) output no matter how large
        those files are — the right trade for frequent small deletes
        (GDPR erasure, late corrections); `compact()` later applies the
        vectors and returns the table to vector-free files. Touched
        files keep their ORIGINAL stats — an over-approximation, so
        pruning stays conservative, never wrong.

        Both modes keep every row where the predicate is NOT TRUE
        (SQL semantics): a NULL in the predicate column makes the
        conjunction NULL — CoW coalesces the survivor filter to FALSE,
        merge-on-read only marks rows where the predicate is TRUE.
        Older snapshots still see the deleted rows (time travel) until
        expire/vacuum.

        DV rows key on the TABLE-RELATIVE file path (`_dv_key_col`
        strips scheme + table directory from the scan's
        ``_metadata.file_path`` symmetrically at write and read), so
        vectors survive symlinked/relative handles AND a physical move
        of the table directory — the stable-file-id property production
        formats build into their metadata layer. Legacy vectors written
        as absolute URIs are recovered by the read-side normalizer as
        long as the directory has not moved since; `compact()` applies
        and clears them (the migration step before moving such a
        table)."""
        snap = self.snapshot()
        touched = sorted(self.files_for(predicate))
        touched_set = set(touched)
        keep = [f for f in snap.files if f not in touched_set]
        if not touched:
            return snap  # stats prove nothing matches: true no-op
        keep_dvs = {f: snap.dvs[f] for f in keep if f in snap.dvs}
        if merge_on_read:
            # positions to delete = predicate-TRUE rows of the touched
            # files. The metadata columns must be projected ON the scan
            # (they do not survive joins), so the existing-DV anti-join
            # is applied here rather than via the reading helper;
            # already-deleted rows therefore never re-enter. The new
            # sidecar carries the touched files' FULL vector (old
            # positions unioned in), so each file maps to exactly one
            # DV file per snapshot.
            scan = self._read_files(spark, touched, snap).select(
                "*",
                self._dv_key_col(F.col("_metadata.file_path")).alias("file_path"),
                F.col("_metadata.row_index").alias("row_index"),
            )
            old_paths = sorted({snap.dvs[f] for f in touched if f in snap.dvs})
            old = None
            if old_paths:
                old = spark.read.parquet(
                    *[os.path.join(self.path, d) for d in old_paths]
                ).select(
                    self._dv_key_col(F.col("file_path")).alias("file_path"),
                    "row_index",
                )
                scan = scan.join(old, ["file_path", "row_index"], "left_anti")
            new_dv = scan.filter(
                F.coalesce(_predicate_column(predicate), F.lit(False))
            ).select("file_path", "row_index")
            if new_dv.limit(1).count() == 0:
                return snap  # stats admitted files, but no row matches
            if old is not None:
                new_dv = new_dv.unionByName(old).distinct()
            (dv_rel,) = self._stage(new_dv.coalesce(1))
            dvs = {**keep_dvs, **{f: dv_rel for f in touched}}
            return self._commit(
                snap.version + 1,
                list(snap.files),
                "delete-mor",
                dict(snap.stats),
                snap.schema_json,
                dvs,
            )
        survivors = self._read_files_applying_dvs(spark, touched, snap).filter(
            ~F.coalesce(_predicate_column(predicate), F.lit(False))
        )
        new_files = self._stage(survivors)
        stats = {
            **{f: snap.stats[f] for f in keep if f in snap.stats},
            **self._stats_for(new_files),
        }
        return self._commit(
            snap.version + 1,
            keep + new_files,
            "delete",
            stats,
            snap.schema_json,
            keep_dvs,
        )

    # -- incremental consumption -------------------------------------------

    def diff_files(self, since: int, until: int | None = None) -> tuple[list[str], list[str]]:
        """(added, removed) data files between two snapshots — the
        file-level change set every incremental consumer starts from.
        Both endpoints must still be retained (expire() can prune)."""
        old = set(self.snapshot(since).files)
        new = set(self.snapshot(until).files)
        return sorted(new - old), sorted(old - new)

    def read_appended(
        self, spark: SparkSession, since: int, until: int | None = None
    ) -> DataFrame:
        """Rows in data files ADDED after snapshot ``since`` — the
        Iceberg incremental-append scan / Delta CDF (append-only)
        analogue: a backfill or downstream-refresh job reads exactly
        the new rows instead of re-scanning the table.

        Only sound when every commit in the range is an append: an
        overwrite/compact rewrites surviving rows into new files, which
        an added-files read would double-count. Enforced, not assumed —
        a non-append commit in the range raises ValueError (same
        contract as Iceberg's incremental scan failing over
        replace/overwrite snapshots; run it per append-window instead)."""
        vs = self.versions()
        until_v = until if until is not None else (vs[-1] if vs else 0)
        for v in vs:
            if since < v <= until_v:
                op = self.snapshot(v).operation
                if op != "append" and not op.startswith("stream-append"):
                    raise ValueError(
                        f"snapshot v{v} is '{op}', not an append — incremental "
                        "read across rewrites would double-count; read the "
                        "append windows on either side separately"
                    )
        added, _removed = self.diff_files(since, until_v)
        ref = self.snapshot(until_v)
        if not added:
            if not ref.files:
                raise ValueError(f"{self.path} has no files to derive a schema from")
            return self._read_files(spark, [ref.files[0]], ref).filter(F.lit(False))
        return self._read_files(spark, added, ref)

    # -- maintenance --------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        target_mb: int = 128,
        cluster_by: list[str] | None = None,
        zorder: tuple[str, str] | None = None,
        n_files: int | None = None,
    ) -> Snapshot:
        """rewrite_data_files analogue: rewrite the CURRENT snapshot
        into ~target-size files and commit the new layout as a
        metadata-only swap. Readers of older versions are untouched —
        their files still exist until vacuum.

        Plain call = binpack (Iceberg's default rewrite strategy).
        ``cluster_by`` re-sorts the rewrite on those columns (Delta
        `OPTIMIZE ... ZORDER BY(col)`'s linear case / Iceberg
        sort-order rewrite) — the maintenance-time twin of
        `write(cluster_by=...)`, for tables whose ingest arrived
        unsorted: after the rewrite every file covers a narrow value
        range and the manifest's min/max stats actually prune.
        ``zorder=(c1, c2)`` interleaves two integer columns with the
        Morton key (`zorder_key`) so BOTH dimensions prune — the true
        multi-column OPTIMIZE ZORDER. Data is unchanged either way;
        only layout and therefore skipping behavior move. ``n_files``
        pins the output file count (same knob as `write` — on small
        relations the byte-based target collapses to one file and
        leaves nothing to skip)."""
        if cluster_by and zorder:
            raise ValueError("pass cluster_by or zorder, not both")
        snap = self.snapshot()
        df = self.read(spark)
        total = sum(os.path.getsize(os.path.join(self.path, f)) for f in snap.files)
        n_out = n_files or max(1, round(total / (target_mb * 1024 * 1024)))
        if zorder:
            keyed = df.withColumn("_z", zorder_key(*zorder))
            out = (
                keyed.repartitionByRange(n_out, F.col("_z"))
                .sortWithinPartitions("_z")
                .drop("_z")
            )
            op = f"compact-zorder({zorder[0]},{zorder[1]})"
        elif cluster_by:
            cols = [F.col(c) for c in cluster_by]
            out = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
            op = f"compact-cluster({','.join(cluster_by)})"
        else:
            out = df.repartition(n_out)
            op = "compact"
        files = self._stage(out)
        return self._commit(
            snap.version + 1,
            files,
            op,
            self._stats_for(files),
            snap.schema_json or df.schema.json(),
        )

    def expire(self, keep_last: int = 1) -> list[int]:
        """expire_snapshots analogue: drop all but the newest
        ``keep_last`` manifests. Returns expired versions."""
        vs = self.versions()
        expired = vs[:-keep_last] if keep_last > 0 else vs
        for v in expired:
            os.remove(self._manifest_path(v))
        return expired

    def vacuum(self, older_than_s: float = 3600.0) -> list[str]:
        """remove_orphan_files analogue: delete data files no retained
        manifest references AND older than the retention grace
        (Iceberg remove_orphan_files' ``older_than``). The grace is
        what makes vacuum safe under concurrent writers: a racing
        writer's staged-but-not-yet-committed files are unreferenced by
        definition, and deleting them would make its subsequent commit
        publish dangling entries — files younger than the grace are
        left alone so an in-flight commit always beats the cleaner.
        Pass ``older_than_s=0`` only when no writer can be in flight
        (single-writer repair/test path)."""
        referenced = set()
        for v in self.versions():
            rsnap = self.snapshot(v)
            referenced.update(rsnap.files)
            referenced.update(rsnap.dvs.values())  # DV sidecars are live
        cutoff = time.time() - older_than_s
        removed = []
        for root, _dirs, names in os.walk(self.path):
            if _MANIFEST_DIR in root:
                continue
            for n in names:
                p = os.path.join(root, n)
                rel = os.path.relpath(p, self.path)
                if (
                    n.endswith(".parquet")
                    and rel not in referenced
                    and os.path.getmtime(p) <= cutoff
                ):
                    os.remove(p)
                    removed.append(rel)
        return removed


def write_stream_to_manifest(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming sink with exactly-once commits on the manifest log —
    the mechanism a Delta streaming sink uses, reproduced on the
    manifest protocol: every micro-batch appends ONE snapshot tagged
    with its batch id, and a replayed batch (foreachBatch reruns after
    a crash between sink write and checkpoint commit) is detected in
    the log and skipped, so rows land exactly once no matter where the
    failure hits. Single-writer per stream; a concurrent committer
    surfaces as CommitConflict rather than silent corruption.

    The committed-batch record is a dedicated append-only marker file
    (`_manifests/_batches`) DURABLE ACROSS SNAPSHOT RETENTION — if it
    lived only in manifest operation tags, `expire()` pruning the
    manifest that carried a tag would let a replayed micro-batch
    re-append and duplicate rows; the marker also makes the replay
    check O(1) file read instead of O(versions) manifest reads per
    batch. Crash window between manifest commit and marker append: the
    just-committed batch is by construction the LATEST snapshot (the
    marker for batch N is written before batch N+1 can commit), so the
    guard additionally checks only the newest snapshot's tag and
    repairs the marker when it hits.

    Returns the started StreamingQuery (caller awaits/stops).
    """
    table = ManifestTable(table_path)
    marker = os.path.join(table.path, _MANIFEST_DIR, _BATCHES_MARKER)

    def _committed_ids() -> set[str]:
        if not os.path.exists(marker):
            return set()
        with open(marker) as f:
            return {line.strip() for line in f if line.strip()}

    def _record(batch_id: int) -> None:
        with open(marker, "a") as f:
            f.write(f"{batch_id}\n")
            f.flush()
            os.fsync(f.fileno())

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        tag = f"stream-append:{batch_id}"
        if str(batch_id) in _committed_ids():
            return  # replayed batch: already durable, exactly-once holds
        base = table.snapshot()
        if base.operation == tag:
            # crashed between manifest commit and marker append — the
            # data is durable; repair the marker and skip
            _record(batch_id)
            return
        files = table._stage(batch_df)
        stats = table._stats_for(files)
        table._commit(
            base.version + 1,
            list(base.files) + files,
            tag,
            {**base.stats, **stats},
            table._merged_schema_json(base.schema_json, batch_df),
        )
        _record(batch_id)

    writer = stream.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
