"""ACID table sink: write-audit-publish over parquet (`sink_acid_table`).

``BASELINE.json:7`` names "Parquet/Delta" as the reference's sink surface;
delta-spark is not installable in this environment, so this module
implements the commit protocol that ACID table formats (Delta, Iceberg)
are built on — snapshot manifests + an atomically-swapped version pointer
— as a first-class, oracle-checkable operator (the sibling
``sources/delta_log.py`` additionally writes the REAL on-disk Delta
`_delta_log` format per the public protocol spec, closing the
format-interop side):

- **Write**: each commit stages its parquet files under a unique
  ``data/snap-<n>-<uuid>/`` directory.  Staged files are invisible to
  readers: readers never list the data directory, they read exactly the
  file set named by a published manifest.
- **Audit**: before publishing, the staged files are read back and
  validated (row count vs the plan's count, no nulls in audited columns).
  A failed audit aborts the commit — its files stay orphaned on disk but
  are unreachable through any manifest, so a half-written or corrupt
  commit can never be observed (atomicity + isolation).
- **Publish**: manifest ``_manifests/v<n>.json`` (previous snapshot's
  file list + this commit's files, or just this commit's for replace) is
  fully written to a temp file, then atomically linked to its versioned
  name — ``os.link`` both publishes and CASes (EEXIST = a concurrent
  committer won; rebase and retry).  On an object store / HDFS this
  becomes a conditional-put or metastore CAS — the protocol is
  unchanged; only the atomic primitive is storage-specific.
- **Time travel**: every published manifest remains readable by version.

At 100 TB the manifest holds file-level min/max stats for pruning; here it
holds the file list and row count, which is what the correctness gate can
check: after [commit A, commit N, FAILED commit of doubled-R rows, commit
R], the latest snapshot must aggregate to exactly the clean `lineitem`
oracle — a plain recursive directory read would double-count R.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register


class AuditError(RuntimeError):
    """Raised when a staged commit fails validation; nothing is published."""


class SnapshotTable:
    """Minimal snapshot-manifest table: parquet data files + versioned
    manifests + an atomically-swapped current-version pointer."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- version resolution -----------------------------------------------
    def current_version(self) -> int:
        """Latest PUBLISHED version = max manifest present.

        Manifests appear atomically (os.link of a fully-written temp
        file) only after a successful audit, so their listing IS the
        commit log — exactly how Delta resolves the latest snapshot from
        _delta_log.  No separate pointer file exists to go stale: a
        slow losing committer has nothing it could overwrite to roll
        visible state backward."""
        versions = [
            int(fn[1:-5])
            for fn in os.listdir(os.path.join(self.root, "_manifests"))
            if fn.startswith("v") and fn.endswith(".json")
        ]
        return max(versions, default=0)

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, "_manifests", f"v{version}.json")

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "files": [], "row_count": 0}
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    # -- read -------------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read: exactly the manifest's file set — staged/orphaned
        files in data/ are invisible.  ``version`` enables time travel."""
        m = self._manifest(self.current_version() if version is None else version)
        if not m["files"]:
            raise ValueError("empty table snapshot")
        paths = [os.path.join(self.root, f) for f in m["files"]]
        return self.spark.read.parquet(*paths)

    # -- write-audit-publish ---------------------------------------------
    def commit(
        self,
        df: DataFrame,
        mode: str = "append",
        audit_not_null: list[str] | None = None,
        _corrupt_audit_expected: int | None = None,
    ) -> int:
        """Run one write-audit-publish cycle; returns the new version.

        ``_corrupt_audit_expected`` exists for tests/demos: it overrides
        the expected row count so the audit provably rejects a bad commit.
        """
        if mode not in ("append", "replace"):
            raise ValueError(f"unknown commit mode {mode!r}; use 'append' or 'replace'")
        base = self.current_version()
        version = base + 1
        stage_rel = os.path.join("data", f"snap-{version}-{uuid.uuid4().hex[:8]}")
        stage_abs = os.path.join(self.root, stage_rel)

        # WRITE: stage the files (invisible until a manifest names them).
        # The expected row count is OBSERVED on the same execution that
        # writes the files — re-running df.count() afterwards would
        # execute the input plan twice and could spuriously pass/fail on
        # non-deterministic or concurrently-changing inputs (the audit
        # must validate THIS write, not a second read of the source).
        from pyspark.sql import Observation

        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")).write.mode(
            "overwrite"
        ).parquet(stage_abs)

        # AUDIT: re-read what actually landed on disk and validate it.
        staged = self.spark.read.parquet(stage_abs)
        staged_count = staged.count()
        expected = (
            _corrupt_audit_expected
            if _corrupt_audit_expected is not None
            else obs.get["n"]
        )
        ok = staged_count == expected
        if ok and audit_not_null:
            any_null = F.lit(False)
            for c in audit_not_null:
                any_null = any_null | F.col(c).isNull()
            ok = staged.filter(any_null).count() == 0
        if not ok:
            # ABORT: no manifest, no pointer move — the staged files are
            # orphans, unreachable by any reader.  (A janitor process can
            # garbage-collect unreferenced data dirs later, exactly like
            # Delta VACUUM / Iceberg orphan-file cleanup.)
            raise AuditError(
                f"audit failed for staged commit v{version} "
                f"({staged_count} rows vs expected {expected})"
            )

        # PUBLISH: claim version v<n> by linking a fully-written temp
        # manifest to its final name.  os.link is atomic AND fails with
        # EEXIST if a concurrent committer claimed the version first —
        # the optimistic-concurrency CAS every table format needs (a
        # conditional PUT / metastore CAS on object stores).  Writing
        # the temp file FIRST means a manifest visible in the listing is
        # always complete: a committer that dies mid-write leaves only a
        # temp file, never a truncated published manifest.  On conflict,
        # rebase onto the winner's snapshot and retry with the SAME
        # staged files — only the manifest merge re-runs.
        part_files = sorted(
            os.path.join(stage_rel, fn)
            for fn in os.listdir(stage_abs)
            if fn.endswith(".parquet")
        )
        while True:
            prev = self._manifest(base)
            files = part_files if mode == "replace" else prev["files"] + part_files
            manifest = {
                "version": version,
                "files": files,
                "row_count": (0 if mode == "replace" else prev["row_count"])
                + staged_count,
            }
            tmp_manifest = self._manifest_path(version) + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp_manifest, "w") as fh:
                json.dump(manifest, fh)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp_manifest, self._manifest_path(version))
            except FileExistsError:
                base = self.current_version()  # lost the race — rebase
                version = base + 1
                continue
            finally:
                os.unlink(tmp_manifest)
            break  # the os.link above WAS the atomic publish
        return version


@register(
    "sink_acid_table",
    oracle="""
SELECT l_returnflag, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_acid_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID sink round-trip proving atomicity, isolation and audit:

    1. commit v1: append the 'A' slice; 2. commit v2: append 'N';
    3. a commit of DOUBLED 'R' rows whose audit fails → aborted, files
       orphaned but unreachable; 4. commit v3: append the clean 'R' slice.

    The latest snapshot read must aggregate to exactly the clean lineitem
    oracle — if aborted data leaked into the visible snapshot (the failure
    a plain directory-tree sink cannot exclude), R's counts would double.
    Time-travel (v2 lacks 'R') is pinned in tests/test_acid.py."""
    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    root = os.path.join(
        tempfile.gettempdir(), f"sdis_acid_{os.getpid()}_{uuid.uuid4().hex[:6]}"
    )
    t = SnapshotTable(spark, root)
    try:
        t.commit(li.filter(F.col("l_returnflag") == "A"))
        t.commit(li.filter(F.col("l_returnflag") == "N"))
        doubled_r = li.filter(F.col("l_returnflag") == "R")
        doubled_r = doubled_r.union(doubled_r)
        try:
            # Audit expects the CLEAN R count; the doubled stage fails it.
            clean_r_count = li.filter(F.col("l_returnflag") == "R").count()
            t.commit(doubled_r, _corrupt_audit_expected=clean_r_count)
        except AuditError:
            pass  # aborted commit: orphan files on disk, invisible to reads
        t.commit(li.filter(F.col("l_returnflag") == "R"))

        back = t.read()  # latest snapshot only — orphans excluded
        result = back.groupBy("l_returnflag").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        # Bounded collect: 3 aggregated rows — materialized before the
        # temp table directory vanishes.
        result = spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return result
