"""Delta-protocol table sink: a real ``_delta_log`` transaction log
(`sink_delta_table`).

``BASELINE.json:7`` names "Parquet/Delta" as the reference's sink
surface.  ``sink_acid_table`` (acid.py) implements the write-audit-
publish COMMIT PROTOCOL in a bespoke manifest format; this module closes
the remaining interop gap by writing the actual on-disk format of the
open Delta Lake protocol (delta.io PROTOCOL.md — public knowledge), so
any standard Delta reader could open the table.  delta-spark is not
installable in this container, so conformance is exercised by this
module's own log-replay reader plus structural tests over the JSON
actions; the format itself follows the public spec:

- table root holds parquet data files and ``_delta_log/``;
- commit ``n`` is ``_delta_log/<n padded to 20 digits>.json`` —
  newline-delimited JSON actions;
- version 0 carries ``protocol`` (minReaderVersion 1 / minWriterVersion
  2: plain append/overwrite needs no higher feature level) and
  ``metaData`` (table id, ``format: parquet``, ``schemaString`` — the
  Spark StructType JSON, which IS Delta's schema encoding,
  ``partitionColumns``);
- every commit carries ``add`` actions (path, partitionValues, size,
  modificationTime, dataChange) and, for overwrite, ``remove``
  tombstones for the files it displaces;
- a reader replays actions of versions 0..v in order: live files =
  adds minus removes; reading at v < latest is time travel;
- ``checkpoint()`` writes the replayed state as
  ``<v>.checkpoint.parquet`` (one action per row: protocol / metaData /
  add / remove / txn columns, the spec's checkpoint schema) and points
  ``_last_checkpoint`` at it; readers then load the checkpoint and
  replay only the JSON commits AFTER it, and ``clean_log()`` may delete
  the superseded commit files — replay cost becomes O(commits since
  checkpoint), not O(table lifetime), which is what keeps a
  years-running 100 TB ingest table openable.

Commit atomicity is the same primitive acid.py uses: the fully-written
log entry is ``os.link``ed to its versioned name — EEXIST means a
concurrent committer won that version (on an object store this is the
conditional-put the Delta spec requires of the log store).  Plain
appends commute and simply rebase onto the next version; every
state-dependent command (overwrite/merge/delete/compact/restore)
RE-DERIVES its actions from the new head instead — its tombstones and
rewrites were computed against the old head and are invalid after the
race (see :class:`DeltaConcurrentCommit`).

At 100 TB: the log grows one small JSON per commit regardless of data
volume, appends never rewrite data, and every ``add`` carries the
spec's ``stats`` JSON (numRecords + column min/max from the parquet
footer), which the reader uses for file skipping from log metadata
alone — the layout work (`ext_zorder_layout`) composes with this sink
unchanged.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import register
from .dv_bitmap import dv_descriptor, dv_positions, dv_union

_PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


class DeltaConcurrentCommit(Exception):
    """A concurrent committer advanced the log past the head this
    commit's actions were derived from.  Plain appends commute and are
    retried transparently; every state-dependent command (overwrite,
    merge, delete, compact, restore) must RE-DERIVE its actions from
    the new head — republishing the stale actions would let the racer's
    files survive an overwrite untombstoned or lose its rows in a
    merge/delete rewrite."""


class DeltaConcurrentModification(Exception):
    """A concurrent committer's actions DO NOT COMMUTE with this commit
    (PROTOCOL.md isolation / the reference implementation's
    ConcurrentModificationException family): a protocol or metaData
    change invalidates constraint checks, generated-column validation
    and column mapping performed at stage time, and two writers
    tombstoning the SAME file is a lost update one of them must not
    win.  Raised LOUDLY instead of silently replaying the stale
    actions; the caller must re-run the whole operation against the
    new table state (not just republish)."""


class DeltaConstraintViolation(Exception):
    """A write contained rows failing a ``delta.constraints.*`` CHECK
    expression — the whole commit is rejected (spec: writers must
    validate every constraint on every added row; violation fails the
    transaction, never a partial write)."""


class DeltaLogTable:
    """Minimal Delta-protocol table: parquet data files + ``_delta_log``
    newline-JSON commits, with append / overwrite / versioned read."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        change_data_feed: bool = False,
    ):
        self.spark = spark
        self.root = root
        self.log_dir = os.path.join(root, "_delta_log")
        # Mirrors delta.enableChangeDataFeed: when set, MERGE and DELETE
        # write spec-shaped ``cdc`` actions (change rows under
        # ``_change_data/``) so ``table_changes`` can emit row-level
        # diffs without misreading copy-on-write rewrites as changes.
        self.change_data_feed = change_data_feed
        os.makedirs(self.log_dir, exist_ok=True)

    def _table_config(self) -> dict:
        # _config_seed carries a cloned source's table properties into
        # the version-0 metaData (set only by clone_to); the CDF flag
        # layers on top so both construction paths compose.
        cfg = dict(getattr(self, "_config_seed", {}))
        if self.change_data_feed:
            cfg["delta.enableChangeDataFeed"] = "true"
        return cfg

    # -- log plumbing -------------------------------------------------

    def _version_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.checkpoint.parquet")

    def latest_version(self) -> int:
        versions = [
            int(os.path.basename(p).split(".")[0])
            for p in glob.glob(os.path.join(self.log_dir, "*.json"))
        ]
        cp = self._checkpoint_info()
        if cp is not None:
            versions.append(cp["version"])
        return max(versions) if versions else -1

    def _actions(self, version: int) -> list[dict]:
        path = self._version_path(version)
        if not os.path.exists(path):
            cp = self._checkpoint_info()
            raise ValueError(
                f"commit {version} is missing from {self.log_dir!r}"
                + (
                    f" (cleaned; earliest replayable state is checkpoint "
                    f"version {cp['version']})"
                    if cp is not None
                    else ""
                )
            )
        with open(path) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    def _checkpoint_info(self) -> dict | None:
        """Parsed ``_last_checkpoint`` pointer ({version, size}) or None."""
        path = os.path.join(self.log_dir, "_last_checkpoint")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)

    @staticmethod
    def _apply(state: dict, action: dict) -> None:
        """Fold one log action into the mutable replay ``state``."""
        if "protocol" in action:
            state["protocol"] = action["protocol"]
        elif "metaData" in action:
            state["metaData"] = action["metaData"]
        elif "add" in action:
            state["live"][action["add"]["path"]] = action["add"]
            state["removed"].pop(action["add"]["path"], None)
        elif "remove" in action:
            state["live"].pop(action["remove"]["path"], None)
            state["removed"][action["remove"]["path"]] = action["remove"]
        elif "txn" in action:
            txn = action["txn"]
            state["txns"][txn["appId"]] = max(
                state["txns"].get(txn["appId"], -1), txn["version"]
            )
        elif "domainMetadata" in action:
            dm = action["domainMetadata"]
            if dm.get("removed"):
                state["domains"].pop(dm["domain"], None)
            else:
                state["domains"][dm["domain"]] = dm
        # "cdc" and "commitInfo" actions are per-commit payloads, not
        # table state: replay ignores them, per spec.

    def _state(self, version: int) -> dict:
        """Full replayed state at ``version``: live adds, remove
        tombstones, metaData, protocol, per-app txn watermarks.

        Starts from the newest checkpoint at or below ``version`` when
        one exists (replaying only the JSON commits after it — the O(1)
        open path); otherwise replays JSON from 0, which requires those
        commits to still exist (time travel below a checkpoint fails
        loudly once ``clean_log()`` removed them)."""
        state: dict = {
            "live": {},
            "removed": {},
            "metaData": None,
            "protocol": None,
            "txns": {},
            "domains": {},
        }
        start = 0
        cp = self._checkpoint_info()
        if cp is not None and cp["version"] <= version:
            for action in self._read_checkpoint(cp["version"]):
                self._apply(state, action)
            start = cp["version"] + 1
        for v in range(start, version + 1):
            for action in self._actions(v):
                self._apply(state, action)
        return state

    def _replay_actions(
        self, version: int
    ) -> tuple[dict[str, dict], str | None, list[str]]:
        """Live ``path -> add action`` map, schemaString, and partition
        columns after replaying commits 0..version."""
        state = self._state(version)
        md = state["metaData"] or {}
        return (
            state["live"],
            md.get("schemaString"),
            md.get("partitionColumns", []),
        )

    def _replay(self, version: int) -> tuple[list[str], str | None]:
        """Live file list + schemaString after replaying commits 0..version."""
        live, schema, _ = self._replay_actions(version)
        return sorted(live), schema

    def generate_manifest(self) -> list[str]:
        """GENERATE ``symlink_format_manifest`` (Delta's manifest export
        for Presto/Trino/Athena-class readers that speak
        SymlinkTextInputFormat, not the transaction log): text manifest
        files under ``_symlink_format_manifest/`` listing the ABSOLUTE
        paths of the table's LIVE data files at the current head — one
        manifest per partition directory on a partitioned table, a
        single ``manifest`` file otherwise.  Returns the manifest paths.

        The manifest is a LOG-REPLAY product: tombstoned and
        compacted-away files never appear, so an external engine reading
        the manifest sees exactly the committed snapshot while a raw
        directory listing would double-count (the ``sink_delta_table``
        lesson, exported).  Files with deletion vectors cannot be
        represented as plain paths — loud refusal, like the spec's
        reader-obligation guards."""
        head = self.latest_version()
        if head < 0:
            raise ValueError("cannot generate a manifest for an empty table")
        live, _, partition_cols = self._replay_actions(head)
        for p, a in live.items():
            if a.get("deletionVector"):
                raise NotImplementedError(
                    f"manifest cannot represent deletion vector on {p!r}"
                )
        mroot = os.path.join(self.root, "_symlink_format_manifest")
        shutil.rmtree(mroot, ignore_errors=True)
        groups: dict[str, list[str]] = {}
        for p in sorted(live):
            part_dir = os.path.dirname(p) if partition_cols else ""
            groups.setdefault(part_dir, []).append(
                os.path.abspath(os.path.join(self.root, p))
            )
        out = []
        for part_dir, paths in sorted(groups.items()):
            d = os.path.join(mroot, part_dir) if part_dir else mroot
            os.makedirs(d, exist_ok=True)
            mpath = os.path.join(d, "manifest")
            with open(mpath, "w") as fh:
                fh.write("\n".join(paths) + "\n")
            out.append(mpath)
        return out


    # -- write path ---------------------------------------------------

    @staticmethod
    def _file_stats(path: str) -> str:
        """Delta-style per-file ``stats`` JSON (numRecords + column
        min/max from the parquet footer) — the payload a Delta reader
        uses for file skipping without opening data files."""
        import pyarrow.parquet as pq

        md = pq.ParquetFile(path).metadata
        mins: dict = {}
        maxs: dict = {}
        # Per-column COMPLETENESS: a column's recorded range must cover
        # EVERY row group, or stats-based pruning (_prune, commit_merge,
        # commit_delete) could skip a file that does contain matching
        # rows — lost DELETEs / MERGE updates.  Any row group with a
        # missing or non-UTF-8 min/max poisons the whole column: it is
        # dropped from the stats entirely (conservative never-skip).
        incomplete: set[str] = set()
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for i in range(row.num_columns):
                col = row.column(i)
                name = md.schema.column(i).name
                st = col.statistics
                if st is None or not st.has_min_max:
                    incomplete.add(name)
                    continue
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    # Stats order must be EXACT or pruning skips wrongly:
                    # record byte stats only when they round-trip as
                    # UTF-8 (true strings); raw binary columns get no
                    # stats and are conservatively never skipped.
                    try:
                        lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                    except UnicodeDecodeError:
                        incomplete.add(name)
                        continue
                if hasattr(lo, "isoformat"):
                    lo, hi = lo.isoformat(), hi.isoformat()
                mins[name] = lo if name not in mins else min(mins[name], lo)
                maxs[name] = hi if name not in maxs else max(maxs[name], hi)
        for name in incomplete:
            mins.pop(name, None)
            maxs.pop(name, None)
        return json.dumps(
            {"numRecords": md.num_rows, "minValues": mins, "maxValues": maxs}
        )

    @staticmethod
    def _norm_bound(v):
        """Normalize a caller-supplied predicate bound for comparison
        with JSON-decoded stats values — date/timestamp stats are stored
        as ISO-8601 strings (see ``_file_stats``), so datetime-like
        bounds compare as their isoformat."""
        return v.isoformat() if hasattr(v, "isoformat") else v

    @staticmethod
    def _stats_disjoint(mn, mx, lo, hi) -> bool:
        """True only when the file range [mn, mx] PROVABLY misses the
        predicate range [lo, hi].  A type mismatch between stats and
        bounds (e.g. numeric stats probed with a string bound) is never
        provably disjoint — the file is conservatively kept/rewritten
        instead of raising mid-commit."""
        lo = DeltaLogTable._norm_bound(lo)
        hi = DeltaLogTable._norm_bound(hi)
        try:
            return mx < lo or mn > hi
        except TypeError:
            return False

    # -- per-file bloom index (engine extension) ----------------------
    #
    # Real Delta's bloom filter index stores a sidecar parquet per data
    # file; here the (small) filter lives inline on the add action under
    # the engine-extension key "engineBloom" so the log stays
    # self-contained and checkpoints carry it for free.  Spec readers
    # ignore unknown add fields, so the table stays protocol-readable.

    _BLOOM_K = 7           # hash probes (fp ~1% at 10 bits/key)
    _BLOOM_BITS_PER_KEY = 10

    @staticmethod
    def _bloom_canon(value) -> str:
        """ONE typed rendering shared by build and probe, so equal values
        hash equally no matter which Python type they arrive in (5 vs 5.0
        vs Decimal('5'); b'x' vs 'x'; midnight datetime vs date).  A naive
        str() here is a correctness bug, not a perf one: a probe that
        renders differently from the written values ('5.0' vs '5') is a
        bloom false NEGATIVE, and _prune silently skips a file that
        contains matching rows."""
        import datetime as _dt
        import decimal as _dec

        if isinstance(value, bool):
            return "true" if value else "false"
        if isinstance(value, (int, float, _dec.Decimal)):
            try:
                d = _dec.Decimal(str(value))
            except _dec.InvalidOperation:  # inf / nan floats
                return str(value)
            if d == d.to_integral_value():
                return str(int(d))
            return str(float(d))
        if isinstance(value, (bytes, bytearray)):
            return bytes(value).hex()
        if isinstance(value, _dt.datetime):
            if value.tzinfo is None and value.time() == _dt.time():
                return value.date().isoformat()
            return value.isoformat()
        if isinstance(value, _dt.date):
            return value.isoformat()
        return str(value)

    @staticmethod
    def _bloom_hashes(canon: str) -> tuple[int, int]:
        """Deterministic (h1, h2) double-hash base for one CANONICALIZED
        value (see _bloom_canon) — stable across processes (no
        PYTHONHASHSEED)."""
        import hashlib

        d = hashlib.md5(canon.encode()).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:16], "little") | 1
        return h1, h2

    @classmethod
    def _bloom_build(cls, values) -> dict:
        """Build the per-file filter over distinct ``values``; returns
        the JSON-safe descriptor stored on the add action."""
        distinct = set(cls._bloom_canon(v) for v in values if v is not None)
        m_bits = max(64, -(-len(distinct) * cls._BLOOM_BITS_PER_KEY // 8) * 8)
        bits = bytearray(m_bits // 8)
        for v in distinct:
            h1, h2 = cls._bloom_hashes(v)
            for i in range(cls._BLOOM_K):
                b = (h1 + i * h2) % m_bits
                bits[b >> 3] |= 1 << (b & 7)
        return {"m": m_bits, "k": cls._BLOOM_K, "bits": bytes(bits).hex()}

    @classmethod
    def _bloom_maybe_contains(cls, bf: dict, value) -> bool:
        bits = bytes.fromhex(bf["bits"])
        h1, h2 = cls._bloom_hashes(cls._bloom_canon(value))
        for i in range(bf["k"]):
            b = (h1 + i * h2) % bf["m"]
            if not (bits[b >> 3] >> (b & 7)) & 1:
                return False
        return True

    def _stage_files(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        bloom_for: list[str] | None = None,
    ) -> list[dict]:
        """Write ``df`` as parquet (optionally Hive-partitioned) and move
        the part files into the table root under fresh names; returns
        their ``add`` actions with partitionValues and footer stats.
        ``bloom_for`` columns additionally get a per-file bloom filter
        on the add action (see the engine-extension note above) —
        point-lookup pruning for keys whose min/max ranges overlap
        across every file (hash-distributed layouts)."""
        staged = os.path.join(self.root, f".staged-{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(staged)
        adds = []
        import pyarrow.parquet as pq

        for part in sorted(
            glob.glob(os.path.join(staged, "**", "part-*.parquet"), recursive=True)
        ):
            # Zero-row task outputs add log entries with no stats (so
            # merge pruning must conservatively rewrite them forever);
            # real Delta writers drop them and so do we.
            if pq.ParquetFile(part).metadata.num_rows == 0:
                continue
            rel_dir = os.path.relpath(os.path.dirname(part), staged)
            pvals: dict[str, str] = {}
            if rel_dir != ".":
                for seg in rel_dir.split(os.sep):
                    k, _, v = seg.partition("=")
                    pvals[k] = v
            name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            rel = name if rel_dir == "." else os.path.join(rel_dir, name)
            dest = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(part, dest)
            st = os.stat(dest)
            add = {
                "path": rel,
                "partitionValues": pvals,
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": True,
                "stats": self._file_stats(dest),
            }
            if bloom_for:
                # Built from the just-written local file; in a real
                # cluster writer the TASK computes this inline over the
                # rows it writes — same information, no extra read.
                tbl_cols = pq.read_table(dest, columns=list(bloom_for))
                add["engineBloom"] = {
                    c: self._bloom_build(tbl_cols.column(c).to_pylist())
                    for c in bloom_for
                }
            adds.append({"add": add})
        shutil.rmtree(staged, ignore_errors=True)
        return adds

    def _stage_cdc_files(self, changes: DataFrame) -> list[dict]:
        """Write ``changes`` (table columns + ``_change_type``) as CDC
        parquet under ``_change_data/`` and return the spec's ``cdc``
        actions (Add CDC File: path, partitionValues, size, dataChange
        false — CDC files never contribute to table state; a commit that
        carries them tells CDF readers to use these rows EXCLUSIVELY
        instead of deriving changes from add/remove)."""
        staged = os.path.join(self.root, f".staged-cdc-{uuid.uuid4().hex}")
        changes.write.mode("overwrite").parquet(staged)
        actions = []
        import pyarrow.parquet as pq

        for part in sorted(glob.glob(os.path.join(staged, "part-*.parquet"))):
            if pq.ParquetFile(part).metadata.num_rows == 0:
                continue
            rel = os.path.join(
                "_change_data", f"cdc-{uuid.uuid4().hex}.snappy.parquet"
            )
            dest = os.path.join(self.root, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(part, dest)
            actions.append(
                {
                    "cdc": {
                        "path": rel,
                        "partitionValues": {},
                        "size": os.stat(dest).st_size,
                        "dataChange": False,
                    }
                }
            )
        shutil.rmtree(staged, ignore_errors=True)
        return actions

    @staticmethod
    def _remove_action(path: str, data_change: bool) -> dict:
        """Spec-shaped remove tombstone: ``deletionTimestamp`` (ms) is
        the spec's optional field that retention-aware VACUUM consults —
        a tombstone younger than the retention window keeps its file on
        disk so concurrent readers of recent versions don't lose data
        files mid-scan."""
        return {
            "remove": {
                "path": path,
                "deletionTimestamp": int(time.time() * 1000),
                "dataChange": data_change,
            }
        }

    def _assert_commutes(
        self, actions: list[dict], base: int, head: int
    ) -> None:
        """OCC conflict check for a rebase: inspect every winner commit in
        (base, head] and decide whether ``actions`` (derived at ``base``)
        may be republished on top of them (PROTOCOL.md isolation: this
        engine commits appends at WriteSerializable).

        Commutes: winner data actions (add / remove of OTHER files /
        commitInfo / foreign-app txn) vs our pure append — a blind append
        reads nothing, so nothing it depends on moved.

        Conflicts (DeltaConcurrentModification, loud):
        - winner protocol or metaData change — our constraint checks,
          generated-column validation, column-mapping projection and
          schema string were all computed against the OLD metadata;
        - winner removed a file our actions ALSO remove (concurrent
          delete/delete — a lost update) or a file our actions re-add;
        - our actions carry removes at all (state-dependent commands must
          come through derived_from-guarded re-derivation, never rebase).

        Retryable (DeltaConcurrentCommit): a winner txn for one of OUR
        app ids — the caller's idempotence watermark must be re-checked
        before this epoch is republished (same-app streaming race)."""
        ours_removed = {
            a["remove"]["path"] for a in actions if "remove" in a
        }
        ours_added = {a["add"]["path"] for a in actions if "add" in a}
        our_apps = {a["txn"]["appId"] for a in actions if "txn" in a}
        if ours_removed:
            raise DeltaConcurrentModification(
                "commit carries remove tombstones derived at version "
                f"{base} but the head moved to {head}: state-dependent "
                "commands must re-derive, not rebase"
            )
        for v in range(base + 1, head + 1):
            for act in self._actions(v):
                if "protocol" in act or "metaData" in act:
                    kind = "protocol" if "protocol" in act else "metaData"
                    raise DeltaConcurrentModification(
                        f"concurrent {kind} change at version {v} does "
                        "not commute with this commit (constraints, "
                        "generated columns and column mapping were "
                        f"validated against version {base}); re-run the "
                        "operation against the new table state"
                    )
                if "remove" in act and (
                    act["remove"]["path"] in ours_removed
                    or act["remove"]["path"] in ours_added
                ):
                    raise DeltaConcurrentModification(
                        f"concurrent remove of {act['remove']['path']!r} "
                        f"at version {v} overlaps this commit's file set"
                    )
                if "txn" in act and act["txn"]["appId"] in our_apps:
                    raise DeltaConcurrentCommit(
                        f"concurrent txn for app "
                        f"{act['txn']['appId']!r} at version {v}; "
                        "re-check the idempotence watermark"
                    )

    def _publish(
        self,
        actions: list[dict],
        derived_from: int | None = None,
        operation: str | None = None,
        commute_ok: bool = False,
    ) -> int:
        """Atomically publish ``actions`` as the next log version.

        The entry is fully written to a temp file first, then ``os.link``
        both publishes it and detects a lost race (EEXIST -> another
        committer took the version).  ``derived_from`` is the head
        version the actions were computed against: when given and the
        head has moved, :class:`DeltaConcurrentCommit` is raised so the
        caller re-derives (tombstones/rewrites computed against the old
        head are NOT valid against the new one); when None the actions
        are head-independent (plain appends) and the publish simply
        rebases onto the next free version.

        ``operation`` (when given) is recorded as the spec's optional
        ``commitInfo`` action — the first line of the commit, carrying
        the wall-clock timestamp and operation name that DESCRIBE
        HISTORY surfaces; replay ignores it (it is informational).
        """
        while True:
            head = self.latest_version()
            if derived_from is not None and head != derived_from:
                if not commute_ok:
                    raise DeltaConcurrentCommit(
                        f"actions derived at version {derived_from} but "
                        f"head is now {head}; re-derive and retry"
                    )
                # OCC classification (VERDICT r12 task 5): rebase ONLY
                # past winners this commit provably commutes with.
                self._assert_commutes(actions, derived_from, head)
                derived_from = head
            version = head + 1
            payload = list(actions)
            # Previous-commit state is needed twice below (ICT detection
            # and schema-evolution re-emission) — replay it ONCE per
            # attempt; it is driver-side and log-sized.
            prev_md = (
                (self._state(version - 1)["metaData"] or {})
                if version > 0
                else {}
            )
            # commitInfo (inside the loop: the inCommitTimestamp depends
            # on the PREVIOUS commit, which changes on a lost race).
            ict_enabled = (
                (prev_md.get("configuration") or {}).get(
                    "delta.enableInCommitTimestamps"
                )
                == "true"
            )
            if not ict_enabled:
                # The enablement commit itself must already carry an ICT.
                for a in actions:
                    a_cfg = (a.get("metaData") or {}).get("configuration") or {}
                    if a_cfg.get("delta.enableInCommitTimestamps") == "true":
                        ict_enabled = True
            info = []
            if operation is not None or ict_enabled:
                ci: dict = {
                    "timestamp": int(time.time() * 1000),
                    "operation": operation or "WRITE",
                }
                if ict_enabled:
                    prev_ict = (
                        self._commit_timestamp(version - 1)
                        if version > 0
                        else None
                    )
                    # Spec: strictly greater than the previous commit's.
                    ci["inCommitTimestamp"] = max(
                        int(time.time() * 1000), (prev_ict or 0) + 1
                    )
                info = [{"commitInfo": ci}]
            if version > 0:
                # Schema evolution: when this commit's schema differs
                # from the last committed metaData, re-emit the metaData
                # action (the spec's mechanism — readers use the LATEST
                # metaData and project older files through it, absent
                # columns reading as null).  The table id CARRIES OVER:
                # the spec keeps it stable for the table's lifetime, so
                # identity-tracking readers see one table across schema
                # changes.
                prev_schema = prev_md.get("schemaString")
                prev_parts = prev_md.get("partitionColumns", [])
                if prev_schema is not None and (
                    json.loads(prev_schema)
                    != json.loads(self._schema_string)
                ):
                    payload = [
                        {
                            "metaData": {
                                "id": prev_md.get("id") or str(uuid.uuid4()),
                                "format": {
                                    "provider": "parquet",
                                    "options": {},
                                },
                                "schemaString": self._schema_string,
                                "partitionColumns": getattr(
                                    self, "_partition_columns", prev_parts
                                ),
                                # table properties carry over: a schema
                                # change must not drop the CDF flag
                                "configuration": prev_md.get(
                                    "configuration", self._table_config()
                                ),
                            }
                        }
                    ] + payload
            if version == 0:
                payload = [
                    {"protocol": dict(_PROTOCOL)},
                    {
                        "metaData": {
                            "id": str(uuid.uuid4()),
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": self._schema_string,
                            "partitionColumns": getattr(
                                self, "_partition_columns", []
                            ),
                            "configuration": self._table_config(),
                        }
                    },
                ] + payload
            tmp = tempfile.NamedTemporaryFile(
                mode="w", dir=self.log_dir, suffix=".tmp", delete=False
            )
            with tmp as fh:
                for action in info + payload:
                    fh.write(json.dumps(action) + "\n")
            try:
                os.link(tmp.name, self._version_path(version))
                os.unlink(tmp.name)
                self._write_checksum(version)
                return version
            except FileExistsError:
                os.unlink(tmp.name)  # lost the race
                # loop: head is re-read; derived_from (if any) is
                # re-checked there and raises DeltaConcurrentCommit.

    # -- version checksums (<v>.crc) -----------------------------------

    def _crc_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.crc")

    def _checksum_of_state(self, version: int) -> dict:
        """The spec's VERSION CHECKSUM summary of the replayed state at
        ``version``: live-file count and byte total, tombstone count,
        and per-app txn count — the numbers a reader can recompute to
        detect a corrupted or truncated log."""
        st = self._state(version)
        return {
            "tableSizeBytes": int(
                sum(a.get("size") or 0 for a in st["live"].values())
            ),
            "numFiles": len(st["live"]),
            "numDeletedRecordsOpt": None,
            "numTombstones": len(st["removed"]),
            "numTransactions": len(st["txns"]),
            "numMetadata": 1,
            "numProtocol": 1,
        }

    def _write_checksum(self, version: int) -> None:
        """Write ``<v>.crc`` beside the commit (delta-spark's version
        checksum file; the spec's optional integrity artifact).  Written
        AFTER the commit wins its race, so it summarizes exactly this
        version's state; a racer that lost never writes one."""
        path = self._crc_path(version)
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(self._checksum_of_state(version), fh)
        os.replace(tmp, path)

    def validate_checksum(self, version: int | None = None) -> dict:
        """Recompute the version checksum from log replay and compare
        with the stored ``<v>.crc`` — the reader-side integrity check
        (a mismatch means the log or a checkpoint was corrupted or
        hand-edited).  Returns the validated summary; raises ValueError
        on mismatch; silently validates nothing only when no .crc was
        ever written for that version (pre-feature logs)."""
        if version is None:
            version = self.latest_version()
        expect = self._checksum_of_state(version)
        path = self._crc_path(version)
        if not os.path.exists(path):
            return expect
        with open(path) as fh:
            stored = json.load(fh)
        if stored != expect:
            raise ValueError(
                f"version checksum mismatch at {version}: stored {stored} "
                f"!= recomputed {expect} — log corruption"
            )
        return expect

    def last_txn_version(self, app_id: str) -> int:
        """Highest committed ``txn`` version for ``app_id`` (-1 if none)
        — the spec's idempotent-writer handshake: a streaming writer
        stamps each commit with (appId, epoch) and SKIPS epochs at or
        below this watermark, so micro-batch retries cannot double-write.
        Watermarks survive checkpointing: the checkpoint carries one txn
        row per app, so exactly-once holds across log cleanup."""
        head = self.latest_version()
        if head < 0:
            return -1
        return self._state(head)["txns"].get(app_id, -1)

    # -- checkpointing ------------------------------------------------

    _CP_SCHEMA = None  # built lazily; pyarrow import stays off cold path

    @classmethod
    def _cp_schema(cls):
        import pyarrow as pa

        if cls._CP_SCHEMA is None:
            str_map = pa.map_(pa.string(), pa.string())
            cls._CP_SCHEMA = pa.schema(
                [
                    (
                        "protocol",
                        pa.struct(
                            [
                                ("minReaderVersion", pa.int32()),
                                ("minWriterVersion", pa.int32()),
                                # table-features form (reader 3/writer 7):
                                # the feature lists MUST survive the
                                # checkpoint round-trip or clean_log would
                                # silently downgrade the table's contract
                                ("readerFeatures", pa.list_(pa.string())),
                                ("writerFeatures", pa.list_(pa.string())),
                            ]
                        ),
                    ),
                    (
                        "metaData",
                        pa.struct(
                            [
                                ("id", pa.string()),
                                (
                                    "format",
                                    pa.struct([("provider", pa.string())]),
                                ),
                                ("schemaString", pa.string()),
                                ("partitionColumns", pa.list_(pa.string())),
                                ("configuration", str_map),
                            ]
                        ),
                    ),
                    (
                        "add",
                        pa.struct(
                            [
                                ("path", pa.string()),
                                ("partitionValues", str_map),
                                ("size", pa.int64()),
                                ("modificationTime", pa.int64()),
                                ("dataChange", pa.bool_()),
                                ("stats", pa.string()),
                                # Spec checkpoint schema carries the DV
                                # descriptor; dropping it here would
                                # resurrect deleted rows after clean_log.
                                (
                                    "deletionVector",
                                    pa.struct(
                                        [
                                            ("storageType", pa.string()),
                                            ("pathOrInlineDv", pa.string()),
                                            ("offset", pa.int32()),
                                            ("sizeInBytes", pa.int32()),
                                            ("cardinality", pa.int64()),
                                        ]
                                    ),
                                ),
                                # engine extension (JSON string): per-file
                                # bloom index; unknown to spec readers,
                                # must survive clean_log like stats do.
                                ("engineBloom", pa.string()),
                            ]
                        ),
                    ),
                    (
                        "remove",
                        pa.struct(
                            [
                                ("path", pa.string()),
                                ("deletionTimestamp", pa.int64()),
                                ("dataChange", pa.bool_()),
                            ]
                        ),
                    ),
                    (
                        "txn",
                        pa.struct(
                            [("appId", pa.string()), ("version", pa.int64())]
                        ),
                    ),
                    (
                        # Spec checkpoint schema: domain metadata MUST
                        # survive checkpointing (a dropped rowTracking
                        # high-water mark would let a later writer
                        # REISSUE live row ids).
                        "domainMetadata",
                        pa.struct(
                            [
                                ("domain", pa.string()),
                                ("configuration", pa.string()),
                                ("removed", pa.bool_()),
                            ]
                        ),
                    ),
                ]
            )
        return cls._CP_SCHEMA

    def checkpoint(self) -> int:
        """Write the replayed head state as ``<head>.checkpoint.parquet``
        (the spec's checkpoint schema: one action per row, one non-null
        action column per row) and atomically repoint
        ``_last_checkpoint``.  Returns the checkpointed version.

        After this, opening the table replays the checkpoint plus only
        the commits AFTER it — O(commits since checkpoint) instead of
        O(commits ever) — and ``clean_log()`` may delete the superseded
        JSON files.  State is one row per live file / tombstone / app,
        written driver-side: log metadata is KB-to-MB scale even for a
        100 TB table (file count, not byte count)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        head = self.latest_version()
        if head < 0:
            raise ValueError("cannot checkpoint an empty log")
        state = self._state(head)

        rows = self._cp_rows(state)
        schema = self._cp_schema()
        cols = {f.name: [row.get(f.name) for row in rows] for f in schema}
        tbl = pa.table(
            {n: pa.array(v, type=schema.field(n).type) for n, v in cols.items()}
        )
        cp_path = self._checkpoint_path(head)
        tmp = cp_path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, cp_path)
        ptr = os.path.join(self.log_dir, "_last_checkpoint")
        with open(ptr + ".tmp", "w") as fh:
            json.dump({"version": head, "size": len(rows)}, fh)
        os.replace(ptr + ".tmp", ptr)
        return head

    @staticmethod
    def _cp_rows(state: dict) -> list[dict]:
        """Replayed state as checkpoint rows (one non-null action column
        per row, the spec's checkpoint schema) — shared by the classic
        single-file checkpoint and the v2 manifest+sidecar writer."""

        def _map(d: dict | None) -> list[tuple] | None:
            return sorted((d or {}).items()) if d is not None else None

        rows: list[dict] = [
            {"protocol": state["protocol"]},
        ]
        md = dict(state["metaData"])
        md["format"] = {"provider": md["format"]["provider"]}
        md["configuration"] = _map(md.get("configuration", {}))
        rows.append({"metaData": md})
        for app_id, ver in sorted(state["txns"].items()):
            rows.append({"txn": {"appId": app_id, "version": ver}})
        for domain in sorted(state["domains"]):
            dm = state["domains"][domain]
            rows.append(
                {
                    "domainMetadata": {
                        "domain": dm["domain"],
                        "configuration": dm.get("configuration"),
                        "removed": False,
                    }
                }
            )
        for path in sorted(state["removed"]):
            r = state["removed"][path]
            rows.append(
                {
                    "remove": {
                        "path": r["path"],
                        "deletionTimestamp": r.get("deletionTimestamp"),
                        "dataChange": bool(r.get("dataChange", True)),
                    }
                }
            )
        for path in sorted(state["live"]):
            add = dict(state["live"][path])
            add["partitionValues"] = _map(add.get("partitionValues", {}))
            if add.get("engineBloom") is not None:
                # Engine-extension bloom rides the checkpoint as a JSON
                # string; spec readers see an unknown column and ignore it.
                add["engineBloom"] = json.dumps(add["engineBloom"])
            rows.append(
                {
                    "add": {
                        k: add.get(k)
                        for k in (
                            "path",
                            "partitionValues",
                            "size",
                            "modificationTime",
                            "dataChange",
                            "stats",
                            "deletionVector",
                            "engineBloom",
                        )
                    }
                }
            )
        return rows

    def _read_checkpoint(self, version: int) -> list[dict]:
        """Checkpoint rows back as plain log actions (nulls dropped,
        map columns re-dicted).  Reads the classic single-file
        checkpoint when present, else the v2 manifest + sidecars."""
        import pyarrow.parquet as pq

        if os.path.exists(self._checkpoint_path(version)):
            return self._rows_to_actions(
                pq.read_table(self._checkpoint_path(version)).to_pylist()
            )
        manifests = sorted(
            p
            for p in glob.glob(
                os.path.join(self.log_dir, f"{version:020d}.checkpoint.*.parquet")
            )
            if not p.endswith(".tmp")
        )
        if not manifests:
            raise ValueError(
                f"no checkpoint file for version {version} in {self.log_dir!r}"
            )
        actions: list[dict] = []
        for row in pq.read_table(manifests[-1]).to_pylist():
            cm = row.get("checkpointMetadata")
            if cm is not None:
                if cm["version"] != version:
                    raise ValueError(
                        f"v2 checkpoint manifest declares version "
                        f"{cm['version']}, expected {version}"
                    )
                continue
            sc = row.get("sidecar")
            if sc is not None:
                side = os.path.join(self.log_dir, "_sidecars", sc["path"])
                actions.extend(
                    self._rows_to_actions(pq.read_table(side).to_pylist())
                )
                continue
            actions.extend(self._rows_to_actions([row]))
        return actions

    def _rows_to_actions(self, rows: list[dict]) -> list[dict]:
        """Convert checkpoint-schema rows (possibly carrying extra
        all-null v2 columns) back to plain log actions."""
        actions: list[dict] = []
        for row in rows:
            for kind, payload in row.items():
                if payload is None or kind in ("checkpointMetadata", "sidecar"):
                    continue
                payload = dict(payload)
                for mk in ("partitionValues", "configuration"):
                    if isinstance(payload.get(mk), list):
                        payload[mk] = dict(payload[mk])
                if kind == "protocol":
                    # legacy protocols have no feature lists: drop the
                    # nulls so the round-tripped dict equals the original
                    payload = {
                        k: v for k, v in payload.items() if v is not None
                    }
                if kind == "metaData":
                    payload["format"] = {
                        "provider": payload["format"]["provider"],
                        "options": {},
                    }
                if kind == "add" and payload.get("partitionValues") is None:
                    payload["partitionValues"] = {}
                if kind == "add":
                    dv = payload.get("deletionVector")
                    if dv is None or dv.get("storageType") is None:
                        # DV-less adds round-trip without the key at all.
                        payload.pop("deletionVector", None)
                    else:
                        payload["deletionVector"] = {
                            k: v for k, v in dv.items() if v is not None
                        }
                    if payload.get("engineBloom") is None:
                        payload.pop("engineBloom", None)
                    else:
                        payload["engineBloom"] = json.loads(
                            payload["engineBloom"]
                        )
                actions.append({kind: payload})
        return actions

    # -- v2 checkpoints (table-features v2Checkpoint) ------------------

    def enable_v2_checkpoints(self) -> int:
        """Enable the spec's V2 CHECKPOINT table feature: protocol rises
        to the table-features form on both axes with ``v2Checkpoint`` in
        reader AND writer features (a v2-blind reader would miss the
        sidecars and see an empty table — exactly what the reader
        feature forbids), and ``delta.checkpointPolicy = v2`` is set —
        the property the current PROTOCOL.md requires writers to check
        before writing v2 checkpoints."""
        while True:
            head = self.latest_version()
            if head < 0:
                raise ValueError(
                    "enable v2 checkpoints on an empty table: commit first"
                )
            st = self._state(head)
            cfg0 = (st["metaData"] or {}).get("configuration") or {}
            if cfg0.get("delta.checkpointPolicy") == "v2":
                return head
            proto = st["protocol"] or dict(_PROTOCOL)
            wfeats = set(proto.get("writerFeatures") or [])
            mw = proto.get("minWriterVersion", 2)
            if mw < 7:
                for v, fs in self._LEGACY_WRITER_FEATURES.items():
                    if mw >= v:
                        wfeats.update(fs)
            wfeats.add("v2Checkpoint")
            rfeats = set(proto.get("readerFeatures") or [])
            if proto.get("minReaderVersion", 1) >= 2:
                rfeats.add("columnMapping")
            rfeats.add("v2Checkpoint")
            md = dict(st["metaData"])
            cfg = dict(md.get("configuration") or {})
            cfg["delta.checkpointPolicy"] = "v2"
            md["configuration"] = cfg
            self._schema_string = md["schemaString"]
            self._partition_columns = md.get("partitionColumns", [])
            actions = [
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": sorted(rfeats),
                        "writerFeatures": sorted(wfeats),
                    }
                },
                {"metaData": md},
            ]
            try:
                return self._publish(
                    actions, derived_from=head, operation="SET TBLPROPERTIES"
                )
            except DeltaConcurrentCommit:
                continue

    def checkpoint_v2(self, max_sidecar_actions: int = 5000) -> int:
        """Write the replayed head state as a V2 CHECKPOINT (current
        PROTOCOL.md "V2 Checkpoints"): FILE actions (add/remove) land in
        sidecar parquet files under ``_delta_log/_sidecars/``, chunked
        at ``max_sidecar_actions`` rows, and a top-level manifest
        ``<v>.checkpoint.<uniqueId>.parquet`` carries exactly one
        ``checkpointMetadata`` action, the protocol / metaData / txn
        actions, and one ``sidecar`` action per sidecar file.
        ``_last_checkpoint`` repoints with the same {version, size}
        contract as classic checkpoints (plus the manifest id), so
        ``clean_log()`` / ``latest_version()`` / replay work unchanged.

        Why this exists at scale: a classic checkpoint is ONE parquet
        file holding every live file's metadata — at 100 TB (millions
        of files) writing it serially becomes the commit-path
        bottleneck, and every reader re-downloads the whole thing.
        Sidecars shard that state so writers parallelize checkpoint
        writes and incremental checkpoints can REUSE unchanged sidecar
        files from the previous checkpoint; readers fetch the KB-scale
        manifest first.  Requires the ``v2Checkpoint`` feature
        (``enable_v2_checkpoints``); refuses otherwise, per the spec's
        writer requirement."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        head = self.latest_version()
        if head < 0:
            raise ValueError("cannot checkpoint an empty log")
        state = self._state(head)
        proto = state["protocol"] or {}
        if "v2Checkpoint" not in (proto.get("writerFeatures") or []):
            raise ValueError(
                "v2 checkpoint requires the v2Checkpoint table feature: "
                "call enable_v2_checkpoints() first"
            )
        rows = self._cp_rows(state)
        top = [r for r in rows if "add" not in r and "remove" not in r]
        files = [r for r in rows if "add" in r or "remove" in r]
        schema = self._cp_schema()

        def _table(rws, sch):
            cols = {f.name: [r.get(f.name) for r in rws] for f in sch}
            return pa.table(
                {n: pa.array(v, type=sch.field(n).type) for n, v in cols.items()}
            )

        side_schema = pa.schema(
            [schema.field("add"), schema.field("remove")]
        )
        side_dir = os.path.join(self.log_dir, "_sidecars")
        os.makedirs(side_dir, exist_ok=True)
        # CONTENT-ADDRESSED bucket sidecars — the incremental-reuse half
        # of the v2 design: file actions bucket by crc32(path) (bucket
        # count = next power of two of actions/max, so it is stable
        # between checkpoints until the table doubles), each bucket
        # serializes canonically and its md5 IS the sidecar filename.
        # A later checkpoint whose bucket is untouched by intervening
        # commits produces the identical hash and SKIPS the write —
        # at millions of files only the touched shards rewrite, which
        # is what makes per-commit checkpointing affordable at 100 TB.
        import hashlib
        import zlib

        n_buckets = 1
        while n_buckets * max_sidecar_actions < len(files):
            n_buckets *= 2
        buckets: list[list[dict]] = [[] for _ in range(n_buckets)]
        for r in files:
            key = (r.get("add") or r.get("remove"))["path"]
            buckets[zlib.crc32(key.encode()) % n_buckets].append(r)
        sidecars: list[dict] = []
        for bucket in buckets:
            bucket.sort(
                key=lambda r: (
                    "add" in r,
                    (r.get("add") or r.get("remove"))["path"],
                )
            )
            canon = json.dumps(bucket, sort_keys=True, default=str)
            name = f"{hashlib.md5(canon.encode()).hexdigest()}.parquet"
            path = os.path.join(side_dir, name)
            if not os.path.exists(path):
                tmp_side = path + f".tmp-{uuid.uuid4().hex}"
                pq.write_table(_table(bucket, side_schema), tmp_side)
                try:
                    os.rename(tmp_side, path)
                except OSError:
                    # a concurrent checkpointer published the identical
                    # content-addressed shard first — ours is redundant
                    shutil.rmtree(tmp_side, ignore_errors=True)
                    if not os.path.exists(path):
                        raise
            st_ = os.stat(path)
            sidecars.append(
                {
                    "path": name,
                    "sizeInBytes": st_.st_size,
                    "modificationTime": int(st_.st_mtime * 1000),
                }
            )
        manifest_schema = pa.schema(
            [
                (
                    "checkpointMetadata",
                    pa.struct([("version", pa.int64())]),
                ),
                schema.field("protocol"),
                schema.field("metaData"),
                schema.field("txn"),
                (
                    "sidecar",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            ("sizeInBytes", pa.int64()),
                            ("modificationTime", pa.int64()),
                        ]
                    ),
                ),
            ]
        )
        manifest_rows = (
            [{"checkpointMetadata": {"version": head}}]
            + top
            + [{"sidecar": sc} for sc in sidecars]
        )
        uid = uuid.uuid4().hex
        mf_path = os.path.join(
            self.log_dir, f"{head:020d}.checkpoint.{uid}.parquet"
        )
        pq.write_table(_table(manifest_rows, manifest_schema), mf_path + ".tmp")
        os.replace(mf_path + ".tmp", mf_path)
        ptr = os.path.join(self.log_dir, "_last_checkpoint")
        with open(ptr + ".tmp", "w") as fh:
            json.dump(
                {
                    "version": head,
                    "size": len(rows),
                    "checkpointId": uid,
                    "sidecarFiles": len(sidecars),
                },
                fh,
            )
        os.replace(ptr + ".tmp", ptr)
        return head

    def clean_log(self) -> list[str]:
        """Delete JSON commit files at or below the checkpoint version —
        the spec's metadata cleanup.  Replay at or after the checkpoint
        is unaffected (it starts from the checkpoint); time travel BELOW
        it now fails loudly.  Returns the deleted file names."""
        cp = self._checkpoint_info()
        if cp is None:
            return []
        deleted = []
        for v in range(cp["version"] + 1):
            path = self._version_path(v)
            if os.path.exists(path):
                os.unlink(path)
                deleted.append(os.path.basename(path))
            # the BELOW-checkpoint crc files describe commits that no
            # longer replay individually; the head checkpoint version's
            # crc stays (its state remains reconstructable)
            if v < cp["version"] and os.path.exists(self._crc_path(v)):
                os.unlink(self._crc_path(v))
        return deleted

    # -- table properties / invariants --------------------------------

    def set_property(self, key: str, value: str) -> int:
        """SET TBLPROPERTIES as a metaData re-emission commit.  Setting a
        ``delta.constraints.<name>`` CHECK expression upgrades the
        protocol to minWriterVersion 3 in the same commit, exactly as
        the spec requires (writers below 3 would not enforce it)."""
        while True:
            head = self.latest_version()
            if head < 0:
                raise ValueError(
                    "set_property on an empty table: commit data first"
                )
            st = self._state(head)
            md = dict(st["metaData"])
            cfg = dict(md.get("configuration") or {})
            cfg[key] = value
            md["configuration"] = cfg
            self._schema_string = md["schemaString"]
            self._partition_columns = md.get("partitionColumns", [])
            actions: list[dict] = [{"metaData": md}]
            proto = st["protocol"] or dict(_PROTOCOL)
            if (
                key.startswith("delta.constraints.")
                and proto.get("minWriterVersion", 2) < 3
            ):
                actions = [
                    {
                        "protocol": {
                            "minReaderVersion": proto.get(
                                "minReaderVersion", 1
                            ),
                            "minWriterVersion": 3,
                        }
                    }
                ] + actions
            try:
                return self._publish(
                    actions, derived_from=head, operation="SET TBLPROPERTIES"
                )
            except DeltaConcurrentCommit:
                continue

    # Spec mapping: legacy minWriterVersion → the writer features it
    # implies, needed when upgrading a table to the table-features
    # protocol (minWriterVersion 7 must LIST everything the table uses).
    _LEGACY_WRITER_FEATURES = {
        2: ("appendOnly", "invariants"),
        3: ("checkConstraints",),
        4: ("changeDataFeed", "generatedColumns"),
        5: ("columnMapping",),
        6: ("identityColumns",),
    }

    def enable_in_commit_timestamps(self) -> int:
        """Enable the spec's inCommitTimestamp WRITER FEATURE: the
        protocol rises to the table-features form (minWriterVersion 7 +
        ``writerFeatures`` listing every implied legacy feature plus
        ``inCommitTimestamp``), the table property
        ``delta.enableInCommitTimestamps`` is set with the spec's
        enablement-provenance keys, and from this commit on EVERY commit
        records a strictly monotonic ``inCommitTimestamp`` in its
        commitInfo — the commit clock that makes timestampAsOf immune to
        log-file mtime perturbation (copies, backups, restores)."""
        while True:
            head = self.latest_version()
            if head < 0:
                raise ValueError("enable ICT on an empty table: commit first")
            st = self._state(head)
            cfg0 = (st["metaData"] or {}).get("configuration") or {}
            if cfg0.get("delta.enableInCommitTimestamps") == "true":
                return head
            proto = st["protocol"] or dict(_PROTOCOL)
            feats = set(proto.get("writerFeatures") or [])
            mw = proto.get("minWriterVersion", 2)
            if mw < 7:
                for v, fs in self._LEGACY_WRITER_FEATURES.items():
                    if mw >= v:
                        feats.update(fs)
            feats.add("inCommitTimestamp")
            md = dict(st["metaData"])
            cfg = dict(md.get("configuration") or {})
            cfg["delta.enableInCommitTimestamps"] = "true"
            cfg["delta.inCommitTimestampEnablementVersion"] = str(head + 1)
            cfg["delta.inCommitTimestampEnablementTimestamp"] = str(
                int(time.time() * 1000)
            )
            md["configuration"] = cfg
            self._schema_string = md["schemaString"]
            self._partition_columns = md.get("partitionColumns", [])
            actions = [
                {
                    "protocol": {
                        "minReaderVersion": proto.get("minReaderVersion", 1),
                        "minWriterVersion": 7,
                        "writerFeatures": sorted(feats),
                    }
                },
                {"metaData": md},
            ]
            try:
                return self._publish(
                    actions, derived_from=head, operation="SET TBLPROPERTIES"
                )
            except DeltaConcurrentCommit:
                continue

    def _commit_timestamp(self, version: int) -> int | None:
        """The commit's inCommitTimestamp when its commitInfo carries
        one (ICT-enabled commits), else None."""
        path = self._version_path(version)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            for line in fh:
                if line.strip():
                    first = json.loads(line)
                    ci = first.get("commitInfo")
                    return ci.get("inCommitTimestamp") if ci else None
        return None

    def add_constraint(self, name: str, expr: str) -> int:
        """ADD CONSTRAINT <name> CHECK (<expr>): stored as the spec's
        ``delta.constraints.<name>`` table property; every subsequent
        data-adding commit validates its rows against the expression."""
        return self.set_property(f"delta.constraints.{name}", expr)

    def _config_at(self, head: int) -> dict:
        if head < 0:
            return {}
        md = self._state(head)["metaData"] or {}
        return md.get("configuration") or {}

    def _check_constraints(self, df: DataFrame, head: int) -> None:
        """Reject the write if any row fails a CHECK constraint.  One
        scan regardless of constraint count (violations OR-ed into a
        single predicate, limit 1); NULL satisfies, per SQL CHECK
        semantics.  At 100 TB this is a map-only pass over the batch
        being written, never the table."""
        cons = {
            k[len("delta.constraints.") :]: v
            for k, v in self._config_at(head).items()
            if k.startswith("delta.constraints.")
        }
        if not cons:
            return
        pred = None
        for expr in cons.values():
            c = ~F.expr(expr)
            pred = c if pred is None else (pred | c)
        bad = (
            df.filter(pred)
            .select(
                "*",
                *[
                    F.expr(e).alias(f"__check_{n}")
                    for n, e in sorted(cons.items())
                ],
            )
            .limit(1)
            .collect()
        )
        if bad:
            row = bad[0].asDict()
            failed = sorted(
                n
                for n in cons
                if row.pop(f"__check_{n}", None) is False
            ) or sorted(cons)
            raise DeltaConstraintViolation(
                f"CHECK constraint(s) {failed} "
                f"({ {n: cons[n] for n in failed} }) violated by row {row}"
            )

    def _guard_append_only(self, head: int, command: str) -> None:
        """delta.appendOnly=true forbids data-changing removes: any
        command that would tombstone live rows (overwrite, merge
        rewrite, delete, restore) must fail; layout-only commits
        (OPTIMIZE, dataChange=false) stay legal per spec."""
        if self._config_at(head).get("delta.appendOnly") == "true":
            raise ValueError(
                f"{command} on an appendOnly table "
                "(delta.appendOnly=true): data-changing removes are "
                "forbidden"
            )

    # -- column mapping (rename / drop without rewrite) ---------------

    def _mapping_at(self, head: int) -> dict | None:
        """``logical name -> physical name`` when the table has
        ``delta.columnMapping.mode = name``; None otherwise.  Parsed
        from the spec's per-field schema metadata
        (``delta.columnMapping.physicalName`` / ``.id``)."""
        if head < 0:
            return None
        if self._config_at(head).get("delta.columnMapping.mode") != "name":
            return None
        md = self._state(head)["metaData"]
        fields = json.loads(md["schemaString"])["fields"]
        return {
            f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
            for f in fields
        }

    def _guard_unmapped(self, head: int, command: str) -> None:
        if self._mapping_at(head) is not None:
            raise NotImplementedError(
                f"{command} on a column-mapped table: mapped tables "
                "support append / read / rename_column / drop_column "
                "here; rewrite commands are future work"
            )

    def _guard_no_dv(self, live: dict, command: str) -> None:
        """Copy-on-write rewrite commands read the affected parquet files
        RAW — on a file carrying a deletion vector that would resurrect
        its dead rows into the rewrite.  ``compact()`` reads through the
        DV-aware :meth:`read` and is the supported purge path."""
        dvd = [p for p, a in live.items() if a.get("deletionVector")]
        if dvd:
            raise NotImplementedError(
                f"{command} on a table with deletion vectors "
                f"({len(dvd)} file(s), e.g. {dvd[0]!r}): run compact() "
                "first to purge DVs into a rewrite, then retry"
            )

    def enable_deletion_vectors(self) -> int:
        """Enable the spec's DELETION VECTORS table feature: the
        protocol rises to the table-features form on BOTH axes
        (minReaderVersion 3 + ``readerFeatures``, minWriterVersion 7 +
        ``writerFeatures``, each listing the legacy-implied features
        plus ``deletionVectors``) and ``delta.enableDeletionVectors``
        is set — the property the spec requires writers to check before
        attaching a DV to any file.  Readers below the feature level
        must refuse the table; that is exactly the point of the reader
        feature (a DV-blind reader would silently resurrect deleted
        rows)."""
        while True:
            head = self.latest_version()
            if head < 0:
                raise ValueError("enable DVs on an empty table: commit first")
            st = self._state(head)
            cfg0 = (st["metaData"] or {}).get("configuration") or {}
            if cfg0.get("delta.enableDeletionVectors") == "true":
                return head
            proto = st["protocol"] or dict(_PROTOCOL)
            wfeats = set(proto.get("writerFeatures") or [])
            mw = proto.get("minWriterVersion", 2)
            if mw < 7:
                for v, fs in self._LEGACY_WRITER_FEATURES.items():
                    if mw >= v:
                        wfeats.update(fs)
            wfeats.add("deletionVectors")
            rfeats = set(proto.get("readerFeatures") or [])
            if proto.get("minReaderVersion", 1) >= 2:
                # Legacy reader version 2's implied feature.
                rfeats.add("columnMapping")
            rfeats.add("deletionVectors")
            md = dict(st["metaData"])
            cfg = dict(md.get("configuration") or {})
            cfg["delta.enableDeletionVectors"] = "true"
            md["configuration"] = cfg
            self._schema_string = md["schemaString"]
            self._partition_columns = md.get("partitionColumns", [])
            actions = [
                {
                    "protocol": {
                        "minReaderVersion": 3,
                        "minWriterVersion": 7,
                        "readerFeatures": sorted(rfeats),
                        "writerFeatures": sorted(wfeats),
                    }
                },
                {"metaData": md},
            ]
            try:
                return self._publish(
                    actions, derived_from=head, operation="SET TBLPROPERTIES"
                )
            except DeltaConcurrentCommit:
                continue

    def enable_column_mapping(self) -> int:
        """ALTER TABLE ... SET delta.columnMapping.mode = 'name': every
        field gets the spec's stable ``delta.columnMapping.id`` and a
        ``physicalName`` (the CURRENT name, so files already on disk
        stay readable — delta-spark's upgrade rule), the protocol rises
        to (minReader 2, minWriter 5), and renames/drops become
        metaData-only commits: zero data files rewritten no matter the
        table size."""
        from pyspark.sql.types import StructField, StructType

        while True:
            head = self.latest_version()
            if head < 0:
                raise ValueError("enable_column_mapping: commit data first")
            if self._mapping_at(head) is not None:
                return head
            st = self._state(head)
            md = dict(st["metaData"])
            if md.get("partitionColumns"):
                raise NotImplementedError(
                    "column mapping on a Hive-partitioned table: "
                    "physical partition dirs would need renaming rules; "
                    "not needed by current callers"
                )
            schema = StructType.fromJson(json.loads(md["schemaString"]))
            new_fields = []
            for i, f in enumerate(schema.fields):
                meta = dict(f.metadata or {})
                meta["delta.columnMapping.id"] = i + 1
                meta["delta.columnMapping.physicalName"] = f.name
                new_fields.append(
                    StructField(f.name, f.dataType, f.nullable, meta)
                )
            md["schemaString"] = StructType(new_fields).json()
            cfg = dict(md.get("configuration") or {})
            cfg["delta.columnMapping.mode"] = "name"
            cfg["delta.columnMapping.maxColumnId"] = str(len(new_fields))
            md["configuration"] = cfg
            self._schema_string = md["schemaString"]
            proto = st["protocol"] or dict(_PROTOCOL)
            actions = [
                {
                    "protocol": {
                        "minReaderVersion": max(
                            2, proto.get("minReaderVersion", 1)
                        ),
                        "minWriterVersion": max(
                            5, proto.get("minWriterVersion", 2)
                        ),
                    }
                },
                {"metaData": md},
            ]
            try:
                return self._publish(
                    actions, derived_from=head, operation="SET TBLPROPERTIES"
                )
            except DeltaConcurrentCommit:
                continue

    def _alter_mapped_schema(self, mutate, operation: str) -> int:
        """Shared rename/drop path: a metaData-only commit rewriting the
        LOGICAL schema while physical names (and therefore every data
        file) stay untouched."""
        from pyspark.sql.types import StructType

        while True:
            head = self.latest_version()
            if self._mapping_at(head) is None:
                raise ValueError(f"{operation} requires column mapping")
            st = self._state(head)
            md = dict(st["metaData"])
            schema = StructType.fromJson(json.loads(md["schemaString"]))
            md["schemaString"] = StructType(
                mutate(list(schema.fields))
            ).json()
            self._schema_string = md["schemaString"]
            try:
                return self._publish(
                    [{"metaData": md}], derived_from=head, operation=operation
                )
            except DeltaConcurrentCommit:
                continue

    def rename_column(self, old: str, new: str) -> int:
        """RENAME COLUMN as a metaData-only commit (no data rewrite):
        the logical name changes, the physical name in the files does
        not."""
        from pyspark.sql.types import StructField

        def mutate(fields):
            if old not in {f.name for f in fields}:
                raise ValueError(f"no such column: {old}")
            return [
                StructField(new, f.dataType, f.nullable, f.metadata)
                if f.name == old
                else f
                for f in fields
            ]

        return self._alter_mapped_schema(mutate, "RENAME COLUMN")

    def drop_column(self, name: str) -> int:
        """DROP COLUMN as a metaData-only commit: the field leaves the
        logical schema; its physical column stays in the files and is
        simply never read again (the spec's drop semantics)."""

        def mutate(fields):
            kept = [f for f in fields if f.name != name]
            if len(kept) == len(fields):
                raise ValueError(f"no such column: {name}")
            if not kept:
                raise ValueError("cannot drop the last column")
            return kept

        return self._alter_mapped_schema(mutate, "DROP COLUMNS")

    def _generated_at(self, head: int) -> dict[str, str]:
        """Generated-column expressions stored in the schema's field
        metadata (the spec's ``delta.generationExpression``) at ``head``."""
        if head < 0:
            return {}
        md = self._state(head)["metaData"] or {}
        s = md.get("schemaString")
        if not s:
            return {}
        out: dict[str, str] = {}
        for f in json.loads(s)["fields"]:
            expr = (f.get("metadata") or {}).get("delta.generationExpression")
            if expr:
                out[f["name"]] = expr
        return out

    def commit_append(
        self,
        df: DataFrame,
        partition_by: list[str] | None = None,
        txn: tuple[str, int] | None = None,
        bloom_for: list[str] | None = None,
        generated: dict[str, str] | None = None,
    ) -> int:
        """Append commit; with ``txn=(appId, epoch)`` the commit is
        IDEMPOTENT: an epoch at or below the app's committed watermark is
        skipped entirely (no files staged, no log entry) and the current
        head is returned — exactly-once for at-least-once callers.

        ``generated`` (first commit only) declares GENERATED COLUMNS —
        the spec's ``delta.generationExpression`` field metadata: later
        appends that omit such a column get it COMPUTED from the stored
        expression, and appends that provide it are VALIDATED against
        the expression (a mismatching batch is refused, like the spec's
        writer obligation) — so derived partition keys (e.g. a date
        bucketed from an event timestamp) can never drift from their
        source column."""
        if txn is not None and txn[1] <= self.last_txn_version(txn[0]):
            return self.latest_version()
        head0 = self.latest_version()
        self._check_constraints(df, head0)  # constraints see LOGICAL names
        mapping = self._mapping_at(head0)
        if mapping is not None:
            if partition_by:
                raise NotImplementedError(
                    "partitioned append on a column-mapped table"
                )
            if set(df.columns) != set(mapping):
                raise ValueError(
                    f"mapped append needs exactly the logical columns "
                    f"{sorted(mapping)}, got {sorted(df.columns)}"
                )
            # Files store PHYSICAL names; the table schema (with its
            # mapping metadata) is authoritative, not the batch's.
            df = df.select(
                [F.col(lg).alias(ph) for lg, ph in mapping.items()]
            )
            self._schema_string = self._state(head0)["metaData"][
                "schemaString"
            ]
            self._partition_columns = []
        else:
            if head0 >= 0 and generated:
                raise ValueError(
                    "generated columns are declared on the FIRST commit; "
                    "later appends inherit them from the schema metadata"
                )
            gens = dict(generated or {}) if head0 < 0 else self._generated_at(head0)
            for col, expr in gens.items():
                if col not in df.columns:
                    df = df.withColumn(col, F.expr(expr))
                elif (
                    df.filter(~F.col(col).eqNullSafe(F.expr(expr)))
                    .limit(1)
                    .count()
                ):
                    raise DeltaConstraintViolation(
                        f"generated column {col!r} does not satisfy its "
                        f"expression {expr!r}"
                    )
            if head0 < 0 and gens:
                schema_json = json.loads(df.schema.json())
                for f in schema_json["fields"]:
                    if f["name"] in gens:
                        f.setdefault("metadata", {})[
                            "delta.generationExpression"
                        ] = gens[f["name"]]
                self._schema_string = json.dumps(schema_json)
            elif gens and {
                f["name"]
                for f in json.loads(
                    self._state(head0)["metaData"]["schemaString"]
                )["fields"]
            } == set(df.columns):
                # Same columns: keep the STORED schema string so the
                # generation metadata survives (df.schema.json() would
                # drop it and trigger a metaData re-emission that erases
                # the expressions).
                stored = self._state(head0)["metaData"]["schemaString"]
                self._schema_string = stored
                df = df.select(
                    [f["name"] for f in json.loads(stored)["fields"]]
                )
            elif gens:
                # Schema evolution on a generated-columns table: the plain
                # df.schema.json() would silently erase
                # delta.generationExpression, so later appends stop
                # computing/validating the column — the exact drift the
                # feature guards against.  Merge the generation metadata
                # into the evolved schema instead.
                schema_json = json.loads(df.schema.json())
                for f in schema_json["fields"]:
                    if f["name"] in gens:
                        f.setdefault("metadata", {})[
                            "delta.generationExpression"
                        ] = gens[f["name"]]
                self._schema_string = json.dumps(schema_json)
            else:
                self._schema_string = df.schema.json()
            self._partition_columns = list(partition_by or [])
        adds = self._stage_files(df, partition_by, bloom_for=bloom_for)
        if txn is None:
            # Plain appends commute with concurrent DATA commits; the
            # classified rebase (commute_ok) raises loudly on a
            # concurrent metadata/protocol change instead of silently
            # replaying rows validated against the old metadata.
            return self._publish(
                adds, derived_from=head0, operation="WRITE", commute_ok=True
            )
        while True:
            head = self.latest_version()
            if txn[1] <= self.last_txn_version(txn[0]):
                # A concurrent instance of the same app committed this
                # epoch while we raced: idempotence wins, drop ours.
                return head
            try:
                return self._publish(
                    [{"txn": {"appId": txn[0], "version": txn[1]}}] + adds,
                    derived_from=head,
                    operation="STREAMING UPDATE",
                    commute_ok=True,
                )
            except DeltaConcurrentCommit:
                continue  # re-check the racer's txn watermark

    def commit_overwrite(self, df: DataFrame) -> int:
        """Replace the table contents: adds for the new files plus remove
        tombstones for every file live at the current head."""
        self._schema_string = df.schema.json()
        while True:
            head = self.latest_version()
            partition_by: list[str] = []
            removes = []
            if head >= 0:
                self._guard_append_only(head, "overwrite")
                self._guard_unmapped(head, "overwrite")
                self._check_constraints(df, head)
                live_map, _, partition_by = self._replay_actions(head)
                removes = [
                    self._remove_action(p, True)
                    for p in sorted(live_map)
                ]
            self._partition_columns = partition_by
            try:
                return self._publish(
                    self._stage_files(df, partition_by or None) + removes,
                    derived_from=head,
                    operation="WRITE",
                )
            except DeltaConcurrentCommit:
                # Tombstones were computed against a stale head — the
                # racer's files would survive the overwrite untombstoned.
                # Re-derive everything; the lost attempt's staged files
                # are unreferenced by any commit and vacuum() removes
                # them.
                continue

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        zorder_by: list[str] | None = None,
    ) -> int:
        """OPTIMIZE-style bin-packing compaction: rewrite the live file
        set into ~``target_file_bytes`` files and commit adds + removes
        with ``dataChange: false`` — table CONTENTS are untouched (the
        spec's signal that incremental consumers may skip the commit),
        only the physical layout changes.

        This is the maintenance half of the 100 TB ingest story: a
        streaming or micro-batch append pipeline accretes many small
        files (one+ per trigger per partition); scan cost and driver
        file-listing state grow with file COUNT, not bytes.  Periodic
        bin-packing keeps the file count ~bytes/target regardless of how
        the data arrived.  The rewrite reads only live files (log
        replay), writes through the same staged path as any commit, and
        publishes atomically — readers at any version never see a
        half-compacted table."""
        while True:
            try:
                return self._compact_once(target_file_bytes, zorder_by)
            except DeltaConcurrentCommit:
                # The rewrite snapshotted a stale live set; a racer's
                # commit (e.g. an append) must not be tombstoned away or
                # double-counted — re-derive from the new head.
                continue

    def _compact_once(
        self,
        target_file_bytes: int,
        zorder_by: list[str] | None,
    ) -> int:
        head = self.latest_version()
        self._guard_unmapped(head, "OPTIMIZE")
        live_map, _, partition_cols = self._replay_actions(head)
        if not live_map:
            return head
        live = sorted(live_map)
        total = sum(
            os.stat(os.path.join(self.root, p)).st_size for p in live
        )
        n_out = max(1, -(-total // target_file_bytes))  # ceil
        df = self.read(version=head)
        if zorder_by:
            # OPTIMIZE ZORDER: cluster the rewrite on the given key(s)
            # (typically a precomputed space-filling-curve column, cf.
            # operators/layout.py) so every output file covers a TIGHT
            # range of the clustered dimensions — the add actions' stats
            # then prune files for box predicates from the log alone.
            df = df.repartitionByRange(n_out, *zorder_by).sortWithinPartitions(
                *zorder_by
            )
        else:
            df = df.repartition(n_out)
        self._schema_string = df.schema.json()
        self._partition_columns = partition_cols
        adds = self._stage_files(df, partition_cols or None)
        for a in adds:
            a["add"]["dataChange"] = False
        removes = [self._remove_action(p, False) for p in live]
        return self._publish(adds + removes, derived_from=head, operation="OPTIMIZE")

    def commit_merge(
        self,
        source: DataFrame,
        keys: list[str],
        txn: tuple[str, int] | None = None,
    ) -> int:
        """MERGE (upsert) by ``keys``: target rows whose key matches a
        source row are REPLACED by the source row, unmatched source rows
        are INSERTED, all in one atomic commit — the canonical CDC
        ingest op (Delta's ``MERGE INTO`` with matched-update +
        not-matched-insert).

        Copy-on-write with STATS-BASED FILE PRUNING: a data file is
        rewritten only if its per-column min/max range (from the add
        action's ``stats``) overlaps the source's key bounds on EVERY
        key column — files that cannot contain a matching key carry
        their add actions over untouched.  At 100 TB with key-clustered
        layout (ext_zorder_layout composes here) a trickle of CDC
        rewrites only the files it actually touches; rewrite volume
        follows the UPDATE's locality, not the table size.  Files with
        no stats on a key column are conservatively rewritten.

        With ``txn=(appId, epoch)`` the merge is IDEMPOTENT exactly like
        :meth:`commit_append`: an epoch at or below the app's committed
        watermark is skipped — the streaming-CDC exactly-once handshake
        (a replayed micro-batch upsert must not double-apply)."""
        while True:
            try:
                return self._commit_merge_once(source, keys, txn)
            except DeltaConcurrentCommit:
                # The rewrite was computed against a stale head — a
                # racer's rows would be silently lost; re-derive.
                continue

    def _commit_merge_once(
        self,
        source: DataFrame,
        keys: list[str],
        txn: tuple[str, int] | None = None,
    ) -> int:
        head = self.latest_version()
        # Watermark check INSIDE the retry loop: a racing instance of the
        # same app may have committed this very epoch.
        if txn is not None and txn[1] <= self.last_txn_version(txn[0]):
            return head
        txn_actions = (
            [{"txn": {"appId": txn[0], "version": txn[1]}}] if txn else []
        )
        if head < 0:
            self._schema_string = source.schema.json()
            self._partition_columns = []
            return self._publish(
                txn_actions + self._stage_files(source),
                derived_from=head,
                operation="MERGE",
            )
        self._guard_append_only(head, "MERGE")
        self._guard_unmapped(head, "MERGE")
        self._check_constraints(source, head)
        live, schema_s, partition_cols = self._replay_actions(head)
        self._guard_no_dv(live, "MERGE")
        if partition_cols:
            raise NotImplementedError(
                "merge on a Hive-partitioned table: partition columns in "
                "the merge keys prune by partitionValues instead; not "
                "needed by current callers"
            )
        # Bounded collect: one row of source key min/max bounds.
        bounds = source.agg(
            *[F.min(k).alias(f"lo_{k}") for k in keys],
            *[F.max(k).alias(f"hi_{k}") for k in keys],
        ).collect()[0]

        def overlaps(add: dict) -> bool:
            stats = json.loads(add["stats"]) if "stats" in add else {}
            for k in keys:
                mn = stats.get("minValues", {}).get(k)
                mx = stats.get("maxValues", {}).get(k)
                if mn is None or mx is None:
                    return True  # no stats: must assume a match
                lo, hi = bounds[f"lo_{k}"], bounds[f"hi_{k}"]
                if lo is None:
                    return False  # empty source: nothing matches
                if self._stats_disjoint(mn, mx, lo, hi):
                    return False
            return True

        affected = sorted(p for p, a in live.items() if overlaps(a))
        untouched = [live[p] for p in sorted(live) if p not in affected]
        from pyspark.sql.types import StructType

        full_schema = StructType.fromJson(json.loads(schema_s))
        # MERGE WITH SCHEMA EVOLUTION (the spec command's automatic
        # form): the committed schema is the UNION — target columns in
        # their existing order (keeping the target's field metadata),
        # then source-only columns appended.  Source rows keep their
        # new-column VALUES; carried-over and rewritten target rows read
        # the new columns as null; a source missing target-only columns
        # inserts null there.  (Previously a wider source evolved the
        # declared schema but its new-column values were silently
        # dropped in the rewrite branch — the two branches disagreed.)
        tnames = {f.name for f in full_schema.fields}
        union_fields = [f for f in full_schema.fields] + [
            f for f in source.schema.fields if f.name not in tnames
        ]
        self._schema_string = StructType(union_fields).json()
        self._partition_columns = []

        def _proj(df: DataFrame) -> DataFrame:
            """Project ``df`` onto the union schema: absent columns
            become typed nulls, order is the union order."""
            for f in union_fields:
                if f.name not in df.columns:
                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
            return df.select([f.name for f in union_fields])

        cdc_actions: list[dict] = []
        if affected:
            target = self.spark.read.schema(full_schema).parquet(
                *[os.path.join(self.root, p) for p in affected]
            )
            merged = _proj(
                target.join(source.select(keys), keys, "left_anti")
            ).union(_proj(source))
            if self.change_data_feed:
                # Change rows for this commit: matched target rows are
                # update pre/postimages, unmatched source rows inserts.
                # Stats pruning guarantees any file holding a matching
                # key is in ``affected``, so ``target`` sees every
                # possible match.  Carried-over (anti-joined) rewrite
                # rows are deliberately NOT changes — that is the whole
                # point of the cdc action vs the add/remove fallback.
                tkeys = target.select(keys)
                changes = (
                    _proj(target.join(source.select(keys), keys, "left_semi"))
                    .withColumn("_change_type", F.lit("update_preimage"))
                    .unionByName(
                        _proj(source.join(tkeys, keys, "left_semi"))
                        .withColumn(
                            "_change_type", F.lit("update_postimage")
                        )
                    )
                    .unionByName(
                        _proj(source.join(tkeys, keys, "left_anti"))
                        .withColumn("_change_type", F.lit("insert"))
                    )
                )
                cdc_actions = self._stage_cdc_files(changes)
        else:
            # Adds-only commit: CDF readers derive inserts from the add
            # files themselves (the spec's fallback) — no cdc file.
            # Projection through the union schema keeps this branch
            # consistent with the rewrite branch's column set.
            merged = _proj(source)
        adds = self._stage_files(merged)
        removes = [self._remove_action(p, True) for p in affected]
        return self._publish(
            txn_actions + adds + removes + cdc_actions,
            derived_from=head,
            operation="MERGE",
        )

    def commit_delete(self, column: str, lo, hi) -> int:
        """DELETE rows with ``column`` in [lo, hi] — the GDPR/retention
        primitive — as stats-pruned copy-on-write: only files whose
        stats range intersects [lo, hi] are rewritten (minus the doomed
        rows); disjoint files carry over untouched, and a rewrite that
        would come back empty becomes a pure remove.  One atomic commit;
        at 100 TB a key-clustered layout (compact(zorder_by=...)) makes
        the rewrite volume follow the delete's locality."""
        while True:
            try:
                return self._commit_delete_once(column, lo, hi)
            except DeltaConcurrentCommit:
                continue  # stale rewrite would lose the racer's rows

    def _commit_delete_once(self, column: str, lo, hi) -> int:
        head = self.latest_version()
        if head < 0:
            raise ValueError("cannot delete from an empty table")
        self._guard_append_only(head, "DELETE")
        self._guard_unmapped(head, "DELETE")
        live, schema_s, partition_cols = self._replay_actions(head)
        self._guard_no_dv(live, "copy-on-write DELETE")
        if partition_cols:
            raise NotImplementedError(
                "delete on a Hive-partitioned table: partition-column "
                "predicates drop whole directories instead; not needed "
                "by current callers"
            )

        def intersects(add: dict) -> bool:
            stats = json.loads(add["stats"]) if "stats" in add else {}
            mn = stats.get("minValues", {}).get(column)
            mx = stats.get("maxValues", {}).get(column)
            if mn is None or mx is None:
                return True  # no stats: must assume doomed rows inside
            return not self._stats_disjoint(mn, mx, lo, hi)

        affected = sorted(p for p, a in live.items() if intersects(a))
        if not affected:
            return head  # nothing to delete, no commit
        from pyspark.sql.types import StructType

        full_schema = StructType.fromJson(json.loads(schema_s))
        target = self.spark.read.schema(full_schema).parquet(
            *[os.path.join(self.root, p) for p in affected]
        )
        kept = target.filter(~F.col(column).between(lo, hi))
        self._schema_string = schema_s
        self._partition_columns = []
        cdc_actions: list[dict] = []
        if self.change_data_feed:
            # The doomed rows ARE the change set; surviving rewrite rows
            # are not changes (vs the add/remove fallback, which would
            # misreport every rewritten row as delete+insert).
            cdc_actions = self._stage_cdc_files(
                target.filter(F.col(column).between(lo, hi)).withColumn(
                    "_change_type", F.lit("delete")
                )
            )
        adds = self._stage_files(kept)  # zero-row outputs are dropped
        removes = [self._remove_action(p, True) for p in affected]
        return self._publish(
            adds + removes + cdc_actions,
            derived_from=head,
            operation="DELETE",
        )

    def delete_rows_dv(self, column: str, lo, hi) -> int:
        """MERGE-ON-READ DELETE of rows with ``column`` in [lo, hi] via
        the spec's deletion-vectors feature: NO data file is rewritten —
        each affected file gets an inline roaring-bitmap DV
        (dv_bitmap.py) marking its doomed row indexes, committed as the
        spec's update pair (``remove`` of the old file version, then
        ``add`` of the SAME path carrying the new ``deletionVector``
        descriptor; a file already carrying a DV gets the union).  A
        file whose every row dies becomes a pure remove.

        This is the 100 TB DELETE shape copy-on-write cannot reach:
        work is one pruned scan computing doomed row positions plus
        O(deleted rows) of driver-side bitmap metadata — rewrite volume
        ZERO, where :meth:`commit_delete` rewrites every intersecting
        file.  The trade moves to read time (an anti-join against the
        bitmap positions) until ``compact()`` purges the DVs into a
        rewrite.  Requires :meth:`enable_deletion_vectors` first (the
        spec's writer obligation).  Returns the new version (or the
        head unchanged when nothing matched)."""
        while True:
            try:
                return self._delete_rows_dv_once(column, lo, hi)
            except DeltaConcurrentCommit:
                continue  # DVs were derived against a stale head

    def _delete_rows_dv_once(self, column: str, lo, hi) -> int:
        head = self.latest_version()
        if head < 0:
            raise ValueError("cannot delete from an empty table")
        st = self._state(head)
        cfg = (st["metaData"] or {}).get("configuration") or {}
        if cfg.get("delta.enableDeletionVectors") != "true":
            raise ValueError(
                "deletion vectors are not enabled on this table; call "
                "enable_deletion_vectors() first (spec: writers must "
                "check delta.enableDeletionVectors before attaching DVs)"
            )
        self._guard_append_only(head, "DELETE")
        self._guard_unmapped(head, "DELETE")
        live, schema_s, partition_cols = self._replay_actions(head)
        if partition_cols:
            if column in partition_cols:
                raise ValueError(
                    "DV delete on a PARTITION column: a partition "
                    "predicate doomes whole directories — use the "
                    "metadata-only path (tombstone the partition's "
                    "files), never per-row bitmaps"
                )
            if self.change_data_feed:
                raise NotImplementedError(
                    "CDF change rows for a partitioned DV delete"
                )

        def intersects(add: dict) -> bool:
            stats = json.loads(add["stats"]) if "stats" in add else {}
            mn = stats.get("minValues", {}).get(column)
            mx = stats.get("maxValues", {}).get(column)
            if mn is None or mx is None:
                return True
            return not self._stats_disjoint(mn, mx, lo, hi)

        affected = sorted(p for p, a in live.items() if intersects(a))
        if not affected:
            return head
        from pyspark.sql.types import StructType

        full_schema = StructType.fromJson(json.loads(schema_s))
        # Partitioned tables: data files do not STORE partition columns,
        # so the doomed-row scan (and the CDC scan) read the data-only
        # schema; the predicate column is guarded to be a data column.
        scan_schema = StructType(
            [f for f in full_schema.fields if f.name not in partition_cols]
        )
        # One pruned scan over the stats-intersecting files, projecting
        # ONLY the predicate column plus the parquet row index — the
        # collect is bounded by the count of rows this DELETE dooms (the
        # change volume), never by table size.
        doomed_rows = (
            self.spark.read.schema(scan_schema)
            .parquet(*[os.path.join(self.root, p) for p in affected])
            .select(
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("f"),
                F.col("_metadata.row_index").alias("pos"),
                F.col(column).alias("v"),
            )
            .filter(F.col("v").between(lo, hi))
            .select("f", "pos")
            .collect()
        )
        by_file: dict[str, list[int]] = {}
        for r in doomed_rows:
            by_file.setdefault(r["f"], []).append(int(r["pos"]))
        removes: list[dict] = []
        adds: list[dict] = []
        cdc_doomed: list[tuple[str, set[int]]] = []
        for path in affected:
            base = os.path.basename(path)
            fresh = set(by_file.get(base, ()))
            if not fresh:
                continue  # stats intersected but no row matched
            old_add = live[path]
            old_dv = old_add.get("deletionVector")
            prior = set(dv_positions(old_dv)) if old_dv else set()
            new_positions = prior | fresh
            cdc_doomed.append((path, fresh - prior))
            n_records = json.loads(old_add.get("stats", "{}")).get(
                "numRecords"
            )
            removes.append(self._remove_action(path, True))
            if n_records is not None and len(new_positions) >= n_records:
                continue  # whole file dead: pure remove
            new_add = dict(old_add)
            new_add["deletionVector"] = dv_descriptor(new_positions)
            new_add["dataChange"] = True
            adds.append({"add": new_add})
        if not removes:
            return head
        cdc_actions: list[dict] = []
        if self.change_data_feed:
            # Change rows = THIS delete's doomed rows only (positions
            # already dead under a prior DV must not re-emit).
            pairs = [
                (os.path.basename(p), int(pos))
                for p, fresh in cdc_doomed
                for pos in fresh
            ]
            if pairs:
                pos_df = self.spark.createDataFrame(
                    pairs, "f string, pos bigint"
                )
                changed = (
                    self.spark.read.schema(full_schema)
                    .parquet(
                        *[
                            os.path.join(self.root, p)
                            for p, fresh in cdc_doomed
                            if fresh
                        ]
                    )
                    .withColumn(
                        "f",
                        F.element_at(
                            F.split(F.col("_metadata.file_path"), "/"), -1
                        ),
                    )
                    .withColumn("pos", F.col("_metadata.row_index"))
                    .join(F.broadcast(pos_df), ["f", "pos"], "left_semi")
                    .drop("f", "pos")
                    .withColumn("_change_type", F.lit("delete"))
                )
                cdc_actions = self._stage_cdc_files(changed)
        self._schema_string = schema_s
        self._partition_columns = []
        # Removes BEFORE the same-path adds: replay folds actions in
        # order, so [remove(p), add(p)] leaves the NEW add live.
        return self._publish(
            removes + adds + cdc_actions,
            derived_from=head,
            operation="DELETE",
        )

    def purge_dvs(self, min_dv_fraction: float = 0.0) -> int:
        """REORG-PURGE (Delta's ``REORG TABLE ... APPLY (PURGE)``): rewrite
        live files whose deletion-vector fraction is at or above
        ``min_dv_fraction`` into clean files WITHOUT their soft-deleted
        rows, dropping the DV descriptors.  Committed with ``dataChange:
        false`` — logical table content is unchanged (the rows were
        already deleted), so incremental consumers skip the commit
        exactly like a compaction.

        This is the second half of the merge-on-read lifecycle:
        :meth:`delete_rows_dv` makes DELETE O(change volume) but leaves
        read amplification behind (every scan anti-joins the bitmaps);
        a periodic threshold purge bounds that amplification — files
        that accumulated heavy DVs pay one rewrite and return to plain
        scans, lightly-vectored files are left alone.  Returns the new
        version (head unchanged when nothing crosses the threshold)."""
        while True:
            try:
                return self._purge_dvs_once(min_dv_fraction)
            except DeltaConcurrentCommit:
                continue  # the target set was derived against a stale head

    def _purge_dvs_once(self, min_dv_fraction: float) -> int:
        head = self.latest_version()
        self._guard_unmapped(head, "REORG")
        live, schema_s, partition_cols = self._replay_actions(head)
        if partition_cols:
            raise NotImplementedError(
                "REORG PURGE on a Hive-partitioned table (DV delete "
                "refuses partitioned tables, so none can carry DVs)"
            )
        targets: list[str] = []
        for p, a in sorted(live.items()):
            dv = a.get("deletionVector")
            if not dv:
                continue
            n_rec = json.loads(a.get("stats", "{}")).get("numRecords")
            n_del = dv.get("cardinality") or len(dv_positions(dv))
            frac = (n_del / n_rec) if n_rec else 1.0
            if frac >= min_dv_fraction:
                targets.append(p)
        if not targets:
            return head
        from pyspark.sql.types import StructType

        full_schema = StructType.fromJson(json.loads(schema_s))
        pos_pairs = [
            (os.path.basename(p), int(pos))
            for p in targets
            for pos in dv_positions(live[p]["deletionVector"])
        ]
        pos_df = self.spark.createDataFrame(pos_pairs, "f string, pos bigint")
        # One scan over the purge targets; the anti-join against the DV
        # positions drops exactly the soft-deleted rows.  The bitmap side
        # is bounded by deleted-row count (change volume, not table size).
        surviving = (
            self.spark.read.schema(full_schema)
            .parquet(*[os.path.join(self.root, p) for p in targets])
            .withColumn(
                "f",
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
            )
            .withColumn("pos", F.col("_metadata.row_index"))
            .join(F.broadcast(pos_df), ["f", "pos"], "left_anti")
            .drop("f", "pos")
        )
        self._schema_string = schema_s
        self._partition_columns = []
        adds = self._stage_files(surviving, None)
        for a in adds:
            a["add"]["dataChange"] = False
        removes = [self._remove_action(p, False) for p in targets]
        return self._publish(
            removes + adds, derived_from=head, operation="REORG"
        )

    def restore(self, version: int) -> int:
        """RESTORE TABLE to ``version`` as a NEW commit: adds for the
        files live at the target version, removes for current-only
        files — history is preserved (the restore itself is
        time-travelable), exactly the spec command's behavior.  Fails
        loudly if the target's files were already vacuumed."""
        while True:
            try:
                return self._restore_once(version)
            except DeltaConcurrentCommit:
                continue  # diff vs the head must be recomputed

    def _restore_once(self, version: int) -> int:
        head = self.latest_version()
        self._guard_append_only(head, "RESTORE")
        self._guard_unmapped(head, "RESTORE")
        target, schema_s, partition_cols = self._replay_actions(version)
        current, _, _ = self._replay_actions(head)
        missing = [
            p
            for p in target
            if not os.path.isfile(os.path.join(self.root, p))
        ]
        if missing:
            raise ValueError(
                f"cannot restore to version {version}: {len(missing)} data "
                f"file(s) were vacuumed (e.g. {missing[0]!r})"
            )
        self._schema_string = schema_s
        self._partition_columns = partition_cols
        adds = [{"add": target[p]} for p in sorted(target) if p not in current]
        removes = [
            self._remove_action(p, True)
            for p in sorted(current)
            if p not in target
        ]
        return self._publish(adds + removes, derived_from=head, operation="RESTORE")

    def vacuum(self, retention_ms: int | None = None) -> list[str]:
        """Delete data files not live at the head — the retention-expired
        cleanup step.  With ``retention_ms`` given, a tombstoned file
        whose ``deletionTimestamp`` is still inside the window SURVIVES
        (the spec's retention check: readers of recent versions may still
        be scanning it); with None the window collapses to 'not reachable
        from the head' (the wall-clock-free policy tests pin).  Files on
        disk with neither an add nor a tombstone (orphans of a lost
        commit race) are invisible to every reader and always deleted.
        Time travel to versions whose files were vacuumed stops working,
        exactly as in the real protocol."""
        head = self.latest_version()
        state = self._state(head)
        keep = set(state["live"])
        if retention_ms is not None:
            cutoff = int(time.time() * 1000) - retention_ms
            for path, r in state["removed"].items():
                ts = r.get("deletionTimestamp")
                if ts is not None and ts > cutoff:
                    keep.add(path)  # tombstone younger than the window
        # CDC files referenced by a still-readable commit stay (the
        # change feed for those versions remains consumable); orphans of
        # a lost commit race are unreferenced and go.
        referenced_cdc = set()
        for p in glob.glob(os.path.join(self.log_dir, "*.json")):
            with open(p) as fh:
                for line in fh:
                    if line.strip():
                        a = json.loads(line)
                        if "cdc" in a:
                            referenced_cdc.add(a["cdc"]["path"])
        keep |= referenced_cdc
        deleted = []
        for path in glob.glob(
            os.path.join(self.root, "**", "*.parquet"), recursive=True
        ):
            if os.sep + "_delta_log" + os.sep in path:
                continue  # checkpoints are log artifacts, never data
            rel = os.path.relpath(path, self.root)
            if rel not in keep:
                os.unlink(path)
                deleted.append(rel)
        return sorted(deleted)

    def fsck(self, dry_run: bool = False) -> list[str]:
        """FSCK REPAIR TABLE: find live add entries whose data files are
        MISSING from storage (manual deletion, failed restore, storage
        loss) and publish remove tombstones for them so reads stop
        failing on dead references.  ``dry_run`` lists the orphaned
        entries without committing.  Driver-side and log-sized: it
        stats each live file's existence, never opens data."""
        while True:
            head = self.latest_version()
            if head < 0:
                return []
            live, _, _ = self._replay_actions(head)
            missing = sorted(
                p
                for p in live
                if not os.path.isfile(os.path.join(self.root, p))
            )
            if dry_run or not missing:
                return missing
            removes = [self._remove_action(p, True) for p in missing]
            try:
                self._publish(removes, derived_from=head, operation="FSCK")
                return missing
            except DeltaConcurrentCommit:
                continue  # a racer changed the live set; re-scan

    def clone_to(
        self, target_root: str, version: int | None = None
    ) -> "DeltaLogTable":
        """SHALLOW CLONE (the spec's ``CREATE TABLE t SHALLOW CLONE s``):
        create a NEW table at ``target_root`` whose version-0 commit
        references the source's live files by ABSOLUTE path — zero data
        bytes copied, metadata only.  The clone is pinned to the source
        AS OF ``version`` (head when None): later source commits never
        appear in it, and clone-side writes (appends, copy-on-write
        deletes, overwrites) land under the clone's own root, so the two
        tables diverge without ever touching each other's files.  Stats
        and partitionValues carry over verbatim, so log-metadata file
        skipping keeps working against the borrowed files.

        Same caveat as the real command: VACUUM on the SOURCE can delete
        files the clone still references (the clone's log is invisible
        to the source's reachability walk) — reads then fail loudly.

        At 100 TB this is the cheap-fork primitive: an experiment or
        backfill branch over a petabyte table costs one log commit,
        and only its divergence is ever materialized."""
        head = self.latest_version() if version is None else version
        state = self._state(head)
        md = state["metaData"] or {}
        clone = DeltaLogTable(self.spark, target_root)
        if clone.latest_version() >= 0:
            raise ValueError(
                f"clone target {target_root!r} already has a Delta log"
            )
        if any(a.get("deletionVector") for a in state["live"].values()):
            # DV descriptors resolve relative to the TABLE root; borrowed
            # absolute-path files would look for their DVs under the
            # clone's root.  Purge first (purge_dvs), then clone.
            raise NotImplementedError(
                "SHALLOW CLONE of a table with live deletion vectors"
            )
        clone._schema_string = md.get("schemaString")
        clone._partition_columns = md.get("partitionColumns", [])
        clone._config_seed = dict(md.get("configuration") or {})
        # A clone of a CDF table must BEHAVE like one, not just advertise
        # it: the seeded configuration carries delta.enableChangeDataFeed,
        # and if the clone's flag stayed False its DELETE/MERGE commits
        # would write no cdc actions while the table properties promise
        # them (readers would misreport rewritten carried-over rows).
        if clone._config_seed.get("delta.enableChangeDataFeed") == "true":
            clone.change_data_feed = True
        adds = []
        for path in sorted(state["live"]):
            a = dict(state["live"][path])
            a["path"] = (
                path
                if os.path.isabs(path)
                else os.path.join(self.root, path)
            )
            adds.append({"add": a})
        clone._publish(adds, operation="CLONE")
        return clone

    def replicate_to(self, replica_root: str, last_synced: int = -1) -> int:
        """Incremental LOG-SHIPPING replication: copy commits
        ``last_synced+1 .. head`` (data files first, the 20-digit commit
        JSON last — the commit file is the publish point, so a replica
        reader never sees a version whose data files are still in
        flight) into ``replica_root``, which becomes a byte-identical,
        independently-openable Delta table at the same versions.

        This works ONLY because the log is self-contained — every data
        file an add/cdc action references lives under the table root at
        the action's relative path, and inline deletion vectors ride in
        the descriptor itself — which is the property that makes
        cross-region lakehouse replication a FILE COPY problem instead
        of a query problem.  Per sync the work is O(new change volume):
        a 100 TB table with a trickle of commits ships the trickle.
        Commits below a cleaned checkpoint cannot be shipped this way
        (``_actions`` raises); bootstrap-from-checkpoint is the
        documented recovery path, not silent partial sync.

        Returns the new high-water mark (the head version shipped);
        re-shipping an already-synced version is idempotent (same
        bytes, atomic ``os.replace``)."""
        head = self.latest_version()
        log_dst = os.path.join(replica_root, "_delta_log")
        os.makedirs(log_dst, exist_ok=True)
        for v in range(last_synced + 1, head + 1):
            for a in self._actions(v):
                payload = a.get("add") or a.get("cdc")
                if payload is None:
                    continue
                dv = (payload.get("deletionVector") or {})
                if dv.get("storageType") not in (None, "i"):
                    raise NotImplementedError(
                        "replicating on-disk deletion vectors: only "
                        "inline ('i') DVs are written here"
                    )
                rel = payload["path"]
                dst = os.path.join(replica_root, rel)
                if not os.path.exists(dst):
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    tmp = dst + f".inflight-{uuid.uuid4().hex}"
                    shutil.copyfile(os.path.join(self.root, rel), tmp)
                    os.replace(tmp, dst)
            tmp = os.path.join(log_dst, f".inflight-{uuid.uuid4().hex}")
            shutil.copyfile(self._version_path(v), tmp)
            os.replace(tmp, os.path.join(log_dst, f"{v:020d}.json"))
        return head

    def history(self) -> list[dict]:
        """DESCRIBE HISTORY: one row per reachable JSON commit, newest
        first — version, timestamp (the commit file's mtime, the spec's
        commit-time rule), and the ``commitInfo`` operation name when the
        commit recorded one.  Driver-side and log-sized (KBs even for a
        100 TB table); commits below a cleaned checkpoint are gone,
        exactly as in the real protocol."""
        rows = []
        for p in glob.glob(os.path.join(self.log_dir, "*.json")):
            version = int(os.path.basename(p).split(".")[0])
            operation = None
            ict = None
            with open(p) as fh:
                for line in fh:
                    if line.strip():
                        first = json.loads(line)
                        if "commitInfo" in first:
                            operation = first["commitInfo"].get("operation")
                            ict = first["commitInfo"].get("inCommitTimestamp")
                        break  # commitInfo is the first line when present
            rows.append(
                {
                    "version": version,
                    "timestamp": int(ict or os.path.getmtime(p) * 1000),
                    "operation": operation,
                }
            )
        return sorted(rows, key=lambda r: -r["version"])

    def table_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """CHANGE DATA FEED: row-level changes in commits
        (``from_version``, ``to_version``] — the spec's
        ``table_changes`` read.  Output = table columns at
        ``to_version`` plus ``_change_type`` (insert / delete /
        update_preimage / update_postimage) and ``_commit_version``.

        Per commit, exactly the real reader's dispatch: when the commit
        carries ``cdc`` actions their files are used EXCLUSIVELY;
        otherwise changes derive from the data actions — dataChange adds
        are inserts, dataChange removes are deletes (sound only because
        MERGE/DELETE on a CDF table always write cdc actions; a
        copy-on-write rewrite read through the fallback would misreport
        carried-over rows).  dataChange=false commits (OPTIMIZE) emit
        nothing.  Needs the JSON commits (CDF below a cleaned checkpoint
        is gone) and the tombstoned data files (vacuum ends the feed for
        the versions it touches) — both exactly as in the real protocol.

        Scale: one pass over the change volume itself; log iteration is
        driver-side and log-sized.  Older files project through the
        ``to_version`` schema (absent columns null), so schema evolution
        inside the range is readable."""
        head = self.latest_version()
        to = head if to_version is None else to_version
        _, schema_s, partition_cols = self._replay_actions(to)
        if partition_cols:
            raise NotImplementedError(
                "CDF read on a Hive-partitioned table: partition columns "
                "would need reconstruction per file; not needed by "
                "current callers"
            )
        from pyspark.sql.types import (
            LongType,
            StringType,
            StructField,
            StructType,
        )

        full_schema = StructType.fromJson(json.loads(schema_s))
        cdc_schema = StructType(
            list(full_schema.fields)
            + [StructField("_change_type", StringType())]
        )

        def _read(paths: list[str], schema) -> DataFrame:
            return self.spark.read.schema(schema).parquet(
                *[os.path.join(self.root, p) for p in sorted(paths)]
            )

        frames = []
        for v in range(from_version + 1, to + 1):
            actions = self._actions(v)
            cdc_paths = [a["cdc"]["path"] for a in actions if "cdc" in a]
            if cdc_paths:
                df = _read(cdc_paths, cdc_schema)
            else:
                adds = [
                    a["add"]["path"]
                    for a in actions
                    if "add" in a and a["add"].get("dataChange", True)
                ]
                removes = [
                    a["remove"]["path"]
                    for a in actions
                    if "remove" in a
                    and a["remove"].get("dataChange", True)
                ]
                parts = []
                if adds:
                    parts.append(
                        _read(adds, full_schema).withColumn(
                            "_change_type", F.lit("insert")
                        )
                    )
                if removes:
                    parts.append(
                        _read(removes, full_schema).withColumn(
                            "_change_type", F.lit("delete")
                        )
                    )
                if not parts:
                    continue  # metadata-only or OPTIMIZE commit
                df = parts[0]
                for p in parts[1:]:
                    df = df.unionByName(p)
            frames.append(
                df.withColumn("_commit_version", F.lit(v).cast("long"))
            )
        out_schema = StructType(
            list(cdc_schema.fields)
            + [StructField("_commit_version", LongType())]
        )
        if not frames:
            return self.spark.createDataFrame([], out_schema)
        out = frames[0]
        for df in frames[1:]:
            out = out.unionByName(df)
        return out

    # -- read path ----------------------------------------------------

    def _prune(
        self, adds: dict[str, dict], where: dict | None
    ) -> list[str]:
        """File skipping from LOG METADATA alone: drop files whose
        partitionValues mismatch an exact predicate or whose stats
        min/max range excludes a range predicate.  ``where`` maps column
        -> exact value, or column -> (lo, hi) inclusive range.  Files
        with no stats for a predicated column are conservatively kept."""
        if not where:
            return sorted(adds)
        kept = []
        for path, add in adds.items():
            ok = True
            stats = json.loads(add["stats"]) if "stats" in add else {}
            for col, pred in where.items():
                if col in add.get("partitionValues", {}):
                    want = pred if not isinstance(pred, tuple) else None
                    if want is not None and add["partitionValues"][col] != str(
                        want
                    ):
                        ok = False
                        break
                    continue
                lo_hi = (
                    pred if isinstance(pred, tuple) else (pred, pred)
                )
                mn = stats.get("minValues", {}).get(col)
                mx = stats.get("maxValues", {}).get(col)
                if (
                    mn is not None
                    and mx is not None
                    and self._stats_disjoint(mn, mx, lo_hi[0], lo_hi[1])
                ):
                    ok = False
                    break
                # Point predicate + per-file bloom: skip on a definite
                # miss (no false negatives by construction) — prunes
                # hash-distributed keys where every file's min/max
                # range overlaps the probe.
                bf = add.get("engineBloom", {}).get(col)
                if (
                    bf is not None
                    and not isinstance(pred, tuple)
                    and not self._bloom_maybe_contains(bf, pred)
                ):
                    ok = False
                    break
            if ok:
                kept.append(path)
        return sorted(kept)

    def version_at_timestamp(self, ts_ms: int) -> int:
        """Latest version committed at or before ``ts_ms`` — Delta's
        ``timestampAsOf`` resolution: a commit's timestamp is its
        ``inCommitTimestamp`` when the commit recorded one (the ICT
        writer feature — immune to file-copy/restore mtime perturbation)
        and otherwise its log file's modification time (the legacy
        rule), with the spec's documented caveat that log cleanup makes
        older timestamps unresolvable."""
        commits = sorted(
            (
                int(os.path.basename(p).split(".")[0]),
                self._commit_timestamp(
                    int(os.path.basename(p).split(".")[0])
                )
                or os.path.getmtime(p) * 1000,
            )
            for p in glob.glob(os.path.join(self.log_dir, "*.json"))
        )
        cp = self._checkpoint_info()
        eligible = [v for v, mt in commits if mt <= ts_ms]
        if eligible:
            return max(eligible)
        if cp is not None:
            raise ValueError(
                f"no commit at or before timestamp {ts_ms}; commits at or "
                f"below checkpoint version {cp['version']} were cleaned"
            )
        raise ValueError(f"no commit at or before timestamp {ts_ms}")

    def _read_dv_files(self, dv_live: dict, full_schema) -> DataFrame:
        """Read files carrying deletion vectors: decode each file's
        bitmap to its doomed row indexes (driver-side, O(deleted rows)
        in the live files — change volume, not table volume), then
        LEFT-ANTI join the scan against the broadcast doomed-position
        set on (file basename, parquet ``_metadata.row_index``).  Staged
        file names are uuid-fresh, so basenames identify files uniquely
        within a table.  The anti-join is a broadcast hash join — no
        shuffle of the data side — which is exactly how engines apply
        DVs at scale (position-filter per file, table scan untouched)."""
        doomed = [
            (os.path.basename(p), int(pos))
            for p, a in dv_live.items()
            for pos in dv_positions(a["deletionVector"])
        ]
        pos_df = self.spark.createDataFrame(
            doomed, "__dv_file string, __dv_pos bigint"
        )
        src = (
            self.spark.read.schema(full_schema)
            .parquet(*[os.path.join(self.root, p) for p in sorted(dv_live)])
            .withColumn(
                "__dv_file",
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
            )
            .withColumn("__dv_pos", F.col("_metadata.row_index"))
        )
        return (
            src.join(
                F.broadcast(pos_df), ["__dv_file", "__dv_pos"], "left_anti"
            )
            .drop("__dv_file", "__dv_pos")
            .select([f.name for f in full_schema.fields])
        )

    # -- row tracking (spec writer feature: stable row ids) ------------

    _RT_DOMAIN = "delta.rowTracking"
    _RT_ROW_ID_COL = "_rt_materialized_row_id"
    _RT_ROW_CV_COL = "_rt_materialized_row_commit_version"

    @staticmethod
    def _add_num_records(add: dict) -> int:
        return int(json.loads(add["stats"])["numRecords"])

    def _row_id_hwm(self, head: int) -> int:
        """Current ``rowIdHighWaterMark`` from the rowTracking domain
        metadata (-1 when no ids were ever assigned)."""
        dm = self._state(head)["domains"].get(self._RT_DOMAIN)
        if dm is None:
            return -1
        return int(json.loads(dm["configuration"])["rowIdHighWaterMark"])

    def _rt_hwm_action(self, hwm: int) -> dict:
        return {
            "domainMetadata": {
                "domain": self._RT_DOMAIN,
                "configuration": json.dumps({"rowIdHighWaterMark": hwm}),
                "removed": False,
            }
        }

    def _rt_enabled(self, head: int) -> bool:
        cfg = (self._state(head)["metaData"] or {}).get("configuration") or {}
        return cfg.get("delta.enableRowTracking") == "true"

    def _assign_fresh_row_ids(
        self, adds: list[dict], hwm: int, commit_version: int
    ) -> int:
        """Annotate staged ``add`` actions with ``baseRowId`` (a fresh
        contiguous id span per file, spans assigned in path order) and
        ``defaultRowCommitVersion``; returns the new high-water mark.
        Fresh ids are file-position-free: row i of the file owns
        ``baseRowId + i``, so no per-row data is written — the log
        carries one integer per file at any scale."""
        for a in sorted(adds, key=lambda a: a["add"]["path"]):
            a["add"]["baseRowId"] = hwm + 1
            a["add"]["defaultRowCommitVersion"] = commit_version
            hwm += self._add_num_records(a["add"])
        return hwm

    def enable_row_tracking(self) -> int:
        """Enable the spec's ROW TRACKING writer feature: protocol rises
        to minWriterVersion 7 with ``rowTracking`` + ``domainMetadata``
        writer features (reader version is untouched — row ids are
        writer-maintained), ``delta.enableRowTracking`` is set together
        with the materialized-column names, and — the spec's enablement
        obligation — every ALREADY-LIVE file is re-committed with a
        backfilled ``baseRowId`` so existing rows get ids too.  The
        ``rowIdHighWaterMark`` rides a ``domainMetadata`` action, the
        spec's mechanism for named writer state."""
        while True:
            head = self.latest_version()
            if head < 0:
                raise ValueError(
                    "enable row tracking on an empty table: commit first"
                )
            if self._rt_enabled(head):
                return head
            st = self._state(head)
            self._guard_no_dv(st["live"], "enable row tracking")
            proto = st["protocol"] or dict(_PROTOCOL)
            wfeats = set(proto.get("writerFeatures") or [])
            mw = proto.get("minWriterVersion", 2)
            if mw < 7:
                for v, fs in self._LEGACY_WRITER_FEATURES.items():
                    if mw >= v:
                        wfeats.update(fs)
            wfeats.update({"rowTracking", "domainMetadata"})
            md = dict(st["metaData"])
            cfg = dict(md.get("configuration") or {})
            cfg["delta.enableRowTracking"] = "true"
            cfg["delta.rowTracking.materializedRowIdColumnName"] = (
                self._RT_ROW_ID_COL
            )
            cfg["delta.rowTracking.materializedRowCommitVersionColumnName"] = (
                self._RT_ROW_CV_COL
            )
            md["configuration"] = cfg
            self._schema_string = md["schemaString"]
            self._partition_columns = md.get("partitionColumns", [])
            backfill = [
                {"add": dict(st["live"][p], dataChange=False)}
                for p in sorted(st["live"])
            ]
            hwm = self._assign_fresh_row_ids(backfill, -1, head + 1)
            actions = [
                {
                    "protocol": {
                        "minReaderVersion": proto.get("minReaderVersion", 1),
                        "minWriterVersion": 7,
                        **(
                            {"readerFeatures": proto["readerFeatures"]}
                            if proto.get("readerFeatures")
                            else {}
                        ),
                        "writerFeatures": sorted(wfeats),
                    }
                },
                {"metaData": md},
                *backfill,
                self._rt_hwm_action(hwm),
            ]
            try:
                return self._publish(
                    actions, derived_from=head, operation="SET TBLPROPERTIES"
                )
            except DeltaConcurrentCommit:
                continue

    def append_tracked(self, df: DataFrame) -> int:
        """Append to a row-tracked table: stage once, then annotate the
        add actions with fresh ``baseRowId`` spans from the current
        high-water mark and advance the mark in the SAME commit.  A lost
        race re-annotates (never re-stages) against the new head — id
        spans are taken under the optimistic-commit lock, so two racing
        appends can never issue overlapping ids."""
        adds = self._stage_files(df)
        while True:
            head = self.latest_version()
            if not self._rt_enabled(head):
                raise ValueError("append_tracked on a non-row-tracked table")
            self._schema_string = self._state(head)["metaData"]["schemaString"]
            hwm = self._assign_fresh_row_ids(
                adds, self._row_id_hwm(head), head + 1
            )
            try:
                return self._publish(
                    adds + [self._rt_hwm_action(hwm)],
                    derived_from=head,
                    operation="WRITE",
                )
            except DeltaConcurrentCommit:
                continue

    def compact_tracked(self, n_files: int = 1) -> int:
        """OPTIMIZE on a row-tracked table: the rewrite MATERIALIZES each
        surviving row's id and original commit version into the hidden
        physical columns named by the table configuration, so ids are
        preserved across the rewrite (``baseRowId`` + position can no
        longer reproduce them once files merge).  The compacted adds
        still get fresh id spans — the spec's invariant that every add
        on a row-tracked table carries ``baseRowId`` — but readers
        prefer the materialized values, and ``dataChange: false`` tells
        incremental consumers nothing logically changed."""
        while True:
            head = self.latest_version()
            if not self._rt_enabled(head):
                raise ValueError("compact_tracked on a non-row-tracked table")
            st = self._state(head)
            live = sorted(st["live"])
            if not live:
                return head
            stored_schema = st["metaData"]["schemaString"]
            tracked = self.read_with_row_ids(version=head)
            physical = tracked.withColumnsRenamed(
                {
                    "row_id": self._RT_ROW_ID_COL,
                    "row_commit_version": self._RT_ROW_CV_COL,
                }
            ).coalesce(n_files)
            self._schema_string = stored_schema
            self._partition_columns = st["metaData"].get(
                "partitionColumns", []
            )
            adds = self._stage_files(physical)
            for a in adds:
                a["add"]["dataChange"] = False
            hwm = self._assign_fresh_row_ids(
                adds, self._row_id_hwm(head), head + 1
            )
            removes = [self._remove_action(p, False) for p in live]
            try:
                return self._publish(
                    adds + removes + [self._rt_hwm_action(hwm)],
                    derived_from=head,
                    operation="OPTIMIZE",
                )
            except DeltaConcurrentCommit:
                continue

    def read_with_row_ids(self, version: int | None = None) -> DataFrame:
        """Read the table with its stable row identity exposed:
        ``row_id`` / ``row_commit_version`` are the MATERIALIZED values
        when the file carries them (post-rewrite files), else computed
        as ``baseRowId + row position`` / ``defaultRowCommitVersion``
        from the file's add action — the spec's two-tier resolution.

        Execution: ONE parquet scan of all live files (the hidden
        ``_metadata.row_index`` supplies in-file positions without any
        per-row stored data), plus a BROADCAST join against the
        log-derived (file → baseRowId, commitVersion) map, which is
        log-sized (one row per file) at any table size."""
        from pyspark.sql.types import LongType, StructField, StructType

        head = self.latest_version()
        v = head if version is None else version
        st = self._state(v)
        if not self._rt_enabled(v):
            raise ValueError("read_with_row_ids on a non-row-tracked table")
        self._guard_no_dv(st["live"], "read_with_row_ids")
        md = st["metaData"]
        full_schema = StructType.fromJson(json.loads(md["schemaString"]))
        read_schema = StructType(
            list(full_schema.fields)
            + [
                StructField(self._RT_ROW_ID_COL, LongType(), True),
                StructField(self._RT_ROW_CV_COL, LongType(), True),
            ]
        )
        live = st["live"]
        info = [
            (
                os.path.basename(p),
                live[p].get("baseRowId"),
                live[p].get("defaultRowCommitVersion"),
            )
            for p in sorted(live)
        ]
        file_map = self.spark.createDataFrame(
            info, "file_name string, base_row_id long, default_cv long"
        )
        df = (
            self.spark.read.schema(read_schema)
            .parquet(*[os.path.join(self.root, p) for p in sorted(live)])
            .withColumn(
                "_file_name",
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
            )
            .withColumn("_row_index", F.col("_metadata.row_index"))
        )
        joined = df.join(F.broadcast(file_map), df["_file_name"] == file_map["file_name"])
        return joined.select(
            *[f.name for f in full_schema.fields],
            F.coalesce(
                F.col(self._RT_ROW_ID_COL),
                F.col("base_row_id") + F.col("_row_index"),
            ).alias("row_id"),
            F.coalesce(
                F.col(self._RT_ROW_CV_COL), F.col("default_cv")
            ).alias("row_commit_version"),
        )

    def read(
        self,
        version: int | None = None,
        where: dict | None = None,
        timestamp_ms: int | None = None,
    ) -> DataFrame:
        """Read at ``version`` (head when None).  ``where`` enables
        LOG-METADATA file skipping (partitionValues equality + stats
        ranges) — it prunes the file list, it does not apply the row
        filter; callers still ``.filter()`` for exact semantics, exactly
        like a real Delta reader.  Partition columns are reconstructed
        from partitionValues (Hive-partitioned data files do not store
        them), cast through the metaData schema."""
        head = self.latest_version()
        if head < 0:
            raise ValueError(f"{self.root!r} has no Delta log")
        if timestamp_ms is not None:
            if version is not None:
                raise ValueError("pass version or timestamp_ms, not both")
            version = self.version_at_timestamp(timestamp_ms)
        v = head if version is None else version
        adds, schema, partition_cols = self._replay_actions(v)
        from pyspark.sql.types import StructField, StructType

        full_schema = StructType.fromJson(json.loads(schema))
        mapping = {
            f.name: (f.metadata or {}).get("delta.columnMapping.physicalName")
            for f in full_schema.fields
        }
        mapped = all(mapping.values()) and len(mapping) > 0
        if mapped and where:
            # Stats and partitionValues are keyed by PHYSICAL names in a
            # mapped table (files written pre-enablement have physical ==
            # logical, so the translation is the identity for them).
            where = {mapping.get(k, k): v2 for k, v2 in where.items()}
        live = self._prune(adds, where)
        if not live:
            return self.spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField(f.name, f.dataType, True)
                        for f in full_schema.fields
                    ]
                ),
            )
        if mapped:
            phys_schema = StructType(
                [
                    StructField(mapping[f.name], f.dataType, True)
                    for f in full_schema.fields
                ]
            )
            return (
                self.spark.read.schema(phys_schema)
                .parquet(*[os.path.join(self.root, p) for p in live])
                .select(
                    [
                        F.col(mapping[f.name]).alias(f.name)
                        for f in full_schema.fields
                    ]
                )
            )
        dv_live = {
            p: adds[p] for p in live if adds[p].get("deletionVector")
        }
        if dv_live and mapped:
            raise NotImplementedError("deletion vectors on a mapped table")
        if not partition_cols:
            plain = [p for p in live if p not in dv_live]
            parts = []
            if plain:
                # Explicit schema projects older files through the
                # evolved table schema: columns they predate read null.
                parts.append(
                    self.spark.read.schema(full_schema).parquet(
                        *[os.path.join(self.root, p) for p in plain]
                    )
                )
            if dv_live:
                parts.append(self._read_dv_files(dv_live, full_schema))
            out = parts[0]
            for df in parts[1:]:
                out = out.unionByName(df)
            return out
        # group live files by partition tuple, rebuild the columns
        groups: dict[tuple, list[str]] = {}
        for path in live:
            key = tuple(
                adds[path]["partitionValues"][c] for c in partition_cols
            )
            groups.setdefault(key, []).append(path)
        types = {f.name: f.dataType for f in full_schema.fields}
        from pyspark.sql.types import StructType as _St

        data_schema = _St(
            [f for f in full_schema.fields if f.name not in partition_cols]
        )
        parts = []
        for key, paths in sorted(groups.items()):
            # Within a partition group, DV-carrying files take the
            # anti-join read path (data-only schema — partition columns
            # are not stored) and plain files the direct scan; both get
            # the group's partition literals rebuilt on top.
            plain = [p for p in paths if p not in dv_live]
            group_dfs = []
            if plain:
                group_dfs.append(
                    self.spark.read.schema(data_schema).parquet(
                        *[os.path.join(self.root, p) for p in plain]
                    )
                )
            dvp = {p: adds[p] for p in paths if p in dv_live}
            if dvp:
                group_dfs.append(self._read_dv_files(dvp, data_schema))
            for df in group_dfs:
                for c, val in zip(partition_cols, key):
                    df = df.withColumn(c, F.lit(val).cast(types[c]))
                parts.append(df.select([f.name for f in full_schema.fields]))
        out = parts[0]
        for df in parts[1:]:
            out = out.union(df)
        return out


@register(
    "sink_delta_table",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_delta_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a Delta-protocol table: three appends split the
    fact table by line number, an overwrite is committed and then
    time-travel-read PAST (proving tombstone replay), and the final read
    of the pre-overwrite version must aggregate to exactly the clean
    lineitem oracle — a raw recursive parquet read of the table root
    would also sweep in the overwrite's files and double-count.

    Capability mapping: the reference publishes each processed slot as
    per-band files under the output dir and trusts the directory listing
    (``sources/meteosat.py:174-185``); the log-replay read is the
    atomic, versioned form of that publish step."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li.filter(F.col("l_linenumber") <= 2))
    t.commit_append(li.filter(F.col("l_linenumber").between(3, 4)))
    v_full = t.commit_append(li.filter(F.col("l_linenumber") >= 5))
    # A later overwrite must be invisible when reading v_full.
    t.commit_overwrite(li.filter(F.col("l_linenumber") == 1).limit(1))
    return (
        t.read(version=v_full)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_compaction",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_linenumber <= 4
GROUP BY l_returnflag
""",
)
def sink_delta_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip: four fragmenting appends (each
    multi-file), an OPTIMIZE-style ``compact()``, then ``vacuum()`` of
    the now-unreferenced fragments — and the head read must STILL
    aggregate to exactly the oracle, proving compaction changed layout,
    never contents, and vacuum deleted only unreachable files.

    The pytest side additionally pins the physics: file count shrinks,
    compaction adds carry ``dataChange: false``, and vacuum leaves every
    live file on disk (tests/test_delta_log.py)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_opt_")
    t = DeltaLogTable(spark, root)
    for ln in range(1, 5):  # four appends, each repartitioned into shards
        t.commit_append(li.filter(F.col("l_linenumber") == ln).repartition(4))
    t.compact()
    t.vacuum()
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_partitioned",
    oracle="""
SELECT l_linenumber,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_returnflag = 'A'
GROUP BY l_linenumber
""",
)
def sink_delta_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned Delta table + log-metadata file skipping: two
    appends write lineitem ``partitionBy(l_returnflag)`` (partitionValues
    in every add action, partitionColumns in metaData, partition columns
    NOT stored in the data files — the spec's layout), then the read
    prunes to the ``l_returnflag = 'A'`` partition from the LOG alone
    and reconstructs the partition column through the metaData schema.
    The residual ``.filter`` keeps exact semantics, as in a real Delta
    reader; the oracle is the same filtered aggregate on raw lineitem.

    At 100 TB the predicate opens only its partition directories' files
    — zero bytes read outside them, by metadata, not by filter luck
    (tests pin that the pruned file list is exactly the partition's and
    that stats ranges skip non-overlapping files)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_part_")
    t = DeltaLogTable(spark, root)
    t.commit_append(
        li.filter(F.col("l_orderkey") % 2 == 0), partition_by=["l_returnflag"]
    )
    t.commit_append(
        li.filter(F.col("l_orderkey") % 2 == 1), partition_by=["l_returnflag"]
    )
    return (
        t.read(where={"l_returnflag": "A"})
        .filter(F.col("l_returnflag") == "A")
        .groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_merge",
    oracle="""
WITH b AS (
  SELECT CAST(floor(max(l_orderkey) / 3) AS BIGINT) AS b1 FROM lineitem
)
SELECT l_returnflag,
       count(*) AS n_rows,
       round(sum(l_quantity
                 + CASE WHEN l_linenumber = 3 AND l_orderkey <= b.b1
                        THEN 100 ELSE 0 END), 2) AS sum_qty
FROM lineitem, b
WHERE l_linenumber <= 3
   OR (l_linenumber = 4 AND l_orderkey <= b.b1)
GROUP BY l_returnflag
""",
)
def sink_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC upsert) with stats-pruned copy-on-write: the
    target lands as three appends range-split on l_orderkey (disjoint
    per-file key ranges), then one merge UPDATES line-3 rows of the low
    orderkey third (quantity +100) and INSERTS that third's line-4 rows
    — matched rows replaced, unmatched inserted, one atomic commit.

    The scale claim this query PROVES in-line: only data files whose
    stats key-range overlaps the source's key bounds are rewritten — the
    run raises unless the middle/high-third files carried over by path.
    The oracle recomputes the post-merge table from raw lineitem in SQL,
    so a lost update, double insert, or clobbered untouched row all
    hash-mismatch."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    # Bounded collect: one scalar, the orderkey tertile boundary.
    b1 = li.agg((F.floor(F.max("l_orderkey") / 3)).cast("long")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="sdis_delta_merge_")
    t = DeltaLogTable(spark, root)
    target = li.filter(F.col("l_linenumber") <= 3)
    t.commit_append(
        target.filter(F.col("l_orderkey") <= b1).repartitionByRange(
            2, "l_orderkey"
        )
    )
    t.commit_append(
        target.filter(
            (F.col("l_orderkey") > b1) & (F.col("l_orderkey") <= 2 * b1)
        ).repartitionByRange(2, "l_orderkey")
    )
    t.commit_append(
        target.filter(F.col("l_orderkey") > 2 * b1).repartitionByRange(
            2, "l_orderkey"
        )
    )
    live_before, _, _ = t._replay_actions(t.latest_version())
    source = (
        li.filter((F.col("l_orderkey") <= b1) & (F.col("l_linenumber") == 3))
        .withColumn("l_quantity", F.col("l_quantity") + 100)
        .union(
            li.filter(
                (F.col("l_orderkey") <= b1) & (F.col("l_linenumber") == 4)
            )
        )
    )
    t.commit_merge(source, keys=["l_orderkey", "l_linenumber"])
    live_after, _, _ = t._replay_actions(t.latest_version())
    carried = set(live_before) & set(live_after)
    if not carried:
        raise RuntimeError(
            "stats pruning failed: every target file was rewritten"
        )
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_checkpoint",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_delta_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet checkpoint + log cleanup round-trip: lineitem lands in
    SEVEN append commits (one per line number), an overwrite-and-restore
    pair exercises tombstones, ``checkpoint()`` snapshots the replayed
    state, ``clean_log()`` DELETES every superseded JSON commit, two
    more appends land on top — and the head read must still aggregate
    to exactly the full-lineitem oracle, proving the reader rebuilt the
    pre-cleanup state (live files, schema, tombstones) from the
    checkpoint parquet alone and replayed only the two commits after it.

    This is the open-at-scale half of the Delta story: a years-running
    ingest table accretes millions of commits; without checkpoints every
    reader replays them all (O(table lifetime)); with them, open cost is
    O(commits since last checkpoint) and old JSON is garbage.  The
    pytest side pins the physics (pointer file, cleaned log, time travel
    below the checkpoint failing loudly, txn watermarks surviving —
    tests/test_delta_log.py)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_cp_")
    t = DeltaLogTable(spark, root)
    for ln in range(1, 6):
        t.commit_append(li.filter(F.col("l_linenumber") == ln))
    # Overwrite then restore lines 1-5: the checkpoint must carry the
    # tombstones of the overwritten files, not just live adds.
    t.commit_overwrite(li.filter(F.col("l_linenumber") == 1))
    t.commit_overwrite(li.filter(F.col("l_linenumber") <= 5))
    cp_version = t.checkpoint()
    cleaned = t.clean_log()
    if len(cleaned) != cp_version + 1:
        raise RuntimeError(
            f"expected {cp_version + 1} cleaned commits, got {len(cleaned)}"
        )
    t.commit_append(li.filter(F.col("l_linenumber") == 6))
    t.commit_append(li.filter(F.col("l_linenumber") == 7))
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_stream",
    oracle="""
SELECT event_type,
       count(*)            AS n_events,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY event_type
""",
)
def sink_delta_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once STREAMING ingest into the Delta table — the spec's
    ``txn`` action in anger: a foreachBatch writer stamps every commit
    with (appId, batch epoch); after the stream drains, the LAST batch
    is re-delivered by hand (the at-least-once retry Structured
    Streaming can issue after a crash between sink write and checkpoint
    commit), and the idempotent commit path must SKIP it — the table
    then aggregates to exactly the source oracle, where a double-write
    would hash-mismatch.

    This composes the engine's streaming checkpoint semantics with the
    table format's writer watermark: two independent exactly-once
    mechanisms, which is precisely how production Delta streaming sinks
    work (checkpoint for restarts, txn for sink-side replays)."""
    from ..catalog import _prepare
    from ..streaming.state import _few_shuffle_partitions, _stage_events

    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 3, "deltastream")
    schema = spark.read.parquet(staging).schema
    root = tempfile.mkdtemp(prefix="sdis_delta_stream_")
    t = DeltaLogTable(spark, root)
    app = "sdis-events-ingest"
    seen: list[tuple[int, DataFrame]] = []

    def write_batch(df: DataFrame, batch_id: int) -> None:
        batch = df.select("event_id", "event_type", "value")
        t.commit_append(batch, txn=(app, batch_id))
        seen.append((batch_id, batch))

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .parquet(staging)
            .writeStream.foreachBatch(write_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)

    assert seen, "stream delivered no batches"
    head_before = t.latest_version()
    # Simulated post-crash re-delivery of the final batch: the txn
    # watermark must swallow it.
    last_id, last_df = seen[-1]
    write_batch(last_df, last_id)
    if t.latest_version() != head_before:
        raise RuntimeError("txn watermark failed: replayed batch committed")

    out = (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    # Bounded collect: aggregated per-type totals (handful of rows),
    # materialized so the staging/table dirs can be torn down.
    result = spark.createDataFrame(out.collect(), out.schema)
    shutil.rmtree(staging, ignore_errors=True)
    return result


@register(
    "sink_delta_cdc",
    oracle="""
WITH latest AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_epoch,
       event_id                         AS last_event_id,
       round(value, 4)                  AS last_value
FROM latest
WHERE rn = 1
""",
)
def sink_delta_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING CDC upsert: each micro-batch's per-key latest row is
    MERGEd into the Delta table (matched keys replaced, new keys
    inserted) with a ``txn`` (appId, epoch) stamp, so a replayed
    micro-batch — hand-redelivered after the drain, the at-least-once
    crash retry — is swallowed by the writer watermark.  The final table
    must hash-match the batch argmax oracle: the per-user LATEST event
    across the whole stream, which only holds if every upsert applied
    exactly once and the stats-pruned copy-on-write rewrite lost no
    racer-free rows.

    This is the canonical lakehouse CDC shape (Kafka upserts → MERGE
    INTO per trigger): at 100 TB the per-batch rewrite volume follows
    the batch's key locality via stats pruning (commit_merge), state for
    exactly-once is one txn watermark row per app in the log, and
    micro-batches arrive time-ordered here (range-staged files with
    increasing mtimes) exactly as a CDC log would deliver them."""
    t, seen = _run_cdc_upsert_stream(spark, sf_dir)
    head_before = t.latest_version()
    # Post-crash at-least-once redelivery of the final upsert batch
    # (already reduced to its per-key latest rows): the merge's txn
    # watermark must swallow it without a new commit.
    last_id, last_latest = seen[-1]
    t.commit_merge(last_latest, keys=["user_id"], txn=("sdis-cdc-upsert", last_id))
    if t.latest_version() != head_before:
        raise RuntimeError("txn watermark failed: replayed CDC batch merged")

    # Per-user final state is row-proportional in the user dimension:
    # return the table read LAZILY (the temp table root stays in place,
    # like every file-drained streaming result) — no driver round-trip.
    return t.read()


def _run_cdc_upsert_stream(
    spark: SparkSession, sf_dir: str, change_data_feed: bool = False
) -> tuple[DeltaLogTable, list[tuple[int, DataFrame]]]:
    """The shared CDC-ingest harness: stage ``events`` as a time-ordered
    file stream, MERGE each micro-batch's per-key latest rows into a
    fresh Delta table with (appId, batch_id) txn stamps; returns the
    table and the (batch_id, latest-rows) log for redelivery tests."""
    import glob as _glob

    from ..catalog import _prepare, table
    from ..streaming.state import _few_shuffle_partitions

    _prepare(spark)
    ev = table(spark, sf_dir, "events")
    staging = os.path.join(
        tempfile.gettempdir(), f"sdis_staging_cdc_{os.getpid()}"
    )
    shutil.rmtree(staging, ignore_errors=True)
    (
        ev.repartitionByRange(3, "ts")
        .sortWithinPartitions("ts", "event_id")
        .write.mode("overwrite")
        .parquet(staging)
    )
    # FileStreamSource orders files by (mtime, path): stamp strictly
    # increasing mtimes so batch k is exactly time-range k (the CDC
    # delivery order; same pattern as the stream_ts_* fixtures).
    base = int(os.path.getmtime(staging))
    for i, part in enumerate(
        sorted(_glob.glob(os.path.join(staging, "part-*.parquet")))
    ):
        os.utime(part, (base + 10 * i, base + 10 * i))
    schema = spark.read.parquet(staging).schema
    root = tempfile.mkdtemp(prefix="sdis_delta_cdc_")
    t = DeltaLogTable(spark, root, change_data_feed=change_data_feed)
    app = "sdis-cdc-upsert"
    seen: list[tuple[int, DataFrame]] = []

    def upsert_batch(df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window as W

        latest = (
            df.withColumn(
                "rn",
                F.row_number().over(
                    W.partitionBy("user_id").orderBy(
                        F.desc("ts"), F.desc("event_id")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.unix_timestamp("ts").alias("last_ts_epoch"),
                F.col("event_id").alias("last_event_id"),
                F.round("value", 4).alias("last_value"),
            )
        )
        t.commit_merge(latest, keys=["user_id"], txn=(app, batch_id))
        seen.append((batch_id, latest))

    with _few_shuffle_partitions(spark):
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(staging)
            .writeStream.foreachBatch(upsert_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(staging, "_checkpoint"))
            .start()
        )
        q.awaitTermination(120)

    assert len(seen) >= 2, "CDC stream must deliver multiple micro-batches"
    shutil.rmtree(staging, ignore_errors=True)
    return t, seen


@register(
    "pipeline_cdc_roundtrip",
    oracle="""
WITH latest AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS last_ts_epoch,
       event_id                         AS last_event_id,
       round(value, 4)                  AS last_value
FROM latest
WHERE rn = 1
""",
)
def pipeline_cdc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC in, CDC out — the full lakehouse replication loop: the
    streaming upsert harness MERGEs micro-batches into a CDF-ENABLED
    table, then a downstream replica is rebuilt from ``table_changes``
    ALONE: per key, the newest non-preimage change wins (one
    WindowGroupLimit pass over the feed), a 'delete' winner means
    absent.  The replica must (a) equal the table head exactly —
    asserted in-line by symmetric anti-joins, so a change feed that
    missed an upsert, re-emitted a carried-over rewrite row, or leaked a
    preimage fails loudly — and (b) hash-match the batch argmax oracle.

    The 100 TB shape this proves: a downstream consumer (search index,
    cache, read replica) can follow a CDC table by reading O(change
    volume) per poll and NEVER rescanning the table — correctness of
    the feed, not just its plumbing, is the pinned contract."""
    from pyspark.sql.window import Window as W

    t, _ = _run_cdc_upsert_stream(spark, sf_dir, change_data_feed=True)
    feed = t.table_changes(-1)
    w = W.partitionBy("user_id").orderBy(F.desc("_commit_version"))
    replica = (
        feed.filter(F.col("_change_type") != "update_preimage")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("_change_type") != "delete"))
        .select("user_id", "last_ts_epoch", "last_event_id", "last_value")
    )
    head = t.read()
    cols = head.columns
    drift = (
        replica.select(cols).exceptAll(head.select(cols)).count()
        + head.select(cols).exceptAll(replica.select(cols)).count()
    )
    if drift:
        raise RuntimeError(
            f"CDF replica drifted from the table head by {drift} rows"
        )
    return replica


@register(
    "sink_delta_zorder",
    oracle="""
WITH b AS (SELECT max(l_partkey) AS mpk,
                  CAST(min(l_shipdate) AS DATE) AS d0,
                  CAST(max(l_shipdate) AS DATE) AS d1
           FROM lineitem)
SELECT l_returnflag,
       count(*)                       AS n_rows,
       round(sum(l_extendedprice), 2) AS revenue
FROM lineitem, b
WHERE (l_partkey * 256) // (mpk + 1) BETWEEN 64 AND 95
  AND (date_diff('day', d0, CAST(l_shipdate AS DATE)) * 256)
        // (date_diff('day', d0, d1) + 1) BETWEEN 32 AND 63
GROUP BY l_returnflag
""",
)
def sink_delta_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER on the Delta table: three unsorted appends land
    lineitem (with its Morton key precomputed, operators/layout.py
    arithmetic), ``compact(zorder_by=["zval"])`` rewrites the table
    clustered on the curve, and the box query then prunes FILES from
    the log's add-action stats alone — the run raises unless the pruned
    file list is a strict subset of the live set, proving the clustered
    rewrite gave each file a tight (xb, yb) footprint where the
    unsorted appends' stats spanned everything.

    This composes the two halves already proven separately: the
    ext_zorder_layout curve (row-group skipping via parquet footers)
    and the Delta log's stats pruning (file skipping via add actions) —
    at 100 TB the log prunes files before any footer is opened, then
    footers prune row groups within the survivors.  The oracle is the
    identical integer arithmetic on the raw table: layout changes IO,
    never answers."""
    from ..operators.layout import _dim_bounds, _morton16

    mpk, d0, d1 = _dim_bounds(spark, sf_dir)
    xq = f"cast((l_partkey * 256) div ({mpk} + 1) as int)"
    yq = (
        f"cast((datediff(l_shipdate, date'{d0}') * 256) div "
        f"(datediff(date'{d1}', date'{d0}') + 1) as int)"
    )
    li = table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        f"{xq} as xb",
        f"{yq} as yb",
    )
    li = li.selectExpr("*", _morton16("xb", "yb", "spark") + " as zval")
    root = tempfile.mkdtemp(prefix="sdis_delta_z_")
    t = DeltaLogTable(spark, root)
    for ln in ((1, 2), (3, 4), (5, 7)):
        t.commit_append(li.filter(F.col("l_linenumber").between(*ln)))
    live0, _, _ = t._replay_actions(t.latest_version())
    total = sum(
        os.stat(os.path.join(t.root, p)).st_size for p in live0
    )
    # data-relative target: ~16 clustered files at ANY scale factor (a
    # fixed byte target left one file at small SFs — nothing to prune)
    t.compact(target_file_bytes=max(1, total // 16), zorder_by=["zval"])
    box = {"xb": (64, 95), "yb": (32, 63)}
    live, _, _ = t._replay_actions(t.latest_version())
    pruned = t._prune(live, box)
    if not len(pruned) < len(live):
        raise RuntimeError(
            f"zorder stats pruning failed: {len(pruned)}/{len(live)} files kept"
        )
    return (
        t.read(where=box)
        .filter(
            F.col("xb").between(*box["xb"]) & F.col("yb").between(*box["yb"])
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "sink_delta_delete",
    oracle="""
WITH b AS (
  SELECT CAST(floor(max(l_orderkey) / 3) AS BIGINT) AS b1 FROM lineitem
)
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem, b
WHERE l_orderkey < CAST(floor(b.b1 / 2) AS BIGINT) OR l_orderkey > b.b1
GROUP BY l_returnflag
""",
)
def sink_delta_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE with stats-pruned copy-on-write: the target
    lands as three orderkey-range-clustered appends, one delete removes
    the [b1/2, b1] key band — only files whose stats range intersects
    the band are rewritten (the run raises unless the upper thirds
    carried over by path), and the head read must equal the raw-table
    oracle minus exactly the deleted rows.  A second, disjoint-range
    delete must be a metadata no-op (no new commit)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    # Bounded collect: one scalar boundary.
    b1 = li.agg((F.floor(F.max("l_orderkey") / 3)).cast("long")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="sdis_delta_del_")
    t = DeltaLogTable(spark, root)
    for lo, hi in ((None, b1), (b1 + 1, 2 * b1), (2 * b1 + 1, None)):
        seg = li
        if lo is not None:
            seg = seg.filter(F.col("l_orderkey") >= lo)
        if hi is not None:
            seg = seg.filter(F.col("l_orderkey") <= hi)
        t.commit_append(seg.repartitionByRange(2, "l_orderkey"))
    before, _, _ = t._replay_actions(t.latest_version())
    v_del = t.commit_delete("l_orderkey", b1 // 2, b1)
    after, _, _ = t._replay_actions(v_del)
    if not set(before) & set(after):
        raise RuntimeError("stats pruning failed: every file was rewritten")
    # disjoint delete range → pure metadata no-op
    if t.commit_delete("l_orderkey", -10, -1) != v_del:
        raise RuntimeError("no-op delete committed a new version")
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_dv",
    oracle="""
WITH b AS (
  SELECT CAST(floor(max(l_orderkey) / 3) AS BIGINT) AS b1 FROM lineitem
)
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem, b
WHERE NOT (l_orderkey BETWEEN CAST(floor(b.b1 / 2) AS BIGINT) AND b.b1)
  AND NOT (l_quantity BETWEEN 1 AND 10)
GROUP BY l_returnflag
""",
)
def sink_delta_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ DELETE via spec-format deletion vectors
    (delta.io PROTOCOL.md "Deletion Vectors"; codec in dv_bitmap.py):
    the same three range-clustered appends as ``sink_delta_delete``,
    then TWO DV deletes — a key-band delete (stats-pruned to the middle
    files) and a quantity delete touching every file, so files hit by
    both carry the UNION of their bitmaps.  The run raises unless ZERO
    data files were rewritten (every surviving live path predates the
    deletes — the whole point of merge-on-read vs ``sink_delta_delete``'s
    copy-on-write), and the head read must equal the raw-table oracle
    minus exactly the doomed rows.  A disjoint-range DV delete must be
    a metadata no-op.

    Capability mapping: the reference can only drop bad slots by
    rewriting their files (`sources/meteosat.py:187-197`); a DV delete
    retracts rows from a 100 TB table with zero rewrite I/O."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    b1 = li.agg((F.floor(F.max("l_orderkey") / 3)).cast("long")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="sdis_delta_dv_")
    t = DeltaLogTable(spark, root)
    for lo, hi in ((None, b1), (b1 + 1, 2 * b1), (2 * b1 + 1, None)):
        seg = li
        if lo is not None:
            seg = seg.filter(F.col("l_orderkey") >= lo)
        if hi is not None:
            seg = seg.filter(F.col("l_orderkey") <= hi)
        t.commit_append(seg.repartitionByRange(2, "l_orderkey"))
    t.enable_deletion_vectors()
    before, _, _ = t._replay_actions(t.latest_version())
    t.delete_rows_dv("l_orderkey", b1 // 2, b1)
    v2 = t.delete_rows_dv("l_quantity", 1, 10)
    after, _, _ = t._replay_actions(v2)
    if not set(after) <= set(before):
        raise RuntimeError(
            "merge-on-read delete rewrote data files: "
            f"{sorted(set(after) - set(before))}"
        )
    if not any(a.get("deletionVector") for a in after.values()):
        raise RuntimeError("no live file carries a deletion vector")
    if t.delete_rows_dv("l_orderkey", -10, -1) != v2:
        raise RuntimeError("no-op DV delete committed a new version")
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_dv_purge",
    oracle="""
WITH b AS (
  SELECT CAST(floor(max(l_orderkey) / 3) AS BIGINT) AS b1 FROM lineitem
)
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem, b
WHERE NOT (l_orderkey BETWEEN CAST(floor(b.b1 / 2) AS BIGINT) AND b.b1)
  AND NOT (l_quantity BETWEEN 1 AND 10)
GROUP BY l_returnflag
""",
)
def sink_delta_dv_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REORG half of the merge-on-read lifecycle: build the same
    DV-deleted table as ``sink_delta_dv``, then ``purge_dvs()`` — every
    DV-carrying file is rewritten WITHOUT its soft-deleted rows and
    drops its descriptor, with ``dataChange: false`` (content-preserving
    maintenance, invisible to incremental consumers).  The run raises
    unless (a) zero live files carry a DV afterwards, (b) every action
    in the purge commit is dataChange-false, and (c) the head read
    still equals the post-delete oracle — a purge that re-adds deleted
    rows, drops survivors, or re-emits to consumers hash-mismatches.

    At 100 TB this bounds DV read amplification: DELETEs stay O(change
    volume), and a periodic threshold purge returns heavily-vectored
    files to plain scans — rewrite I/O follows the DV mass, never the
    table."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    b1 = li.agg((F.floor(F.max("l_orderkey") / 3)).cast("long")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="sdis_delta_dvpurge_")
    t = DeltaLogTable(spark, root)
    for lo, hi in ((None, b1), (b1 + 1, 2 * b1), (2 * b1 + 1, None)):
        seg = li
        if lo is not None:
            seg = seg.filter(F.col("l_orderkey") >= lo)
        if hi is not None:
            seg = seg.filter(F.col("l_orderkey") <= hi)
        t.commit_append(seg.repartitionByRange(2, "l_orderkey"))
    t.enable_deletion_vectors()
    t.delete_rows_dv("l_orderkey", b1 // 2, b1)
    t.delete_rows_dv("l_quantity", 1, 10)
    v_purge = t.purge_dvs()
    after, _, _ = t._replay_actions(v_purge)
    if any(a.get("deletionVector") for a in after.values()):
        raise RuntimeError("purge left a live deletion vector behind")
    for action in t._actions(v_purge):
        payload = action.get("add") or action.get("remove")
        if payload is not None and payload.get("dataChange", True):
            raise RuntimeError(
                "REORG PURGE must commit dataChange:false actions only"
            )
    if t.purge_dvs() != v_purge:
        raise RuntimeError("purge of a DV-free table committed a version")
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_generated",
    oracle="""
WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d FROM events)
SELECT event_type,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM events, d0
WHERE CAST(ts AS DATE) = d0.d
GROUP BY event_type
""",
)
def sink_delta_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED COLUMNS as derived partition keys: the events table
    lands partitioned by ``day``, a column the WRITER derives as
    ``CAST(ts AS DATE)`` per the expression stored in the schema's
    ``delta.generationExpression`` metadata — the first append declares
    it, the second append doesn't even pass the column and gets it
    computed from the stored expression (asserted: every add action
    carries a day partitionValue).  The read prunes to the earliest
    day's partition from log metadata alone; the oracle recomputes the
    same day filter from raw events.

    This is the spec's answer to time-partitioned ingest at scale: the
    partition key can never drift from its source column (a mismatching
    writer batch is refused), and every reader prunes on a column no
    producer ever has to remember to populate."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_gen_")
    t = DeltaLogTable(spark, root)
    t.commit_append(
        ev.filter(F.col("event_id") % 2 == 0),
        generated={"day": "CAST(ts AS DATE)"},
        partition_by=["day"],
    )
    t.commit_append(ev.filter(F.col("event_id") % 2 == 1), partition_by=["day"])
    adds, _, _ = t._replay_actions(t.latest_version())
    if not all(a["partitionValues"].get("day") for a in adds.values()):
        raise RuntimeError("every file must carry a generated day partition")
    day0 = ev.agg(F.min(F.col("ts").cast("date"))).collect()[0][0]
    return (
        t.read(where={"day": str(day0)})
        .filter(F.col("day") == F.lit(day0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "sink_delta_bloom",
    oracle="""
WITH mid AS (
  SELECT CAST(floor(max(l_orderkey) / 2) AS BIGINT) AS h FROM lineitem
),
probe AS (
  SELECT min(l_orderkey) AS k FROM lineitem, mid WHERE l_orderkey >= mid.h
)
SELECT l.l_orderkey, l.l_linenumber,
       round(l.l_quantity, 2) AS quantity
FROM lineitem l, probe
WHERE l.l_orderkey = probe.k
""",
)
def sink_delta_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file BLOOM-INDEX file skipping for point lookups — the
    pruning dimension min/max stats cannot give: lineitem lands
    hash-distributed (``repartition(8)`` on the key), so every file's
    l_orderkey range spans nearly the whole domain and stats pruning
    keeps ALL files; the per-file bloom filter (built at write time,
    stored on the add action, surviving checkpoints) prunes a point
    probe down to the files that can actually contain the key.  The
    run asserts bloom pruning strictly beats stats pruning and that
    the probed key's rows all survive (no false negatives, by
    construction).  The oracle is the plain point SELECT.

    At 100 TB this is the needle-in-haystack path: a key lookup in a
    hash-written petabyte table opens O(1) files instead of all of
    them, for ~10 bits/key of log metadata — the same trade real
    Delta's bloom index and parquet bloom filters make."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    # A MID-DOMAIN existing key (smallest orderkey >= half the max):
    # every file's [min,max] contains it, so stats pruning keeps ALL
    # files and the bloom is the only thing standing between the probe
    # and a full-table scan.  (The global max would be the one key
    # stats CAN prune perfectly.)
    half = li.agg((F.floor(F.max("l_orderkey") / 2)).cast("long")).collect()[0][0]
    probe = (
        li.filter(F.col("l_orderkey") >= half)
        .agg(F.min("l_orderkey"))
        .collect()[0][0]
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_bloom_")
    t = DeltaLogTable(spark, root)
    t.commit_append(
        li.repartition(8, "l_orderkey"), bloom_for=["l_orderkey"]
    )
    adds, _, _ = t._replay_actions(t.latest_version())
    stats_kept = t._prune(
        {p: {k: v for k, v in a.items() if k != "engineBloom"} for p, a in adds.items()},
        {"l_orderkey": probe},
    )
    bloom_kept = t._prune(adds, {"l_orderkey": probe})
    if not len(bloom_kept) < len(stats_kept):
        raise RuntimeError(
            f"bloom must out-prune stats: {len(bloom_kept)} vs {len(stats_kept)}"
        )
    return (
        t.read(where={"l_orderkey": probe})
        .filter(F.col("l_orderkey") == probe)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity", 2).alias("quantity"),
        )
    )


@register(
    "sink_delta_merge_evolve",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty,
       CAST(count(*) FILTER (WHERE l_linenumber = 1) AS BIGINT) AS n_adj,
       round(sum(CASE WHEN l_linenumber = 1 THEN 2 * l_quantity
                      ELSE 0 END), 2) AS sum_adj
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_delta_merge_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE WITH SCHEMA EVOLUTION: the target lands with four columns,
    then a CDC source arrives carrying a NEW fifth column (``adj_qty``)
    — the upsert widens the table schema in the same atomic commit that
    applies the rows.  Source rows keep their new-column values;
    carried-over and rewritten target rows read it as null (asserted:
    the count of non-null ``adj_qty`` equals the source row count).
    The oracle recomputes the merged state relationally from raw
    lineitem.

    Schema evolution is a metaData re-emission — the files written
    before the widening are never rewritten for it; readers project
    them through the latest schema.  At 100 TB an upstream producer
    adding a field costs exactly one commit's metadata, which is the
    whole point of the spec's evolution mechanism."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_mergeevo_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li)
    src = li.filter(F.col("l_linenumber") == 1).withColumn(
        "adj_qty", F.lit(2) * F.col("l_quantity")
    )
    t.commit_merge(src, keys=["l_orderkey", "l_linenumber"])
    head = t.read()
    if "adj_qty" not in head.columns:
        raise RuntimeError("merge must evolve the schema with adj_qty")
    return head.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count("adj_qty").alias("n_adj"),
        F.round(F.sum(F.coalesce("adj_qty", F.lit(0))), 2).alias("sum_adj"),
    )


@register(
    "sink_delta_clone",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE NOT (l_quantity BETWEEN 1 AND 10)
GROUP BY l_returnflag
""",
)
def sink_delta_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHALLOW CLONE as the cheap-fork primitive: lineitem lands in a
    source Delta table (two appends), ``clone_to`` forks it with ONE
    metadata-only commit (absolute-path add actions borrowing the
    source's files — the run raises if any data byte lands under the
    clone root), then the fork diverges both ways: a copy-on-write
    DELETE in the clone (rewrites land clone-local, source row count
    asserted untouched) and an append to the source (asserted invisible
    to the clone, which is pinned to its clone-point version).  The
    returned aggregate reads the diverged CLONE; the oracle applies the
    delete predicate to raw lineitem.

    The reference rewrites full output folders per slot
    (``utils/fs.py:21-48``); a fork there means copying the tree.  At
    100 TB this clone is one log commit over a petabyte table, and only
    the fork's divergence is ever materialized."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    src_root = tempfile.mkdtemp(prefix="sdis_delta_clonesrc_")
    src = DeltaLogTable(spark, src_root)
    src.commit_append(li.filter(F.col("l_orderkey") % 2 == 0))
    src.commit_append(li.filter(F.col("l_orderkey") % 2 == 1))
    n_src = src.read().count()
    clone_root = tempfile.mkdtemp(prefix="sdis_delta_clonedst_")
    clone = src.clone_to(clone_root)
    copied = [
        p
        for p in glob.glob(
            os.path.join(clone_root, "**", "*.parquet"), recursive=True
        )
        if os.sep + "_delta_log" + os.sep not in p
    ]
    if copied:
        raise RuntimeError(f"shallow clone copied data files: {copied[:3]}")
    clone.commit_delete("l_quantity", 1, 10)
    if src.read().count() != n_src:
        raise RuntimeError("clone-side delete leaked into the source")
    live_before, _ = clone._replay(clone.latest_version())
    src.commit_append(li.limit(5))
    live_after, _ = clone._replay(clone.latest_version())
    if live_after != live_before:
        raise RuntimeError("source append became visible in the clone")
    return (
        clone.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_restore",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_quantity <= 25
GROUP BY l_returnflag
""",
)
def sink_delta_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TABLE ... TO VERSION AS OF, exercised as the undo button
    for a bad overwrite: v0 = full lineitem, v1 = overwrite down to
    ``l_quantity <= 25``, v2 = a second (wrong) overwrite to
    ``l_quantity > 40`` — then ``restore(v1)`` re-materializes v1's
    contents as a NEW commit (asserted == v2+1, history preserved: the
    bad v2 remains time-travelable).  The returned aggregate reads the
    restored head; the oracle applies v1's predicate to raw lineitem.

    Restore is log-sized work — adds for target-live files, tombstones
    for current-only ones, zero data I/O — so at 100 TB undoing a bad
    batch is O(file count), not O(bytes)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_restore_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li)
    v1 = t.commit_overwrite(li.filter(F.col("l_quantity") <= 25))
    v2 = t.commit_overwrite(li.filter(F.col("l_quantity") > 40))
    v3 = t.restore(v1)
    if v3 != v2 + 1:
        raise RuntimeError(
            f"restore must commit a NEW version: got {v3}, head was {v2}"
        )
    n_bad = li.filter(F.col("l_quantity") > 40).count()
    if t.read(version=v2).count() != n_bad:
        raise RuntimeError("restore destroyed the pre-restore history")
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_vacuum",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_returnflag <> 'R'
GROUP BY l_returnflag
""",
)
def sink_delta_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM as the storage-reclaim step: an overwrite strands v0's
    files as tombstones, ``vacuum()`` (collapsed retention window)
    deletes exactly the unreachable ones — asserted non-empty, asserted
    idempotent (second vacuum returns []), and asserted to cut the
    time-travel horizon (``restore(0)`` now fails loudly instead of
    resurrecting dangling references).  The returned aggregate proves
    the HEAD is untouched; the oracle applies the overwrite's predicate
    to raw lineitem.

    Reachability is decided from the LOG (live set + young tombstones +
    referenced CDC), then enforced by a root walk — at 100 TB both
    sides are file-count-sized, and no data file is ever opened."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_vacuum_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li.repartition(4))
    t.commit_overwrite(li.filter(F.col("l_returnflag") != "R").repartition(4))
    deleted = t.vacuum()
    if not deleted:
        raise RuntimeError("vacuum must reclaim the overwritten v0 files")
    if t.vacuum():
        raise RuntimeError("second vacuum must be a no-op")
    try:
        t.restore(0)
    except ValueError:
        pass
    else:
        raise RuntimeError("restore to a vacuumed version must fail loudly")
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_fsck",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_linenumber <> 7
GROUP BY l_returnflag
""",
)
def sink_delta_fsck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FSCK REPAIR TABLE after storage loss: lineitem lands Hive-
    partitioned by ``l_linenumber``, the ``l_linenumber=7`` partition's
    data files are deleted OUT FROM UNDER the log (simulated storage
    failure), and ``fsck`` first lists exactly those dead references
    (dry run asserted), then tombstones them so reads work again (and a
    second fsck is asserted clean).  The returned aggregate reads the
    repaired table; the oracle drops the lost partition from raw
    lineitem.

    fsck stats each live path's existence — driver-side, log-sized,
    zero data reads — so at 100 TB repair cost follows file COUNT, and
    the repair commit is atomic like any other."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_fsck_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li, partition_by=["l_linenumber"])
    live, _, _ = t._replay_actions(t.latest_version())
    lost = sorted(
        p
        for p, a in live.items()
        if a["partitionValues"]["l_linenumber"] == "7"
    )
    if not lost:
        raise RuntimeError("expected files in the l_linenumber=7 partition")
    for p in lost:
        os.unlink(os.path.join(root, p))
    if t.fsck(dry_run=True) != lost:
        raise RuntimeError("fsck dry run must list exactly the lost files")
    if t.fsck() != lost:
        raise RuntimeError("fsck repair must tombstone exactly the lost files")
    if t.fsck():
        raise RuntimeError("repaired table must fsck clean")
    return (
        t.read()
        .filter(F.col("l_linenumber") != 7)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def _changes_since(
    t: DeltaLogTable, from_version: int, to_version: int
) -> DataFrame:
    """Rows ADDED in commits (from_version, to_version] — the Delta
    streaming-source contract: each incremental read consumes only the
    new files (O(new data), never a table rescan).  Non-append changes
    (remove actions with dataChange=true — overwrite/delete/merge)
    raise, exactly as the real source does without ignoreChanges:
    rewritten files would re-emit rows the consumer already saw."""
    from pyspark.sql.types import StructType

    _, schema_s, _ = t._replay_actions(to_version)
    new_files: list[str] = []
    for v in range(from_version + 1, to_version + 1):
        for action in t._actions(v):
            if "remove" in action and action["remove"].get("dataChange", True):
                raise ValueError(
                    f"commit {v} is not append-only (data-changing remove); "
                    "incremental consumers must restart or opt into "
                    "re-emitted rows"
                )
            if "add" in action and action["add"].get("dataChange", True):
                new_files.append(action["add"]["path"])
    full_schema = StructType.fromJson(json.loads(schema_s))
    if not new_files:
        return t.spark.createDataFrame([], full_schema)
    return t.spark.read.schema(full_schema).parquet(
        *[os.path.join(t.root, p) for p in sorted(new_files)]
    )


@register(
    "source_delta_incremental",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_linenumber <= 6
GROUP BY l_returnflag
""",
)
def source_delta_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta table as an INCREMENTAL SOURCE: a consumer checkpoints
    the last version it processed and each poll reads only the commits
    after it — three polls over six appends here, whose union must
    aggregate to exactly the full table (a skipped or re-read file
    hash-mismatches).  A compaction commit between polls must be
    INVISIBLE to the consumer (dataChange: false — the spec's signal),
    and a data-changing rewrite must raise rather than silently re-emit
    consumed rows (pinned in-line)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_src_")
    t = DeltaLogTable(spark, root)
    batches = []
    cursor = t.latest_version()  # -1: consume from table creation
    for group in ((1, 2), (3, 4), (5, 6)):
        for ln in group:
            t.commit_append(li.filter(F.col("l_linenumber") == ln))
        if group == (3, 4):
            # Maintenance between polls: dataChange=false commits are
            # skipped by incremental consumers per spec.
            t.compact(target_file_bytes=64 * 1024 * 1024)
        head = t.latest_version()
        batches.append(_changes_since(t, cursor, head))
        cursor = head
    # A data-changing rewrite breaks append-only consumption: must raise.
    t.commit_delete("l_linenumber", 6, 6)
    try:
        _changes_since(t, cursor, t.latest_version())
    except ValueError:
        pass
    else:
        raise RuntimeError("non-append change did not raise")
    out = batches[0]
    for b in batches[1:]:
        out = out.union(b)
    return out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "source_delta_cdf",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_quantity
  FROM lineitem WHERE l_linenumber <= 2
),
upd AS (
  SELECT l_orderkey, l_quantity FROM li
  WHERE l_linenumber = 1 AND l_orderkey % 7 = 0
),
state1 AS (
  SELECT l_orderkey,
         CASE WHEN l_linenumber = 1 AND l_orderkey % 7 = 0
              THEN l_quantity + 1000 ELSE l_quantity END AS l_quantity
  FROM li
),
changes AS (
  SELECT 'insert' AS change_type, CAST(0 AS BIGINT) AS commit_version,
         l_quantity
  FROM li WHERE l_linenumber = 1
  UNION ALL
  SELECT 'update_preimage', 1, l_quantity FROM upd
  UNION ALL
  SELECT 'update_postimage', 1, l_quantity + 1000 FROM upd
  UNION ALL
  SELECT 'insert', 1, l_quantity FROM li WHERE l_linenumber = 2
  UNION ALL
  SELECT 'delete', 2, l_quantity FROM state1
  WHERE l_orderkey BETWEEN 100 AND 2000
)
SELECT change_type, commit_version,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM changes
GROUP BY change_type, commit_version
""",
)
def source_delta_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED end-to-end: a CDF-enabled table takes an append
    (v0), a MERGE that both updates and inserts (v1), and a row-band
    DELETE (v2); ``table_changes(-1)`` must reconstruct the exact
    row-level history — appends as inserts via the add-action fallback,
    the merge as update_preimage / update_postimage / insert rows from
    its ``cdc`` files (carried-over rewrite rows must NOT appear), the
    delete as exactly the doomed rows.  The change census per
    (change_type, commit_version) hash-matches an oracle that recomputes
    every change set relationally from the raw table.

    The 100 TB shape: downstream consumers (index refresh, aggregate
    maintenance, replication) read O(change volume) per poll instead of
    diffing two table snapshots — the same contract as delta-spark's
    ``table_changes``, produced from the same on-disk actions."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") <= 2)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_cdf_")
    t = DeltaLogTable(spark, root, change_data_feed=True)
    t.commit_append(li.filter(F.col("l_linenumber") == 1))
    upd = li.filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 7 == 0)
    ).withColumn("l_quantity", F.col("l_quantity") + 1000)
    ins = li.filter(F.col("l_linenumber") == 2)
    t.commit_merge(
        upd.unionByName(ins), keys=["l_orderkey", "l_linenumber"]
    )
    t.commit_delete("l_orderkey", 100, 2000)
    return t.table_changes(-1).groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "sink_delta_constraints",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_linenumber <= 2
GROUP BY l_returnflag
""",
)
def sink_delta_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-enforced table invariants, the ingest-quality gate: ADD
    CONSTRAINT stores a CHECK expression as the spec's
    ``delta.constraints.<name>`` property (upgrading the protocol to
    minWriterVersion 3 in the same commit), and every later data-adding
    commit validates its rows in ONE map-only pass over the batch —
    a violating batch fails the whole transaction BEFORE any file is
    staged, leaving the log untouched.  ``delta.appendOnly=true`` then
    forbids every data-changing remove (DELETE here must raise; OPTIMIZE
    stays legal).  Both rejections are asserted in-line; the surviving
    table must hash-match the clean-append oracle — a leaked bad row or
    a lost good batch shows up as a mismatch.

    The 100 TB shape: constraint checks cost O(batch), never O(table),
    and appendOnly turns the immutable-audit-log contract into a
    writer-enforced property instead of a convention."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") <= 2)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_chk_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li.filter(F.col("l_linenumber") == 1))
    t.add_constraint("qty_positive", "l_quantity > 0 AND l_quantity <= 60")
    t.commit_append(li.filter(F.col("l_linenumber") == 2))  # all valid
    v_ok = t.latest_version()
    bad = li.filter(F.col("l_linenumber") == 2).withColumn(
        "l_quantity", -F.col("l_quantity")
    )
    try:
        t.commit_append(bad)
    except DeltaConstraintViolation:
        pass
    else:
        raise RuntimeError("constraint violation did not raise")
    if t.latest_version() != v_ok:
        raise RuntimeError("rejected batch must leave the log untouched")
    t.set_property("delta.appendOnly", "true")
    try:
        t.commit_delete("l_orderkey", 1, 10)
    except ValueError:
        pass
    else:
        raise RuntimeError("appendOnly DELETE did not raise")
    t.compact()  # layout-only maintenance stays legal under appendOnly
    return t.read().groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "sink_delta_ict",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT)  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_linenumber = 1
GROUP BY l_returnflag
""",
)
def sink_delta_ict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-COMMIT TIMESTAMPS end-to-end: the table upgrades to the
    table-features protocol (writer 7 + writerFeatures) and every later
    commit carries a strictly monotonic ``inCommitTimestamp`` in its
    commitInfo; the log files' mtimes are then deliberately SCRAMBLED
    (the file-copy/backup/restore hazard that breaks mtime-based
    timestampAsOf) and time travel by the enablement commit's ICT must
    still land exactly there — asserted in-line by row count.  The head
    read hash-matches the full-slice oracle.  The 100 TB shape: commit
    time lives IN the log, so replication and restores cannot corrupt
    time travel."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select("l_orderkey", "l_returnflag", "l_quantity")
    )
    part_a = li.filter(F.col("l_orderkey") % 2 == 0)
    root = tempfile.mkdtemp(prefix="sdis_delta_ict_")
    t = DeltaLogTable(spark, root)
    t.commit_append(part_a)
    v_on = t.enable_in_commit_timestamps()
    t.commit_append(li.filter(F.col("l_orderkey") % 2 == 1))
    head = t.latest_version()
    for v in range(head + 1):
        os.utime(t._version_path(v), (1, 1))  # scramble every mtime
    n_a = part_a.count()
    at_enable = t.read(timestamp_ms=t._commit_timestamp(v_on))
    if at_enable.count() != n_a:
        raise RuntimeError(
            "ICT time travel drifted: expected the pre-enablement rows"
        )
    return t.read().groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "pipeline_corpus_ingest",
    oracle="""
WITH d AS (
  SELECT doc_id, md5(coalesce(text, '')) AS h, doc_id % 3 AS b
  FROM documents
),
first_b AS (SELECT h, min(b) AS fb FROM d GROUP BY h)
SELECT d.h, min(d.doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_batch_copies
FROM d JOIN first_b ON d.h = first_b.h AND d.b = first_b.fb
GROUP BY d.h
""",
)
def pipeline_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROWING TRAINING CORPUS loop — what a 100 TB dedup shop runs
    every tick, end-to-end: three document batches arrive in order; each
    batch (a) dedupes WITHIN itself (keep min doc_id per content hash),
    (b) anti-joins against the STANDING corpus' hashes read from the
    Delta table (never re-deduping the corpus — the shuffle carries
    16-byte keys and only batch rows), and (c) lands in one atomic
    (appId, epoch)-stamped commit, so the hand-replayed final batch (the
    at-least-once crash retry) is swallowed.

    The final table must hash-match an oracle computing first-batch-wins
    keep semantics relationally: a doc admitted twice (broken anti-join
    or double-applied replay), a lost batch, or wrong within-batch
    keep-first each mismatches.  Scale: standing-corpus hashes live IN
    the table (read O(live files)); per-tick work follows the batch."""
    docs = table(spark, sf_dir, "documents")
    h = F.md5(F.coalesce(F.col("text"), F.lit("")))
    root = tempfile.mkdtemp(prefix="sdis_corpus_")
    t = DeltaLogTable(spark, root)
    app = "sdis-corpus-ingest"
    last = None
    for i in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == i).select(
            "doc_id", h.alias("h")
        )
        # within-batch keep-first + per-hash copy count
        batch = batch.groupBy("h").agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_batch_copies"),
        )
        if t.latest_version() >= 0:
            standing = t.read().select("h")
            batch = batch.join(standing, "h", "left_anti")
        t.commit_append(
            batch.select("h", "keep_id", "n_batch_copies"), txn=(app, i)
        )
        last = batch
    head = t.latest_version()
    t.commit_append(
        last.select("h", "keep_id", "n_batch_copies"), txn=(app, 2)
    )  # crash replay of the final batch: watermark must swallow it
    if t.latest_version() != head:
        raise RuntimeError("replayed corpus batch double-applied")
    return t.read()


@register(
    "sink_delta_column_mapping",
    oracle="""
SELECT l_returnflag                  AS flag,
       CAST(count(*) AS BIGINT)      AS n_rows,
       round(sum(l_quantity), 2)     AS sum_qty
FROM lineitem
WHERE l_linenumber <= 2
GROUP BY l_returnflag
""",
)
def sink_delta_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLUMN MAPPING (spec: reader 2 / writer 5): enabling
    ``delta.columnMapping.mode = name`` stamps every field with a stable
    id and a physicalName, after which RENAME COLUMN and DROP COLUMN are
    METADATA-ONLY commits — asserted in-line by comparing the live file
    list across enable + rename + drop (zero data files touched; at
    100 TB that is the difference between an instant DDL and a
    table-sized rewrite).  Appends after the rename use the new LOGICAL
    name and land under the unchanged physical name, so files written
    before enablement and after the rename read back through one
    schema; the dropped column's bytes stay in old files but never load
    again.  The final aggregate over the renamed column must hash-match
    the oracle computed under the original name."""
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") <= 2)
        .select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_tax"
        )
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_cm_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li.filter(F.col("l_linenumber") == 1))
    files_before, _ = t._replay(t.latest_version())
    t.enable_column_mapping()
    t.rename_column("l_returnflag", "flag")
    t.drop_column("l_tax")
    files_after, _ = t._replay(t.latest_version())
    if files_after != files_before:
        raise RuntimeError(
            "enable/rename/drop must be metaData-only: file list changed"
        )
    t.commit_append(
        li.filter(F.col("l_linenumber") == 2).select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_returnflag").alias("flag"),
            "l_quantity",
        )
    )
    return t.read().groupBy("flag").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "pipeline_lakehouse",
    oracle="""
SELECT event_type,
       count(*)             AS n_events,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY event_type
""",
)
def pipeline_lakehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE table-format story as one loop — the reference's
    ingest-publish-consume cycle (``main.py`` poll loop +
    ``sources/meteosat.py`` publish + downstream readers) on the Delta
    log:

    1. INGEST: three event micro-batches land with (appId, epoch) txn
       stamps — exactly-once under redelivery;
    2. CONSUME incrementally: after every batch a version-checkpointed
       consumer reads only the new files (`_changes_since`),
       accumulating its own copy;
    3. MAINTAIN mid-stream: between polls the table is compacted
       (dataChange: false — invisible to the consumer), checkpointed,
       and its superseded JSON commits CLEANED;
    4. VERIFY: the final batch is re-delivered by hand (swallowed by
       the txn watermark), and BOTH the table head read (through the
       checkpoint) and the consumer's accumulated union must aggregate
       to exactly the source oracle — a dropped batch, double write,
       re-emitted compaction file, or checkpoint replay bug each
       hash-mismatches."""
    from ..catalog import _prepare
    from ..streaming.state import _stage_events

    _prepare(spark)
    staging = _stage_events(spark, sf_dir, 3, "lakehouse")
    files = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    root = tempfile.mkdtemp(prefix="sdis_lakehouse_")
    t = DeltaLogTable(spark, root)
    app = "sdis-lakehouse"
    # The consumer's landing zone lives OUTSIDE the table root: vacuum's
    # recursive parquet walk treats any non-live parquet under root as an
    # orphan, so staging consumed data inside would hand a future
    # maintenance loop the consumer's copy to delete.
    consumed_root = tempfile.mkdtemp(prefix="sdis_lakehouse_consumed_")
    cursor = t.latest_version()
    last_batch = None
    for epoch, path in enumerate(files):
        batch = spark.read.parquet(path).select(
            "event_id", "event_type", "value"
        )
        t.commit_append(batch, txn=(app, epoch))
        last_batch, last_epoch = batch, epoch
        head = t.latest_version()
        inc = _changes_since(t, cursor, head)
        # Materialize NOW: maintenance below rewrites files and cleans
        # the log; a lazy plan would read compacted paths and double rows.
        # The materialization is an EXECUTOR-SIDE staging write (one
        # parquet dir per epoch — the consumer's own landing zone), never
        # a driver collect: at 100 TB each increment flows executors →
        # store directly and the driver only sequences versions.
        inc.write.mode("overwrite").parquet(
            os.path.join(consumed_root, f"e{epoch}")
        )
        cursor = head
        if epoch == 1:
            t.compact()
            cursor = t.latest_version()  # dataChange:false — skip, don't re-read
            t.checkpoint()
            t.clean_log()
    # Post-crash redelivery of the final epoch: swallowed by the txn
    # watermark, which itself survived checkpoint + log cleanup.
    head_before = t.latest_version()
    t.commit_append(last_batch, txn=(app, last_epoch))
    if t.latest_version() != head_before:
        raise RuntimeError("txn watermark failed after checkpoint cleanup")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )

    # Both views must agree with the source: the head read (state
    # rebuilt through the checkpoint) and the consumer's accumulated
    # staging zone (read back distributed — one multi-dir parquet scan).
    # Only the POST-AGGREGATION frames (one row per event_type) ever
    # reach the driver.
    head_rows = sorted(map(tuple, agg(t.read()).collect()))
    union = spark.read.parquet(os.path.join(consumed_root, "e*"))
    out = agg(union)
    rows = out.collect()
    if sorted(map(tuple, rows)) != head_rows:
        raise RuntimeError("incremental consumer diverged from table head")
    result = spark.createDataFrame(rows, out.schema)
    shutil.rmtree(staging, ignore_errors=True)
    return result


@register(
    "pipeline_delta_replicate",
    oracle="""
WITH base AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 10.0
              ELSE c_acctbal END AS bal
  FROM customer WHERE c_custkey % 2 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_acctbal AS bal
  FROM customer WHERE c_custkey % 2 = 1
),
fin AS (SELECT * FROM base WHERE c_custkey NOT BETWEEN 10 AND 200)
SELECT c_mktsegment,
       count(*)           AS n_customers,
       round(sum(bal), 2) AS sum_bal
FROM fin GROUP BY c_mktsegment
""",
)
def pipeline_delta_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-region replication as incremental LOG SHIPPING: a source
    table takes an append, a MERGE (update + insert), and a range
    DELETE; after EVERY commit the replica syncs via
    :meth:`DeltaLogTable.replicate_to` with a version high-water mark
    (each sync ships only the new commits' files).  The replica is then
    opened as an INDEPENDENT table — no shared state with the source —
    and its head read must aggregate to the relational recompute of the
    source's final state.  A dropped data file, missed commit, or
    wrong-order publish (JSON before data) breaks the replica read or
    hash-mismatches.

    The 100 TB shape: replication cost follows commit volume, never
    table size, and the replica stays a spec-valid Delta table any
    reader can open mid-sync at its own consistent version."""
    src = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    root = tempfile.mkdtemp(prefix="sdis_repl_src_")
    replica_root = tempfile.mkdtemp(prefix="sdis_repl_dst_")
    t = DeltaLogTable(spark, root)
    watermark = -1

    t.commit_append(src.filter(F.col("c_custkey") % 2 == 0))
    watermark = t.replicate_to(replica_root, watermark)
    upd = (
        t.read()
        .filter(F.col("c_custkey") % 3 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 10.0)
    )
    ins = src.filter(F.col("c_custkey") % 2 == 1)
    t.commit_merge(upd.unionByName(ins), keys=["c_custkey"])
    watermark = t.replicate_to(replica_root, watermark)
    t.commit_delete("c_custkey", 10, 200)
    watermark = t.replicate_to(replica_root, watermark)

    replica = DeltaLogTable(spark, replica_root)
    if replica.latest_version() != watermark:
        raise RuntimeError("replica head diverged from shipped watermark")
    return (
        replica.read()
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


def _scd2_apply(
    t: "DeltaLogTable", changes: DataFrame, epoch: int
) -> None:
    """One SCD Type-2 epoch: for every changed key, CLOSE the current
    row (valid_to = epoch) and INSERT the new version (valid_from =
    epoch, open-ended) — both in ONE atomic MERGE keyed on
    (c_custkey, valid_from), since closing rewrites an existing
    composite key and the new version mints a fresh one.  History rows
    (valid_to already set) are never touched, so rewrite volume follows
    the change set, not the accumulated history."""
    cur = t.read().filter(F.col("valid_to").isNull())
    joined = cur.alias("c").join(changes.alias("n"), "c_custkey")
    closed = joined.select(
        "c_custkey",
        F.col("c.c_mktsegment").alias("c_mktsegment"),
        F.col("c.c_acctbal").alias("c_acctbal"),
        F.col("c.valid_from").alias("valid_from"),
        F.lit(epoch).alias("valid_to"),
    )
    fresh = joined.select(
        "c_custkey",
        F.col("n.c_mktsegment").alias("c_mktsegment"),
        F.col("n.c_acctbal").alias("c_acctbal"),
        F.lit(epoch).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    t.commit_merge(
        closed.unionByName(fresh), keys=["c_custkey", "valid_from"]
    )


def _build_scd2(spark: SparkSession, sf_dir: str) -> "DeltaLogTable":
    """The shared SCD2 fixture: customer dim loaded at epoch 0, segment
    migration of every 4th key at epoch 1 (+5 balance), repricing of
    every 6th at epoch 2 (+7 on the then-current balance, so keys hit
    by both epochs compound)."""
    src = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    root = tempfile.mkdtemp(prefix="sdis_scd2_")
    t = DeltaLogTable(spark, root)
    t.commit_append(
        src.withColumn("valid_from", F.lit(0)).withColumn(
            "valid_to", F.lit(None).cast("int")
        )
    )
    ch1 = (
        src.filter(F.col("c_custkey") % 4 == 0)
        .withColumn("c_mktsegment", F.lit("SCD-E1"))
        .withColumn("c_acctbal", F.col("c_acctbal") + 5.0)
    )
    _scd2_apply(t, ch1, epoch=1)
    cur = t.read().filter(F.col("valid_to").isNull())
    ch2 = cur.filter(F.col("c_custkey") % 6 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + 7.0).alias("c_acctbal"),
    )
    _scd2_apply(t, ch2, epoch=2)
    return t


@register(
    "sink_delta_scd2",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       round(c_acctbal, 2) AS acctbal,
       0 AS valid_from,
       CASE WHEN c_custkey % 4 = 0 THEN 1
            WHEN c_custkey % 6 = 0 THEN 2 END AS valid_to
FROM customer
UNION ALL
SELECT c_custkey, 'SCD-E1', round(c_acctbal + 5.0, 2), 1,
       CASE WHEN c_custkey % 12 = 0 THEN 2 END
FROM customer WHERE c_custkey % 4 = 0
UNION ALL
SELECT c_custkey,
       CASE WHEN c_custkey % 4 = 0 THEN 'SCD-E1' ELSE c_mktsegment END,
       round(c_acctbal + CASE WHEN c_custkey % 4 = 0 THEN 12.0 ELSE 7.0 END, 2),
       2, NULL
FROM customer WHERE c_custkey % 6 = 0
""",
)
def sink_delta_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLOWLY CHANGING DIMENSION Type 2 on the Delta table: the full
    version history of every dimension row is kept as
    (valid_from, valid_to] epochs, each change epoch applied as one
    atomic close-and-insert MERGE (see :func:`_scd2_apply`).  Epoch 1
    re-segments every 4th customer (+5 balance); epoch 2 reprices every
    6th — keys divisible by both accumulate THREE versions, which is
    exactly the overlap the oracle pins (a wrong close order or a
    replaced-instead-of-closed row shifts the valid_to lattice and
    hash-mismatches).  Effective times are integer epochs, not
    wall-clock, so the full history is deterministic.

    The fact-join contract this maintains at 100 TB: facts join the
    dimension AS OF their event epoch
    (``valid_from <= e < coalesce(valid_to, inf)``) — `join_range`'s
    interval pattern — while current-state readers filter
    ``valid_to IS NULL``, a stats-prunable predicate."""
    t = _build_scd2(spark, sf_dir)
    return t.read().select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("acctbal"),
        "valid_from",
        "valid_to",
    )


@register(
    "source_delta_diff",
    oracle="""
SELECT 'added' AS change, l_returnflag,
       count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_linenumber = 2 AND NOT (l_orderkey BETWEEN 500 AND 5000)
GROUP BY l_returnflag
UNION ALL
SELECT 'removed', l_returnflag, count(*), round(sum(l_quantity), 2)
FROM lineitem
WHERE l_linenumber = 1 AND l_orderkey BETWEEN 500 AND 5000
GROUP BY l_returnflag
""",
)
def source_delta_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT DIFF between two table versions WITHOUT a change feed:
    ``read(vA) EXCEPT ALL read(vB)`` both ways classifies every row as
    added or removed — the table-diff primitive for tables that never
    enabled CDF (audit "what changed since the snapshot I validated?").

    Here: v0 loads line-1 rows, v1 appends line-2 rows, v2 deletes the
    [500, 5000] orderkey band; the v0→head diff must show exactly the
    surviving line-2 rows as added and the deleted line-1 band as
    removed.  EXCEPT ALL is bag semantics — duplicate rows diff by
    multiplicity, which a DISTINCT-based diff would silently collapse.

    Scale shape: one co-partitioned anti-semantics shuffle over the two
    snapshots (Spark plans ExceptAll as a single hash-partitioned
    count-diff), reading both versions' file lists from log metadata;
    there is no driver-side state.  CDF remains the O(changes) path
    when enabled (`source_delta_cdf`); this is the O(snapshots)
    fallback that needs nothing but the log."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_diff_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li.filter(F.col("l_linenumber") == 1))
    t.commit_append(li.filter(F.col("l_linenumber") == 2))
    t.commit_delete("l_orderkey", 500, 5000)
    va, vb = t.read(version=0), t.read()
    added = vb.exceptAll(va).withColumn("change", F.lit("added"))
    removed = va.exceptAll(vb).withColumn("change", F.lit("removed"))
    return (
        added.unionByName(removed)
        .groupBy("change", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_row_tracking",
    oracle="""
WITH a AS (
  SELECT o_orderkey,
         CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id
  FROM orders WHERE o_orderkey % 3 = 0
), b AS (
  SELECT o_orderkey,
         CAST((SELECT count(*) FROM a)
              + row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id
  FROM orders WHERE o_orderkey % 3 = 1
)
SELECT o_orderkey, row_id, CAST(1 AS BIGINT) AS row_commit_version FROM a
UNION ALL
SELECT o_orderkey, row_id, CAST(2 AS BIGINT) AS row_commit_version FROM b
""",
)
def sink_delta_row_tracking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROW TRACKING lifecycle: append → enable (protocol upgrade +
    baseRowId BACKFILL of the live file) → tracked append (fresh id
    span under the commit lock) → OPTIMIZE (ids MATERIALIZED into
    hidden physical columns, ``dataChange: false``) → read the stable
    identity back.  Row ids and original commit versions must survive
    the rewrite byte-for-byte — that is the feature's contract, and the
    oracle can therefore recompute them relationally: first batch's ids
    are its sorted positions (backfilled at version 1), second batch
    continues from the high-water mark (committed at version 2).

    Each batch is written as ONE sorted file so the id assignment is
    deterministic for the oracle; production appends write N files per
    commit and the log simply carries one (baseRowId, numRecords) span
    per file — id issuance is O(files), never O(rows), and the
    ``_metadata.row_index`` read path stores no per-row data until a
    rewrite materializes ids for the files it merges."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    batch_a = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    batch_b = (
        orders.filter(F.col("o_orderkey") % 3 == 1)
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    root = tempfile.mkdtemp(prefix="sdis_rowtrack_")
    t = DeltaLogTable(spark, root)
    t.commit_append(batch_a)          # v0: pre-tracking data
    t.enable_row_tracking()           # v1: upgrade + backfill ids
    t.append_tracked(batch_b)         # v2: fresh span from the hwm
    t.compact_tracked()               # v3: rewrite, ids materialized
    return t.read_with_row_ids().select(
        "o_orderkey", "row_id", "row_commit_version"
    )


def _build_liquid(
    spark: SparkSession, sf_dir: str, target_file_bytes: int
) -> "DeltaLogTable":
    """Shared builder for the liquid-clustered table: three arrival-order
    append batches (no spatial locality), then ONE clustering rewrite on
    the Hilbert key.  Returns the compacted table."""
    from ..operators.layout import _dim_bounds, hilbert_key

    mpk, d0, d1 = _dim_bounds(spark, sf_dir)
    xq = f"cast((l_partkey * 256) div ({mpk} + 1) as int)"
    yq = (
        f"cast((datediff(l_shipdate, date'{d0}') * 256) div "
        f"(datediff(date'{d1}', date'{d0}') + 1) as int)"
    )
    li = table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "l_returnflag",
        "l_extendedprice",
        f"{xq} as xb",
        f"{yq} as yb",
    )
    li = hilbert_key(li, "xb", "yb")
    root = tempfile.mkdtemp(prefix="sdis_liquid_")
    t = DeltaLogTable(spark, root)
    for i in range(3):
        t.commit_append(li.filter(F.col("l_orderkey") % 3 == i).repartition(4))
    t.compact(target_file_bytes=target_file_bytes, zorder_by=["hval"])
    return t


@register(
    "sink_delta_liquid",
    oracle="""
WITH b AS (SELECT max(l_partkey) AS mpk,
                  CAST(min(l_shipdate) AS DATE) AS d0,
                  CAST(max(l_shipdate) AS DATE) AS d1
           FROM lineitem)
SELECT l_returnflag,
       count(*)                       AS n_rows,
       round(sum(l_extendedprice), 2) AS revenue
FROM lineitem, b
WHERE (l_partkey * 256) // (mpk + 1) BETWEEN 64 AND 95
  AND (date_diff('day', d0, CAST(l_shipdate AS DATE)) * 256)
        // (date_diff('day', d0, d1) + 1) BETWEEN 32 AND 63
GROUP BY l_returnflag
""",
)
def sink_delta_liquid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIQUID CLUSTERING on the Delta table: the table accretes in three
    arrival-order appends (12 files with no spatial locality — the
    normal ingest shape), then one OPTIMIZE rewrite clusters it on the
    stored HILBERT key (``operators/layout.py``'s curve; continuous, so
    each rewritten file owns a near-square (xb, yb) tile).  The box
    query then runs through ``read(where=...)`` — file skipping from the
    ADD ACTIONS' stats alone, no parquet footer reads — with the exact
    row filter on top, and must return what the raw table returns: the
    oracle recomputes the box aggregate relationally, so clustering is
    proven to change I/O, never answers.

    This composes the repo's two layout stories: ``ext_hilbert_layout``
    is the bare-parquet staging half; here the SAME key drives the
    table-format OPTIMIZE path (``compact(zorder_by=...)``), giving the
    lakehouse the re-clusterable layout that survives appends — run the
    rewrite again after more arrivals and the tiles re-tighten, which
    is precisely Delta's liquid-clustering maintenance loop.  Log-stat
    pruning on the clustered table is pinned in
    tests/test_delta_log.py (a minority of files intersect the box;
    the pre-OPTIMIZE table scans all of them)."""
    from ..operators.layout import _X_HI, _X_LO, _Y_HI, _Y_LO

    t = _build_liquid(spark, sf_dir, target_file_bytes=512 * 1024)
    back = t.read(where={"xb": (_X_LO, _X_HI), "yb": (_Y_LO, _Y_HI)})
    return (
        back.filter(
            F.col("xb").between(_X_LO, _X_HI)
            & F.col("yb").between(_Y_LO, _Y_HI)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@register(
    "sink_delta_dv_partitioned",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
WHERE l_orderkey NOT BETWEEN 500 AND 5000
  AND NOT (l_quantity BETWEEN 49 AND 50)
GROUP BY l_returnflag
""",
)
def sink_delta_dv_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION VECTORS on a HIVE-PARTITIONED table — the 100 TB norm
    (date/flag-partitioned fact tables taking GDPR/retention deletes):
    two merge-on-read DELETEs on DATA columns attach roaring-bitmap DVs
    to files across every partition directory with zero rewrites (the
    second delete exercises the DV-union path on files hit twice), and
    the read subtracts doomed positions per partition group while
    rebuilding partition columns from partitionValues — data files
    never stored them.

    Partition-COLUMN predicates deliberately refuse the DV path (a
    partition predicate doomes whole directories; tombstoning their
    files is the metadata-only answer — attaching per-row bitmaps
    would be pure overhead), pinned in tests."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    root = tempfile.mkdtemp(prefix="sdis_dv_part_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li, partition_by=["l_returnflag"])
    t.enable_deletion_vectors()
    t.delete_rows_dv("l_orderkey", 500, 5000)
    t.delete_rows_dv("l_quantity", 49, 50)
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@register(
    "sink_delta_manifest",
    oracle="""
SELECT l_returnflag,
       count(*)                  AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_delta_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST EXPORT round-trip (Delta's ``GENERATE
    symlink_format_manifest``): three fragmenting appends + an
    OPTIMIZE-style compaction (which tombstones the fragments with
    ``dataChange: false``), then the manifest is generated and the
    table is read back USING ONLY THE MANIFEST PATHS — the way a
    log-unaware external engine (Presto/Trino/Athena
    SymlinkTextInputFormat) consumes a Delta table.  The aggregate must
    equal the clean lineitem oracle: a raw directory listing would
    sweep in both the fragments AND their compaction and double-count
    every row, so a matching hash proves the manifest is a log-replay
    product, not a file listing."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="sdis_delta_manifest_")
    t = DeltaLogTable(spark, root)
    t.commit_append(li.filter(F.col("l_linenumber") <= 2))
    t.commit_append(li.filter(F.col("l_linenumber").between(3, 4)))
    t.commit_append(li.filter(F.col("l_linenumber") >= 5))
    t.compact()
    manifests = t.generate_manifest()
    paths = []
    for m in manifests:
        with open(m) as fh:
            paths.extend(line.strip() for line in fh if line.strip())
    return (
        spark.read.parquet(*paths)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )
