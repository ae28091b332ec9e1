"""Snapshot-versioned table store over Parquet (Iceberg stand-in).

The sandbox has no Iceberg runtime jars (offline), so this module
implements the minimal Iceberg-shaped contract the engine needs —
immutable per-round snapshots, atomic commit, read-at-snapshot,
append-only logs, resume from the last committed round — as plain
parquet directories plus JSON manifests. The interface is deliberately
narrow so a real Iceberg catalog (``df.writeTo(...).append()`` /
``MERGE INTO`` / snapshot ids) is a drop-in replacement on a cluster.

Layout:

    root/
      _commits.json                     # [{round, tables, ts? no — no clock}, ...]
      <table>/snap-000007/*.parquet     # full state of <table> at round 7
      <table>/delta-000007/*.parquet    # append-only delta for round 7

Commit protocol (crash-safe):
1. write every table's ``snap-``/``delta-`` dir for round r (parquet
   write is to a temp name then rename by Spark itself);
2. atomically replace ``_commits.json`` (write ``_commits.json.tmp`` +
   ``os.replace``) recording round r and per-table row counts + file
   lists (the per-partition lineage/metrics the north_rule asks for).

Readers only ever look at rounds listed in ``_commits.json``; a crash
mid-round leaves orphan dirs that are ignored and overwritten on retry,
so resume-from-checkpoint is bit-identical to an uninterrupted run
(test_crawl_resume.py proves it).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- commit log --------------------------------------------------------

    def _commits_path(self) -> str:
        return os.path.join(self.root, "_commits.json")

    def commits(self) -> list[dict]:
        p = self._commits_path()
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return json.load(f)

    def last_round(self) -> int | None:
        c = self.commits()
        return c[-1]["round"] if c else None

    # -- write -------------------------------------------------------------

    def _dir(self, table: str, kind: str, rnd: int) -> str:
        return os.path.join(self.root, table, f"{kind}-{rnd:06d}")

    def write_snapshot(
        self, df: DataFrame, table: str, rnd: int, options: dict | None = None
    ) -> dict:
        return self._write(df, table, "snap", rnd, options)

    def write_bucketed_snapshot(
        self,
        df_dirty: DataFrame,
        table: str,
        rnd: int,
        bucket_col: str,
        inherit: dict[str, str] | None = None,
        dirty: list[int] | None = None,
    ) -> dict:
        """Incremental (Iceberg-manifest-shaped) snapshot: ``df_dirty``
        holds the FULL current rows of only the buckets that changed,
        keyed by ``bucket_col``. They are written partitioned by bucket
        under this round's snap dir; every untouched bucket is carried
        forward by REFERENCE — its manifest entry keeps pointing at the
        older round's bucket dir, zero bytes rewritten. Readers use the
        manifest (``read_snapshot`` / ``read_snapshot_buckets``), so a
        compaction's write volume is ∝ dirty-bucket rows, not |table|.

        ``dirty`` (when given) lists every bucket the caller knows
        changed. A dirty bucket that ends up with ZERO current rows
        writes no partition dir, and for an append-only table that
        can't happen — but for a MUTABLE table (the frontier: fetched
        rows leave it) a removal-only bucket must become empty, not
        silently inherit its old rows, so its inherited manifest entry
        is dropped. Append-only callers may omit ``dirty``.

        Old snap dirs stay referenced by later manifests until every
        bucket has gone dirty — a vacuum must walk manifest
        reachability before deleting (exactly Iceberg's rule)."""
        path = self._dir(table, "snap", rnd)
        # The manifest is rebuilt from the directory listing below, which
        # is only exact under STATIC partition overwrite (the whole path
        # is wiped first). Under dynamic mode, bucket dirs left by a
        # crashed earlier attempt would survive the overwrite and be
        # silently re-adopted as live buckets (round-5 advice).
        mode = (
            df_dirty.sparkSession.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            or "static"
        ).lower()
        assert mode == "static", (
            "write_bucketed_snapshot requires"
            " spark.sql.sources.partitionOverwriteMode=static; got "
            f"{mode!r} — the listdir-derived manifest would adopt stale"
            " bucket dirs from crashed attempts"
        )
        (
            df_dirty.write.mode("overwrite").partitionBy(bucket_col).parquet(path)
        )
        manifest = dict(inherit or {})
        for b in dirty or ():
            manifest.pop(str(b), None)
        prefix = f"{bucket_col}="
        dirty_keys = {str(b) for b in dirty} if dirty is not None else None
        for d in sorted(os.listdir(path)):
            if d.startswith(prefix):
                key = d[len(prefix):]
                # when the caller declared the dirty set, never adopt a
                # dir outside it (second line of defense vs stale dirs)
                if dirty_keys is not None and key not in dirty_keys:
                    continue
                manifest[key] = os.path.join(path, d)
        if not manifest:
            # zero-row schema sidecar: a mutable table can drain
            # completely (every manifest entry dropped), and an empty
            # partitioned write leaves no parquet footers to infer a
            # schema from — read_snapshot falls back to this when the
            # manifest is empty. Written ONLY in that case (round-6
            # compaction-cost trim: the sidecar is one whole Spark job,
            # and a non-empty manifest never reads it). "_"-prefixed
            # dirs are invisible to Spark's dir-level parquet listing.
            (
                df_dirty.drop(bucket_col)
                .limit(0)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(os.path.join(path, "_schema"))
            )
        return {
            "table": table,
            "kind": "snap",
            "path": path,
            "bucket_col": bucket_col,
            "manifest": manifest,
        }

    def write_delta(
        self, df: DataFrame, table: str, rnd: int, options: dict | None = None
    ) -> dict:
        return self._write(df, table, "delta", rnd, options)

    def _write(
        self, df: DataFrame, table: str, kind: str, rnd: int, options: dict | None = None
    ) -> dict:
        path = self._dir(table, kind, rnd)
        writer = df.write.mode("overwrite")
        for k, v in (options or {}).items():
            writer = writer.option(k, v)
        writer.parquet(path)
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith("_")
        )
        return {"table": table, "kind": kind, "path": path, "n_files": len(files)}

    def commit_round(self, rnd: int, table_infos: list[dict], metrics: dict) -> None:
        """Atomically record round ``rnd`` as committed.

        ``metrics`` carries the per-round lineage (per-host fetch counts,
        per-partition row counts) so a resumed run can verify state."""
        commits = self.commits()
        assert all(c["round"] != rnd for c in commits), f"round {rnd} already committed"
        commits.append({"round": rnd, "tables": table_infos, "metrics": metrics})
        tmp = self._commits_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(commits, f, indent=1)
        os.replace(tmp, self._commits_path())

    # -- read --------------------------------------------------------------

    def snapshot_info(self, table: str, rnd: int) -> dict | None:
        """Commit-log entry of ``table``'s snapshot at round ``rnd``
        (carries the bucket manifest for bucketed snapshots)."""
        for c in self.commits():
            if c["round"] != rnd:
                continue
            for t in c["tables"]:
                if t["table"] == table and t["kind"] == "snap":
                    return t
        return None

    def read_snapshot(self, spark: SparkSession, table: str, rnd: int) -> DataFrame:
        info = self.snapshot_info(table, rnd)
        if info is not None and "manifest" in info:
            paths = sorted(info["manifest"].values())
            if not paths:
                # fully-drained table: typed empty state via the sidecar
                return spark.read.parquet(os.path.join(info["path"], "_schema"))
            return spark.read.parquet(*paths)
        return spark.read.parquet(self._dir(table, "snap", rnd))

    def read_snapshot_buckets(
        self, spark: SparkSession, table: str, rnd: int, buckets: list[int]
    ) -> DataFrame | None:
        """Bucket-pruned read of a bucketed snapshot: only the manifest
        paths for ``buckets`` are listed/scanned — the I/O the per-round
        membership probe pays is ∝ candidate buckets, not |table|."""
        info = self.snapshot_info(table, rnd)
        assert info is not None and "manifest" in info, f"{table}@{rnd} not bucketed"
        manifest = info["manifest"]
        paths = [manifest[str(b)] for b in sorted(set(buckets)) if str(b) in manifest]
        return spark.read.parquet(*paths) if paths else None

    def _delta_paths(self, table: str, from_round: int, up_to_round: int) -> list[str]:
        """Committed delta dirs for ``table`` in [from_round, up_to]."""
        paths = []
        for c in self.commits():
            if not (from_round <= c["round"] <= up_to_round):
                continue
            for t in c["tables"]:
                if t["table"] == table and t["kind"] == "delta":
                    paths.append(t["path"])
        return paths

    def read_deltas(
        self,
        spark: SparkSession,
        table: str,
        up_to_round: int,
        from_round: int = 0,
    ) -> DataFrame | None:
        """Union of committed deltas for ``table`` in [from_round, up_to]."""
        paths = self._delta_paths(table, from_round, up_to_round)
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def compacted_paths(
        self, table: str, up_to_round: int
    ) -> tuple[str | None, list[str]]:
        """(latest snapshot dir or None, delta dirs after it) — what a
        read_compacted of ``table`` at ``up_to_round`` touches. Exposed
        so tests can assert the per-read dir count stays bounded by the
        compaction interval."""
        b = self.latest_snapshot_round(table, up_to_round)
        snap = self._dir(table, "snap", b) if b is not None else None
        lo = b + 1 if b is not None else 0
        return snap, self._delta_paths(table, lo, up_to_round)

    def read_compacted(
        self, spark: SparkSession, table: str, up_to_round: int
    ) -> DataFrame | None:
        """State of ``table`` at ``up_to_round`` as latest snapshot ∪
        deltas since. With periodic snapshots this bounds the parquet
        dirs listed per read to the compaction interval — without one,
        a 10^4-round run lists 10^4 delta dirs per round (a metadata /
        small-file bottleneck, not a data-volume one)."""
        b = self.latest_snapshot_round(table, up_to_round)
        if b is None:
            deltas = self._delta_paths(table, 0, up_to_round)
            return spark.read.parquet(*deltas) if deltas else None
        base = self.read_snapshot(spark, table, b)  # manifest-aware
        deltas = self._delta_paths(table, b + 1, up_to_round)
        return base.unionByName(spark.read.parquet(*deltas)) if deltas else base

    # -- rollback ----------------------------------------------------------

    def rollback(self, to_round: int) -> list[int]:
        """Iceberg-style rollback: atomically truncate the commit log to
        rounds ≤ ``to_round``. Readers see the store exactly as it was
        after ``to_round`` committed, and a resumed engine continues
        from there (round r+1 rewrites the orphaned snap-/delta- dirs
        via overwrite, so no cleanup pass is required — the same
        reasoning that makes uncommitted dirs invisible,
        test_commit_log_is_atomic). Returns the discarded rounds."""
        commits = self.commits()
        keep = [c for c in commits if c["round"] <= to_round]
        dropped = [c["round"] for c in commits if c["round"] > to_round]
        if not keep:
            raise ValueError(f"no committed round <= {to_round} to roll back to")
        if dropped:
            tmp = self._commits_path() + ".tmp"
            with open(tmp, "w") as f:
                json.dump(keep, f, indent=1)
            os.replace(tmp, self._commits_path())
        return dropped

    def latest_snapshot_round(self, table: str, up_to_round: int) -> int | None:
        """Round of the most recent committed full snapshot of ``table``."""
        best = None
        for c in self.commits():
            if c["round"] > up_to_round:
                continue
            for t in c["tables"]:
                if t["table"] == table and t["kind"] == "snap":
                    best = c["round"]
        return best
