"""TableIO seam: Iceberg tables when a catalog is configured, plain
parquet directories with an explicit JSON manifest otherwise
(SURVEY.md §7.1 — no Iceberg runtime jars are guaranteed in this
sandbox, and the north rule's table semantics must not depend on them).

Same logical schema either way. The manifest records what Iceberg's
metadata layer would: schema DDL, partition columns, and an
append-only snapshot log (snapshot id, operation, row count), enough
for the resume/lineage machinery to reason about table state and for a
later Iceberg migration to be a drop-in (swap `_parquet_*` for
`writeTo`).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class TableIO:
    def __init__(self, spark: SparkSession, base: str,
                 catalog: Optional[str] = None):
        self.spark = spark
        self.base = base
        # use the Iceberg path iff the named catalog is actually
        # configured in this session
        self.catalog = catalog if (
            catalog
            and spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        ) else None

    # --- public API -----------------------------------------------------

    def write(self, df: DataFrame, name: str, mode: str = "append",
              partition_by: Optional[list[str]] = None) -> None:
        if self.catalog:
            writer = df.writeTo(f"{self.catalog}.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                writer = writer.partitionedBy(
                    *[F.col(c) for c in partition_by]
                )
            if mode == "overwrite":
                writer.createOrReplace()
            else:
                writer.createOrReplace() if not self._exists(name) \
                    else writer.append()
            return
        self._parquet_write(df, name, mode, partition_by)

    def read(self, name: str, merge_schema: bool = False) -> DataFrame:
        """``merge_schema=True`` reconciles files written under evolved
        schemas (added columns read as NULL for old files) — Iceberg
        gives this from its metadata; the parquet fallback pays a
        per-file footer read, so it stays opt-in (at 10^6 files the
        footer sweep is a real cost; the default trusts the manifest's
        single recorded schema)."""
        if self.catalog:
            return self.spark.read.table(f"{self.catalog}.{name}")
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(self._data_dir(name))

    def merge_upsert(self, df: DataFrame, name: str,
                     keys: list[str]) -> None:
        """MERGE INTO semantics: rows whose ``keys`` match an existing
        row replace it; the rest insert. Iceberg path: one SQL MERGE
        (copy-on-write handled by the table format). Parquet fallback:
        current ∖ matched-keys (left anti on the key columns only — the
        join ships keys, not payloads) ∪ new, written to a fresh data
        directory and atomically swapped in, so the read-then-overwrite
        hazard (Spark cannot overwrite a path it is lazily reading)
        never arises. The swap resets time travel, like overwrite.

        The incoming batch is deduped on ``keys`` first (deterministic
        min-struct keeper, the engine's standard keeper semantics):
        without it the two backends diverge on duplicate-key batches —
        SQL MERGE fails on multiple source matches while the parquet
        anti-join would insert every duplicate."""
        non_keys = [c for c in df.columns if c not in keys]
        if non_keys:
            df = (
                df.groupBy(*keys)
                .agg(F.min(F.struct(*non_keys)).alias("_keep"))
                .select(*keys, *[F.col(f"_keep.{c}").alias(c)
                                 for c in non_keys])
            )
        else:
            df = df.distinct()
        if self.catalog:
            df.createOrReplaceTempView("_merge_src")
            on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            self.spark.sql(
                f"MERGE INTO {self.catalog}.{name} t USING _merge_src s "
                f"ON {on} WHEN MATCHED THEN UPDATE SET * "
                f"WHEN NOT MATCHED THEN INSERT *"
            )
            return
        import shutil

        if not self._exists(name):
            self._parquet_write(df, name, "overwrite", None)
            return
        data_dir = self._data_dir(name)
        tmp_dir = data_dir + ".merge-tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        cur = self.read(name)
        merged = cur.join(
            df.select(*keys).distinct(), keys, "left_anti"
        ).unionByName(df)
        obs = Observation()
        merged = merged.observe(obs, F.count(F.lit(1)).alias("rows"))
        merged.write.mode("overwrite").parquet(tmp_dir)
        n = obs.get["rows"]
        shutil.rmtree(data_dir)
        os.rename(tmp_dir, data_dir)
        m = self._manifest(name)
        files = sorted(
            os.path.relpath(os.path.join(root, fn), data_dir)
            for root, _, fns in os.walk(data_dir)
            for fn in fns if fn.endswith(".parquet")
        )
        m["snapshots"] = []
        m["snapshots"].append({
            "snapshot_id": 1,
            "operation": "merge",
            "rows": n,
            "files": files,
            "ts": int(time.time()),
        })
        with open(self._manifest_path(name), "w") as f:
            json.dump(m, f, indent=2)

    def expire_snapshots(self, name: str, keep_last: int = 1) -> int:
        """Iceberg ``expire_snapshots`` analogue for the parquet
        fallback: drop all but the last ``keep_last`` snapshots from
        the manifest and DELETE data files no surviving snapshot
        references. Bounds the time-travel window (and disk) the way
        any production table maintenance does. Returns the number of
        files removed. Iceberg path: delegate to the procedure."""
        if self.catalog:
            self.spark.sql(
                f"CALL {self.catalog}.system.expire_snapshots("
                f"table => '{name}')"
            )
            return 0
        m = self._manifest(name)
        snaps = m.get("snapshots", [])
        if len(snaps) <= keep_last:
            return 0
        kept = snaps[-keep_last:]
        # visibility replay: the earliest kept snapshot must still see
        # every file accumulated before it, so fold older snapshots'
        # file lists into it (an overwrite/merge resets the set)
        visible: list[str] = []
        for snap in snaps[: len(snaps) - keep_last + 1]:
            if snap["operation"] in ("overwrite", "merge"):
                visible = list(snap.get("files", []))
            else:
                visible.extend(snap.get("files", []))
        kept[0] = dict(kept[0], files=visible)
        referenced = {f for s in kept for f in s.get("files", [])}
        data_dir = self._data_dir(name)
        removed = 0
        for root, _, fns in os.walk(data_dir):
            for fn in fns:
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(root, fn), data_dir)
                if rel not in referenced:
                    os.remove(os.path.join(root, fn))
                    removed += 1
        m["snapshots"] = kept
        with open(self._manifest_path(name), "w") as f:
            json.dump(m, f, indent=2)
        return removed

    def read_at(self, name: str, snapshot_id: int) -> DataFrame:
        """Time travel: the table as of ``snapshot_id`` (Iceberg's
        ``VERSION AS OF``). The parquet fallback replays the manifest's
        per-snapshot file lists — reading exactly the data files that
        existed then; an overwrite snapshot resets the visible set,
        appends accumulate."""
        if self.catalog:
            return (
                self.spark.read.option("snapshot-id", snapshot_id)
                .table(f"{self.catalog}.{name}")
            )
        files: list[str] = []
        for snap in self._manifest(name).get("snapshots", []):
            if snap["snapshot_id"] > snapshot_id:
                break
            if snap["operation"] == "overwrite":
                files = list(snap.get("files", []))
            else:
                files.extend(snap.get("files", []))
        if not files:
            raise ValueError(
                f"snapshot {snapshot_id} of table {name!r} has no files "
                "(unknown snapshot id, or written before time-travel "
                "tracking)"
            )
        base = self._data_dir(name)
        return self.spark.read.parquet(*[os.path.join(base, f) for f in files])

    def snapshots(self, name: str) -> list[dict]:
        if self.catalog:
            rows = self.spark.sql(
                f"SELECT * FROM {self.catalog}.{name}.snapshots"
            ).collect()
            return [r.asDict() for r in rows]
        return self._manifest(name).get("snapshots", [])

    def schema_ddl(self, name: str) -> str:
        if self.catalog:
            return self.read(name).schema.simpleString()
        return self._manifest(name)["schema"]

    # --- parquet fallback ------------------------------------------------

    def _exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        return os.path.isfile(self._manifest_path(name))

    def _data_dir(self, name: str) -> str:
        return os.path.join(self.base, name, "data")

    def _manifest_path(self, name: str) -> str:
        return os.path.join(self.base, name, "manifest.json")

    def _manifest(self, name: str) -> dict:
        if not os.path.isfile(self._manifest_path(name)):
            return {}
        with open(self._manifest_path(name)) as f:
            return json.load(f)

    def _parquet_write(self, df: DataFrame, name: str, mode: str,
                       partition_by: Optional[list[str]]) -> None:
        # row count for the manifest snapshot rides the write job itself
        # via an Observation — a separate df.count() would execute the
        # full upstream plan twice (for an extraction write that means
        # re-running every kernel) and could disagree with the rows
        # actually written when the plan is nondeterministic
        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        writer = df.write.mode(
            "overwrite" if mode == "overwrite" else "append"
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        data_dir = self._data_dir(name)
        m = self._manifest(name)
        known: set[str] = {
            f for s in m.get("snapshots", []) for f in s.get("files", [])
        }
        writer.parquet(data_dir)
        n = obs.get["rows"]
        # files added by THIS write = on-disk data files minus every
        # file a previous snapshot recorded (what Iceberg's manifest
        # list tracks) — enables read_at() time travel
        new_files = sorted(
            os.path.relpath(os.path.join(root, fn), data_dir)
            for root, _, fns in os.walk(data_dir)
            for fn in fns
            if fn.endswith(".parquet")
            and os.path.relpath(os.path.join(root, fn), data_dir)
            not in known
        )

        if mode == "overwrite" or not m:
            m = {
                "table": name,
                "schema": df.schema.simpleString(),
                "partition_by": partition_by or [],
                "snapshots": [] if mode == "overwrite" else
                m.get("snapshots", []),
            }
        snap_id = len(m["snapshots"]) + 1
        m["snapshots"].append({
            "snapshot_id": snap_id,
            "operation": mode,
            "rows": n,
            "files": new_files,
            "ts": int(time.time()),
        })
        os.makedirs(os.path.dirname(self._manifest_path(name)),
                    exist_ok=True)
        with open(self._manifest_path(name), "w") as f:
            json.dump(m, f, indent=2)
