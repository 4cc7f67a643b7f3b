"""Snapshot-versioned table store: copy-on-write MERGE with time
travel, built from plain parquet + an atomically-swapped manifest.

This is the engine's answer to the reference's Iceberg ``MERGE INTO``
(reference etl_job.py:78-85) in an environment without catalog jars:
the same reader/writer isolation guarantees a table format provides,
expressed with filesystem primitives —

- every write creates a NEW immutable version directory
  (``_v/v{N:08d}/``); existing files are never mutated;
- readers resolve the current version through a single manifest file
  (``_current``) whose content is replaced via write-temp + atomic
  ``os.replace`` — a reader sees the old version or the new one, never
  a half-written table;
- a crash mid-write leaves an orphan version directory that no
  manifest references (invisible to readers; ``vacuum_versions``
  sweeps it), exactly the snapshot-isolation failure mode of a real
  table format;
- old versions stay readable (``read_versioned(path, version=...)``)
  until vacuumed — time travel for debugging/reproducibility, the
  property training pipelines need most from a table format.

What this does NOT give (documented, not hidden): cross-table
transactions and concurrent WRITER coordination (two simultaneous
writers could both stage version N+1; a catalog's atomic
compare-and-swap is the real fix — os.replace makes the last one win
atomically, it does not serialize them). Single-writer many-reader,
the dominant ETL topology, is fully safe.

At 100 TB: copy-on-write rewrites the whole table per merge. That is
the honest cost of plain-parquet MERGE; the partition-scoped
``sinks.upsert`` covers targets where touched-partition rewriting is
enough, and a real catalog covers row-level deletes.
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VDIR = "_v"
_MANIFEST = "_current"


def _version_dir(path: str | Path, version: int) -> Path:
    return Path(path) / _VDIR / f"v{version:08d}"


def current_version(path: str | Path) -> int | None:
    """The committed version number, or None for an empty table."""
    m = Path(path) / _MANIFEST
    if not m.exists():
        return None
    return int(m.read_text().strip())


def list_versions(path: str | Path) -> list[int]:
    """All version numbers with a data directory on disk (committed or
    orphaned), ascending."""
    vroot = Path(path) / _VDIR
    if not vroot.exists():
        return []
    return sorted(
        int(p.name[1:]) for p in vroot.iterdir() if p.name.startswith("v")
    )


def write_version(
    spark: SparkSession,
    df: DataFrame,
    path: str | Path,
    fmt: str = "parquet",
) -> int:
    """Commit ``df`` as the table's next version. Data lands fully in a
    fresh version directory BEFORE the manifest swap publishes it; a
    crash before the swap leaves readers on the old version."""
    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)
    cur = current_version(root)
    nxt = 1 if cur is None else cur + 1
    # skip over orphaned (crashed) staging dirs
    taken = set(list_versions(root))
    while nxt in taken:
        nxt += 1
    vdir = _version_dir(root, nxt)
    df.write.format(fmt).mode("errorifexists").save(str(vdir))
    tmp = root / f"{_MANIFEST}.tmp"
    tmp.write_text(f"{nxt}\n")
    os.replace(tmp, root / _MANIFEST)  # atomic publish
    return nxt


def read_versioned(
    spark: SparkSession,
    path: str | Path,
    version: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read the committed snapshot (or a pinned historical ``version``).
    Raises FileNotFoundError on an empty table."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"versioned table {path} has no commits")
    vdir = _version_dir(path, v)
    if not vdir.exists():
        raise FileNotFoundError(f"version {v} not present under {path}")
    return spark.read.format(fmt).load(str(vdir))


def merge_into_versioned(
    spark: SparkSession,
    source_df: DataFrame,
    path: str | Path,
    keys: Sequence[str],
    when_matched: str = "update",
    insert_unmatched: bool = True,
    fmt: str = "parquet",
) -> int:
    """MERGE with the standard clause semantics, committed as a new
    snapshot:

    - ``when_matched='update'``: matched target rows are replaced by
      their source row (whole-row upsert);
    - ``when_matched='delete'``: matched target rows are removed;
    - ``insert_unmatched``: source rows with no target match are
      appended (with ``False``, an update/delete-only merge).

    First merge into an empty table bootstraps it from ``source_df``
    (inserts only). Returns the committed version number.
    """
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    keys = list(keys)
    cur = current_version(path)
    if cur is None:
        if not insert_unmatched:
            raise ValueError("nothing to merge: empty table and insert_unmatched=False")
        return write_version(spark, source_df, path, fmt)
    target = read_versioned(spark, path, cur, fmt)
    src_keys = source_df.select(*keys).distinct()
    untouched = target.join(src_keys, keys, "left_anti")
    if when_matched == "update":
        replaced = source_df
        if not insert_unmatched:
            replaced = source_df.join(
                target.select(*keys).distinct(), keys, "left_semi"
            )
        merged = untouched.unionByName(replaced, allowMissingColumns=True)
    else:  # delete matched
        merged = untouched
        if insert_unmatched:
            inserts = source_df.join(
                target.select(*keys).distinct(), keys, "left_anti"
            )
            merged = merged.unionByName(inserts, allowMissingColumns=True)
    return write_version(spark, merged, path, fmt)


def vacuum_versions(path: str | Path, keep: int = 1) -> list[int]:
    """Delete version directories older than the newest ``keep``
    committed ones, plus any orphaned (never-published) directories
    newer than the current manifest. Never touches the current version.
    Returns the versions removed."""
    import shutil

    if keep < 1:
        raise ValueError("keep must be >= 1")
    cur = current_version(path)
    if cur is None:
        return []
    committed = [v for v in list_versions(path) if v <= cur]
    orphans = [v for v in list_versions(path) if v > cur]
    drop = committed[:-keep] if len(committed) > keep else []
    drop += orphans
    for v in drop:
        shutil.rmtree(_version_dir(path, v))
    return sorted(drop)


def snapshot_diff(
    spark: SparkSession,
    path: str | Path,
    from_version: int,
    to_version: int,
    keys: Sequence[str],
    fmt: str = "parquet",
) -> DataFrame:
    """Change-data-capture between two committed snapshots: one row per
    changed key with ``change_type`` in {insert, update, delete} plus
    the row's columns at ``to_version`` (NULLs for deletes — the key
    columns always survive, taken from the old side).

    The diff is a single full-outer join on the keys; unchanged rows
    are filtered by comparing the non-key columns as one struct (NULL-
    safe equality), so the shuffle carries both snapshots once and the
    output is only the delta. This is how downstream consumers follow
    a copy-on-write table without re-reading it: ship the delta, not
    the snapshot."""
    keys = list(keys)
    old = read_versioned(spark, path, from_version, fmt)
    new = read_versioned(spark, path, to_version, fmt)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"schema changed between versions: {sorted(old.columns)} vs "
            f"{sorted(new.columns)} — diff the schemas, not the rows"
        )
    payload = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.struct(*payload).alias("__old_p") if payload else F.lit(None).alias("__old_p"),
    )
    n = new.select(
        *keys,
        F.struct(*payload).alias("__new_p") if payload else F.lit(None).alias("__new_p"),
        F.lit(True).alias("__new_present"),
    )
    cond = [n[k].eqNullSafe(o[f"__ok_{k}"]) for k in keys]
    joined = n.join(o, cond, "full_outer")
    change = (
        F.when(o["__ok_" + keys[0]].isNull(), F.lit("insert"))
        .when(F.col("__new_present").isNull(), F.lit("delete"))
        .when(F.col("__new_p").eqNullSafe(F.col("__old_p")), F.lit(None))
        .otherwise(F.lit("update"))
    )
    out_keys = [
        F.coalesce(n[k], o[f"__ok_{k}"]).alias(k) for k in keys
    ]
    out_payload = [F.col("__new_p")[c].alias(c) for c in payload]
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*out_keys, *out_payload, "change_type")
    )
