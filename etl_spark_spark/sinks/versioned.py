"""Snapshot-versioned table store: copy-on-write MERGE with time
travel and optimistic-concurrency commits, built from plain parquet +
atomic filesystem primitives.

This is the engine's answer to the reference's Iceberg ``MERGE INTO``
(reference etl_job.py:78-85) in an environment without catalog jars:
the same reader/writer isolation guarantees a table format provides,
expressed with filesystem primitives —

- a writer stages data fully into a UNIQUE staging directory
  (``_v/.staging-{uuid}/``) that no reader ever resolves;
- commit is ONE atomic put-if-absent of the version entry
  ``_v/v{N:08d}``, in one of two interchangeable layouts:

  * ``symlink`` — the entry is a symlink to the staging directory
    (POSIX filesystems);
  * ``marker``  — the entry is a small MANIFEST FILE whose content is
    the staging directory name, published with hard-link-from-temp
    (write the content to a hidden temp file, ``os.link`` it to the
    entry name): the link is atomic put-if-absent AND the content is
    complete before the name exists, so no reader can observe a
    half-written pointer. This is the object-store shape — stores
    without symlinks express the same commit as a conditional PUT
    (S3 ``If-None-Match``, GCS ``ifGenerationMatch=0``) of the
    manifest object; only :func:`_commit_entry` would change.

  Either way creation fails with EEXIST if the slot is taken, so two
  writers racing for the same version number get exactly one winner —
  the same compare-and-swap a real catalog performs on its commit
  log. Because data is complete before the entry exists, a version
  entry either IS a full snapshot or does not exist; there is no
  half-committed state to misread. The default layout is ``auto``:
  probe symlink support once per table root and fall back to markers
  where symlinks are unsupported; the two layouts coexist in one
  table (readers resolve each entry by its own kind);
- a crash before the commit entry leaves an unreferenced staging
  directory (invisible to readers; ``vacuum_versions`` sweeps it);
- committed = "the version entry exists as a symlink". The ``_current``
  manifest is kept as a monotonically-advancing hint (and for
  compatibility with tables written by the pre-CAS layout, whose
  version entries are real directories: those count as committed only
  up to the manifest — an orphaned real directory is never readable as
  a snapshot, even after later commits publish past it);
- old versions stay readable (``read_versioned(path, version=...)``)
  until vacuumed — time travel for debugging/reproducibility, the
  property training pipelines need most from a table format. A reader
  racing vacuum: versions vacuum RETAINS (within ``keep``, and always
  the current one) read completely and correctly throughout; a reader
  that resolved a version vacuum then REMOVES either fails loudly on
  its lazy scan or (if the filesystem let the opened scan finish)
  returns the complete snapshot — never silent partial data — and
  re-resolving that version post-vacuum raises FileNotFoundError
  (pinned cross-process in tests/test_vacuum_reader.py). On a real
  object store the same property falls out of delete-after-read
  visibility; set ``keep`` to cover the longest-running reader.

Concurrent writers: ``merge_into_versioned`` is a full optimistic-
concurrency loop — read current version, compute the merge, commit
with ``expected_current`` CAS; on conflict it re-reads and re-merges,
so two interleaved merges both land and neither update is lost (pinned
by test). Cross-table transactions still need a real catalog.

At 100 TB: copy-on-write rewrites the whole table per merge. That is
the honest cost of plain-parquet MERGE; the partition-scoped
``sinks.upsert`` covers targets where touched-partition rewriting is
enough, and a real catalog covers row-level deletes.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VDIR = "_v"
_MANIFEST = "_current"
_ANY = "any"  # sentinel: no CAS, blind snapshot write


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this writer's read and its
    commit attempt (the optimistic-concurrency conflict signal)."""


def _version_dir(path: str | Path, version: int) -> Path:
    return Path(path) / _VDIR / f"v{version:08d}"


_LAYOUT_CACHE: dict[str, str] = {}


def _pick_layout(root: Path, layout: str) -> str:
    """Resolve ``layout='auto'`` by probing symlink support once per
    table root (object-store FUSE mounts and some network filesystems
    reject symlink creation — the marker protocol covers them).

    The marker fallback's atomicity rests on ``os.link``, and
    filesystems without symlinks frequently lack hard links too — so
    the fallback is probed as well, BEFORE any staging data is written:
    a store supporting neither fails fast here with a pointer at the
    conditional-PUT note (module docstring) instead of surfacing a raw
    OSError after a full staged write (ADVICE r7)."""
    if layout in ("symlink", "marker"):
        return layout
    if layout != "auto":
        raise ValueError(f"layout must be auto|symlink|marker, got {layout!r}")
    key = str(root)
    cached = _LAYOUT_CACHE.get(key)
    if cached is not None:
        return cached
    probe = root / _VDIR / f".probe-{uuid.uuid4().hex}"
    try:
        os.symlink(".", probe)
        os.unlink(probe)
        picked = "symlink"
    except OSError:
        src = root / _VDIR / f".probe-{uuid.uuid4().hex}"
        dst = root / _VDIR / f".probe-{uuid.uuid4().hex}"
        try:
            src.write_text("probe\n")
            os.link(src, dst)
            os.unlink(dst)
            picked = "marker"
        except OSError as e:
            raise OSError(
                f"table root {root} supports neither symlinks nor hard "
                "links, so no atomic put-if-absent commit is available "
                "on this filesystem. On a real object store, express "
                "the marker commit as a conditional PUT (S3 "
                "If-None-Match / GCS ifGenerationMatch=0) of the "
                "version manifest — see the module docstring."
            ) from e
        finally:
            src.unlink(missing_ok=True)
    _LAYOUT_CACHE[key] = picked
    return picked


def _commit_entry(
    root: Path, version: int, staging_name: str, layout: str
) -> None:
    """Publish ``version`` -> ``staging_name`` with ONE atomic
    put-if-absent; raises FileExistsError when the slot is taken
    (the CAS losing side). ``marker`` writes the pointer content to a
    hidden temp file first and hard-links it into place, so the entry
    name never exists with incomplete content."""
    entry = _version_dir(root, version)
    if layout == "symlink":
        os.symlink(staging_name, entry)
        return
    tmp = root / _VDIR / f".cmt-{uuid.uuid4().hex}"
    tmp.write_text(staging_name + "\n")
    try:
        os.link(tmp, entry)
    finally:
        os.unlink(tmp)


def _entry_target_name(entry: Path) -> str | None:
    """The staging-directory name a committed entry points at, or None
    for a legacy real-directory entry (which IS its own data dir)."""
    if entry.is_symlink():
        return os.readlink(entry)
    if entry.is_file():
        return entry.read_text().strip()
    return None


def _snapshot_data_dir(path: str | Path, version: int) -> Path:
    """The directory holding a committed version's data files,
    whichever entry layout committed it."""
    entry = _version_dir(path, version)
    target = _entry_target_name(entry)
    if target is None:
        return entry
    return Path(path) / _VDIR / target


def _manifest_version(path: str | Path) -> int | None:
    m = Path(path) / _MANIFEST
    if not m.exists():
        return None
    return int(m.read_text().strip())


def _advance_manifest(root: Path, version: int) -> None:
    """Move the hint manifest forward (never backward — a slow racing
    writer must not regress it past a newer commit)."""
    cur = _manifest_version(root)
    if cur is not None and cur >= version:
        return
    tmp = root / f"{_MANIFEST}.tmp{uuid.uuid4().hex[:8]}"
    tmp.write_text(f"{version}\n")
    os.replace(tmp, root / _MANIFEST)


def _is_committed(path: str | Path, version: int) -> bool:
    p = _version_dir(path, version)
    if p.is_symlink() or p.is_file():
        return True  # CAS protocol: entry existence == committed
    if p.is_dir():
        # pre-CAS layout: real directory, committed only up to the
        # manifest — and never at/after the first symlink commit
        # (legacy commits all predate the CAS protocol), so a
        # crash-orphaned directory stays orphaned even after later
        # commits advance the manifest past its number
        m = _manifest_version(path)
        if m is None or version > m:
            return False
        links = [
            v
            for v in list_versions(path)
            if _version_dir(path, v).is_symlink()
            or _version_dir(path, v).is_file()
        ]
        return not links or version < links[0]
    return False


def list_versions(path: str | Path) -> list[int]:
    """All version numbers with an entry on disk (committed or
    orphaned), ascending."""
    vroot = Path(path) / _VDIR
    if not vroot.exists():
        return []
    return sorted(
        int(p.name[1:]) for p in vroot.iterdir() if p.name.startswith("v")
    )


def committed_versions(path: str | Path) -> list[int]:
    """Version numbers readers may resolve, ascending."""
    return [v for v in list_versions(path) if _is_committed(path, v)]


def current_version(path: str | Path) -> int | None:
    """The newest committed version number, or None for an empty
    table."""
    vs = committed_versions(path)
    return vs[-1] if vs else None


def write_version(
    spark: SparkSession,
    df: DataFrame,
    path: str | Path,
    fmt: str = "parquet",
    expected_current: int | None | str = _ANY,
    layout: str = "auto",
) -> int:
    """Commit ``df`` as the table's next version. Data lands fully in a
    unique staging directory BEFORE the atomic commit entry publishes
    it; a crash before the commit leaves readers untouched.

    ``layout`` picks the commit-entry protocol: ``'symlink'`` (POSIX),
    ``'marker'`` (put-if-absent manifest file — the object-store-safe
    shape), or ``'auto'`` (probe symlink support per table root, fall
    back to markers). Layouts may be mixed within one table.

    ``expected_current`` selects the write mode:

    - ``"any"`` (default): blind snapshot write — claims the lowest
      free slot, retrying past slots other writers take;
    - an int (or None for expect-empty): compare-and-swap — commits
      ONLY IF the table's newest committed version is still exactly
      that value, else raises :class:`ConcurrentWriteError` (and
      removes its staging data). This is the primitive a
      read-merge-commit cycle needs to detect a concurrent commit.
    """
    root = Path(path)
    (root / _VDIR).mkdir(parents=True, exist_ok=True)
    layout = _pick_layout(root, layout)
    staging = root / _VDIR / f".staging-{uuid.uuid4().hex}"
    df.write.format(fmt).mode("errorifexists").save(str(staging))

    cas = expected_current != _ANY
    for _ in range(1000):  # blind mode may race past many taken slots
        cur = current_version(root)
        if cas and cur != expected_current:
            shutil.rmtree(staging)
            raise ConcurrentWriteError(
                f"expected current version {expected_current}, found {cur}"
            )
        base = 0 if cur is None else cur
        taken = set(list_versions(root))
        target = base + 1
        while target in taken:
            target += 1
        try:
            # atomic put-if-absent: relative pointer keeps the table
            # relocatable
            _commit_entry(root, target, staging.name, layout)
        except FileExistsError:
            if cas:
                shutil.rmtree(staging)
                raise ConcurrentWriteError(
                    f"lost the commit race for version {target}"
                )
            continue  # blind mode: rescan and take the next free slot
        if cas:
            # a writer may have committed a DIFFERENT slot between our
            # read and our claim (it saw our claim and skipped ahead,
            # or claimed a lower free slot) — validate nothing newer
            # than expected committed besides us, else roll back
            others = [v for v in committed_versions(root) if v != target]
            newest = others[-1] if others else None
            if newest != expected_current:
                os.unlink(_version_dir(root, target))
                shutil.rmtree(staging)
                raise ConcurrentWriteError(
                    f"concurrent commit detected (saw {newest}, "
                    f"expected {expected_current})"
                )
        _advance_manifest(root, target)
        return target
    raise ConcurrentWriteError("could not claim a version slot")


def read_versioned(
    spark: SparkSession,
    path: str | Path,
    version: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read the committed snapshot (or a pinned historical ``version``).
    Raises FileNotFoundError on an empty table or when ``version``
    names an uncommitted/orphaned directory — crash residue is never
    readable as a snapshot."""
    v = current_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"versioned table {path} has no commits")
    if not _is_committed(path, v):
        raise FileNotFoundError(
            f"version {v} under {path} is not a committed snapshot "
            "(orphaned or never written)"
        )
    return spark.read.format(fmt).load(str(_snapshot_data_dir(path, v)))


def merge_into_versioned(
    spark: SparkSession,
    source_df: DataFrame,
    path: str | Path,
    keys: Sequence[str],
    when_matched: str = "update",
    insert_unmatched: bool = True,
    fmt: str = "parquet",
    max_retries: int = 5,
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

    Concurrency: full optimistic loop — the merge is computed against
    the version observed at read time and committed with a CAS on that
    version; on conflict the cycle re-reads and re-merges (up to
    ``max_retries``), so interleaved merges serialize without lost
    updates."""
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    keys = list(keys)
    last_err: ConcurrentWriteError | None = None
    for _ in range(max_retries):
        cur = current_version(path)
        if cur is None:
            if not insert_unmatched:
                raise ValueError(
                    "nothing to merge: empty table and insert_unmatched=False"
                )
            merged = source_df
        else:
            target = read_versioned(spark, path, cur, fmt)
            src_keys = source_df.select(*keys).distinct()
            untouched = target.join(src_keys, keys, "left_anti")
            if when_matched == "update":
                replaced = source_df
                if not insert_unmatched:
                    replaced = source_df.join(
                        target.select(*keys).distinct(), keys, "left_semi"
                    )
                merged = untouched.unionByName(
                    replaced, allowMissingColumns=True
                )
            else:  # delete matched
                merged = untouched
                if insert_unmatched:
                    inserts = source_df.join(
                        target.select(*keys).distinct(), keys, "left_anti"
                    )
                    merged = merged.unionByName(
                        inserts, allowMissingColumns=True
                    )
        try:
            return write_version(
                spark, merged, path, fmt, expected_current=cur
            )
        except ConcurrentWriteError as e:
            last_err = e  # someone committed under us: re-read, re-merge
    raise ConcurrentWriteError(
        f"merge lost the commit race {max_retries} times"
    ) from last_err


def apply_snapshot_delta(
    spark: SparkSession,
    delta: DataFrame,
    path: str | Path,
    keys: Sequence[str],
    fmt: str = "parquet",
    max_retries: int = 5,
) -> int:
    """Apply a ``snapshot_diff`` delta to a FOLLOWER table in one
    commit: insert/update rows upsert, delete rows remove their keys.
    This closes the CDC loop — a downstream copy follows a
    copy-on-write leader by shipping deltas, never re-reading the
    leader's full snapshots. If the follower currently equals the
    leader's ``from_version``, it equals the leader's ``to_version``
    after the apply (pinned by test). Same optimistic-concurrency
    commit as ``merge_into_versioned``. Returns the committed
    version."""
    keys = list(keys)
    upserts = delta.filter(F.col("change_type") != "delete").drop("change_type")
    touched = delta.select(*keys).distinct()
    last_err: ConcurrentWriteError | None = None
    for _ in range(max_retries):
        cur = current_version(path)
        if cur is None:
            merged = upserts
        else:
            target = read_versioned(spark, path, cur, fmt)
            # NULL-safe anti join: the diff matches NULL keys with
            # eqNullSafe, so the apply must too — a plain anti join
            # would leave a NULL-keyed target row behind its update
            t = target.alias("t")
            d = touched.alias("d")
            cond = [
                F.col(f"t.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys
            ]
            untouched = t.join(d, cond, "left_anti").select("t.*")
            merged = untouched.unionByName(upserts, allowMissingColumns=True)
        try:
            return write_version(spark, merged, path, fmt, expected_current=cur)
        except ConcurrentWriteError as e:
            last_err = e
    raise ConcurrentWriteError(
        f"delta apply lost the commit race {max_retries} times"
    ) from last_err


def compact_table(
    spark: SparkSession,
    path: str | Path,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
    order_by: Sequence[str] | None = None,
) -> int:
    """Rewrite the current snapshot's data files into ~``target_file_bytes``
    files and commit the result as a new version — the maintenance op
    every ingest-heavy table needs: streams of small merges accumulate
    thousands of tiny files, and at cluster scale every tiny file is a
    scan task, a driver bookkeeping entry, and a seek.

    Properties:

    - data-identical by construction (same rows, new layout); readers
      of older versions are untouched (time travel intact);
    - file count is sized from the snapshot's ACTUAL on-disk bytes
      (``coalesce`` — a shuffle-free collapse; compaction must not pay
      a full shuffle just to concatenate files);
    - with ``order_by``, the rewrite RANGE-CLUSTERS and sorts on those
      columns instead (Delta's OPTIMIZE-with-clustering shape): this
      one deliberately pays the range exchange, buying disjoint
      per-file min/max stats so the stats-index / row-group skippers
      discriminate on the key — the right trade when the table is
      read through range predicates;
    - committed with a CAS on the version observed at read time, so a
      merge landing mid-compaction raises :class:`ConcurrentWriteError`
      instead of silently reverting that merge's rows (the caller — a
      maintenance loop — just retries later).

    At 100 TB the same op runs partition-scoped (compact one date/
    bucket directory at a time) — this table store is unpartitioned
    snapshots, so the scope is the snapshot. Returns the new version.
    """
    cur = current_version(path)
    if cur is None:
        raise FileNotFoundError(f"versioned table {path} has no commits")
    vdir = _snapshot_data_dir(path, cur)
    on_disk = sum(
        f.stat().st_size
        for f in Path(vdir).rglob("*")
        if f.is_file() and not f.name.startswith((".", "_"))
    )
    n_files = max(1, -(-on_disk // target_file_bytes))  # ceil
    snap = read_versioned(spark, path, cur, fmt)
    if order_by:
        snap = snap.repartitionByRange(
            int(n_files), *[F.col(c) for c in order_by]
        ).sortWithinPartitions(*order_by)
    else:
        snap = snap.coalesce(int(n_files))
    return write_version(spark, snap, path, fmt, expected_current=cur)


def vacuum_versions(path: str | Path, keep: int = 1) -> list[int]:
    """Delete version entries older than the newest ``keep`` committed
    ones, plus any orphaned (never-committed) directories and
    unreferenced staging directories. Never touches the current
    version. Not safe to run concurrently with an in-flight writer
    (it may sweep that writer's staging data). Returns the versions
    removed."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    root = Path(path)
    committed = committed_versions(root)
    if not committed:
        return []
    uncommitted = [v for v in list_versions(root) if v not in committed]
    drop = (committed[:-keep] if len(committed) > keep else []) + uncommitted
    for v in drop:
        p = _version_dir(root, v)
        tgt_name = _entry_target_name(p)
        if tgt_name is not None:
            os.unlink(p)
            shutil.rmtree(root / _VDIR / tgt_name, ignore_errors=True)
        else:
            shutil.rmtree(p)
    # sweep staging dirs no surviving version references
    referenced = {
        name
        for v in committed_versions(root)
        if (name := _entry_target_name(_version_dir(root, v))) is not None
    }
    vroot = root / _VDIR
    for d in vroot.iterdir():
        if d.name.startswith(".staging-") and d.name not in referenced:
            shutil.rmtree(d, ignore_errors=True)
        elif d.name.startswith((".cmt-", ".probe-")) and d.is_file():
            # a crash between the marker temp's write_text and its
            # os.link orphans the hidden temp; committed entries are
            # the LINKED names (v########), never the .cmt-* temp, so
            # sweeping is always safe for completed commits — and
            # vacuum already assumes no writer is in flight. Same for
            # .probe-* layout-probe leftovers (a crash between the
            # probe's write_text/os.link and its finally).
            d.unlink(missing_ok=True)
    return sorted(drop)


def snapshot_diff(
    spark: SparkSession,
    path: str | Path,
    from_version: int,
    to_version: int,
    keys: Sequence[str],
    fmt: str = "parquet",
    include_old: bool = False,
) -> DataFrame:
    """Change-data-capture between two committed snapshots: one row per
    changed key with ``change_type`` in {insert, update, delete} plus
    the row's columns at ``to_version`` (NULLs for deletes — the key
    columns always survive, taken from the old side).

    The diff is a single full-outer join on the keys; unchanged rows
    are filtered by comparing the non-key columns as one struct (NULL-
    safe equality), so the shuffle carries both snapshots once and the
    output is only the delta. Presence on each side is detected by a
    literal marker column (NOT key nullness — a legitimately-NULL key
    column matched via eqNullSafe must not read as an insert). This is
    how downstream consumers follow a copy-on-write table without
    re-reading it: ship the delta, not the snapshot.

    ``include_old=True`` additionally emits each payload column's
    from-version value as ``old_<col>`` (NULL for inserts) — the
    retraction half a consumer needs to maintain derived aggregates
    incrementally (see ``operators.rollup.apply_agg_delta``)."""
    keys = list(keys)
    old = read_versioned(spark, path, from_version, fmt)
    new = read_versioned(spark, path, to_version, fmt)
    old_fields = {f.name: f.dataType for f in old.schema.fields}
    new_fields = {f.name: f.dataType for f in new.schema.fields}
    if old_fields != new_fields:
        raise ValueError(
            f"schema changed between versions: {old_fields} vs "
            f"{new_fields} — diff the schemas, not the rows"
        )
    payload = [c for c in new.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.struct(*payload).alias("__old_p") if payload else F.lit(None).alias("__old_p"),
        F.lit(True).alias("__old_present"),
    )
    n = new.select(
        *keys,
        F.struct(*payload).alias("__new_p") if payload else F.lit(None).alias("__new_p"),
        F.lit(True).alias("__new_present"),
    )
    cond = [n[k].eqNullSafe(o[f"__ok_{k}"]) for k in keys]
    joined = n.join(o, cond, "full_outer")
    change = (
        F.when(F.col("__old_present").isNull(), F.lit("insert"))
        .when(F.col("__new_present").isNull(), F.lit("delete"))
        .when(F.col("__new_p").eqNullSafe(F.col("__old_p")), F.lit(None))
        .otherwise(F.lit("update"))
    )
    out_keys = [
        F.coalesce(n[k], o[f"__ok_{k}"]).alias(k) for k in keys
    ]
    out_payload = [F.col("__new_p")[c].alias(c) for c in payload]
    if include_old:
        out_payload += [
            F.col("__old_p")[c].alias(f"old_{c}") for c in payload
        ]
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(*out_keys, *out_payload, "change_type")
    )

