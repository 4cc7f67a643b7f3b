"""Object-store-safe commit protocol for the versioned table store.

The symlink CAS is POSIX-only; round-7 adds the ``marker`` layout —
put-if-absent manifest files (hard-link-from-temp locally; conditional
PUT on a real object store). These tests pin:

- both layouts commit/read/vacuum identically and coexist in a table;
- the CAS conflict signal works under the marker layout;
- fault injection: a crash between staging and commit leaves the table
  readable at N-1 in BOTH layouts, and vacuum sweeps the residue;
- a half-written marker can never be observed (content is complete
  before the entry name exists).
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from etl_spark_spark.sinks.versioned import (
    ConcurrentWriteError,
    committed_versions,
    current_version,
    merge_into_versioned,
    read_versioned,
    vacuum_versions,
    write_version,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _entries(root):
    return sorted(p.name for p in (Path(root) / "_v").iterdir())


@pytest.mark.parametrize("layout", ["symlink", "marker"])
def test_layout_commit_read_timetravel_vacuum(spark, tmp_path, layout):
    root = str(tmp_path / f"t_{layout}")
    v1 = write_version(spark, _df(spark, [(1, "a")]), root, layout=layout)
    v2 = write_version(
        spark, _df(spark, [(1, "a"), (2, "b")]), root, layout=layout
    )
    assert committed_versions(root) == [v1, v2]
    assert read_versioned(spark, root).count() == 2
    assert read_versioned(spark, root, version=v1).count() == 1  # time travel
    entry = Path(root) / "_v" / f"v{v2:08d}"
    if layout == "marker":
        assert entry.is_file() and not entry.is_symlink()
        # pointer content resolves inside _v (relative, relocatable)
        assert (Path(root) / "_v" / entry.read_text().strip()).is_dir()
    else:
        assert entry.is_symlink()
    removed = vacuum_versions(root, keep=1)
    assert removed == [v1]
    assert committed_versions(root) == [v2]
    assert read_versioned(spark, root).count() == 2
    # v1's staging data actually reclaimed
    stagings = [
        d for d in (Path(root) / "_v").iterdir()
        if d.name.startswith(".staging-")
    ]
    assert len(stagings) == 1


def test_layouts_coexist_in_one_table(spark, tmp_path):
    root = str(tmp_path / "mixed")
    v1 = write_version(spark, _df(spark, [(1, "a")]), root, layout="symlink")
    v2 = write_version(spark, _df(spark, [(2, "b")]), root, layout="marker")
    v3 = write_version(spark, _df(spark, [(3, "c")]), root, layout="symlink")
    assert committed_versions(root) == [v1, v2, v3]
    assert {r["k"] for r in read_versioned(spark, root, version=v2).collect()} == {2}
    assert {r["k"] for r in read_versioned(spark, root).collect()} == {3}


def test_marker_cas_conflict_detected(spark, tmp_path):
    root = str(tmp_path / "cas")
    v1 = write_version(spark, _df(spark, [(1, "a")]), root, layout="marker")
    # another writer lands v2 under the marker layout
    write_version(spark, _df(spark, [(2, "b")]), root, layout="marker")
    with pytest.raises(ConcurrentWriteError):
        write_version(
            spark,
            _df(spark, [(9, "z")]),
            root,
            expected_current=v1,
            layout="marker",
        )
    # the loser's staging data was cleaned up
    stagings = [
        d for d in (Path(root) / "_v").iterdir()
        if d.name.startswith(".staging-")
    ]
    assert len(stagings) == 2  # only the two committed snapshots


@pytest.mark.parametrize("layout", ["symlink", "marker"])
def test_crash_between_staging_and_commit_leaves_nm1(
    spark, tmp_path, layout, monkeypatch
):
    """Kill the writer after data staging, before the commit entry:
    readers still see N-1 and vacuum reclaims the orphan staging."""
    import etl_spark_spark.sinks.versioned as V

    root = str(tmp_path / f"crash_{layout}")
    v1 = write_version(spark, _df(spark, [(1, "a")]), root, layout=layout)

    class Boom(RuntimeError):
        pass

    def die(*a, **k):
        raise Boom("simulated crash before commit")

    monkeypatch.setattr(V, "_commit_entry", die)
    with pytest.raises(Boom):
        write_version(spark, _df(spark, [(2, "b")]), root, layout=layout)
    monkeypatch.undo()

    # table intact at N-1
    assert current_version(root) == v1
    assert {r["k"] for r in read_versioned(spark, root).collect()} == {1}
    # orphan staging exists, invisible to readers, swept by vacuum
    orphans = [
        d for d in (Path(root) / "_v").iterdir()
        if d.name.startswith(".staging-")
    ]
    assert len(orphans) == 2  # committed v1 + the crash residue
    vacuum_versions(root, keep=1)
    survivors = [
        d for d in (Path(root) / "_v").iterdir()
        if d.name.startswith(".staging-")
    ]
    assert len(survivors) == 1
    assert {r["k"] for r in read_versioned(spark, root).collect()} == {1}


def test_marker_entry_never_half_written(spark, tmp_path, monkeypatch):
    """The marker's pointer content must be complete BEFORE the entry
    name exists — assert the implementation publishes via link-from-
    temp, not open(entry)+write."""
    import etl_spark_spark.sinks.versioned as V

    seen = []
    real_link = os.link

    def spying_link(src, dst, **kw):
        # at link time the temp file already holds the full pointer
        seen.append(Path(src).read_text())
        return real_link(src, dst, **kw)

    monkeypatch.setattr(os, "link", spying_link)
    root = str(tmp_path / "halfw")
    write_version(spark, _df(spark, [(1, "a")]), root, layout="marker")
    assert len(seen) == 1
    assert seen[0].strip().startswith(".staging-")


def test_merge_into_versioned_over_marker_layout(spark, tmp_path, monkeypatch):
    """The full optimistic MERGE loop runs unchanged when the root only
    supports markers (simulated by making os.symlink fail, as an
    object-store mount would)."""
    import etl_spark_spark.sinks.versioned as V

    def no_symlink(*a, **k):
        raise OSError("symlinks not supported on this store")

    monkeypatch.setattr(os, "symlink", no_symlink)
    V._LAYOUT_CACHE.clear()
    root = str(tmp_path / "auto_marker")
    merge_into_versioned(spark, _df(spark, [(1, "a"), (2, "b")]), root, ["k"])
    merge_into_versioned(spark, _df(spark, [(2, "B"), (3, "c")]), root, ["k"])
    got = {r["k"]: r["v"] for r in read_versioned(spark, root).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # every committed entry is a marker file (auto-probe chose marker)
    vroot = Path(root) / "_v"
    entries = [p for p in vroot.iterdir() if p.name.startswith("v")]
    assert entries and all(p.is_file() and not p.is_symlink() for p in entries)
    V._LAYOUT_CACHE.clear()  # don't leak the probe result to other tests
