"""Snapshot-log table format: bucket-level copy-on-write SCD2 merge,
snapshot isolation, time travel, rollback, conflict detection, vacuum.

This is the executable half of the MERGE story (operators/scd.py's
scd2_merge_sql is the validated-text half — no Delta/Iceberg in the
sandbox): merges must be semantically identical to the oracle-checked
scd2_apply rebuild while rewriting ONLY the buckets the staging batch
touches.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from etl_pipline_ibrd_loan_system_spark.operators.scd import scd2_apply, scd2_init
from etl_pipline_ibrd_loan_system_spark.sources import snaptable


def _staging(spark, rows):
    return spark.createDataFrame(rows, "bk long, name string, city string")


LOAD1 = [(1, "alice", "lisbon"), (2, "bob", "porto"), (3, "carol", "braga")]
# load 2: bk1 T1 name change, bk2 T2 city change, bk4 new, bk3 untouched
LOAD2 = [(1, "alicia", "lisbon"), (2, "bob", "faro"), (4, "dan", "evora")]
# load 3: bk4 T2 change only
LOAD3 = [(4, "dan", "beja")]


def _make_table(spark, tmp_path, n_buckets=8):
    root = str(tmp_path / "dim_customer")
    init = scd2_init(
        _staging(spark, LOAD1), "bk", ["name", "city"],
        asof="2024-01-01", sk_strategy="hash",
    )
    snaptable.create(spark, root, init, "bk", n_buckets=n_buckets)
    return root, init


def _rows(df):
    return {
        (r.bk, r.name, r.city, str(r.start_date), str(r.end_date), r.is_current)
        for r in df.collect()
    }


def test_merge_matches_full_rebuild(spark, tmp_path):
    """Two successive merges produce EXACTLY the rows the oracle-checked
    full-table scd2_apply rebuild produces (same hash sk strategy)."""
    root, init = _make_table(spark, tmp_path)
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD3),
        t1_cols=["name"], t2_cols=["city"], asof="2024-03-01",
    )
    expected = scd2_apply(
        init, _staging(spark, LOAD2), "bk",
        t1_cols=["name"], t2_cols=["city"],
        asof="2024-02-01", sk_strategy="hash",
    )
    expected = scd2_apply(
        expected, _staging(spark, LOAD3), "bk",
        t1_cols=["name"], t2_cols=["city"],
        asof="2024-03-01", sk_strategy="hash",
    )
    assert _rows(snaptable.read(spark, root)) == _rows(expected)
    # SCD2 invariant survives the merge path: one current row per key
    cur = (
        snaptable.read(spark, root)
        .where("is_current")
        .groupBy("bk")
        .count()
        .where("count > 1")
        .count()
    )
    assert cur == 0


def test_merge_is_copy_on_write_at_bucket_level(spark, tmp_path):
    """Buckets untouched by the staging batch keep their file paths
    VERBATIM across the merge — the files were neither read back into
    the rewrite nor rewritten; touched buckets get fresh files."""
    root, _ = _make_table(spark, tmp_path)
    m1 = snaptable.read_manifest(root)
    m2 = snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD3).where("bk = 4"),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    touched = {str(b) for b in m2["touched_buckets"]}
    assert touched  # bk=4 hashes somewhere
    for b, files in m1["buckets"].items():
        if b not in touched:
            assert m2["buckets"][b] == files  # re-referenced, not rewritten
    for b in touched & set(m1["buckets"]):
        assert m2["buckets"][b] != m1["buckets"][b]
    # and merge read only the touched buckets' slice: rows of untouched
    # buckets still come from the ORIGINAL commit files on disk
    v2 = snaptable.read(spark, root)
    assert v2.where("bk = 3").count() == 1


def test_time_travel_rollback_and_reforge(spark, tmp_path):
    root, init = _make_table(spark, tmp_path)
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    assert snaptable.current_version(root) == 2
    # time travel: version 1 still reads as the initial load
    assert _rows(snaptable.read(spark, root, version=1)) == _rows(init)
    # rollback is a pointer flip; the abandoned v2 stays readable
    snaptable.rollback(root, 1)
    assert snaptable.current_version(root) == 1
    assert snaptable.read(spark, root).where("bk = 4").count() == 0
    # a new merge on top of the rollback takes a FRESH version slot
    m3 = snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD3),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-15",
    )
    assert m3["version"] == 3 and m3["parent"] == 1


def test_concurrent_commit_conflict(spark, tmp_path):
    root, _ = _make_table(spark, tmp_path)
    m = snaptable.read_manifest(root)
    winner = dict(m, version=2, parent=1)
    loser = dict(m, version=2, parent=1)
    snaptable._publish(root, winner)
    with pytest.raises(snaptable.ConflictError):
        snaptable._publish(root, loser)


def test_crash_before_publish_is_invisible_then_vacuumed(spark, tmp_path):
    """A writer that dies after writing data files but before publishing
    leaves readers on the old snapshot; vacuum collects the orphans."""
    root, _ = _make_table(spark, tmp_path)
    m = snaptable.read_manifest(root)
    # simulate the crash: data written for a would-be v2, no manifest
    snaptable._write_commit(
        spark, root, snaptable.read(spark, root), "bk", m["n_buckets"], 2
    )
    assert snaptable.current_version(root) == 1
    before = _rows(snaptable.read(spark, root))
    stats = snaptable.vacuum(spark, root, retain_last=2)
    assert stats["deleted_files"] > 0  # the orphan commit's files
    assert _rows(snaptable.read(spark, root)) == before


def test_vacuum_drops_history_beyond_retention(spark, tmp_path):
    root, _ = _make_table(spark, tmp_path)
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD3),
        t1_cols=["name"], t2_cols=["city"], asof="2024-03-01",
    )
    head = _rows(snaptable.read(spark, root))
    stats = snaptable.vacuum(spark, root, retain_last=2)
    assert stats["retained_versions"] == [2, 3]
    # v1's exclusive files are gone along with its manifest
    with pytest.raises(FileNotFoundError):
        snaptable.read_manifest(root, 1)
    # retained snapshots unaffected
    assert _rows(snaptable.read(spark, root)) == head
    assert snaptable.read(spark, root, version=2).count() > 0


def test_create_twice_refuses(spark, tmp_path):
    root, _ = _make_table(spark, tmp_path)
    with pytest.raises(FileExistsError):
        snaptable.create(
            spark, root,
            scd2_init(_staging(spark, LOAD1), "bk", ["name", "city"],
                      asof="2024-01-01", sk_strategy="hash"),
            "bk",
        )


def test_changes_feed_tracks_merge_change_mass(spark, tmp_path):
    """CDF read between v1 and v2: exactly the rows the merge touched —
    the closed bk2 slice shows 'changed' (end_date/is_current flipped),
    the fresh bk1-T1 overwrite shows 'changed' (name), the new bk2
    version and the brand-new bk4 show 'added'; untouched bk3 is absent."""
    root, _ = _make_table(spark, tmp_path)
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    delta = snaptable.changes(spark, root, 1, 2)
    rows = delta.collect()
    by_bk = {}
    for r in rows:
        by_bk.setdefault(r.bk, []).append(r)
    assert 3 not in by_bk  # untouched key: no delta row
    kinds = sorted((r.bk, r.change_kind) for r in rows)
    assert (4, "added") in kinds           # brand-new key
    assert (2, "added") in kinds           # fresh T2 version (new sk)
    assert (2, "changed") in kinds         # old slice closed
    assert (1, "changed") in kinds         # T1 overwrite in place
    # the closed slice's changed columns are the SCD bookkeeping ones
    closed = [r for r in rows if r.bk == 2 and r.change_kind == "changed"][0]
    assert set(closed.changed_cols.split(",")) == {"end_date", "is_current"}


def test_changes_feed_round_trips(spark, tmp_path):
    from etl_pipline_ibrd_loan_system_spark.operators.reconcile import (
        apply_snapshot_diff,
    )

    root, _ = _make_table(spark, tmp_path)
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    old = snaptable.read(spark, root, version=1)
    new = snaptable.read(spark, root, version=2)
    delta = snaptable.changes(spark, root, 1, 2, include_values=True)
    compare = [c for c in new.columns if c not in ("bk", "sk")]
    rebuilt = apply_snapshot_diff(old, delta, ["bk", "sk"], compare)
    assert _rows(rebuilt) == _rows(new)


def test_streaming_sink_exactly_once_effect(spark, tmp_path):
    """The foreachBatch sink folds each epoch exactly once: re-delivered
    epochs publish nothing, out-of-order re-delivery after later epochs
    publishes nothing, and a fresh epoch advances both the table and the
    watermark atomically."""
    root, _ = _make_table(spark, tmp_path)
    sink = snaptable.scd2_merge_sink(
        spark, root, t1_cols=["name"], t2_cols=["city"],
    )
    assert sink(_staging(spark, LOAD2), 0) is True
    v_after_0 = snaptable.current_version(root)
    state_after_0 = _rows(snaptable.read(spark, root))
    # crash-replay: Spark re-delivers epoch 0
    assert sink(_staging(spark, LOAD2), 0) is False
    assert snaptable.current_version(root) == v_after_0
    assert _rows(snaptable.read(spark, root)) == state_after_0
    # next epoch merges with a later effective date
    assert sink(_staging(spark, LOAD3), 1) is True
    m = snaptable.read_manifest(root)
    assert m["sink_epoch"] == 1
    assert snaptable.read(spark, root).where(
        "bk = 4 and is_current"
    ).first().city == "beja"
    # stale re-delivery of an OLD epoch after newer ones: no-op
    assert sink(_staging(spark, LOAD2), 0) is False
    assert snaptable.read_manifest(root)["sink_epoch"] == 1


def test_streaming_sink_replay_is_semantically_idempotent(spark, tmp_path):
    """Even if the epoch watermark were lost (the pre-publish crash
    window), re-merging the same batch with the same effective date
    yields an identical table: every staged row classifies as unchanged.
    This is the backstop behind the exactly-once claim."""
    root, _ = _make_table(spark, tmp_path)
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    once = _rows(snaptable.read(spark, root))
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    assert _rows(snaptable.read(spark, root)) == once


def test_lookup_reads_only_the_keys_buckets(spark, tmp_path):
    root, _ = _make_table(spark, tmp_path)
    got = snaptable.lookup(spark, root, [2]).collect()
    assert [r.bk for r in got] == [2]
    # IO proof: the slice behind a 1-key lookup is a strict subset of
    # the table's buckets (file pruning, not post-scan filtering)
    m = snaptable.read_manifest(root)
    kdf = spark.createDataFrame([(2,)], "bk long")
    b = [
        r["__b"]
        for r in kdf.select(
            snaptable._bucket_col("bk", m["n_buckets"]).alias("__b")
        ).collect()
    ]
    files_read = [p for bb in b for p in m["buckets"].get(str(bb), [])]
    all_files = [p for fl in m["buckets"].values() for p in fl]
    assert 0 < len(files_read) < len(all_files)


def test_rebucket_preserves_rows_and_evolves_spec(spark, tmp_path):
    root, _ = _make_table(spark, tmp_path, n_buckets=2)
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD2),
        t1_cols=["name"], t2_cols=["city"], asof="2024-02-01",
    )
    before = _rows(snaptable.read(spark, root))
    pre_version = snaptable.current_version(root)

    m = snaptable.rebucket(spark, root, 16)
    assert m["n_buckets"] == 16 and m["rebucketed_from"] == 2
    # snapshot is row-identical under the new layout
    assert _rows(snaptable.read(spark, root)) == before
    # time travel to the pre-rebucket version still reads the OLD layout
    assert _rows(snaptable.read(spark, root, version=pre_version)) == before

    # subsequent merges pick the new spec up FROM THE MANIFEST and
    # produce the same rows a full rebuild would
    snaptable.scd2_merge(
        spark, root, _staging(spark, LOAD3),
        t1_cols=["name"], t2_cols=["city"], asof="2024-03-01",
    )
    m2 = snaptable.read_manifest(root)
    assert m2["n_buckets"] == 16
    dim0 = scd2_init(
        _staging(spark, LOAD1), "bk", ["name", "city"],
        asof="2024-01-01", sk_strategy="hash",
    )
    dim1 = scd2_apply(
        dim0, _staging(spark, LOAD2), "bk", t1_cols=["name"],
        t2_cols=["city"], asof="2024-02-01", sk_strategy="hash",
    )
    dim2 = scd2_apply(
        dim1, _staging(spark, LOAD3), "bk", t1_cols=["name"],
        t2_cols=["city"], asof="2024-03-01", sk_strategy="hash",
    )
    assert _rows(snaptable.read(spark, root)) == _rows(dim2)


def test_rebucket_same_count_is_noop(spark, tmp_path):
    root, _ = _make_table(spark, tmp_path, n_buckets=4)
    v = snaptable.current_version(root)
    m = snaptable.rebucket(spark, root, 4)
    assert m["version"] == v  # no new commit published
