"""Schema evolution on SnapshotTable (Iceberg metadata-only evolution).

The hole this closes: without a tracked schema, ``spark.read.parquet`` on a
mixed-schema file set takes whichever footer it samples — a snapshot
appended with a NEW column silently loses it (or nondeterministically keeps
it) on read. With tracking: the manifest records a schema history, every
snapshot pins the schema id it wrote under, appends are validated at write
time (drifted data is an error, evolution is an explicit metadata op),
reads apply the schema AS OF the requested snapshot so old files surface
added columns as NULL and time travel sees the historical shape, and the
resurrection hazard of by-name parquet resolution (re-adding a dropped
name) is refused outright — the hazard Iceberg's field ids exist to solve.
"""

from __future__ import annotations

import datetime as dt
import json
from pathlib import Path

import pandas as pd
import pytest

REPO = str(Path(__file__).resolve().parent.parent)

from access_log_aggregator_spark.sources.tableio import (
    SchemaMismatch,
    SnapshotTable,
)

UTC = dt.timezone.utc


def _t(tmp_path, name="t") -> SnapshotTable:
    t = SnapshotTable.create(tmp_path / name)
    t.append_pandas(pd.DataFrame({"url": ["a", "b"], "n": [1, 2]}))
    return t


def test_first_append_adopts_schema(tmp_path):
    t = _t(tmp_path)
    st = t.table_schema()
    assert [f.name for f in st.fields] == ["url", "n"]
    assert t.snapshots()[0].schema_id == 1


def test_drifted_append_is_rejected_not_silently_lost(spark, tmp_path):
    """The exact failure mode being closed: an extra column used to commit
    fine and then VANISH on read (footer sampling). Now it is a write-time
    error on every append path, naming the evolution op to use."""
    t = _t(tmp_path)
    with pytest.raises(SchemaMismatch, match="add_column"):
        t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3],
                                      "lang": ["en"]}))
    with pytest.raises(SchemaMismatch, match="add_column"):
        t.append_spark(spark.createDataFrame(
            pd.DataFrame({"url": ["c"], "n": [3], "lang": ["en"]})))
    # type drift is rejected too
    with pytest.raises(SchemaMismatch, match="table schema"):
        t.append_pandas(pd.DataFrame({"url": ["c"], "n": ["not-an-int"]}))
    # nothing half-committed, no leaked files
    assert t.row_count() == 2
    assert len(t.data_files()) == 1
    assert len(list((t.root / "data").glob("*.parquet"))) == 1


def test_add_column_is_metadata_only_and_old_rows_read_null(spark, tmp_path):
    t = _t(tmp_path)
    files_before = set((t.root / "data").glob("*.parquet"))
    t.add_column("lang", "string")
    assert set((t.root / "data").glob("*.parquet")) == files_before  # no rewrite
    t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3], "lang": ["en"]}))
    rows = {r.url: (r.n, r.lang) for r in t.read(spark).collect()}
    assert rows == {"a": (1, None), "b": (2, None), "c": (3, "en")}
    # deterministic read schema regardless of footer sampling order
    assert [f.name for f in t.read(spark).schema.fields] == ["url", "n", "lang"]


def test_append_may_omit_nullable_columns(spark, tmp_path):
    """Writing a frame WITHOUT a tracked column is fine (reads fill NULL)
    — the same contract as files that predate an add_column."""
    t = _t(tmp_path)
    t.add_column("lang", "string")
    t.append_pandas(pd.DataFrame({"url": ["d"], "n": [4]}))  # no lang
    rows = {r.url: r.lang for r in t.read(spark).collect()}
    assert rows["d"] is None


def test_time_travel_reads_the_snapshot_schema(spark, tmp_path):
    t = _t(tmp_path)
    s1 = t.current_snapshot_id()
    t.add_column("lang", "string")
    t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3], "lang": ["en"]}))
    # as of s1 the table had no lang — the metadata-only change between
    # snapshots must not rewrite what the earlier snapshot's read sees
    old = t.read(spark, end=s1)
    assert [f.name for f in old.schema.fields] == ["url", "n"]
    assert old.count() == 2
    new = t.read(spark)
    assert [f.name for f in new.schema.fields] == ["url", "n", "lang"]


def test_drop_column_hides_but_preserves_history(spark, tmp_path):
    t = _t(tmp_path)
    s1 = t.current_snapshot_id()
    t.drop_column("n")
    t.append_pandas(pd.DataFrame({"url": ["c"]}))
    cur = t.read(spark)
    assert [f.name for f in cur.schema.fields] == ["url"]
    assert cur.count() == 3
    # files were not rewritten: time travel still reads the dropped column
    old = t.read(spark, end=s1)
    assert {r.n for r in old.collect()} == {1, 2}
    # by-name resolution would resurrect the old values: refuse reuse
    with pytest.raises(SchemaMismatch, match="resurrect"):
        t.add_column("n", "bigint")
    t.add_column("n2", "bigint")  # a fresh name is free


def test_evolution_guards(tmp_path):
    t = _t(tmp_path)
    with pytest.raises(SchemaMismatch, match="already exists"):
        t.add_column("url", "string")
    with pytest.raises(SchemaMismatch, match="no column"):
        t.drop_column("nope")
    t.drop_column("n")
    with pytest.raises(SchemaMismatch, match="last column"):
        t.drop_column("url")
    empty = SnapshotTable.create(tmp_path / "empty")
    with pytest.raises(RuntimeError, match="append data first"):
        empty.add_column("x", "int")


def test_add_files_validates_against_table_schema(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = _t(tmp_path)
    drifted = tmp_path / "drifted.parquet"
    pq.write_table(pa.table({"url": ["z"], "n": pa.array([9]),
                             "extra": [1.5]}), drifted)
    with pytest.raises(SchemaMismatch, match="add_column"):
        t.add_files([drifted])
    assert len(list((t.root / "data").glob("*.parquet"))) == 1  # no leak
    ok = tmp_path / "ok.parquet"
    pq.write_table(pa.table({"url": ["z"], "n": pa.array([9])}), ok)
    t.add_files([ok])
    assert t.row_count() == 3


def test_pruning_skips_files_that_predate_the_column(spark, tmp_path):
    """A file written before add_column(c) physically lacks c: every row
    reads back NULL for it, so any comparison predicate on c provably
    excludes the file — the planner skips it without any new stats."""
    t = _t(tmp_path)
    t.add_column("score", "double")
    t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3], "score": [0.5]}))
    planned = t.data_files(where=[("score", ">=", 0.0)])
    assert len(planned) == 1  # the pre-evolution file is pruned
    got = t.read(spark, where=[("score", ">=", 0.0)]).collect()
    full = t.read(spark).filter("score >= 0.0").collect()
    assert got == full and len(got) == 1


def test_legacy_manifest_stays_untracked(spark, tmp_path):
    """Manifests written before schema tracking (no "schemas" key but
    existing snapshots) keep today's behavior: no validation, no explicit
    read schema — nothing about an already-deployed table changes."""
    t = _t(tmp_path)
    mpath = t.root / "manifest.json"
    m = json.loads(mpath.read_text())
    m.pop("schemas"), m.pop("current_schema_id")
    m["snapshots"][0].pop("schema_id")
    mpath.write_text(json.dumps(m))
    assert t.table_schema() is None
    # drifted appends are accepted (legacy semantics), commit untracked
    t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3], "lang": ["en"]}))
    assert t.table_schema() is None
    assert t.read(spark).count() == 3
    with pytest.raises(RuntimeError, match="append data first"):
        t.add_column("x", "int")


def test_compaction_spans_schema_versions(spark, tmp_path):
    """compact() merges pre- and post-evolution small files (arrow promotes
    missing columns to null) and the replace output reads correctly under
    the current schema."""
    t = _t(tmp_path)
    t.add_column("lang", "string")
    t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3], "lang": ["en"]}))
    before = {(r.url, r.n, r.lang) for r in t.read(spark).collect()}
    assert t.compact(rows_per_file=1000) is not None
    after = {(r.url, r.n, r.lang) for r in t.read(spark).collect()}
    assert after == before
    assert t.row_count() == 3


def test_truncate_voids_schema_history(tmp_path):
    t = _t(tmp_path)
    t.truncate()
    assert t.table_schema() is None
    # the rebuild may adopt a different shape — that's the point
    t.append_pandas(pd.DataFrame({"k": ["x"], "v": [1.0]}))
    assert [f.name for f in t.table_schema().fields] == ["k", "v"]


def test_compact_and_expire_preserve_the_tracked_schema(spark, tmp_path):
    """The replace snapshot commits under the current schema id, so after
    expire_snapshots leaves the base as the only snapshot the table is
    still schema-tracked: without this, read(end=live_base_id()) — the
    exact shape the checkpoint rebuild path runs post-expire — fell back
    to footer-sampled reads and resurrected dropped columns."""
    t = _t(tmp_path)
    t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3]}))
    t.drop_column("n")
    assert t.compact(rows_per_file=1000) is not None
    t.expire_snapshots(force=True)
    base = t.live_base_id()
    assert t.table_schema(end=base) is not None
    df = t.read(spark, end=base)
    assert [f.name for f in df.schema.fields] == ["url"]  # n stays dropped
    assert df.count() == 3
    # unknown-column predicates still raise (not silently fail open)
    with pytest.raises(ValueError, match="nope"):
        t.data_files(where=[("nope", "=", 1)], end=base)


def test_evolution_works_without_a_spark_session(tmp_path):
    """Metadata-only evolution must not need a JVM: a sessionless
    maintenance process (or a test run in isolation) calls add_column /
    drop_column with atomic DDL types parsed locally."""
    import subprocess
    import sys
    import textwrap

    code = textwrap.dedent("""
        import sys, pandas as pd
        sys.path.insert(0, %r)
        from pyspark.sql import SparkSession
        assert SparkSession.getActiveSession() is None
        from access_log_aggregator_spark.sources.tableio import SnapshotTable
        import pathlib, tempfile
        d = pathlib.Path(tempfile.mkdtemp())
        t = SnapshotTable.create(d / "t")
        t.append_pandas(pd.DataFrame({"url": ["a"], "n": [1]}))
        t.add_column("score", "double")
        t.add_column("ts2", "timestamp")
        t.drop_column("n")
        names = [f.name for f in t.table_schema().fields]
        assert names == ["url", "score", "ts2"], names
        assert SparkSession.getActiveSession() is None  # still no JVM
        print("OK")
    """) % str(REPO)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_unconvertible_arrow_types_fail_closed_on_tracked_tables(tmp_path):
    """A frame containing an arrow type outside the Spark mapping cannot
    be validated — on a tracked table it must be REFUSED, not silently
    committed untracked (the tracked read schema would choke on it at
    scan time with no SchemaMismatch ever raised)."""
    import datetime as dtm

    import pyarrow as pa
    import pyarrow.parquet as pq

    from access_log_aggregator_spark.sources.tableio import (
        _spark_schema_of_arrow,
    )

    exotic = pa.schema([("url", pa.string()), ("t", pa.time32("s"))])
    assert _spark_schema_of_arrow(exotic) is None  # premise of the test
    t = _t(tmp_path)
    pdf = pd.DataFrame({"url": ["x"], "t": [dtm.time(1, 2, 3)]})
    with pytest.raises(SchemaMismatch, match="arrow types outside"):
        t.append_pandas(pdf, schema=exotic)
    exotic_file = tmp_path / "exotic.parquet"
    pq.write_table(pa.Table.from_pandas(pdf, schema=exotic,
                                        preserve_index=False), exotic_file)
    with pytest.raises(SchemaMismatch, match="arrow types outside"):
        t.add_files([exotic_file])
    assert t.row_count() == 2
    assert len(list((t.root / "data").glob("*.parquet"))) == 1  # no leak
    # an UNTRACKED table still accepts it (legacy fail-open, reads sample)
    u = SnapshotTable.create(tmp_path / "untracked")
    u.append_pandas(pdf, schema=exotic)
    assert u.table_schema() is None
    assert u.row_count() == 1


def test_compact_sort_by_typo_raises_even_when_already_compact(tmp_path):
    """On a tracked table the sort column is validated against the table
    schema UPFRONT — a typo raises on every run, not only on runs that
    happen to find >= 2 small files to merge."""
    t = _t(tmp_path)
    assert t.compact(rows_per_file=1) is None  # nothing mergeable
    with pytest.raises(ValueError, match="warcts"):
        t.compact(rows_per_file=1, sort_by=["warcts"])


def test_compact_sorts_across_schema_versions(spark, tmp_path):
    """sort_by an evolved column: groups whose files all predate the
    column are all-null for it (any order is sorted); mixed groups sort
    with nulls placed deterministically."""
    t = _t(tmp_path)
    t.add_column("score", "double")
    t.append_pandas(pd.DataFrame({"url": ["c"], "n": [3], "score": [1.5]}))
    before = {(r.url, r.n, r.score) for r in t.read(spark).collect()}
    assert t.compact(rows_per_file=1000, sort_by=["score"]) is not None
    assert {(r.url, r.n, r.score)
            for r in t.read(spark).collect()} == before


def test_racing_first_appends_validate_under_the_lock(tmp_path):
    """The pre-check runs outside the lock; the in-lock re-check must
    catch a schema adopted between pre-check and commit."""
    t = SnapshotTable.create(tmp_path / "t")
    # simulate the race: bypass the precheck by calling _commit_files the
    # way a second writer would after losing the init race
    t.append_pandas(pd.DataFrame({"url": ["a"], "n": [1]}))
    import pyarrow as pa
    import pyarrow.parquet as pq

    from access_log_aggregator_spark.sources import filestats
    from access_log_aggregator_spark.sources.tableio import (
        _spark_schema_of_arrow,
    )

    rogue = t.root / "data" / "part-rogue.parquet"
    tbl = pa.table({"url": ["b"], "other": [2.0]})
    pq.write_table(tbl, rogue)
    with pytest.raises(SchemaMismatch):
        t._commit_files([rogue], 1, None,
                        stats={str(rogue):
                               filestats.stats_from_footer(str(rogue))},
                        schema=_spark_schema_of_arrow(tbl.schema))
    assert not rogue.exists()  # in-lock rejection reclaims the staged file
    assert t.row_count() == 1
