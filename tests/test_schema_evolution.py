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

import pandas as pd
import pytest

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
