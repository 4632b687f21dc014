"""Streaming mode produces the same sinks/aggregates as batch mode."""

from __future__ import annotations

import pytest

from access_log_aggregator_spark.plans.pipeline import Pipeline
from access_log_aggregator_spark.sources.tableio import SnapshotTable
from access_log_aggregator_spark.streaming.stream import run_streaming


@pytest.fixture(scope="module")
def stream_run(spark, corpus, lookup_sdf, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    n = len(corpus.pages)
    step = (n + 2) // 3
    for lo in range(0, n, step):
        pages_table.append_pandas(corpus.pages.iloc[lo: lo + step])
    pipe = Pipeline(spark, root / "out", lookup_sdf)
    processed = run_streaming(spark, pages_table, pipe, root / "stream_ckpt")
    return pipe, pages_table, root, processed


def test_stream_drains_everything(stream_run, corpus):
    pipe, _, _, processed = stream_run
    assert len(processed) >= 1
    assert pipe.routed().count() == len(corpus.pages)


def test_stream_sink_counts_match_oracle(stream_run, corpus):
    pipe, _, _, _ = stream_run
    for cls, want in corpus.golden_counts.items():
        assert pipe.sink(cls).count() == want, cls


def test_stream_agg_matches_oracle(stream_run, corpus):
    pipe, _, _, _ = stream_run
    rows = pipe.agg_by_host().collect()
    golden = corpus.golden.rows()
    assert [r["host"] for r in rows] == [g[0] for g in golden]
    for r, g in zip(rows, golden):
        assert (r["total_requests"], r["requests_2xx"]) == (g[1], g[2])


def test_stream_restart_is_noop(stream_run, spark, lookup_sdf, corpus):
    """AvailableNow restart with same checkpoint: nothing new to process."""
    pipe, pages_table, root, _ = stream_run
    before = pipe.routed().count()
    run_streaming(spark, pages_table, pipe, root / "stream_ckpt")
    assert pipe.routed().count() == before


def test_stream_reports_per_run_counts(stream_run, spark, corpus):
    """run_streaming returns per-batch BatchResults for THIS run, so CLI
    totals are per-invocation (same contract as batch mode) — a second
    idle run reports zero, not the routed table's all-time totals."""
    pipe, pages_table, root, processed = stream_run
    assert sum(r.rows_in for r in processed) == len(corpus.pages)
    total = {}
    for r in processed:
        for k, v in r.sink_counts.items():
            total[k] = total.get(k, 0) + v
    assert {k: v for k, v in total.items() if v} == {
        k: v for k, v in corpus.golden_counts.items() if v}
    again = run_streaming(spark, pages_table, pipe, root / "stream_ckpt")
    assert sum(r.rows_in for r in again) == 0


def test_watermarked_window_agg_handles_late_data(spark, lookup_sdf, tmp_path_factory):
    """Event-time windowed aggregate under a watermark: out-of-order
    batches (hour-9 events arriving AFTER hour-11 events) still produce
    exactly the batch answer for every window the watermark has closed —
    append-mode emits each window once, when it is final."""
    import time as _time

    from datetime import datetime, timezone

    import pandas as pd

    from access_log_aggregator_spark.streaming.stream import run_windowed_stream

    def page(i, host, hh, mm=0):
        t = f"2025-03-01T{hh:02d}:{mm:02d}:00Z"
        line = ('{"time":"%s","host":"%s","status_code":200,"duration":0.5}'
                % (t, host))
        return {
            "url": f"https://{host}/p/{i}",
            "warc_ts": datetime(2025, 3, 1, hh, tzinfo=timezone.utc).replace(tzinfo=None),
            "html": b"<html>ok</html>",
            "text": f"words words\n{line}\nmore words",
            "lang": "en",
        }

    root = tmp_path_factory.mktemp("wm")
    table = SnapshotTable.create(root / "pages", "pages")
    batches = [
        # batch 1: hours 10 and 11
        [page(0, "chatgpt.com", 10), page(1, "chatgpt.com", 10, 30),
         page(2, "bard.com", 11)],
        # batch 2: hour 9 — OUT OF ORDER, within the 2h watermark
        [page(3, "chatgpt.com", 9), page(4, "bard.com", 9, 15)],
        # batches 3+4: sentinel far-future events advance the watermark past
        # every real window, then give the engine a batch in which to emit
        [page(5, "grok.com", 20)],
        [page(6, "grok.com", 20, 30)],
    ]
    for k, rows in enumerate(batches):
        pdf = pd.DataFrame(rows)
        pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
        table.append_pandas(pdf, marker=f"wm-{k}")
        _time.sleep(0.1)  # distinct file mtimes -> deterministic batch order

    name = run_windowed_stream(spark, table, lookup_sdf, root / "ckpt",
                               query_name="wm_hits", watermark="2 hours")
    got = {
        (r["window_start"].hour, r["host"]): r["hits"]
        for r in spark.table(name).collect()
        if r["host"] != "grok.com"  # sentinel windows are still open
    }
    assert got == {
        (9, "chatgpt.com"): 1, (9, "bard.com"): 1,
        (10, "chatgpt.com"): 2, (11, "bard.com"): 1,
    }


def test_streaming_dedup_drops_recrawls(spark, tmp_path_factory):
    """Cross-batch exact dedup with bounded state: re-crawled urls arriving
    in LATER micro-batches are dropped; each url survives exactly once."""
    import time as _time

    from datetime import datetime

    import pandas as pd

    from access_log_aggregator_spark.streaming.stream import run_dedup_stream

    def rows(urls, day):
        return pd.DataFrame([
            {"url": u, "warc_ts": datetime(2025, 4, day, 12), "html": b"<x>",
             "text": "words", "lang": "en"} for u in urls
        ]).astype({"warc_ts": "datetime64[us]"})

    root = tmp_path_factory.mktemp("ddstream")
    table = SnapshotTable.create(root / "pages", "pages")
    table.append_pandas(rows(["u1", "u2", "u3"], 1), marker="b0")
    _time.sleep(0.1)
    table.append_pandas(rows(["u2", "u3", "u4"], 1), marker="b1")  # re-crawls
    _time.sleep(0.1)
    table.append_pandas(rows(["u1", "u5"], 1), marker="b2")        # re-crawl

    name = run_dedup_stream(spark, table, root / "ckpt", query_name="dd_pages")
    got = sorted(r["url"] for r in spark.table(name).collect())
    assert got == ["u1", "u2", "u3", "u4", "u5"]


def test_live_trigger_processes_and_drains(spark, corpus, lookup_sdf, tmp_path_factory):
    """processingTime mode (the -interval ticker): batches fire on the
    trigger, new snapshots are picked up while running, and stop() drains
    the in-flight batch (aggregate.go:28-41 analog)."""
    import time

    from access_log_aggregator_spark.streaming.stream import start_live_stream

    root = tmp_path_factory.mktemp("live")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    pages_table.append_pandas(corpus.pages.iloc[:300])
    pipe = Pipeline(spark, root / "out", lookup_sdf)

    q, processed = start_live_stream(
        spark, pages_table, pipe, root / "ckpt", processing_time="1 second"
    )
    try:
        deadline = time.time() + 60
        while not processed and time.time() < deadline:
            time.sleep(0.5)
        assert processed, "first tick never fired"
        pages_table.append_pandas(corpus.pages.iloc[300:500])  # arrives mid-run
        while (pipe.routed() is None or pipe.routed().count() < 500) \
                and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    assert pipe.routed().count() == 500  # everything enqueued was counted


def test_stateful_cumulative_summaries(spark, corpus, tmp_path_factory):
    """applyInPandasWithState fold == the oracle's cumulative summary.

    3 input files with maxFilesPerTrigger=1 force multiple micro-batches, so
    the GroupState genuinely carries accumulators across batches (the
    reference's cumulative-since-start semantics, summaries.go:13-27)."""
    from access_log_aggregator_spark.streaming.stateful import run_stateful_summary

    root = tmp_path_factory.mktemp("stateful")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    n = len(corpus.pages)
    step = (n + 2) // 3
    for lo in range(0, n, step):
        pages_table.append_pandas(corpus.pages.iloc[lo: lo + step])

    run_stateful_summary(
        spark, pages_table, str(root / "ckpt"),
        query_name="t_host_summaries",
    )
    emitted = spark.sql("select * from t_host_summaries").collect()
    assert len(emitted) > len(corpus.golden.by_host)  # >1 emission per host
    final: dict[str, tuple] = {}
    for r in emitted:  # cumulative totals are monotone -> max is the final
        cur = final.get(r["host"])
        if cur is None or r["total_requests"] > cur[0]:
            final[r["host"]] = (
                r["total_requests"], r["requests_2xx"],
                r["non_2xx_requests"], r["sum_duration_s"],
            )
    assert set(final) == set(corpus.golden.by_host)
    for host, s in corpus.golden.by_host.items():
        tot, n2xx, non2xx, dur = final[host]
        assert (tot, n2xx) == (s.request_total, s.request_2xx)
        assert non2xx == s.request_total - s.request_2xx
        assert dur == pytest.approx(s.duration_total, abs=1e-9)


def test_stateful_stream_after_compaction_not_double_fed(
    spark, corpus, tmp_path_factory
):
    """A stateful stream started AFTER a compaction sees every row exactly
    once: compact-* files land in the same data/ directory as the part-*
    appends, and a source without the STREAM_GLOB filter would ingest every
    merged row twice (once per file family). Also pins that the stateful
    runner registers its checkpoint so expiry cannot unlink its inputs."""
    from access_log_aggregator_spark.streaming.stateful import run_stateful_summary

    root = tmp_path_factory.mktemp("statefulcompact")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    half = len(corpus.pages) // 2
    pages_table.append_pandas(corpus.pages.iloc[:half])
    pages_table.append_pandas(corpus.pages.iloc[half:])
    assert pages_table.compact() is not None  # compact-* now beside part-*

    run_stateful_summary(
        spark, pages_table, str(root / "ckpt"),
        query_name="t_host_summaries_compact", max_files_per_trigger=4,
    )
    emitted = spark.sql("select * from t_host_summaries_compact").collect()
    final: dict[str, int] = {}
    for r in emitted:  # cumulative -> max total per host is the final state
        final[r["host"]] = max(final.get(r["host"], 0), r["total_requests"])
    assert final == {
        h: s.request_total for h, s in corpus.golden.by_host.items()
    }
    # the checkpoint is registered: expiry must refuse to drop part-* files
    with pytest.raises(RuntimeError, match="refusing to expire"):
        pages_table.expire_snapshots()


def test_stream_picks_up_new_snapshot(stream_run, spark, corpus):
    """Appending a new snapshot then re-triggering processes ONLY it."""
    pipe, pages_table, root, _ = stream_run
    before = pipe.routed().count()
    extra = corpus.pages.iloc[:100].copy()
    extra["url"] = extra["url"] + "&rerun=1"  # distinct urls
    pages_table.append_pandas(extra)
    run_streaming(spark, pages_table, pipe, root / "stream_ckpt")
    assert pipe.routed().count() == before + 100


def test_stream_ignores_compaction_outputs(spark, corpus, lookup_sdf,
                                           tmp_path_factory):
    """Compaction and directory streams compose: the stream globs only
    part-* files, compaction writes compact-* — so (a) a stream with an
    existing checkpoint does not re-ingest merged rows after a compaction,
    and (b) a FRESH stream started after the compaction still ingests each
    row exactly once (the r2 ADVICE double-ingest scenario)."""
    root = tmp_path_factory.mktemp("stream_compact")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    n = len(corpus.pages)
    step = (n + 3) // 4
    for lo in range(0, n, step):
        pages_table.append_pandas(corpus.pages.iloc[lo: lo + step])

    pipe = Pipeline(spark, root / "out", lookup_sdf)
    run_streaming(spark, pages_table, pipe, root / "ckpt_a")
    assert pipe.routed().count() == n

    with pytest.warns(UserWarning, match="expire_snapshots"):
        sid = pages_table.compact(rows_per_file=10 ** 6)
    assert sid is not None

    # (a) same checkpoint, after compaction: nothing new
    run_streaming(spark, pages_table, pipe, root / "ckpt_a")
    assert pipe.routed().count() == n

    # (b) fresh checkpoint, after compaction: each row exactly once
    pipe2 = Pipeline(spark, root / "out2", lookup_sdf)
    run_streaming(spark, pages_table, pipe2, root / "ckpt_b")
    assert pipe2.routed().count() == n


def test_fresh_checkpoint_refuses_sink_with_foreign_stream_markers(
        spark, corpus, lookup_sdf, tmp_path_factory):
    """A FRESH stream checkpoint restarts micro-batch ids at 0, so over a
    sink another checkpoint already committed to, its batches would
    collide with the existing stream-N markers and be silently dropped
    as duplicates — the run must refuse up front instead. Resuming the
    original checkpoint stays allowed."""
    root = tmp_path_factory.mktemp("foreign_stream")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    pages_table.append_pandas(corpus.pages.iloc[:100])
    pipe = Pipeline(spark, root / "out", lookup_sdf)
    run_streaming(spark, pages_table, pipe, root / "ckpt_a")
    n = pipe.routed().count()
    assert n == 100

    with pytest.raises(RuntimeError, match="another stream checkpoint"):
        run_streaming(spark, pages_table, pipe, root / "ckpt_b")
    assert pipe.routed().count() == n  # nothing routed, nothing dropped

    # a bare offsets/ dir (crash before offset 0 was committed) is still
    # FRESH — it restarts at batch id 0, so it must refuse too, not slip
    # through as a "resume"
    (root / "ckpt_c" / "offsets").mkdir(parents=True)
    with pytest.raises(RuntimeError, match="another stream checkpoint"):
        run_streaming(spark, pages_table, pipe, root / "ckpt_c")
    assert pipe.routed().count() == n

    # ... and so is one holding only HDFSMetadataLog litter — a CRC
    # sidecar and an in-flight .<id>.<uuid>.tmp from a crash mid-write of
    # offset 0: no offset COMMITTED means the restart is still batch id 0
    d = root / "ckpt_d" / "offsets"
    d.mkdir(parents=True)
    (d / "..0.crc").write_bytes(b"")
    (d / ".0.deadbeef.tmp").write_bytes(b"")
    with pytest.raises(RuntimeError, match="another stream checkpoint"):
        run_streaming(spark, pages_table, pipe, root / "ckpt_d")
    assert pipe.routed().count() == n

    # the ORIGINAL checkpoint resumes fine (not fresh: offsets exist)
    assert run_streaming(spark, pages_table, pipe, root / "ckpt_a") == []
    assert pipe.routed().count() == n


def test_memory_sink_demo_streams_are_one_shot_and_retire_markers(
        spark, corpus, lookup_sdf, tmp_path_factory):
    """The in-memory demo streams cannot recover from an existing
    checkpoint (Spark restriction for append-mode memory sinks): they
    retire their stream marker after the drain — a one-shot demo must
    not block expire_snapshots forever — and refuse checkpoint reuse
    with guidance instead of crashing inside startQuery."""
    from access_log_aggregator_spark.streaming.stream import (
        run_windowed_stream,
    )

    root = tmp_path_factory.mktemp("memsink")
    t = SnapshotTable.create(root / "pages", "pages")
    t.append_pandas(corpus.pages.iloc[:50])
    run_windowed_stream(spark, t, lookup_sdf, root / "ckpt",
                        query_name="windowed_hits_oneshot")
    assert t.stream_markers() == []  # marker retired after the drain
    with pytest.raises(ValueError, match="one-shot"):
        run_windowed_stream(spark, t, lookup_sdf, root / "ckpt",
                            query_name="windowed_hits_oneshot")

    # a FAILED demo run retires its marker too: the checkpoint can never
    # be resumed either way (memory sink), so a leaked marker would block
    # expire_snapshots forever
    with pytest.raises(Exception, match="(?i)interval|bogus"):
        run_windowed_stream(spark, t, lookup_sdf, root / "ckpt_fail",
                            duration="bogus",
                            query_name="windowed_hits_fail")
    assert t.stream_markers() == []

    # a failure INSIDE _page_stream but AFTER register_stream retires the
    # marker too (the registration is the first thing _page_stream does):
    # escalate its fresh-checkpoint-past-floor warning to an error
    t.append_pandas(corpus.pages.iloc[50:100])  # 2 appends: compactable
    t.compact(rows_per_file=10 ** 6)
    t.expire_snapshots()
    assert t.stream_floor() is not None
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        with pytest.raises(UserWarning, match="FRESH stream checkpoint"):
            run_windowed_stream(spark, t, lookup_sdf, root / "ckpt_floor",
                                query_name="windowed_hits_floor")
    assert t.stream_markers() == []

    # a bare offsets/ dir is refused with the one-shot guidance BEFORE a
    # marker is registered: Spark's own memory-sink recovery refusal is
    # existence-based (it throws on the empty dir too), so the precheck
    # mirrors that definition — unlike run_streaming's resumable path,
    # where only a COMMITTED offset counts
    t2 = SnapshotTable.create(root / "pages2", "pages")
    t2.append_pandas(corpus.pages.iloc[:20])
    (root / "ckpt_bare" / "offsets").mkdir(parents=True)
    with pytest.raises(ValueError, match="one-shot"):
        run_windowed_stream(spark, t2, lookup_sdf, root / "ckpt_bare",
                            query_name="windowed_hits_bare")
    assert t2.stream_markers() == []


def test_replayed_epoch_after_sink_maintenance_stays_deduped(
        spark, corpus, lookup_sdf, tmp_path_factory):
    """The crash + maintenance + restart interleaving: a shutdown cancels
    the checkpoint's epoch commit AFTER the final micro-batch committed
    its rows to the routed sink (marker stream-N), the operator then
    compacts + expires the routed sink, and the restarted stream replays
    the lost epoch. The sink's idempotence marker must survive the expiry
    (tableio retains expired snapshots' markers) or the replay
    double-commits the batch's rows into the sink, the aggregates and the
    final summary."""
    root = tmp_path_factory.mktemp("stream_replay")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    n = len(corpus.pages)
    half = (n + 1) // 2
    for lo in range(0, n, half):
        pages_table.append_pandas(corpus.pages.iloc[lo: lo + half])
    pipe = Pipeline(spark, root / "out", lookup_sdf)
    ckpt = root / "stream_ckpt"
    run_streaming(spark, pages_table, pipe, ckpt, max_files_per_trigger=1)
    assert pipe.routed().count() == n

    # the crash: drop the LAST epoch's checkpoint commit — its sink rows
    # are in, but Spark never recorded the epoch as done. The restart must
    # run from a RELOCATED copy of the checkpoint: within one JVM Spark
    # caches the commit high-water per checkpoint path and reads the
    # surgically-regressed log as a concurrent query (a real crash
    # restarts the driver, so the cache is empty there).
    import shutil

    commits = sorted((p for p in (ckpt / "commits").iterdir()
                      if p.name.isdigit()), key=lambda p: int(p.name))
    assert len(commits) >= 2  # the corpus really split into >= 2 epochs
    commits[-1].unlink()
    # the checksum sidecar must go with it, or Hadoop's local filesystem
    # fails the re-written commit's atomic create as a concurrent writer
    (commits[-1].parent / f".{commits[-1].name}.crc").unlink(missing_ok=True)
    ckpt2 = root / "stream_ckpt_restarted"
    shutil.copytree(ckpt, ckpt2)

    # routed-sink maintenance: compaction's replace snapshot supersedes
    # the lost epoch's append, expiry deletes that append snapshot
    assert pipe.routed_table.compact(rows_per_file=10 ** 6) is not None
    assert pipe.routed_table.expire_snapshots() != []

    # restart replays the uncommitted epoch; the retained marker makes it
    # a no-op instead of a duplicate commit
    replay = run_streaming(spark, pages_table, pipe, ckpt2,
                           max_files_per_trigger=1)
    assert replay  # Spark really re-fed the lost epoch through foreachBatch
    assert pipe.routed().count() == n
    for cls, want in corpus.golden_counts.items():
        assert pipe.sink(cls).count() == want, cls


def test_fresh_stream_after_expiry_warns_and_tails_new_appends(
        spark, corpus, lookup_sdf, tmp_path_factory):
    """After compact + expire_snapshots the pre-compaction rows exist only
    in compact-* files, which streams deliberately do not glob. A FRESH
    checkpoint started afterwards must (a) warn that it cannot observe the
    expired history, and (b) still tail post-expiry appends exactly once.
    Full-content consumers use batch table.read() (asserted too)."""
    import warnings

    root = tmp_path_factory.mktemp("stream_expire")
    pages_table = SnapshotTable.create(root / "pages", "pages")
    n = len(corpus.pages)
    half = n // 2
    pages_table.append_pandas(corpus.pages.iloc[:half])
    pages_table.append_pandas(corpus.pages.iloc[half:])
    pages_table.compact(rows_per_file=10 ** 6)
    assert pages_table.expire_snapshots() != []

    post = corpus.pages.iloc[:7].assign(
        url=lambda d: "http://late.example.net/" + d.index.astype(str))
    pages_table.append_pandas(post)

    pipe = Pipeline(spark, root / "out", lookup_sdf)
    with pytest.warns(UserWarning, match="expired"):
        run_streaming(spark, pages_table, pipe, root / "ckpt_fresh")
    assert pipe.routed().count() == 7  # post-expiry append only, once

    # resuming the SAME checkpoint must not warn again (not fresh anymore)
    # — assert the SPECIFIC warning is absent rather than escalating every
    # incidental library warning to a failure
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        run_streaming(spark, pages_table, pipe, root / "ckpt_fresh")
    assert not [w for w in caught if "expired" in str(w.message)]
    assert pipe.routed().count() == 7

    # batch read still serves the full table contents
    assert pages_table.read(spark).count() == n + 7
