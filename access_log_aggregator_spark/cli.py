"""spark-submit entry point.

Mirrors the reference CLI's flag surface (internal/config/flags.go:10-14)
on Spark terms:

    -file (repeatable)  ->  --log-file PATH (repeatable): the LITERAL
                            analog — raw newline-JSON logs, parsed
                            directly, summary to stdout (optionally routed
                            to sinks with --out); or --pages-table DIR
                            (the snapshot table replaces the tailed-file
                            list; partition-parallel scan replaces
                            goroutine fan-in, incremental cursors replace
                            seek-to-end)
    -from-start         ->  --from-start        (ignore checkpoint, process
                            every snapshot from the beginning)
    -interval           ->  one invocation == one batch tick; schedule
                            invocations (or use the streaming mode) for the
                            periodic-emit behavior

Run:  spark-submit --py-files alas.zip -m access_log_aggregator_spark.cli ...
or:   python -m access_log_aggregator_spark.cli --generate 20000 ...
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def _compact_reporting(table, label: str, rows_per_file: int,
                       retries: int = 5,
                       sort_by: list[str] | None = None,
                       zorder_by: list[str] | None = None,
                       spark=None) -> None:
    """Run ``table.compact`` with the retry the CommitConflict contract
    prescribes: a concurrent ingest committing between compaction's base
    capture and its CAS commit aborts the rewrite cleanly, and the next
    attempt rewrites against the advanced base. FileNotFoundError is the
    same race seen one stage earlier — a concurrent truncate/expire
    unlinked a file between compaction's listing and its footer/content
    reads — so it retries identically (the re-listing heals it) instead
    of propagating a traceback that would also skip the aggregate heal
    and summary below. Bounded so a hot writer cannot livelock a
    maintenance run — exhaustion is reported as a clean outcome (the
    data is intact, only the rewrite was skipped). A short jittered
    sleep between attempts keeps a retry from re-doing the full
    footer-read + rewrite I/O on the exact timing that just lost."""
    import random
    import time

    from .sources.tableio import CommitConflict

    last_exc: Exception | None = None
    for attempt in range(retries):
        try:
            sid = table.compact(rows_per_file=rows_per_file,
                                sort_by=sort_by, zorder_by=zorder_by,
                                spark=spark)
            print(f"compacted {label} -> snapshot {sid}" if sid
                  else f"{label} already compact", file=sys.stderr)
            return
        except ValueError as e:
            # a caller error (e.g. --compact-sort-by typo), not a race: no
            # retry would change it, and a traceback here would also skip
            # the aggregate heal and summary that follow in main()
            print(f"compaction of {label} skipped: {e}", file=sys.stderr)
            return
        except (CommitConflict, FileNotFoundError) as e:
            last_exc = e
            if attempt < retries - 1:
                time.sleep(0.05 * (attempt + 1) + random.random() * 0.1)
            continue
    cause = ("concurrent commits kept advancing the table"
             if isinstance(last_exc, CommitConflict)
             else "concurrent maintenance kept unlinking listed files "
                  f"({last_exc})")
    print(f"compaction of {label} skipped: {cause} ({retries} attempts); "
          "rerun when the concurrent writer/maintenance is idle",
          file=sys.stderr)


def _drain_live_query(q, timeout_s: float = 300.0) -> None:
    """Stop a live streaming query at the next micro-batch boundary — the
    Spark analog of the reference's drain (aggregate.go:28-41): stop
    READING new input, finish what is in flight, then stop.

    Not ``processAllAvailable()`` (under continuous appends that never
    returns) and not a bare ``isTriggerActive`` poll (under back-to-back
    triggers the inter-batch False gap is milliseconds, so 0.2 s polls
    land inside active triggers and the loop keeps ingesting NEW batches
    until the deadline). Instead the bound is the batch itself: capture
    ``lastProgress.batchId`` at the signal and stop as soon as a NEWER
    batch commits — the batch in flight at the signal is then done, and
    anything the next trigger started after the operator asked to stop is
    cancelled safely (sink idempotence markers make a replay a no-op —
    durable even across routed-sink maintenance, because
    expire_snapshots retains expired snapshots' markers). The deadline
    is a backstop for a stuck batch, not the expected path; the
    ``q.stop()`` below is itself bounded by
    ``spark.sql.streaming.stopTimeout`` (set in session.get_spark —
    Spark's default 0 waits forever), so a batch wedged in a
    non-interruptible call raises a TimeoutException instead of hanging
    the shutdown past both bounds. Deadline on the MONOTONIC clock: a
    wall-clock step during shutdown must not stretch or collapse it.

    A query that FAILED (rather than drained) must not look like a clean
    shutdown: re-raise its exception so the run exits nonzero instead of
    printing a healthy summary over a crashed stream."""
    import time

    p0 = q.lastProgress
    sig_batch = p0["batchId"] if p0 else -1
    deadline = time.monotonic() + timeout_s
    while q.isActive and time.monotonic() < deadline:
        if not q.status.get("isTriggerActive"):
            break  # between micro-batches: stop starts no new work
        p = q.lastProgress
        if p is not None and p["batchId"] > sig_batch:
            break  # the batch in flight at the signal has committed
        time.sleep(0.2)
    q.stop()
    exc = q.exception()
    if exc is not None:
        raise exc


def _run_log_files(args, ap) -> int:
    """The reference's literal input mode: ``accessAgg -file a.log`` ->
    ``--log-file a.log``. Lines parse through the SAME dual-engine
    parse/validate/route chain (extraction is the identity on a bare log
    line — byte-parity pinned on the reference corpus); output is the
    reference-format summary table plus the counts JSON. With --out (or
    --data-dir) the batch also commits to the routed sink + aggregate
    tables under an idempotence marker derived from the files'
    (path, size, mtime) signature, so re-running over unchanged files is
    a no-op and appending to a log re-commits exactly the new state."""
    import hashlib

    from .operators.aggregate import aggregate_by_host
    from .plans.pipeline import (
        Pipeline,
        build_routed,
        observe_routed_classes,
        summary_text_from_agg,
    )
    from .session import get_spark
    from .sources.logfiles import canonical_paths, read_log_files
    from .sources.pages import generate_host_lookup
    from .sources.tableio import SnapshotTable
    from pyspark.sql import functions as F

    from .functions import extract as X

    files = canonical_paths(args.log_file)
    missing = [str(p) for p in files if not p.exists()]
    if missing:
        ap.error(f"--log-file path(s) not found: {missing}")
    out = args.out or (str(Path(args.data_dir) / "out")
                       if args.data_dir else None)
    if out:
        # refuse an output layout another mode owns BEFORE touching it:
        # this mode REBUILDS the routed sink (truncate + recommit), which
        # would destroy a batch/stream pipeline's accumulated state while
        # its checkpoint still claims the rows were routed
        routed_root = SnapshotTable(Path(out) / "routed")
        if routed_root.exists():
            foreign = sorted(m for m in routed_root.committed_markers()
                             if not m.startswith("logfiles-"))
            if foreign:
                ap.error(
                    f"{out}/routed is managed by the snapshot pipeline "
                    f"(markers {foreign[:3]}{'...' if len(foreign) > 3 else ''}"
                    "): --log-file rebuilds the routed sink from the "
                    "files' current state and would destroy those rows. "
                    "Point --out at a separate directory."
                )

    spark = get_spark(master=args.master)
    try:
        pages = read_log_files(spark, files)
        lookup = spark.createDataFrame(generate_host_lookup(seed=args.seed))
        classes = X.ALL_CLASSES
        if out:
            # Sink semantics mirror the reference's -from-start rebuild:
            # each run represents the files' CURRENT full state, so a
            # changed state truncates and re-commits (old lines would
            # otherwise duplicate), while an UNCHANGED state is a marker
            # no-op. Incremental tailing of growing logs is the
            # SnapshotTable/--stream path, not this mode.
            pipe = Pipeline(spark, out, lookup,
                            use_arrow_udf=not args.no_arrow_udf,
                            salt_buckets=args.salt_buckets,
                            write_partitions=args.write_partitions)
            # sorted by the SAME canonical string embedded in the hash, so
            # flag order / spelling cannot change the marker
            sig = hashlib.md5("|".join(
                f"{p}:{p.stat().st_size}:{p.stat().st_mtime_ns}"
                for p in sorted(files)).encode()).hexdigest()[:12]
            marker = f"logfiles-{sig}"
            if marker in pipe.routed_table.committed_markers():
                counts = {c: 0 for c in classes}
                rows_in = 0
                # marker no-op — but a previous run may have crashed AFTER
                # the routed commit and BEFORE (or during) write_aggregates:
                # the marker alone would skip the heal forever, so re-derive
                # the aggregates whenever their stamped source state does
                # not match the routed sink's current fingerprint
                agg_rows = (pipe.write_aggregates()
                            if pipe.aggregates_stale() else {})
            else:
                pipe.routed_table.truncate()
                r = pipe.process_batch(pages, batch_id=marker)
                counts = dict(r.sink_counts)
                rows_in = r.rows_in
                # unconditional: a now-EMPTY file state (e.g. logrotate
                # copytruncate) must truncate the aggregate tables too,
                # not leave them reporting the previous state
                agg_rows = pipe.write_aggregates()
            # render from the just-written agg_by_host table (tiny scan)
            # instead of re-aggregating the routed sink
            agg_t = SnapshotTable(Path(out) / "agg_by_host")
            summary = summary_text_from_agg(
                agg_t.read(spark) if agg_t.exists() else None)
        else:
            # summary-only (the reference's exact behavior: no sinks) —
            # class counts ride the aggregation job via observe(), so the
            # files scan once; the metric set is process_batch's own
            # (observe_routed_classes), so the two modes count identically
            routed = build_routed(pages, lookup,
                                  use_arrow_udf=not args.no_arrow_udf)
            routed, obs = observe_routed_classes(routed, "logfile_counts")
            valid = routed.filter(
                F.col("match_class").isin(X.CLASS_PARSED, X.CLASS_BOT))
            summary = summary_text_from_agg(
                aggregate_by_host(valid, args.salt_buckets))
            got = obs.get
            counts = {c: int(got.get(c, 0)) for c in classes}
            rows_in = int(got.get("rows_in", 0))
            agg_rows = {}
        print(json.dumps({
            "files": len(args.log_file), "rows_in": rows_in,
            "sink_counts": counts,
            "malformed": counts[X.CLASS_UNPARSED] + counts[X.CLASS_ERROR],
            "aggregate_tables": agg_rows,
        }))
        print(summary)
        return 0
    finally:
        spark.stop()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="access-log-aggregator-spark")
    ap.add_argument("--log-file", action="append", metavar="PATH",
                    help="raw newline-JSON access-log file (repeatable) — "
                         "the reference's -file analog (flags.go:10): parse "
                         "the lines directly and print the summary table; "
                         "add --out (or --data-dir) to also route to sinks. "
                         "Empty lines count as malformed and an "
                         "unterminated final line is held back, matching "
                         "the reference tailer's delimiter semantics")
    ap.add_argument("--pages-table", help="pages SnapshotTable root dir")
    ap.add_argument("--out", help="output root (routed sink + aggregates)")
    ap.add_argument("--checkpoint", help="checkpoint JSON path")
    ap.add_argument("--from-start", action="store_true",
                    help="ignore checkpoint; process all snapshots (flags.go:11 analog)")
    ap.add_argument("--generate", type=int, metavar="N",
                    help="synthesize an N-row pages corpus first (seeded)")
    ap.add_argument("--data-dir", help="root dir when using --generate")
    ap.add_argument("--snapshots", type=int, default=4,
                    help="number of snapshots to split --generate data into")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--salt-buckets", type=int, default=None,
                    help="enable explicit salted aggregation with N buckets")
    ap.add_argument("--write-partitions", type=int, default=None, metavar="N",
                    help="explicit repartition(N, url) before the sink write "
                         "(balances write tasks / bounds file count under skew)")
    ap.add_argument("--no-arrow-udf", action="store_true",
                    help="use the pure-JVM regexp extractor instead of the pandas UDF")
    ap.add_argument("--compact", action="store_true",
                    help="after processing, compact the routed sink's small "
                         "files into one replace snapshot (maintenance job; "
                         "incremental cursors unaffected)")
    ap.add_argument("--compact-rows-per-file", type=int, default=1_000_000,
                    metavar="N", help="target rows per compacted file")
    ap.add_argument("--compact-sort-by", action="append", default=None,
                    metavar="COL",
                    help="cluster rewritten rows by COL (repeatable) during "
                         "--compact/--compact-pages — the Iceberg "
                         "sort-strategy rewrite analog: output files then "
                         "cover disjoint ranges of COL, keeping manifest "
                         "bounds tight so predicate reads still prune after "
                         "compaction (use the dominant scan column, e.g. "
                         "warc_ts)")
    ap.add_argument("--compact-zorder-by", action="append", default=None,
                    metavar="COL",
                    help="cluster rewritten rows along a Morton curve over "
                         "the listed COLs (repeatable; 1-4 columns, though "
                         "a single column is just a coarser sort — prefer "
                         "--compact-sort-by there; "
                         "mutually exclusive with --compact-sort-by) — the "
                         "Iceberg z-order rewrite analog: every listed "
                         "column's per-file bounds stay tight, so predicate "
                         "reads prune on ANY of them (use when two "
                         "independent predicates matter, e.g. host AND "
                         "warc_ts)")
    ap.add_argument("--expire-snapshots", action="store_true",
                    help="after compacting, delete data files only reachable "
                         "from pre-compaction snapshots (disk reclaim; "
                         "refuses while a stream checkpoint is registered)")
    ap.add_argument("--stream", action="store_true",
                    help="Structured Streaming mode: foreachBatch fan-out with "
                         "a streaming checkpoint (drains all unseen snapshots)")
    ap.add_argument("--retire-stream", action="store_true",
                    help="declare this checkpoint's PAGES-table stream "
                         "permanently done: remove its marker so "
                         "--expire-pages-snapshots is no longer blocked by "
                         "it (works with or without --stream; do NOT pass "
                         "this if the checkpoint will resume — the marker "
                         "protects appends committed between drains from "
                         "being compacted+expired unseen)")
    ap.add_argument("--compact-pages", action="store_true",
                    help="compact the PAGES table's small files into a "
                         "replace snapshot (safe beside streams: they glob "
                         "part-* and compaction writes compact-*)")
    ap.add_argument("--expire-pages-snapshots", action="store_true",
                    help="delete PAGES-table data files only reachable from "
                         "pre-compaction snapshots (refuses while a stream "
                         "checkpoint marker is registered on the pages "
                         "table — see --retire-stream)")
    ap.add_argument("--no-analyze-routed", action="store_true",
                    help="skip the default end-of-run distributed stats "
                         "sweep over the routed sink (it records min/max/"
                         "null bounds + host equality blooms for "
                         "newly-committed files so point lookups prune; "
                         "the write path itself stays zero-footer-read)")
    ap.add_argument("--analyze-pages", action="store_true",
                    help="record column statistics (min/max/null bounds) "
                         "for PAGES-table files committed without them — "
                         "Spark-written snapshots skip footer reads at "
                         "commit time; the stats sweep runs as a "
                         "distributed job and enables file pruning for "
                         "predicate reads (read(where=...))")
    ap.add_argument("--maintenance-only", action="store_true",
                    help="run only the maintenance flags (--compact*, "
                         "--expire*, --analyze-pages, --retire-stream) "
                         "without processing "
                         "any pages: required when the layout is managed "
                         "by a --stream checkpoint, because a batch run "
                         "would re-route already-streamed rows under "
                         "different idempotence markers")
    ap.add_argument("--trigger-interval", default=None, metavar="DUR",
                    help="with --stream: processingTime trigger, e.g. '10 seconds' "
                         "(the -interval ticker analog, flags.go:13); default is "
                         "an AvailableNow drain")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    if args.compact_sort_by and args.compact_zorder_by:
        # fail fast: compact() raises ValueError for this combination, but
        # _compact_reporting downgrades maintenance errors to a "compaction
        # skipped" stderr note and the run would continue WITHOUT compacting
        ap.error("--compact-sort-by and --compact-zorder-by are mutually "
                 "exclusive: a z-order curve over the sort columns replaces "
                 "the linear sort (pick one clustering strategy)")

    from .plans.checkpoint import Checkpoint, run_incremental
    from .plans.pipeline import Pipeline
    from .session import get_spark
    from .sources.pages import generate_host_lookup, generate_pages
    from .sources.tableio import SnapshotTable

    if args.log_file:
        if (args.generate or args.stream or args.maintenance_only
                or args.pages_table):
            ap.error("--log-file is its own input mode: it cannot combine "
                     "with --generate/--pages-table/--stream/"
                     "--maintenance-only")
        if (args.compact or args.expire_snapshots or args.retire_stream
                or args.compact_pages or args.expire_pages_snapshots
                or args.analyze_pages):
            # fail loud, not silent: these run in the snapshot-pipeline path
            # only, and --log-file returning before them would drop the
            # user's requested maintenance with no indication
            ap.error("--log-file does not run maintenance flags (--compact/"
                     "--expire-snapshots/--retire-stream/--compact-pages/"
                     "--expire-pages-snapshots/--analyze-pages): its routed "
                     "sink is rebuilt per run, so there is nothing to "
                     "compact, expire or analyze — "
                     "run them with --pages-table/--data-dir")
        return _run_log_files(args, ap)

    if args.generate and not args.data_dir:
        ap.error("--generate requires --data-dir")
    if args.data_dir:
        # --data-dir derives the three paths with or without --generate, so
        # maintenance-only runs (--retire-stream / --compact* / --expire*)
        # address the same layout a --generate run created
        root = Path(args.data_dir)
        args.pages_table = args.pages_table or str(root / "pages")
        args.out = args.out or str(root / "out")
        args.checkpoint = args.checkpoint or str(root / "checkpoint.json")

    if not (args.pages_table and args.out and args.checkpoint):
        ap.error("--pages-table, --out and --checkpoint are required (or use --generate)")

    spark = get_spark(master=args.master)
    try:
        pages_table = SnapshotTable.create(args.pages_table, "pages")
        if args.generate:
            pdf = generate_pages(args.generate, seed=args.seed)
            step = (len(pdf) + args.snapshots - 1) // args.snapshots
            before = pages_table.current_snapshot_id() or 0
            for lo in range(0, len(pdf), step):
                pages_table.append_pandas(pdf.iloc[lo: lo + step],
                                          marker=f"gen-{args.seed}-{lo}")
            new = (pages_table.current_snapshot_id() or 0) - before
            if new:
                print(f"generated {len(pdf)} pages into {new} snapshots",
                      file=sys.stderr)
            else:
                # same seed + same offsets => same idempotence markers: the
                # whole generate was deduplicated against earlier commits
                print(f"generate: all {args.snapshots} snapshots already "
                      f"committed (markers gen-{args.seed}-*), nothing "
                      "appended", file=sys.stderr)

        lookup = spark.createDataFrame(generate_host_lookup(seed=args.seed))
        pipe = Pipeline(spark, args.out, lookup,
                        use_arrow_udf=not args.no_arrow_udf,
                        salt_buckets=args.salt_buckets,
                        write_partitions=args.write_partitions)
        # mode-ownership guard, BOTH directions: --log-file already refuses
        # a snapshot-pipeline sink (see _run_log_files); the snapshot modes
        # must equally refuse a --log-file-managed sink — appending
        # pages-snap-*/stream-* rows into it would mix two corpora in one
        # routed table, and the NEXT --log-file run would then error on the
        # foreign markers after the corruption already happened. And
        # --stream must refuse a batch-managed sink (the mirror of the
        # batch-side stream-cursor guard below): a fresh stream checkpoint
        # lists EVERY part-* file of the pages table and would re-route all
        # batch-processed rows under stream-* markers.
        if not args.maintenance_only:
            sink_markers = (pipe.routed_table.committed_markers()
                            if pipe.routed_table.exists() else set())
            logfile_owned = sorted(
                m for m in sink_markers if m.startswith("logfiles-"))
            if logfile_owned:
                ap.error(
                    f"{args.out}/routed is managed by --log-file (markers "
                    f"{logfile_owned[:3]}"
                    f"{'...' if len(logfile_owned) > 3 else ''}): appending "
                    "snapshot-pipeline rows would mix the two corpora in "
                    "one sink. Point --out at a separate directory."
                )
            if args.stream:
                batch_owned = sorted(
                    m for m in sink_markers if m.startswith("pages-snap-"))
                if batch_owned:
                    ap.error(
                        f"{args.out}/routed already holds batch-committed "
                        f"rows (markers {batch_owned[:3]}"
                        f"{'...' if len(batch_owned) > 3 else ''}): a stream "
                        "checkpoint keeps its own cursor and idempotence "
                        "markers (stream-*), so streaming this layout would "
                        "re-route every batch-processed row as a duplicate. "
                        "Continue in batch mode, use --maintenance-only for "
                        "maintenance, or start the stream on a fresh layout."
                    )
        if args.maintenance_only:
            results = []
        elif args.stream:
            from .streaming.stream import run_streaming, start_live_stream

            ckpt_dir = Path(args.checkpoint).with_suffix(".stream_ckpt")
            if args.trigger_interval:
                # live ticker: run until SIGINT/SIGTERM, then drain the
                # in-flight batch before the final summary (the reference's
                # signal.NotifyContext + drain loop, main.go:23 +
                # aggregate.go:28-41). A handler + 1 s awaitTermination poll
                # keeps the signal out of the blocking py4j call.
                import signal

                stop_flag = {"stop": False}

                def _on_signal(_sig, _frame):
                    stop_flag["stop"] = True

                signal.signal(signal.SIGINT, _on_signal)
                signal.signal(signal.SIGTERM, _on_signal)
                q, processed = start_live_stream(
                    spark, pages_table, pipe, ckpt_dir,
                    processing_time=args.trigger_interval,
                )
                while q.isActive and not stop_flag["stop"]:
                    q.awaitTermination(1)
                if not stop_flag["stop"]:
                    # the query terminated on its own: a failure landing
                    # between awaitTermination's timeout return and the
                    # isActive check exits the loop without raising —
                    # surface it instead of printing a healthy summary
                    exc = q.exception()
                    if exc is not None:
                        raise exc
                if stop_flag["stop"]:
                    print("Gracefully shutting down...", file=sys.stderr)
                    # a second Ctrl-C/TERM now force-interrupts: the drain
                    # below must never leave the process unkillable
                    signal.signal(signal.SIGINT, signal.SIG_DFL)
                    signal.signal(signal.SIGTERM, signal.SIG_DFL)
                    # stop() alone would CANCEL the in-flight micro-batch
                    # (its rows would miss the final summary, though the
                    # idempotence markers keep the resume safe); the drain
                    # helper stops at the micro-batch boundary instead and
                    # re-raises a stream failure as a failure.
                    _drain_live_query(q)
            else:
                processed = run_streaming(spark, pages_table, pipe, ckpt_dir)
            # per-run counts from each batch's own observe() metrics — same
            # contract as batch mode (a second idle --stream run reports 0,
            # not the routed table's all-time totals)
            results = processed
        else:
            # mixed-mode guard: batch and stream keep INDEPENDENT cursors
            # and use different sink idempotence markers (pages-snap-<id>
            # vs stream-<n>), so a batch run whose cursor is BEHIND what a
            # stream checkpoint already drained would re-route those
            # snapshots as duplicates. Covers both the fresh-cursor case
            # (no batch checkpoint at all) and a stale existing checkpoint
            # left over from before the stream took over: the drained set
            # is recovered from each registered checkpoint's file-source
            # metadata log, not inferred from the checkpoint's existence.
            markers = pages_table.stream_markers()
            if markers:
                behind_cursor = 0
                if Path(args.checkpoint).exists() and not args.from_start:
                    behind_cursor = (
                        Checkpoint(args.checkpoint).load().last_snapshot_id
                    )
                drained: set[int] = set()
                unknown: list[str] = []
                for m in markers:
                    d = pages_table.stream_drained_snapshots(m)
                    if d is None:
                        unknown.append(m)
                    else:
                        drained |= d
                overlap = sorted(s for s in drained if s > behind_cursor)
                if unknown:
                    # fail CLOSED: a registered stream whose checkpoint
                    # metadata is gone may have drained anything — assuming
                    # "nothing" would re-route every streamed row
                    ap.error(
                        f"{args.pages_table} is managed by stream "
                        f"checkpoint(s) {unknown} whose drain state cannot "
                        "be read (checkpoint dir deleted or moved?): a "
                        "batch run could duplicate every streamed row in "
                        "the routed sink. Restore the checkpoint, or "
                        "--retire-stream if the stream is permanently "
                        "done (then audit the sink for stream-* markers)."
                    )
                if overlap:
                    ap.error(
                        f"{args.pages_table} is managed by stream "
                        f"checkpoint(s) {markers} which already drained "
                        f"snapshot(s) {overlap} ahead of the batch cursor "
                        f"({behind_cursor} at {args.checkpoint}): a batch "
                        "run would duplicate those rows in the routed "
                        "sink. Use --stream to resume the stream, or "
                        "--maintenance-only for maintenance, or "
                        "--retire-stream first if the stream is "
                        "permanently done."
                    )
            cp = Checkpoint(args.checkpoint)
            results = run_incremental(spark, pages_table, pipe, cp,
                                      from_start=args.from_start)
        totals = {"parsed": 0, "unparsed": 0, "bot": 0, "error": 0}
        rows_in = 0
        for r in results:
            rows_in += r.rows_in
            for k, v in r.sink_counts.items():
                totals[k] += v
        n_batches = len(results)
        # routed-sink maintenance below (compact/expire) preserves CONTENT
        # but changes the state fingerprint; capture the pre-maintenance
        # state (only armed while the aggregates are current), so they can
        # be restamped (not recomputed) afterwards — a --maintenance-only
        # run must not trigger a full aggregate rewrite over an unchanged
        # sink. The token makes the later restamp refuse if a concurrent
        # ingest from another process commits mid-window.
        routed_maintenance = args.compact or args.expire_snapshots
        restamp_token = (pipe.capture_restamp_state()
                         if routed_maintenance and not rows_in else None)
        if args.compact:
            # no marker: compaction is safe to redo — a directory is only
            # rewritten when it holds >= 2 files below the target size, so
            # a compacted table is a true no-op (no growth); a constant
            # marker would silently turn every later run into a no-op
            _compact_reporting(pipe.routed_table, "routed sink",
                               args.compact_rows_per_file,
                               sort_by=args.compact_sort_by,
                               zorder_by=args.compact_zorder_by,
                               spark=spark)
        if args.retire_stream:
            # works in maintenance-only runs too (no --stream): the marker
            # belongs to the PAGES table and the checkpoint path is derived
            # the same way the streaming mode derives it
            ckpt = Path(args.checkpoint).with_suffix(".stream_ckpt")
            removed = pages_table.unregister_stream(ckpt)
            print(f"retired stream checkpoint {ckpt}" if removed
                  else f"no stream marker for {ckpt}", file=sys.stderr)
        if args.expire_snapshots:
            # a registered stream checkpoint makes expiry refuse (it would
            # delete part-* files the checkpoint may still need); that is a
            # clean maintenance outcome, not a crash — report and move on.
            # (--expire-snapshots targets the ROUTED sink; the pages table
            # the CLI's own stream reads is --expire-pages-snapshots.)
            try:
                gone = pipe.routed_table.expire_snapshots()
                print(f"expired {len(gone)} data file(s)", file=sys.stderr)
            except RuntimeError as e:
                print(f"expire-snapshots refused: {e}", file=sys.stderr)
        if args.compact_pages:
            _compact_reporting(pages_table, "pages table",
                               args.compact_rows_per_file,
                               sort_by=args.compact_sort_by,
                               zorder_by=args.compact_zorder_by,
                               spark=spark)
        if args.expire_pages_snapshots:
            try:
                gone = pages_table.expire_snapshots()
                print(f"expired {len(gone)} pages data file(s)",
                      file=sys.stderr)
            except RuntimeError as e:
                print(f"expire-pages-snapshots refused: {e}", file=sys.stderr)
        if args.analyze_pages:
            n_analyzed = pages_table.analyze(spark)
            print(f"analyzed {n_analyzed} pages data file(s)",
                  file=sys.stderr)
        if restamp_token is not None:
            # a refused restamp (concurrent ingest raced the maintenance
            # window) leaves the aggregates stale; the heal below recomputes
            pipe.restamp_aggregates(expected_state=restamp_token)
        # rows_in > 0 is the normal trigger; aggregates_stale() covers the
        # crash window of a PREVIOUS run (routed sink committed, aggregates
        # not yet written/stamped) that a no-new-rows re-run must heal
        agg_rows = (pipe.write_aggregates()
                    if rows_in or pipe.aggregates_stale() else {})
        if not args.no_analyze_routed and pipe.routed_table.exists():
            # default-on stats+blooms for the routed sink: the write path
            # stays zero-driver-footer-read (executor-side Observation
            # counts), and this DISTRIBUTED sweep back-fills min/max/null
            # bounds + host equality blooms for the files each run just
            # committed — so downstream point lookups (read(where=[("host",
            # "=", v)])) prune without a manual analyze. A no-op when every
            # live file already has stats (one manifest read).
            rt = pipe.routed_table
            try:
                if "bloom_cols" not in rt.properties():
                    rt.set_properties(bloom_cols="host")
                n_swept = rt.analyze(spark)
                if n_swept:
                    print(f"analyzed {n_swept} routed sink file(s) "
                          "(stats + host blooms)", file=sys.stderr)
            except Exception as e:  # noqa: BLE001 - default-on optimization
                # the sweep is an OPTIMIZATION over already-committed data:
                # a transient failure (executor loss, a file expired by
                # concurrent maintenance between manifest read and footer
                # task) must not crash an otherwise-successful run after
                # its rows are durably committed, nor skip the summary
                # JSON below — reads fail open on missing stats, and the
                # next run's sweep (or --analyze-pages-style rerun) heals
                print(f"routed sink analyze skipped: {e}", file=sys.stderr)
        print(json.dumps({"batches": n_batches, "rows_in": rows_in,
                          "sink_counts": totals,
                          "malformed": totals["unparsed"] + totals["error"],
                          "aggregate_tables": agg_rows}))
        # the reference's final summary table (print.go:26-49), rendered
        # from the just-materialized (or verified-current) agg_by_host
        # table — a tiny scan — instead of re-aggregating the whole
        # all-time routed sink a second time
        from .plans.pipeline import summary_text_from_agg

        agg_t = SnapshotTable(Path(args.out) / "agg_by_host")
        print(summary_text_from_agg(
            agg_t.read(spark) if agg_t.exists() else None))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    if __package__ in (None, ""):
        # spark-submit runs this file as a plain script: resolve the package
        # from --py-files (already on sys.path) or from the repo checkout.
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        from access_log_aggregator_spark.cli import main as _pkg_main

        sys.exit(_pkg_main())
    sys.exit(main())
