"""Generate the physical-plan audit artifacts.

Default mode writes PLANS.md: formatted physical plans for the flagship
operators — for each audited query it prints the facts that matter at
100 TB (scan count, exchange count, join strategy, Python stage count,
pushed filters / read schema) followed by the full
``explain("formatted")`` output. The plan SHAPES are pinned by
tests/test_plans.py; this artifact makes them reviewable.

``--all`` additionally audits EVERY registry query: it writes a summary
table (PLANS-ALL.md) and the machine-readable shape budget
(access_log_aggregator_spark/plans/shape_budgets.json) that
tests/test_plans.py asserts against — any future plan that adds a scan,
shuffle, sort-merge join, nested loop, or Python stage over the recorded
ceiling fails CI (see plans/audit.py).

Run: python scripts/plan_audit.py [--all] [sf_dir]  (plans only — nothing
executes except the registry's own fixture generation on first use)
"""

from __future__ import annotations

import json
import re
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from access_log_aggregator_spark.plans.audit import (  # noqa: E402
    BUDGET_PATH,
    CONSTANT_FRAME_OK,
    DRIVER_MATERIALIZED,
    max_codegen_method_size,
    plan_string as _plan,
    shape_facts,
    violations,
)


def _facts(plan: str, f: dict) -> list[str]:
    in_mem = len(re.findall(r"^\(\d+\) (?:Scan In-memory|InMemoryTableScan)",
                            plan, re.M))
    facts = [
        f"parquet scans: {f['scans']}" + (f" (+{in_mem} cached)" if in_mem else ""),
        f"shuffles: {f['ex_hash']} hash / {f['ex_range']} range / "
        f"{f['ex_single']} single-partition",
        f"joins: {f['bhj']} broadcast-hash, {f['smj']} sort-merge, "
        f"{f['nl']} nested-loop/cartesian",
        f"python stages: {f['py_scalar']} arrow-batched scalar, "
        f"{f['py_grouped']} grouped/mapInPandas",
        f"whole-stage-codegen spans: {f['wsc']}",
    ]
    mc = f["max_codegen"]
    if mc < 0:
        facts.append("max codegen method: unavailable (codegenString failed)")
    else:
        verdict = ("JIT-compiled" if mc < 8000 else
                   "over the 8000-byte JIT line -> per-operator fallback "
                   "(hugeMethodLimit)")
        facts.append(f"max codegen method: {mc} bytecode bytes ({verdict})")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if pushed and pushed.group(1).strip():
        facts.append(f"pushed filters: [{pushed.group(1)[:120]}]")
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if schema:
        cols = [c.split(":")[0] for c in schema.group(1).split(",") if ":" in c]
        facts.append(f"read schema ({len(cols)} cols): {', '.join(cols[:12])}")
    return facts


#: (name, why-this-plan-matters) — names resolve in the QUERIES registry;
#: `pipeline_routed` is special-cased to the raw build_routed frame.
AUDIT: list[tuple[str, str]] = [
    ("pipeline_routed",
     "The north-star single pass: ONE parquet scan, ONE Arrow python stage "
     "(vectorized extraction), broadcast-only enrich, zero shuffles. At 100 TB "
     "this plan is embarrassingly parallel per input split."),
    ("pipeline_agg_by_host",
     "Flagship aggregate: two-phase HashAggregate (map-side partial combine) "
     "over the routed frame; the only shuffle carries pre-aggregated partials, "
     "not rows."),
    ("events_enrich_broadcast",
     "Dimension enrich: the small side broadcasts; the fact table never "
     "shuffles."),
    ("events_asof_last_error",
     "Custom as-of join expressed as equi-join + window over the union frame "
     "— no range/nested-loop join at any scale."),
    ("events_session_interval_join",
     "Point-in-interval range join rewritten as a time-bucketized EQUI-join: "
     "candidate pairs come from bucket equality, the interval predicate is a "
     "post-filter. Never a BroadcastNestedLoopJoin."),
    ("dedup_minhash_lsh_pairs",
     "LSH banding: candidate pairs from an equi-join on (band, signature "
     "slice) over a checkpointed narrow band frame — the documents table is "
     "scanned once and never re-joined wholesale."),
    ("dedup_embedding_cosine_pairs",
     "Multi-band sign-LSH: the self-join shuffles only (band_no, band_val, "
     "id) rows; full vectors re-attach by id afterwards, so shuffle bytes "
     "stay O(candidates), not O(n_bands * dim)."),
    ("ann_ivf_topk",
     "Registry entry = the dual-dialect SQL twin (rank-per-vector over a "
     "narrow shuffle). The DataFrame operator path "
     "(`operators/similarity.py::ivf_assign`) is a map-side argmax over an "
     "inlined codebook with ZERO exchanges — pinned by "
     "`tests/test_plans.py`. Every nested-loop join below has a "
     "constant-size build side (the n_cells codebook or the single query "
     "vector), not a data-scale relation."),
    ("text_tfidf_top_terms",
     "TF-IDF: the corpus is scanned once (tokenize -> checkpoint); the "
     "vocabulary joins back via broadcast. The single-partition exchange "
     "and nested-loop joins carry only the n_docs scalar and the final "
     "global top-20 — constant-size frames at any corpus scale."),
    ("multimodal_transforms",
     "Binary transforms union: the frame leg is a flat-map (one video row "
     "-> N narrow frame rows via mapInPandas, Arrow-batched), the resize "
     "leg is 1:1 — downstream exchanges carry 64/256-byte derived blobs, "
     "never the source payload. The range sort is the final presentation "
     "order."),
]


def _aqe_final_fact(df_aqe, static: dict) -> str:
    """Execute under AQE (the production config) and report whether the
    runtime-finalized plan keeps the audited join shape."""
    df_aqe.collect()
    plan = _plan(df_aqe)
    assert "isFinalPlan=true" in plan, "adaptive plan did not finalize"
    f = shape_facts(df_aqe)
    deltas = [f"{k} {static[k]} -> {f[k]}"
              for k in ("bhj", "smj", "nl") if f[k] != static[k]]
    if not deltas:
        return ("AQE-final: same join shape (broadcasts kept, no new "
                "nested-loop or sort-merge joins at runtime)")
    return "AQE-final join deltas: " + ", ".join(deltas)


def _audit_all(spark, aqe, sf_dir: str) -> None:
    """Write PLANS-ALL.md + plans/shape_budgets.json over every registry
    query. Budgets are taken at sf0.001 with AQE off (deterministic static
    plans; node counts are structural, not data-sized); tests/test_plans.py
    replays the same config. Each query is ADDITIONALLY executed on the
    AQE-on session (the production config) and the finalized plan's join
    shape recorded as aqe_bhj/aqe_smj/aqe_nl — the budget the CI AQE
    replay asserts, so a runtime join demotion fails for ANY registry
    entry, not just the flagships."""
    from access_log_aggregator_spark.plans.audit import executed_facts
    from access_log_aggregator_spark.queries import QUERIES

    rows, budget = {}, {}
    for name, spec in QUERIES.items():
        if name in DRIVER_MATERIALIZED:
            print(f"all:{name}: skipped ({DRIVER_MATERIALIZED[name]})",
                  file=sys.stderr)
            continue
        df = spec.spark_fn(spark, sf_dir)
        f = shape_facts(df)
        # report-only compile-size fact (kept out of shape_facts so CI's
        # budget replay does not pay ~50 Janino compiles per run)
        f["max_codegen"] = max_codegen_method_size(df)
        af = executed_facts(spec.spark_fn(aqe, sf_dir))
        f["aqe_bhj"], f["aqe_smj"], f["aqe_nl"] = \
            af["bhj"], af["smj"], af["nl"]
        rows[name] = f
        budget[name] = f
        bad = violations(name, f, f)
        if bad:
            raise SystemExit("structural rule violated:\n" + "\n".join(bad))
        deltas = [f"{k} {f[k]} -> {af[k]}"
                  for k in ("bhj", "smj", "nl") if af[k] != f[k]]
        print(f"all:{name}: ok"
              + (f" (AQE join deltas: {', '.join(deltas)})" if deltas else ""),
              file=sys.stderr)
    BUDGET_PATH.write_text(json.dumps(
        {"generated": datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC"),
         "sf_dir": sf_dir, "aqe": False, "queries": budget}, indent=1))
    lines = [
        "# PLANS-ALL — shape-budget audit of every registry query",
        "",
        f"Generated by `scripts/plan_audit.py --all` on "
        f"{datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')} over "
        f"`{sf_dir}` (static plans, AQE off). Each row is the recorded "
        "ceiling in `plans/shape_budgets.json`; `tests/test_plans.py` "
        "re-derives every row and fails on any count above it, and on any "
        "nested-loop/cartesian join or single-partition exchange outside "
        "the reviewed constant-size-frame allowlist below. The `AQE-final "
        "joins` column EXECUTES the query under the production config "
        "(AQE on) and reports the runtime-finalized join shape vs the "
        "static plan; the finalized bhj/smj/nl counts are recorded as "
        "`aqe_*` budgets and re-asserted by "
        "`tests/test_plans.py::test_all_registry_plans_survive_aqe` — a "
        "runtime broadcast demotion fails CI for any registry entry.",
        "",
        "| query | scans | hash ex | range ex | single ex | BHJ | SMJ | "
        "NL/cart | py scalar | py grouped | codegen spans | max method B | "
        "AQE-final joins |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, f in rows.items():
        mark = " †" if name in CONSTANT_FRAME_OK else ""
        jit = (" ‡" if f["max_codegen"] >= 8000
               else " (unavailable)" if f["max_codegen"] < 0 else "")
        deltas = [f"{k} {f[k]}→{f['aqe_' + k]}"
                  for k in ("bhj", "smj", "nl") if f["aqe_" + k] != f[k]]
        aqe_col = ", ".join(deltas) if deltas else "same shape"
        lines.append(
            f"| {name}{mark} | {f['scans']} | {f['ex_hash']} | {f['ex_range']} "
            f"| {f['ex_single']} | {f['bhj']} | {f['smj']} | {f['nl']} "
            f"| {f['py_scalar']} | {f['py_grouped']} | {f['wsc']} "
            f"| {f['max_codegen']}{jit} | {aqe_col} |")
    lines += [
        "",
        "‡ max generated-method size is REPORT-ONLY (it drifts with Spark "
        "versions): a subtree over 8000 bytecode bytes would never be "
        "JIT-compiled by HotSpot, so the session factory's "
        "`hugeMethodLimit=8000` sends it to the per-operator codegen "
        "fallback (small methods, all JIT) instead of the silent bytecode "
        "interpreter (SCALE.md §1, BENCH/BASELINE.md 'The silent JIT "
        "cliff'). Every query is currently UNDER the line — the last one "
        "over it (`pipeline_agg_by_window`, 60,276 B: F.window's struct "
        "expansion re-inlined the parse tree below the pushed match-class "
        "filter) was rewritten to a floor-division window start "
        "(operators/aggregate.py). The flagship parse stage and the window "
        "aggregate are pinned UNDER the line by tests/test_plans.py.",
        "",
        "† allowlisted for nested-loop / single-partition against a "
        "constant-size frame:",
        "",
    ]
    lines += [f"- `{k}`: {v}" for k, v in CONSTANT_FRAME_OK.items()]
    if DRIVER_MATERIALIZED:
        lines += [
            "",
            "Skipped (result frame is driver-local; the executed plan is "
            "audited elsewhere):",
            "",
        ]
        lines += [f"- `{k}`: {v}" for k, v in DRIVER_MATERIALIZED.items()]
    lines.append("")
    (REPO / "PLANS-ALL.md").write_text("\n".join(lines))
    print(f"wrote {REPO / 'PLANS-ALL.md'} and {BUDGET_PATH}", file=sys.stderr)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    do_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from access_log_aggregator_spark.plans.pipeline import build_routed
    from access_log_aggregator_spark.queries import QUERIES
    from access_log_aggregator_spark.session import get_spark
    from access_log_aggregator_spark.sources.pages import (
        generate_host_lookup,
        generate_pages_chunk,
    )

    # AQE off for the audit only: the adaptive wrapper hides codegen spans
    # and defers exchange planning until runtime; the static plan is the
    # reviewable shape (production sessions keep AQE on — session.py).
    spark = get_spark(app_name="plan-audit", master="local[4]",
                      shuffle_partitions=4,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    out = [
        "# PLANS — physical-plan audit of the flagship operators",
        "",
        f"Generated by `scripts/plan_audit.py` on "
        f"{datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')} "
        f"over `{sf_dir}`. Static facts are taken with AQE disabled (the "
        "adaptive wrapper hides codegen spans and defers exchange "
        "planning); each flagship is then EXECUTED on an AQE-on session "
        "(the production config) and the `AQE-final` line reports whether "
        "the runtime-finalized plan kept the audited join shape. The "
        "shape facts below are enforced by `tests/test_plans.py` — this "
        "file is the human-readable evidence. The registry-wide version "
        "(every query, budget-pinned) is `PLANS-ALL.md` + "
        "`access_log_aggregator_spark/plans/shape_budgets.json`.",
        "",
        "Reading guide: hash/range exchanges listed here carry GROUPED or "
        "PRE-AGGREGATED narrow rows (partials, band keys, window keys), "
        "never the wide input; every range exchange is a final "
        "presentation sort. Single-partition exchanges and "
        "nested-loop/cartesian joins appear only against constant-size "
        "frames (a codebook, one query vector, a scalar statistic, a "
        "global top-k) — they do not grow with the data.",
        "",
    ]
    # second pass per flagship: execute on an AQE-ON session clone (the
    # production config) and record whether the finalized plan keeps the
    # audited join shape — runtime re-planning must not lose a broadcast
    # or introduce a nested loop
    aqe = spark.newSession()
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    import shutil
    import tempfile

    # bound BEFORE the try: the finally's rmtree must never NameError over
    # a failure that happened before the temp dir existed
    tmp = tempfile.mkdtemp(prefix="planaudit_")
    try:
        spark.createDataFrame(generate_pages_chunk(0, 200)).write.mode(
            "overwrite").parquet(f"{tmp}/pages.parquet")
        lookup = generate_host_lookup()
        routed = build_routed(
            spark.read.parquet(f"{tmp}/pages.parquet"),
            spark.createDataFrame(lookup),
        )
        for name, why in AUDIT:
            if name == "pipeline_routed":
                df = routed
                df_aqe = build_routed(
                    aqe.read.parquet(f"{tmp}/pages.parquet"),
                    aqe.createDataFrame(lookup),
                )
            else:
                df = QUERIES[name].spark_fn(spark, sf_dir)
                df_aqe = QUERIES[name].spark_fn(aqe, sf_dir)
            plan = _plan(df)
            static = shape_facts(df)
            static["max_codegen"] = max_codegen_method_size(df)
            out.append(f"## {name}")
            out.append("")
            out.append(why)
            out.append("")
            out.extend(
                f"- {f}" for f in _facts(plan, static))
            out.append(f"- {_aqe_final_fact(df_aqe, static)}")
            out.append("")
            out.append("<details><summary>explain(\"formatted\")</summary>")
            out.append("")
            out.append("```")
            out.append(plan.rstrip())
            out.append("```")
            out.append("")
            out.append("</details>")
            out.append("")
            print(f"{name}: ok", file=sys.stderr)
        if do_all:
            # budgets are always taken at sf0.001: the fixed corpus the
            # test suite replays (counts are structural, not data-sized)
            _audit_all(spark, aqe, "/root/testdata/sf0.001")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
