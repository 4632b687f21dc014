"""Generate PLANS.md: formatted physical plans for the flagship operators.

The plan SHAPES are already pinned by tests/test_plans.py; this artifact
makes them reviewable — for each audited query it prints the facts that
matter at 100 TB (scan count, exchange count, join strategy, Python stage
count, pushed filters / read schema) followed by the full
``explain("formatted")`` output.

Run: python scripts/plan_audit.py [sf_dir]   (plans only — nothing executes)
"""

from __future__ import annotations

import re
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _plan(df, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def _facts(plan: str, simple_plan: str) -> list[str]:
    def nodes(name: str) -> int:
        # formatted mode names each node once in the tree and once in the
        # details; count only the unique "(n) Name" detail headers
        return len(re.findall(rf"^\(\d+\) {name}", plan, re.M))

    scans = nodes("Scan parquet")
    in_mem = nodes("Scan In-memory") + nodes("InMemoryTableScan")
    # formatted mode lists each Exchange's partitioning on its Arguments line
    ex_hash = len(re.findall(r"^Arguments: hashpartitioning", plan, re.M))
    ex_range = len(re.findall(r"^Arguments: rangepartitioning", plan, re.M))
    ex_single = len(re.findall(r"^Arguments: SinglePartition", plan, re.M))
    bhj = nodes("BroadcastHashJoin")
    smj = nodes("SortMergeJoin")
    nl = nodes("BroadcastNestedLoopJoin") + nodes("CartesianProduct")
    py = nodes("ArrowEvalPython") + nodes("BatchEvalPython")
    pandas = nodes("FlatMapGroupsInPandas") + nodes("MapInPandas")
    # under AQE the un-executed simple plan hides codegen stars; the
    # codegen explain mode reports the subtree count directly
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", simple_plan)
    wsc = int(m.group(1)) if m else len(set(re.findall(r"\*\((\d+)\)", simple_plan)))
    facts = [
        f"parquet scans: {scans}" + (f" (+{in_mem} cached)" if in_mem else ""),
        f"shuffles: {ex_hash} hash / {ex_range} range / {ex_single} single-partition",
        f"joins: {bhj} broadcast-hash, {smj} sort-merge, {nl} nested-loop/cartesian",
        f"python stages: {py} arrow-batched scalar, {pandas} grouped/mapInPandas",
        f"whole-stage-codegen spans: {wsc}",
    ]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

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
        f"over `{sf_dir}` (plans only; nothing executed; AQE disabled for "
        "the audit so the static plan shows codegen spans and exchanges — "
        "production sessions run AQE on). The shape facts "
        "below are enforced by `tests/test_plans.py` — this file is the "
        "human-readable evidence.",
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
    try:
        import tempfile

        tmp = tempfile.mkdtemp(prefix="planaudit_")
        spark.createDataFrame(generate_pages_chunk(0, 200)).write.mode(
            "overwrite").parquet(f"{tmp}/pages.parquet")
        routed = build_routed(
            spark.read.parquet(f"{tmp}/pages.parquet"),
            spark.createDataFrame(generate_host_lookup()),
        )
        for name, why in AUDIT:
            if name == "pipeline_routed":
                df = routed
            else:
                df = QUERIES[name].spark_fn(spark, sf_dir)
            plan = _plan(df)
            out.append(f"## {name}")
            out.append("")
            out.append(why)
            out.append("")
            out.extend(f"- {f}" for f in _facts(plan, _plan(df, "codegen")))
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
    finally:
        spark.stop()

    (REPO / "PLANS.md").write_text("\n".join(out))
    print(f"wrote {REPO / 'PLANS.md'}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
