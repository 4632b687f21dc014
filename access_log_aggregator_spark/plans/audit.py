"""Physical-plan shape extraction + the per-query shape budget.

``shape_facts(df)`` reduces ``explain("formatted")`` to the counts that
matter at 100 TB — scans, exchanges by partitioning, join strategies,
Python stages. ``scripts/plan_audit.py --all`` records one fact row per
registry query into ``plans/shape_budgets.json``; ``tests/test_plans.py``
re-derives the facts for every query and fails on REGRESSION (any count of
a scale-hostile node above its budget), so "is every plan the one you'd
want" is a mechanical CI gate, not a per-flagship spot check. Budgets are
ceilings: a plan that loses a shuffle simply beats its budget (regenerate
with ``scripts/plan_audit.py --all`` to ratchet down).

Two structural rules hold regardless of budget:

- a nested-loop/cartesian join or a single-partition exchange is allowed
  ONLY for queries in :data:`CONSTANT_FRAME_OK`, each with a reviewed
  reason why the frame it touches is constant-size (a codebook, a scalar,
  a global top-k) — every other query must plan zero of either;
- budgets are read and asserted with AQE OFF (the static plan) so the
  audited shape is deterministic; production runs AQE on, which can only
  improve on it (tests/test_plans.py also spot-checks the AQE-finalized
  flagship plans).
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from pyspark.sql import DataFrame

#: metrics where MORE is a scale regression (asserted actual <= budget)
CAPPED = (
    "scans", "ex_hash", "ex_range", "ex_single",
    "smj", "nl", "py_scalar", "py_grouped",
)

#: queries allowed nested-loop/cartesian joins or single-partition
#: exchanges, because the frame on the wrong side of them is provably
#: constant-size (does not grow with the data).
CONSTANT_FRAME_OK: dict[str, str] = {
    "ann_ivf_topk": "nested loops broadcast only the codebook (n_cells "
                    "rows) and the single query vector",
    "ann_cosine_topk": "nested loop broadcasts the single query-vector "
                       "literal frame",
    "text_tfidf_top_terms": "nested loop + single-partition exchanges carry "
                            "the n_docs scalar, the global top-20 tf-idf "
                            "rows and the global top-10 token counts (the "
                            "merged top_token arm) — all constant-size",
    "dedup_exact": "single-partition exchange carries ONE row of partial "
                   "global counts (count/count-distinct summary)",
    "events_malformed_audit": "single-partition exchange carries partial "
                              "global validity counters (one output row)",
    "join_set_coverage": "single-partition exchanges carry ONE row of "
                         "partial global counts per set-op leg (the anti "
                         "join and EXCEPT legs each reduce to a count)",
}

#: queries whose returned frame is a driver-local relation (the real work
#: ran inside the call — e.g. a streaming drain through foreachBatch), so
#: shape_facts on the RESULT would audit nothing: the underlying plan is
#: covered elsewhere (the pipeline flagships in PLANS.md / the streaming
#: tests), and the budget audit skips them rather than recording a
#: meaningless all-zero row.
DRIVER_MATERIALIZED: dict[str, str] = {
    "streaming_routed_counts": "AvailableNow drain via foreachBatch; the "
                               "executed plan is build_routed (audited as "
                               "pipeline_routed in PLANS.md) per micro-batch",
}

BUDGET_PATH = Path(__file__).with_name("shape_budgets.json")


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    jmode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def max_codegen_method_size(df: DataFrame) -> int:
    """Largest generated-method bytecode size across the plan's
    whole-stage-codegen subtrees (0 when none, -1 when unreadable).

    Report-only fact, not a capped budget (sizes drift with Spark
    versions): HotSpot never JIT-compiles a method over 8000 bytecode
    bytes, so a subtree above that line runs the per-operator codegen
    fallback (the session factory pins hugeMethodLimit=8000 — see
    session.py and SCALE.md §1 'Generated-code size'). The flagship
    plan is additionally pinned UNDER the line by
    tests/test_plans.py::test_parse_stage_codegen_methods_jit_compile.

    Deliberately NOT part of :func:`shape_facts`: codegenString
    Janino-compiles every whole-stage subtree, and shape_facts runs per
    registry query in CI where the size is never asserted — only
    ``scripts/plan_audit.py`` (which records it) should pay the compile.
    """
    try:
        jvm = df.sparkSession._jvm
        debug = getattr(
            getattr(jvm.org.apache.spark.sql.execution.debug, "package$"),
            "MODULE$",
        )
        cg = debug.codegenString(df._jdf.queryExecution().executedPlan())
        sizes = [int(x) for x in re.findall(r"maxMethodCodeSize:(\d+)", cg)]
        return max(sizes) if sizes else 0
    except Exception:  # pragma: no cover - py4j/compile availability
        return -1


def shape_facts(df: DataFrame) -> dict[str, int]:
    """Count the scale-relevant physical nodes in ``df``'s plan.

    Works on static plans AND on executed adaptive plans: a finalized
    AdaptiveSparkPlan's formatted explain prints BOTH the final and the
    initial plan trees (every node numbered once in the shared details
    section), so when ``== Final Plan ==`` sections are present only the
    node ids referenced by them are counted — otherwise every AQE-final
    audit would double-count."""
    plan = plan_string(df)
    finals = re.findall(r"== Final Plan ==(.*?)== Initial Plan ==", plan, re.S)
    keep = set(re.findall(r"\((\d+)\)", "".join(finals))) if finals else None

    # formatted mode names each node once in the tree and once in a
    # "(n) Name" detail block; count detail blocks (optionally restricted
    # to the final plan's node ids)
    blocks: list[tuple[str, str]] = []
    for block in re.split(r"\n\s*\n", plan):
        bm = re.match(r"\((\d+)\) (.+)", block.strip())
        if bm and (keep is None or bm.group(1) in keep):
            blocks.append((bm.group(2), block))

    def nodes(name: str) -> int:
        return sum(1 for n, _ in blocks if n.startswith(name))

    def exchanges(partitioning: str) -> int:
        return sum(1 for n, b in blocks
                   if n.startswith("Exchange")
                   and re.search(rf"^Arguments: {partitioning}", b, re.M))

    simple = plan_string(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", simple)
    wsc = int(m.group(1)) if m else len(set(re.findall(r"\*\((\d+)\)", simple)))
    return {
        "scans": nodes("Scan parquet"),
        "ex_hash": exchanges("hashpartitioning"),
        "ex_range": exchanges("rangepartitioning"),
        "ex_single": exchanges("SinglePartition"),
        "bhj": nodes("BroadcastHashJoin"),
        "smj": nodes("SortMergeJoin"),
        "nl": nodes("BroadcastNestedLoopJoin") + nodes("CartesianProduct"),
        "py_scalar": nodes("ArrowEvalPython") + nodes("BatchEvalPython"),
        "py_grouped": nodes("FlatMapGroupsInPandas") + nodes("MapInPandas"),
        "wsc": wsc,
    }


def load_budgets() -> dict[str, dict[str, int]]:
    return json.loads(BUDGET_PATH.read_text())["queries"]


def executed_facts(df: DataFrame) -> dict[str, int]:
    """Shape facts of the RUNTIME-FINALIZED plan: execute ``df`` (so AQE
    re-plans with real statistics) and count nodes in the final plan.
    Plans with no exchange are not wrapped by AQE (forceApply is off) —
    their static shape IS the executed shape, and shape_facts handles
    both forms."""
    df.collect()
    plan = plan_string(df)
    if "AdaptiveSparkPlan" in plan:
        assert "isFinalPlan=true" in plan, "adaptive plan did not finalize"
    return shape_facts(df)


def aqe_violations(name: str, facts: dict[str, int],
                   budget: dict[str, int]) -> list[str]:
    """Join-shape regressions of an EXECUTED (AQE-final) plan vs its
    recorded AQE budget: runtime re-planning may only improve the join
    shape (e.g. SMJ -> BHJ), never demote a broadcast or introduce a
    nested-loop / sort-merge join."""
    out = []
    if facts["nl"] > budget["aqe_nl"]:
        out.append(f"{name}: AQE-final nl = {facts['nl']} exceeds "
                   f"recorded {budget['aqe_nl']}")
    if facts["smj"] > budget["aqe_smj"]:
        out.append(f"{name}: AQE-final smj = {facts['smj']} exceeds "
                   f"recorded {budget['aqe_smj']}")
    if facts["bhj"] < budget["aqe_bhj"]:
        out.append(f"{name}: AQE-final bhj = {facts['bhj']} lost a "
                   f"broadcast (recorded {budget['aqe_bhj']})")
    return out


def violations(name: str, facts: dict[str, int],
               budget: dict[str, int]) -> list[str]:
    """Budget + structural-rule violations for one query's facts."""
    out = [
        f"{name}: {k} = {facts[k]} exceeds budget {budget[k]}"
        for k in CAPPED if facts[k] > budget[k]
    ]
    if name not in CONSTANT_FRAME_OK:
        if facts["nl"]:
            out.append(f"{name}: nested-loop/cartesian join in a query not "
                       "allowlisted as constant-frame-only")
        if facts["ex_single"]:
            out.append(f"{name}: single-partition exchange in a query not "
                       "allowlisted as constant-frame-only")
    return out
