"""Two-parallelism scaling evidence (the north_rule's N -> 4N gate).

The sandbox has no multi-executor cluster, so per the driver instruction the
two "cluster sizes" are two local parallelism levels on identical input:
local[8] (N) and local[32] (4N). Each level runs in its OWN JVM (fresh
spark-submit-equivalent subprocess) with shuffle partitions = cores; the
job is the full parse -> enrich -> route pipeline over the same cached
corpus; throughput = pages / best-trial wall seconds (1 warm-up + 3 trials).

efficiency = (T_4N / T_N) / 4   (per-core-normalized, target >= 0.8)

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, math, os, sys, time
from pathlib import Path

cores = int(sys.argv[1]); pages_path = sys.argv[2]; n_pages = int(sys.argv[3])
# Pin this process (and every child: JVM, Python UDF workers) to exactly
# `cores` CPUs — local[N] alone does NOT bound total CPU use (its N task
# threads plus N Python workers would otherwise spill onto extra cores,
# silently inflating the small level's throughput). Affinity makes each
# level a true resource budget, like an N-executor cluster.
os.sched_setaffinity(0, set(range(cores)))

sys.path.insert(0, {repo!r})
from access_log_aggregator_spark.session import get_spark
from access_log_aggregator_spark.sources.pages import generate_host_lookup
from access_log_aggregator_spark.plans.pipeline import build_routed
from bench import bench_scan_conf

spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores,
                  extra_conf=bench_scan_conf(Path(pages_path), cores))
pages = spark.read.parquet(pages_path)  # scan-parallel, no shuffle
lookup = spark.createDataFrame(generate_host_lookup())
df = build_routed(pages, lookup)

def run():
    df.write.format("noop").mode("overwrite").save()

run(); run()  # warm-up x2: python workers + whole-stage codegen JIT
best = math.inf
trials = []
for _ in range(6):
    t0 = time.time(); run(); dt = time.time() - t0
    trials.append(round(dt, 3)); best = min(best, dt)
print(json.dumps({{"cores": cores, "trials": trials, "best_sec": round(best, 3),
                   "pages_per_sec": round(n_pages / best, 1)}}))
spark.stop()
"""


def run_level(cores: int, pages_path: str, n_pages: int) -> dict:
    script = WORKER.format(repo=str(REPO))
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), pages_path, str(n_pages)],
        capture_output=True, text=True, timeout=1200, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "4000000"))
    sys.path.insert(0, str(REPO))
    import bench as bench_mod

    pages_path = str(bench_mod._cached_pages(n_pages))

    n_level = int(os.environ.get("SPARK_GRAFT_SCALE_N", "4"))
    print(f"running {n_level} CPUs (N) on {n_pages} pages ...", file=sys.stderr)
    lo = run_level(n_level, pages_path, n_pages)
    print(f"  -> {lo}", file=sys.stderr)
    print(f"running {4 * n_level} CPUs (4N) ...", file=sys.stderr)
    hi = run_level(4 * n_level, pages_path, n_pages)
    print(f"  -> {hi}", file=sys.stderr)

    eff = (hi["pages_per_sec"] / lo["pages_per_sec"]) / 4.0
    result = {
        "n_pages": n_pages,
        "N_cores": n_level, "T_N_pages_per_sec": lo["pages_per_sec"],
        "4N_cores": 4 * n_level, "T_4N_pages_per_sec": hi["pages_per_sec"],
        "speedup": round(hi["pages_per_sec"] / lo["pages_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "gate": ">= 0.8",
        "pass": eff >= 0.8,
    }

    md = f"""# BENCH — measured baseline & scaling evidence

Updated: {datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%M UTC')}

## North-star pipeline throughput (parse -> enrich -> route, single pass)

Job: full `build_routed` (Arrow pandas-UDF extraction + Catalyst field
parse/validate + broadcast enrich + router) over the deterministic
{n_pages:,}-page corpus (seed 42), `noop` sink, 2 warm-ups + 6 trials per
level, best trial. Each parallelism level runs in a fresh JVM, CPU-pinned
via `sched_setaffinity` to exactly its core budget (JVM task threads AND
Python UDF workers share it — `local[N]` alone does not bound total CPU,
which silently flatters the small level), `spark.sql.shuffle.partitions` =
cores. This is the sandbox proxy for the north_rule's N vs 4N executors:
identical input, two true resource budgets, fresh JVM each.

| level | cores (pinned) | trial secs | best sec | pages/sec |
|---|---|---|---|---|
| N  | {lo['cores']} | {lo['trials']} | {lo['best_sec']} | {lo['pages_per_sec']:,} |
| 4N | {hi['cores']} | {hi['trials']} | {hi['best_sec']} | {hi['pages_per_sec']:,} |

**Scaling efficiency = (T_4N / T_N) / 4 = {result['scaling_efficiency']}**
(gate ≥ 0.8: {"PASS" if result['pass'] else "FAIL"})

## Why this scales to a real cluster

The plan is one parquet scan -> ArrowEvalPython -> projections ->
BroadcastHashJoin (zero shuffles; verified via explain). Work is
embarrassingly parallel per input split; the only serial parts are job
scheduling and the broadcast of the ~1k-row host dim. At 1000 executors the
same plan applies: partition-parallel scan, per-executor Arrow batches,
broadcast join, and the aggregate's two-phase (partial+final) hash
aggregation with AQE-coalesced, optionally salted shuffle.

## Reference comparison

The reference (single Go consumer goroutine, per-line json.Unmarshal —
internal/app/run.go:31) aggregates on ONE core by construction; its test
corpus is 1,000 lines. This pipeline's single-node throughput at 4N is
{hi['pages_per_sec']:,} pages/sec across 32 cores including full routing,
enrichment, and lineage stamping.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    print(json.dumps(result))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
