"""Operational entry point for the training-data operators.

The main CLI (cli.py) ships the log pipeline; this one ships the
dedup / similarity / text operators over parquet corpora, and — the
reason it exists as a CLI — makes the durable materializer an
OPERATIONAL choice instead of a Python-only one (round-4 verdict: the
100-TB recovery story in SCALE.md §3 was reachable only by writing
``using_materializer(TableMaterializer(...))`` yourself).

    python -m access_log_aggregator_spark.training_cli minhash-pairs \
        --documents /data/docs.parquet --out /data/pairs \
        --materializer table:/data/_mat

``--materializer``:

- ``local`` (default): ``localCheckpoint`` pins — fastest, but the
  pinned blocks are executor-local and unreplicated; an executor loss
  mid-job fails the run (acceptable on local[*] / single node).
- ``table``: every shared intermediate (minhash signatures, LSH band
  rows, component labels, exploded tokens) is written once as a
  SnapshotTable under ``<out>_materialized`` (a SIBLING of --out: the
  overwrite write deletes --out first while the plan still reads the
  pinned tables) and read back — an executor loss costs a re-READ
  from the table, not a failed job. The scratch tables are removed
  after the output is written.
- ``table:DIR``: same, but the tables live under DIR and are KEPT —
  point DIR at a job-scoped DFS path to reuse e.g. the signature table
  across incremental dedup runs (SCALE.md §3).

Result parity across the three modes is pinned by
tests/test_materializer.py (library level) and
tests/test_training_cli.py (this entry point, fresh process).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession


def _op_minhash_pairs(spark: SparkSession, args) -> DataFrame:
    from .operators.dedup import minhash_jaccard_estimates

    return minhash_jaccard_estimates(
        _read(spark, args.documents, "--documents"),
        id_col=args.id_col, text_col=args.text_col)


def _op_simhash_pairs(spark: SparkSession, args) -> DataFrame:
    from .operators.dedup import simhash_near_pairs

    return simhash_near_pairs(
        _read(spark, args.documents, "--documents"),
        id_col=args.id_col, text_col=args.text_col)


def _op_clusters(spark: SparkSession, args) -> DataFrame:
    from .operators.cluster import duplicate_clusters

    return duplicate_clusters(
        _read(spark, args.documents, "--documents"),
        id_col=args.id_col, text_col=args.text_col)


def _op_exact_dedup(spark: SparkSession, args) -> DataFrame:
    from .operators.dedup import exact_dedup_keep_first

    return exact_dedup_keep_first(
        _read(spark, args.documents, "--documents"),
        text_col=args.text_col, id_col=args.id_col)


def _op_tfidf(spark: SparkSession, args) -> DataFrame:
    from .operators.text import tfidf_top_terms

    return tfidf_top_terms(
        _read(spark, args.documents, "--documents"),
        k=args.top_k, text_col=args.text_col, id_col=args.id_col)


def _op_embedding_pairs(spark: SparkSession, args) -> DataFrame:
    from .operators.dedup import embedding_near_dup_pairs

    return embedding_near_dup_pairs(
        _read(spark, args.embeddings, "--embeddings"))


OPS = {
    "minhash-pairs": _op_minhash_pairs,
    "simhash-pairs": _op_simhash_pairs,
    "clusters": _op_clusters,
    "exact-dedup": _op_exact_dedup,
    "tfidf": _op_tfidf,
    "embedding-pairs": _op_embedding_pairs,
}


def _read(spark: SparkSession, path: str | None, flag: str) -> DataFrame:
    if not path:
        raise SystemExit(f"this op requires {flag} PATH")
    return spark.read.parquet(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="access-log-aggregator-spark-training",
        description="dedup / similarity / text operators over parquet")
    ap.add_argument("op", choices=sorted(OPS),
                    help="operator to run (output written as parquet)")
    ap.add_argument("--documents", metavar="PATH",
                    help="documents parquet (id + text columns)")
    ap.add_argument("--embeddings", metavar="PATH",
                    help="embeddings parquet (vec_id + embedding), for "
                         "embedding-pairs")
    ap.add_argument("--out", required=True, metavar="DIR",
                    help="output parquet directory (overwritten)")
    ap.add_argument("--materializer", default="local", metavar="MODE",
                    help="how shared intermediates are pinned: 'local' "
                         "(localCheckpoint; executor-local blocks), 'table' "
                         "(durable SnapshotTables under <out>_materialized, "
                         "removed after the write), or 'table:DIR' (kept "
                         "under DIR for reuse across runs) — see module "
                         "docstring / SCALE.md §3")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--top-k", type=int, default=20,
                    help="result size for tfidf")
    ap.add_argument("--write-partitions", type=int, default=None, metavar="N",
                    help="repartition(N) before the write (bounds output "
                         "file count)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from .operators.materialize import (
        LocalCheckpointMaterializer,
        TableMaterializer,
        using_materializer,
    )
    from .session import get_spark

    keep_tables = False
    if args.materializer == "local":
        mat = LocalCheckpointMaterializer()
    elif args.materializer == "table":
        # SIBLING of --out, not inside it: the overwrite write deletes the
        # output dir first, and the plan still reads the pinned tables at
        # write time — scratch inside --out would be deleted mid-job
        mat = TableMaterializer(f"{args.out.rstrip('/')}_materialized")
    elif args.materializer.startswith("table:"):
        mat_dir = args.materializer.split(":", 1)[1]
        if not mat_dir:
            # 'table:' would hand TableMaterializer('') = Path('.') and
            # scatter scratch tables into the CWD — fail like other typos
            ap.error("--materializer table: needs a directory "
                     "(table:DIR), or use bare 'table' for auto-managed "
                     "scratch")
        mat = TableMaterializer(mat_dir)
        keep_tables = True  # caller-owned dir: reusable signature tables
    else:
        ap.error(f"--materializer must be local, table, or table:DIR "
                 f"(got {args.materializer!r})")

    spark = get_spark(app_name=f"training-{args.op}", master=args.master)
    try:
        # the scope covers build AND write: pins happen at plan-build
        # time, but table reads happen at the write action
        with using_materializer(mat):
            df = OPS[args.op](spark, args)
            if args.write_partitions:
                df = df.repartition(args.write_partitions)
            df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({"op": args.op, "rows": n, "out": args.out,
                          "materializer": args.materializer}))
        return 0
    finally:
        if not keep_tables:
            # in a finally: a failed write/count must not leak auto-managed
            # scratch (the documented contract removes it; retries would
            # otherwise accrete tables per attempt). Caller-owned table:DIR
            # is kept either way — partial signature tables there are
            # reusable state, and reclaiming them is the caller's call.
            mat.close()
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
