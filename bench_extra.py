"""Extra benchmarks for optimization work (bench.py stays FROZEN).

Times any subset of the declared queries with the same methodology as
bench.py (noop sink, best-of-REPS, warm session) and optionally dumps
``explain("formatted")`` plans to a directory.

Usage:
  python bench_extra.py q1 q2 ...            # time those queries
  python bench_extra.py --all                # every headline query
  python bench_extra.py --explain DIR q1 ... # also write DIR/<q>_<tag>.txt
  python bench_extra.py --tag after ...      # plan filename suffix
  python bench_extra.py --reps 3 ...

Bench-local families (incremental_dedup_build/add, live_curation_build/
refresh, minhash_signatures_xxhash64) are reproduced here with the same
recipes as bench.py so their numbers are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK_ROOT = os.environ.get(
    "BENCH_WORK_ROOT", "/dev/shm" if os.path.isdir("/dev/shm") else None
)


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--explain", metavar="DIR", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import __spark_entry__ as entry
    from endor_blockchain_data_pipeline_spark.session import get_spark

    spark = get_spark(
        "bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    qs = entry.queries()
    names = list(qs) if args.all else args.queries
    _materialize(qs["watermark_probe"](spark, SF_DIR))  # warm codegen

    out: dict[str, float] = {}
    for name in names:
        if name == "incremental_dedup_build" or name == "incremental_dedup_add":
            out.update(_inc_dedup(spark))
            continue
        if name in ("live_curation_build", "live_curation_refresh"):
            out.update(_live_cur(spark))
            continue
        best = None
        for _ in range(max(args.reps, 1)):
            spark.sparkContext.setJobDescription(f"bench-extra:{name}")
            t0 = time.time()
            _materialize(qs[name](spark, SF_DIR))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
    print(json.dumps({"sf": SF_DIR, "queries": out}))


def _inc_dedup(spark) -> dict[str, float]:
    import pyspark.sql.functions as F

    from endor_blockchain_data_pipeline_spark.operators.incremental_dedup import (
        DedupIndex,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    best_build = best_add = None
    for _ in range(2):
        root = tempfile.mkdtemp(prefix="bx-incdedup-", dir=WORK_ROOT)
        idx = DedupIndex(spark, root)
        even = docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 0)
        odd = docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 1)
        t0 = time.time()
        idx.add_batch(even, "b-even")
        t1 = time.time()
        idx.add_batch(odd, "b-odd")
        t2 = time.time()
        best_build = t1 - t0 if best_build is None else min(best_build, t1 - t0)
        best_add = t2 - t1 if best_add is None else min(best_add, t2 - t1)
        shutil.rmtree(root, ignore_errors=True)
    return {
        "incremental_dedup_build": round(best_build, 3),
        "incremental_dedup_add": round(best_add, 3),
    }


def _live_cur(spark) -> dict[str, float]:
    from endor_blockchain_data_pipeline_spark.job import CDCJob
    from endor_blockchain_data_pipeline_spark.operators.live_curation import (
        LiveCuration,
    )
    from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable
    from endor_blockchain_data_pipeline_spark.sources.wal import generate_wal

    best_cb = best_cr = None
    lc_wal = generate_wal(spark, 20000, n_convs=128, max_turns=8, seed=3)
    for _ in range(2):
        root = tempfile.mkdtemp(prefix="bx-livecur-", dir=WORK_ROOT)
        lc_table = ManifestTable(os.path.join(root, "t"), n_buckets=16)
        lc_job = CDCJob(spark, lc_table, lc_wal)
        lc = LiveCuration(
            spark, os.path.join(root, "cur"), lc_table, dup_word_max=0.95
        )
        t0 = time.time()
        lc_job.run_with_curation(10000, lc, limit_batches=1)
        t1 = time.time()
        lc_job.run_with_curation(10000, lc)
        t2 = time.time()
        best_cb = t1 - t0 if best_cb is None else min(best_cb, t1 - t0)
        best_cr = t2 - t1 if best_cr is None else min(best_cr, t2 - t1)
        shutil.rmtree(root, ignore_errors=True)
    return {
        "live_curation_build": round(best_cb, 3),
        "live_curation_refresh": round(best_cr, 3),
    }


if __name__ == "__main__":
    main()
