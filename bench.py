"""Benchmark harness.

Phase 1 — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; each fully materialized via a noop sink.

Phase 2 — the authoritative metric (BASELINE.json): change-events/sec
merge-apply throughput on the synthetic transcript CDC stream, run at TWO
parallelism levels (local[N_SMALL] and local[N_BIG], default 8 and 32) on
IDENTICAL input, reporting scaling efficiency = (thr_big / thr_small) /
(N_BIG / N_SMALL), with a final-state replay-equality check between the two
runs. Writes BENCH.md with the details and the honest extrapolation to
10^10 events.

Prints ONE JSON line:
  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "cdc": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_WAL_EVENTS", "2000000"))
N_SMALL = int(os.environ.get("BENCH_SMALL_CORES", "8"))
N_BIG = int(os.environ.get("BENCH_BIG_CORES", "32"))
BATCHES = int(os.environ.get("BENCH_WAL_BATCHES", "4"))

HEADLINE = [
    "lww_merge_state",
    "agg_pricing",
    "multi_join_regional",
    "broadcast_join_enrich",
    "ohlc_daily",
    "dedup_within_batch",
    "explode_words",
    "minhash_signatures",
    "quality_langid",
    "ann_topk",
    "double_entry_flip",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_queries() -> dict[str, float]:
    import __spark_entry__ as entry
    from endor_blockchain_data_pipeline_spark.session import get_spark, stop_spark

    spark = get_spark("bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entry.queries()
    # warm the JVM/codegen once on a cheap query
    _materialize(qs["watermark_probe"](spark, SF_DIR))
    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _materialize(qs[name](spark, SF_DIR))
        out[name] = round(time.time() - t0, 3)
    stop_spark()
    return out


def run_cdc_at(cores: int, workdir: str) -> tuple[float, list]:
    """Merge-apply the same deterministic WAL at a given core count.

    Returns (events/sec, sorted sample of final state for equality check).
    """
    from endor_blockchain_data_pipeline_spark.job import CDCJob
    from endor_blockchain_data_pipeline_spark.session import get_spark, stop_spark
    from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable
    from endor_blockchain_data_pipeline_spark.sources.wal import generate_wal

    spark = get_spark(
        f"bench-cdc-{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8)
    )
    wal = generate_wal(
        spark, N_EVENTS, n_convs=max(N_EVENTS // 200, 64), max_turns=24, seed=42,
        numPartitions=cores * 4,
    )
    table = ManifestTable(os.path.join(workdir, f"table-{cores}"), n_buckets=64)
    job = CDCJob(spark, table, wal, lineage=True)
    batch = (N_EVENTS + BATCHES - 1) // BATCHES
    t0 = time.time()
    job.run_to_watermark(batch_size=batch)
    dt = time.time() - t0
    import pyspark.sql.functions as F

    state = job.read_state()
    fingerprint = (
        state.select(
            F.count("*").alias("n"),
            F.expr("bit_xor(xxhash64(conv_id, turn_idx, role, text, tool, ts))").alias("h"),
            F.sum("turn_idx").alias("s"),
        ).first()
    )
    sample = [fingerprint["n"], fingerprint["h"], fingerprint["s"]]
    stop_spark()
    return N_EVENTS / dt, sample


def main() -> None:
    t_all = time.time()
    queries = run_queries()

    workdir = tempfile.mkdtemp(prefix="endor-bench-")
    try:
        thr_small, fp_small = run_cdc_at(N_SMALL, workdir)
        thr_big, fp_big = run_cdc_at(N_BIG, workdir)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    ratio = N_BIG / N_SMALL
    efficiency = (thr_big / thr_small) / ratio
    replay_equal = fp_small == fp_big
    cdc = {
        "events": N_EVENTS,
        "batches": BATCHES,
        f"events_per_sec_local{N_SMALL}": round(thr_small),
        f"events_per_sec_local{N_BIG}": round(thr_big),
        "scaling_efficiency": round(efficiency, 3),
        "replay_equal": replay_equal,
    }

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline-query seconds at sf + CDC merge-apply events/sec at two parallelism levels",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cdc": cdc,
        "wall_sec": round(time.time() - t_all, 1),
    }
    write_bench_md(result)
    print(json.dumps(result))


def write_bench_md(result: dict) -> None:
    cdc = result["cdc"]
    eff = cdc["scaling_efficiency"]
    small = cdc[f"events_per_sec_local{N_SMALL}"]
    big = cdc[f"events_per_sec_local{N_BIG}"]
    est_days = 1e10 / big / 86400
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as fh:
        fh.write(f"""# BENCH — measured engine numbers

## CDC merge-apply throughput (the authoritative metric)

Deterministic synthetic transcript WAL, {cdc['events']:,} events applied in
{cdc['batches']} watermark-bounded batches (decode -> LWW reduce -> bucketed
MERGE -> atomic manifest commit, lineage on), identical input at two
parallelism levels (sandbox stand-in for N vs 4N executors):

| parallelism | events/sec |
|---|---|
| local[{N_SMALL}] (N) | {small:,} |
| local[{N_BIG}] (4N) | {big:,} |

- **scaling efficiency** = ({big:,} / {small:,}) / {N_BIG // N_SMALL} = **{eff}** (target >= 0.8)
- **final-state replay equality across the two runs:** {cdc['replay_equal']}
  (count + order-insensitive xxhash64 fingerprint of every row)

Extrapolation (stated, not measured): at the measured local[{N_BIG}]
single-node rate, 10^10 events ~= {est_days:,.1f} machine-days; on a
1000-executor cluster the map-only decode and bucket-pruned merge shuffle
scale linearly in partition count (no global barrier besides the per-batch
commit), which the two-level scaling efficiency above evidences.

## Headline queries ({result['sf']} scale, local[{CPUS}])

| query | sec |
|---|---|
""")
        for k, v in result["queries"].items():
            fh.write(f"| {k} | {v} |\n")
        fh.write(f"| **total** | **{result['value']}** |\n")


if __name__ == "__main__":
    main()
