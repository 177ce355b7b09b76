"""Straggler/skew bench: pareto vs uniform corpus at EQUAL total bytes.

The oversized-doc guard bounds the worst case (a >64 MiB blob is routed
out), but a heterogeneous corpus of SUB-threshold giants (hundreds of times
the median document) can still produce stragglers: each mapInPandas task's
wall-clock is the sum of its documents' kernel times, so clustering giants
in one partition stalls that core.  The flagship plan defuses this with the
salted ``repartition(n, xxhash64(url))`` spread — expected max-partition
load = mean + O(one giant) — plus small Arrow batches (256 rows).

This bench measures it: annotate a Pareto(alpha=1.2, cap~250x-median)
corpus and a uniform corpus with the SAME total paragraph budget on the
same local[32] session, min-of-RUNS each, and reports
``ratio = wall_pareto / wall_uniform`` (target <= 1.5, the budget a real
heterogeneous web crawl must hold; reference analogue this beats: the
one-doc-per-future model stalls a worker for the giant's full duration,
auto_annotate_utils.py:740-757).

Outputs one JSON line; the driver-facing copy lives in
``BENCH/skew_r5.json``.

Usage: python scripts/skew_bench.py  [env: SKEW_BENCH_DOCS, SKEW_BENCH_RUNS]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SKEW_BENCH_DOCS", "6000"))
RUNS = int(os.environ.get("SKEW_BENCH_RUNS", "2"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WORK_DIR = os.path.abspath(os.environ.get("SKEW_BENCH_DIR", ".bench/skew"))


def materialize(spark):
    from pyspark.sql import functions as F

    from sciencebeam_trainer_grobid_tools_spark.sources.corpus import (
        pareto_paragraph_counts,
        sized_corpus_dataframe,
        uniform_paragraph_counts,
    )

    pareto_counts = pareto_paragraph_counts(N_DOCS, seed=42)
    uniform_counts = uniform_paragraph_counts(N_DOCS, sum(pareto_counts))
    info = {
        "n_docs": N_DOCS,
        "total_paragraphs": sum(pareto_counts),
        "pareto_max_paragraphs": max(pareto_counts),
        "pareto_median_paragraphs": sorted(pareto_counts)[N_DOCS // 2],
        "uniform_paragraphs_per_doc": uniform_counts[0],
    }
    paths = {}
    for name, counts in (("pareto", pareto_counts), ("uniform", uniform_counts)):
        path = os.path.join(WORK_DIR, name)
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            sized_corpus_dataframe(spark, counts, seed=42, partitions=64).write.mode(
                "overwrite"
            ).parquet(path)
        paths[name] = path
        info["%s_bytes" % name] = int(
            spark.read.parquet(path)
            .agg(
                F.sum(
                    F.coalesce(F.octet_length("html"), F.lit(0))
                    + F.coalesce(F.octet_length("text"), F.lit(0))
                ).alias("b")
            )
            .collect()[0]["b"]
        )
    return paths, info


def time_leg(spark, path: str) -> list:
    from pyspark.sql import functions as F

    from sciencebeam_trainer_grobid_tools_spark.plans.pipeline import (
        annotate_documents,
    )

    docs = spark.read.parquet(path)
    # warm-up: codegen, python workers, C kernel, page cache
    annotate_documents(docs, repartition=CPUS * 4).count()
    times = []
    for _ in range(RUNS):
        t0 = time.time()
        annotate_documents(docs, repartition=CPUS * 4).agg(
            F.count(F.lit(1)).alias("docs")
        ).collect()
        times.append(round(time.time() - t0, 2))
    return times


def main() -> None:
    from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session

    spark = build_session("skew-bench", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    load_before = os.getloadavg()[0]
    paths, info = materialize(spark)
    uniform_times = time_leg(spark, paths["uniform"])
    pareto_times = time_leg(spark, paths["pareto"])
    spark.stop()
    wall_uniform = min(uniform_times)
    wall_pareto = min(pareto_times)
    result = {
        "bench": "skew_straggler",
        "mode": "local[%d], salted repartition(xxhash64(url), %d partitions)"
        % (CPUS, CPUS * 4),
        **info,
        "runs": RUNS,
        "load_before": round(load_before, 2),
        "uniform_runs_sec": uniform_times,
        "pareto_runs_sec": pareto_times,
        "wall_uniform_sec": wall_uniform,
        "wall_pareto_sec": wall_pareto,
        "ratio": round(wall_pareto / wall_uniform, 3),
        "target_ratio": 1.5,
        "meets_target": wall_pareto / wall_uniform <= 1.5,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
