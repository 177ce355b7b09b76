"""Round-11 optimization harness (guide §1): per-query noop-sink isolation
and .explain("formatted") capture for every headline query.

Usage:
    python bench_extra.py noop [query ...]    # min-of-N noop-sink seconds
    python bench_extra.py collect [query ...] # min-of-N collect seconds (bench protocol)
    python bench_extra.py plans [query ...]   # write plans/r11/<q>_<tag>.txt

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0), SPARK_GRAFT_CPUS,
SPARK_GRAFT_PLAN_TAG (default "before"), SPARK_GRAFT_BENCH_REPEATS.

This file is NOT part of the driver contract; ``bench.py`` stays frozen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session  # noqa: E402

HEADLINE = [
    "flagship_extract_align",
    "align_exact_spans",
    "pricing_summary",
    "top_revenue_orders",
    "region_supplier_volume",
    "event_sessionization",
    "docs_exact_dedup",
    "docs_token_counts",
    "docs_minhash_near_dups",
    "docs_web_filters",
    "emb_cosine_topk",
]


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "noop"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    spark = build_session("bench-extra", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**entry_mod.queries(), **entry_mod.demo_queries()}

    if mode == "plans":
        tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "before")
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r11")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(out_dir, "%s_%s.txt" % (name, tag))
            with open(path, "w") as fh:
                fh.write(plan)
            print("wrote", path)
        spark.stop()
        return

    # warm the JVM + python worker pool the same way bench.py does
    queries["pricing_summary"](spark, sf_dir).collect()
    queries["flagship_extract_align"](spark, sf_dir).count()
    queries["docs_minhash_near_dups"](spark, sf_dir).count()

    timings = {}
    samples = {}
    for name in names:
        fn = queries[name]
        times = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription("%s: %s" % (mode, name))
            t0 = time.time()
            if mode == "noop":
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            else:
                fn(spark, sf_dir).collect()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = min(times)
        samples[name] = times
    print(json.dumps({
        "mode": mode,
        "sf_dir": sf_dir,
        "value": round(sum(timings.values()), 3),
        "queries": timings,
        "samples": samples,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
