"""Round-10 scaling evidence: the two-cluster-size criterion
(BASELINE.json north_rule) with the r9 verdict's two asks folded in —

1. The Spark-free kernel control and the Spark local-cluster batch run
   INTERLEAVED in the same gated window (control → Spark samples →
   control), so a host-condition explanation for any gap between them
   is no longer available: both see the same hour.
2. Every Spark leg now carries engine forensics (scaling_bench.py
   run_cluster_worker): per-role /proc CPU-seconds (executor JVMs /
   worker daemons / python workers / driver), per-executor GC time from
   the REST API, executor CPU utilization against the leg's task-core
   budget, and JVM thread counts.  A scaling loss decomposes into named
   components instead of a bare ratio.

The run also carries the round-10 engine fix under test:
``-XX:ActiveProcessorCount=c`` on every executor JVM (SCALING_BENCH_ACP,
default on).  On a real cluster each executor owns a c-core node and
``Runtime.availableProcessors`` reads c; under taskset on one box it
reads the whole pinned span, so the 4N leg's four co-located executors
each sized GC/JIT/ForkJoin pools for 26 cores — a genuine co-location
overhead absent on the real deployment the north rule describes (and
auto-corrected by cgroup-aware container runtimes).

Re-running APPENDS a batch to BENCH/quiet_scaling_r10.json.

Usage: python scripts/quiet_scaling_r10.py
Env: SCALING_SAMPLES (default 3), SCALING_BENCH_ACP (default 1)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "BENCH", "quiet_scaling_r10.json")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench import _StealMonitor, _gate_quiet  # noqa: E402
from scripts.quiet_scaling_r9 import PROTOCOL, bandwidth_probe, compute_headline  # noqa: E402

R10_PROTOCOL = PROTOCOL + (
    " ROUND 10: Spark-free kernel control interleaved before AND after "
    "the Spark batch (same gated window); per-leg engine forensics "
    "(role CPU-seconds, executor GC, utilization vs task-core budget); "
    "executors run with -XX:ActiveProcessorCount=c so JVM thread pools "
    "are sized for the c-core node a real cluster gives each executor."
)


def kernel_control() -> dict:
    """The raw C alignment kernel under plain multiprocessing at the two
    protocol widths — no JVM, no shuffle, no Python rows.  The engine's
    own scaling loss is the delta between the Spark batch and this."""
    import bench_dp_nt as dp

    section = {"needle_len": 1000, "nt_kernel": True, "ts": round(time.time(), 1)}
    for lo, hi in ((4, 16), (6, 24)):
        low = dp.contention(True, lo, 1000)
        high = dp.contention(True, hi, 1000)
        section["%dw_to_%dw" % (lo, hi)] = {
            "agg_low_calls_s": round(low, 1),
            "agg_high_calls_s": round(high, 1),
            "scaling_eff": round(high / low / 4.0, 3),
        }
    return section


def main() -> None:
    samples = int(os.environ.get("SCALING_SAMPLES", "3"))
    gate = _gate_quiet(timeout=1800.0)
    probe = bandwidth_probe()
    monitor = _StealMonitor()
    monitor.start()
    control_pre = kernel_control()
    env = {
        **os.environ,
        "SCALING_BENCH_DOCS": "64000",
        "SCALING_BENCH_CORPUS": ".bench/scaling_corpus_64k",
        "SCALING_BENCH_SAMPLES": str(samples),
    }
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
         "--local-cluster"],
        capture_output=True, text=True, cwd=REPO, env=env,
    )
    spark_wall = round(time.time() - t0, 1)
    control_post = kernel_control()
    monitor.stop()
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    per_sample = [json.loads(ln) for ln in lines[:-1]] if len(lines) > 1 else []
    summary = json.loads(lines[-1]) if lines else {"error": proc.stderr[-800:]}
    batch = {
        "exec_cores": int(env.get("SCALING_BENCH_EXEC_CORES", "6")),
        "active_processor_count_fix": env.get("SCALING_BENCH_ACP", "1") != "0",
        "gate": gate,
        "bandwidth_probe": probe,
        "kernel_control_pre": control_pre,
        "kernel_control_post": control_post,
        "spark_wall_sec": spark_wall,
        "steal_monitor": monitor.stats(),
        "samples": per_sample,
        "summary": summary,
    }
    batches = []
    if os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as fh:
                batches = json.load(fh).get("batches", [])
        except (OSError, ValueError):
            pass
    batches.append(batch)
    result = {
        "protocol": R10_PROTOCOL,
        "batches": batches,
        "headline": compute_headline(batches),
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps({
        "headline": result["headline"],
        "this_batch_median": summary.get("median_efficiency"),
        "controls": {
            "pre": {k: v["scaling_eff"] for k, v in control_pre.items()
                    if isinstance(v, dict)},
            "post": {k: v["scaling_eff"] for k, v in control_post.items()
                     if isinstance(v, dict)},
        },
        "probe": probe,
        "steal": batch["steal_monitor"],
        "gate": gate,
    }))


if __name__ == "__main__":
    main()
