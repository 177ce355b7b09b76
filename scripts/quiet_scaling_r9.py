"""Round-9 clean-host re-validation of the two-cluster-size scaling
criterion (BASELINE.json north_rule): the canonical local-cluster
protocol (scripts/scaling_bench.py --local-cluster, 64k corpus, REAL
separate executor JVMs at n=1 vs n=4), with the round-8 forensics
formalized — the whole batch is gated on loadavg AND a /proc/stat
steal window, and a continuous steal monitor runs through every
attempt so the sample carries its own host-conditions evidence
instead of needing after-the-fact diagnosis.

Writes BENCH/quiet_scaling_r9.json.

Usage: python scripts/quiet_scaling_r9.py
Env: SCALING_SAMPLES (default 3)
"""

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "BENCH", "quiet_scaling_r9.json")
sys.path.insert(0, REPO)

from bench import _StealMonitor, _gate_quiet  # noqa: E402


def main() -> None:
    samples = int(os.environ.get("SCALING_SAMPLES", "3"))
    gate = _gate_quiet(timeout=1800.0)
    monitor = _StealMonitor()
    monitor.start()
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
    monitor.stop()
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    per_sample = [json.loads(ln) for ln in lines[:-1]] if len(lines) > 1 else []
    summary = json.loads(lines[-1]) if lines else {"error": proc.stderr[-800:]}
    result = {
        "protocol": (
            "local-cluster REAL multi-JVM samples (canonical since round 4): "
            "identical flagship job on Spark local-cluster[n,6,4096] at n=1 "
            "vs n=4, separate executor JVMs (pids recorded), package via "
            "addPyFile zip, core-pinned legs, warm-up then min-of-2 per leg. "
            "ROUND 9: batch gated on loadavg<=0.7 AND /proc/stat steal<=1% "
            "(the gate the r8 forensics called for), with a continuous 5s "
            "steal monitor across all attempts recorded below."
        ),
        "gate": gate,
        "wall_sec": round(time.time() - t0, 1),
        "steal_monitor": monitor.stats(),
        "samples": per_sample,
        "summary": summary,
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps({"median": summary.get("median_efficiency"),
                      "effs": summary.get("efficiencies"),
                      "steal": result["steal_monitor"],
                      "gate": gate}))


if __name__ == "__main__":
    main()
