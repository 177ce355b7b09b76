"""Canonical loadavg-gated two-cluster-size scaling protocol (round 3).

Round 2 produced an ensemble of scaling estimates whose spread (0.52-1.07)
was dominated by invisible VM-neighbor load.  This wrapper makes ONE
loadavg-gated sample per mode the headline instead:

- wait until the 1-minute load average is below a threshold (the box is
  otherwise idle: anything above it is a neighbor or a leftover process),
- run the mode's full measurement (scripts/scaling_bench.py),
- record load before/after; a sample only counts as quiet if it STARTED
  quiet (the after-value includes our own run).

Modes: ``single-jvm`` (local[N] vs local[4N], both core-pinned) and
``executor-emulation`` (1 vs 4 pinned JVMs over disjoint url-hash shards —
the closest single-box proxy for N vs 4N executors).  Results land in
``BENCH/quiet_scaling_r3.json``; bench.py embeds the committed file into
its one-line JSON so the round's BENCH_r{N}.json records the pinned sample.

Usage: python scripts/quiet_scaling.py [--max-load 0.7] [--attempts 3]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "BENCH", "quiet_scaling_r3.json")


def load1() -> float:
    with open("/proc/loadavg") as fh:
        return float(fh.read().split()[0])


def wait_quiet(max_load: float, poll: float = 15.0, timeout: float = 1800.0) -> float:
    t0 = time.time()
    while True:
        load = load1()
        if load <= max_load:
            return load
        if time.time() - t0 > timeout:
            return load  # give up waiting; sample will be flagged not-quiet
        time.sleep(poll)


def run_mode(mode_flag, max_load, attempts, env=None):
    for attempt in range(attempts):
        load_before = wait_quiet(max_load)
        cmd = [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py")]
        if mode_flag:
            cmd.append(mode_flag)
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO,
            env={**os.environ, **(env or {})},
        )
        lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        sample = json.loads(lines[-1]) if lines else {"error": proc.stderr[-500:]}
        sample["load_before"] = load_before
        sample["load_after"] = load1()
        sample["quiet_start"] = load_before <= max_load
        sample["attempt"] = attempt + 1
        if sample["quiet_start"] and "error" not in sample:
            return sample
    return sample


def main() -> None:
    max_load = 0.7
    attempts = 3
    if "--max-load" in sys.argv:
        max_load = float(sys.argv[sys.argv.index("--max-load") + 1])
    if "--attempts" in sys.argv:
        attempts = int(sys.argv[sys.argv.index("--attempts") + 1])

    result = {
        "protocol": "loadavg-gated single samples (canonical, round 3); "
        "ensemble from round 2 kept as context in BENCH/BASELINE.md",
        "max_load_gate": max_load,
        "samples": {},
    }
    result["samples"]["single_jvm"] = run_mode("--single-jvm", max_load, attempts)
    result["samples"]["executor_emulation"] = run_mode(None, max_load, attempts)

    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
