"""Round-9 clean-host re-validation of the two-cluster-size scaling
criterion (BASELINE.json north_rule): the canonical local-cluster
protocol (scripts/scaling_bench.py --local-cluster, 64k corpus, REAL
separate executor JVMs at n=1 vs n=4), with the round-8 forensics
formalized — each batch is gated on loadavg AND a /proc/stat steal
window, a continuous steal monitor runs through every attempt, and a
memory-bandwidth probe (numpy triad, aggregate GB/s at 6 vs 24
concurrent workers) is taken before the batch so a sub-target result
carries its own host diagnosis: steal covers CPU theft, the probe
covers the shared-bandwidth ceiling steal cannot see (the r8 lesson —
36% spread on identical runs at 4% steal).

Re-running APPENDS a batch to BENCH/quiet_scaling_r9.json (earlier
batches are evidence, not noise) and recomputes the headline over all
batches' samples.

Usage: python scripts/quiet_scaling_r9.py
Env: SCALING_SAMPLES (default 3)
"""

import json
import multiprocessing as mp
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "BENCH", "quiet_scaling_r9.json")
sys.path.insert(0, REPO)

from bench import _StealMonitor, _gate_quiet  # noqa: E402

PROTOCOL = (
    "local-cluster REAL multi-JVM samples (canonical since round 4): "
    "identical flagship job on Spark local-cluster[n,6,4096] at n=1 "
    "vs n=4, separate executor JVMs (pids recorded), package via "
    "addPyFile zip, core-pinned legs, warm-up then min-of-2 per leg. "
    "ROUND 9: each batch gated on loadavg<=0.7 AND /proc/stat "
    "steal<=1%, continuous 5s steal monitor through every attempt, "
    "plus a pre-batch memory-bandwidth probe (triad GB/s at 1/6/24 "
    "workers) — the contention axis steal cannot see."
)

_TRIAD_N = 30_000_000  # 240 MB per array — far beyond LLC


def _triad_rate(dur: float = 2.5) -> float:
    import numpy as np

    a = np.zeros(_TRIAD_N)
    b = np.ones(_TRIAD_N)
    c = np.ones(_TRIAD_N)
    np.multiply(c, 2.5, out=a)
    a += b
    reps = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < dur:
        np.multiply(c, 2.5, out=a)
        a += b
        reps += 1
    dt = time.perf_counter() - t0
    # ~5 array passes of 8*N bytes per rep (2 reads + 2 writes + RFO)
    return reps * 5 * 8 * _TRIAD_N / dt / 1e9


def _bw_worker(q, barrier) -> None:
    barrier.wait()
    q.put(_triad_rate())


def _bw_aggregate(nw: int) -> float:
    q = mp.Queue()
    barrier = mp.Barrier(nw)
    ps = [mp.Process(target=_bw_worker, args=(q, barrier)) for _ in range(nw)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in range(nw)]
    for p in ps:
        p.join()
    return sum(rates)


def bandwidth_probe() -> dict:
    """Triad GB/s single / 6-worker / 24-worker aggregate — the same
    core counts as the N and 4N legs.  scaling_6_to_24 near 1.0 means
    the box can feed 24 bandwidth-hungry cores at 4x the 6-core
    aggregate today; well under 1.0 means a shared-bandwidth ceiling
    (neighbor VM pressure) that will depress the 4N leg no matter how
    low steal reads."""
    out = {"single_GBps": round(_triad_rate(), 2)}
    for nw in (6, 24):
        out["agg_%dw_GBps" % nw] = round(_bw_aggregate(nw), 2)
    out["scaling_6_to_24"] = round(
        out["agg_24w_GBps"] / (4 * out["agg_6w_GBps"]), 3
    )
    return out


def compute_headline(batches: list) -> dict:
    """Pooled + per-protocol (executor core count) efficiency stats over
    every batch's samples; each N->4N pair is its own protocol row so a
    6-core and a 4-core batch never average into one number."""
    per_cores: dict = {}
    for b in batches:
        cores = b.get("exec_cores", 6)
        for s in b.get("samples", []):
            if isinstance(s, dict) and "efficiency" in s:
                per_cores.setdefault(cores, []).append(s["efficiency"])
    protocols = {}
    for cores, effs in sorted(per_cores.items()):
        effs = sorted(effs)
        protocols["%dc_to_%dc" % (cores, 4 * cores)] = {
            "efficiencies": effs,
            "median": effs[len(effs) // 2],
            "max": effs[-1],
            "n_samples": len(effs),
            "meets_target": effs[len(effs) // 2] >= 0.8,
        }
    best = max(
        (p["median"] for p in protocols.values()), default=None
    )
    return {
        "per_protocol": protocols,
        "best_protocol_median": best,
        "target": 0.8,
        "meets_target": bool(best and best >= 0.8),
    }


def main() -> None:
    samples = int(os.environ.get("SCALING_SAMPLES", "3"))
    gate = _gate_quiet(timeout=1800.0)
    probe = bandwidth_probe()
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
    batch = {
        "exec_cores": int(os.environ.get("SCALING_BENCH_EXEC_CORES", "6")),
        "gate": gate,
        "bandwidth_probe": probe,
        "wall_sec": round(time.time() - t0, 1),
        "steal_monitor": monitor.stats(),
        "samples": per_sample,
        "summary": summary,
    }

    # append to any earlier batches in the round file
    batches = []
    if os.path.exists(OUT_PATH):
        try:
            with open(OUT_PATH) as fh:
                prev = json.load(fh)
            if "batches" in prev:
                batches = prev["batches"]
            elif "samples" in prev:  # first-run single-batch layout
                batches = [{k: prev[k] for k in (
                    "gate", "wall_sec", "steal_monitor", "samples", "summary"
                ) if k in prev}]
        except (OSError, ValueError):
            pass
    batches.append(batch)

    result = {
        "protocol": PROTOCOL,
        "batches": batches,
        "headline": compute_headline(batches),
    }
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps({"headline": result["headline"],
                      "this_batch_median":
                          summary.get("median_efficiency"),
                      "probe": probe,
                      "steal": batch["steal_monitor"],
                      "gate": gate}))


def kernel_forensic() -> None:
    """Append a SPARK-FREE control to the round file: the raw C
    alignment kernel under plain multiprocessing at the same two
    protocol widths (bench_dp_nt.contention — no JVM, no shuffle, no
    Python rows).  If the bare kernel cannot scale 4x at 24 workers on
    this box today, no engine can; the delta between the Spark batches
    and this control is the engine's own scaling loss."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import bench_dp_nt as dp

    gate = _gate_quiet(timeout=900.0)
    section = {"gate": gate, "needle_len": 1000, "nt_kernel": True}
    for lo, hi in ((4, 16), (6, 24)):
        low = dp.contention(True, lo, 1000)
        high = dp.contention(True, hi, 1000)
        section["%dw_to_%dw" % (lo, hi)] = {
            "agg_low_calls_s": round(low, 1),
            "agg_high_calls_s": round(high, 1),
            "scaling_eff": round(high / low / 4.0, 3),
        }
    with open(OUT_PATH) as fh:
        result = json.load(fh)
    result.setdefault("sparkfree_kernel_control", []).append(section)
    with open(OUT_PATH, "w") as fh:
        json.dump(result, fh, indent=2)
        fh.write("\n")
    print(json.dumps(section))


if __name__ == "__main__":
    if "--kernel-forensic" in sys.argv:
        kernel_forensic()
    else:
        main()
