"""Two-cluster-size scaling bench (the BASELINE.json north_rule criterion).

No real multi-HOST cluster exists in this sandbox; the closest faithful
evidence is the ``--local-cluster`` mode (CANONICAL since round 4): the
identical flagship job on Spark's ``local-cluster[n, cores, mem]`` master at
n=1 vs n=4 — a real standalone master, n separate worker JVMs, n separate
CoarseGrainedExecutorBackend JVM processes, Spark's own scheduler/shuffle
between them, and the package shipped to executors as a --py-files zip (the
north_rule deployment shape).  Each leg is loadavg-gated and core-pinned to
its executor-core budget + 2 driver cores; efficiency = (rate_4N/rate_N)/4,
median of SCALING_BENCH_SAMPLES samples, min-of-RUNS within a leg.  The
executor JVM pids and Spark's executor registry are recorded as evidence
that the parallelism really crosses JVM boundaries.

The older hand-rolled emulation (default mode, kept for round-over-round
comparability) emulates executors as separate pinned processes on one box:

- **N leg**: one executor = one subprocess running Spark local[4], pinned to
  cores 0-3, processing the full pre-materialized corpus.
- **4N leg**: four executors = four concurrent subprocesses, each Spark
  local[4] pinned to its own disjoint 4-core set, each processing a disjoint
  hash shard (``pmod(xxhash64(url), 4) == k``) of the same corpus — exactly
  how a 4-executor cluster partitions by url-hash.  The leg's wall-clock is
  the slowest executor (stragglers count against us, as they would on a real
  cluster).

``efficiency = (rate_4N / rate_N) / 4`` (target >= 0.8).

A secondary single-JVM variant (local[4] vs local[16], both core-pinned) is
available via ``--single-jvm``; it under-reports because 16 workers in one
JVM/box share memory bandwidth that 4 real executor nodes would not.

Usage:
    python scripts/scaling_bench.py                 # executor-emulation mode
    python scripts/scaling_bench.py --single-jvm    # single-JVM levels mode
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_BENCH_DOCS", "8000"))
CORPUS_DIR = os.path.abspath(
    os.environ.get("SCALING_BENCH_CORPUS", ".bench/scaling_corpus")
)
CORES_PER_EXECUTOR = int(os.environ.get("SCALING_BENCH_EXEC_CORES", "6"))
N_EXECUTORS_BIG = 4
RUNS = int(os.environ.get("SCALING_BENCH_RUNS", "2"))
LEVELS = tuple(
    int(v) for v in os.environ.get("SCALING_BENCH_LEVELS", "4,16").split(",")
)


def materialize_corpus() -> None:
    from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session
    from sciencebeam_trainer_grobid_tools_spark.sources.corpus import corpus_dataframe

    if os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        return
    spark = build_session("scaling-corpus", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_dataframe(spark, N_DOCS, seed=42, partitions=64).write.mode(
        "overwrite"
    ).parquet(CORPUS_DIR)
    spark.stop()


def run_worker(cpus: int, shard: int, n_shards: int, runs: int) -> dict:
    """One 'executor': annotate (a shard of) the corpus `runs` times."""
    from pyspark.sql import functions as F

    from sciencebeam_trainer_grobid_tools_spark.plans.pipeline import annotate_documents
    from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session

    spark = build_session(
        "scaling-%d-%d" % (cpus, shard), cpus=cpus, shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(CORPUS_DIR)
    if n_shards > 1:
        docs = docs.filter(F.pmod(F.xxhash64("url"), F.lit(n_shards)) == shard)
    n_docs = docs.count()
    # warm-up pass: codegen + python workers + page cache
    annotate_documents(docs, repartition=cpus * 4).count()
    times = []
    for _ in range(runs):
        t0 = time.time()
        annotate_documents(docs, repartition=cpus * 4).agg(
            F.count(F.lit(1)).alias("docs")
        ).collect()
        times.append(time.time() - t0)
    spark.stop()
    return {"docs": n_docs, "runs_sec": [round(t, 2) for t in times]}


def _pids_of(pattern: str) -> list:
    out = subprocess.run(
        ["pgrep", "-f", pattern], capture_output=True, text=True
    ).stdout
    return sorted(int(p) for p in out.split())


def _proc_cpu(pid: int) -> float:
    """utime+stime of one process in seconds (0.0 if it exited)."""
    try:
        with open("/proc/%d/stat" % pid) as fh:
            f = fh.read().rsplit(")", 1)[1].split()
        return (int(f[11]) + int(f[12])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return 0.0


def _proc_threads(pid: int) -> int:
    try:
        with open("/proc/%d/status" % pid) as fh:
            for line in fh:
                if line.startswith("Threads:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _cpu_snapshot(roles: dict) -> dict:
    return {role: sum(_proc_cpu(p) for p in pids) for role, pids in roles.items()}


def _fetch_executor_metrics(ui_url: str, app_id: str) -> list:
    """Per-executor GC/task-time from the Spark REST API (the UI's
    /api/v1); empty list when the UI is off or the fetch fails."""
    import urllib.request

    try:
        with urllib.request.urlopen(
            "%s/api/v1/applications/%s/executors" % (ui_url, app_id), timeout=10
        ) as resp:
            data = json.load(resp)
        return [
            {
                "id": e.get("id"),
                "totalGCTime_ms": e.get("totalGCTime"),
                "totalDuration_ms": e.get("totalDuration"),
                "totalTasks": e.get("totalTasks"),
            }
            for e in data
        ]
    except Exception:
        return []


def run_cluster_worker(n_executors: int, runs: int) -> dict:
    """One leg of the REAL multi-JVM scaling sample: the flagship job on a
    ``local-cluster[n, c, mem]`` master — Spark standalone master + n worker
    JVMs + n separate CoarseGrainedExecutorBackend JVMs + a real shuffle
    service between them, with the package shipped to executors as a
    --py-files zip (the north_rule's deployment shape).  Unlike the
    hand-rolled executor emulation (run_executor_emulation), Spark does the
    scheduling/sharding itself; the result includes evidence that the
    executors really are separate JVM processes.

    Co-location fidelity (round 10): on a real cluster every executor JVM
    sits on its OWN c-core node, so ``Runtime.availableProcessors`` — which
    sizes the JVM's GC worker, JIT compiler, and ForkJoin pools — reads c.
    Under taskset on one box it reads the WHOLE pinned span (26 cores on
    the 4N leg), so four co-located executors each spawn ~full-host GC/JIT
    thread pools that contend.  ``-XX:ActiveProcessorCount=c`` restores the
    real-node value (exactly what cgroup-aware container deployments get
    automatically); SCALING_BENCH_ACP=0 disables it for A/B forensics.
    Each leg also records per-role /proc CPU-seconds over the timed runs
    (executors / worker daemons / python workers / driver) plus the REST
    API's per-executor GC time, so a scaling loss decomposes into named
    components instead of a bare ratio."""
    from pyspark.sql import SparkSession, functions as F

    from scripts.build_pyfiles_zip import build

    archive = build()
    c = CORES_PER_EXECUTOR
    use_acp = os.environ.get("SCALING_BENCH_ACP", "1") != "0"
    exec_java = "-XX:ActiveProcessorCount=%d" % c if use_acp else ""
    builder = (
        SparkSession.builder.master(
            "local-cluster[%d,%d,4096]" % (n_executors, c)
        )
        .appName("scaling-cluster-%d" % n_executors)
        .config("spark.executor.memory", "3g")
        .config("spark.driver.memory", "4g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_executors * c * 2))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        # UI on: the /api/v1 REST endpoint is the only per-executor GC
        # clock; equal overhead on both legs
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "0")
    )
    if exec_java:
        builder = builder.config("spark.executor.extraJavaOptions", exec_java)
    spark = builder.getOrCreate()
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    sc.addPyFile(archive)

    from sciencebeam_trainer_grobid_tools_spark.plans.pipeline import (
        annotate_documents,
    )

    docs = spark.read.parquet(CORPUS_DIR)
    n_docs = docs.count()
    # warm-up: executor registration, python workers, codegen, C-kernel
    # compile cache, page cache
    annotate_documents(docs, repartition=n_executors * c * 4).agg(
        F.count(F.lit(1))
    ).collect()
    roles = {
        "executors": _pids_of("CoarseGrainedExecutorBackend"),
        "worker_daemons": _pids_of("deploy.worker.Worker"),
        "python_workers": _pids_of("pyspark.daemon"),
        "driver_jvm": _pids_of("SparkSubmit"),
    }
    gc_before = _fetch_executor_metrics(sc.uiWebUrl, sc.applicationId)
    cpu_before = _cpu_snapshot(roles)
    times = []
    t_loop0 = time.time()
    for _ in range(runs):
        t0 = time.time()
        annotate_documents(docs, repartition=n_executors * c * 4).agg(
            F.count(F.lit(1)).alias("docs")
        ).collect()
        times.append(time.time() - t0)
    loop_wall = time.time() - t_loop0
    # python workers fork lazily; re-enumerate so late arrivals count
    roles["python_workers"] = _pids_of("pyspark.daemon")
    cpu_after = _cpu_snapshot(roles)
    gc_after = _fetch_executor_metrics(sc.uiWebUrl, sc.applicationId)
    gc_b = {e["id"]: e for e in gc_before}
    gc_delta = [
        {
            "id": e["id"],
            "gc_ms": (e["totalGCTime_ms"] or 0)
            - (gc_b.get(e["id"], {}).get("totalGCTime_ms") or 0),
            "task_ms": (e["totalDuration_ms"] or 0)
            - (gc_b.get(e["id"], {}).get("totalDuration_ms") or 0),
        }
        for e in gc_after
        if e["id"] != "driver"
    ]
    cpu_sec = {
        role: round(cpu_after[role] - cpu_before.get(role, 0.0), 1)
        for role in cpu_after
    }
    exec_threads = {p: _proc_threads(p) for p in roles["executors"]}
    # separate-JVM evidence: Spark's own executor registry (minus the
    # driver's block manager) + the executor backend OS processes
    reported = sc._jsc.sc().getExecutorMemoryStatus().size() - 1
    pids = roles["executors"]
    spark.stop()
    return {
        "docs": n_docs,
        "runs_sec": [round(t, 2) for t in times],
        "executor_jvms_reported": reported,
        "executor_jvm_pids": pids,
        "active_processor_count": c if use_acp else None,
        "forensics": {
            "loop_wall_sec": round(loop_wall, 2),
            "task_core_budget": n_executors * c,
            "pids_by_role": {r: len(p) for r, p in roles.items()},
            "cpu_sec_by_role": cpu_sec,
            "executor_cpu_utilization": round(
                cpu_sec.get("executors", 0.0)
                / (loop_wall * n_executors * c),
                3,
            ),
            "python_cpu_utilization": round(
                cpu_sec.get("python_workers", 0.0)
                / (loop_wall * n_executors * c),
                3,
            ),
            "executor_gc": gc_delta,
            "gc_share_of_task_time": round(
                sum(e["gc_ms"] for e in gc_delta)
                / max(1, sum(e["task_ms"] for e in gc_delta)),
                4,
            ),
            "executor_jvm_threads": exec_threads,
        },
    }


def _gate_load(max_load: float = 0.7, timeout: int = 900) -> float:
    """Wait for a quiet host (1-min loadavg under the gate); returns the
    loadavg that passed (or the last seen on timeout)."""
    waited = 0
    load = os.getloadavg()[0]
    while load > max_load and waited < timeout:
        time.sleep(10)
        waited += 10
        load = os.getloadavg()[0]
    return round(load, 2)


def run_local_cluster() -> None:
    """The canonical two-cluster-size sample on REAL separate executor JVMs:
    local-cluster[1,c,4096] vs local-cluster[4,c,4096], loadavg-gated,
    min-of-RUNS within each leg, median efficiency across samples.

    Pinning mirrors the emulation protocol: each leg is pinned to (its
    executor cores + 2 driver cores), so the N leg models one 6-core node
    (plus driver) and the 4N leg four of them."""
    c = CORES_PER_EXECUTOR
    n_samples = int(os.environ.get("SCALING_BENCH_SAMPLES", "3"))
    samples = []
    for s in range(n_samples):
        load_n = _gate_load()
        n_res = _result_of(
            _spawn("0-%d" % (c + 1), ["--cluster-worker", "1", str(RUNS)])
        )
        load_4n = _gate_load()
        big_res = _result_of(
            _spawn(
                "0-%d" % (N_EXECUTORS_BIG * c + 1),
                ["--cluster-worker", str(N_EXECUTORS_BIG), str(RUNS)],
            )
        )
        rate_n = n_res["docs"] / min(n_res["runs_sec"])
        rate_4n = big_res["docs"] / min(big_res["runs_sec"])
        eff = (rate_4n / rate_n) / N_EXECUTORS_BIG
        sample = {
            "sample": s + 1,
            "docs": n_res["docs"],
            "load_before_n_leg": load_n,
            "load_before_4n_leg": load_4n,
            "single_runs_sec": n_res["runs_sec"],
            "cluster_runs_sec": big_res["runs_sec"],
            "rate_n": round(rate_n, 1),
            "rate_4n": round(rate_4n, 1),
            "efficiency": round(eff, 3),
            "executor_jvms_n_leg": n_res["executor_jvms_reported"],
            "executor_jvms_4n_leg": big_res["executor_jvms_reported"],
            "executor_jvm_pids_4n_leg": big_res["executor_jvm_pids"],
            "active_processor_count": big_res.get("active_processor_count"),
            "forensics_n_leg": n_res.get("forensics"),
            "forensics_4n_leg": big_res.get("forensics"),
        }
        samples.append(sample)
        print(json.dumps(sample))
    effs = sorted(x["efficiency"] for x in samples)
    median = (
        effs[len(effs) // 2]
        if len(effs) % 2
        else (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    )
    print(
        json.dumps(
            {
                "mode": "local-cluster",
                "docs": samples[0]["docs"],
                "executors": [1, N_EXECUTORS_BIG],
                "cores_per_executor": c,
                "samples": samples,
                "efficiencies": effs,
                "median_efficiency": round(median, 3),
                "target": 0.8,
                "meets_target": median >= 0.8,
            }
        )
    )


def _spawn(cores: str, args: list) -> subprocess.Popen:
    return subprocess.Popen(
        ["taskset", "-c", cores, sys.executable, os.path.abspath(__file__)] + args,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def _result_of(proc: subprocess.Popen) -> dict:
    out, _ = proc.communicate()
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    return json.loads(lines[-1])


def run_executor_emulation() -> None:
    c = CORES_PER_EXECUTOR
    # N leg: one pinned executor, full corpus
    single = _result_of(
        _spawn("0-%d" % (c - 1), ["--worker", str(c), "0", "1", str(RUNS)])
    )
    single_sec = min(single["runs_sec"])
    rate_n = single["docs"] / single_sec
    # 4N leg: four pinned executors over disjoint hash shards, concurrently.
    procs = [
        _spawn(
            "%d-%d" % (k * c, k * c + c - 1),
            ["--worker", str(c), str(k), str(N_EXECUTORS_BIG), str(RUNS)],
        )
        for k in range(N_EXECUTORS_BIG)
    ]
    shard_results = [_result_of(p) for p in procs]
    total_docs = sum(r["docs"] for r in shard_results)
    assert total_docs == single["docs"], (total_docs, single["docs"])
    # per run, the leg's wall is the slowest executor
    per_run_wall = [max(r["runs_sec"][i] for r in shard_results) for i in range(RUNS)]
    big_sec = min(per_run_wall)
    rate_4n = total_docs / big_sec
    efficiency = (rate_4n / rate_n) / N_EXECUTORS_BIG
    print(
        json.dumps(
            {
                "mode": "executor-emulation",
                "docs": total_docs,
                "executors": [1, N_EXECUTORS_BIG],
                "cores_per_executor": c,
                "single_runs_sec": single["runs_sec"],
                "sharded_runs_wall_sec": [round(t, 2) for t in per_run_wall],
                "shard_docs": [r["docs"] for r in shard_results],
                "rate_n": round(rate_n, 1),
                "rate_4n": round(rate_4n, 1),
                "speedup": round(rate_4n / rate_n, 3),
                "efficiency": round(efficiency, 3),
                "target": 0.8,
                "meets_target": efficiency >= 0.8,
            }
        )
    )


def run_single_jvm_levels() -> None:
    results = {}
    for cpus in LEVELS:
        proc = _spawn("0-%d" % (cpus - 1), ["--worker", str(cpus), "0", "1", str(RUNS)])
        results[cpus] = _result_of(proc)
        print("local[%d]: %s" % (cpus, json.dumps(results[cpus])))
    rate_n = results[LEVELS[0]]["docs"] / min(results[LEVELS[0]]["runs_sec"])
    rate_4n = results[LEVELS[1]]["docs"] / min(results[LEVELS[1]]["runs_sec"])
    efficiency = (rate_4n / rate_n) / (LEVELS[1] / LEVELS[0])
    print(
        json.dumps(
            {
                "mode": "single-jvm",
                "docs": results[LEVELS[0]]["docs"],
                "levels": list(LEVELS),
                "rate_n": round(rate_n, 1),
                "rate_4n": round(rate_4n, 1),
                "speedup": round(rate_4n / rate_n, 3),
                "efficiency": round(efficiency, 3),
                "target": 0.8,
                "meets_target": efficiency >= 0.8,
            }
        )
    )


def run_interleaved_levels() -> None:
    """Noise-robust variant: alternate N-core and 4N-core runs so both legs
    sample the same neighbor-load windows, then report the median of the
    per-pair efficiencies (each pair = one N run + the 4N run right after
    it).  On a shared VM this bounds the bias a one-sided noise burst can
    introduce; min-of-legs (the default protocol) is kept for comparison."""
    pairs = []
    rates_n, rates_4n = [], []
    for _ in range(RUNS):
        n_res = _result_of(
            _spawn("0-%d" % (LEVELS[0] - 1), ["--worker", str(LEVELS[0]), "0", "1", "1"])
        )
        big_res = _result_of(
            _spawn("0-%d" % (LEVELS[1] - 1), ["--worker", str(LEVELS[1]), "0", "1", "1"])
        )
        rate_n = n_res["docs"] / n_res["runs_sec"][0]
        rate_4n = big_res["docs"] / big_res["runs_sec"][0]
        rates_n.append(rate_n)
        rates_4n.append(rate_4n)
        pairs.append((rate_4n / rate_n) / (LEVELS[1] / LEVELS[0]))
        print("pair: rate_n=%.1f rate_4n=%.1f eff=%.3f" % (rate_n, rate_4n, pairs[-1]))
    pairs.sort()
    median = pairs[len(pairs) // 2] if len(pairs) % 2 else (
        (pairs[len(pairs) // 2 - 1] + pairs[len(pairs) // 2]) / 2
    )
    best_eff = (max(rates_4n) / max(rates_n)) / (LEVELS[1] / LEVELS[0])
    print(
        json.dumps(
            {
                "mode": "interleaved",
                "levels": list(LEVELS),
                "pair_efficiencies": [round(p, 3) for p in pairs],
                "median_efficiency": round(median, 3),
                "best_of_legs_efficiency": round(best_eff, 3),
                "target": 0.8,
                "meets_target": median >= 0.8,
            }
        )
    )


def main() -> None:
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        cpus, shard, n_shards, runs = (int(v) for v in sys.argv[i + 1 : i + 5])
        print(json.dumps(run_worker(cpus, shard, n_shards, runs)))
        return
    if "--cluster-worker" in sys.argv:
        i = sys.argv.index("--cluster-worker")
        n_executors, runs = (int(v) for v in sys.argv[i + 1 : i + 3])
        print(json.dumps(run_cluster_worker(n_executors, runs)))
        return
    materialize_corpus()
    if "--local-cluster" in sys.argv:
        run_local_cluster()
    elif "--interleaved" in sys.argv:
        run_interleaved_levels()
    elif "--single-jvm" in sys.argv:
        run_single_jvm_levels()
    else:
        run_executor_emulation()


if __name__ == "__main__":
    main()
