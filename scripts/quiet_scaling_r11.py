"""Round-11 scaling evidence: one gated 64k local-cluster batch at the
r11 tip under the round-10 interleaved protocol (kernel control before and
after the Spark batch in the same gated window, per-leg engine forensics,
-XX:ActiveProcessorCount on executors).

The r11 tip carries the optimization-round kernel changes (exact-occurrence
fast paths, field-plan cache, pre-spread corpus), so this batch verifies the
two-cluster-size criterion still holds with the faster per-doc kernel — a
faster kernel shifts the compute/coordination ratio toward coordination,
which is exactly what could regress the 4N efficiency.

Re-running APPENDS a batch to BENCH/quiet_scaling_r11.json (seeded with the
pooled r10 batches the criterion was met on).

Usage: python scripts/quiet_scaling_r11.py
Env: SCALING_SAMPLES (default 3), SCALING_BENCH_ACP (default 1)
"""

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_PATH = os.path.join(REPO, "BENCH", "quiet_scaling_r11.json")
R10_PATH = os.path.join(REPO, "BENCH", "quiet_scaling_r10.json")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

import quiet_scaling_r10 as r10  # noqa: E402

if __name__ == "__main__":
    # seed the pooled history from r10 so compute_headline reports the
    # cross-round pooled median alongside this round's fresh batch
    if not os.path.exists(OUT_PATH) and os.path.exists(R10_PATH):
        shutil.copy(R10_PATH, OUT_PATH)
    r10.OUT_PATH = OUT_PATH
    r10.R10_PROTOCOL = r10.R10_PROTOCOL + (
        " ROUND 11: one confirming batch at the optimization-round tip "
        "(fast-path kernel), appended to the pooled r10 history."
    )
    r10.main()
