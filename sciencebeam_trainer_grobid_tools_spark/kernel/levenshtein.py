"""Levenshtein ratio (contract of ``sciencebeam_alignment.levenshtein``,
used by the reference's quality checks: annotation/checks.py:5,168).

In the Spark plan, prefer the built-in ``F.levenshtein`` column function when
both operands are columns; this python version runs inside the annotate UDF
where the entity text is only available mid-kernel.
"""

from __future__ import annotations

import numpy as np


def levenshtein_distance(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    a_codes = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    b_codes = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    previous = np.arange(b_codes.size + 1, dtype=np.int32)
    current = np.empty_like(previous)
    idx = np.arange(previous.size, dtype=np.int32)
    for i, ca in enumerate(a_codes, start=1):
        current[0] = i
        substitution = previous[:-1] + (b_codes != ca)
        np.minimum(substitution, previous[1:] + 1, out=current[1:])
        # in-row insertion dependency (current[j-1] + 1 chains) is a prefix
        # scan with unit cost: current[j] = min_k<=j (cand[k] + (j - k))
        #                                = cummin(cand[k] - k) + j
        np.minimum(current, np.minimum.accumulate(current - idx) + idx, out=current)
        previous, current = current, previous
    return int(previous[-1])


def levenshtein_ratio(a: str, b: str) -> float:
    max_len = max(len(a), len(b))
    if not max_len:
        return 1.0
    return 1.0 - levenshtein_distance(a, b) / max_len
