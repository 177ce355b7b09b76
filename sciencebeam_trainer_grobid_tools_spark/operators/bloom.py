"""Portable Bloom-filter seen-set — the approximate-membership
structure a 10^12-URL pipeline uses where an exact distinct/anti-join
is too expensive (cross-crawl "have we seen this URL" checks, frontier
filtering, decontamination pre-screens; Bloom 1970).

Spark-first shape:

- :func:`bloom_build` — the bitset builds in ONE partial-aggregated
  shuffle whose payload is (word index, word) pairs — at most
  ``m_bits/32`` rows regardless of corpus size (the map side already
  ORs each partition's bits together) — and collects to the driver as a
  small model artifact, exactly like the IVF centroid tables.
- :func:`bloom_contains` — membership is a pure-codegen conjunction of
  k bit tests against the literal word array: no join, no shuffle, no
  Python; the scan side of a 100 TB probe reads only the key column.

Hashing is the repo's PORTABLE pattern (md5 hex prefix -> 32-bit int,
seeded per hash function), so DuckDB replays bitset construction AND
membership bit-for-bit — false positives included, which is what makes
the gate entry hash-checkable.  Words are 32-bit values carried in
BIGINTs: both engines' left shifts stay clear of the sign bit (DuckDB
overflow-checks ``1 << 63``).

False-positive rate: the standard (1 - e^{-k n / m})^k — callers size
``m_bits`` for their n; the operator is exact-negative (a False is
always truly unseen).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, functions as F

WORD_BITS = 32


def _position(col: Column, seed: int, m_bits: int) -> Column:
    """Portable hash position i: md5('<i>:' || key) hex prefix as a
    32-bit int, mod m."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("%d:" % seed), col)), 1, 8),
            16,
            10,
        ).cast("long")
        % m_bits
    )


def bloom_build(
    df: DataFrame, col: str = "url", m_bits: int = 4096, k: int = 3
) -> List[int]:
    """Build the bitset over ``df[col]`` -> list of m_bits/32 words."""
    if m_bits % WORD_BITS:
        raise ValueError("m_bits must be a multiple of %d" % WORD_BITS)
    positions = F.array(
        *[_position(F.col(col), i, m_bits) for i in range(k)]
    )
    # NULL keys carry no membership information and would otherwise
    # surface as a NULL word-index row that breaks the driver-side fold
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(positions).alias("p"))
        .select(
            (F.col("p") / WORD_BITS).cast("long").alias("w"),
            (F.col("p") % WORD_BITS).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), F.col("b")
                )
            ).alias("word")
        )
        .collect()
    )
    words = [0] * (m_bits // WORD_BITS)
    for r in rows:
        words[r.w] = r.word
    return words


def bloom_contains(
    words: Sequence[int], col: Column, m_bits: int, k: int = 3
) -> Column:
    """True when every one of the k probe bits is set — pure codegen
    against the literal word array (the driver-side model artifact)."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for i in range(k):
        pos = _position(col, i, m_bits)
        word = F.element_at(arr, (pos / WORD_BITS).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, (pos % WORD_BITS).cast("int")
        )
        cond = cond & ((bit.bitwiseAND(F.lit(1))) == 1)
    return cond
