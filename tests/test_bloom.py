"""Portable Bloom seen-set (operators/bloom.py): exact-negative
guarantee, membership correctness, a pure-python bitset differential,
FP-rate sanity and plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.operators import bloom
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session


@pytest.fixture(scope="module")
def spark():
    session = build_session("bloom-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


def ref_position(key, seed, m_bits):
    return int(hashlib.md5(("%d:%s" % (seed, key)).encode()).hexdigest()[:8], 16) % m_bits


def ref_build(keys, m_bits, k):
    words = [0] * (m_bits // 32)
    for key in keys:
        for i in range(k):
            p = ref_position(key, i, m_bits)
            words[p // 32] |= 1 << (p % 32)
    return words


def ref_contains(words, key, m_bits, k):
    return all(
        (words[ref_position(key, i, m_bits) // 32]
         >> (ref_position(key, i, m_bits) % 32)) & 1
        for i in range(k)
    )


SEEN = ["https://a.com/%d" % i for i in range(200)]
PROBE = SEEN[:50] + ["https://b.org/%d" % i for i in range(300)]


class TestBloom:
    def test_bitset_matches_python_reference(self, spark):
        df = spark.createDataFrame([(u,) for u in SEEN], "url string")
        words = bloom.bloom_build(df, m_bits=4096, k=3)
        assert words == ref_build(SEEN, 4096, 3)

    def test_membership_no_false_negatives(self, spark):
        df = spark.createDataFrame([(u,) for u in SEEN], "url string")
        words = bloom.bloom_build(df, m_bits=4096, k=3)
        probes = spark.createDataFrame([(u,) for u in PROBE], "url string")
        got = {
            r.url: r.hit
            for r in probes.select(
                "url",
                bloom.bloom_contains(words, F.col("url"), 4096, 3).alias("hit"),
            ).collect()
        }
        for u in SEEN[:50]:
            assert got[u] is True  # exact-negative structure: no FN ever
        for u in PROBE[50:]:
            assert got[u] == ref_contains(words, u, 4096, 3)

    def test_false_positive_rate_in_expected_range(self, spark):
        df = spark.createDataFrame([(u,) for u in SEEN], "url string")
        words = bloom.bloom_build(df, m_bits=4096, k=3)
        fps = sum(
             1 for u in PROBE[50:] if ref_contains(words, u, 4096, 3)
        )
        # (1 - e^{-kn/m})^k ~ 0.037 at n=200, m=4096, k=3; 300 probes
        assert fps < 40

    def test_contains_is_pure_codegen(self, spark):
        words = [0] * 128
        df = spark.createDataFrame([("x",)], "url string")
        plan = (
            df.select(bloom.bloom_contains(words, F.col("url"), 4096, 3))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

    def test_build_shuffles_word_rows_only(self, spark):
        df = spark.createDataFrame([(u,) for u in SEEN], "url string")
        words = bloom.bloom_build(df, m_bits=64, k=2)
        assert len(words) == 2  # m/32 words regardless of corpus size
        assert any(words)

    def test_invalid_m_bits(self, spark):
        df = spark.createDataFrame([("x",)], "url string")
        with pytest.raises(ValueError):
            bloom.bloom_build(df, m_bits=100)


class TestNullKeys:
    def test_null_keys_ignored_in_build(self, spark):
        df = spark.createDataFrame(
            [(u,) for u in SEEN] + [(None,), (None,)], "url string"
        )
        assert bloom.bloom_build(df, m_bits=4096, k=3) == ref_build(SEEN, 4096, 3)
