"""Sequence packing (operators/packing.py): pure-python differential
over the GPT-style concat-and-chunk semantics, eod/pad/drop modes,
multi-chunk giant documents, bucket-count invariance (the distributed
prefix sum must not depend on the fan-out), element-type preservation
and plan shape."""

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.operators.packing import (
    pack_sequences,
    shuffle_sequences,
    write_training_shards,
)
from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session


@pytest.fixture(scope="module")
def spark():
    session = build_session("packing-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


def ref_pack(docs, seq_len, eod_id=None, pad_id=None, drop_incomplete=False):
    """Reference packer: concatenate in order, slice, track doc spans."""
    stream, bounds = [], []  # bounds: (doc, global_start, n)
    for doc_id, toks in sorted(docs):
        toks = list(toks or [])
        if eod_id is not None:
            toks = toks + [eod_id]
        if toks:
            bounds.append((doc_id, len(stream), len(toks)))
            stream.extend(toks)
    out = []
    for seq_id in range(0, (len(stream) + seq_len - 1) // seq_len):
        lo, hi = seq_id * seq_len, min((seq_id + 1) * seq_len, len(stream))
        toks = stream[lo:hi]
        spans = []
        for doc_id, start, n in bounds:
            s, e = max(start, lo), min(start + n, hi)
            if e > s:
                spans.append((doc_id, s - lo, e - s))
        n_tokens = len(toks)
        if drop_incomplete and n_tokens < seq_len:
            continue
        if pad_id is not None and n_tokens < seq_len:
            toks = toks + [pad_id] * (seq_len - n_tokens)
        out.append((seq_id, toks, n_tokens, len(spans), spans))
    return out


def as_rows(result_df):
    rows = result_df.orderBy("seq_id").collect()
    return [
        (
            r["seq_id"],
            list(r["token_ids"]),
            r["n_tokens"],
            r["n_docs"],
            [(s["doc"], s["start"], s["n"]) for s in r["doc_spans"]],
        )
        for r in rows
    ]


def make_df(spark, docs):
    return spark.createDataFrame(
        [(d, list(t) if t is not None else None) for d, t in docs],
        "doc_id long, token_ids array<int>",
    )


DOCS = [
    (1, [10, 11, 12]),
    (2, [20]),
    (3, [30, 31, 32, 33, 34, 35, 36]),  # spans a chunk boundary at L=4
    (4, []),
    (5, [50, 51]),
]


class TestDifferential:
    @pytest.mark.parametrize("seq_len", [3, 4, 8, 100])
    @pytest.mark.parametrize("eod_id", [None, 99])
    def test_matches_reference(self, spark, seq_len, eod_id):
        got = as_rows(
            pack_sequences(make_df(spark, DOCS), seq_len, eod_id=eod_id)
        )
        assert got == ref_pack(DOCS, seq_len, eod_id=eod_id)

    def test_giant_doc_spans_many_chunks(self, spark):
        docs = [(1, [1, 2]), (2, list(range(100, 131))), (3, [3])]
        got = as_rows(pack_sequences(make_df(spark, docs), 5))
        assert got == ref_pack(docs, 5)
        # the giant doc contributes one fragment to each covered chunk
        covered = [r for r in got if any(d == 2 for d, _, _ in r[4])]
        assert len(covered) == 7

    def test_null_token_array_treated_as_empty(self, spark):
        docs = [(1, [1, 2, 3]), (2, None), (3, [4, 5])]
        got = as_rows(pack_sequences(make_df(spark, docs), 4, eod_id=9))
        assert got == ref_pack([(1, [1, 2, 3]), (2, []), (3, [4, 5])], 4, eod_id=9)


class TestModes:
    def test_pad_fills_final_chunk_only(self, spark):
        got = as_rows(pack_sequences(make_df(spark, DOCS), 4, pad_id=0))
        ref = ref_pack(DOCS, 4, pad_id=0)
        assert got == ref
        assert all(len(r[1]) == 4 for r in got)
        assert got[-1][2] < 4  # n_tokens reports REAL tokens

    def test_drop_incomplete(self, spark):
        got = as_rows(
            pack_sequences(make_df(spark, DOCS), 4, drop_incomplete=True)
        )
        assert got == ref_pack(DOCS, 4, drop_incomplete=True)
        assert all(r[2] == 4 for r in got)

    def test_pad_and_drop_mutually_exclusive(self, spark):
        with pytest.raises(ValueError):
            pack_sequences(make_df(spark, DOCS), 4, pad_id=0, drop_incomplete=True)

    def test_seq_len_validated(self, spark):
        with pytest.raises(ValueError):
            pack_sequences(make_df(spark, DOCS), 0)


class TestDistribution:
    def test_bucket_count_invariance(self, spark):
        """The prefix sum's fan-out must never change values — the
        distributed-correctness pin for the two-pass design."""
        docs = [(i, list(range(i % 7))) for i in range(200)]
        df = make_df(spark, docs).repartition(8)
        expected = ref_pack(docs, 16, eod_id=99)
        for buckets in (1, 3, 16):
            got = as_rows(
                pack_sequences(df, 16, eod_id=99, buckets=buckets)
            )
            assert got == expected

    def test_unsorted_input_partitions(self, spark):
        """Order comes from order_col, not from input layout."""
        docs = [(i, [i] * (1 + i % 4)) for i in range(50)]
        df = make_df(spark, list(reversed(docs))).repartition(7)
        assert as_rows(pack_sequences(df, 8)) == ref_pack(docs, 8)

    def test_string_order_key_matches_reference(self, spark):
        """url-keyed packing (the north-star table's key is a string):
        stream order follows the string key's byte order; the byte-prefix
        bucket surrogate is balance-only.  Keys share a >7-byte prefix on
        purpose — the LCP-stripping surrogate must still spread them
        (all keys would otherwise collapse into ONE bucket), and the
        exact within-bucket ordering does the correctness work."""
        docs = [
            ("https://example.org/p/%04d" % i, [i % 6] * (1 + i % 5))
            for i in range(120)
        ]
        df = spark.createDataFrame(
            list(reversed(docs)), "doc_id string, token_ids array<int>"
        ).repartition(6)
        expected = ref_pack(docs, 16, eod_id=99)
        for buckets in (1, 4, 16):
            got = as_rows(pack_sequences(df, 16, eod_id=99, buckets=buckets))
            assert got == expected, buckets
        # doc spans carry the string key through
        first = pack_sequences(df, 16, eod_id=99).orderBy("seq_id").first()
        assert first["doc_spans"][0]["doc"] == docs[0][0]

    def test_string_keys_divergent_prefixes(self, spark):
        """Hosts differing in the first byte land in surrogate order;
        mixes short and long keys (the rpad path)."""
        keys = ["a", "ab", "b", "aa/long/suffix", "z" * 20, "m.example"]
        docs = [(k, [len(k)] * 3) for k in keys]
        df = spark.createDataFrame(docs, "doc_id string, token_ids array<int>")
        assert as_rows(pack_sequences(df, 5, buckets=4)) == ref_pack(docs, 5)

    def test_string_keys_surrogate_ties_after_lcp(self, spark):
        """Surrogate ties survive LCP stripping when min/max keys do not
        share the group prefix (a shared-prefix cluster + an outlier):
        the whole cluster ties into one bucket and the exact key order
        still decides — values must be identical at every bucket count.
        The second key set makes one key EXACTLY the common prefix
        (empty suffix -> surrogate 0)."""
        tie_keys = ["a/xxxxxxxxx%d" % i for i in range(9)] + ["b", "a/"]
        prefix_is_key = ["a/"] + ["a/x%d" % i for i in range(9)]
        for keys in (tie_keys, prefix_is_key):
            docs = sorted((k, [1, 2, 3]) for k in keys)
            df = spark.createDataFrame(
                list(reversed(docs)), "doc_id string, token_ids array<int>"
            ).repartition(3)
            expected = ref_pack(docs, 7, eod_id=9)
            for buckets in (1, 3, 8):
                got = as_rows(pack_sequences(df, 7, eod_id=9, buckets=buckets))
                assert got == expected, (keys[0], buckets)

    def test_default_buckets_tolerates_non_numeric_conf(self):
        """'auto' under AQE-managed platforms must fall back to the
        cluster's default parallelism, not crash."""
        from sciencebeam_trainer_grobid_tools_spark.operators.packing import (
            _default_buckets,
        )

        class FakeConf:
            def get(self, key):
                return "auto"

        class FakeSC:
            defaultParallelism = 12

        class FakeSpark:
            conf = FakeConf()
            sparkContext = FakeSC()

        assert _default_buckets(FakeSpark()) == 12


class TestSchema:
    def test_element_type_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, [1000000000000, 2]), (2, [3])],
            "doc_id long, token_ids array<long>",
        )
        out = pack_sequences(df, 4, eod_id=7, pad_id=0)
        assert dict(out.dtypes)["token_ids"] == "array<bigint>"
        assert as_rows(out) == ref_pack(
            [(1, [1000000000000, 2]), (2, [3])], 4, eod_id=7, pad_id=0
        )

    def test_empty_input(self, spark):
        df = make_df(spark, []).limit(0)
        assert pack_sequences(df, 4).count() == 0

    def test_no_python_in_row_path(self, spark):
        plan = (
            pack_sequences(make_df(spark, DOCS), 4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestShards:
    def test_shard_membership_and_manifest(self, spark, tmp_path):
        docs = [(i, [i % 5] * (1 + i % 3)) for i in range(100)]
        packed = pack_sequences(make_df(spark, docs), 8)
        out = str(tmp_path / "shards")
        manifest = write_training_shards(packed, out, seqs_per_shard=4)
        rows = manifest.collect()
        n_seqs = packed.count()
        assert sum(r["n_seqs"] for r in rows) == n_seqs
        for r in rows:
            # membership is seq_id // 4, shards dense and bounded
            assert r["seq_min"] // 4 == r["shard"]
            assert r["seq_max"] // 4 == r["shard"]
            assert r["n_seqs"] <= 4
        # one parquet data file per shard directory
        import glob as globmod

        for d in globmod.glob(out + "/shard=*"):
            files = [
                f
                for f in globmod.glob(d + "/*")
                if f.endswith(".parquet") or "part-" in f
            ]
            assert len([f for f in files if "part-" in f]) == 1
        # written bytes roundtrip: same sequences come back
        back = spark.read.parquet(out)
        assert back.count() == n_seqs
        got = {
            r["seq_id"]: list(r["token_ids"])
            for r in back.select("seq_id", "token_ids").collect()
        }
        want = {
            r["seq_id"]: list(r["token_ids"])
            for r in packed.select("seq_id", "token_ids").collect()
        }
        assert got == want

    def test_shuffle_matches_md5_rank_reference(self, spark):
        """shuffle_sequences re-keys every window to its global
        md5(salt:seq_id) rank — verified against hashlib over the whole
        table, with window payloads carried through unchanged."""
        import hashlib

        docs = [(i, [i] * (1 + i % 4)) for i in range(150)]
        packed = pack_sequences(make_df(spark, docs), 8).withColumn(
            "orig", F.col("seq_id")
        )
        shuffled = shuffle_sequences(packed, salt="s1")
        rows = shuffled.collect()
        orig_ids = [r["seq_id"] for r in packed.select("seq_id").collect()]
        want_rank = {
            o: r
            for r, o in enumerate(
                sorted(
                    orig_ids,
                    key=lambda o: (
                        hashlib.md5(("s1:%d" % o).encode()).hexdigest(),
                        o,
                    ),
                )
            )
        }
        assert {r["orig"]: r["seq_id"] for r in rows} == want_rank
        # a permutation: dense 0-based ids, nothing lost
        assert sorted(r["seq_id"] for r in rows) == list(
            range(len(orig_ids))
        )
        # payloads ride along untouched
        by_orig = {
            r["seq_id"]: list(r["token_ids"])
            for r in packed.select("seq_id", "token_ids").collect()
        }
        for r in rows:
            assert list(r["token_ids"]) == by_orig[r["orig"]]

    def test_shuffle_deterministic_and_salt_redeals(self, spark):
        docs = [(i, [i] * 2) for i in range(120)]
        packed = pack_sequences(make_df(spark, docs), 8).withColumn(
            "orig", F.col("seq_id")
        )

        def perm(salt):
            return {
                r["orig"]: r["seq_id"]
                for r in shuffle_sequences(packed, salt=salt).collect()
            }

        a, b = perm("x"), perm("x")
        assert a == b  # re-running reproduces the permutation
        c = perm("y")
        assert c != a  # a new salt re-deals
        assert sorted(c.values()) == sorted(a.values())

    def test_shuffle_single_payload_exchange(self, spark):
        """The payload must cross the wire once: one hash Exchange (the
        bucket-keyed window) plus a broadcast of the base offsets —
        no global sort, no second payload shuffle."""
        packed = pack_sequences(
            make_df(spark, [(i, [i]) for i in range(40)]), 4
        ).localCheckpoint()
        plan = (
            shuffle_sequences(packed, salt="p")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        assert len(re.findall(r"\bExchange hashpartitioning", plan)) == 1
        assert "Exchange rangepartitioning" not in plan  # no global sort

    def test_shuffled_shards_sample_globally(self, spark, tmp_path):
        """Wired through prepare_training_data(shuffle_salt=...):
        shard membership stays exact-size seq_id // N, but each shard
        now holds a spread of ORIGINAL stream positions rather than a
        contiguous run."""
        docs = [(i, [i % 7] * 3) for i in range(200)]
        packed = pack_sequences(make_df(spark, docs), 8).withColumn(
            "orig", F.col("seq_id")
        )
        shuffled = shuffle_sequences(packed, salt="sh")
        out = str(tmp_path / "shuf")
        manifest = write_training_shards(shuffled, out, seqs_per_shard=16)
        assert all(r["n_seqs"] <= 16 for r in manifest.collect())
        back = spark.read.parquet(out)
        spread = {
            r["shard"]: r["spread"]
            for r in back.groupBy("shard")
            .agg((F.max("orig") - F.min("orig")).alias("spread"))
            .collect()
        }
        n = packed.count()
        # a contiguous slice would have spread == 15; a global sample's
        # min-max range spans most of the stream in every shard
        assert all(s > n // 2 for s in spread.values()), spread

    def test_seqs_per_shard_validated(self, spark, tmp_path):
        with pytest.raises(ValueError):
            write_training_shards(
                pack_sequences(make_df(spark, DOCS), 4),
                str(tmp_path / "x"),
                seqs_per_shard=0,
            )


class TestOrderKeyContract:
    """pack_sequences' unique-non-null order-key precondition now fails
    fast inside the already-running length aggregate instead of silently
    corrupting offsets through the _ord join fan-out."""

    def test_duplicate_order_keys_raise(self, spark):
        df = make_df(spark, [(1, [10, 11]), (1, [20, 21]), (2, [30])])
        with pytest.raises(ValueError, match="duplicate key"):
            pack_sequences(df, 4).collect()

    def test_null_order_keys_raise(self, spark):
        df = spark.createDataFrame(
            [(1, [10, 11]), (None, [20, 21])],
            "doc_id long, token_ids array<int>",
        )
        with pytest.raises(ValueError, match="NULL key"):
            pack_sequences(df, 4).collect()

    def test_unique_keys_still_pack(self, spark):
        rows = pack_sequences(make_df(spark, DOCS), 4).collect()
        assert rows  # the guard must not reject valid input
