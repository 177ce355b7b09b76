"""End-to-end training-prep plan (plans/training_prep.py): packing
integrity vs an independent python reference, leakage guards (host
split + train-only tokenizer), shard writing, artifact layout."""

import hashlib

import pytest
from pyspark.sql import functions as F

from sciencebeam_trainer_grobid_tools_spark.plans.session import build_session
from sciencebeam_trainer_grobid_tools_spark.plans.training_prep import (
    EOD,
    prepare_training_data,
)


@pytest.fixture(scope="module")
def spark():
    session = build_session("training-prep-tests", cpus=4, shuffle_partitions=4)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()


def ref_split(host: str, fractions, salt: str = "split") -> str:
    """Reference md5-uniform host draw (mirrors operators/urlfilter.py
    host_split, independently via hashlib)."""
    u = int(
        hashlib.md5(("%s:%s" % (salt, host)).encode()).hexdigest()[:8], 16
    ) / float(16 ** 8)
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        if u < cum:
            return name
    return fractions[-1][0]


def ref_encode(text: str, merges, tok2id) -> list:
    """Reference BPE encode: chars + </w>, merges applied in order
    left-to-right non-overlapping, unknown symbols -> id 0."""
    ids = []
    for w in [w for w in (text or "").replace("\n", " ").split(" ") if w]:
        syms = list(w) + ["</w>"]
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        ids.extend(tok2id.get(s, 0) for s in syms)
    return ids


def ref_pack(docs, seq_len, eod_id):
    """Reference concat-and-chunk over (url, ids) docs in url order:
    windows of the concatenated stream + per-window (doc, start, n)
    spans."""
    stream, spans = [], []
    for url, ids in sorted(docs):
        start = len(stream)
        stream.extend(ids + [eod_id])
        spans.append((url, start, len(ids) + 1))
    out = {}
    for w in range((len(stream) + seq_len - 1) // seq_len):
        toks = stream[w * seq_len: (w + 1) * seq_len]
        wspans = []
        for url, start, n in spans:
            lo, hi = max(start, w * seq_len), min(start + n, (w + 1) * seq_len)
            if hi > lo:
                wspans.append((url, lo - w * seq_len, hi - lo))
        out[w] = (toks, sorted(wspans, key=lambda s: s[1]))
    return out


SPLITS = [("train", 0.7), ("val", 0.3)]


@pytest.fixture(scope="module")
def corpus(spark):
    """12 docs over 6 hosts; url-keyed, text from a tiny vocabulary so
    n_merges=3 learns real merges."""
    rows = []
    for i in range(12):
        host = "h%d.example.com" % (i % 6)
        url = "http://%s/page/%d" % (host, i)
        text = ("the cat sat on the mat " * (i % 3 + 1)).strip()
        if i % 4 == 0:
            text += "\nthe cat ran"
        rows.append((i, url, text))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


class TestTrainingPrep:
    def test_packing_matches_python_reference(self, spark, corpus):
        prep = prepare_training_data(
            corpus, seq_len=16, curation=None, splits=SPLITS, n_merges=3
        )
        tok2id = {r["token"]: r["token_id"] for r in prep.vocab.collect()}
        assert tok2id[EOD] == prep.eod_id == max(tok2id.values())
        docs = {
            r["url"]: (r["url"], self._host(r["url"]), r["text"])
            for r in corpus.collect()
        }
        by_split = {"train": [], "val": []}
        for url, (u, host, text) in docs.items():
            by_split[ref_split(host, SPLITS)].append(
                (u, ref_encode(text, prep.merges, tok2id))
            )
        for name in ("train", "val"):
            expected = ref_pack(by_split[name], 16, prep.eod_id)
            got = {
                r["seq_id"]: (
                    list(r["token_ids"]),
                    [(s["doc"], s["start"], s["n"]) for s in r["doc_spans"]],
                )
                for r in prep.packed[name].collect()
            }
            assert got == expected, name
        prep.unpersist()

    @staticmethod
    def _host(url):
        return url.split("://")[1].split("/")[0].lower()

    def test_split_is_leakage_safe_by_host(self, spark, corpus):
        prep = prepare_training_data(
            corpus, seq_len=16, curation=None, splits=SPLITS, n_merges=0
        )
        pairs = {
            (self._host(r["url"]), r["split"])
            for r in prep.curated.select("url", "split").collect()
        }
        hosts = {h for h, _ in pairs}
        assert len(pairs) == len(hosts)  # every host in exactly one split
        prep.unpersist()

    def test_tokenizer_trains_on_train_split_only(self, spark):
        """A character that appears ONLY on validation hosts must be
        absent from the vocabulary (the tokenizer never saw validation
        text) and encode to <unk> (id 0) in the validation stream."""
        val_host = next(
            "only%d.example.com" % i
            for i in range(100)
            if ref_split("only%d.example.com" % i, SPLITS) == "val"
        )
        train_host = next(
            "tr%d.example.com" % i
            for i in range(100)
            if ref_split("tr%d.example.com" % i, SPLITS) == "train"
        )
        rows = [
            (0, "http://%s/a" % train_host, "plain words here"),
            (1, "http://%s/b" % val_host, "zζz words here"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string, text string")
        prep = prepare_training_data(
            df, seq_len=8, curation=None, splits=SPLITS, n_merges=0
        )
        tokens = {r["token"] for r in prep.vocab.collect()}
        assert "ζ" not in tokens and "z" not in tokens
        val_ids = prep.packed["val"].select(
            F.explode("token_ids").alias("t")
        ).collect()
        assert any(r["t"] == 0 for r in val_ids)  # <unk> hits
        prep.unpersist()

    def test_shards_written_deterministically(self, spark, corpus, tmp_path):
        prep = prepare_training_data(
            corpus,
            seq_len=8,
            curation=None,
            splits=[("train", 1.0), ("val", 0.0)],
            n_merges=0,
            output_path=str(tmp_path / "shards"),
            seqs_per_shard=4,
        )
        man = {
            r["shard"]: (r["n_seqs"], r["seq_min"], r["seq_max"])
            for r in prep.manifests["train"].collect()
        }
        for shard, (n_seqs, lo, hi) in man.items():
            assert lo == shard * 4 and hi - lo + 1 == n_seqs <= 4
        # partition-pruned read of one shard only
        one = spark.read.parquet(str(tmp_path / "shards" / "train")).where(
            F.col("shard") == 0
        )
        assert one.count() == man[0][0]
        assert prep.packed["val"].count() == 0  # empty split: no crash
        prep.unpersist()

    def test_curation_floor_composes(self, spark):
        """curation={} runs scrub + quality: a short doc dies before
        tokenization; the survivor's PII is scrubbed in the curated
        table the split/encode stages consume."""
        good = (
            "This is a perfectly ordinary paragraph of running prose that "
            "keeps going for long enough to clear the length floor and "
            "reads like ordinary text mail bob@example.com now please."
        )
        rows = [
            (0, "http://a.example.com/x", good),
            (1, "http://b.example.com/y", "too short"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string, text string")
        prep = prepare_training_data(
            df, seq_len=16, curation={}, splits=[("train", 1.0), ("val", 0.0)],
            n_merges=0,
        )
        curated = prep.curated.collect()
        assert [r["doc_id"] for r in curated] == [0]
        assert "bob@example.com" not in curated[0]["text"]
        assert "<EMAIL>" in curated[0]["text"]
        # the packed stream covers exactly the curated survivor
        spans = prep.packed["train"].select(F.explode("doc_spans").alias("s"))
        assert {r["s"]["doc"] for r in spans.collect()} == {
            "http://a.example.com/x"
        }
        prep.unpersist()

    def test_shuffle_salt_re_keys_per_split(self, spark, corpus):
        """shuffle_salt re-keys each split's packed windows to a dense
        md5-rank permutation (window CONTENT unchanged — same windows,
        new ids), per-split salted so train and val permutations are
        independent, and deterministic across runs."""
        plain = prepare_training_data(
            corpus, seq_len=16, curation=None, splits=SPLITS, n_merges=0
        )
        shuf = prepare_training_data(
            corpus, seq_len=16, curation=None, splits=SPLITS, n_merges=0,
            shuffle_salt="s",
        )
        again = prepare_training_data(
            corpus, seq_len=16, curation=None, splits=SPLITS, n_merges=0,
            shuffle_salt="s",
        )
        for name in ("train", "val"):
            def windows(prep):
                return {
                    r["seq_id"]: list(r["token_ids"])
                    for r in prep.packed[name].collect()
                }

            p, s, a = windows(plain), windows(shuf), windows(again)
            assert s == a  # deterministic
            assert sorted(s) == sorted(p) == list(range(len(p)))
            # same multiset of windows, re-keyed (not a no-op when
            # there is more than one window to permute)
            assert sorted(map(tuple, s.values())) == sorted(
                map(tuple, p.values())
            )
            if len(p) > 4:
                assert s != p
        plain.unpersist()
        shuf.unpersist()
        again.unpersist()

    def test_curated_lineage_is_cut(self, spark, corpus):
        """persist_curated must TRUNCATE lineage, not merely cache: every
        downstream branch (per-split encode, packing's multi-pass) would
        otherwise embed its own full copy of the curation expression
        tree, and a ten-stage config compounds the union plan into tens
        of MB — enough to exhaust a default-sized (1 GiB) driver heap.
        Pin that the packed plan reads a materialized-RDD leaf and that
        its analyzed tree stays orders of magnitude below the blowup."""
        prep = prepare_training_data(
            corpus, seq_len=16, curation={}, splits=SPLITS, n_merges=0
        )
        for name in ("train", "val"):
            analyzed = prep.packed[name]._jdf.queryExecution().analyzed()
            text = analyzed.toString()
            # the curation stages must NOT appear in the packed branch —
            # the scrub placeholder is a curation-only literal
            assert "<EMAIL>" not in text
            # the hygiene-floor curation tree alone is ~100k chars; a
            # per-branch copy would put each packed plan well above this
            assert len(text) < 60_000, len(text)
        # opting out keeps full lineage: curation appears per branch
        raw = prepare_training_data(
            corpus, seq_len=16, curation={}, splits=SPLITS, n_merges=0,
            persist_curated=False,
        )
        t = raw.packed["train"]._jdf.queryExecution().analyzed().toString()
        assert "<EMAIL>" in t
        prep.unpersist()

    def test_vocab_ids_unique_and_reproducible(self, spark, corpus):
        a = prepare_training_data(
            corpus, seq_len=16, curation=None, splits=SPLITS, n_merges=4
        )
        b = prepare_training_data(
            corpus, seq_len=16, curation=None, splits=SPLITS, n_merges=4
        )
        va = sorted((r["token_id"], r["token"]) for r in a.vocab.collect())
        vb = sorted((r["token_id"], r["token"]) for r in b.vocab.collect())
        assert va == vb  # retraining on the same corpus reproduces ids
        ids = [i for i, _ in va]
        toks = [t for _, t in va]
        assert len(set(ids)) == len(ids) and len(set(toks)) == len(toks)
        a.unpersist()
        b.unpersist()
