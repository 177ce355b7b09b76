"""Corpus-scale BPE tokenizer training (Sennrich, Haddow, Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Training a tokenizer IS a corpus-scale job: the corpus folds into a
(word, count) table once, and every merge iteration is a pair-count
aggregation over that table — at web scale the distinct-word table is
10^7-10^8 rows, which is exactly the regime where the iteration belongs
in Spark rather than a driver-side dict.

Design:

- ``bpe_train`` reduces the corpus to word counts (ONE shuffle over the
  corpus — the only time the corpus is read), seeds each word as its
  character symbols plus an end-of-word sentinel, then iterates: pair
  counts (codegen explode + partial-aggregated sum, weighted by word
  count), deterministic best pair (max count, lexicographic tie-break —
  retraining reproduces the model), and a codegen ``aggregate`` fold
  applying the merge left-to-right non-overlapping to every word.  The
  per-iteration driver traffic is ONE (pair, count) row — the model
  statistic; the word table stays in Spark, persisted per iteration and
  released as soon as the next materializes (lineage stays one step
  deep).
- ``bpe_encode`` applies the learned merge list to documents.  Encoding
  is data-dependent sequential rewriting per token — the honest Pandas
  UDF case — so it runs as ONE Arrow-batched ``mapInPandas`` with the
  merge list broadcast in the closure, emitting (doc_id, n_tokens,
  n_subwords).  No shuffle at all: encode is a map.

The pure-python reference implementation in the tests is the
correctness oracle (the iterative construction has no closed SQL form).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

END_OF_WORD = "</w>"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    tok = F.explode(
        F.split(F.replace(F.col(text_col), F.lit("\n"), F.lit(" ")), " ")
    ).alias("word")
    return (
        df.select(tok)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _seed_symbols() -> "F.Column":
    chars = F.split(F.col("word"), "")
    return F.concat(
        F.filter(chars, lambda c: c != ""), F.array(F.lit(END_OF_WORD))
    )


def _apply_merge(syms, a: str, b: str):
    """Left-to-right non-overlapping single-rule application as a codegen
    fold: append x, unless the accumulator ends with ``a`` and x == b —
    then replace that tail element with the merged symbol."""
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(a)) & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                F.array(merged),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> List[Tuple[str, str]]:
    """The learned merge list, most-frequent first.  Stops early when no
    pair reaches ``min_pair_count`` (the corpus is fully compressed).

    Latency honesty: each merge is ONE Spark job ending in a 1-row
    collect, so a production vocabulary is ``n_merges`` sequential jobs
    over the persisted word table — at 50k merges the driver round-trip
    latency (seconds per job) dominates, not the data.  That is the
    honest distributed-BPE shape: iterating in Spark only pays off when
    the word table itself is cluster-sized (10^7-10^8 distinct words);
    for smaller vocabularies, collect the word-count table once and run
    the merge loop driver-side on the counts (the standard practice —
    the (word, count) table, not the corpus, is all BPE ever needs)."""
    words = _word_counts(df, text_col).select(
        _seed_symbols().alias("syms"), F.col("n")
    )
    words = words.persist()
    words.count()
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = words.select(
            F.col("n"),
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.get("syms", i - 1).alias("a"),
                            F.get("syms", i).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        nxt = words.select(_apply_merge(F.col("syms"), a, b).alias("syms"), "n")
        nxt = nxt.persist()
        nxt.count()
        words.unpersist()
        words = nxt
    words.unpersist()
    return merges


def bpe_encode_stats(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document subword statistics under the learned merges:
    (doc_id, n_tokens, n_subwords) — the compression the tokenizer
    achieves, which is what corpus-mixing recipes budget on.  The output
    id field keeps the INPUT id column's type (a string-keyed corpus
    stays string-keyed — no silent bigint coercion)."""
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    merge_list = [tuple(m) for m in merges]

    def batches(it):
        for pdf in it:
            out = []
            for row in pdf.itertuples(index=False):
                words = [w for w in row.text.replace("\n", " ").split(" ") if w]
                n_sub = 0
                for w in words:
                    syms = list(w) + [END_OF_WORD]
                    for a, b in merge_list:
                        i, nxt = 0, []
                        while i < len(syms):
                            if (
                                i + 1 < len(syms)
                                and syms[i] == a
                                and syms[i + 1] == b
                            ):
                                nxt.append(a + b)
                                i += 2
                            else:
                                nxt.append(syms[i])
                                i += 1
                        syms = nxt
                    n_sub += len(syms)
                out.append(
                    {
                        "doc_id": row.doc_id,
                        "n_tokens": len(words),
                        "n_subwords": n_sub,
                    }
                )
            yield pd.DataFrame(out, columns=["doc_id", "n_tokens", "n_subwords"])

    return df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).mapInPandas(
        batches, "doc_id %s, n_tokens int, n_subwords int" % id_type
    )
