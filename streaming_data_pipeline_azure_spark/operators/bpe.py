"""Distributed BPE (byte-pair-encoding) tokenizer induction: the
vocabulary-learning step of every modern LLM tokenizer (GPT-2/Llama
style), run as Spark aggregations over the corpus word histogram.

Why this shape scales: BPE statistics are a pure function of the
DISTINCT-WORD histogram, not the corpus — so the corpus is scanned
ONCE into (word, count) (one hash shuffle, map-side combined; vocab
grows ~Heaps-law sublinearly, millions of rows at 100 TB where the
corpus is billions), and every merge round after that runs on the
histogram only: one adjacent-pair aggregation (shuffle keyed by the
pair) + a 1-row argmax collect (bounded, documented) + a codegen HOF
fold that applies the merge left-to-right greedily inside each word —
no Python in the loop, no per-document state, nothing driver-side but
the single winning pair per round.

``bpe_top_pairs`` (round-0 statistics) is oracle-checked exactly;
``bpe_train``'s iterated merges have no closed-form SQL twin and are
anchored by hand-computed fixtures + the invariant that round 1's
winner equals the top-pairs entry (tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def word_histogram(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(w, n) distinct-word counts over whitespace-split lowercased
    text — the sufficient statistic for BPE. Words shorter than 2
    characters carry no pairs and are dropped."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_top_pairs(
    docs: DataFrame, *, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Top-k adjacent CHARACTER pairs weighted by word frequency —
    exactly the statistic BPE's first merge maximizes (and the oracle
    anchor for :func:`bpe_train`). Returns (pair, n_occurrences),
    count-desc then pair-asc (fully deterministic under ties).

    Plan: word histogram (one shuffle) → per-word position explode →
    ``substring(w, i, 2)`` (codegen, no arrays materialized) → pair
    aggregation → TakeOrderedAndProject."""
    wc = word_histogram(docs, text_col=text_col)
    pairs = wc.select(
        F.expr("explode(sequence(1, length(w) - 1))").alias("i"),
        "w",
        "n",
    ).select(F.expr("substring(w, i, 2)").alias("pair"), "n")
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").cast("long").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(k)
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """(left, right, total) adjacent-symbol pair counts over a
    (symbols array<string>, n) histogram."""
    return (
        sym.select(
            F.explode(
                F.arrays_zip(
                    F.slice(
                        F.col("symbols"),
                        F.lit(1),
                        F.size("symbols") - 1,
                    ).alias("left"),
                    F.expr(
                        "slice(symbols, 2, size(symbols) - 1)"
                    ).alias("right"),
                )
            ).alias("p"),
            "n",
        )
        .select(
            F.col("p.left").alias("left"),
            F.col("p.right").alias("right"),
            "n",
        )
        .groupBy("left", "right")
        .agg(F.sum("n").cast("long").alias("total"))
    )


def _apply_merge(left: str, right: str):
    """Column expression replacing every adjacent (left, right) in the
    ``symbols`` array with the merged token, left-to-right greedily
    (the standard BPE application order: 'aaa' under (a,a) becomes
    [aa, a]) — a codegen fold, no UDF."""
    l_, r_ = F.lit(left), F.lit(right)
    return F.aggregate(
        F.col("symbols"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, F.size(acc)) == l_)
            & (x == r_),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.concat(l_, r_)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    *,
    n_merges: int = 10,
    min_pair_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus: per round, count
    adjacent symbol pairs on the word histogram, pick the most frequent
    (ties: left-asc then right-asc, so training is a pure function of
    the corpus), apply it greedily, repeat. Stops early when the best
    pair drops under ``min_pair_count``. Returns (merge_rank, left,
    right, pair_count) — the merge table callers feed to a tokenizer.

    The only driver-side data is ONE winning (left, right, count) row
    per round (`.limit(1).collect()` — bounded by construction);
    lineage is truncated per round with ``localCheckpoint`` so the HOF
    fold stack doesn't double the plan each merge."""
    spark = docs.sparkSession
    sym = (
        word_histogram(docs, text_col=text_col)
        .select(
            F.expr("filter(split(w, ''), x -> x != '')").alias(
                "symbols"
            ),
            "n",
        )
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(sym)
            .orderBy(
                F.desc("total"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .collect()
        )
        if not best or best[0]["total"] < min_pair_count:
            break
        left, right, total = (
            best[0]["left"],
            best[0]["right"],
            best[0]["total"],
        )
        merges.append((rank, left, right, int(total)))
        sym = sym.select(
            _apply_merge(left, right).alias("symbols"), "n"
        ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, pair_count long",
    )
