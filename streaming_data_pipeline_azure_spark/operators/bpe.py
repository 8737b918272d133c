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

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df


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
    return local_rows_df(
        spark,
        merges,
        "merge_rank int, left string, right string, pair_count long",
    )


def merges_from_df(merges: DataFrame) -> list[tuple[str, str]]:
    """Materialize a :func:`bpe_train` result as the rank-ordered merge
    list :func:`bpe_encode_words` consumes. Bounded by construction —
    the merge table has one row per trained merge (n_merges total)."""
    return [
        (r["left"], r["right"])
        for r in merges.orderBy("merge_rank").collect()
    ]


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str]], *, word_col: str = "w"
) -> DataFrame:
    """Tokenize each distinct word with a trained merge list: start
    from characters, apply every merge in rank order with the SAME
    left-to-right greedy fold the trainer used (:func:`_apply_merge`),
    so encode(corpus words) reproduces the trainer's final symbol
    stream exactly (parity-tested). Adds ``tokens array<string>`` and
    ``n_tokens``.

    Everything is codegen — the fold chain is n_merges HOF expressions
    over the per-word symbol array, no Python, no shuffle (a pure
    per-row projection). ``localCheckpoint`` every few merges truncates
    the expression stack exactly as the trainer does, keeping Janino
    compile time linear in the merge count."""
    out = words.withColumn(
        "symbols",
        F.expr(f"filter(split({word_col}, ''), x -> x != '')"),
    )
    for i, (left, right) in enumerate(merges):
        out = out.withColumn("symbols", _apply_merge(left, right))
        if (i + 1) % 4 == 0:
            out = out.localCheckpoint()
    return out.select(
        *words.columns,
        F.col("symbols").alias("tokens"),
        F.size("symbols").cast("long").alias("n_tokens"),
    )


def bpe_token_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token accounting under a trained BPE vocabulary:
    (id, n_words, n_chars, n_tokens, chars_per_token) — the
    cost-estimation pass every training-data pipeline runs before
    budgeting a tokenizer change.

    Token counts are a pure function of the WORD, so the encoder runs
    once per DISTINCT word (the Heaps-law histogram, exactly the
    trainer's working set) and the corpus-sized side only carries
    (doc, word) rows into one equi-join against the encoded vocabulary
    — the corpus is never re-encoded per occurrence. Words under 2
    chars are single tokens by construction (the trainer never merges
    across them)."""
    doc_words = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("w"),
    ).filter(F.length("w") >= 1)
    vocab = bpe_encode_words(
        doc_words.select("w").distinct().filter(F.length("w") >= 2),
        merges,
    ).select("w", "n_tokens")
    joined = doc_words.join(vocab, "w", "left").select(
        id_col,
        F.length("w").cast("long").alias("__chars"),
        F.coalesce(F.col("n_tokens"), F.lit(1)).alias("__toks"),
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum("__chars").cast("long").alias("n_chars"),
        F.sum("__toks").cast("long").alias("n_tokens"),
        (
            F.sum("__chars").cast("double")
            / F.sum("__toks").cast("double")
        ).alias("chars_per_token"),
    )
