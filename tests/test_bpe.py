"""BPE tokenizer induction (operators/bpe.py)."""

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators.bpe import (
    bpe_top_pairs,
    bpe_train,
    word_histogram,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_word_histogram_normalizes_and_filters(spark):
    docs = _docs(spark, ["The the  THE a", "the cat"])
    got = {r["w"]: r["n"] for r in word_histogram(docs).collect()}
    assert got == {"the": 4, "cat": 1}  # 'a' dropped (len < 2)


def test_top_pairs_hand_computed(spark):
    """'abab' x3 + 'ab' x2: pair counts are ab=8 (weighted by word
    freq), ba=3."""
    docs = _docs(spark, ["abab abab abab", "ab ab"])
    got = [
        (r["pair"], r["n_occurrences"])
        for r in bpe_top_pairs(docs, k=5).collect()
    ]
    assert got == [("ab", 8), ("ba", 3)]


def test_train_merges_hand_computed(spark):
    """Corpus 'low low low lower lowest': merges follow max pair count
    with (count desc, left asc, right asc) tie order, and the fold
    applies merges left-to-right greedily."""
    docs = _docs(spark, ["low low low lower lowest"])
    m = [
        (r["merge_rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=3).collect()
    ]
    # counts: lo=5, ow=5, we=2, er=1, es=1, st=1 -> tie lo/ow broken
    # by left asc -> (l,o) first; then (lo,w)=5; then (e,r)/(e,s) tie
    # at 2? no: after merging lo,w -> 'low': pairs low+e (2), e+r(1),
    # e+s(1), s+t(1) -> (low,e)=2
    assert m[0] == (1, "l", "o", 5)
    assert m[1] == (2, "lo", "w", 5)
    assert m[2] == (3, "low", "e", 2)


def test_train_greedy_overlap(spark):
    """'aaa': the (a,a) merge applies left-to-right -> [aa, a], so the
    second round's top pair is (aa, a)."""
    docs = _docs(spark, ["aaa aaa"])
    m = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train(docs, n_merges=2, min_pair_count=1).collect()
    ]
    assert m[0] == ("a", "a", 4)  # two per word, NOT double-counted 2x2
    assert m[1] == ("aa", "a", 2)


def test_train_round1_equals_top_pairs(spark):
    """Cross-operator anchor: the first learned merge IS the argmax of
    the oracle-checked round-0 statistic (on tie-free data)."""
    docs = _docs(
        spark,
        ["the quick brown fox", "the lazy dog", "the end the"],
    )
    top = bpe_top_pairs(docs, k=1).collect()[0]
    first = bpe_train(docs, n_merges=1).collect()[0]
    assert first["left"] + first["right"] == top["pair"]
    assert first["pair_count"] == top["n_occurrences"]


def test_train_stops_below_min_count(spark):
    """All pairs unique -> with min_pair_count=2 nothing merges."""
    docs = _docs(spark, ["ab cd ef"])
    assert bpe_train(docs, n_merges=5).count() == 0


def test_bpe_encode_words_fixture(spark):
    """Hand-computed greedy application in rank order: 'aaab' under
    merges [(a,a), (aa,a)] -> [aaa, b]; 'abab' under [(a,b)] ->
    [ab, ab]."""
    from streaming_data_pipeline_azure_spark.operators.bpe import (
        bpe_encode_words,
    )

    words = spark.createDataFrame([("aaab",), ("abab",)], "w string")
    got = {
        r["w"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_encode_words(
            words, [("a", "a"), ("aa", "a"), ("a", "b")]
        ).collect()
    }
    # 'aaab': aa+a -> [aa,a,b] after merge1? greedy L2R on chars:
    # [a,a,a,b] -> merge (a,a): [aa,a,b]; merge (aa,a): [aaa,b];
    # merge (a,b) no adjacent (a,b) left.
    assert got["aaab"] == (["aaa", "b"], 2)
    # 'abab': merge (a,a) no-op; (aa,a) no-op; (a,b): [ab,ab]
    assert got["abab"] == (["ab", "ab"], 2)


def test_bpe_encode_round_trip_and_trainer_parity(spark, sf_dir):
    """Concatenated tokens reproduce every word (lossless), token
    counts fall monotonically with more merges, and encoding with the
    trained merges reaches the trainer's own compressed symbol count."""
    from pyspark.sql import functions as F

    from streaming_data_pipeline_azure_spark.operators.bpe import (
        bpe_encode_words,
        bpe_token_stats,
        bpe_train,
        merges_from_df,
        word_histogram,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = merges_from_df(bpe_train(docs, n_merges=6))
    assert len(merges) >= 1
    vocab = word_histogram(docs).select("w")
    enc = bpe_encode_words(vocab, merges)
    bad = enc.filter(
        F.concat_ws("", F.col("tokens")) != F.col("w")
    ).count()
    assert bad == 0
    # monotone: more merges never increases the total token count
    totals = []
    for k in (0, 3, len(merges)):
        s = bpe_token_stats(docs, merges[:k]).agg(
            F.sum("n_tokens")
        ).collect()[0][0]
        totals.append(s)
    assert totals[0] >= totals[1] >= totals[2]
    # zero merges: every token is a character
    zero = bpe_token_stats(docs, []).filter(
        F.col("n_tokens") != F.col("n_chars")
    ).count()
    assert zero == 0
