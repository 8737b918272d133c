"""Unit tests for text analysis (X4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators import text as tx

DOCS = [
    (1, "the quick brown fox and the lazy dog", "en"),
    (2, "el perro y el gato en la casa", "es"),
    (3, "der Hund und die Katze ist nicht da", "de"),
    (4, "  spaced   out\ttext  ", "en"),
    (5, "!!! ??? ###", "xx"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_token_count(spark):
    got = {
        r["doc_id"]: r["n"]
        for r in _df(spark).select("doc_id", tx.token_count("text").alias("n")).collect()
    }
    assert got[1] == 8
    assert got[4] == 3  # whitespace collapsed by trim+split
    assert got[5] == 3


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")], ["id", "text"]
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", tx.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_language_id(spark):
    got = {
        r["doc_id"]: r["lid"]
        for r in _df(spark).select("doc_id", tx.language_id("text").alias("lid")).collect()
    }
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "de"
    assert got[5] == "de"  # zero hits everywhere → alphabetically first


def test_quality_score_ranges(spark):
    rows = tx.quality_score(_df(spark)).collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0, r
    by_id = {r["doc_id"]: r for r in rows}
    # fluent English prose scores above punctuation soup
    assert by_id[1]["quality_score"] > by_id[5]["quality_score"]
    assert by_id[5]["punct_ratio"] > 0.5


def test_corpus_stats(spark):
    got = {r["lang"]: r for r in tx.corpus_stats(_df(spark)).collect()}
    assert got["en"]["n_docs"] == 2
    assert got["en"]["total_tokens"] == 11
    assert got["es"]["avg_chars"] == 29.0


def test_pii_redaction_and_counts(spark):
    rows = [
        (1, "mail me at jo.doe+x@mail.example.org thanks"),
        (2, "call +1 555-010-0000 or 555-123-4567 today"),
        (3, "id 42 is clean prose with small numbers 7"),
        (4, "both a@b.io and 555-010-9999 here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            tx.count_emails("text").alias("ne"),
            tx.count_phones("text").alias("np"),
            tx.redact_pii("text").alias("clean"),
        ).collect()
    }
    assert out[1]["ne"] == 1 and "<EMAIL>" in out[1]["clean"]
    assert "jo.doe" not in out[1]["clean"]
    assert out[2]["np"] == 2 and out[2]["clean"].count("<PHONE>") == 2
    assert out[3]["ne"] == 0 and out[3]["np"] == 0
    assert out[3]["clean"] == rows[2][1]  # untouched
    # email redacts before the phone pass so digit runs inside an
    # address never split into a partial <PHONE>
    assert out[4]["clean"] == "both <EMAIL> and <PHONE> here"


def test_redact_pii_extended_typed_tags_and_ordering(spark):
    """Card numbers must get the typed <CARD> tag even though a separated
    card is also a phone-shaped digit run (ordering: email, card, phone,
    IP); dotted quads never match the phone pattern."""
    from streaming_data_pipeline_azure_spark.operators import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "pay with 4111 1111 1111 1111 or 4111111111111111, "
             "call +1 555-010-0000, host 192.168.0.1, a@b.com")],
        ["id", "text"],
    )
    [row] = df.select(
        tx.redact_pii_extended("text").alias("clean"),
        tx.count_cards("text").alias("n_cards"),
        tx.count_ips("text").alias("n_ips"),
    ).collect()
    assert row["n_cards"] == 2 and row["n_ips"] == 1
    assert "<CARD>" in row["clean"] and row["clean"].count("<CARD>") == 2
    assert "<PHONE>" in row["clean"] and "<IP>" in row["clean"]
    assert "<EMAIL>" in row["clean"]
    assert "4111" not in row["clean"] and "192.168" not in row["clean"]


def test_compression_stats_orders_by_redundancy(spark):
    """zlib ratio invariants: spam << prose < random-ish; empty text has
    a NULL ratio; byte counts are UTF-8 exact."""
    import random

    rng = random.Random(7)
    rand_text = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(400))
    rows = [
        (1, "buy now " * 100),                     # extreme redundancy
        (2, ("the quick brown fox jumps over the lazy dog and then "
             "wanders slowly home across the quiet evening fields ") * 4),
        (3, rand_text),
        (4, ""),
        (5, "héllo wörld"),                        # multibyte UTF-8
    ]
    from streaming_data_pipeline_azure_spark.operators.text import (
        compression_stats,
    )

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_stats(df).collect()}
    assert out[1]["ratio"] < out[2]["ratio"] < out[3]["ratio"]
    assert out[1]["ratio"] < 0.1
    assert out[3]["ratio"] > 0.5
    assert out[4]["ratio"] is None and out[4]["n_bytes"] == 0
    assert out[5]["n_bytes"] == len("héllo wörld".encode("utf-8"))
    for r in out.values():
        assert r["n_compressed"] > 0


def test_bigram_lm_scores_hand_computed_model(spark):
    """Tiny corpus with a hand-computed add-0.5 bigram model pins the
    semantics: bc(a,b)=3, bc(b,a)=1, cc(a)=3, cc(b)=1, V=2 =>
    p(b|a)=0.875, p(a|b)=0.75; docs with <2 tokens are absent; scores
    are partition-invariant (decimal accumulation)."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        bigram_lm_scores,
    )

    docs = spark.createDataFrame(
        [("d1", "a b a b"), ("d2", "  A  b "), ("d3", "x"), ("d4", "")],
        "doc_id string, text string",
    )
    for parts in (1, 7):
        got = {
            r["doc_id"]: (r["n_transitions"], r["avg_p"])
            for r in bigram_lm_scores(docs.repartition(parts)).collect()
        }
        assert set(got) == {"d1", "d2"}
        # d1: (a,b) (b,a) (a,b) -> (0.875 + 0.75 + 0.875) / 3
        assert got["d1"][0] == 3
        assert abs(got["d1"][1] - 2.5 / 3) < 1e-12
        # d2 normalizes "  A  b " -> "a b": one transition at p=0.875
        assert got["d2"] == (1, 0.875)


def test_pseudonymize_preserves_joins_and_masks_values(spark):
    """Pseudonymization contract: deterministic (same value -> same
    token, across DataFrames and partitionings), join counts equal the
    raw join's, tokens reveal neither the value nor its ordering, and
    a different salt produces disjoint tokens (release unlinkability)."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        pseudonymize,
    )

    a = spark.createDataFrame([(i,) for i in range(50)], "k int")
    b = spark.createDataFrame(
        [(i, i * 2) for i in range(0, 100, 2)], "k int, v int"
    )
    ta = a.select(pseudonymize("k", salt="s1").alias("pk"))
    tb = b.select(pseudonymize("k", salt="s1").alias("pk"), "v")
    assert ta.join(tb, "pk").count() == a.join(b, "k").count() == 25

    toks = {r["pk"] for r in ta.collect()}
    assert len(toks) == 50  # injective here
    assert all(len(t) == 16 for t in toks)
    raw = {str(i) for i in range(50)}
    assert toks.isdisjoint(raw)

    other = {
        r["pk"]
        for r in a.select(pseudonymize("k", salt="s2").alias("pk")).collect()
    }
    assert toks.isdisjoint(other)
    # partition invariance
    again = {
        r["pk"]
        for r in a.repartition(7)
        .select(pseudonymize("k", salt="s1").alias("pk"))
        .collect()
    }
    assert again == toks


def test_collocations_pmi_ratio(spark):
    """Adjacent-pair counts, exact strength ratio, min_count pruning,
    deterministic ordering."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        collocations,
    )

    docs = spark.createDataFrame(
        [("new york is big",), ("new york wins",), ("big wins",),
         ("york new",)],
        "text string",
    )
    got = collocations(docs, min_count=2, k=10).collect()
    pairs = {(r["w_a"], r["w_b"]): r for r in got}
    # 'new york' occurs twice adjacently ('york new' is the reversed
    # order, a different pair)
    assert ("new", "york") in pairs
    r = pairs[("new", "york")]
    assert r["n_ab"] == 2
    # N = 11 tokens, n_new = 3, n_york = 3 -> 2*11/9
    assert abs(r["strength"] - 2 * 11 / 9) < 1e-12
    # hapax pairs pruned
    assert ("is", "big") not in pairs


def test_canonicalize_url_rules(spark):
    from streaming_data_pipeline_azure_spark.operators.text import (
        canonicalize_url,
    )

    cases = [
        ("HTTP://Example.COM:80/Path/?utm_source=x&a=1#frag",
         "http://example.com/Path?a=1"),
        ("https://Host:443/p?utm_a=1&utm_b=2&c=3",
         "https://host/p?c=3"),
        ("https://host/p?a=1&fbclid=zzz", "https://host/p?a=1"),
        ("http://host/", "http://host"),
        ("http://host:8080/p", "http://host:8080/p"),
        ("https://host/p?utm_only=1", "https://host/p"),
        ("https://host/p?b=2&a=1", "https://host/p?b=2&a=1"),  # order kept
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r["c"]
        for r in df.select(
            canonicalize_url("url").alias("c")
        ).collect()
    ]
    for (inp, want), g in zip(cases, got):
        assert g == want, (inp, g, want)


def test_encoding_anomaly_stats_detects_mojibake(spark):
    """Replacement and control characters count exactly; clean groups
    report zero; the affected fraction is per-document."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        encoding_anomaly_stats,
    )

    df = spark.createDataFrame(
        [
            ("bad", "caf� latte �"),
            ("bad", "bell\x07 and\x01 whistles"),
            ("bad", "totally fine"),
            ("good", "clean text"),
        ],
        "source string, text string",
    )
    out = {r["source"]: r for r in
           encoding_anomaly_stats(df, "source").collect()}
    assert out["bad"]["n_replacement"] == 2
    assert out["bad"]["n_control"] == 2
    assert out["bad"]["n_docs_affected"] == 2
    assert abs(out["bad"]["affected_frac"] - 2 / 3) < 1e-15
    assert out["good"]["n_replacement"] == 0
    assert out["good"]["n_docs_affected"] == 0


def test_readability_scores_hand_counts(spark):
    """Word/sentence/vowel-group counts and the FK polynomial on a
    hand-counted sentence; zero-word docs report NULL grade."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        readability_scores,
    )

    df = spark.createDataFrame(
        [(1, "The cat sat. It purred!"), (2, "12345 --- !!!")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in readability_scores(df).collect()}
    # words: the, cat, sat, it, purred = 5; sentences: 2
    # vowel groups: e, a, a, i, u+e = 6  ("purred" -> 'u', 'e')
    assert out[1]["n_words"] == 5
    assert out[1]["n_sentences"] == 2
    assert out[1]["n_syllables"] == 6
    want = 0.39 * (5 / 2) + 11.8 * (6 / 5) - 15.59
    assert out[1]["fk_grade"] == want
    assert out[2]["n_words"] == 0 and out[2]["fk_grade"] is None
    assert out[2]["n_sentences"] == 1  # clamped minimum


def test_blocklist_stats_word_bounded_and_escaped(spark):
    """Word boundaries ('class' never flags 'ass'), case-insensitive
    hits, regex metacharacters in terms are data not syntax."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        blocklist_stats,
    )

    df = spark.createDataFrame(
        [
            ("a", "the class is classy"),          # no bare 'ass'
            ("a", "ASS and ass again"),            # 2 hits
            ("b", "price is $9.99 today"),         # literal $9.99
            ("b", "harmless"),
        ],
        "g string, text string",
    )
    out = {r["g"]: r for r in
           blocklist_stats(df, ["ass", "$9.99"], "g").collect()}
    assert out["a"]["n_hits"] == 2
    assert out["a"]["n_docs_flagged"] == 1
    assert out["b"]["n_hits"] == 1
    assert out["b"]["flagged_frac"] == 0.5
    import pytest

    with pytest.raises(ValueError):
        blocklist_stats(df, [], "g")


def test_s_stem_rules_and_exceptions(spark):
    from streaming_data_pipeline_azure_spark.operators.text import s_stem

    cases = {
        "ponies": "pony",      # ies -> y
        "eies": "eies",        # <4? no, len 4; eies exception holds
        "movies": "movy",      # ies -> y (S-stemmer is intentionally crude)
        "boxes": "boxe",       # es -> drop s
        "shoes": "shoes",      # oes exception
        "trees": "trees",      # ees exception
        "cats": "cat",         # s -> drop
        "bus": "bus",          # us exception
        "class": "class",      # ss exception
        "is": "is",            # too short
        "its": "its",          # too short (len 3)
    }
    df = spark.createDataFrame([(k,) for k in cases], ["tok"])
    out = {r["tok"]: r["stem"] for r in df.select("tok", s_stem("tok").alias("stem")).collect()}
    assert out == cases


def test_code_switch_stats_planted_mix(spark):
    from streaming_data_pipeline_azure_spark.operators.text import (
        code_switch_stats,
    )

    docs = spark.createDataFrame(
        [
            # 2 en sentences + 1 es sentence -> majority en, switch 1/3
            (1, "the cat is in the hat. the dog is for it. el que no es un."),
            # monolingual
            (2, "the a of and is! the it for that."),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in code_switch_stats(docs).collect()}
    assert out[1]["n_sentences"] == 3
    assert out[1]["majority_lang"] == "en"
    assert out[1]["n_majority"] == 2
    assert out[1]["switch_scaled"] == 333_333
    assert out[2]["switch_scaled"] == 0
    assert out[2]["majority_lang"] == "en"


def test_classifier_kappa_known_values(spark):
    from streaming_data_pipeline_azure_spark.operators.text import (
        classifier_kappa,
    )

    # classic 2x2: 20 a/a, 5 a/b, 10 b/a, 15 b/b
    rows = (
        [("a", "a")] * 20 + [("a", "b")] * 5
        + [("b", "a")] * 10 + [("b", "b")] * 15
    )
    df = spark.createDataFrame(rows, ["pred", "gold"])
    (r,) = classifier_kappa(df, "pred", "gold").collect()
    assert r["n"] == 50 and r["n_agree"] == 35
    # po = 0.7; pe = (25*30 + 25*20)/2500 = 0.5; kappa = 0.4
    assert r["kappa_scaled"] == 400_000
    # perfect agreement -> kappa 1
    perfect = spark.createDataFrame(
        [("x", "x")] * 5 + [("y", "y")] * 5, ["pred", "gold"]
    )
    (p,) = classifier_kappa(perfect, "pred", "gold").collect()
    assert p["kappa_scaled"] == 1_000_000


def test_mcnemar_counts_and_ablation_direction(spark):
    from streaming_data_pipeline_azure_spark.operators.text import (
        mcnemar_paired_test,
    )

    rows = (
        [("x", "x", "x")] * 10   # both right
        + [("x", "y", "x")] * 6  # only A right
        + [("y", "x", "x")] * 2  # only B right
        + [("y", "z", "x")] * 3  # both wrong
    )
    df = spark.createDataFrame(rows, ["pa", "pb", "gold"])
    (r,) = mcnemar_paired_test(df, "pa", "pb", "gold").collect()
    assert (r["n_both_right"], r["n_only_a"], r["n_only_b"]) == (10, 6, 2)
    # (6-2)^2 / 8 = 2 -> 2_000_000
    assert r["mcnemar_scaled"] == 2_000_000
    # ties -> 0 by contract
    tie = spark.createDataFrame([("x", "x", "x")] * 4, ["pa", "pb", "gold"])
    (t,) = mcnemar_paired_test(tie, "pa", "pb", "gold").collect()
    assert t["mcnemar_scaled"] == 0


def test_msttr_segments_and_exclusions(spark):
    """Hand-built docs pin MSTTR semantics: full segments only, exact
    distinct counts, floor-scaled ratio, sub-window docs absent."""
    from streaming_data_pipeline_azure_spark.operators.text import msttr

    # doc 1: 8 tokens, window 4 -> 2 segments: [a b a b] d=2, [c c c d] d=2
    # doc 2: 5 tokens, window 4 -> 1 full segment [x y z x] d=3 (tail 'q' dropped)
    # doc 3: 3 tokens -> no full segment -> no row
    rows = [
        (1, "a b a b c c c d"),
        (2, "x y z x q"),
        (3, "too short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in msttr(df, window=4).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_segments"] == 2 and out[1]["sum_distinct"] == 4
    # 4 / (4*2) = 0.5 -> 500000
    assert out[1]["msttr_scaled"] == 500_000
    assert out[2]["n_segments"] == 1 and out[2]["sum_distinct"] == 3
    assert out[2]["msttr_scaled"] == 750_000


def test_kneser_ney_hand_values(spark):
    """Corpus 'a b','a b','a c': P(b|a) = 1.25/3 + 0.75·(2/3)·(1/2)
    = 2/3 and P(c|a) = 1/3 — and the two observed continuations of a
    fully-covered context sum to exactly 1 (the interpolated-KN mass
    identity)."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        kneser_ney_bigrams,
    )

    docs = spark.createDataFrame(
        [("a b",), ("a b",), ("a c",)], "text string"
    )
    rows = {(r["w1"], r["w2"]): r for r in
            kneser_ney_bigrams(docs, min_context=1, k=10).collect()}
    b = rows[("a", "b")]
    assert (b["c12"], b["c1"], b["fanout"], b["fanin"]) == (2, 3, 2, 1)
    assert abs(b["p_kn"] - 2.0 / 3.0) < 1e-15
    c = rows[("a", "c")]
    assert abs(c["p_kn"] - 1.0 / 3.0) < 1e-15
    assert abs(b["p_kn"] + c["p_kn"] - 1.0) < 1e-15


def test_kneser_ney_continuation_beats_frequency(spark):
    """The 'san francisco' property: a word frequent ONLY inside one
    collocation gets a LOW continuation probability as a backoff
    continuation even though its raw unigram count is high — KN ranks
    a many-context continuation above it after the same context."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        kneser_ney_bigrams,
    )

    # 'z' occurs 6 times but only ever after 'q'; 'y' occurs 4 times
    # after 4 DIFFERENT contexts. After the fresh context 'u' (seen
    # once with each), the backoff must prefer y over z.
    docs = spark.createDataFrame(
        [("q z q z q z q z q z q z",),
         ("a y b y c y d y",),
         ("u z u y",)],
        "text string",
    )
    rows = {(r["w1"], r["w2"]): r["p_kn"] for r in
            kneser_ney_bigrams(docs, min_context=1, k=100).collect()}
    assert rows[("u", "y")] > rows[("u", "z")]


def test_kneser_ney_doc_scores_hand_values(spark):
    """Corpus 'a b','a b','a c': the 'a b' docs score avg_p = 2/3
    (their single transition's KN probability), the 'a c' doc 1/3 —
    the per-doc mean of the model's exact rationals."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        kneser_ney_doc_scores,
    )

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in kneser_ney_doc_scores(docs).collect()}
    assert rows[1]["n_transitions"] == 1
    assert abs(rows[1]["avg_p_kn"] - 2.0 / 3.0) < 1e-12
    assert abs(rows[2]["avg_p_kn"] - 2.0 / 3.0) < 1e-12
    assert abs(rows[3]["avg_p_kn"] - 1.0 / 3.0) < 1e-12


def test_term_keyness_hand_checked(spark):
    """Tiny 2x2 verified by hand: target corpus 'cat cat dog',
    reference 'dog dog fish fish'. For 'cat': a=2 b=0 c=1 d=4, N=7,
    chi2 = 7*(2*4 - 0*1)^2 / (2*5*3*4) = 448/120."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        term_keyness,
    )

    df = spark.createDataFrame(
        [(True, "cat cat dog"), (False, "dog dog fish fish")],
        "t boolean, text string",
    )
    rows = {
        r["term"]: r
        for r in term_keyness(
            df, "text", F.col("t"), min_count=1, k=10
        ).collect()
    }
    cat = rows["cat"]
    assert (cat["n_target"], cat["n_ref"]) == (2, 0)
    assert cat["enriched_in_target"] is True
    assert cat["chi2"] == ((2.0 * 4 - 0 * 1) ** 2 * 7.0) / (
        (2.0 * 5) * 3.0 * 4.0
    )
    dog = rows["dog"]
    assert dog["enriched_in_target"] is False
    import pytest as _pt

    with _pt.raises(ValueError, match="min_count"):
        term_keyness(df, "text", F.col("t"), min_count=0)


def test_ngram_diversity_hand_checked(spark):
    """r12 (distinct-n): 'a b a b' + 'a b' -> unigrams 6 total /
    2 distinct, bigrams 4 total ('a b','b a','a b' | 'a b') /
    2 distinct, trigrams 2 total / 2 distinct."""
    import pytest

    from streaming_data_pipeline_azure_spark.operators.text import (
        ngram_diversity,
    )

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["n"]: r for r in ngram_diversity(df, ns=(1, 2, 3)).collect()}
    assert (out[1]["total_grams"], out[1]["distinct_grams"]) == (6, 2)
    assert out[1]["distinct_ratio"] == 2.0 / 6.0
    assert (out[2]["total_grams"], out[2]["distinct_grams"]) == (4, 2)
    assert out[2]["distinct_ratio"] == 0.5
    assert (out[3]["total_grams"], out[3]["distinct_grams"]) == (2, 2)
    assert out[3]["distinct_ratio"] == 1.0
    with pytest.raises(ValueError, match="orders"):
        ngram_diversity(df, ns=())


def test_term_burstiness_hand_checked(spark):
    """r12 (Church & Gale): 'b' appears 4x concentrated in one of 4
    docs -> VMR = var/mean with zeros counted = ((4*16-16)/(4*4)) = 3;
    'a' appears once per doc -> VMR = 0 (deterministic); min_count
    screens rare terms; top-k orders by occurrences then term."""
    import pytest

    from streaming_data_pipeline_azure_spark.operators.text import (
        term_burstiness,
    )

    df = spark.createDataFrame(
        [
            (1, "a b b b b"),
            (2, "a"),
            (3, "a"),
            (4, "a rare"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in term_burstiness(df, k=5, min_count=2).collect()}
    assert set(out) == {"a", "b"}  # 'rare' screened by min_count
    # a: counts (1,1,1,1) over N=4 -> S1=4, S2=4 -> (16-16)/16 = 0
    assert out["a"]["n_occurrences"] == 4 and out["a"]["n_docs"] == 4
    assert out["a"]["vmr"] == 0.0
    # b: counts (4,0,0,0) -> S1=4, S2=16 -> (4*16-16)/(4*4) = 3
    assert out["b"]["n_occurrences"] == 4 and out["b"]["n_docs"] == 1
    assert out["b"]["vmr"] == 3.0
    with pytest.raises(ValueError, match="term_burstiness"):
        term_burstiness(df, k=0)


def test_quality_classifier_scores_manual(spark):
    """r13 (VERDICT r12 #4): the logit must equal the manual
    left-associative IEEE chain over the exact features, prose must
    pass and template junk must fail, and weight overrides must be
    validated."""
    import pytest

    from streaming_data_pipeline_azure_spark.operators.text import (
        QUALITY_CLASSIFIER_WEIGHTS,
        quality_classifier_scores,
    )

    prose = (
        "the quick brown fox jumps over a lazy dog and it is one of "
        "the finest sentences known to man for that matter"
    )
    junk = "111 222 333 444 555 111 222 333 444 555"
    rows = [(1, prose), (2, junk), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r for r in quality_classifier_scores(df).collect()
    }

    def manual(text):
        toks = text.strip().lower()
        import re

        toks = re.sub(r"\s+", " ", toks).split(" ")
        nt = len(toks)
        nd = len(set(toks))
        stop = {"the", "a", "of", "and", "is", "to", "in", "that",
                "it", "for"}
        nstop = sum(1 for t in toks if t in stop)
        joined = "".join(toks)
        nc = len(joined)
        na = len(re.sub(r"[^a-z]", "", joined))
        w = QUALITY_CLASSIFIER_WEIGHTS
        f_len = min(nt, 1000) / 1000.0
        f_div = nd / nt
        f_stop = nstop / nt
        f_alpha = (na / nc) if nc > 0 else 0.0
        return ((((w["bias"] + w["len"] * f_len)
                  + w["diversity"] * f_div)
                 + w["stopword"] * f_stop)
                + w["alpha"] * f_alpha)

    for d, text in rows:
        assert out[d]["logit"] == manual(text), (d, out[d]["logit"],
                                                 manual(text))
        assert out[d]["quality_pass"] == (manual(text) > 0.0)
    assert out[1]["quality_pass"] is True      # natural prose passes
    assert out[2]["quality_pass"] is False     # digit template fails
    assert out[3]["quality_pass"] is False     # empty doc fails
    # feature surfaces
    assert out[2]["f_alpha"] == 0.0            # no a-z chars at all
    assert out[1]["n_tokens"] == len(prose.split())
    with pytest.raises(ValueError, match="unknown"):
        quality_classifier_scores(df, weights={"nope": 1.0})
    # an override shifts the gate: zero every weight, bias +1 -> all pass
    allpass = quality_classifier_scores(
        df,
        weights={"bias": 1.0, "len": 0.0, "diversity": 0.0,
                 "stopword": 0.0, "alpha": 0.0},
    ).collect()
    assert all(r["quality_pass"] for r in allpass)


def test_quality_classifier_no_shuffle(spark):
    """The gate is a pure projection — its physical plan must contain
    NO exchange (row-parallel at any scale)."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        quality_classifier_scores,
    )
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "on a mat")],
        "doc_id long, text string",
    )
    plan = physical_plan(quality_classifier_scores(df))
    assert "Exchange" not in plan, plan


def test_gopher_quality_gate_rules(spark):
    """r13 wave 2: every Gopher rule trips on its own planted doc and
    the pass doc clears all five (Rae et al. 2021 A1.1 word-grain
    rules, integer cross-multiplied)."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        gopher_quality_gate,
    )
    import pytest

    good = " ".join(
        ["the", "be", "to", "of", "and", "that", "have", "with"] * 7
    )  # 56 words, all alpha, mean len in [3,10], no symbols
    rows = [
        (1, good),
        (2, "the be to of and"),  # 5 words -> fails R1 only
        # R2 low: mean word len < 3 (56 two-char words, still has
        # required words as 2-char? no -- keep required hits via 'to'
        # 'be' 'of' and pad with 'ab')
        (3, " ".join(["to", "be", "of", "ab"] * 14)),  # mean len 2
        (4, " ".join(["abcdefghijklmnopqrstu"] * 28 + ["the", "be"] * 14)),
        (5, good + " " + " ".join(["#"] * 10)),  # symbol spam
        (6, " ".join(["123", "456"] * 26) + " the be to of"),  # digits
        (7, " ".join(["lorem", "ipsum", "dolor", "sitam"] * 14)),
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_quality_gate(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1]["gopher_pass"] is True
    assert all(
        out[1][c]
        for c in (
            "r_word_count", "r_mean_word_len", "r_symbol_ratio",
            "r_alpha_words", "r_required_words",
        )
    )
    assert out[2]["r_word_count"] is False and out[2]["word_count"] == 5
    assert out[3]["r_mean_word_len"] is False  # mean len 2 < 3
    assert out[3]["mean_word_len"] == 2.0
    assert out[4]["r_mean_word_len"] is False  # mean len > 10
    assert out[5]["r_symbol_ratio"] is False
    assert out[5]["gopher_pass"] is False
    assert out[6]["r_alpha_words"] is False  # half the words digit-only
    assert out[7]["r_required_words"] is False  # zero function words
    assert out[7]["n_required_hits"] == 0
    # boundary exactness: mean word length EXACTLY 3 passes (integer
    # cross-multiply, no float threshold)
    b = gopher_quality_gate(
        spark.createDataFrame(
            [(9, " ".join(["abc"] * 50))], "doc_id long, text string"
        )
    ).collect()[0]
    assert b["mean_word_len"] == 3.0 and b["r_mean_word_len"] is True
    with pytest.raises(ValueError, match="min_words"):
        gopher_quality_gate(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_words=-1,
        )


def test_gopher_quality_gate_no_shuffle(spark):
    """The gate is a pure projection — its physical plan must contain
    NO exchange (row-parallel at any scale)."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        gopher_quality_gate,
    )
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "on a mat")],
        "doc_id long, text string",
    )
    plan = physical_plan(gopher_quality_gate(df))
    assert "Exchange" not in plan


def test_zipf_doubling_ratios_planted(spark):
    """Planted geometric frequencies: term at rank r occurs 2^(8-i)
    times, so EVERY doubling ratio is exactly 2.0 (s = 1 Zipf), and
    ranks/terms/freqs are fully determined."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        zipf_doubling_ratios,
    )
    import pytest

    words = []
    for i in range(9):  # w0 x 256, w1 x 128, ..., w8 x 1
        words += [f"w{i}"] * (256 >> i)
    # one doc per 50 words to keep rows small
    rows = [
        (i, " ".join(words[i * 50:(i + 1) * 50]))
        for i in range((len(words) + 49) // 50)
    ]
    out = zipf_doubling_ratios(
        spark.createDataFrame(rows, "doc_id long, text string"),
        max_rank=8,
    ).collect()
    got = {r["rank"]: r for r in out}
    # vocab has 9 terms, so rank 8 has no doubling partner (rank 16)
    assert set(got) == {1, 2, 4}
    for r in (1, 2, 4):
        # f(k) = 2^(9-k)  ->  f(r)/f(2r) = 2^r exactly
        assert got[r]["term"] == f"w{r - 1}"
        assert got[r]["freq"] == 256 >> (r - 1)
        assert got[r]["doubling_ratio"] == float(2 ** r)
    assert got[1]["freq"] == 256 and got[1]["freq_2x"] == 128
    with pytest.raises(ValueError, match="max_rank"):
        zipf_doubling_ratios(
            spark.createDataFrame(rows, "doc_id long, text string"),
            max_rank=12,
        )


def test_zipf_doubling_ratios_tie_determinism(spark):
    """Count ties order by term ASC on both engines — same input twice
    must give identical rows (the LIMIT/ranking boundary is a total
    order)."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        zipf_doubling_ratios,
    )

    rows = [(1, "b a d c b a d c"), (2, "a b c d")]  # all ties (3,3,3,3)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = [tuple(r) for r in zipf_doubling_ratios(df, max_rank=2).collect()]
    b = [tuple(r) for r in zipf_doubling_ratios(df, max_rank=2).collect()]
    assert a == b
    # rank 1 = 'a' (tie broken by term), ratio exactly 1.0
    assert a[0][1] == "a" and a[0][4] == 1.0


def test_quality_gate_funnel_parity_and_counts(spark):
    """r13 wave 3: the funnel re-derives both pass bits in one
    projection — they must match the two gate operators bit-for-bit
    on a mixed planted corpus, and the per-source counts/rates must
    equal the brute-forced rollup of those bits."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        gopher_quality_gate,
        quality_classifier_scores,
        quality_gate_funnel,
    )

    good = " ".join(
        ["the", "be", "to", "of", "and", "that", "have", "with"] * 7
    )
    rows = [
        (1, good, "web"),
        (2, "the be to of and", "web"),
        (3, " ".join(["to", "be", "of", "ab"] * 14), "books"),
        (4, " ".join(["123", "456"] * 26) + " the be to of", "books"),
        (5, good + " extra words here", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    g = {r["doc_id"]: r["gopher_pass"]
         for r in gopher_quality_gate(df).collect()}
    q = {r["doc_id"]: r["quality_pass"]
         for r in quality_classifier_scores(df).collect()}
    want = {}
    for did, _, src in rows:
        d = want.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        d[1] += int(g[did])
        d[2] += int(q[did])
        d[3] += int(g[did] and q[did])
    out = {r["source"]: r for r in quality_gate_funnel(df).collect()}
    assert set(out) == set(want)
    for src, (n, ng, nq, nb) in want.items():
        r = out[src]
        assert r["n_docs"] == n
        assert r["n_gopher_pass"] == ng, (src, dict(r.asDict()))
        assert r["n_classifier_pass"] == nq
        assert r["n_both_pass"] == nb
        assert r["gopher_pass_rate"] == ng / n
        assert r["both_pass_rate"] == nb / n


def test_quality_gate_funnel_single_exchange(spark):
    """The funnel's only shuffle is the source-grain aggregate."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        quality_gate_funnel,
    )
    from streaming_data_pipeline_azure_spark.plans.inspect import (
        physical_plan,
    )

    df = spark.createDataFrame(
        [(1, "the cat", "a"), (2, "a mat", "b")],
        "doc_id long, text string, source string",
    )
    plan = physical_plan(quality_gate_funnel(df))
    # exactly one hash exchange (the source-grain aggregate); the only
    # other repartitioning is the final orderBy's range exchange
    import re
    assert len(re.findall(r"hashpartitioning\(source", plan)) == 1, plan
    assert "hashpartitioning(doc_id" not in plan, plan  # no doc join


def test_vocab_coverage_curve_planted(spark):
    """Planted counts: a=6, b=3, c=2, d=1 (total 12) -> coverage
    6/12, 9/12, 12/12 at k=1,2,4; k beyond the vocabulary saturates
    at exactly 1.0."""
    from streaming_data_pipeline_azure_spark.operators.text import (
        vocab_coverage_curve,
    )
    import pytest

    rows = [(1, "a a a b b c"), (2, "a a a b c d")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["k"]: r for r in vocab_coverage_curve(df, max_k=8).collect()}
    assert set(out) == {1, 2, 4, 8}
    assert out[1]["covered_tokens"] == 6
    assert out[2]["covered_tokens"] == 9
    assert out[4]["covered_tokens"] == 12
    assert out[8]["covered_tokens"] == 12  # saturated past the vocab
    for k in out:
        assert out[k]["total_tokens"] == 12
    assert out[1]["coverage"] == 0.5
    assert out[4]["coverage"] == 1.0 and out[8]["coverage"] == 1.0
    with pytest.raises(ValueError, match="max_k"):
        vocab_coverage_curve(df, max_k=6)
