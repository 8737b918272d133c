"""X4 — text analysis over the ``documents`` table: token counting,
language ID, quality scoring, fingerprinting, corpus stats.

Everything here is built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs, so a 100 TB corpus scans at parquet
speed with column pruning (only ``text`` + grouping keys are read).

Determinism contract: every formula is written so an oracle engine
(DuckDB) evaluating the same expression tree over the same rows produces
bit-identical values — integer counts, and double ratios derived from
exact integers via single IEEE divisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Public, widely-known function-word lists (top common words per language).
# Tiny on purpose: the operator is a heuristic scorer, not a model.
STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "en": ["the", "a", "of", "and", "is", "to", "in", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "no", "por"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ne"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def tokens(text_col: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (empty text → one empty
    token, matching regexp-split semantics in SQL engines)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def token_count(text_col: Column | str) -> Column:
    return F.size(tokens(text_col))


# Letters-run | single digit | single non-space symbol — a BPE-ish
# pre-tokenization pattern (GPT-2-style splits digits and punctuation into
# their own tokens). Restricted to ASCII classes so Java regex (Spark) and
# RE2 (DuckDB/oracle) agree exactly.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text_col: Column | str) -> Column:
    """Subword-ish token count: the number of BPE-pretokenizer matches.
    Approximates LLM token budgeting without a vocabulary file — the
    count is what a 100 TB budget query needs, not the token ids."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


# ASCII-only patterns so Java regex (Spark) and RE2 (DuckDB oracle)
# agree byte-for-byte. Redaction is the standard pre-training scrub:
# replace, never drop the document (length statistics stay comparable).
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9][0-9\- ]{7,}[0-9]"


def count_emails(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_PATTERN), 0))


def count_phones(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(PHONE_PATTERN), 0))


def redact_pii(text_col: Column | str) -> Column:
    """Replace emails then phone-number-shaped digit runs with typed
    placeholder tags. Email first: an address can contain digit runs
    that the phone pattern would otherwise split mid-token. Pure
    codegen expressions — no Python in the path."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    no_email = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_PATTERN, "<PHONE>")


# \b and (?:...) behave identically in Java regex and RE2; [0-9] (not \d)
# keeps the charset explicitly ASCII in both.
IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
CARD_PATTERN = r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b|\b[0-9]{16}\b"


def count_ips(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(IPV4_PATTERN), 0))


def count_cards(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(c, F.lit(CARD_PATTERN), 0))


def redact_pii_extended(text_col: Column | str) -> Column:
    """Typed redaction of emails, card numbers, phone runs, and IPv4
    addresses, in that order. Card BEFORE phone: a separated card number
    is also a phone-shaped digit run, and the typed tag must win. IP
    last is safe either way — dotted quads never match the phone
    pattern (dots break its digit-run charset)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = F.regexp_replace(c, EMAIL_PATTERN, "<EMAIL>")
    out = F.regexp_replace(out, CARD_PATTERN, "<CARD>")
    out = F.regexp_replace(out, PHONE_PATTERN, "<PHONE>")
    return F.regexp_replace(out, IPV4_PATTERN, "<IP>")


def normalized_text(text_col: Column | str) -> Column:
    """Whitespace-collapsed, lowercased, trimmed text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))


def fingerprint(text_col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Identical content modulo whitespace/case collides on purpose — this is
    the key for normalized exact dedup."""
    return F.md5(normalized_text(text_col))


def stopword_hits(text_col: Column | str, lang: str) -> Column:
    """Number of tokens that are function words of ``lang``."""
    toks = F.transform(tokens(text_col), F.lower)
    wordlist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordlist, t)))


def cjk_char_count(text_col: Column | str) -> Column:
    """Number of CJK-unified-ideograph characters — the zh signal.
    Chinese text is unsegmented, so token-based stopword hits are always
    zero for it; characters are the right evidence unit."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.length(F.regexp_replace(c, "[^一-鿿]", ""))


def language_id(text_col: Column | str) -> Column:
    """Heuristic language ID: the alphabetically-first language whose
    score is >= every other language's score. Scores are stopword-token
    hits for space-segmented languages and the CJK character count for
    zh. Expressed as a CASE chain so the exact same decision procedure is
    one SQL statement in any oracle engine."""
    langs = sorted(STOPWORDS)
    scores = {lang: stopword_hits(text_col, lang) for lang in langs}
    scores["zh"] = cjk_char_count(text_col)
    expr: Column | None = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[0]))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: lengths, token stats, punctuation and
    stopword ratios, and a composite score in [0,1]-ish range.

    All ratios are single divisions of exact integers → deterministic.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tok = token_count(text_col)
    # characters that are not alnum/space ("punctuation" in the loose,
    # pipeline-filter sense)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^a-zA-Z0-9 ]", ""))
    n_nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    n_stop = stopword_hits(text_col, "en")
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(F.lit(0.0))
    return df.withColumns(
        {
            "n_chars_m": n_chars,
            "n_tokens": n_tok,
            "punct_ratio": safe(n_punct, n_chars),
            "avg_token_len": safe(n_nonspace, n_tok),
            "stopword_ratio": safe(n_stop, n_tok),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score: rewards stopword density (fluent prose) and
    moderate token length, penalizes punctuation soup. Weights are fixed,
    documented constants so the score is reproducible anywhere."""
    feats = quality_features(df, text_col)
    score = (
        F.lit(0.5) * F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0))
        + F.lit(0.3) * F.least(F.col("avg_token_len") / 8.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0)))
    )
    return feats.withColumn("quality_score", score)


def corpus_stats(df: DataFrame, text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Per-language corpus stats (exact-decimal avg for determinism)."""
    return (
        df.groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(text_col)).alias("total_tokens"),
            (
                F.sum(F.length(F.col(text_col)).cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_chars"),
        )
    )


def compression_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    *, level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap quality /
    repetitiveness signal (CCNet/RefinedWeb-style): natural prose
    compresses to ~0.4-0.6 of its UTF-8 bytes, keyword spam and
    templated boilerplate far below, near-random strings near (or
    above) 1.0. Filter on ``ratio`` directly or feed it to a classifier.

    Python is required (no codegen deflate), so the kernel is an
    Arrow-batched ``mapInPandas`` over stdlib ``zlib`` — one C-speed
    compress per document, no per-row Python UDF. Deterministic for a
    fixed (zlib version, ``level``); there is no DuckDB equivalent, so
    the query registers rows-only with unit tests pinning the ordering
    invariants. Returns (id, n_bytes, n_compressed, ratio); empty text
    reports the deflate header bytes with a NULL ratio."""
    import pandas as pd  # noqa: F401 (kernel-side import documented here)

    def kernel(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [
                t.encode("utf-8") if isinstance(t, str) else b""
                for t in pdf[text_col]
            ]
            nb = [len(b) for b in raw]
            nc = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "n_compressed": pd.Series(nc, dtype="int64"),
                    "ratio": [
                        (c / b) if b > 0 else None for b, c in zip(nb, nc)
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel,
        schema=f"{id_col} long, n_bytes long, n_compressed long, ratio double",
    )


def bigram_lm_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smoothing: float = 0.5,
) -> DataFrame:
    """Corpus-trained bigram language-model quality signal (r7): score
    every document by the MEAN transition probability of its own token
    bigrams under the corpus' add-k-smoothed bigram MLE — the
    self-scoring construction behind perplexity-style quality filters
    (train on the corpus, flag documents whose transitions the corpus
    finds improbable: boilerplate scores high, token salad scores low).

    Scores stay in PROBABILITY space, not log space, deliberately:
    p = (bigram_count + k) / (context_count + k·V) is an exact integer
    ratio in IEEE doubles and the per-doc mean accumulates in DECIMAL,
    so the output is bit-identical across engines and partitionings —
    a log-space variant differs by libm ulps per term and could never
    be value-hashed (take log(avg_p)/−avg_p offline if a
    perplexity-shaped number is wanted).

    Plan: one scan explodes each doc's adjacent token pairs (slice +
    arrays_zip — no self-join); bigram and context counts are two
    map-side-combined aggregates of that same exploded frame; scoring
    re-joins the pairs to the two count tables on their natural keys
    (broadcast when the model is small, shuffle otherwise) and one
    final groupBy(id) serves (doc_id, n_transitions, avg_p). Model
    state is O(unique bigrams) — it lives in the dataflow, never on
    the driver. Documents with <2 tokens are absent from the output
    (they have no transitions)."""
    toks = F.split(normalized_text(text_col), " ")
    pairs = (
        df.select(F.col(id_col), toks.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            id_col,
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("__t"), 1, F.size("__t") - 1).alias("w1"),
                    F.slice(F.col("__t"), 2, F.size("__t") - 1).alias("w2"),
                )
            ).alias("__p"),
        )
        .select(id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )
    bigram_counts = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("__bc")
    )
    context_counts = pairs.groupBy("w1").agg(
        F.count(F.lit(1)).alias("__cc")
    )
    vocab = pairs.select("w2").distinct().count()
    k = float(k_smoothing)
    p = (F.col("__bc").cast("double") + F.lit(k)) / (
        F.col("__cc").cast("double") + F.lit(k * vocab)
    )
    return (
        pairs.join(bigram_counts, ["w1", "w2"])
        .join(context_counts, ["w1"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            (
                F.sum(p.cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_p"),
        )
    )


def pseudonymize(
    col: Column | str, *, salt: str, length: int = 16
) -> Column:
    """Deterministic join-preserving pseudonymization (r7): replace an
    identifier with ``sha2(salt || value)`` truncated to ``length``
    hex chars — the governance middle ground between raw PII and
    redaction (:func:`redact_pii_extended` destroys referential
    integrity; this keeps it: equal inputs map to equal tokens, so
    keyed joins, group-bys and dedup still work on the masked data,
    while the salt keeps the mapping non-invertible without it).
    Pure codegen, identical in any engine with sha2 (SQL-checkable).
    Rotate the salt to break linkage between releases. Collision odds
    at the default 16 hex chars (64 bits) are ~n²/2⁶⁵ — negligible
    below billions of distinct ids; raise ``length`` for more."""
    if not 1 <= length <= 64:
        raise ValueError("pseudonymize length must be 1..64 hex chars")
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(
        F.sha2(F.concat(F.lit(salt), c.cast("string")), 256), 1, length
    )


def collocations(
    docs: DataFrame,
    *,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k two-word collocations by a LOG-FREE PMI score: for each
    adjacent token pair, ``strength = n_ab · N / (n_a · n_b)`` (N =
    total token count) — the pointwise-mutual-information ratio
    without the ln (same determinism convention as BM25's idf:
    monotone-identical ranking, engine-exact arithmetic). The
    keyphrase-mining pass corpus pipelines run to find multiword
    expressions worth keeping intact during tokenization.

    One scan explodes tokens twice (unigrams, adjacent pairs — both
    aggregations map-side combine to vocabulary-sized shuffles),
    unigram marginals broadcast onto the pair counts, the score is
    exact-integer products with ONE double division, and the top-k is
    TakeOrderedAndProject (strength desc, pair asc). ``min_count``
    prunes hapax pairs before scoring — raw PMI famously promotes
    count-1 typos."""
    toks = docs.select(
        F.split(normalized_text(text_col), " ").alias("__t")
    )
    uni = toks.select(F.explode("__t").alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("n_w")
    )
    total = uni.agg(F.sum("n_w").cast("long").alias("__N"))
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 1), "
                    "i -> struct(__t[i-1] as w_a, __t[i] as w_b))"
                )
            ).alias("p")
        )
        .select("p.w_a", "p.w_b")
        .groupBy("w_a", "w_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_count)
    )
    ua = uni.toDF("w_a", "n_a")
    ub = uni.toDF("w_b", "n_b")
    return (
        pairs.join(F.broadcast(ua), "w_a")
        .join(F.broadcast(ub), "w_b")
        .crossJoin(F.broadcast(total))
        .select(
            "w_a",
            "w_b",
            "n_ab",
            (
                (F.col("n_ab") * F.col("__N")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("strength"),
        )
        .orderBy(F.desc("strength"), "w_a", "w_b")
        .limit(k)
    )


def canonicalize_url(url_col: Column | str) -> Column:
    """Crawl-dedup URL canonicalization as a codegen regex chain:
    strip fragments, lowercase scheme://host, strip default ports
    (:80 http / :443 443 https), drop utm_*/fbclid/gclid tracking
    params (fixing the separator the removal orphans), trim trailing
    '?'/'&' and trailing slashes — the normalizations that make
    logically-identical crawl URLs compare equal BEFORE fingerprint
    dedup. Every pattern is RE2-compatible (no lookaround), so DuckDB
    runs the identical chain and canonical forms are engine-exact.

    Deliberately conservative: parameter ORDER is preserved (sorting
    params can merge semantically different endpoints) and
    percent-encoding is untouched."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    c = F.regexp_replace(c, r"#.*$", "")
    prefix = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
    c = F.concat(
        F.lower(F.regexp_extract(c, prefix, 1)),
        F.regexp_replace(c, prefix, ""),
    )
    c = F.regexp_replace(
        c, r"^(http://[^/?#:]*):80($|[/?].*)", "$1$2"
    )
    c = F.regexp_replace(
        c, r"^(https://[^/?#:]*):443($|[/?].*)", "$1$2"
    )
    c = F.regexp_replace(
        c, r"[?&](utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*", ""
    )
    # a removed leading '?param' orphans the next '&' -> promote it
    c = F.regexp_replace(c, r"^([^?]*)&", "$1?")
    c = F.regexp_replace(c, r"[?&]+$", "")
    c = F.regexp_replace(c, r"/+\?", "?")   # path-final slash before ?
    c = F.regexp_replace(c, r"/+$", "")
    return c


def encoding_anomaly_stats(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Mojibake / encoding-damage audit per group: counts of Unicode
    replacement characters (U+FFFD — the smoking gun of a wrong-charset
    decode) and C0 control characters (binary bleed-through), plus the
    affected-document rate — the corpus-janitor scan that catches a
    broken upstream extractor before its output trains.

    One conditional-aggregation scan; all counts are exact integers
    from codegen ``regexp_extract_all`` (character-class regexes only —
    RE2-safe, so any engine reproduces them), ratios are single double
    divisions. Returns (group, n_docs, total_chars, n_replacement,
    n_control, n_docs_affected, affected_frac)."""
    t = F.col(text_col)
    repl = F.size(F.regexp_extract_all(t, F.lit("�"), 0))
    ctrl = F.size(
        F.regexp_extract_all(
            t, F.lit("[\x00-\x08\x0b\x0c\x0e-\x1f]"), 0
        )
    )
    affected = ((repl > 0) | (ctrl > 0)).cast("int")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(t).cast("long")).alias("total_chars"),
        F.sum(repl.cast("long")).alias("n_replacement"),
        F.sum(ctrl.cast("long")).alias("n_control"),
        F.sum(affected).cast("long").alias("n_docs_affected"),
        (
            F.sum(affected).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("affected_frac"),
    )


def readability_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch-Kincaid-style readability per document from three regex
    counts — words (letter runs), sentences ([.!?]+ runs, min 1), and
    HEURISTIC syllables (vowel-group runs per word, the standard cheap
    proxy) — then the fixed FK grade-level polynomial

        0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    — the corpus-difficulty feature curriculum ordering and
    age-appropriateness filters key on. All counts are codegen
    ``regexp_extract_all`` sizes (character classes only, RE2-safe);
    the grade is one fixed double expression of exact integers —
    bit-portable. English-calibrated (the vowel heuristic and the FK
    constants); scores on other languages are monotone difficulty
    proxies, not grade levels. Zero-word docs report NULL scores.

    Returns (id, n_words, n_sentences, n_syllables, fk_grade)."""
    t = F.col(text_col)
    words = F.size(F.regexp_extract_all(F.lower(t), F.lit("[a-z]+"), 0))
    sents = F.greatest(
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)), F.lit(1)
    )
    syll = F.size(
        F.regexp_extract_all(F.lower(t), F.lit("[aeiouy]+"), 0)
    )
    wd = words.cast("double")
    sd = sents.cast("double")
    yd = syll.cast("double")
    grade = (
        F.lit(0.39) * (wd / sd)
        + F.lit(11.8) * (yd / wd)
        - F.lit(15.59)
    )
    return df.select(
        F.col(id_col),
        words.cast("long").alias("n_words"),
        sents.cast("long").alias("n_sentences"),
        syll.cast("long").alias("n_syllables"),
        F.when(words > 0, grade).alias("fk_grade"),
    )


def blocklist_stats(
    df: DataFrame,
    terms: list[str],
    group_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Blocklist screening per group: total hits of any listed term
    (word-boundary, case-insensitive) and the flagged-document rate —
    the safety/compliance pre-filter a corpus release runs (policy
    terms, competitor names, embargoed strings).

    The alternation compiles to ONE regex evaluated in a single
    codegen scan (O(terms) pattern size, not O(terms) passes); terms
    are regex-escaped so the list is data, not syntax, and matching is
    word-bounded (``\\b``) so 'ass' never flags 'class'. Counts exact;
    rate one double division. Returns (group, n_docs, n_hits,
    n_docs_flagged, flagged_frac)."""
    if not terms:
        raise ValueError("blocklist_stats needs at least one term")
    import re as _re

    def bounded(t: str) -> str:
        # \b only binds against a WORD character — a term starting or
        # ending with punctuation ('$9.99') would never match with a
        # blanket boundary, so each edge gets one only when word-y
        lead = "\\b" if _re.match(r"\w", t) else ""
        tail = "\\b" if _re.search(r"\w$", t) else ""
        return lead + _re.escape(t) + tail

    pat = "(?i)(" + "|".join(bounded(t) for t in sorted(terms)) + ")"
    hits = F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
    flagged = (hits > 0).cast("int")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(hits.cast("long")).alias("n_hits"),
        F.sum(flagged).cast("long").alias("n_docs_flagged"),
        (
            F.sum(flagged).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("flagged_frac"),
    )


def s_stem(tok: Column | str) -> Column:
    """Harman's "S stemmer" (1991) — the three-rule plural stripper
    retrieval systems use when a full Porter stack over-stems:

    1. ``-ies`` -> ``-y``  unless the token ends ``eies``/``aies``
    2. ``-es``  -> ``-e``  unless the token ends ``aes``/``ees``/``oes``
    3. ``-s``   -> drop    unless the token ends ``us``/``ss``

    First matching rule wins; rules are pure suffix CASE logic, so the
    oracle replicates them verbatim in SQL (no regex-dialect risk).
    Tokens shorter than 4 chars pass through untouched (stemming "is"
    or "ies" conflates more than it helps)."""
    c = F.col(tok) if isinstance(tok, str) else tok
    drop_last = c.substr(F.lit(1), F.length(c) - 1)
    ies_to_y = F.concat(c.substr(F.lit(1), F.length(c) - 3), F.lit("y"))
    # each suffix class is TERMINAL: an exception token passes through
    # unchanged rather than cascading into the next (shorter) rule
    return (
        F.when(F.length(c) < 4, c)
        .when(
            c.endswith("ies"),
            F.when(c.endswith("eies") | c.endswith("aies"), c).otherwise(
                ies_to_y
            ),
        )
        .when(
            c.endswith("es"),
            F.when(
                c.endswith("aes") | c.endswith("ees") | c.endswith("oes"), c
            ).otherwise(drop_last),
        )
        .when(
            c.endswith("s"),
            F.when(c.endswith("us") | c.endswith("ss"), c).otherwise(
                drop_last
            ),
        )
        .otherwise(c)
    )


def code_switch_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Code-switching / language-consistency audit: split each document
    into sentences ([.!?]+ runs), language-ID every sentence with the
    SAME heuristic as :func:`language_id`, and report how much of the
    document disagrees with its majority language — the multilingual-
    corpus screen that catches mixed-language crawl pages and bad
    boilerplate splices before they poison per-language training
    shards. Returns one row per doc with ≥1 sentence:
    (id, n_sentences, majority_lang, n_majority, switch_scaled)
    where switch_scaled = ⌊(1 − majority share) · 10⁶⌋ (exact integer
    DIV — 0 means monolingual).

    Ties: the majority language resolves by (count DESC, lang ASC);
    sentence-level ID inherits language_id's alphabetical-first-argmax
    — both total orders, both mirrored in the oracle. Shape: one
    sentence explode + per-sentence codegen CASE scoring (no Python),
    one (doc, lang) count aggregation, one per-doc window over ≤5
    language rows."""
    from pyspark.sql import Window

    sents = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"[.!?]+")).alias("__s"),
    )
    sents = sents.select(
        F.col(id_col), F.trim(F.col("__s")).alias("__sent")
    ).filter(F.length("__sent") > 0)
    langd = sents.select(
        F.col(id_col), language_id("__sent").alias("__lang")
    )
    counts = langd.groupBy(id_col, "__lang").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__n").desc(), F.col("__lang").asc()
    )
    wt = Window.partitionBy(id_col)
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_sentences", F.sum("__n").over(wt).cast("long"))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            "n_sentences",
            F.col("__lang").alias("majority_lang"),
            F.col("__n").alias("n_majority"),
            F.expr(
                "CAST(((n_sentences - __n) * 1000000) DIV n_sentences"
                " AS BIGINT)"
            ).alias("switch_scaled"),
        )
    )


def classifier_kappa(
    df: DataFrame,
    pred_col: Column | str,
    true_col: Column | str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """Cohen's kappa between a predicted and a gold label column —
    chance-corrected agreement, the honest score for any heuristic
    classifier audit (raw accuracy flatters on skewed label
    distributions). Returns ONE row: (n, n_agree, kappa_scaled).

    Exactness: with integer marginals r_i (predicted) and c_i (gold),
    κ = (n·agree − Σᵢ rᵢcᵢ) ∕ (n² − Σᵢ rᵢcᵢ) — a SINGLE integer
    ratio (both the observed and expected agreement share the n²
    denominator, which cancels), floor-scaled by exact DECIMAL DIV.
    Shape: one count aggregation to (pred, true) cell grain (the
    confusion matrix), marginals derived from the cells — nothing
    rescans the data."""
    p = F.col(pred_col) if isinstance(pred_col, str) else pred_col
    t = F.col(true_col) if isinstance(true_col, str) else true_col
    cells = df.groupBy(
        p.alias("__p"), t.alias("__t")
    ).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    r = cells.groupBy("__p").agg(F.sum("__n").alias("__r"))
    c = cells.groupBy("__t").agg(F.sum("__n").alias("__c"))
    rc = (
        r.join(c, r["__p"] == c["__t"])
        .select((F.col("__r").cast("decimal(38,0)") * F.col("__c")).alias("__rc"))
        .agg(F.sum("__rc").alias("__src"))
    )
    base = cells.agg(
        F.sum("__n").cast("long").alias("n"),
        F.sum(F.when(F.col("__p") == F.col("__t"), F.col("__n"))).cast(
            "long"
        ).alias("n_agree"),
    )
    return base.join(F.broadcast(rc)).select(
        "n",
        F.coalesce(F.col("n_agree"), F.lit(0)).alias("n_agree"),
        F.expr(
            f"CAST(((CAST(n AS DECIMAL(38,0)) * n_agree - __src)"
            f" * {scale}) DIV (CAST(n AS DECIMAL(38,0)) * n - __src)"
            " AS BIGINT)"
        ).alias("kappa_scaled"),
    )


def stopword_only_language_id(text_col: Column | str) -> Column:
    """The DEGRADED language-ID baseline: the same alphabetical-first
    argmax as :func:`language_id` but over stopword hits only — no CJK
    character channel, so zh text (unsegmented, zero stopword-token
    hits) collapses into whichever space-segmented language wins the
    all-zero tie (alphabetically 'de'). Exists as the PAIRED baseline
    for McNemar comparisons: same documents, same decision procedure,
    one ablated feature."""
    langs = [lg for lg in sorted(STOPWORDS) if lg != "zh"]
    scores = {lg: stopword_hits(text_col, lg) for lg in langs}
    expr: Column | None = None
    for lg in langs:
        cond = None
        for other in langs:
            if other == lg:
                continue
            c = scores[lg] >= scores[other]
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, F.lit(lg))
            if expr is None
            else expr.when(cond, F.lit(lg))
        )
    return expr.otherwise(F.lit(langs[0]))


def mcnemar_paired_test(
    df: DataFrame,
    pred_a_col: str,
    pred_b_col: str,
    true_col: str,
    *,
    scale: int = 1_000_000,
) -> DataFrame:
    """McNEMAR's test for PAIRED classifiers: on the same examples,
    count the discordant pairs — b = A right & B wrong, c = A wrong &
    B right — and report the statistic (b−c)²∕(b+c); concordant pairs
    carry no information about which classifier is better, which is
    why the paired test beats comparing two accuracies (the shared
    hard examples cancel). Returns ONE row: (n, n_both_right,
    n_only_a, n_only_b, mcnemar_scaled).

    Exactness: four conditional integer counts in one pass; the
    statistic is a floor-scaled integer ratio ((b−c)² and (b+c) are
    exact bigints). b + c = 0 reports 0 (no evidence either way)."""
    a_ok = F.col(pred_a_col) == F.col(true_col)
    b_ok = F.col(pred_b_col) == F.col(true_col)
    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((a_ok & b_ok).cast("long")).cast("long").alias(
            "n_both_right"
        ),
        F.sum((a_ok & ~b_ok).cast("long")).cast("long").alias("n_only_a"),
        F.sum((~a_ok & b_ok).cast("long")).cast("long").alias("n_only_b"),
    )
    b, c = F.col("n_only_a"), F.col("n_only_b")
    return agg.select(
        "n",
        "n_both_right",
        "n_only_a",
        "n_only_b",
        F.when(b + c > 0,
            F.expr(
                f"CAST(((n_only_a - n_only_b) * (n_only_a - n_only_b)"
                f" * CAST({scale} AS BIGINT))"
                " DIV (n_only_a + n_only_b) AS BIGINT)"
            ),
        ).otherwise(F.lit(0)).alias("mcnemar_scaled"),
    )


def msttr(
    docs: DataFrame,
    *,
    window: int = 50,
    scale: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mean Segmental Type-Token Ratio (MSTTR, Johnson 1944): lexical
    diversity as the mean TYPE/TOKEN ratio over consecutive FULL
    ``window``-token segments — the length-robust diversity measure
    (plain TTR collapses as documents grow, so corpus comparisons on
    raw TTR just measure length; segmenting fixes the denominator).
    Low MSTTR flags templated/repetitive text next to the Gopher
    repetition ratios.

    Exactness: per-segment distinct counts are integers; the doc score
    is the floor-scaled integer ratio Σdistinct·scale DIV
    (window·n_segments) — no float division until nothing is left to
    diverge. Partial trailing segments are EXCLUDED (that's the
    'segmental' in the name). Docs shorter than one full window emit
    no row.

    Shape: one posexplode over tokens (segment id = pos DIV window —
    row-local), one (doc, segment)-grain distinct aggregation, one
    doc-grain rollup. Returns (doc_id, n_segments, sum_distinct,
    msttr_scaled)."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("__pos", "__w"),
    ).select(
        id_col,
        (F.col("__pos") / window).cast("long").alias("__seg"),
        "__w",
    )
    seg = tok.groupBy(id_col, "__seg").agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct("__w").alias("__d"),
    ).filter(F.col("__n") == window)
    return seg.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("__d").cast("long").alias("sum_distinct"),
        F.expr(
            f"CAST(CAST(SUM(__d) AS DECIMAL(38,0)) * {scale} "
            f"AS DECIMAL(38,0)) DIV (CAST({window} AS DECIMAL(38,0)) "
            f"* COUNT(1))"
        ).cast("long").alias("msttr_scaled"),
    )


def _kn_pairs(df: DataFrame, text_col: str, id_col: str | None = None):
    """Adjacent-token pairs (slice + arrays_zip, no self-join), with
    the doc id carried through when ``id_col`` is given — the shared
    front half of both Kneser–Ney operators (ONE copy: the exactness
    contract depends on the expression shape staying identical)."""
    toks = F.split(normalized_text(text_col), " ")
    keep = [F.col(id_col)] if id_col else []
    return (
        df.select(*keep, toks.alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(
            *keep,
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("__t"), 1, F.size("__t") - 1).alias("w1"),
                    F.slice(F.col("__t"), 2, F.size("__t") - 1).alias("w2"),
                )
            ).alias("__p"),
        )
        .select(
            *keep,
            F.col("__p.w1").alias("w1"),
            F.col("__p.w2").alias("w2"),
        )
    )


def _kn_model(pairs: DataFrame):
    """(big, ctx, fin, nt) count tables of the interpolated-KN bigram
    model over a pair frame — the shared back half."""
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12"))
    ctx = big.groupBy("w1").agg(
        F.sum("__c12").alias("__c1"), F.count(F.lit(1)).alias("__fo")
    )
    fin = big.groupBy("w2").agg(F.count(F.lit(1)).alias("__fi"))
    nt = big.agg(F.count(F.lit(1)).alias("__nt"))
    return big, ctx, fin, nt


def _kn_probability() -> Column:
    """The exact-rational interpolated-KN probability with D = 3/4,
    over the ``_kn_model`` column names, as ONE double division:
    ((4·c12 − 3)·N_t + 3·fanout·fanin) / (4·c1·N_t)."""
    dec = "decimal(38,0)"
    return (
        (
            (F.lit(4).cast(dec) * F.col("__c12") - 3)
            * F.col("__nt").cast(dec)
            + F.lit(3).cast(dec)
            * F.col("__fo").cast(dec)
            * F.col("__fi").cast(dec)
        ).cast("double")
        / (
            F.lit(4).cast(dec)
            * F.col("__c1").cast(dec)
            * F.col("__nt").cast(dec)
        ).cast("double")
    )


def kneser_ney_bigrams(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_context: int = 20,
    k: int = 50,
) -> DataFrame:
    """Interpolated Kneser–Ney bigram model (top-k table): the
    smoothing KenLM made the default for LLM-corpus quality filtering
    — absolute discounting D plus a CONTINUATION-count backoff
    ("how many contexts does w2 complete", not "how often does w2
    occur"), the fix for the add-k model's famous 'san francisco'
    failure where raw-frequency backoff overrates words that only ever
    appear in one collocation. Complements :func:`bigram_lm_scores`
    (add-k MLE): same pair grain, different estimator.

    Exactness scheme: with the textbook D = 3/4 every smoothed
    probability is the exact rational

        p = [ (4·c12 − 3)·N_t + 3·fanout(w1)·fanin(w2) ]
            / ( 4·c1 · N_t )

    (c12 = bigram count, c1 = context total, fanout/fanin = distinct
    continuation counts N1+(w1·) / N1+(·w2), N_t = distinct bigram
    types). Numerator/denominator ride exact DECIMAL(38,0) —
    int64-safe through ~4·T² for corpus token count T, decimal-safe
    essentially always — and p_kn is their SINGLE-division double:
    bit-identical in any engine (wide casts go through the VARCHAR
    round-trip oracle-side). Ordering (p_kn DESC, w1, w2) is total.

    Returns k rows: (w1, w2, c12, c1, fanout, fanin, p_kn) over
    bigrams whose context total c1 ≥ ``min_context`` (rare-context
    rows are estimator noise and would dominate the top-k).

    Shape: one scan explodes adjacent pairs (slice + arrays_zip, no
    self-join); counts are vocabulary-grain map-side-combined
    aggregates; fanin/N_t attach by shuffle join on their natural
    keys; the top-k is TakeOrderedAndProject. Model state lives in
    the dataflow — nothing driver-side."""
    big, ctx, fin, nt = _kn_model(_kn_pairs(df, text_col))
    scored = (
        big.join(ctx, "w1")
        .join(fin, "w2")
        .crossJoin(F.broadcast(nt))
        .filter(F.col("__c1") >= min_context)
        .select(
            "w1",
            "w2",
            F.col("__c12").cast("long").alias("c12"),
            F.col("__c1").cast("long").alias("c1"),
            F.col("__fo").cast("long").alias("fanout"),
            F.col("__fi").cast("long").alias("fanin"),
            _kn_probability().alias("p_kn"),
        )
    )
    return scored.orderBy(
        F.col("p_kn").desc(), F.col("w1"), F.col("w2")
    ).limit(k)


def kneser_ney_doc_scores(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Kneser–Ney quality signal: score every document
    by the MEAN interpolated-KN probability of its own bigrams under
    the corpus-trained model of :func:`kneser_ney_bigrams` — the
    continuation-count twin of :func:`bigram_lm_scores` (add-k MLE).
    Where add-k overrates tokens that are frequent inside ONE
    collocation, KN discounts them — running both and diffing the
    rankings is the standard smoothing-sensitivity check before
    trusting either as a corpus filter.

    Exactness: each bigram's probability is the exact rational of
    :func:`kneser_ney_bigrams` evaluated as ONE double division; the
    per-doc mean accumulates those doubles through DECIMAL(28,12)
    (the :func:`bigram_lm_scores` device), so the output is
    bit-identical across engines and partitionings. Documents with
    <2 tokens are absent (no transitions).

    Plan: one scan explodes adjacent pairs; model counts are
    vocabulary-grain map-side-combined aggregates of the SAME
    exploded frame; scoring re-joins pairs to the three count tables
    on natural keys and one final groupBy(id) serves
    (doc_id, n_transitions, avg_p_kn). Model state lives in the
    dataflow — nothing driver-side."""
    pairs = _kn_pairs(df, text_col, id_col)
    big, ctx, fin, nt = _kn_model(pairs.select("w1", "w2"))
    return (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, ["w1"])
        .join(fin, ["w2"])
        .crossJoin(F.broadcast(nt))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            (
                F.sum(_kn_probability().cast("decimal(28,12)")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_p_kn"),
        )
    )


def term_keyness(
    df: DataFrame,
    text_col: str,
    target_flag: Column,
    *,
    min_count: int = 5,
    k: int = 20,
    token_pattern: str = "[a-z0-9]+",
) -> DataFrame:
    """Chi-square KEYNESS: the terms most over/under-represented in a
    target sub-corpus vs the rest — the corpus-comparison primitive
    behind domain-shift audits, source profiling, and
    contamination-by-style screens (Dunning's log-likelihood G² is the
    textbook alternative; chi-square is its ln-free twin, in keeping
    with the engine's no-libm determinism discipline).

    Per term the 2×2 table (a = target count, b = reference count,
    c = A−a, d = B−b against corpus totals A, B) yields

        chi2 = N·(ad−bc)² / ((a+b)·(c+d)·A·B)

    computed EXACTLY where it matters: (ad−bc) rides DECIMAL(38,0)
    integer products (safe beyond 10¹⁸ tokens per side), is cast once
    to double (correctly rounded), and the final expression is a
    fixed parenthesization of exact-integer-valued doubles — the same
    IEEE ops any engine replays. `enriched_in_target` compares
    a·B > b·A in exact decimal (no rate division). Terms below
    ``min_count`` total occurrences are dropped (the standard keyness
    floor); output is the top-``k`` by chi2 (ties break on the term)
    via TakeOrderedAndProject.

    Scale: one token explode into a vocabulary-grain aggregate
    (map-side combined), one broadcast 1-row totals join, one top-k —
    no row-grain shuffle, no window."""
    if min_count < 1 or k < 1:
        raise ValueError("term_keyness: min_count and k must be >= 1")
    toks = df.select(
        target_flag.cast("boolean").alias("__t"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(token_pattern), 0
            )
        ).alias("term"),
    )
    counts = toks.groupBy("term").agg(
        F.sum(F.col("__t").cast("long")).alias("n_target"),
        F.sum((~F.col("__t")).cast("long")).alias("n_ref"),
    )
    tot = counts.agg(
        F.sum("n_target").cast("long").alias("__A"),
        F.sum("n_ref").cast("long").alias("__B"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = counts.crossJoin(F.broadcast(tot)).filter(
        (F.col("n_target") + F.col("n_ref")) >= F.lit(int(min_count))
    )
    a, b = F.col("n_target"), F.col("n_ref")
    A, B = F.col("__A"), F.col("__B")
    c, d = A - a, B - b
    nd = (dec(a) * dec(d) - dec(b) * dec(c)).cast("double")
    n_d = (A + B).cast("double")
    den = (
        ((a + b).cast("double") * (c + d).cast("double"))
        * A.cast("double")
    ) * B.cast("double")
    chi2 = F.when(den > 0, ((nd * nd) * n_d) / den)
    return (
        j.select(
            "term",
            "n_target",
            "n_ref",
            (dec(a) * dec(B) > dec(b) * dec(A)).alias(
                "enriched_in_target"
            ),
            chi2.alias("chi2"),
        )
        .orderBy(F.col("chi2").desc(), F.col("term"))
        .limit(int(k))
    )


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    *,
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Corpus-level distinct-n diversity (Li et al., "A
    Diversity-Promoting Objective Function for Neural Conversation
    Models", NAACL 2016): for each gram order ``n``, the number of
    distinct word ``n``-grams over the total occurrences — the
    standard degeneracy check on generated or scraped corpora (a
    template farm or decode-collapsed model scores near 0; natural
    text sits much higher, falling with n).

    One pass per gram order: explode -> hash aggregate onto the
    O(distinct grams) key domain (map-side combine absorbs the
    duplicate mass before the shuffle) -> one-row rollup; orders
    union at the end, so the whole report is len(ns) independent
    aggregation trees with no joins and nothing driver-side. Returns
    (n, total_grams, distinct_grams, distinct_ratio) ordered by n.
    """
    from functools import reduce

    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
        word_ngrams,
    )

    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ngram_diversity: orders must be >= 1, got {ns}")
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        _ensure_parallelism,
    )

    df = _ensure_parallelism(df)  # 1-file corpus would explode on 1 core
    parts = []
    for n in ns:
        per = (
            df.select(
                F.explode(
                    word_ngrams(_norm_tokens(text_col), int(n))
                ).alias("__g")
            )
            .groupBy("__g")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        parts.append(
            per.agg(
                F.lit(int(n)).cast("long").alias("n"),
                F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("total_grams"),
                F.count(F.lit(1)).cast("long").alias("distinct_grams"),
                (
                    F.count(F.lit(1)).cast("double")
                    / F.coalesce(F.sum("__c"), F.lit(0)).cast("double")
                ).alias("distinct_ratio"),
            )
        )
    # A gram order with zero grams corpus-wide (every doc shorter than n)
    # emits no row at all — a 0-total row would carry a NaN ratio here and
    # a NULL total on a SQL engine, a surface divergence with no reading
    # behind it (ADVICE r12).
    return reduce(lambda a, b: a.unionByName(b), parts).filter(
        F.col("total_grams") > 0
    )


def term_burstiness(
    df: DataFrame,
    text_col: str = "text",
    *,
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Term burstiness for the corpus' top-``k`` terms (Church & Gale,
    "Poisson mixtures", 1995; Katz 1996): the variance-to-mean ratio
    of a term's PER-DOCUMENT count across ALL documents (zeros
    included). Poisson scatter gives VMR = 1; content words are
    BURSTY (VMR >> 1 — a doc that mentions a topic mentions it
    repeatedly) while function words sit near 1. The reading feeds
    stopword induction and keyword weighting, and a synthetic/
    template corpus shows its signature here (uniformly low VMR).

    Engine-exactness: with S1 = sum of per-doc counts and S2 = sum of
    their squares over N docs,

        VMR = ((N*S2 - S1*S1)) / (N*S1)

    — numerator/denominator computed in DECIMAL(38,0) (any product of
    two BIGINTs is < 8.6e37, so the integer arithmetic is EXACT at any
    corpus size, independent of the session's ansi setting), ONE
    double divide, bit-identical everywhere.

    Shape: token explode -> (term, doc) count aggregate (map-side
    combine absorbs within-doc repeats) -> term-grain rollup of
    (S1, S2, df) -> broadcast N -> top-k by total occurrences
    (TakeOrderedAndProject, term tie-break). Zero-count docs never
    materialize: their contribution is algebraic (they add nothing to
    S1/S2 and N carries them).

    Returns (term, n_occurrences, n_docs, vmr), most frequent first.
    """
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
    )
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        _ensure_parallelism,
    )

    if k < 1 or min_count < 1:
        raise ValueError(
            f"term_burstiness: k={k} and min_count={min_count} must be >= 1"
        )
    df = _ensure_parallelism(df)
    docs = df.select(F.monotonically_increasing_id().alias("__rid"),
                     _norm_tokens(text_col).alias("__toks"))
    # monotonically_increasing_id is partition-dependent — fine HERE
    # because it only keys the per-doc count grain and never surfaces
    # (any distinct doc key gives identical S1/S2/df); the published
    # stats are key-free
    n_docs_total = docs.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    per_doc = (
        docs.select("__rid", F.explode("__toks").alias("__w"))
        .filter(F.length("__w") >= 1)
        .groupBy("__w", "__rid")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    term = per_doc.groupBy("__w").agg(
        F.sum("__c").cast("long").alias("__s1"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__s2"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return (
        term.filter(F.col("__s1") >= int(min_count))
        .crossJoin(F.broadcast(n_docs_total))
        .select(
            F.col("__w").alias("term"),
            F.col("__s1").alias("n_occurrences"),
            "n_docs",
            # products of two BIGINTs always fit DECIMAL(38,0)
            # (< 8.6e37), so the numerator/denominator are exact at ANY
            # corpus size under ANY ansi setting — no silent wrap, no
            # throw (ADVICE r12); the decimal->double casts are
            # correctly rounded, matching BIGINT->double on the oracle
            # wherever its int64 doesn't overflow.
            (
                (F.col("__N").cast("decimal(20,0)")
                 * F.col("__s2").cast("decimal(20,0)")
                 - F.col("__s1").cast("decimal(20,0)")
                 * F.col("__s1").cast("decimal(20,0)")).cast("double")
                / (F.col("__N").cast("decimal(20,0)")
                   * F.col("__s1").cast("decimal(20,0)")).cast("double")
            ).alias("vmr"),
        )
        .orderBy(F.col("n_occurrences").desc(), "term")
        .limit(int(k))
    )


# Fixed reference weights for quality_classifier_scores — a
# fastText-style document-quality gate distilled to a linear model over
# exact corpus features (the public-recipe shape: CCNet/Dolma-era
# pipelines gate on a tiny quality classifier before mixing). Values
# are documented constants, not fitted artifacts: natural prose scores
# positive, template/boilerplate junk negative.
QUALITY_CLASSIFIER_WEIGHTS: dict[str, float] = {
    "bias": -3.0,
    "len": 1.0,      # doc length, capped at 1000 tokens, /1000
    "diversity": 2.0,  # distinct_tokens / tokens
    "stopword": 4.0,   # en function-word ratio
    "alpha": 2.0,      # a-z chars / all token chars
}


def quality_classifier_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Linear quality-classifier gate over engine-exact text features
    — the discriminative companion to DSIR importance weighting (Xie
    et al. 2023) and the fastText-style pre-mix filter of the public
    corpus recipes (CCNet, Gopher/MassiveText rules, Dolma): a
    fixed-weight logit over (capped length, lexical diversity, en
    stopword ratio, alphabetic purity), documents passing at
    logit > 0.

    Engine-exactness: every feature is ONE divide of exact BIGINTs
    (correctly rounded double); each weight multiply and the
    LEFT-ASSOCIATIVE accumulation chain

        logit = ((((bias + w_len*f_len) + w_div*f_div)
                  + w_stop*f_stop) + w_alpha*f_alpha)

    is plain IEEE double arithmetic in a FIXED parenthesization — the
    mirrored-parenthesization device: any engine replaying the same
    chain reproduces the logit bit-for-bit. No exp/sigmoid (the logit
    IS the published score — monotone in the probability, exact).

    Shape at 100 TB: embarrassingly row-parallel — a single projection
    over the corpus scan, no shuffle, no state, whole-stage codegen
    end-to-end; the gate composes with token_budget_selection /
    sampling downstream.

    Returns (id_col, n_tokens, f_diversity, f_stopword, f_alpha,
    logit, quality_pass) for every document.
    """
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
    )

    w = dict(QUALITY_CLASSIFIER_WEIGHTS)
    if weights:
        unknown = set(weights) - set(w)
        if unknown:
            raise ValueError(
                f"quality_classifier_scores: unknown weights {sorted(unknown)}"
            )
        w.update({k: float(v) for k, v in weights.items()})

    toks = _norm_tokens(text_col)
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("__nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("__nd"),
        F.size(
            F.filter(
                toks,
                lambda t: F.array_contains(
                    F.array(*[F.lit(s) for s in STOPWORDS["en"]]), t
                ),
            )
        ).cast("long").alias("__nstop"),
        F.length(F.array_join(toks, "")).cast("long").alias("__nc"),
        F.length(
            F.regexp_replace(F.array_join(toks, ""), "[^a-z]", "")
        ).cast("long").alias("__na"),
    )
    f_len = (
        F.least(F.col("__nt"), F.lit(1000)).cast("double")
        / F.lit(1000.0)
    )
    f_div = F.col("__nd").cast("double") / F.col("__nt").cast("double")
    f_stop = F.col("__nstop").cast("double") / F.col("__nt").cast("double")
    f_alpha = F.when(
        F.col("__nc") > 0,
        F.col("__na").cast("double") / F.col("__nc").cast("double"),
    ).otherwise(F.lit(0.0))
    logit = (
        (
            (
                (F.lit(w["bias"]) + F.lit(w["len"]) * f_len)
                + F.lit(w["diversity"]) * f_div
            )
            + F.lit(w["stopword"]) * f_stop
        )
        + F.lit(w["alpha"]) * f_alpha
    )
    return base.select(
        id_col,
        F.col("__nt").alias("n_tokens"),
        f_div.alias("f_diversity"),
        f_stop.alias("f_stopword"),
        f_alpha.alias("f_alpha"),
        logit.alias("logit"),
        (logit > F.lit(0.0)).alias("quality_pass"),
    )


# The "required words" of the Gopher document-quality rule set (Rae et
# al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
# Training Gopher", appendix A1.1): a document must contain at least 2
# of these 8 English function words to count as natural prose.
GOPHER_REQUIRED_WORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    min_required_hits: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText document-quality rule set (Rae et al.
    2021, appendix A1.1) — the published heuristic gate every
    MassiveText-descended corpus pipeline (Gopher, Chinchilla, Dolma's
    Gopher-rules pass) runs before mixing, restricted to its
    word-grain rules (the line-grain bullet/ellipsis-line rules need
    multi-line documents; this corpus' documents are single-line, so
    those rules are vacuously true and deliberately not published):

    - R1 word count within ``[min_words, max_words]`` (paper: 50..100k)
    - R2 mean word length within ``[min_mean_word_len,
      max_mean_word_len]`` (paper: 3..10)
    - R3 symbol-to-word ratio (``#`` characters + non-overlapping
      ``...`` runs) at most 0.1
    - R4 at least 80 % of words contain an alphabetic character
    - R5 at least ``min_required_hits`` distinct
      :data:`GOPHER_REQUIRED_WORDS` present (paper: 2 of 8)

    Engine-exactness: every RULE is decided by BIGINT
    cross-multiplication (``total_chars >= 3*wc`` rather than
    ``total_chars/wc >= 3.0`` — no float threshold ever compared), so
    pass/fail bits are exact on any engine; the published diagnostic
    ratios are each ONE divide of exact BIGINTs (correctly rounded
    double, the standing scalar-surface device). Integer bounds keep
    the cross-multiplications in BIGINT (products are bounded by
    10 * chars, far under 2^63).

    Shape at 100 TB: embarrassingly row-parallel — one projection over
    the corpus scan, zero shuffles, whole-stage codegen end-to-end,
    exactly like :func:`quality_classifier_scores`; the two compose
    into the standard pre-mix gate chain.

    Returns (id_col, word_count, mean_word_len, symbol_ratio,
    alpha_word_frac, n_required_hits, r_word_count, r_mean_word_len,
    r_symbol_ratio, r_alpha_words, r_required_words, gopher_pass).
    """
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
        normalized_text,
    )

    for name, v in (
        ("min_words", min_words),
        ("max_words", max_words),
        ("min_mean_word_len", min_mean_word_len),
        ("max_mean_word_len", max_mean_word_len),
        ("min_required_hits", min_required_hits),
    ):
        if not isinstance(v, int) or v < 0:
            raise ValueError(
                f"gopher_quality_gate: {name}={v!r} must be a "
                "non-negative int (integer bounds keep the rule "
                "cross-multiplications exact in BIGINT)"
            )

    toks = _norm_tokens(text_col)
    norm = normalized_text(text_col)
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("__wc"),
        F.length(F.array_join(toks, "")).cast("long").alias("__chars"),
        (
            (F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit(""))))
            + (
                F.length(norm)
                - F.length(F.replace(norm, F.lit("..."), F.lit("")))
            )
            / F.lit(3)
        ).cast("long").alias("__nsym"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .cast("long")
        .alias("__nalpha"),
        F.size(
            F.filter(
                F.array(*[F.lit(wd) for wd in GOPHER_REQUIRED_WORDS]),
                lambda wd: F.array_contains(toks, wd),
            )
        ).cast("long").alias("__nreq"),
    )
    wc = F.col("__wc")
    r1 = (wc >= F.lit(min_words)) & (wc <= F.lit(max_words))
    r2 = (F.col("__chars") >= F.lit(min_mean_word_len) * wc) & (
        F.col("__chars") <= F.lit(max_mean_word_len) * wc
    )
    r3 = F.lit(10) * F.col("__nsym") <= wc
    r4 = F.lit(5) * F.col("__nalpha") >= F.lit(4) * wc
    r5 = F.col("__nreq") >= F.lit(min_required_hits)
    return base.select(
        id_col,
        wc.alias("word_count"),
        (F.col("__chars").cast("double") / wc.cast("double")).alias(
            "mean_word_len"
        ),
        (F.col("__nsym").cast("double") / wc.cast("double")).alias(
            "symbol_ratio"
        ),
        (F.col("__nalpha").cast("double") / wc.cast("double")).alias(
            "alpha_word_frac"
        ),
        F.col("__nreq").alias("n_required_hits"),
        r1.alias("r_word_count"),
        r2.alias("r_mean_word_len"),
        r3.alias("r_symbol_ratio"),
        r4.alias("r_alpha_words"),
        r5.alias("r_required_words"),
        (r1 & r2 & r3 & r4 & r5).alias("gopher_pass"),
    )


def zipf_doubling_ratios(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_rank: int = 128,
) -> DataFrame:
    """Zipf-law corpus-health signature WITHOUT transcendentals: the
    frequency ratio f(r)/f(2r) at every power-of-two rank r — for a
    Zipfian corpus f(r) ∝ r^(-s), so each doubling ratio equals 2^s
    and a healthy natural-language corpus reads a roughly CONSTANT
    ratio ≈ 2 (s ≈ 1) across decades (Zipf 1949; Piantadosi 2014 for
    the modern treatment). Template/boilerplate corpora bend the curve
    (head-heavy: early ratios explode; synthetic uniform text: ratios
    collapse toward 1). This is the rank-frequency OLS fit every
    corpus audit runs, re-expressed so the published surface stays in
    exact arithmetic — each ratio is ONE divide of two exact BIGINT
    counts (the standing no-ln discipline: publishing log-log slopes
    would put ``ln`` ulps between engines; the user exponentiates
    nothing, s = log2(ratio) is theirs to take offline).

    Shape at 100 TB: token explode -> (term) count aggregate (map-side
    combine collapses to vocabulary grain) -> TakeOrderedAndProject of
    the top ``2*max_rank`` terms -> rank + self-join on the tiny
    K-row head. Nothing after the vocabulary aggregate touches more
    than ``2*max_rank`` rows.

    window: grain-bounded — row_number over the TakeOrderedAndProject
    head, at most ``2*max_rank`` rows by construction.

    Returns (rank, term, freq, freq_2x, doubling_ratio) for each
    power-of-two rank r = 1, 2, 4, ... <= max_rank where rank 2r
    exists in the vocabulary; deterministic under count ties (rank
    orders by count DESC, term ASC).
    """
    from pyspark.sql import Window

    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
    )
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        _ensure_parallelism,
    )

    if max_rank < 1 or max_rank & (max_rank - 1):
        raise ValueError(
            f"zipf_doubling_ratios: max_rank={max_rank} must be a "
            "positive power of two"
        )
    df = _ensure_parallelism(df)
    counts = (
        df.select(F.explode(_norm_tokens(text_col)).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    head = counts.orderBy(F.col("c").desc(), "t").limit(2 * max_rank)
    ranked = head.withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.col("c").desc(), "t")
        ).cast("long"),
    )
    pows = [1 << i for i in range(max_rank.bit_length())]  # 1..max_rank
    at_r = ranked.filter(F.col("r").isin(pows)).select(
        F.col("r").alias("rank"), F.col("t").alias("term"),
        F.col("c").alias("freq"),
    )
    at_2r = ranked.filter((F.col("r") % 2 == 0)).select(
        (F.col("r") / F.lit(2)).cast("long").alias("rank"),
        F.col("c").alias("freq_2x"),
    )
    return (
        at_r.join(F.broadcast(at_2r), "rank")
        .select(
            "rank",
            "term",
            "freq",
            "freq_2x",
            (
                F.col("freq").cast("double")
                / F.col("freq_2x").cast("double")
            ).alias("doubling_ratio"),
        )
        .orderBy("rank")
    )


def quality_gate_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source pass-rate funnel through BOTH pre-mix gates — the
    mixture audit a production corpus pipeline runs before setting
    sampling weights: how much of each source survives the Gopher
    rule set (:func:`gopher_quality_gate`, paper defaults), the
    linear classifier gate (:func:`quality_classifier_scores`,
    logit > 0), and their conjunction.

    Both per-doc pass bits are computed in ONE row-parallel projection
    (the funnel deliberately re-derives the bits rather than joining
    the two gate outputs — a doc-grain join would be the only shuffle
    in an otherwise O(sources) plan; a parity unit test pins the
    re-derivation to the operators bit-for-bit), then ONE map-side-
    combined aggregate to source grain. Counts are exact BIGINTs;
    each rate is ONE divide of exact BIGINTs (the standing
    scalar-surface device).

    Shape at 100 TB: scan -> projection -> partial agg -> O(sources)
    exchange. Nothing holds more than one row per source after the
    combine.

    Returns (source_col, n_docs, n_gopher_pass, n_classifier_pass,
    n_both_pass, gopher_pass_rate, classifier_pass_rate,
    both_pass_rate) sorted by source.
    """
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
        normalized_text,
    )

    toks = _norm_tokens(text_col)
    norm = normalized_text(text_col)
    w = QUALITY_CLASSIFIER_WEIGHTS
    base = df.select(
        F.col(source_col),
        F.size(toks).cast("long").alias("__wc"),
        F.size(F.array_distinct(toks)).cast("long").alias("__nd"),
        F.size(
            F.filter(
                toks,
                lambda t: F.array_contains(
                    F.array(*[F.lit(s) for s in STOPWORDS["en"]]), t
                ),
            )
        ).cast("long").alias("__nstop"),
        F.length(F.array_join(toks, "")).cast("long").alias("__chars"),
        F.length(
            F.regexp_replace(F.array_join(toks, ""), "[^a-z]", "")
        ).cast("long").alias("__na"),
        (
            (F.length(norm) - F.length(F.replace(norm, F.lit("#"), F.lit(""))))
            + (
                F.length(norm)
                - F.length(F.replace(norm, F.lit("..."), F.lit("")))
            )
            / F.lit(3)
        ).cast("long").alias("__nsym"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
        .cast("long")
        .alias("__nalpha"),
        F.size(
            F.filter(
                F.array(*[F.lit(wd) for wd in GOPHER_REQUIRED_WORDS]),
                lambda wd: F.array_contains(toks, wd),
            )
        ).cast("long").alias("__nreq"),
    )
    wc = F.col("__wc")
    gopher = (
        (wc >= F.lit(50))
        & (wc <= F.lit(100_000))
        & (F.col("__chars") >= F.lit(3) * wc)
        & (F.col("__chars") <= F.lit(10) * wc)
        & (F.lit(10) * F.col("__nsym") <= wc)
        & (F.lit(5) * F.col("__nalpha") >= F.lit(4) * wc)
        & (F.col("__nreq") >= F.lit(2))
    )
    f_len = F.least(wc, F.lit(1000)).cast("double") / F.lit(1000.0)
    f_div = F.col("__nd").cast("double") / wc.cast("double")
    f_stop = F.col("__nstop").cast("double") / wc.cast("double")
    f_alpha = F.when(
        F.col("__chars") > 0,
        F.col("__na").cast("double") / F.col("__chars").cast("double"),
    ).otherwise(F.lit(0.0))
    logit = (
        (
            (
                (F.lit(w["bias"]) + F.lit(w["len"]) * f_len)
                + F.lit(w["diversity"]) * f_div
            )
            + F.lit(w["stopword"]) * f_stop
        )
        + F.lit(w["alpha"]) * f_alpha
    )
    classifier = logit > F.lit(0.0)
    flags = base.select(
        source_col,
        gopher.cast("long").alias("__g"),
        classifier.cast("long").alias("__q"),
        (gopher & classifier).cast("long").alias("__b"),
    )
    agg = flags.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__g").cast("long").alias("n_gopher_pass"),
        F.sum("__q").cast("long").alias("n_classifier_pass"),
        F.sum("__b").cast("long").alias("n_both_pass"),
    )
    rate = lambda num: num.cast("double") / F.col("n_docs").cast("double")
    return agg.select(
        source_col,
        "n_docs",
        "n_gopher_pass",
        "n_classifier_pass",
        "n_both_pass",
        rate(F.col("n_gopher_pass")).alias("gopher_pass_rate"),
        rate(F.col("n_classifier_pass")).alias("classifier_pass_rate"),
        rate(F.col("n_both_pass")).alias("both_pass_rate"),
    ).orderBy(source_col)


def vocab_coverage_curve(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_k: int = 256,
) -> DataFrame:
    """Token-mass coverage of the top-k vocabulary at power-of-two k —
    the tokenizer/vocabulary-sizing diagnostic (what OOV rate would a
    k-entry word vocabulary leave?): coverage(k) = (tokens whose term
    ranks in the top k) / (all tokens). Natural corpora follow
    Zipf/Heaps, so coverage grows fast then saturates; the curve's
    knee is where vocabulary budget stops paying
    (:func:`zipf_doubling_ratios` is the same head seen as ratios).

    Exactness: covered and total token counts are exact BIGINTs
    (each head rank's mass summed into every power-of-two k at or
    above it); each coverage value is ONE divide of exact BIGINTs. Rank ties break by term ASC — a
    total order, so the curve is deterministic on any engine.

    Shape at 100 TB: token explode -> vocabulary-grain count
    aggregate (map-side combine) -> ``max_k``-row
    TakeOrderedAndProject head -> one explode+sum pass over the tiny
    head -> one broadcast scalar join for the corpus total. Nothing
    after the aggregate touches more than ``max_k`` rows.

    window: grain-bounded — rank over the TakeOrderedAndProject head,
    at most ``max_k`` rows by construction.

    Returns (k, covered_tokens, total_tokens, coverage) for
    k = 1, 2, 4, ... max_k (k rows with fewer than k distinct terms
    report the full corpus mass: coverage saturates at 1.0).
    """
    from pyspark.sql import Window

    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
    )
    from streaming_data_pipeline_azure_spark.operators.dedup import (
        _ensure_parallelism,
    )

    if max_k < 1 or max_k & (max_k - 1):
        raise ValueError(
            f"vocab_coverage_curve: max_k={max_k} must be a positive "
            "power of two"
        )
    df = _ensure_parallelism(df)
    toks = _norm_tokens(text_col)
    # corpus total from the scan directly (no second pass over the
    # vocabulary aggregate): one scalar, broadcast below
    total = df.select(
        F.size(F.filter(toks, lambda t: t != F.lit(""))).alias("__n")
    ).agg(F.sum("__n").cast("long").alias("total_tokens"))
    counts = (
        df.select(F.explode(toks).alias("t"))
        .filter(F.col("t") != "")
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    head = counts.orderBy(F.col("c").desc(), "t").limit(max_k)
    ranked = head.select(
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), "t"))
        .cast("long")
        .alias("r"),
        "c",
    )
    pows = [1 << i for i in range(max_k.bit_length())]  # 1..max_k
    # ONE pass over the tiny head: rank r contributes its mass to every
    # power-of-two k >= r (a k wider than the vocabulary automatically
    # absorbs the whole head -> coverage saturates at 1.0)
    curve = (
        ranked.select(
            F.explode(
                F.filter(
                    F.array(*[F.lit(k).cast("long") for k in pows]),
                    lambda k: k >= F.col("r"),
                )
            ).alias("k"),
            "c",
        )
        .groupBy("k")
        .agg(F.sum("c").cast("long").alias("covered_tokens"))
    )
    return (
        curve.join(F.broadcast(total))
        .select(
            "k",
            "covered_tokens",
            "total_tokens",
            (
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens").cast("double")
            ).alias("coverage"),
        )
        .orderBy("k")
    )
