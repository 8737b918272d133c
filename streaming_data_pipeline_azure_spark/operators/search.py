"""Full-text relevance search over the document corpus: BM25 scoring
and top-k retrieval — the lexical counterpart of the embedding top-k in
``similarity.py`` (real retrieval stacks run both and fuse).

Scale design (the 100 TB contract):

- Tokens are filtered to the QUERY TERMS before anything shuffles, so
  the corpus-wide aggregation carries only matching (doc, term) pairs —
  a |Q|-term query over a petabyte corpus shuffles rows proportional to
  the terms' postings, exactly what an inverted index would read.
- The document-frequency table is |Q| rows and the corpus statistics
  (N, total length) are one row; both broadcast.
- Top-k is ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject,
  a per-partition heap + driver merge, never a full sort.

Determinism contract (same as ``text.py``/``corpus.py``): the classic
BM25 idf is ``ln((N-df+0.5)/(df+0.5))``; ``ln`` rounding is libm- and
engine-specific, so the scoring here uses the LOG-FREE idf ratio
``(N-df+0.5)/(df+0.5)`` (the same choice ``tfidf_top_terms`` documents)
— per-term order is identical to the ln form (ln is monotone); only the
cross-term mixing weights differ. Per-document term-score sums flow
through DECIMAL(28,10) so summation order cannot perturb the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df

from streaming_data_pipeline_azure_spark.operators.corpus import _norm_tokens


def _score_topk(
    tf: DataFrame,
    docfreq: DataFrame,
    stats: DataFrame,
    id_col: str,
    *,
    k: int,
    k1: float,
    b: float,
    require_all_of: int | None = None,
    exclude_full_of: int | None = None,
) -> DataFrame:
    """Shared BM25 scoring tail: ``tf`` is (id, __dl, __t, __tf) for the
    MATCHING (doc, term) pairs only, ``docfreq`` is (__t, __df), ``stats``
    is one row (__n_docs, __total_len). Both the direct corpus-scan path
    (:func:`bm25_topk`) and the postings-index path
    (:meth:`PostingsIndex.search`) end here, which is what makes them
    bit-identical (the index query is oracle-backed by the same SQL).
    ``require_all_of`` = the query's term count turns OR retrieval into
    AND (conjunctive) retrieval: only documents matching EVERY term
    survive (HAVING n_matched = |Q| after the same aggregation — no
    extra shuffle). ``exclude_full_of`` is the inverse gate (keep only
    PARTIAL matches, n_matched < |Q|) — the lexical hard-negative
    filter, applied BEFORE the top-k heap so near-misses surface no
    matter how many full matches outscore them."""
    avgdl = F.col("__total_len").cast("double") / F.col("__n_docs")
    idf = (
        (F.col("__n_docs") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    term_score = idf * (
        (F.col("__tf") * F.lit(k1 + 1.0))
        / (
            F.col("__tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("__dl") / avgdl))
        )
    )
    scored = (
        tf.join(F.broadcast(docfreq), "__t")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum(term_score.cast("decimal(28,10)"))
            .cast("double")
            .alias("score"),
        )
    )
    if require_all_of is not None:
        scored = scored.filter(F.col("n_matched") == require_all_of)
    if exclude_full_of is not None:
        scored = scored.filter(F.col("n_matched") < exclude_full_of)
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = False,
    hard_negatives: bool = False,
) -> DataFrame:
    """Top-``k`` documents by (log-free) BM25 relevance to
    ``query_terms``: per matching term,

        idf_ratio(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

    with ``idf_ratio = (N - df + 0.5) / (df + 0.5)``, summed over the
    query terms through DECIMAL(28,10). Returns (id, n_matched, score)
    ordered by score desc with the id as deterministic tie-break."""
    terms = sorted(set(t.lower() for t in query_terms))
    base = df.select(F.col(id_col), _norm_tokens(text_col).alias("__toks"))
    # one-row corpus stats; broadcast into every downstream row
    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum(F.size("__toks")).alias("__total_len"),
    )
    # per-doc length + per-(doc, matching term) tf. The filter to the
    # query terms happens INSIDE the explode projection, so non-matching
    # tokens die in the scan stage and never shuffle.
    tf = (
        base.select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.explode(
                F.filter(
                    F.col("__toks"),
                    lambda t: t.isin(*terms) if len(terms) > 1 else t == terms[0],
                )
            ).alias("__t"),
        )
        .groupBy(id_col, "__dl", "__t")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    docfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
    return _score_topk(
        tf, docfreq, stats, id_col, k=k, k1=k1, b=b,
        require_all_of=len(terms) if require_all else None,
        exclude_full_of=len(terms) if hard_negatives else None,
    )


def lm_dirichlet_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    mu: float = 250.0,
    k: int = 10,
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty, SIGIR 2001) — the language-modeling alternative to BM25:

        score(d|Q) = Π_t (tf_{t,d} + mu * cf_t/|C|) / (dl_d + mu)

    over the (deduplicated, sorted) query terms, computed in
    PROBABILITY SPACE with a FIXED left-to-right multiply order — the
    log-sum form would drag engine-specific ``ln`` rounding into the
    score (the lm_quality_scores/tfidf determinism precedent), while a
    fixed-order product of |Q| doubles is bit-identical everywhere.
    Candidates are documents matching >= 1 term (the standard
    retrieval set); unmatched terms still contribute their background
    ``mu*p(t|C)/(dl+mu)`` factor, which the tf-pivot handles by
    coalescing tf to 0 — so scores are the true smoothed likelihoods,
    not the matched-term fragment.

    Scale shape (the bm25_topk contract): tokens filter to the query
    terms before anything shuffles; corpus stats (|C|, per-term cf)
    are one broadcast row; the tf pivot is one aggregation keyed by
    doc; top-k is TakeOrderedAndProject. Returns (id, n_matched,
    score), best first, id tie-break."""
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("lm_dirichlet_topk needs at least one term")
    base = df.select(F.col(id_col), _norm_tokens(text_col).alias("__toks"))
    match_tok = F.filter(
        F.col("__toks"),
        lambda t: t.isin(*terms) if len(terms) > 1 else t == terms[0],
    )
    # ONE corpus pass: total token count AND each term's collection
    # frequency (conditional sums over the matching tokens only). The
    # closure factory matters: a `lambda t, term=...` default would make
    # F.filter treat the second parameter as the ARRAY INDEX argument.
    def _eq(term: str):
        return lambda t: t == term

    stats = base.select(
        F.size("__toks").alias("__dl"), match_tok.alias("__m")
    ).agg(
        F.sum(F.col("__dl").cast("long")).alias("__total_len"),
        *[
            F.sum(
                F.size(F.filter(F.col("__m"), _eq(terms[i]))).cast("long")
            ).alias(f"__cf_{i}")
            for i in range(len(terms))
        ],
    )
    tf = (
        base.select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            F.explode(match_tok).alias("__t"),
        )
        .groupBy(id_col, "__dl")
        .agg(
            *[
                F.sum(F.when(F.col("__t") == terms[i], 1).otherwise(0))
                .cast("long")
                .alias(f"__tf_{i}")
                for i in range(len(terms))
            ]
        )
    )
    joined = tf.crossJoin(F.broadcast(stats))
    dl_mu = F.col("__dl").cast("double") + F.lit(float(mu))
    score = None
    for i in range(len(terms)):
        p_c = F.col(f"__cf_{i}").cast("double") / F.col(
            "__total_len"
        ).cast("double")
        s_i = (
            F.col(f"__tf_{i}").cast("double") + F.lit(float(mu)) * p_c
        ) / dl_mu
        score = s_i if score is None else score * s_i
    n_matched = None
    for i in range(len(terms)):
        m_i = F.when(F.col(f"__tf_{i}") > 0, 1).otherwise(0)
        n_matched = m_i if n_matched is None else n_matched + m_i
    return (
        joined.select(
            F.col(id_col),
            n_matched.cast("long").alias("n_matched"),
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def term_proximity_topk(
    df: DataFrame,
    term_a: str,
    term_b: str,
    *,
    window: int,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Proximity retrieval: rank documents by how often ``term_a`` and
    ``term_b`` occur within ``window`` token positions of each other —
    the slop generalization of :func:`phrase_topk`'s exact adjacency
    ("spark" near "join", not necessarily touching).

    Scale shape: per-term position lists filter BEFORE anything
    shuffles (only the two terms' postings flow, the bm25_topk
    contract), and the position pairing is
    :func:`~streaming_data_pipeline_azure_spark.operators.temporal.band_join`
    on (doc, ⌊pos/window⌋) — an equi-join with a ±1 bucket probe, so
    cost is O(matching positions), never positions². Counting pairs
    (not minimal spans) keeps the score a pure integer, bit-portable
    by construction.

    Returns (id, n_pairs) for the top-``k`` documents, most pairs
    first, id tie-break."""
    if window < 1:
        raise ValueError("term_proximity_topk needs window >= 1")
    from streaming_data_pipeline_azure_spark.operators.temporal import (
        band_join,
    )

    ta, tb = term_a.lower(), term_b.lower()
    if ta == tb:
        raise ValueError("term_proximity_topk needs two distinct terms")
    base = df.select(
        F.col(id_col), F.posexplode(_norm_tokens(text_col)).alias(
            "__p", "__t"
        )
    )
    pa = base.filter(F.col("__t") == ta).select(
        F.col(id_col), F.col("__p").cast("double").alias("__pa")
    )
    pb = base.filter(F.col("__t") == tb).select(
        F.col(id_col), F.col("__p").cast("double").alias("__pb")
    )
    pairs = band_join(
        pa, pb, left_val="__pa", right_val="__pb",
        delta=float(window), on=[id_col],
    )
    return (
        pairs.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy(F.col("n_pairs").desc(), F.col(id_col))
        .limit(k)
    )


def best_snippets(
    df: DataFrame,
    query_terms: list[str],
    *,
    window: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """KWIC snippet selection: for every document matching >= 1 query
    term, the ``window``-token span with the MOST DISTINCT query terms
    (ties → earliest span) — the highlighted-excerpt stage a search UI
    runs over the top-k, as a deterministic batch operator.

    Candidate spans anchor at term positions (the classical reduction:
    an optimal window can always be shifted left until it starts on a
    hit, so only O(postings) anchors exist — never every position).
    Anchor×hit pairing uses the :func:`~...temporal.band_join` bucket
    trick on ⌊pos/window⌋ (equi-join + post-filter 0 <= q−p < window),
    so the whole operator is O(postings in window) — no positions².
    The winning span per doc is one ``max_by`` aggregation; the
    snippet text is a row-local array slice. Integer positions and
    counts throughout — bit-portable.

    Returns (id, start_pos, n_query_terms, snippet) — start_pos
    0-based, snippet = the window's tokens space-joined."""
    if window < 1:
        raise ValueError("best_snippets needs window >= 1")
    terms = sorted(set(t.lower() for t in query_terms))
    if not terms:
        raise ValueError("best_snippets needs at least one term")
    base = df.select(
        F.col(id_col), _norm_tokens(text_col).alias("__toks")
    )
    hits = base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.col("__toks"),
                lambda t: F.when(
                    t.isin(*terms) if len(terms) > 1 else t == terms[0],
                    t,
                ),
            )
        ).alias("__p", "__t"),
    ).filter(F.col("__t").isNotNull())
    anchors = hits.select(
        F.col(id_col),
        F.col("__p").alias("__a"),
        F.floor(F.col("__p") / F.lit(window)).alias("__b"),
    )
    probes = anchors.select(
        id_col,
        "__a",
        F.explode(
            F.array(F.col("__b"), F.col("__b") + 1)
        ).alias("__b"),
    )
    in_window = probes.join(
        hits.withColumn(
            "__b", F.floor(F.col("__p") / F.lit(window))
        ),
        [id_col, "__b"],
    ).filter(
        (F.col("__p") >= F.col("__a"))
        & (F.col("__p") < F.col("__a") + window)
    )
    scored = in_window.groupBy(id_col, "__a").agg(
        F.countDistinct("__t").cast("long").alias("__n")
    )
    best = scored.groupBy(id_col).agg(
        F.max_by(
            F.struct(
                F.col("__a").alias("a"), F.col("__n").alias("n")
            ),
            F.struct(F.col("__n").alias("n"), (-F.col("__a")).alias("na")),
        ).alias("__best")
    )
    return best.join(base, id_col).select(
        F.col(id_col),
        F.col("__best.a").cast("long").alias("start_pos"),
        F.col("__best.n").alias("n_query_terms"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("__toks"), F.col("__best.a") + 1, window
            ),
        ).alias("snippet"),
    )


def rank_agreement(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """How much do two retrieval models agree? Kendall tau (tau-a) over
    the documents BOTH top-k lists retrieved, plus the raw overlap —
    the standard ranker-comparison readout (is the cheap model a safe
    substitute; did the index change the ranking or just the scores).

    Inputs are top-k frames with an ``id_col`` and a ``score`` column
    (the :func:`rrf_fuse` contract) — driver-tiny by construction, so
    the single-partition rank windows and the O(common²) concordance
    self-join are free. Ranks tie-break by id, making the statistic
    deterministic; within a list ranks are distinct, so tau-a's
    denominator is exactly C(n_common, 2) (no tie correction needed —
    integer counts, one double division, bit-portable).

    Returns one row (n_common, n_concordant, n_discordant, tau); tau
    is NULL when fewer than 2 documents are shared."""
    from pyspark.sql import Window

    def ranked(df: DataFrame, name: str) -> DataFrame:
        w = Window.orderBy(F.col("score").desc(), F.col(id_col))
        return df.select(id_col, "score").select(
            F.col(id_col), F.row_number().over(w).alias(name)
        )
    common = ranked(ranked_a, "__ra").join(
        ranked(ranked_b, "__rb"), id_col
    )
    x = common.select(
        F.col(id_col).alias("__id"),
        F.col("__ra").alias("__xa"),
        F.col("__rb").alias("__xb"),
    )
    y = common.select(
        F.col(id_col).alias("__jd"),
        F.col("__ra").alias("__ya"),
        F.col("__rb").alias("__yb"),
    )
    pairs = x.join(F.broadcast(y), F.col("__id") < F.col("__jd")).select(
        (
            (F.col("__xa") - F.col("__ya"))
            * (F.col("__xb") - F.col("__yb"))
            > 0
        ).alias("__conc")
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("__n_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("__conc"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_concordant"),
        F.coalesce(
            F.sum(F.when(~F.col("__conc"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_discordant"),
    )
    n_common = common.agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    return n_common.crossJoin(F.broadcast(agg)).select(
        "n_common",
        "n_concordant",
        "n_discordant",
        F.when(
            F.col("__n_pairs") > 0,
            (
                F.col("n_concordant") - F.col("n_discordant")
            ).cast("double")
            / F.col("__n_pairs").cast("double"),
        ).alias("tau"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    *,
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval result lists (the
    standard hybrid-search combiner — Cormack et al. SIGIR 2009):
    ``rrf(d) = Σ_lists 1/(k + rank_list(d))``, which fuses
    incomparable score scales (BM25 vs cosine) through ranks alone.

    Inputs are TOP-K LISTS (each with an ``id_col`` and a ``score``
    column), small by construction — so the single-partition rank
    windows and the full-outer join cost nothing at any corpus scale;
    the heavy lifting already happened inside the per-modality top-k
    retrievals. Ranks break score ties by id, making the fusion
    deterministic across engines. Returns (id, n_lists, rrf_score),
    best first."""

    def ranked(df: DataFrame, rank_name: str) -> DataFrame:
        from pyspark.sql import Window

        w = Window.orderBy(F.col("score").desc(), F.col(id_col))
        return df.select(id_col, "score").select(
            F.col(id_col), F.row_number().over(w).alias(rank_name)
        )

    a = ranked(ranked_a, "__ra")
    b = ranked(ranked_b, "__rb")
    contrib_a = F.lit(1.0) / (F.lit(k) + F.col("__ra"))
    contrib_b = F.lit(1.0) / (F.lit(k) + F.col("__rb"))
    fused = a.join(b, id_col, "full_outer").select(
        F.col(id_col),
        (
            F.col("__ra").isNotNull().cast("int")
            + F.col("__rb").isNotNull().cast("int")
        ).cast("long").alias("n_lists"),
        (
            F.coalesce(contrib_a, F.lit(0.0))
            + F.coalesce(contrib_b, F.lit(0.0))
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col(id_col)).limit(topk)


class PostingsIndex:
    """Persisted inverted index for BM25 retrieval — the LEXICAL member
    of the incremental-index family (exact: ``dedup.incremental_dedup``;
    doc near-dup: ``dedup.MinHashCorpusIndex``; embedding:
    ``similarity.IvfIndex``; span: ``corpus.GramCorpusIndex``).
    :func:`bm25_topk` re-scans and re-tokenizes the corpus per query;
    this index pays that scan ONCE at :meth:`build` and serves every
    query from partition-pruned postings reads.

    Layout under ``path`` (crash-safe ``gen=G`` swap shared with the
    other indexes — ``functions/generations.py``):

    - ``gen=G/postings/__bkt=B/`` — (token, doc id, tf, dl) rows,
      hash-partitioned by ``__bkt = pmod(xxhash64(token), n_buckets)``
      so a |Q|-term query reads at most |Q| bucket directories
      (PartitionFilters prune the rest — plan-tested). The document
      length rides denormalized on every posting, the classic trick
      that removes the doc-lengths join from the query path.
    - ``gen=G/stats/`` — one (n_docs, total_len) row per build/append;
      queries SUM this tiny table for N and avgdl instead of scanning
      a doc-lengths table (O(#appends) rows, not O(#docs)).
    - ``params/`` pins n_buckets + the id column; ``tombstones/`` is
      the shared takedown set.

    Query-time scale contract: the only corpus-proportional read is the
    pruned postings buckets; df comes from those same rows, corpus
    stats and docfreq broadcast, and the top-k plans as
    TakeOrderedAndProject — identical scoring math to
    :func:`bm25_topk` via the shared :func:`_score_topk` tail, so index
    results match the direct scan bit-for-bit (the oracle runs the SAME
    SQL for both).

    Maintenance: :meth:`append` folds a novel-doc batch in (one
    postings write + one stats row; re-appending an already-indexed doc
    double-counts it — run the dedup probes first, same contract as the
    other indexes). :meth:`delete` is logical-immediate (anti-join on
    every search; df is computed post-anti-join so rankings stay
    delete-consistent) with ONE documented staleness: N/avgdl come from
    the stats rows and only return to exact at :meth:`compact`, which
    drops tombstoned postings physically, recomputes stats from the
    surviving postings, and swaps generations crash-safely.
    """

    def __init__(
        self, path: str, id_col: str = "doc_id", *, n_buckets: int = 64
    ) -> None:
        from streaming_data_pipeline_azure_spark.functions.generations import (
            GenerationalDir,
            TombstoneSet,
        )

        self.path = path
        self.id_col = id_col
        self.n_buckets = n_buckets
        self._gens = GenerationalDir(path)
        self._tombs = TombstoneSet(path, id_col)
        self._params_verified = False

    # ---- bookkeeping ----

    def _postings_path(self, spark) -> str:
        return f"{self._gens.gen_path(spark)}/postings"

    def _stats_path(self, spark) -> str:
        return f"{self._gens.gen_path(spark)}/stats"

    def _check_params(self, spark) -> None:
        if self._params_verified:
            return
        p = spark.read.json(f"{self.path}/params").collect()[0]
        if int(p["n_buckets"]) != int(self.n_buckets) or p["id_col"] != self.id_col:
            raise ValueError(
                f"PostingsIndex params mismatch at {self.path}: index has "
                f"n_buckets={int(p['n_buckets'])}, id_col={p['id_col']!r}; "
                f"instance has n_buckets={self.n_buckets}, "
                f"id_col={self.id_col!r}; reopen via PostingsIndex.load()"
            )
        self._params_verified = True

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PostingsIndex":
        p = spark.read.json(f"{path}/params").collect()[0]
        idx = cls(path, p["id_col"], n_buckets=int(p["n_buckets"]))
        idx._params_verified = True
        return idx

    # ---- write paths ----

    def _postings(self, df: DataFrame, text_col: str) -> DataFrame:
        base = df.select(
            F.col(self.id_col), _norm_tokens(text_col).alias("__toks")
        )
        return (
            base.select(
                self.id_col,
                F.size("__toks").alias("__dl"),
                F.explode("__toks").alias("__t"),
            )
            .groupBy(self.id_col, "__dl", "__t")
            .agg(F.count(F.lit(1)).alias("__tf"))
            .withColumn(
                "__bkt", F.pmod(F.xxhash64("__t"), F.lit(self.n_buckets))
            )
        )

    def _doc_stats(self, df: DataFrame, text_col: str) -> DataFrame:
        return df.select(_norm_tokens(text_col).alias("__toks")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("__toks")).cast("long").alias("total_len"),
        )

    def build(self, corpus: DataFrame, text_col: str = "text") -> None:
        """Index an existing corpus (its single full tokenize, ever)."""
        spark = corpus.sparkSession
        self._gens.reset(spark)
        self._tombs.clear(spark)
        self._postings(corpus, text_col).write.partitionBy("__bkt").mode(
            "overwrite"
        ).parquet(f"{self.path}/gen=0/postings")
        self._doc_stats(corpus, text_col).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{self.path}/gen=0/stats")
        local_rows_df(
            spark,
            [(int(self.n_buckets), self.id_col)], "n_buckets int, id_col string"
        ).coalesce(1).write.mode("overwrite").json(f"{self.path}/params")
        self._params_verified = True

    def append(self, batch: DataFrame, text_col: str = "text") -> None:
        """Fold a batch of NOVEL documents in: one postings append into
        the live generation + one stats row."""
        spark = batch.sparkSession
        self._check_params(spark)
        self._postings(batch, text_col).write.partitionBy("__bkt").mode(
            "append"
        ).parquet(self._postings_path(spark))
        self._doc_stats(batch, text_col).coalesce(1).write.mode(
            "append"
        ).parquet(self._stats_path(spark))

    def delete(self, spark: SparkSession, ids) -> None:
        """Takedown: ids stop matching every subsequent search
        immediately; their postings are dropped physically (and corpus
        stats re-exactified) at the next :meth:`compact`."""
        self._check_params(spark)
        self._tombs.add(spark, ids)

    # ---- query path ----

    def _term_buckets(self, spark: SparkSession, terms: list[str]) -> list[int]:
        # one O(|Q|)-row job: the bucket ids must come from the SAME
        # xxhash64 the writer used, so compute them in Spark, not Python
        rows = (
            local_rows_df(spark, [(t,) for t in terms], "__t string")
            .select(
                F.pmod(F.xxhash64("__t"), F.lit(self.n_buckets)).alias("b")
            )
            .distinct()
            .collect()
        )
        return [int(r["b"]) for r in rows]

    def search(
        self,
        spark: SparkSession,
        query_terms: list[str],
        *,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
        require_all: bool = False,
    ) -> DataFrame:
        """Top-``k`` (id, n_matched, score) by the same log-free BM25 as
        :func:`bm25_topk`, served from the index: reads ONLY the query
        terms' bucket partitions. ``require_all`` turns OR retrieval
        into AND (every term must match — same shared-tail semantics as
        the corpus-scan path, so the two stay bit-identical)."""
        self._check_params(spark)
        terms = sorted(set(t.lower() for t in query_terms))
        if not terms:
            raise ValueError(
                "PostingsIndex.search: query_terms is empty — at least "
                "one term is required (ADVICE r5)"
            )
        buckets = self._term_buckets(spark, terms)
        post = (
            spark.read.parquet(self._postings_path(spark))
            .filter(F.col("__bkt").isin(buckets))
            .filter(
                F.col("__t").isin(*terms)
                if len(terms) > 1
                else (F.col("__t") == terms[0])
            )
        )
        dead = self._tombs.frame(spark)
        if dead is not None:
            post = post.join(F.broadcast(dead), self.id_col, "anti")
        tf = post.select(self.id_col, "__dl", "__t", "__tf")
        docfreq = tf.groupBy("__t").agg(F.count(F.lit(1)).alias("__df"))
        stats = spark.read.parquet(self._stats_path(spark)).agg(
            F.sum("n_docs").alias("__n_docs"),
            F.sum("total_len").alias("__total_len"),
        )
        return _score_topk(
            tf, docfreq, stats, self.id_col, k=k, k1=k1, b=b,
            require_all_of=len(terms) if require_all else None,
        )

    # ---- maintenance ----

    def stats(self, spark: SparkSession) -> dict:
        post = spark.read.parquet(self._postings_path(spark))
        st = spark.read.parquet(self._stats_path(spark)).agg(
            F.sum("n_docs").alias("n"), F.sum("total_len").alias("t")
        ).collect()[0]
        return {
            "generation": self._gens.current_gen(spark),
            "n_postings": post.count(),
            "n_terms": post.select("__t").distinct().count(),
            "n_docs": int(st["n"]),
            "total_len": int(st["t"]),
            "n_tombstones": self._tombs.count(spark),
            "n_files": len(post.inputFiles()),
        }

    def compact(self, spark: SparkSession, target_files: int | None = None) -> None:
        """Drop tombstoned postings physically, recompute exact corpus
        stats from the survivors, and re-layout into generation G+1 via
        the shared stage -> marker-commit -> GC swap; tombstones clear
        last (a crash in between is benign: they anti-join nothing)."""
        self._check_params(spark)
        live = spark.read.parquet(self._postings_path(spark))
        dead = self._tombs.frame(spark)
        if dead is not None:
            live = live.join(F.broadcast(dead), self.id_col, "anti")
        nxt = self._gens.current_gen(spark) + 1
        n = target_files or max(1, spark.sparkContext.defaultParallelism // 4)
        live.repartition(n, "__bkt", "__t").write.partitionBy("__bkt").mode(
            "overwrite"
        ).parquet(f"{self.path}/gen={nxt}/postings")
        live.select(self.id_col, "__dl").distinct().agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__dl").cast("long").alias("total_len"),
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{self.path}/gen={nxt}/stats"
        )
        self._gens.commit(spark, nxt)
        self._gens.gc_below(spark, keep=nxt)
        self._tombs.clear(spark)


def phrase_topk(
    df: DataFrame,
    phrase_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 10,
) -> DataFrame:
    """Exact-phrase retrieval: top-``k`` documents by the number of
    OVERLAPPING occurrences of the consecutive token sequence
    ``phrase_terms`` — the positional counterpart of BM25's
    bag-of-words scoring (a real stack runs "hash join" as a phrase,
    not two independent terms).

    Pure codegen: each document's word n-grams (n = |phrase|) are
    counted against the space-joined phrase inside the scan projection
    — no explode, no shuffle beyond the top-k heap — so the per-doc
    cost is O(tokens) and the only cross-node data is (id, tf) for
    matching docs. Returns (id, phrase_tf) ordered by tf desc, id."""
    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
        word_ngrams,
    )

    if not phrase_terms:
        raise ValueError("phrase_topk: phrase_terms is empty")
    phrase = " ".join(t.lower() for t in phrase_terms)
    n = len(phrase_terms)
    toks = _norm_tokens(text_col)
    tf = F.size(
        F.filter(word_ngrams(toks, n), lambda g: g == F.lit(phrase))
    ).cast("long")
    return (
        df.select(F.col(id_col), tf.alias("phrase_tf"))
        .filter(F.col("phrase_tf") > 0)
        .orderBy(F.col("phrase_tf").desc(), F.col(id_col))
        .limit(k)
    )


def prf_expansion_terms(
    df: DataFrame,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_docs: int = 10,
    k_terms: int = 8,
    min_term_len: int = 3,
) -> DataFrame:
    """Pseudo-relevance feedback (r7): the query-expansion half of an
    RM3-style retriever — run BM25, treat the top ``k_docs`` documents
    as relevant, and surface the terms that best characterize them
    (document frequency within the feedback set, excluding the query's
    own terms and tokens shorter than ``min_term_len``). Feed the
    returned terms back into :func:`bm25_topk` for the expanded
    search.

    Deterministic end-to-end: the feedback set comes from BM25's
    (score DESC, id) total order, and the expansion ranking breaks
    ties by (df DESC, term) — so unlike sampled-feedback variants this
    is value-hashable and SQL-oracle-checkable. Plan: the feedback ids
    broadcast back into the token scan (a k_docs-row semi-join), so
    expansion costs one scan of k_docs documents' tokens, not the
    corpus. Returns (term, df) best-first, ≤ k_terms rows."""
    top_ids = bm25_topk(df, query_terms, k=k_docs).select(id_col)
    toks = df.join(F.broadcast(top_ids), id_col, "semi").select(
        id_col,
        F.explode(
            F.split(
                F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")),
                " ",
            )
        ).alias("term"),
    )
    filtered = toks.filter(
        (~F.col("term").isin([t.lower() for t in query_terms]))
        & (F.length("term") >= int(min_term_len))
    )
    return (
        filtered.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(int(k_terms))
    )


def ndcg_discounts(k: int) -> list[float]:
    """The 1/log2(rank+1) discount table for ranks 1..k, computed ONCE
    driver-side — both the Spark plan and the SQL oracle embed these
    exact literal doubles, so no engine ever evaluates a logarithm
    (libm log rounding is engine-specific; identical literals are
    not)."""
    import math

    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def ndcg_eval(
    runs: DataFrame,
    qrels: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Graded retrieval evaluation: per-query DCG@k, ideal DCG@k and
    nDCG@k (Järvelin & Kekäläinen 2002) — the graded companion of
    :func:`eval_rankings`' binary metrics (a run that finds the
    3-of-3-term documents should outrank one that pads with
    1-of-3-term hits; binary recall can't see that).

    Determinism: discounts come from :func:`ndcg_discounts` literals
    (no in-engine log); DCG folds rank-ascending over a sorted
    collected array and IDCG folds over the grade-descending prefix —
    both LEFT-TO-RIGHT array folds, the engine-wide float-sum
    discipline, so every value hash-checks. Shape: one run⋈qrels hit
    join plus two per-query aggregations over O(k + judged) rows.

    Returns one row per judged query: (query, n_judged, dcg, idcg,
    ndcg); queries with nothing retrieved get dcg 0.0; idcg > 0 by
    construction (judged queries have >= 1 positive grade — rows with
    rel <= 0 are rejected as an input-contract violation)."""
    if k < 1:
        raise ValueError("ndcg_eval needs k >= 1")
    if qrels.filter(F.col(rel_col) <= 0).limit(1).count() > 0:
        raise ValueError(
            "ndcg_eval: qrels must carry positive grades only "
            "(unjudged docs are absent rows, not rel <= 0 rows)"
        )
    d_lits = F.array(*[F.lit(v) for v in ndcg_discounts(k)])
    q = F.col(query_col)
    hits = runs.filter(F.col(rank_col) <= k).join(
        qrels, [query_col, doc_col]
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    dcg = (
        hits.groupBy(query_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(rank_col).alias("r"),
                        F.col(rel_col).cast("double").alias("g"),
                    )
                )
            ).alias("__h")
        )
        .select(
            q,
            fold(
                F.transform(
                    "__h",
                    lambda s: s["g"] * F.element_at(d_lits, s["r"].cast("int")),
                )
            ).alias("dcg"),
        )
    )
    ideal = (
        qrels.groupBy(query_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_judged"),
            F.slice(
                F.reverse(
                    F.sort_array(
                        F.collect_list(F.col(rel_col).cast("double"))
                    )
                ),
                1,
                k,
            ).alias("__top"),
        )
        .select(
            q,
            "n_judged",
            fold(
                # slice the discounts to the judged prefix — a full-k
                # zip would pad the short side with NULLs and poison
                # the fold
                F.zip_with(
                    "__top",
                    F.slice(d_lits, 1, F.size("__top")),
                    lambda g, d: g * d,
                )
            ).alias("idcg"),
        )
    )
    return ideal.join(dcg, query_col, "left").select(
        q,
        "n_judged",
        F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
        "idcg",
        (
            F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")
        ).alias("ndcg"),
    )


def eval_rankings(
    runs: DataFrame,
    qrels: DataFrame,
    *,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Retrieval-quality evaluation: per-query rank metrics of a run
    (ranked results) against relevance judgments — the measurement leg
    every retrieval stack needs next to its BM25/ANN serving legs.

    ``runs`` holds (query, doc, rank) with rank 1-based and unique per
    query; ``qrels`` holds (query, doc) binary judgments. Returns one
    row per query in qrels: n_rel, n_ret (ranks <= k present), n_rel_ret
    (relevant among top-k), recall_at_k, first_rel_rank (smallest rank
    of any relevant retrieved doc, null if none), rr_at_k (reciprocal
    rank, 0.0 when no relevant doc is retrieved in the top k —
    standard MRR convention).

    Every metric is a count, a min, or ONE division of two exact
    integers — no float accumulation, so results are bit-identical
    across engines and partitionings (macro averages are left to the
    caller: a mean over queries is float-order-dependent). Shape: two
    hash joins/aggs on the query key; the qrels side of the hit join
    carries no payload. Duplicate (query, doc) qrels rows are an input
    contract violation and rejected (they would double-count hits)."""
    q = F.col(query_col)
    dupes = qrels.groupBy(query_col, doc_col).count().filter(
        F.col("count") > 1
    )
    if dupes.limit(1).count() > 0:
        raise ValueError(
            "eval_rankings: duplicate (query, doc) rows in qrels"
        )
    topk = runs.filter(F.col(rank_col) <= k).select(
        q.alias("__q"), F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__r"),
    )
    rel = qrels.select(q.alias("__q"), F.col(doc_col).alias("__d"))
    hits = topk.join(rel.withColumn("__hit", F.lit(1)), ["__q", "__d"], "left")
    per_q_run = hits.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_ret"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
        .cast("long")
        .alias("n_rel_ret"),
        F.min(F.when(F.col("__hit") == 1, F.col("__r"))).cast("long").alias(
            "first_rel_rank"
        ),
    )
    per_q_rel = rel.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_rel")
    )
    out = per_q_rel.join(per_q_run, "__q", "left")
    return out.select(
        F.col("__q").alias(query_col),
        "n_rel",
        F.coalesce(F.col("n_ret"), F.lit(0)).cast("long").alias("n_ret"),
        F.coalesce(F.col("n_rel_ret"), F.lit(0)).cast("long").alias(
            "n_rel_ret"
        ),
        (
            F.coalesce(F.col("n_rel_ret"), F.lit(0)).cast("double")
            / F.col("n_rel").cast("double")
        ).alias("recall_at_k"),
        "first_rel_rank",
        F.coalesce(
            F.lit(1.0) / F.col("first_rel_rank").cast("double"),
            F.lit(0.0),
        ).alias("rr_at_k"),
    )


def spell_suggest(
    docs: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Query spell correction ("did you mean"): for each query term,
    the top-``k`` corpus-vocabulary tokens within Levenshtein distance
    1, ranked by corpus frequency — the retrieval-side twin of the
    linkage module's FastSS blocking. Returns (term, suggestion,
    n_occurrences, rank); exact-vocabulary terms suggest themselves at
    rank 1 (distance 0 wins on frequency like any candidate).

    Shape: the vocabulary (one token-count shuffle) expands to its
    depth-1 deletion variants — O(V·L) keys, variants of TOKENS, never
    of documents — and BROADCAST-joins against the tiny query-term
    variant set (distance ≤ 1 strings always share a depth-1 variant:
    Schulz & Mihov completeness, linkage.fuzzy_match_pairs), then a
    codegen ``levenshtein`` verify discards false candidates and a
    per-term top-k window ranks by (n DESC, token ASC) — a total
    order, so the oracle's brute-force scan agrees exactly."""
    from pyspark.sql import Window

    from streaming_data_pipeline_azure_spark.operators.corpus import (
        _norm_tokens,
    )

    if not terms:
        raise ValueError("spell_suggest needs at least one query term")
    spark = docs.sparkSession
    tv_rows = []
    for t in terms:
        variants = {t} | {t[:i] + t[i + 1 :] for i in range(len(t))}
        tv_rows += [(t, v) for v in sorted(variants)]
    tv = local_rows_df(spark, tv_rows, "term string, __blk string")
    vocab = (
        docs.select(F.explode(_norm_tokens(text_col)).alias("__tok"))
        .filter(F.length("__tok") > 0)
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    keyed = vocab.select(
        "__tok",
        "n_occurrences",
        F.explode(
            F.expr(
                "transform(sequence(0, length(__tok)), i -> "
                "CASE WHEN i = 0 THEN __tok "
                "ELSE concat(substring(__tok, 1, i-1), substring(__tok, i+1)) END)"
            )
        ).alias("__blk"),
    )
    cands = (
        keyed.join(F.broadcast(tv), "__blk")
        .select("term", F.col("__tok").alias("suggestion"), "n_occurrences")
        .distinct()
        .filter(F.levenshtein("term", "suggestion") <= 1)
    )
    w = Window.partitionBy("term").orderBy(
        F.col("n_occurrences").desc(), F.col("suggestion").asc()
    )
    return (
        cands.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("term", "suggestion", "n_occurrences", "rank")
    )


def team_draft_interleave(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    *,
    k: int = 10,
) -> DataFrame:
    """TEAM-DRAFT INTERLEAVING (Radlinski & Joachims 2008): merge two
    rankers' top-``k`` lists into one list the way online ranker A/B
    comparison serves it — teams alternate picks (the team with fewer
    picks goes first; ties broken by a DETERMINISTIC Knuth-hash coin on
    the round index, where classic TDI flips a random coin — random
    tie-breaks cannot be oracle- or replay-checked), each team picking
    its highest-ranked not-yet-chosen document. Click credit on the
    served list then compares rankers without an offline judgment set.
    Returns (rank, id, team) — team ∈ {'A','B'} is who contributed the
    document.

    Shape: each ranking collapses to ONE ordered array (top-k —
    bounded, this is a serving-layer merge, not a corpus scan), then a
    single ``aggregate`` fold over 2k rounds builds the interleaved
    list — the sorted-array-fold discipline (CUSUM/Kaplan–Meier
    precedent); exhausted sides fall through to the other team."""
    from pyspark.sql import Window

    from streaming_data_pipeline_azure_spark.operators.sampling import (
        _knuth_u32,
    )

    def arr(df: DataFrame, name: str):
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        return (
            df.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__r", id_col))),
                    lambda s: s[id_col],
                ).alias(name)
            )
        )

    one = arr(ranked_a, "__a").crossJoin(arr(ranked_b, "__b"))
    acc0 = F.struct(
        F.array().cast("array<long>").alias("picked"),
        F.array().cast("array<string>").alias("teams"),
        F.lit(0).alias("ta"),
        F.lit(0).alias("tb"),
    )

    def step(acc, i):
        coin_a = (_knuth_u32(i) % 2) == 0
        pf = (acc["ta"] < acc["tb"]) | (
            (acc["ta"] == acc["tb"]) & coin_a
        )
        ca = F.filter(
            F.col("__a"), lambda x: ~F.array_contains(acc["picked"], x)
        )
        cb = F.filter(
            F.col("__b"), lambda x: ~F.array_contains(acc["picked"], x)
        )
        take_a = (pf & (F.size(ca) > 0)) | (
            ~pf & (F.size(cb) == 0) & (F.size(ca) > 0)
        )
        take_b = ~take_a & (F.size(cb) > 0)
        pick = F.when(take_a, F.element_at(ca, 1)).when(
            take_b, F.element_at(cb, 1)
        )
        return F.struct(
            F.when(
                pick.isNotNull(), F.concat(acc["picked"], F.array(pick))
            )
            .otherwise(acc["picked"])
            .alias("picked"),
            F.when(take_a, F.concat(acc["teams"], F.array(F.lit("A"))))
            .when(take_b, F.concat(acc["teams"], F.array(F.lit("B"))))
            .otherwise(acc["teams"])
            .alias("teams"),
            (acc["ta"] + take_a.cast("int")).alias("ta"),
            (acc["tb"] + take_b.cast("int")).alias("tb"),
        )

    folded = one.select(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(2 * k - 1)), acc0, step
        ).alias("__res")
    )
    z = F.arrays_zip(F.col("__res.picked"), F.col("__res.teams"))
    return (
        folded.select(F.posexplode(z).alias("__i", "__z"))
        .select(
            (F.col("__i") + 1).cast("long").alias("rank"),
            F.col("__z.picked").cast("long").alias(id_col),
            F.col("__z.teams").alias("team"),
        )
    )


def rank_biased_overlap(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    *,
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Rank-biased overlap (Webber et al., TOIS 2010) between two
    rankings, prefix form: RBO@k = (1−p) · Σ_{d=1..k} p^(d−1) · |A_d ∩
    B_d| ∕ d — the top-weighted agreement measure that, unlike Kendall
    tau (retrieval_rank_agreement), handles NON-CONJOINT lists (each
    ranker may return documents the other never saw) and discounts
    disagreement deep in the tail. Returns ONE row:
    (overlap_at_k, rbo) plus the per-depth agreement profile summed in
    a FIXED left-to-right fold over LITERAL p powers (the nDCG
    discount-table discipline — no pow() at eval time, so the double
    is engine-exact).

    Shape: each ranking collapses to one ordered top-k array, one
    crossJoin of two 1-row frames, codegen slice/intersect per depth —
    a serving-layer diagnostic, not a corpus scan."""
    from pyspark.sql import Window

    def arr(df: DataFrame, name: str):
        w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
        return (
            df.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__r", id_col))),
                    lambda s: s[id_col],
                ).alias(name)
            )
        )

    one = arr(ranked_a, "__a").crossJoin(arr(ranked_b, "__b"))
    terms = None
    for d in range(1, k + 1):
        inter = F.size(
            F.array_intersect(
                F.slice(F.col("__a"), 1, d), F.slice(F.col("__b"), 1, d)
            )
        ).cast("double")
        t = F.lit(p ** (d - 1)) * inter / F.lit(float(d))
        terms = t if terms is None else terms + t
    inter_k = F.size(
        F.array_intersect(F.col("__a"), F.col("__b"))
    ).cast("long")
    return one.select(
        inter_k.alias("overlap_at_k"),
        (F.lit(1.0 - p) * terms).alias("rbo"),
    )
