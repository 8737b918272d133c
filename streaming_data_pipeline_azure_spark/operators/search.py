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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.operators.corpus import _norm_tokens


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
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
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


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
