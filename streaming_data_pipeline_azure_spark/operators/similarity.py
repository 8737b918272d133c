"""X3 — similarity search over an embedding column (``array<float>``).

Two paths:

- :func:`topk_bruteforce` — exact cosine top-k. The scan is
  embarrassingly parallel (score is a row-local codegen expression) and
  the top-k is ``TakeOrderedAndProject``: each partition keeps k rows,
  the driver merges k×partitions — no global sort, no full shuffle. This
  is the correctness baseline and is genuinely the right plan for one-off
  queries even at scale (one pass over the corpus).
- :func:`IvfIndex` — IVF-style partitioned index for repeated queries:
  vectors are assigned to the nearest of C centroids (bucket means of a
  sign-LSH partitioning — one pass, deterministic) and written
  partitioned by centroid id; a query probes only the ``n_probe`` nearest
  centroids' partitions, so the scan touches ~n_probe/C of the data and
  partition pruning keeps the rest unread on disk.

No Python in the hot path: scoring is ``zip_with``/``aggregate``
expressions; the only driver-side work is the tiny centroid table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_data_pipeline_azure_spark.functions.cache import persist_tracked
from streaming_data_pipeline_azure_spark.functions.localdf import local_rows_df
from streaming_data_pipeline_azure_spark.functions.generations import (
    GenerationalDir,
    TombstoneSet,
)
from streaming_data_pipeline_azure_spark.functions.vector import (
    cosine_similarity,
    literal_vector,
    to_double_array,
)
from streaming_data_pipeline_azure_spark.operators.dedup import (
    random_hyperplanes,
    sign_bucket,
)


def score_against(df: DataFrame, vec_col: str, query: list[float],
                  score_name: str = "score") -> DataFrame:
    """Add a cosine-similarity column against a literal query vector."""
    return df.withColumn(
        score_name,
        # HOF form deliberately (r13-opt finding): a dim-unrolled
        # 64-term chain is ONE unsplittable expression — it blew
        # Janino's method limit inside join codegen units elsewhere and
        # its per-plan Catalyst+Janino cost (~+0.5 s) exceeded the
        # interpreted-eval cost at every measured call site of the full
        # cosine (isolated warm triples, OPTIMIZATION_r13.md §8).
        cosine_similarity(to_double_array(F.col(vec_col)), literal_vector(query)),
    )


#: Above this many centroids the vectorized kernel takes over from the
#: literal-expression assignment. The bound is set by MEASUREMENT, not
#: by the Janino compile wall (~4096 unrolled cosines ≈ 12.5 s): the
#: per-centroid cosine is a higher-order-function fold that Spark
#: evaluates INTERPRETED (CodegenFallback), so the literal path loses
#: to the Arrow kernel ~100× already at k=256 (measured 40 s vs 0.4 s
#: on 20k×64-dim vectors, warm triples, r11). 16 keeps every oracle
#: grain in the suite (k = 8 at the driver SFs) on the path the SQL
#: oracle replays; a bit-parity test pins kernel == literal, so the
#: swap is invisible to values either way.
MAX_LITERAL_CENTROIDS = 16


def assign_fixed_centroids(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    *,
    max_literal_centroids: int = MAX_LITERAL_CENTROIDS,
) -> DataFrame:
    """Nearest-centroid assignment against a FIXED centroid set — the
    k-means E-step (and the classification step of cluster-balanced
    corpus sampling).

    Two physical strategies, AUTO-SWAPPED on |C| (r11, VERDICT r10
    #2 — the anchor→sketch inversion pattern), both computing the
    SAME doubles bit-for-bit (parity-tested):

    - ``|C| <= max_literal_centroids``: each row evaluates all |C|
      cosines as inline expressions and picks the argmax via
      ``array_min`` over ``struct(-score, cid)`` (struct comparison is
      lexicographic: highest score wins, ties break to the smallest
      centroid id) — no join, no shuffle, no Python; this is the path
      the SQL oracle replays. It does NOT scale in |C|: the cosine
      fold is a higher-order function Spark evaluates interpreted
      (CodegenFallback), measured ~100× slower than the kernel at
      k=256 (see MAX_LITERAL_CENTROIDS).
    - above the bound (SemDeDup's stated design point is k ≈ 10⁵
      clusters on a real corpus — also far past the ~4096-expression
      Janino compile wall measured at ~12.5 s): an Arrow-batched
      ``mapInPandas`` kernel broadcasts the C×d centroid matrix and
      scores each batch with dimension-by-dimension numpy accumulation
      — the ``embedding_decontaminate`` construction, every add and
      the final divide in the same left-to-right IEEE order as the
      expression fold, argmax over cid-ascending columns so ties break
      to the smallest cid exactly like the struct min. Still no join,
      no shuffle; one BLAS-shaped pass per batch.

    The iterative Lloyd's refinement lives in :meth:`IvfIndex.build`
    (driver state O(C×d)); this is the exactly verifiable step, so it
    is the one the SQL oracle checks."""
    if not centroids:
        raise ValueError("assign_fixed_centroids needs >= 1 centroid")
    # validation is strategy-INDEPENDENT (r12, ADVICE r11): the same
    # call must not work at |C|<=max_literal and crash at |C|+1, so
    # both branches refuse output-column clashes and duplicate cids
    for clash in ("cluster_id", "score"):
        if clash in df.columns:
            raise ValueError(
                f"assign_fixed_centroids: input already has a "
                f"{clash!r} column — rename it first (silent "
                "replacement would make behavior depend on which "
                "physical strategy the centroid count selects)"
            )
    if len({int(cid) for cid, _ in centroids}) != len(centroids):
        raise ValueError("assign_fixed_centroids: duplicate centroid ids")
    if len(centroids) > max_literal_centroids:
        return _assign_fixed_centroids_kernel(df, vec_col, centroids)
    vec = to_double_array(F.col(vec_col))
    scored = F.array(
        *[
            F.struct(
                # deliberately the HOF form, NOT dim-unrolled (r13-opt):
                # this expression is instantiated once PER CENTROID —
                # unrolling |C|×dim arithmetic into the enclosing
                # codegen unit blew Janino's 64KB method limit at |C|=8
                # (gate-observed), degrading the WHOLE stage to
                # interpreted. One HOF per centroid keeps the stage
                # codegen'd with per-node fallback only here.
                (-cosine_similarity(vec, literal_vector(c))).alias("negscore"),
                F.lit(int(cid)).alias("cid"),
            )
            for cid, c in centroids
        ]
    )
    best = F.array_min(scored)
    return df.withColumns(
        {
            "cluster_id": best["cid"].cast("long"),
            "score": -best["negscore"],
        }
    )


def _argmax_nan_last(score):
    """Row-wise argmax over a score matrix under the LITERAL path's
    ordering: NaN loses to every non-NaN score INCLUDING -inf (the
    struct-min over (-score, cid) orders NaN above +inf), ties break
    to the first (= smallest-cid) column, all-NaN rows fall to column
    0. A plain argmax over a NaN->-inf mask gets every case right
    EXCEPT a genuine -inf score tying the mask (ADVICE r12): the
    winner can only be a NaN column when the row max is -inf, and then
    every non-NaN column scored exactly -inf, so the correct pick is
    the first non-NaN column."""
    import numpy as np

    isn = np.isnan(score)
    masked = np.where(isn, -np.inf, score)
    best = np.argmax(masked, axis=1)  # first max = smallest cid
    bad = isn[np.arange(score.shape[0]), best] & ~isn.all(axis=1)
    if bad.any():
        best = np.where(bad, (~isn).argmax(axis=1), best)
    return best


def _assign_fixed_centroids_kernel(
    df: DataFrame, vec_col: str, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """The vectorized strategy of :func:`assign_fixed_centroids` —
    bit-identical to the literal-expression path (see the parity
    notes there; pinned by ``test_assign_centroids_kernel_parity``).
    Passes every input column through unchanged and appends
    (cluster_id, score), matching the literal path's ``withColumns``
    surface."""
    import numpy as np

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    # clash/duplicate-cid validation happens in assign_fixed_centroids
    # (strategy-independent — ADVICE r11); this helper assumes it ran
    cents = sorted(
        ((int(cid), [float(x) for x in c]) for cid, c in centroids),
        key=lambda t: t[0],
    )
    c_ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([c for _, c in cents], dtype=np.float64)
    sc = np.zeros(len(C))
    for d in range(C.shape[1]):  # sequential fold — matches SQL exactly
        sc += C[:, d] * C[:, d]
    nc = np.sqrt(sc)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(c_ids)
    b_mat = spark.sparkContext.broadcast(C)
    b_nrm = spark.sparkContext.broadcast(nc)
    # copy, never .add() — StructType.add mutates in place and
    # df.schema is cached on the DataFrame
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("cluster_id", LongType()),
           StructField("score", DoubleType())]
    )

    def kernel(batches):
        import pandas as pd

        ids, M, nb = b_ids.value, b_mat.value, b_nrm.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            sx = np.zeros(len(X))
            for d in range(X.shape[1]):
                sx += X[:, d] * X[:, d]
            na = np.sqrt(sx)
            S = np.zeros((len(X), len(M)))
            for d in range(X.shape[1]):  # dim-by-dim: the SQL fold order
                S += X[:, d : d + 1] * M[None, :, d]
            denom = na[:, None] * nb[None, :]
            # branch semantics must be SPARK's, not numpy's (r12,
            # ADVICE r11): the literal path's `denom > 0` evaluates
            # TRUE for NaN (Spark orders NaN as the largest double),
            # so a NaN denominator (non-finite vector x zero-norm
            # centroid) takes the division branch and yields NaN —
            # numpy's NaN > 0 is False and would yield the guard's
            # 0.0 instead. Only an exact-zero denominator returns 0.0.
            take = (denom > 0) | np.isnan(denom)
            safe = np.where(denom != 0, denom, 1.0)
            with np.errstate(invalid="ignore", divide="ignore"):
                score = np.where(take, S / safe, 0.0)
            # NaN scores (non-finite components) mask to -inf BEFORE
            # argmax (r12, ADVICE r11): the literal path's array_min
            # over struct(-score, cid) orders NaN as the LARGEST
            # double, i.e. a NaN-scored centroid never wins while any
            # finite score exists; raw np.argmax would instead return
            # the FIRST NaN. All-NaN rows fall to the smallest cid on
            # both paths (struct negscore tie / argmax over all -inf),
            # and the REPORTED score stays the unmasked value so the
            # literal path's NaN surfaces identically.
            best = _argmax_nan_last(score)
            yield pdf.assign(
                cluster_id=ids[best],
                score=score[np.arange(len(X)), best],
            )

    out = df.mapInPandas(kernel, schema=out_schema)
    # Arrow's pandas->JVM transfer turns a NaN score into NULL (pandas
    # NaN doubles as the null sentinel), while the literal path keeps
    # the IEEE NaN — coalesce restores it (r12, found by the
    # non-finite parity test). The kernel always computes a float, so
    # NULL here can ONLY mean NaN-converted.
    return out.withColumn(
        "score", F.coalesce(F.col("score"), F.lit(float("nan")))
    )


def groupwise_centroids(
    df: DataFrame, group_col: str, vec_col: str
) -> DataFrame:
    """Element-wise mean vector per group — per-class prototypes / the
    k-means M-step — in long ``(group, dim, centroid_val)`` form.

    posexplode → (group, dim) aggregate is the shape that scales: no
    D-wide aggregate row (Janino-hostile at large D), partial sums
    collapse map-side onto the small (groups × dims) key domain, and
    the shuffle carries one decimal per key, not vectors. Sums
    accumulate in DECIMAL so the means are bit-identical across engines
    and partitionings."""
    exploded = df.select(
        F.col(group_col),
        F.posexplode(to_double_array(F.col(vec_col))).alias("__d0", "__x"),
    )
    return (
        exploded.groupBy(group_col, (F.col("__d0") + 1).alias("dim"))
        .agg(
            (
                F.sum(F.col("__x").cast("decimal(18,8)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("centroid_val")
        )
        .select(group_col, F.col("dim").cast("long").alias("dim"), "centroid_val")
    )


def quantize_int8_stats(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column with per-vector
    scale (amax/127) and exact reconstruction-error stats — the storage
    op that turns a 100 TB float corpus into a 25 TB int8 one.

    Rounding is ``floor(x/scale + 0.5)`` (round-half-up) rather than
    ``round``: engines disagree on round's tie rule (half-even vs
    half-away), floor is IEEE-exact everywhere. All work is row-local
    higher-order functions — no shuffle; the per-row ``qscale`` is
    materialized as a column first so HOF lambdas reference a bound
    value instead of re-deriving the max per element."""
    base = df.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__v")
    )
    amax = F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    base = base.withColumn(
        "__qscale",
        F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(0.0)),
    )
    q = F.transform(
        F.col("__v"),
        lambda x: F.when(
            F.col("__qscale") > 0,
            F.floor(x / F.col("__qscale") + F.lit(0.5)),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    base = base.withColumn("__q", q)
    err = F.array_max(
        F.zip_with(
            F.col("__q"),
            F.col("__v"),
            lambda qi, x: F.abs(qi.cast("double") * F.col("__qscale") - x),
        )
    )
    return base.select(
        F.col(id_col),
        F.col("__qscale").alias("qscale"),
        F.array_max(F.transform(F.col("__q"), lambda x: F.abs(x))).alias(
            "q_absmax"
        ),
        err.alias("recon_max_err"),
    )


def topk_bruteforce(
    df: DataFrame, vec_col: str, query: list[float], k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity (ties broken by id for
    determinism). Plans as TakeOrderedAndProject — per-partition heap,
    no global sort."""
    scored = score_against(df, vec_col, query)
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "score")
    )


def multiquery_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Batched k-NN: exact top-k corpus neighbors for EVERY query vector
    in one job (the realistic serving/backfill shape — one query at a
    time wastes a full corpus scan per query).

    The query set broadcasts (it is the small side by construction);
    scoring is a broadcast nested-loop the optimizer chooses for the
    crossJoin, and the per-query top-k is a window ``row_number`` over
    (query, score) — one shuffle on query_id, k rows per query out."""
    q = queries.select(
        F.col(query_id_col),
        to_double_array(F.col(vec_col)).alias("__qv"),
    )
    scored = corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__cv")
    ).crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine_similarity(F.col("__cv"), F.col("__qv"), dim=dim).alias(
            "score"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def allpairs_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.8,
    block_size: int = 8192,
) -> DataFrame:
    """EXACT all-pairs cosine similarity >= threshold, as (id_a, id_b)
    with id_a < id_b — the deterministic counterpart of the sign-LSH
    near-dup path (recall 1.0 by construction).

    Fully distributed block-matrix product — nothing is ever collected
    to the driver:

    1. Rows hash into ``ceil(N / block_size)`` blocks (one cheap count
       sizes the blocking).
    2. Each row is replicated once per *block pair* it participates in
       via an exploded block-pair key ``(least(b, o), greatest(b, o))``
       — every unordered block pair meets in exactly one group, and the
       shuffle moves O(N × num_blocks) rows, the minimum any exact
       all-pairs scheme can move.
    3. ``applyInPandas`` computes one numpy matmul per block pair
       (triangular within the diagonal block), so the O(N²) compares run
       as vectorized BLAS with ~block_size² working sets, never more
       than two ~block_size×d matrices in memory per task.

    Driver memory is O(1); executor memory is O(block_size × d) per
    task regardless of N. At 100 TB you'd still prefer the sign-LSH path
    (:func:`dedup.embedding_near_dup_pairs`) — exact all-pairs is
    quadratic by definition — but this formulation degrades with compute,
    not with driver RAM."""
    import numpy as np
    import pandas as pd

    n = df.count()  # one narrow scan; sizes the blocking deterministically
    num_blocks = max(1, -(-n // block_size))
    base = df.select(
        F.col(id_col).cast("long").alias("__id"),
        to_double_array(F.col(vec_col)).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("__b"),
    )
    exploded = (
        base.withColumn(
            "__o", F.explode(F.sequence(F.lit(0), F.lit(num_blocks - 1)))
        )
        .withColumn("__pa", F.least("__b", "__o").cast("long"))
        .withColumn("__pb", F.greatest("__b", "__o").cast("long"))
        .drop("__o")
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64")})
        if len(pdf) == 0:
            return empty
        ids = pdf["__id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["__v"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        pa = int(pdf["__pa"].iloc[0])
        pb = int(pdf["__pb"].iloc[0])
        if pa == pb:  # diagonal block: strict upper triangle
            sims = mat @ mat.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = sims[iu, ju] >= threshold
            a, b = ids[iu[hit]], ids[ju[hit]]
        else:  # off-diagonal: full cross between the two sub-blocks
            ma = pdf["__b"].to_numpy() == pa
            ia, ib = ids[ma], ids[~ma]
            if len(ia) == 0 or len(ib) == 0:
                return empty
            sims = mat[ma] @ mat[~ma].T
            i, j = np.nonzero(sims >= threshold)
            a, b = ia[i], ib[j]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    return exploded.groupBy("__pa", "__pb").applyInPandas(
        kernel, schema="id_a long, id_b long"
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    *,
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): embeddings are clustered, and pairwise cosine
    runs only WITHIN each cluster — the trick that turns quadratic
    semantic dedup into a sum of bounded |cluster|² blocks. A document
    is dropped when some same-cluster neighbor with cosine >=
    ``threshold`` is a better cluster representative (higher
    cosine-to-centroid; ties keep the smaller id) — so the member of
    every duplicate set closest to its centroid always survives, and
    the rule is deterministic and partition-invariant.

    Entirely codegen: nearest-centroid assignment is the no-shuffle
    expression from :func:`assign_fixed_centroids`; candidate pairs
    come from equi-joins only (never a cross join — plan-tested); the
    pair filter is a unit-vector dot-product fold, bit-identical to
    the SQL oracle. Two plan choices keep the quadratic stage cheap:
    vectors normalize ONCE before pairing (a pair costs one fold, not
    a fold plus two norms), and the self-join key is
    ``(cluster_id, block)`` — the probe side replicates across
    ``n_blocks`` hash blocks of the build side, so a k-cluster corpus
    runs k x n_blocks parallel tasks instead of k (each unordered pair
    still meets exactly once: x joins the block that owns y).
    Scale: pair volume is sum(|cluster|²)/2 — at 100 TB you size the
    centroid count so clusters stay ~10-100k docs (SemDeDup itself
    uses k=100k clusters on LAION); assignment at that k rides
    :func:`assign_fixed_centroids`' auto-swap to the vectorized
    kernel (r11 — the literal-expression path is Janino-bound past
    ~4k centroids; the swap is bit-parity-pinned so oracle grains are
    unaffected); for degenerate clusters the BLAS block kernel of
    :func:`allpairs_cosine_pairs` applied per cluster is the escape
    hatch. Returns surviving (id_col, cluster_id, score) rows;
    semi-join on id to recover full payloads.
    """
    from streaming_data_pipeline_azure_spark.functions.vector import norm

    if not centroids:
        raise ValueError("semantic_dedup needs a non-empty centroid set")
    n_blocks = 16
    raw = assign_fixed_centroids(df, vec_col, centroids).select(
        F.col(id_col).cast("long").alias(id_col),
        to_double_array(F.col(vec_col)).alias("__v"),
        "cluster_id",
        "score",
    )
    nrm = norm(F.col("__v"))
    assigned = raw.select(
        id_col,
        "cluster_id",
        "score",
        F.when(nrm > 0, F.transform(F.col("__v"), lambda x: x / nrm))
        .otherwise(F.col("__v"))
        .alias("__u"),
    )
    # r13-opt (guide §2.4/§3.3, the contamination_matrix/textrank
    # precedent): `assigned` feeds THREE consumers (both self-join
    # sides and the final anti-join), each of which would re-run the
    # scan + |C| interpreted cosine folds + the normalize transform —
    # and on the literal path each copy re-plants every centroid
    # vector in the plan (the entry-level tree measured ~468 KB,
    # whole driver-seconds of Catalyst/Janino per run). One
    # localCheckpoint materializes the assignment once and truncates
    # the literal-laden lineage; rows are bit-identical.
    assigned = assigned.localCheckpoint(eager=False)
    a = assigned.select(
        F.col(id_col).alias("id_a"),
        F.col("__u").alias("__ua"),
        "cluster_id",
        F.col("score").alias("score_a"),
        F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("__blk"),
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"),
        F.col("__u").alias("__ub"),
        F.col("cluster_id").alias("__cb"),
        F.col("score").alias("score_b"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("__blkb"),
    )
    # explicit-N repartition on the join keys: the pair stage is
    # COMPUTE-bound on tiny input bytes, so AQE's byte-targeted
    # coalescing would happily fuse it to one task; a user-specified
    # partition count is exempt from coalescing and co-partitions both
    # sides (no extra exchange)
    n_part = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    a = a.repartition(n_part, "cluster_id", "__blk")
    b = b.repartition(n_part, "__cb", "__blkb")
    # shuffle_hash hint: BOTH sides are O(n) (a is exploded ×n_blocks),
    # so a broadcast here is categorically wrong — but the kernel
    # assignment path (mapInPandas) carries no size stats and Catalyst
    # under-estimated it, planning a BroadcastHashJoin of the EXPLODED
    # side that blew spark.driver.maxResultSize at the 100× ladder
    # point (r11, measured). The hint pins the co-partitioned
    # shuffled-hash plan (build = the unexploded b side) at every
    # scale; the literal path plans the same join, so oracle grains
    # are unaffected.
    # HOF fold deliberately (r13-opt finding): the dim-unrolled variant
    # is one unsplittable chain that fails Janino inside join codegen
    # units and regressed this entry 4.1 → 5.9 s (isolated triples) —
    # see OPTIMIZATION_r13.md §8.
    pairs = a.join(
        b.hint("shuffle_hash"),
        (a.cluster_id == b.__cb)
        & (F.col("__blk") == F.col("__blkb"))
        & (F.col("id_a") < F.col("id_b")),
    ).filter(
        F.aggregate(
            F.zip_with(F.col("__ua"), F.col("__ub"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        >= F.lit(float(threshold))
    )
    # pair loser = the worse representative (id_a < id_b here, so an
    # exact score tie keeps id_a); a doc is dropped iff it loses ANY
    # pair, i.e. some better neighbor duplicates it
    losers = pairs.select(
        F.when(
            (F.col("score_a") > F.col("score_b"))
            | (F.col("score_a") == F.col("score_b")),
            F.col("id_b"),
        )
        .otherwise(F.col("id_a"))
        .alias(id_col)
    ).distinct()
    return assigned.join(losers, id_col, "left_anti").select(
        id_col, "cluster_id", "score"
    )


def embedding_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_eval: int = 4096,
) -> DataFrame:
    """SEMANTIC decontamination (r7) — the embedding member of the
    decontamination family (n-gram overlap, Bloom-prefiltered, span
    surgery): flag every corpus row whose embedding is within cosine
    ``threshold`` of ANY eval-set embedding, catching paraphrased or
    reformatted eval leakage that lexical n-grams miss.

    The eval side is a bounded collect (≤ ``max_eval``, contract error
    beyond — an eval set is small by definition), unit-normalized with
    a sequential per-element fold, and broadcast into an Arrow-batched
    ``mapInPandas`` kernel: per batch, one (rows × evals) score matrix
    accumulated DIMENSION-BY-DIMENSION — the ``pq_encode_np``
    construction, every add in the same left-to-right IEEE order as
    the SQL oracle's list fold, so the result is BIT-IDENTICAL to the
    expression formulation and the oracle hash-checks it directly.
    (Two rejected formulations, measured at sf0.1: |eval| unrolled
    cosine expressions are Janino-compile-bound at ~12.5 s, and a
    nested-HOF ``transform``/``aggregate`` lambda is interpreted
    per eval element at ~90 s; the vectorized kernel runs the same
    arithmetic in well under a second.) No join of any kind; one
    pass, embarrassingly parallel. For eval sets beyond the cap,
    route through :func:`dedup.embedding_near_dup_pairs` over the
    union instead (sign-LSH — recall <1 but scales to any eval size).

    Returns every corpus row as (id_col, max_eval_cos, contaminated);
    filter ``~contaminated`` for the clean set."""
    import numpy as np

    rows = _collect_bounded(
        eval_df.select(vec_col),
        max_eval,
        "eval embeddings",
        "semantic decontamination broadcasts the eval set into the "
        "kernel; for larger eval sets use "
        "dedup.embedding_near_dup_pairs over the union (sign-LSH)",
    )
    if not rows:
        raise ValueError("embedding_decontaminate needs a non-empty eval set")
    E = np.array([[float(x) for x in r[vec_col]] for r in rows], dtype=np.float64)
    s = np.zeros(len(E))
    for d in range(E.shape[1]):  # sequential fold — matches SQL exactly
        s += E[:, d] * E[:, d]
    n = np.sqrt(s)
    n[n == 0] = 1.0  # zero-norm eval rows stay raw (dots become 0)
    E = E / n[:, None]
    thr = float(threshold)
    id_type = dict(df.dtypes)[id_col]

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            sx = np.zeros(len(X))
            for d in range(X.shape[1]):
                sx += X[:, d] * X[:, d]
            nx = np.sqrt(sx)
            nx[nx == 0] = 1.0
            U = X / nx[:, None]
            S = np.zeros((len(X), len(E)))
            for d in range(X.shape[1]):  # dim-by-dim: the SQL fold order
                S += U[:, d : d + 1] * E[None, :, d]
            best = S.max(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "max_eval_cos": best,
                    "contaminated": best >= thr,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, max_eval_cos double, "
        "contaminated boolean",
    )


def _collect_bounded(df: DataFrame, max_rows: int, what: str, hint: str):
    """Driver-collect a frame whose small size is a CONTRACT, enforcing
    the contract at runtime (VERDICT r4 #2): the collect itself is capped
    by a LIMIT — an over-contract caller gets a clear error naming the
    distributed alternative instead of an inscrutable driver OOM. Costs
    nothing extra: the limit prunes at the executors before transfer."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"{what} exceeds its small-by-contract bound of {max_rows:,} "
            f"rows — this path collects it to the driver and broadcasts "
            f"it. {hint}"
        )
    return rows


def batch_corpus_cosine_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_batch_rows: int = 200_000,
) -> DataFrame:
    """EXACT batch-vs-corpus cosine pairs >= threshold — the recall-1.0
    anchor for :meth:`IvfIndex.probe_pairs` (the asymmetric counterpart
    of :func:`allpairs_cosine_pairs`, which anchors the symmetric LSH
    paths).

    The batch (crawl delta — small by construction, the same contract
    under which the MinHash probe broadcasts its batch side) is
    collected once into an O(delta×d) normalized matrix and broadcast;
    the corpus side streams through Arrow-batched numpy matmuls at scan
    speed and never shuffles. A crossJoin + per-pair HOF cosine computes
    the same thing ~30× slower (interpreted lambda per pair vs one BLAS
    call per Arrow batch — measured 21 s vs <1 s at sf0.1).
    Exact-but-linear-per-delta: at petabyte corpus scale every delta
    re-pays one full corpus scan, which is precisely the cost the
    persisted IVF index probe avoids — this op exists as the
    correctness/recall oracle for that path, and as the honest fallback
    when index recall is not acceptable.

    The delta-is-small contract is ENFORCED: more than ``max_batch_rows``
    batch rows (default 200k ≈ 100 MB at d=64) raises a contract error
    instead of OOMing the driver; split the delta or use the distributed
    block path (:func:`allpairs_cosine_pairs` over the union) instead."""
    import numpy as np

    spark = corpus.sparkSession
    b_rows = _collect_bounded(
        batch.select(id_col, vec_col),
        max_batch_rows,
        "batch_corpus_cosine_pairs batch side",
        "Split the delta into sub-batches, or run the distributed "
        "block-matrix path (allpairs_cosine_pairs) over corpus ∪ batch.",
    )
    b_ids = np.array([r[id_col] for r in b_rows], dtype=np.int64)
    b_mat = np.array([list(r[vec_col]) for r in b_rows], dtype=np.float64)
    bn = np.linalg.norm(b_mat, axis=1, keepdims=True)
    bn[bn == 0] = 1.0
    bc_ids = spark.sparkContext.broadcast(b_ids)
    bc_mat = spark.sparkContext.broadcast(b_mat / bn)

    def kernel(batches):
        import pandas as pd

        ids, mat = bc_ids.value, bc_mat.value
        for pdf in batches:
            if len(pdf) == 0 or len(ids) == 0:
                continue
            cm = np.array(list(pdf["__v"]), dtype=np.float64)
            cn = np.linalg.norm(cm, axis=1, keepdims=True)
            cn[cn == 0] = 1.0
            sims = (cm / cn) @ mat.T  # corpus_block × delta
            ci, bi = np.nonzero(sims >= threshold)
            if len(ci) == 0:
                continue
            yield pd.DataFrame(
                {
                    "batch_id": ids[bi],
                    "corpus_id": pdf[id_col].to_numpy()[ci],
                    "cosine_sim": sims[ci, bi],
                }
            )

    c = corpus.select(
        F.col(id_col), to_double_array(F.col(vec_col)).alias("__v")
    )
    return c.mapInPandas(
        kernel, schema="batch_id long, corpus_id long, cosine_sim double"
    )


class IvfIndex:
    """IVF-flat index over parquet: build once, probe cheaply many times.

    Build: bucket vectors by sign-LSH (fast, deterministic), take bucket
    mean vectors as centroids, assign every vector to its nearest centroid,
    write ``partitionBy(centroid_id)``. Probe: rank centroids by cosine to
    the query (tiny driver-side computation over C rows), read only the
    ``n_probe`` best partitions (partition pruning → untouched files are
    never opened), brute-force within.

    Beyond serving (:meth:`probe` / :meth:`probe_batch`), the persisted
    layout doubles as the EMBEDDING-side crawl-delta dedup index (VERDICT
    r3 #2 — the vector twin of ``dedup.MinHashCorpusIndex``):
    :meth:`probe_pairs` finds corpus near-dups of a new batch through ONE
    partition-pruned scan of the probed centroid partitions with the
    batch broadcast into it — zero corpus shuffle per delta —
    :meth:`filter_novel` drops the matched batch rows, and :meth:`append`
    folds an accepted batch in as a partitioned parquet append against
    the frozen centroid set (standard IVF practice: the quantizer does
    not move on insert; rebuild when drift warrants it). ``params/`` pins
    the build parameters so a later session reopens via :meth:`load`
    with a verified-identical configuration.
    """

    def __init__(self, path: str, dim: int = 64, n_planes: int = 6, seed: int = 42,
                 kmeans_iters: int = 4):
        self.path = path
        self.dim = dim
        self.n_planes = n_planes
        self.seed = seed
        self.planes = random_hyperplanes(dim, n_planes, seed)
        self.kmeans_iters = kmeans_iters
        self._params_verified = False
        self._cstate = None  # (c_ids, c_mat) after first centroid read
        # vectors live under vectors/gen=G so append-accumulated small
        # files can merge via the same crash-safe stage/commit/GC swap
        # the sink and the MinHash index use
        self._vgens = GenerationalDir(f"{path}/vectors")
        self._tombs = TombstoneSet(path, "vec_id")

    def _vectors_path(self, spark) -> str:
        return self._vgens.gen_path(spark)

    def _without_tombstoned(self, spark, vecs: DataFrame, id_col: str) -> DataFrame:
        """Hide deleted vectors from a probe scan (broadcast anti-join;
        no-op when nothing is tombstoned). compact() drops them for real."""
        tombs = self._tombs.frame(spark)
        if tombs is None:
            return vecs
        return vecs.join(
            F.broadcast(tombs.withColumnRenamed("vec_id", id_col)),
            id_col,
            "left_anti",
        )

    def delete(self, spark, vec_ids) -> None:
        """Takedown: tombstone ``vec_ids`` (int iterable or 1-column
        DataFrame named ``vec_id``). Logical-immediate — every probe path
        stops returning them — physical at the next :meth:`compact`."""
        self._tombs.add(spark, vec_ids)

    def _params_tuple(self):
        return (int(self.dim), int(self.n_planes), int(self.seed))

    def _check_params(self, spark) -> None:
        """Refuse to probe/append with a configuration that differs from
        the on-disk pin (same contract as MinHashCorpusIndex: a silent
        mismatch — wrong dim above all — would score garbage)."""
        if self._params_verified:
            return
        p = spark.read.json(f"{self.path}/params").collect()[0]
        on_disk = (int(p["dim"]), int(p["n_planes"]), int(p["seed"]))
        if on_disk != self._params_tuple():
            raise ValueError(
                f"IvfIndex parameter mismatch at {self.path}: index was "
                f"built with (dim, n_planes, seed)={on_disk}, instance "
                f"has {self._params_tuple()}; reopen via IvfIndex.load()"
            )
        self._params_verified = True

    @classmethod
    def load(cls, spark, path: str) -> "IvfIndex":
        """Reopen an index with the exact parameters it was built with."""
        p = spark.read.json(f"{path}/params").collect()[0]
        idx = cls(path, dim=int(p["dim"]), n_planes=int(p["n_planes"]),
                  seed=int(p["seed"]), kmeans_iters=int(p["kmeans_iters"]))
        idx._params_verified = True
        return idx

    def _centroid_state(self, spark):
        """(c_ids, c_mat) from the persisted centroid table — O(C×d)
        driver state, cached per instance (centroids are immutable after
        build; appends never move them)."""
        if self._cstate is None:
            import numpy as np

            cent = spark.read.parquet(f"{self.path}/centroids").collect()
            c_ids = np.array([r["centroid_id"] for r in cent], dtype=np.int64)
            c_mat = np.array([r["centroid"] for r in cent], dtype=np.float64)
            self._cstate = (c_ids, c_mat)
        return self._cstate

    @staticmethod
    def _assign(vecs: DataFrame, id_col: str, c_ids, c_mat) -> DataFrame:
        """Nearest-centroid assignment: the centroid matrix (C×d, tiny)
        broadcasts to every Python worker and each Arrow batch is one
        numpy matmul + argmax — vectorized BLAS instead of C interpreted
        cosine expressions per row (the crossJoin+max_by formulation
        measured ~10x slower at 2k vectors × 64 centroids)."""
        import numpy as np

        spark = vecs.sparkSession
        b_ids = spark.sparkContext.broadcast(c_ids)
        b_mat = spark.sparkContext.broadcast(c_mat)

        def assign(batches):
            import pandas as pd

            ids, mat = b_ids.value, b_mat.value
            for pdf in batches:
                bm = np.array(list(pdf["__v"]), dtype=np.float64)
                bn = np.linalg.norm(bm, axis=1, keepdims=True)
                bn[bn == 0] = 1.0
                best = ids[np.argmax((bm / bn) @ mat.T, axis=1)]
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "centroid_id": best,
                        "vec": pdf["__v"],
                    }
                )

        return vecs.select(id_col, "__v").mapInPandas(
            assign,
            schema=f"{id_col} long, centroid_id long, vec array<double>",
        )

    @staticmethod
    def _cluster_means(assigned: DataFrame, key: str, dim: int) -> DataFrame:
        """Elementwise mean vector per cluster as ONE aggregation of
        ``dim`` per-position ``avg`` columns — no cluster's vectors ever
        collect into a single row (scales to arbitrarily hot clusters:
        the agg state is C×d (sum, count) partials per task).

        r13-opt (guide §2.3/§2.4): the previous formulation posexploded
        every vector (a d× row blowup feeding the exchange) and needed a
        SECOND shuffle to re-assemble positions into an array
        (groupBy(key, pos) → groupBy(key)); indexing the array directly
        keeps the same per-position avg semantics with d× fewer exchange
        rows and one Exchange instead of two — per Lloyd pass, of which
        a build runs kmeans_iters+1."""
        per = assigned.groupBy(key).agg(
            *[
                F.avg(F.col("vec")[i]).alias(f"__m{i}")
                for i in range(dim)
            ]
        )
        return per.select(
            key,
            F.array(*[F.col(f"__m{i}") for i in range(dim)]).alias(
                "centroid"
            ),
        )

    def build(self, df: DataFrame, vec_col: str, id_col: str = "vec_id") -> None:
        import numpy as np

        spark = df.sparkSession
        # persisted: feeds the init means, every Lloyd pass, and the final
        # assignment — and the sign-LSH projection is the expensive part
        # of this scan
        vecs = df.select(
            F.col(id_col),
            to_double_array(F.col(vec_col)).alias("__v"),
            sign_bucket(F.col(vec_col), self.planes).alias("__b"),
        ).persist()

        def normalized(mat: "np.ndarray") -> "np.ndarray":
            n = np.linalg.norm(mat, axis=1, keepdims=True)
            n[n == 0] = 1.0
            return mat / n

        # init: sign-LSH bucket means — one deterministic pass that lands
        # near the data's density without k-means++ sampling rounds
        init = self._cluster_means(
            vecs.select(F.col("__b").alias("centroid_id"),
                        F.col("__v").alias("vec")),
            "centroid_id", self.dim,
        ).collect()  # O(C×d): C ≤ 2^n_planes centroids, driver-tiny
        c_ids = np.array([r["centroid_id"] for r in init], dtype=np.int64)
        c_mat = normalized(np.array([r["centroid"] for r in init],
                                    dtype=np.float64))
        # Lloyd's iterations (spherical k-means: cosine assignment, mean
        # update, centroid renormalization). Each pass is one scan of the
        # persisted vectors + a C×d-partial shuffle; the centroid state
        # that round-trips through the driver is O(C×d), never O(N).
        for _ in range(self.kmeans_iters):
            assigned = self._assign(vecs, id_col, c_ids, c_mat)
            means = self._cluster_means(
                assigned, "centroid_id", self.dim
            ).collect()
            by_id = {r["centroid_id"]: r["centroid"] for r in means}
            new_mat = np.array(
                [by_id.get(int(c), c_mat[i]) for i, c in enumerate(c_ids)],
                dtype=np.float64,
            )  # empty clusters keep their previous centroid
            c_mat = normalized(new_mat)

        local_rows_df(
            spark,
            [(int(c), [float(x) for x in row]) for c, row in zip(c_ids, c_mat)],
            "centroid_id long, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{self.path}/centroids")

        assigned = self._assign(vecs, id_col, c_ids, c_mat)
        # co-locate each centroid's vectors before the partitioned write:
        # one file per centroid directory instead of tasks × centroids
        # fragments (also the right layout for probe-side scan locality).
        # reset() first: a rebuild over an old index must not leave a
        # committed higher generation shadowing the fresh gen=0
        self._vgens.reset(spark)
        assigned.repartition("centroid_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(f"{self.path}/vectors/gen=0")
        vecs.unpersist()
        local_rows_df(
            spark,
            [(int(self.dim), int(self.n_planes), int(self.seed),
              int(self.kmeans_iters), id_col)],
            "dim int, n_planes int, seed int, kmeans_iters int, id_col string",
        ).coalesce(1).write.mode("overwrite").json(f"{self.path}/params")
        self._params_verified = True
        self._cstate = None  # rebuilt centroids invalidate the cache

    def probe_batch(
        self,
        spark,
        queries: DataFrame,
        *,
        k: int = 10,
        n_probe: int = 4,
        id_col: str = "vec_id",
        query_id_col: str = "query_id",
        vec_col: str = "embedding",
        max_query_rows: int = 100_000,
        allowed: DataFrame | None = None,
    ) -> DataFrame:
        """Batched IVF probe — the real serving shape (VERDICT r2 #7):
        one query at a time pays a scan per query; a query SET probes in
        one job. The query set is collected for the driver-side Q×C
        centroid ranking, so its small size is a contract, ENFORCED at
        ``max_query_rows`` (split a larger query load into sub-batches —
        each probe is one job, so chunking costs only job overhead).

        - per-query centroid ranking is a single driver-side Q×C matmul
          over the tiny centroid table (O(Q×d + C×d) driver state — the
          same order as the broadcast the exact path already pays);
        - the vectors table is read in ONE partition-pruned scan of the
          UNION of all probed partitions (files of unprobed centroids
          stay unread on disk);
        - each vector scores ONLY against the queries probing its
          partition — an equi-join on centroid_id against the broadcast
          (query, centroid, qvec) probe plan, not a full cross join;
        - per-query top-k is a window row_number, k rows per query out.
        """
        import numpy as np

        cent = spark.read.parquet(f"{self.path}/centroids").collect()
        c_ids = np.array([r["centroid_id"] for r in cent], dtype=np.int64)
        c_mat = np.array([r["centroid"] for r in cent], dtype=np.float64)
        # centroids are L2-normalized at build time; normalize queries once
        q_rows = _collect_bounded(
            queries.select(query_id_col, vec_col),
            max_query_rows,
            "IvfIndex.probe_batch query set",
            "Chunk the query set and call probe_batch per chunk.",
        )
        qm = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        sims = (qm / qn) @ c_mat.T  # Q×C, driver-tiny
        plan_rows = []
        for qi, r in enumerate(q_rows):
            for ci in np.argsort(-sims[qi])[:n_probe]:
                plan_rows.append(
                    (int(r[query_id_col]), int(c_ids[ci]),
                     [float(x) for x in qm[qi]])
                )
        probe_plan = local_rows_df(
            spark,
            plan_rows,
            f"{query_id_col} long, centroid_id long, __qv array<double>",
        )
        probed = sorted({cid for _, cid, _ in plan_rows})
        vecs = spark.read.parquet(self._vectors_path(spark)).filter(
            F.col("centroid_id").isin(probed)  # partition pruning
        )
        if allowed is not None:  # filtered search — see probe()
            vecs = vecs.join(
                F.broadcast(allowed.select(id_col)), id_col, "semi"
            )
        vecs = self._without_tombstoned(spark, vecs, id_col)
        scored = vecs.join(F.broadcast(probe_plan), "centroid_id").select(
            query_id_col,
            id_col,
            cosine_similarity(F.col("vec"), F.col("__qv")).alias("score"),
        )
        from pyspark.sql import Window

        w = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col(id_col)
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    def probe(
        self, spark, query: list[float], k: int = 10, n_probe: int = 4,
        id_col: str = "vec_id", allowed: DataFrame | None = None,
    ) -> DataFrame:
        """Approximate cosine top-k from the n_probe nearest centroids'
        partitions. ``allowed`` (r6) restricts candidates to an id set
        INSIDE the pruned scan via a broadcast semi-join — the
        filtered-search shape for predicates over an EXTERNAL metadata
        table (compute ids = meta.filter(pred).select(id) and pass it);
        filtering before scoring keeps k filled, unlike post-filtering
        the top-k. IvfPqIndex stores metadata inline (meta_cols) —
        this index stores raw vectors, so the id-set form avoids
        duplicating metadata into the vector layout."""
        cent = spark.read.parquet(f"{self.path}/centroids")
        best = (
            cent.withColumn(
                "__sim", cosine_similarity(F.col("centroid"), literal_vector(query))
            )
            .orderBy(F.col("__sim").desc())
            .limit(n_probe)
            .select("centroid_id")
            .collect()
        )  # tiny: C rows -> n_probe ids; this collect is O(n_probe)
        ids = [r["centroid_id"] for r in best]
        vecs = spark.read.parquet(self._vectors_path(spark)).filter(
            F.col("centroid_id").isin(ids)  # partition pruning
        )
        if allowed is not None:
            vecs = vecs.join(
                F.broadcast(allowed.select(id_col)), id_col, "semi"
            )
        vecs = self._without_tombstoned(spark, vecs, id_col)
        scored = vecs.withColumn(
            "score", cosine_similarity(F.col("vec"), literal_vector(query))
        )
        return (
            scored.orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k)
            .select(id_col, "score")
        )

    # -- incremental embedding near-dup (VERDICT r3 #2) --------------------

    def _assign_multi(
        self, vecs: DataFrame, id_col: str, c_ids, c_mat, n_probe: int
    ) -> DataFrame:
        """Multi-probe assignment: each vector → its ``n_probe`` nearest
        centroids, one output row per (vector, probed centroid). Same
        broadcast-centroids + Arrow-batch BLAS shape as :meth:`_assign`;
        ``argpartition`` keeps the per-batch cost O(B×C), not O(B×C log C)."""
        import numpy as np

        spark = vecs.sparkSession
        b_ids = spark.sparkContext.broadcast(c_ids)
        b_mat = spark.sparkContext.broadcast(c_mat)

        def assign(batches):
            import pandas as pd

            ids, mat = b_ids.value, b_mat.value
            k = min(n_probe, len(ids))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                bm = np.array(list(pdf["__v"]), dtype=np.float64)
                bn = np.linalg.norm(bm, axis=1, keepdims=True)
                bn[bn == 0] = 1.0
                sims = (bm / bn) @ mat.T  # B×C
                if k < sims.shape[1]:
                    top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
                else:
                    top = np.tile(np.arange(sims.shape[1]), (len(bm), 1))
                rep = np.repeat(np.arange(len(pdf)), top.shape[1])
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy()[rep],
                        "centroid_id": ids[top].ravel(),
                        "vec": pdf["__v"].iloc[rep].to_numpy(),
                    }
                )

        return vecs.select(id_col, "__v").mapInPandas(
            assign,
            schema=f"{id_col} long, centroid_id long, vec array<double>",
        )

    def probe_pairs(
        self,
        batch: DataFrame,
        *,
        threshold: float = 0.95,
        n_probe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Verified near-dup pairs between a new batch and the indexed
        corpus: (batch_id, corpus_id, cosine_sim) with cosine >=
        ``threshold`` — the embedding twin of
        ``MinHashCorpusIndex.probe_pairs``.

        Shape, chosen for the delta-vs-petabyte case:

        - batch vectors multi-probe their ``n_probe`` nearest centroids
          (Arrow-batched BLAS against the broadcast O(C×d) centroid
          table — the batch is never collected);
        - ONE partition-pruned scan reads the union of probed partitions
          (files of unprobed centroids stay unread on disk);
        - the corpus side streams through a broadcast hash join against
          the batch's (centroid, vec) probe rows — zero corpus shuffle;
        - each corpus vector lives in exactly one partition and each
          (batch, centroid) probe row is unique, so a (batch, corpus)
          pair is scored at most once — no dedup pass.

        Recall: a corpus near-dup is missed only if its home centroid is
        not among the batch vector's ``n_probe`` closest — for
        near-identical thresholds (the dedup regime) the two vectors
        rank centroids almost identically, so even ``n_probe=1`` is
        nearly exact; raise ``n_probe`` for looser thresholds. The exact
        anchor (:func:`allpairs_cosine_pairs`) remains the recall-1.0
        fallback."""
        spark = batch.sparkSession
        self._check_params(spark)
        c_ids, c_mat = self._centroid_state(spark)
        b_vecs = batch.select(
            F.col(id_col), to_double_array(F.col(vec_col)).alias("__v")
        )
        assigned = self._assign_multi(b_vecs, id_col, c_ids, c_mat, n_probe)
        assigned = persist_tracked(
            assigned.select(
                F.col(id_col).alias("batch_id"),
                "centroid_id",
                F.col("vec").alias("__bv"),
            )
        )  # feeds the probed-partition listing AND the verify join
        probed = sorted(
            r["centroid_id"]
            for r in assigned.select("centroid_id").distinct().collect()
        )  # O(C) driver rows — bounds the partition pruning
        vecs = spark.read.parquet(self._vectors_path(spark)).filter(
            F.col("centroid_id").isin(probed)  # partition pruning
        )
        vecs = self._without_tombstoned(spark, vecs, id_col)
        return (
            vecs.join(F.broadcast(assigned), "centroid_id")
            .withColumn(
                "cosine_sim", cosine_similarity(F.col("vec"), F.col("__bv"))
            )
            .filter(F.col("cosine_sim") >= threshold)
            .select(
                "batch_id", F.col(id_col).alias("corpus_id"), "cosine_sim"
            )
        )

    def filter_novel(
        self,
        batch: DataFrame,
        *,
        threshold: float = 0.95,
        n_probe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dedup_within: bool = True,
    ) -> DataFrame:
        """The incremental-ingestion operator: batch rows whose embedding
        is not a near-dup of anything indexed, optionally near-dup-deduped
        within the batch itself. The survivors are what :meth:`append`
        should fold into the index.

        The within-batch pass is EXACT (block-BLAS all-pairs, keep
        smallest id): the batch is a crawl delta — small by the same
        contract under which it broadcasts into the corpus probe — so
        exact quadratic-in-delta dedup is affordable and avoids a second
        LSH configuration whose recall would need its own tuning."""
        pairs = self.probe_pairs(
            batch, threshold=threshold, n_probe=n_probe,
            id_col=id_col, vec_col=vec_col,
        )
        dropped = pairs.select(F.col("batch_id").alias(id_col)).distinct()
        fresh = batch.join(F.broadcast(dropped), id_col, "left_anti")
        if dedup_within:
            pairs_w = allpairs_cosine_pairs(
                fresh, id_col, vec_col, threshold=threshold
            )
            losers = pairs_w.select(F.col("id_b").alias(id_col)).distinct()
            fresh = fresh.join(F.broadcast(losers), id_col, "left_anti")
        return fresh

    def append(
        self, accepted: DataFrame, vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> None:
        """Fold an accepted batch into the index: nearest-centroid assign
        against the FROZEN centroid set, then a partitioned parquet
        append — existing files are untouched, centroids do not move
        (rebuild when ingestion drift degrades probe recall)."""
        spark = accepted.sparkSession
        self._check_params(spark)
        c_ids, c_mat = self._centroid_state(spark)
        vecs = accepted.select(
            F.col(id_col), to_double_array(F.col(vec_col)).alias("__v")
        )
        assigned = self._assign(vecs, id_col, c_ids, c_mat)
        assigned.repartition("centroid_id").write.mode("append").partitionBy(
            "centroid_id"
        ).parquet(self._vectors_path(spark))

    # -- maintenance -------------------------------------------------------

    def stats(self, spark) -> dict:
        """Index health counters for scheduling :meth:`compact`:
        ``n_vectors``, ``n_centroids`` (live partitions), ``n_files``
        (the small-file accumulation appends cause), and the live
        ``generation``."""
        vecs = spark.read.parquet(self._vectors_path(spark))
        return {
            "generation": self._vgens.current_gen(spark),
            "n_vectors": vecs.count(),
            "n_centroids": vecs.select("centroid_id").distinct().count(),
            "n_files": len(vecs.inputFiles()),
            "n_tombstones": self._tombs.count(spark),
        }

    def compact(self, spark) -> None:
        """Merge append-accumulated small files: rewrite the live vectors
        table back to one file per centroid partition under generation
        G+1, marker-commit, GC generation G — the same crash-safe swap
        as ``MinHashCorpusIndex.compact`` / the sink. Pure re-layout —
        assignments, centroids, and probe results are untouched — EXCEPT
        tombstoned vectors, which are dropped physically here and their
        tombstones cleared (probes were already hiding them)."""
        nxt = self._vgens.current_gen(spark) + 1
        live = spark.read.parquet(self._vectors_path(spark))
        tombs = self._tombs.frame(spark)
        if tombs is not None:
            id_col = next(  # build wrote (id, centroid_id, vec)
                c for c in live.schema.names if c not in ("centroid_id", "vec")
            )
            live = live.join(
                F.broadcast(tombs.withColumnRenamed("vec_id", id_col)),
                id_col,
                "left_anti",
            )
        live.repartition("centroid_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(f"{self.path}/vectors/gen={nxt}")
        self._vgens.commit(spark, nxt)
        self._vgens.gc_below(spark, keep=nxt)
        self._tombs.clear(spark)


# ---- Product quantization (PQ): the compressed embedding store ----
#
# IVF answers "scan less"; PQ answers "store less": a D-dim float vector
# becomes M uint8 codes (one per subspace), a 32x compression at
# D=64/M=8 that turns a 100 TB embedding store into ~3 TB, searched via
# asymmetric distance (ADC) lookup tables (Jegou et al., TPAMI 2011).
# Everything below is codegen-only on the executors: encoding is a
# row-local argmin over literal codewords (scan speed, zero shuffle),
# ADC search is a literal-LUT lookup + per-id sum + TakeOrderedAndProject.
# Codebook TRAINING is driver-side numpy Lloyd over a bounded sample
# (the standard PQ practice: train on a sample, encode the corpus
# distributively); the oracle-checked query uses a deterministic
# init-only codebook so DuckDB can replay the exact argmin.


def _sq_l2(a, b, dim: int | None = None) -> "F.Column":
    # sequential left-to-right double fold — same order DuckDB's
    # list_aggregate('sum') uses, so row-local distances match exactly.
    # dim= (r13-opt): same fold unrolled for whole-stage codegen —
    # identical sub/mul/add sequence, bit-identical doubles.
    if dim is not None:
        acc: Column = F.lit(0.0)
        for i in range(dim):
            acc = acc + (a[i] - b[i]) * (a[i] - b[i])
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
) -> DataFrame:
    """Encode each vector against per-subspace codebooks:
    ``codebooks[m]`` is a list of (code, subvector) whose subvectors all
    have length D/M. Returns long form (id, subspace, code, dist) — one
    row per subspace, ``code`` the argmin-squared-L2 codeword (ties to
    the smallest code), ``dist`` that squared distance. Row-local
    codegen: every subspace's |K| distances evaluate inline; nothing
    shuffles."""
    sub_len = len(codebooks[0][0][1])
    vec = to_double_array(F.col(vec_col))
    per_sub = []
    for m, book in enumerate(codebooks):
        sub = F.slice(vec, m * sub_len + 1, sub_len)
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        # HOF, not dim-unrolled: M×K instances per row (see
                        # assign_fixed_centroids note on the Janino limit)
                        _sq_l2(sub, literal_vector(cw)).alias("dist"),
                        F.lit(int(code)).alias("code"),
                    )
                    for code, cw in book
                ]
            )
        )
        per_sub.append(
            F.struct(
                F.lit(m).cast("long").alias("subspace"),
                best["code"].cast("long").alias("code"),
                best["dist"].alias("dist"),
            )
        )
    return df.select(
        F.col(id_col), F.explode(F.array(*per_sub)).alias("__s")
    ).select(
        id_col,
        F.col("__s.subspace").alias("subspace"),
        F.col("__s.code").alias("code"),
        F.col("__s.dist").alias("dist"),
    )


def init_codebooks_from_rows(
    rows: list[list[float]], m_subspaces: int
) -> list[list[tuple[int, list[float]]]]:
    """Deterministic init-only codebooks: codeword k of subspace m is
    the m-th subvector of ``rows[k]`` — reproducible from the raw table
    by any SQL engine (the oracle uses vec_id 0..K-1), and the Lloyd
    starting point of :func:`train_pq_codebooks`."""
    d = len(rows[0])
    sub_len = d // m_subspaces
    return [
        [
            (k, list(map(float, r[m * sub_len:(m + 1) * sub_len])))
            for k, r in enumerate(rows)
        ]
        for m in range(m_subspaces)
    ]


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str,
    *,
    m_subspaces: int = 8,
    k_codes: int = 16,
    iters: int = 5,
    max_sample_rows: int = 65536,
) -> list[list[tuple[int, list[float]]]]:
    """Train PQ codebooks with per-subspace Lloyd iterations over a
    BOUNDED training sample (driver numpy, deterministic: init is the
    sample's first K rows in input order, empty clusters keep their
    codeword). The sample collect goes through the same
    ``_collect_bounded`` contract as the other driver-side sets; corpus
    encoding stays fully distributed via :func:`pq_encode`."""
    import numpy as np

    sample = _collect_bounded(
        df.select(to_double_array(F.col(vec_col)).alias("__v")).limit(
            max_sample_rows
        ),
        max_sample_rows,
        "PQ training sample",
        "lower max_sample_rows or pre-sample the input",
    )
    mat = np.asarray([r["__v"] for r in sample], dtype=np.float64)
    n, d = mat.shape if mat.ndim == 2 else (mat.shape[0], 0)
    if n < k_codes:
        raise ValueError(
            f"train_pq_codebooks: sample has {n} rows but k_codes="
            f"{k_codes} — need at least k_codes training vectors "
            "(grow the input or lower k_codes) (ADVICE r5)"
        )
    if d % m_subspaces:
        raise ValueError(f"dim {d} not divisible by m_subspaces {m_subspaces}")
    sub_len = d // m_subspaces
    books = []
    for m in range(m_subspaces):
        x = mat[:, m * sub_len:(m + 1) * sub_len]
        # init = first k DISTINCT rows in input order (duplicate sample
        # rows would otherwise seed duplicate codewords — ADVICE r5);
        # identical to the old first-k init whenever those are distinct
        _, first_idx = np.unique(x, axis=0, return_index=True)
        uniq_order = np.sort(first_idx)
        if len(uniq_order) < k_codes:
            raise ValueError(
                f"train_pq_codebooks: subspace {m} has only "
                f"{len(uniq_order)} distinct sample rows < k_codes="
                f"{k_codes} — lower k_codes or widen the sample"
            )
        cents = x[uniq_order[:k_codes]].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(k_codes):
                mask = assign == k
                if mask.any():
                    cents[k] = x[mask].mean(axis=0)
        books.append([(k, [float(v) for v in cents[k]]) for k in range(k_codes)])
    return books


def pq_topk_adc(
    codes: DataFrame,
    id_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
    query: list[float],
    *,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays
    UNquantized; per subspace a literal lookup table holds the squared
    L2 between the query subvector and every codeword, and a vector's
    approximate distance is the sum of its M table entries. Input is
    :func:`pq_encode`'s long form (id, subspace, code); the LUT lookup
    is ``element_at`` on literal arrays (codegen), the per-id sum flows
    through DECIMAL so ties resolve identically on any partitioning,
    and the top-k plans as TakeOrderedAndProject. Approximate by
    construction — recall is codebook-quality-dependent (tested)."""
    sub_len = len(codebooks[0][0][1])
    luts = []
    for m, book in enumerate(codebooks):
        qsub = query[m * sub_len:(m + 1) * sub_len]
        table = [0.0] * len(book)
        for code, cw in book:
            table[code] = float(
                sum((float(q) - float(c)) ** 2 for q, c in zip(qsub, cw))
            )
        luts.append(F.array(*[F.lit(v) for v in table]))
    lut = F.array(*luts)
    contrib = F.element_at(
        F.element_at(lut, F.col("subspace").cast("int") + 1),
        F.col("code").cast("int") + 1,
    )
    scored = (
        codes.select(F.col(id_col), contrib.alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("__c").cast("decimal(28,12)"))
            .cast("double")
            .alias("approx_dist")
        )
    )
    return scored.orderBy(F.col("approx_dist").asc(), F.col(id_col)).limit(k)


def pq_code_array(
    vec: "F.Column", codebooks: list[list[tuple[int, list[float]]]]
) -> "F.Column":
    """The wide form of :func:`pq_encode`: one ``array<long>`` of M
    sub-codes per row (storage layout for :class:`IvfPqIndex`), same
    row-local argmin codegen."""
    sub_len = len(codebooks[0][0][1])
    codes = []
    for m, book in enumerate(codebooks):
        sub = F.slice(vec, m * sub_len + 1, sub_len)
        best = F.array_min(
            F.array(
                *[
                    F.struct(
                        # HOF, not dim-unrolled: M×K instances per row (see
                        # assign_fixed_centroids note on the Janino limit)
                        _sq_l2(sub, literal_vector(cw)).alias("dist"),
                        F.lit(int(code)).alias("code"),
                    )
                    for code, cw in book
                ]
            )
        )
        codes.append(best["code"].cast("long"))
    return F.array(*codes)


class IvfPqIndex:
    """IVF-PQ composite index: PQ codes stored inside a partition-pruned
    IVF layout — the FAISS-style shape for billion-vector serving.
    :class:`IvfIndex` prunes the SCAN (read ~n_probe/C of the corpus)
    but stores raw vectors; :class:`pq_encode` shrinks STORAGE 32× but
    scans everything. This index does both: a probe reads only the
    n_probe nearest centroids' partitions, and those partitions hold
    M-byte PQ codes instead of D-float vectors, so the probe's IO is
    ~(n_probe/C)·(M/4D) of a flat scan. Candidate scoring is
    asymmetric-distance (query unquantized, literal LUT per subspace —
    codegen, no Python).

    Distance metric is squared L2 END-TO-END (build assignment, probe
    centroid ranking, ADC scoring) — no cosine/L2 mix that would skew
    recall. Vectors are PQ-encoded RAW (FAISS ``by_residual=False``);
    residual encoding needs per-partition codebooks and is out of
    scope. Quantizer (centroids) and codebooks are FROZEN after build —
    :meth:`append` encodes against them (standard IVF practice;
    rebuild when drift warrants), :meth:`delete`/:meth:`compact` follow
    the shared tombstone + generation-swap contract. Recall against
    exact L2 top-k is pinned by tests; approximation comes from both
    the IVF pruning and the PQ distortion.

    Layout: ``codes/gen=G/centroid_id=C/`` (id, codes array<long>,
    optional metadata columns), ``centroids/`` (C×d, broadcast-tiny),
    ``codebooks/`` (M·K subvectors), ``params/``, ``tombstones/``.

    FILTERED search (VERDICT r5 #5): real retrieval stacks filter by
    metadata (language, source, date) DURING ANN search — the
    reference's serving sink is likewise queried by partition key
    (reference README.md:129). ``meta_cols`` carries typed metadata
    columns into the stored codes rows at build/append time, and
    :meth:`probe`/:meth:`probe_batch` accept a ``where`` predicate
    evaluated inside the partition-pruned codes scan — candidates are
    filtered BEFORE ADC scoring and top-k, so a filtered probe reads
    the same ≤n_probe partitions and the predicate additionally prunes
    parquet row groups via min/max stats (post-filtering the top-k
    instead would return < k rows whenever the filter is selective).
    """

    def __init__(
        self,
        path: str,
        dim: int = 64,
        n_planes: int = 6,
        seed: int = 42,
        *,
        m_subspaces: int = 8,
        k_codes: int = 16,
        meta_cols: tuple = (),
    ):
        self.path = path
        self.dim = dim
        self.n_planes = n_planes
        self.seed = seed
        self.m_subspaces = m_subspaces
        self.k_codes = k_codes
        self.meta_cols = tuple(meta_cols)
        self.planes = random_hyperplanes(dim, n_planes, seed)
        self._gens = GenerationalDir(f"{path}/codes")
        self._tombs = TombstoneSet(path, "vec_id")
        self._params_verified = False
        self._cstate = None
        self._books = None

    # ---- bookkeeping ----

    def _codes_path(self, spark) -> str:
        return self._gens.gen_path(spark)

    def _params_tuple(self):
        return (
            int(self.dim), int(self.n_planes), int(self.seed),
            int(self.m_subspaces), int(self.k_codes),
        )

    @staticmethod
    def _meta_from_params(p) -> tuple:
        raw = p.asDict().get("meta_cols", "") or ""
        return tuple(c for c in raw.split(",") if c)

    def _check_params(self, spark) -> None:
        if self._params_verified:
            return
        p = spark.read.json(f"{self.path}/params").collect()[0]
        on_disk = (
            int(p["dim"]), int(p["n_planes"]), int(p["seed"]),
            int(p["m_subspaces"]), int(p["k_codes"]),
        )
        if on_disk != self._params_tuple():
            raise ValueError(
                f"IvfPqIndex parameter mismatch at {self.path}: built with "
                f"(dim, n_planes, seed, M, K)={on_disk}, instance has "
                f"{self._params_tuple()}; reopen via IvfPqIndex.load()"
            )
        disk_meta = self._meta_from_params(p)
        if disk_meta != self.meta_cols:
            raise ValueError(
                f"IvfPqIndex meta_cols mismatch at {self.path}: built with "
                f"{disk_meta}, instance has {self.meta_cols}; reopen via "
                "IvfPqIndex.load()"
            )
        self._params_verified = True

    @classmethod
    def load(cls, spark, path: str) -> "IvfPqIndex":
        p = spark.read.json(f"{path}/params").collect()[0]
        idx = cls(
            path, dim=int(p["dim"]), n_planes=int(p["n_planes"]),
            seed=int(p["seed"]), m_subspaces=int(p["m_subspaces"]),
            k_codes=int(p["k_codes"]),
            meta_cols=cls._meta_from_params(p),
        )
        idx._params_verified = True
        return idx

    def _centroid_state(self, spark):
        if self._cstate is None:
            import numpy as np

            cent = spark.read.parquet(f"{self.path}/centroids").collect()
            c_ids = np.array([r["centroid_id"] for r in cent], dtype=np.int64)
            c_mat = np.array(
                [r["centroid"] for r in cent], dtype=np.float64
            )
            self._cstate = (c_ids, c_mat)
        return self._cstate

    def _codebooks(self, spark):
        if self._books is None:
            rows = spark.read.parquet(f"{self.path}/codebooks").collect()
            books: list[list] = [
                [None] * self.k_codes for _ in range(self.m_subspaces)
            ]
            for r in rows:
                books[int(r["subspace"])][int(r["code"])] = (
                    int(r["code"]), [float(x) for x in r["codeword"]]
                )
            self._books = books
        return self._books

    # ---- build / append ----

    @staticmethod
    def _assign_l2(vecs: DataFrame, id_col: str, c_ids, c_mat) -> DataFrame:
        """Nearest-centroid by SQUARED L2 (numpy per Arrow batch):
        argmin ||v-c||² = argmax (v·c − ||c||²/2), one matmul."""
        import numpy as np

        spark = vecs.sparkSession
        b_ids = spark.sparkContext.broadcast(c_ids)
        b_mat = spark.sparkContext.broadcast(c_mat)

        def assign(batches):
            import pandas as pd

            ids, mat = b_ids.value, b_mat.value
            half_norms = 0.5 * (mat * mat).sum(axis=1)
            for pdf in batches:
                bm = np.array(list(pdf["__v"]), dtype=np.float64)
                best = ids[np.argmax(bm @ mat.T - half_norms, axis=1)]
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "centroid_id": best,
                     "vec": pdf["__v"]}
                )

        return vecs.select(id_col, "__v").mapInPandas(
            assign,
            schema=f"{id_col} long, centroid_id long, vec array<double>",
        )

    def build(self, df: DataFrame, vec_col: str, id_col: str = "vec_id") -> None:
        """One corpus scan each for: sign-LSH bucket-mean centroids
        (deterministic, un-normalized — L2 space), PQ codebook training
        (bounded driver sample), and the encode+partition write."""
        import numpy as np

        spark = df.sparkSession
        vecs = persist_tracked(
            df.select(
                F.col(id_col).alias("vec_id"),
                to_double_array(F.col(vec_col)).alias("__v"),
                sign_bucket(F.col(vec_col), self.planes).alias("__b"),
            )
        )
        init = IvfIndex._cluster_means(
            vecs.select(
                F.col("__b").alias("centroid_id"), F.col("__v").alias("vec")
            ),
            "centroid_id", self.dim,
        ).collect()
        c_ids = np.array([r["centroid_id"] for r in init], dtype=np.int64)
        c_mat = np.array([r["centroid"] for r in init], dtype=np.float64)
        local_rows_df(
            spark,
            [(int(c), [float(x) for x in row]) for c, row in zip(c_ids, c_mat)],
            "centroid_id long, centroid array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{self.path}/centroids")

        books = train_pq_codebooks(
            vecs.select(F.col("__v").alias("embedding")), "embedding",
            m_subspaces=self.m_subspaces, k_codes=self.k_codes, iters=4,
        )
        local_rows_df(
            spark,
            [
                (m, code, [float(x) for x in cw])
                for m, book in enumerate(books)
                for code, cw in book
            ],
            "subspace int, code int, codeword array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(f"{self.path}/codebooks")

        assigned = self._assign_l2(vecs, "vec_id", c_ids, c_mat)
        self._gens.reset(spark)
        self._tombs.clear(spark)
        # numpy encode path (pq_encode_np) — bit-identical to the
        # pq_code_array expression (parity-tested), ~10x faster
        coded = pq_encode_np(assigned, "vec_id", "vec", books)
        rows = assigned.select("vec_id", "centroid_id").join(coded, "vec_id")
        if self.meta_cols:
            meta = df.select(
                F.col(id_col).alias("vec_id"), *self.meta_cols
            )
            rows = rows.join(meta, "vec_id")
        rows.repartition("centroid_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(f"{self.path}/codes/gen=0")
        local_rows_df(
            spark,
            [self._params_tuple() + (id_col, ",".join(self.meta_cols))],
            "dim int, n_planes int, seed int, m_subspaces int, "
            "k_codes int, id_col string, meta_cols string",
        ).coalesce(1).write.mode("overwrite").json(f"{self.path}/params")
        self._params_verified = True
        self._cstate = None
        self._books = None

    def append(self, batch: DataFrame, vec_col: str, id_col: str = "vec_id") -> None:
        """Encode NOVEL vectors against the frozen quantizer + codebooks
        and append into the live generation's partition layout."""
        spark = batch.sparkSession
        self._check_params(spark)
        c_ids, c_mat = self._centroid_state(spark)
        books = self._codebooks(spark)
        vecs = batch.select(
            F.col(id_col).alias("vec_id"),
            to_double_array(F.col(vec_col)).alias("__v"),
        )
        assigned = self._assign_l2(vecs, "vec_id", c_ids, c_mat)
        coded = pq_encode_np(assigned, "vec_id", "vec", books)
        rows = assigned.select("vec_id", "centroid_id").join(coded, "vec_id")
        if self.meta_cols:
            rows = rows.join(
                batch.select(F.col(id_col).alias("vec_id"), *self.meta_cols),
                "vec_id",
            )
        rows.repartition("centroid_id").write.mode("append").partitionBy(
            "centroid_id"
        ).parquet(self._codes_path(spark))

    def delete(self, spark, vec_ids) -> None:
        self._check_params(spark)
        self._tombs.add(spark, vec_ids)

    # ---- probe ----

    def probe(
        self,
        spark,
        query: list[float],
        *,
        k: int = 10,
        n_probe: int = 4,
        where=None,
        rerank: int = 0,
        vectors: DataFrame | None = None,
        vec_col: str = "embedding",
        rerank_id_col: str = "vec_id",
    ) -> DataFrame:
        """Approximate L2 top-k: rank centroids by exact squared L2 to
        the query (O(C×d) driver numpy), read ONLY the n_probe best
        partitions, ADC-score their codes via literal LUTs, take-ordered
        k. Returns (vec_id, centroid_id, approx_dist).

        ``where`` (SQL string or Column over ``meta_cols``/``vec_id``)
        filters candidates INSIDE the pruned scan, before scoring and
        top-k — the filtered-ANN serving shape (class docstring).

        ``rerank`` > 0 adds the FAISS-style refine stage (r6, motivated
        by the measured sf0.1 operating curve in SCALING.md §3: 8-byte
        codes cannot resolve WITHIN-cluster ordering, so raw ADC
        recall@10 plateaus at ~0.2 while the IVF cells themselves are
        right): take the top-``rerank`` candidates by ADC, fetch ONLY
        those rows' raw vectors from ``vectors`` (the original
        embeddings table — the index itself stays vector-free) via a
        broadcast semi-lookup of O(rerank) ids, score them with exact
        squared L2, and return the exact top-``k`` of that pool.
        Returns (vec_id, exact_dist) in that mode. IO stays
        probe-pruned: the codes scan is unchanged and the vector fetch
        touches ``rerank`` rows, not the corpus."""
        import numpy as np

        self._check_params(spark)
        c_ids, c_mat = self._centroid_state(spark)
        q = np.asarray(query, dtype=np.float64)
        order = np.argsort(((c_mat - q) ** 2).sum(axis=1), kind="stable")
        probe_ids = [int(c_ids[i]) for i in order[:n_probe]]
        books = self._codebooks(spark)
        sub_len = self.dim // self.m_subspaces
        luts = []
        for m, book in enumerate(books):
            qsub = query[m * sub_len:(m + 1) * sub_len]
            table = [0.0] * len(book)
            for code, cw in book:
                table[code] = float(
                    sum((float(a) - float(b)) ** 2 for a, b in zip(qsub, cw))
                )
            luts.append(F.array(*[F.lit(v) for v in table]))
        lut = F.array(*luts)
        codes = spark.read.parquet(self._codes_path(spark)).filter(
            F.col("centroid_id").isin(probe_ids)
        )
        if where is not None:
            codes = codes.filter(where)
        tombs = self._tombs.frame(spark)
        if tombs is not None:
            codes = codes.join(F.broadcast(tombs), "vec_id", "anti")
        contribs = [
            F.element_at(
                F.element_at(lut, m + 1),
                F.element_at(F.col("codes"), m + 1).cast("int") + 1,
            )
            for m in range(self.m_subspaces)
        ]
        total = contribs[0]
        for c in contribs[1:]:
            total = total + c
        scored = codes.select(
            "vec_id", "centroid_id", total.alias("approx_dist")
        )
        approx = scored.orderBy(
            F.col("approx_dist").asc(), F.col("vec_id")
        ).limit(max(k, rerank) if rerank else k)
        if not rerank:
            return approx
        if vectors is None:
            raise ValueError(
                "IvfPqIndex.probe: rerank > 0 needs the raw-vector table "
                "via vectors= (the index stores codes only)"
            )
        qlit = F.array(*[F.lit(float(x)) for x in query])
        fetched = vectors.select(
            F.col(rerank_id_col).alias("vec_id"),
            to_double_array(F.col(vec_col)).alias("__v"),
        ).join(F.broadcast(approx.select("vec_id")), "vec_id", "semi")
        exact = fetched.select(
            "vec_id",
            _sq_l2(F.col("__v"), qlit).alias("exact_dist"),
        )
        return exact.orderBy(
            F.col("exact_dist").asc(), F.col("vec_id")
        ).limit(k)

    def probe_batch(
        self,
        spark,
        queries: DataFrame,
        *,
        k: int = 10,
        n_probe: int = 4,
        max_query_rows: int = 1024,
        where=None,
        rerank: int = 0,
        vectors: DataFrame | None = None,
        vec_col: str = "embedding",
        rerank_id_col: str = "vec_id",
    ) -> DataFrame:
        """Batched ADC: all queries answered from ONE partition-pruned
        scan of the union of their probed centroid partitions (the
        :meth:`IvfIndex.probe_batch` shape, over codes instead of raw
        vectors). ``queries`` is (query_id, embedding) and
        small-by-contract (``max_query_rows``-capped collect — it
        becomes broadcast LUT state of Q x M x K floats). The kernel is
        one Arrow-batched numpy gather per (centroid, query) group —
        no per-row Python. Returns (query_id, vec_id, approx_dist),
        top-``k`` per query, ties broken by vec_id. ``where`` filters
        candidates inside the pruned scan (shared across all queries
        in the batch — see class docstring).

        ``rerank`` > 0 is the batched refine stage (see :meth:`probe`):
        per-query top-``rerank`` by ADC, then ONE broadcast semi-lookup
        fetches the union of candidate raw vectors (O(Q·R) ids) from
        ``vectors``, the query embeddings broadcast-join on, and exact
        squared L2 (codegen zip_with fold, no Python) re-orders each
        query's pool — returns (query_id, vec_id, exact_dist) top-k."""
        import numpy as np

        self._check_params(spark)
        q_rows = _collect_bounded(
            queries.select("query_id", "embedding"),
            max_query_rows,
            "IvfPqIndex.probe_batch query set",
            "raise max_query_rows deliberately or chunk the queries",
        )
        if not q_rows:
            return spark.createDataFrame(
                [], "query_id long, vec_id long, approx_dist double"
            )
        c_ids, c_mat = self._centroid_state(spark)
        books = self._codebooks(spark)
        sub_len = self.dim // self.m_subspaces
        qids, luts, probe_sets = [], [], []
        for r in q_rows:
            q = np.asarray([float(x) for x in r["embedding"]], dtype=np.float64)
            order = np.argsort(((c_mat - q) ** 2).sum(axis=1), kind="stable")
            probe_sets.append({int(c_ids[i]) for i in order[:n_probe]})
            lut = np.empty((self.m_subspaces, self.k_codes), dtype=np.float64)
            for m, book in enumerate(books):
                qsub = q[m * sub_len:(m + 1) * sub_len]
                for code, cw in book:
                    lut[m, code] = float(
                        ((qsub - np.asarray(cw, dtype=np.float64)) ** 2).sum()
                    )
            luts.append(lut)
            qids.append(int(r["query_id"]))
        union_probe = sorted(set().union(*probe_sets))
        cent_to_q: dict[int, list[int]] = {}
        for qi, s in enumerate(probe_sets):
            for c in s:
                cent_to_q.setdefault(c, []).append(qi)
        b_state = spark.sparkContext.broadcast(
            (qids, np.stack(luts), cent_to_q)
        )

        def kernel(batches):
            import pandas as pd

            b_qids, b_luts, b_map = b_state.value
            for pdf in batches:
                outs = []
                for cid, grp in pdf.groupby("centroid_id"):
                    qidx = b_map.get(int(cid))
                    if not qidx:
                        continue
                    codes = np.array(list(grp["codes"]), dtype=np.int64)
                    rows = np.arange(codes.shape[1])
                    for qi in qidx:
                        dists = b_luts[qi][rows, codes].sum(axis=1)
                        outs.append(
                            pd.DataFrame(
                                {
                                    "query_id": b_qids[qi],
                                    "vec_id": grp["vec_id"].to_numpy(),
                                    "approx_dist": dists,
                                }
                            )
                        )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        codes = spark.read.parquet(self._codes_path(spark)).filter(
            F.col("centroid_id").isin(union_probe)
        )
        if where is not None:
            codes = codes.filter(where)
        tombs = self._tombs.frame(spark)
        if tombs is not None:
            codes = codes.join(F.broadcast(tombs), "vec_id", "anti")
        scored = codes.select("vec_id", "centroid_id", "codes").mapInPandas(
            kernel, schema="query_id long, vec_id long, approx_dist double"
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col("approx_dist").asc(), F.col("vec_id")
        )
        pool_k = max(k, rerank) if rerank else k
        approx = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= pool_k)
            .drop("__rn")
        )
        if not rerank:
            return approx
        if vectors is None:
            raise ValueError(
                "IvfPqIndex.probe_batch: rerank > 0 needs the raw-vector "
                "table via vectors= (the index stores codes only)"
            )
        cand = approx.select("query_id", "vec_id")
        fetched = vectors.select(
            F.col(rerank_id_col).alias("vec_id"),
            to_double_array(F.col(vec_col)).alias("__v"),
        ).join(
            F.broadcast(cand.select("vec_id").distinct()), "vec_id", "semi"
        )
        qvecs = queries.select(
            F.col("query_id"),
            to_double_array(F.col("embedding")).alias("__q"),
        )
        exact = (
            cand.join(fetched, "vec_id")
            .join(F.broadcast(qvecs), "query_id")
            .select(
                "query_id",
                "vec_id",
                F.aggregate(
                    F.zip_with(
                        F.col("__v"), F.col("__q"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("exact_dist"),
            )
        )
        w2 = Window.partitionBy("query_id").orderBy(
            F.col("exact_dist").asc(), F.col("vec_id")
        )
        return (
            exact.withColumn("__rn", F.row_number().over(w2))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )

    # ---- maintenance ----

    def stats(self, spark) -> dict:
        codes = spark.read.parquet(self._codes_path(spark))
        return {
            "generation": self._gens.current_gen(spark),
            "n_vectors": codes.count(),
            "n_partitions": codes.select("centroid_id").distinct().count(),
            "n_tombstones": self._tombs.count(spark),
            "n_files": len(codes.inputFiles()),
        }

    def compact(self, spark, target_files: int | None = None) -> None:
        """Physically drop tombstoned codes and merge append fragments
        into generation G+1 via the shared crash-safe swap."""
        self._check_params(spark)
        live = spark.read.parquet(self._codes_path(spark))
        tombs = self._tombs.frame(spark)
        if tombs is not None:
            live = live.join(F.broadcast(tombs), "vec_id", "anti")
        nxt = self._gens.current_gen(spark) + 1
        live.repartition("centroid_id").write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(f"{self.path}/codes/gen={nxt}")
        self._gens.commit(spark, nxt)
        self._gens.gc_below(spark, keep=nxt)
        self._tombs.clear(spark)


def pq_encode_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
) -> DataFrame:
    """Arrow-batched numpy twin of :func:`pq_encode` in WIDE form
    (id, codes array<long>): one (B × K) distance matrix per subspace
    per batch instead of per-row HOF aggregates — measured ~an order of
    magnitude faster at encode time, with BIT-IDENTICAL codes: the
    squared-distance sum is accumulated ELEMENT-BY-ELEMENT (a (B × K)
    add per subvector element), i.e. the same left-to-right IEEE fold
    as the SQL expression — numpy's default ``sum`` uses an unrolled
    pairwise reduction whose rounding can differ near a tie, so it is
    deliberately not used here (ADVICE r5); argmin ties resolve to the
    smallest code both ways — parity-tested. :func:`pq_encode` remains
    the oracle-exact long form; this is the throughput path
    :class:`IvfPqIndex` builds with."""
    import numpy as np

    spark = df.sparkSession
    sub_len = len(codebooks[0][0][1])
    m_subs = len(codebooks)
    mats = [
        np.asarray(
            [cw for _, cw in sorted(book)], dtype=np.float64
        )
        for book in codebooks
    ]
    b_mats = spark.sparkContext.broadcast(mats)

    def kernel(batches):
        import pandas as pd

        books = b_mats.value
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((mat.shape[0], m_subs), dtype=np.int64)
            for m in range(m_subs):
                sub = mat[:, m * sub_len:(m + 1) * sub_len]
                # sequential left-to-right fold — see docstring
                d2 = np.zeros((sub.shape[0], books[m].shape[0]))
                for j in range(sub_len):
                    diff = sub[:, j, None] - books[m][None, :, j]
                    d2 += diff * diff
                codes[:, m] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel, schema=f"{id_col} long, codes array<long>"
    )


def pq_encode_np_long(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
) -> DataFrame:
    """Arrow-batched numpy twin of :func:`pq_encode` in the SAME long
    form (id, subspace, code, dist) — r13 optimization round: the
    expression path plants M×K inline ``_sq_l2`` higher-order-function
    aggregates per row, which Catalyst cannot codegen (HOFs are
    interpreted) and whose plan alone takes seconds to build; this
    kernel computes the identical distances as (B × K) numpy ops per
    subspace per batch.

    BIT-IDENTICAL to :func:`pq_encode` (guide §4.2 with the §1 "do not
    change what the query computes" constraint): the squared-distance
    sum is accumulated ELEMENT-BY-ELEMENT (``d2 += diff*diff`` per
    subvector element), the exact left-to-right IEEE fold ``_sq_l2``
    evaluates — numpy's pairwise ``sum`` is deliberately not used —
    and ``argmin`` over code-sorted rows resolves ties to the smallest
    code exactly like the expression path's struct-min
    (parity-tested in tests/test_similarity.py)."""
    import numpy as np

    spark = df.sparkSession
    sub_len = len(codebooks[0][0][1])
    m_subs = len(codebooks)
    mats = [
        np.asarray([cw for _, cw in sorted(book)], dtype=np.float64)
        for book in codebooks
    ]
    b_mats = spark.sparkContext.broadcast(mats)

    def kernel(batches):
        import pandas as pd

        books = b_mats.value
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            n = mat.shape[0]
            ids = np.repeat(np.asarray(pdf[id_col], dtype=np.int64), m_subs)
            subspace = np.tile(np.arange(m_subs, dtype=np.int64), n)
            codes = np.empty((n, m_subs), dtype=np.int64)
            dists = np.empty((n, m_subs), dtype=np.float64)
            for m in range(m_subs):
                sub = mat[:, m * sub_len:(m + 1) * sub_len]
                # sequential left-to-right fold — see pq_encode_np
                d2 = np.zeros((n, books[m].shape[0]))
                for j in range(sub_len):
                    diff = sub[:, j, None] - books[m][None, :, j]
                    d2 += diff * diff
                best = d2.argmin(axis=1)
                codes[:, m] = best
                dists[:, m] = d2[np.arange(n), best]
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "subspace": subspace,
                    "code": codes.reshape(-1),
                    "dist": dists.reshape(-1),
                }
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        kernel,
        schema=f"{id_col} long, subspace long, code long, dist double",
    )


def mmr_rerank(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    score_col: str,
    *,
    k: int = 10,
    lam: float = 0.5,
    max_candidates: int = 512,
) -> "list":
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998):
    greedily pick the candidate maximizing
    ``lam·relevance − (1−lam)·max_cosine_to_already_selected`` — the
    diversity stage every retrieval stack runs AFTER top-N (a near-dup
    cluster in the candidates otherwise fills the whole result page;
    with near-dup corpora that is the common case, which is why this
    sits next to the dedup family).

    By contract this consumes a top-N probe result (brute-force,
    IVF/IVF-PQ, BM25+RRF), so the candidate set is small and BOUNDED:
    the collect is `_collect_bounded` (≤ ``max_candidates``, contract
    error beyond) and the greedy loop is O(k·N·d) on the driver — the
    same boundedness argument as the probe's own top-N collect.
    Deterministic: ties break to the smaller id.

    Arithmetic is PORTABLE-SEQUENTIAL since r9 (pure-Python IEEE
    doubles, left-to-right accumulation — no BLAS): every norm, dot
    and score is then a fixed sequence of correctly-rounded ops a SQL
    engine replays bit-for-bit, which is what upgraded the
    ``mmr_diverse_topk`` entry from rows-only to a full recursive-CTE
    DuckDB oracle. At N ≤ 512, d = 64 the O(k·N·d) loop is
    microseconds; the numpy path saved nothing.

    Returns the selected rows as (id, score, mmr_score) tuples,
    best-first."""
    import math

    rows = _collect_bounded(
        candidates.select(id_col, vec_col, score_col),
        max_candidates,
        "MMR candidates",
        "MMR is a rerank stage — feed it a bounded top-N probe result, "
        "not a corpus",
    )
    if not rows:
        return []
    rows = sorted(rows, key=lambda r: r[id_col])  # collect order is not
    # deterministic across partitions; id order makes tie-breaks pure
    ids = [r[id_col] for r in rows]
    rel = [float(r[score_col]) for r in rows]
    X = [[float(x) for x in r[vec_col]] for r in rows]

    def _sqsum(v: list) -> float:
        s = 0.0
        for x in v:
            s += x * x
        return s

    def _dot(a: list, b: list) -> float:
        s = 0.0
        for t in range(len(a)):
            s += a[t] * b[t]
        return s

    Xn = []
    for v in X:
        n = math.sqrt(_sqsum(v))
        if n == 0:
            n = 1.0
        Xn.append([x / n for x in v])
    selected: list[int] = []
    remaining = set(range(len(ids)))
    out = []
    one_minus_lam = 1.0 - lam
    while remaining and len(out) < k:
        best_i, best_val = None, None
        for i in sorted(remaining):  # sorted -> deterministic tie-break
            penalty = (
                max(_dot(Xn[i], Xn[j]) for j in selected)
                if selected
                else 0.0
            )
            val = lam * rel[i] - one_minus_lam * penalty
            if best_val is None or val > best_val:
                best_i, best_val = i, val
        selected.append(best_i)
        remaining.remove(best_i)
        out.append((ids[best_i], rel[best_i], best_val))
    return out


def embedding_covariance(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    quant_bits: int = 20,
) -> DataFrame:
    """The d×d sample covariance matrix of an embedding column,
    ENGINE-EXACT: coordinates are first quantized to integers —
    ``floor(x · 2^quant_bits)`` — and every Σx_i, Σx_i·x_j then
    accumulates as an exact integer decimal, so the result is a pure
    function of the data. The statistic whitening, PCA and drift
    monitors start from.

    Why quantize: a double→DECIMAL(p,s) cast is NOT engine-portable
    (DuckDB rounds through a double multiply, Spark rounds the exact
    decimal expansion — they disagree beyond the ~12th digit, measured
    on this very table), but multiplying by a POWER OF TWO is exact in
    IEEE arithmetic and floor is unambiguous, so the quantized grid is
    bit-identical everywhere. The 2^-20 grid perturbs a unit-scale
    covariance at ~1e-12 (quantization variance (2^-20)²/12) — far
    below estimation noise, and the tests pin the numpy agreement.

    Shape (r13-opt, guide §4.2): an Arrow-batched numpy INT64 Gram
    kernel computes per-batch partials — ``XᵀX``, column sums and the
    row count, all EXACT integers on the quantized grid (values
    < 2^21, per-batch products Σ < 10^4·2^42 ≈ 2^55 — inside int64) —
    so the (i, j)-keyed aggregation that follows sums d(d+1)/2 partial
    rows PER BATCH instead of exploding d(d+1)/2 interpreted-HOF
    struct terms PER ROW (the former shape; at d=64 that was a 2080×
    row blowup through `CodegenFallback` transforms). Because every
    sum is integer-exact, summation order cannot matter and the result
    is BIT-IDENTICAL to the expression form — which is what lets the
    DuckDB oracle keep pinning it. The final cross-batch accumulation
    runs in DECIMAL (unbounded row count; ANSI-safe), and covariance
    leaves the exact sums with double arithmetic only at the very end.
    Mirrored into full-matrix output (cov(j,i) = cov(i,j)).

    Returns (i, j, cov) for all d² positions."""
    import numpy as np
    import pandas as pd

    scale = float(2**quant_bits)
    quant = F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.floor(x * F.lit(scale)).cast("long"),
    )

    def gram(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["__q"].to_numpy()).astype(np.int64)
            iu, ju = np.triu_indices(X.shape[1])
            s = X.sum(axis=0)
            G = X.T @ X
            yield pd.DataFrame(
                {
                    "i": iu.astype(np.int32),
                    "j": ju.astype(np.int32),
                    "pn": np.int64(X.shape[0]),
                    "psa": s[iu],
                    "psb": s[ju],
                    "psab": G[iu, ju],
                }
            )

    partials = emb.select(quant.alias("__q")).mapInPandas(
        gram, schema="i int, j int, pn long, psa long, psb long, psab long"
    )
    upper = partials.groupBy("i", "j").agg(
        F.sum("pn").cast("long").alias("n"),
        F.sum(F.col("psa").cast("decimal(18,0)")).alias("sa"),
        F.sum(F.col("psb").cast("decimal(18,0)")).alias("sb"),
        F.sum(F.col("psab").cast("decimal(18,0)")).alias("sab"),
    )
    nn = F.col("n").cast("double")
    cov = (
        (
            F.col("sab").cast("double")
            - F.col("sa").cast("double")
            * F.col("sb").cast("double")
            / nn
        )
        / (nn - F.lit(1.0))
    ) / F.lit(scale * scale)
    tri = upper.select("i", "j", cov.alias("cov"))
    lower = tri.filter(F.col("i") != F.col("j")).select(
        F.col("j").alias("i"), F.col("i").alias("j"), "cov"
    )
    return tri.unionByName(lower)


def whiten_embeddings(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA-whitening transform: x ↦ V·Λ^(−1/2)·Vᵀ·(x − μ) from the
    eigendecomposition of the EXACT covariance
    (:func:`embedding_covariance`) — after it, features are
    decorrelated with unit variance (anchored by the test that the
    exact covariance of the OUTPUT is the identity). The standard
    conditioning step before PQ/IVF training and linear probes.

    The d×d covariance and d-mean are driver-side by contract
    (:func:`_collect_bounded`, d ≤ 1024); the rotation is a numpy
    eigendecomposition (symmetric eigh — deterministic for a fixed
    LAPACK build); the transform ships W and μ to executors inside an
    Arrow ``mapInPandas`` kernel — one scan, no shuffle, no per-row
    Python. ``eps`` floors the eigenvalues so near-null directions
    don't explode."""
    import numpy as np
    import pandas as pd

    d = len(
        emb.select(F.col(vec_col)).limit(1).collect()[0][0]
    )
    if d > 1024:
        raise ValueError(
            "whiten_embeddings: dimension > 1024 — the d x d covariance "
            "no longer fits the driver-side contract"
        )
    cov_rows = _collect_bounded(
        embedding_covariance(emb, vec_col, id_col),
        1024 * 1024,
        "whiten_embeddings covariance",
        "reduce the dimension or whiten on a sample",
    )
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r["i"], r["j"]] = r["cov"]
    mu_rows = _collect_bounded(
        emb.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                "__i", "__x"
            )
        )
        .groupBy("__i")
        .agg(
            (
                F.sum(F.col("__x").cast("decimal(18,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("m")
        ),
        1024,
        "whiten_embeddings mean",
        "reduce the dimension",
    )
    mu = np.zeros(d)
    for r in mu_rows:
        mu[r["__i"]] = r["m"]
    evals, evecs = np.linalg.eigh(cov)
    w = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, eps))) @ evecs.T

    out_schema = f"{id_col} long, whitened array<double>"

    def gen(batches):
        for pdf in batches:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            y = (x - mu) @ w.T
            yield pd.DataFrame(
                {id_col: pdf[id_col], "whitened": list(y)}
            )

    return emb.select(id_col, vec_col).mapInPandas(gen, schema=out_schema)


def group_centroid_drift(
    emb: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    *,
    quant_bits: int = 20,
) -> DataFrame:
    """Per-group embedding drift: cosine similarity between each
    group's mean vector and the GLOBAL mean vector — the "is this
    source/label semantically off-center" diagnostic run before
    mixture reweighting.

    Engine-exactness reuses both established tricks: coordinates
    quantize to the IEEE-exact floor(x·2^quant_bits) integer grid
    (:func:`embedding_covariance`'s portability fix), so per-dim sums
    are exact and the mean is one identical double division; and the
    cross-dim cosine sums fold in DIMENSION ORDER via zip_with +
    aggregate — the same left-to-right fold DuckDB's list_aggregate
    runs, so the whole statistic hash-checks (the
    `similarity_topk`/pq_encode_np precedent).

    One posexplode aggregation keyed by (group, dim) — O(groups·d)
    output — then array folds on the tiny summary. Returns
    (group, n_vecs, cosine_to_global), NULL cosine for zero-norm
    sides."""
    scale = float(2**quant_bits)
    pos = emb.select(
        F.col(group_col).alias("__g"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "__i", "__x"
        ),
    ).select(
        "__g",
        "__i",
        F.floor(F.col("__x") * F.lit(scale))
        .cast("decimal(18,0)")
        .alias("__q"),
    )
    per = pos.groupBy("__g", "__i").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__q").alias("__s"),
    )
    mean_arr = (
        per.withColumn(
            "__m",
            F.col("__s").cast("double") / F.col("__n").cast("double"),
        )
        .groupBy("__g")
        .agg(
            F.max("__n").alias("n_vecs"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("__i", "__m"))),
                lambda s: s["__m"],
            ).alias("__vec"),
        )
    )
    glob = pos.groupBy("__i").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__q").alias("__s"),
    )
    glob_arr = glob.withColumn(
        "__m", F.col("__s").cast("double") / F.col("__n").cast("double")
    ).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("__i", "__m"))),
            lambda s: s["__m"],
        ).alias("__gvec")
    )
    joined = mean_arr.crossJoin(F.broadcast(glob_arr))
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    dot = fold(
        F.zip_with("__vec", "__gvec", lambda a, b: a * b)
    )
    na = fold(F.transform("__vec", lambda a: a * a))
    nb = fold(F.transform("__gvec", lambda b: b * b))
    return joined.select(
        F.col("__g").alias(group_col),
        "n_vecs",
        F.when(
            (na > 0) & (nb > 0), dot / (F.sqrt(na) * F.sqrt(nb))
        ).alias("cosine_to_global"),
    )


def cluster_quality_db(
    df: DataFrame,
    vec_col: str,
    centroids: list[tuple[int, list[float]]],
    *,
    quant_bits: int = 20,
) -> DataFrame:
    """Davies-Bouldin cluster-quality report over a fixed-centroid
    assignment (Davies & Bouldin 1979): per cluster i, the scatter S_i
    (mean member→cluster-mean Euclidean distance) and the DB term
    max_{j≠i} (S_i + S_j)/M_ij with M_ij the cluster-mean distance —
    low terms = tight, well-separated clusters; the mean of the terms
    is the classic single-number index. This is the clustering
    validity audit run after IVF/k-means partitioning (is k right, is
    a cluster absorbing everything).

    Engine-exactness composes the three established tricks:
    assignment is :func:`assign_fixed_centroids` (exact argmax
    expression); cluster means come from floor(x·2^quant_bits)
    quantized-integer per-dim sums (embedding_covariance); every
    cross-dim distance folds in DIMENSION ORDER (zip_with +
    aggregate, the list_aggregate-parity precedent); and per-member
    distances re-quantize before the scatter mean so the member sum is
    partition-order-proof. The whole report hash-checks.

    Shape: one assignment scan, one (cluster, dim) aggregation
    (O(k·d) rows), one broadcast join back for member distances, one
    O(k²) centroid-pair rollup. Returns (cluster_id, n_vectors,
    scatter, db_term), cluster-ascending semantics-free order.
    Clusters with a zero inter-mean distance to some other cluster
    (identical means) get a NULL db_term."""
    scale = float(2**quant_bits)
    assigned = assign_fixed_centroids(df, vec_col, centroids)
    vec = to_double_array(F.col(vec_col))
    pos = assigned.select(
        "cluster_id",
        F.posexplode(vec).alias("__i", "__x"),
    ).select(
        "cluster_id",
        "__i",
        F.floor(F.col("__x") * F.lit(scale))
        .cast("decimal(18,0)")
        .alias("__q"),
    )
    per = pos.groupBy("cluster_id", "__i").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__q").alias("__s"),
    )
    means = (
        per.withColumn(
            "__m",
            F.col("__s").cast("double")
            / F.col("__n").cast("double")
            / F.lit(scale),
        )
        .groupBy("cluster_id")
        .agg(
            F.max("__n").alias("n_vectors"),
            F.transform(
                F.sort_array(F.collect_list(F.struct("__i", "__m"))),
                lambda s: s["__m"],
            ).alias("__mean"),
        )
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    with_mean = assigned.join(F.broadcast(means), "cluster_id")
    d2 = fold(
        F.zip_with(vec, F.col("__mean"), lambda x, m: (x - m) * (x - m))
    )
    dist_q = F.floor(F.sqrt(d2) * F.lit(scale)).cast("decimal(18,0)")
    scatter = (
        with_mean.select("cluster_id", dist_q.alias("__dq"))
        .groupBy("cluster_id")
        .agg(F.sum("__dq").alias("__sd"), F.count(F.lit(1)).alias("__c"))
        .select(
            "cluster_id",
            (
                F.col("__sd").cast("double")
                / F.col("__c").cast("double")
                / F.lit(scale)
            ).alias("__scat"),
        )
    )
    summary = means.join(scatter, "cluster_id").select(
        "cluster_id", "n_vectors", "__mean", "__scat"
    )
    a = summary.select(
        F.col("cluster_id").alias("__ci"),
        F.col("n_vectors").alias("__na"),
        F.col("__mean").alias("__ma"),
        F.col("__scat").alias("__sa"),
    )
    b = summary.select(
        F.col("cluster_id").alias("__cj"),
        F.col("__mean").alias("__mb"),
        F.col("__scat").alias("__sb"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("__ci") != F.col("__cj")
    ).select(
        "__ci",
        "__na",
        "__sa",
        "__sb",
        F.sqrt(
            fold(
                F.zip_with(
                    "__ma", "__mb", lambda x, y: (x - y) * (x - y)
                )
            )
        ).alias("__mij"),
    )
    ratio = F.when(
        F.col("__mij") > 0,
        (F.col("__sa") + F.col("__sb")) / F.col("__mij"),
    )
    return (
        pairs.groupBy("__ci", "__na", "__sa")
        .agg(
            F.max(ratio).alias("__term"),
            F.max(ratio.isNull().cast("int")).alias("__degenerate"),
        )
        .select(
            F.col("__ci").alias("cluster_id"),
            F.col("__na").cast("long").alias("n_vectors"),
            F.col("__sa").alias("scatter"),
            F.when(
                F.col("__degenerate") == 0, F.col("__term")
            ).alias("db_term"),
        )
    )
