"""Similarity search over embedding columns (array<float>).

Two tiers, per the standard ANN playbook:

- :func:`cosine_topk` — exact brute force: broadcast the (small) query
  set, score every corpus vector, rank per query. The correctness
  baseline; linear in corpus size, embarrassingly parallel, no
  shuffle until the final per-query top-k window.
- :func:`lsh_bucketed_topk` — random-hyperplane LSH: both sides get a
  b-bit sign signature from fixed seeded hyperplanes; candidates are
  corpus vectors sharing a signature (or a 1-bit-flipped probe) with
  the query; exact cosine re-ranks candidates. Sub-linear candidate
  sets; the 100 TB path (bucket join instead of cross product).

Dot products run as Catalyst higher-order functions (zip_with +
aggregate) — JVM-side, no Python. Cosine values are rounded to 6
decimals BEFORE ranking: accumulation order may differ by a few ulps
between engines/plans, and ranking on the rounded value (with vec_id
tie-break) makes results deterministic and oracle-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ROUND_DIGITS = 6


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold — same order every time."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector (self excluded).

    ``queries`` must be small (it is broadcast); corpus scan stays
    partition-parallel with no shuffle until the top-k window, which
    partitions by query id.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), ROUND_DIGITS))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors via a VECTORIZED pandas kernel — the
    Arrow/numpy scale path of :func:`cosine_topk` with identical
    results.

    Per Arrow batch, one float64 matrix-matrix product scores every
    (corpus row × query) pair at BLAS speed instead of one
    ``F.aggregate`` fold per pair — at wide dims and many queries this
    is the faster physical strategy, which is exactly when you'd pick
    it. The query matrix rides into the workers as a closure (it is
    small by contract); rounding happens Spark-side with ``F.round``
    so HALF_UP semantics stay identical to the built-in path and the
    shared oracle.
    """
    import numpy as np
    import pandas as pd

    # The small-query-set contract, enforced: collecting an unbounded
    # DataFrame to the driver is the classic OOM at corpus scale, so
    # fail loudly instead of silently degrading.
    max_queries = 100_000
    qrows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"cosine_topk_pandas broadcasts the query set to every task; "
            f"got more than {max_queries} query rows — partition the "
            f"queries or use lsh_bucketed_topk/ivf_topk instead"
        )
    q_ids = [int(r[0]) for r in qrows]
    qm = np.array([list(r[1]) for r in qrows], dtype="float64")
    q_norm = np.sqrt((qm * qm).sum(axis=1))

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.array(pdf[vec_col].tolist(), dtype="float64")
            c_norm = np.sqrt((cm * cm).sum(axis=1))
            cos = (cm @ qm.T) / np.outer(c_norm, q_norm)
            n, nq = cos.shape
            yield pd.DataFrame(
                {
                    query_id_col: np.tile(q_ids, n),
                    id_col: np.repeat(pdf[id_col].to_numpy(), nq),
                    "raw_cos": cos.ravel(),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} long, {id_col} long, raw_cos double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cos", F.round(F.col("raw_cos"), ROUND_DIGITS))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def hyperplane_signature(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """b-bit sign signature: bit i set where dot(vec, H_i) >= 0."""
    sig = F.lit(0).cast("bigint")
    for i, h in enumerate(hyperplanes):
        d = dot(vec, F.array(*[F.lit(float(x)) for x in h]))
        sig = sig + F.when(d >= 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    hyperplanes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket,
    exact cosine re-ranks. Recall/cost is tuned by the number of
    hyperplanes (fewer bits → bigger buckets → higher recall+cost).

    The corpus side is scanned once and shuffled on the signature —
    at scale, write the corpus bucketed by signature to skip even
    that.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        _as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("sig", hyperplane_signature(F.col("q_vec"), hyperplanes))
    c = corpus.select(F.col(id_col), _as_double(F.col(vec_col)).alias("c_vec")).withColumn(
        "sig", hyperplane_signature(F.col("c_vec"), hyperplanes)
    )
    cand = (
        c.join(F.broadcast(q), "sig")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("c_vec")), ROUND_DIGITS))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold: float,
    block_col: str | None = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS: all (a, b) with
    ``cos(a,b) ≥ threshold`` — the semantic-dedup primitive.

    ``block_col`` is the blocking key that keeps the self-join keyed
    (shuffle on the block, pairs only within it). At 100 TB blocking is
    mandatory — use a cluster id (IVF centroid), LSH signature, or any
    domain key; ``block_col=None`` degenerates to the exact cross
    product and is for small corpora/tests only.
    """
    a_cols = [F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")]
    b_cols = [F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")]
    if block_col is not None:
        a = emb.select(F.col(block_col), *a_cols)
        b = emb.select(F.col(block_col), *b_cols)
        pairs = a.join(b, block_col)
    else:
        pairs = emb.select(*a_cols).crossJoin(emb.select(*b_cols))
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), ROUND_DIGITS))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_fraction: float = 1.0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: K-Means coarse quantizer,
    probe the ``nprobe`` nearest centroid cells per query, exact cosine
    re-rank inside the probed cells.

    The scale path complementing LSH buckets: corpus vectors are
    L2-normalized (Euclidean K-Means then orders like cosine) and
    assigned to a centroid ONCE — at 100 TB the assignment is a write-
    time partition/bucket key, so a query touches only
    ``nprobe / n_centroids`` of the corpus. ``train_fraction`` < 1
    fits the quantizer on a DETERMINISTIC md5-hash sample (no RNG
    state, stable across reruns/partitionings) — a coarse quantizer
    needs only enough vectors to place centroids, so at corpus scale
    train on e.g. 1e-4 of the data; every vector is still assigned.
    Recall improves with ``nprobe`` (= n_centroids ⇒ exact).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    def normalize(col: Column) -> Column:
        n = l2_norm(col)
        return F.transform(col, lambda x: x / n)

    c_norm = corpus.select(
        F.col(id_col), normalize(_as_double(F.col(vec_col))).alias("c_vec")
    )
    train_src = c_norm
    if train_fraction < 1.0:
        bucket = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
            .cast("long")
        )
        train_src = c_norm.filter(bucket < F.lit(int(train_fraction * 65536)))
    train = train_src.select(array_to_vector("c_vec").alias("features"))
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(train)

    centroids = [
        [float(x) for x in c] for c in (list(v) for v in model.clusterCenters())
    ]
    cent_df = F.broadcast(
        corpus.sparkSession.createDataFrame(
            [(i, c) for i, c in enumerate(centroids)], ["cell", "cent"]
        )
    )

    assigned = model.transform(
        c_norm.withColumn("features", array_to_vector("c_vec"))
    ).select(F.col(id_col), "c_vec", F.col("prediction").alias("cell"))

    q_norm = queries.select(
        F.col(id_col).alias(query_id_col),
        normalize(_as_double(F.col(vec_col))).alias("q_vec"),
    )
    q_cells = (
        q_norm.crossJoin(cent_df)
        .withColumn("cdist", dot(F.col("q_vec"), F.col("cent")))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.col("cdist").desc(), F.col("cell").asc()
                )
            ),
        )
        .filter(F.col("crank") <= nprobe)
        .select(query_id_col, "q_vec", "cell")
    )

    cand = (
        assigned.join(F.broadcast(q_cells), "cell")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("cos", F.round(dot(F.col("q_vec"), F.col("c_vec")), ROUND_DIGITS))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_subspaces: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    train_fraction: float = 1.0,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (ADC) — the memory-bound third tier beside LSH buckets and IVF
    cells: each corpus vector compresses to ``n_subspaces`` byte-sized
    codes (64-dim float -> 8 bytes at the defaults, a 32x reduction),
    and query scoring reads ONLY the codes.

    Pipeline:

    - split dimensions into ``n_subspaces`` contiguous sub-vectors and
      fit one ``n_codes``-centroid K-Means codebook per subspace
      (seeded per subspace; ``train_fraction`` < 1 fits on the same
      deterministic md5 sample rule as :func:`ivf_topk`);
    - ENCODE map-side: each vector's code per subspace is the argmin
      distance against the broadcast literal codebook — pure
      expressions, no shuffle, no Python (this is the write-once step:
      at 100 TB the codes persist as a bytes column and the floats
      never need re-reading);
    - SCORE map-side (ADC): per query, the partial dot product of
      every (subspace, code) pair is precomputed into a lookup table;
      a corpus vector's approximate score is then ``n_subspaces``
      array lookups — no float vector access;
    - top ``refine * k`` candidates per query by ADC score, then exact
      cosine re-rank of that bounded set to ``k`` (same rounding +
      tie-break discipline as the exact path).

    Approximate by design (quantization error), so no SQL oracle:
    recall vs :func:`cosine_topk` is asserted in
    tests/test_dedup_similarity.py, and the driver records a rows-only
    check. Output schema matches the other ANN tiers:
    (query_id, vec_id, cos, rank).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    def normalize(col: Column) -> Column:
        n = l2_norm(col)
        return F.transform(col, lambda x: x / n)

    dim = len(corpus.select(vec_col).first()[0])
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces

    c_norm = corpus.select(
        F.col(id_col), normalize(_as_double(F.col(vec_col))).alias("c_vec")
    )
    train_src = c_norm
    if train_fraction < 1.0:
        bucket = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
            .cast("long")
        )
        train_src = c_norm.filter(bucket < F.lit(int(train_fraction * 65536)))
    # one codebook per subspace: centers as plain Python lists so the
    # encode/score steps below are literal expressions (broadcast by
    # construction, nothing to join)
    codebooks: list[list[list[float]]] = []
    for s in range(n_subspaces):
        train = train_src.select(
            array_to_vector(
                F.slice("c_vec", s * sub + 1, sub)
            ).alias("features")
        )
        model = KMeans(k=n_codes, seed=seed + s, featuresCol="features").fit(train)
        codebooks.append(
            [[float(x) for x in c] for c in (list(v) for v in model.clusterCenters())]
        )

    def lit_arr(vals: list[float]) -> Column:
        return F.array(*[F.lit(v) for v in vals])

    def sub_dot(sub_col: Column, cent: list[float]) -> Column:
        return dot(sub_col, lit_arr(cent))

    def encode_code(vec: Column, s: int) -> Column:
        """argmin_c ||x_s - cent||^2 == argmax_c (x_s . cent - |cent|^2/2);
        first-max (lowest code) tie-break via array_position."""
        sub_col = F.slice(vec, s * sub + 1, sub)
        scores = F.array(
            *[
                sub_dot(sub_col, cent) - F.lit(sum(x * x for x in cent) / 2.0)
                for cent in codebooks[s]
            ]
        )
        return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")

    encoded = c_norm.select(
        id_col,
        "c_vec",
        F.array(*[encode_code(F.col("c_vec"), s) for s in range(n_subspaces)]).alias(
            "codes"
        ),
    )

    q_norm = queries.select(
        F.col(id_col).alias(query_id_col),
        normalize(_as_double(F.col(vec_col))).alias("q_vec"),
    )
    # ADC lookup table: lut[s][c] = q_s . codebook[s][c]
    lut = F.array(
        *[
            F.array(
                *[
                    sub_dot(F.slice("q_vec", s * sub + 1, sub), cent)
                    for cent in codebooks[s]
                ]
            )
            for s in range(n_subspaces)
        ]
    )
    q_tab = q_norm.select(query_id_col, "q_vec", lut.alias("lut"))

    cand = (
        encoded.crossJoin(F.broadcast(q_tab))
        .filter(F.col(id_col) != F.col(query_id_col))
        # codes are 0-based; [] indexing on arrays is 0-based in Spark SQL
        .withColumn(
            "adc",
            F.expr(
                "aggregate(zip_with(codes, lut, (c, t) -> t[c]), 0D, (acc, x) -> acc + x)"
            ),
        )
    )
    w_adc = Window.partitionBy(query_id_col).orderBy(
        F.col("adc").desc(), F.col(id_col).asc()
    )
    refined = (
        cand.withColumn("arank", F.row_number().over(w_adc))
        .filter(F.col("arank") <= refine * k)
        .withColumn("cos", F.round(dot(F.col("q_vec"), F.col("c_vec")), ROUND_DIGITS))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        refined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", "rank")
    )


def nearest_neighbor_within_group(
    emb: DataFrame,
    group_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Each vector's single nearest neighbor within its group — the
    embedding-cosine near-dup primitive (group = blocking key). The
    self-join shuffles both sides on the group column only."""
    a = emb.select(
        F.col(group_col), F.col(id_col).alias("id_a"), _as_double(F.col(vec_col)).alias("va")
    )
    b = emb.select(
        F.col(group_col), F.col(id_col).alias("id_b"), _as_double(F.col(vec_col)).alias("vb")
    )
    pairs = (
        a.join(b, group_col)
        .filter(F.col("id_a") != F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), ROUND_DIGITS))
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cos").desc(), F.col("id_b").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(F.col(group_col), F.col("id_a"), F.col("id_b").alias("nn_id"), F.col("cos").alias("nn_cos"))
    )
