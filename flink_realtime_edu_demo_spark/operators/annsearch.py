"""Similarity search over embedding columns (SURVEY.md §2.11).

- cosine_topk: brute-force exact top-k — crossJoin of a *small* query
  set against the corpus; the dot product is a JVM-side higher-order
  fold (zip_with + aggregate), no Python in the loop. Correct baseline;
  O(|Q|·N) — only for bounded |Q|.
- lsh_topk: the scale path — multi-table random-hyperplane (SimHash)
  bucketing: sign-bit sketch of each vector against FIXED pseudo-random
  hyperplanes (deterministic, seed-free: hyperplane component h_{p,d}
  is a hash of (p,d) mapped to ±1), L independent tables of m planes,
  candidates = same-bucket pairs in any table, exact cosine re-rank
  over the union. At 100 TB: buckets shard the corpus; each table is a
  narrow equi-join touching ~N/2^m rows per bucket.
- cosine_pairs_blocked: exact all-pairs above a threshold as a
  distributed block-matrix self-join (no driver materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).
    Returns (vec_id, neighbor_id, rank, cosine)."""
    # Norms are computed once per vector, not per pair — at N corpus
    # rows × Q queries that's N+Q norm folds instead of N·Q.
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
        _norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("q_id") != F.col("c_id"))
        .select(
            "q_id",
            "c_id",
            (_dot(F.col("q_vec"), F.col("c_vec"))
             / (F.col("q_norm") * F.col("c_norm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("q_id").alias(id_col),
            F.col("c_id").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def cosine_pairs_blocked(df: DataFrame, threshold: float,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         n_blocks: int = 8,
                         max_vectors: int | None = 2_000_000) -> DataFrame:
    """Exact all-pairs cosine >= threshold, fully distributed (no driver
    materialization — replaces a round-1 collect-to-driver GEMM).

    Block-matrix self-join: rows hash into ``n_blocks`` blocks; every
    unordered block pair (i ≤ j) becomes one task holding block i as the
    A side and block j as the B side, scored with a vectorized numpy
    loop inside ``applyInPandas``. Each row is replicated to the
    ~n_blocks block pairs it participates in, the textbook shuffle cost
    of exact all-pairs; per-task memory is 2N/n_blocks vectors, so at
    100 TB you raise n_blocks until a block (~N/n_blocks × dim × 8 B)
    fits an executor — compute stays the unavoidable O(N²·d) but no
    single node ever holds the corpus.

    Exactness contract (drives DuckDB-oracle hash parity): the dot and
    the squared norms accumulate in ascending-dimension order, seeded
    0.0 — bit-identical to a SQL engine's left-fold list_reduce over
    float64 (0.0 + x₁ == x₁ exactly) — and cosine is dot/(‖a‖·‖b‖) on
    RAW vectors, the same operation order as the oracle, not a
    pre-normalized GEMM (which differs in the last ulp). Zero-norm
    vectors are excluded (cosine undefined) rather than emitted as NaN.

    Returns (id_a, id_b, cosine) with id_a < id_b, each pair exactly once.

    ``max_vectors`` is a plan-time scale gate (round 8, the
    operators/graph.py precedent): exact all-pairs is inherently
    O(N²·d) compute no matter how it is blocked — SOAK_x100 recorded a
    disk-filling shuffle spill at 2M vectors — so above the gate the
    call raises and points at the sub-quadratic deployment forms
    (semantic_dedup clustering / simhash-bucketed ANN) instead of
    silently launching a job that cannot finish. Pass ``None`` to
    accept the quadratic knowingly. CALLER CONTRACT (ADVICE r8): the
    gate runs ONE EXTRA Spark action — a count over the id column
    only, so column pruning keeps it far cheaper than the pair scan,
    but an expensive unpersisted upstream lineage still re-evaluates
    once; cache the input or pass ``max_vectors=None`` to skip it.
    """
    import numpy as np

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    if max_vectors is not None:
        n_vec = df.select(id_col).count()
        if n_vec > max_vectors:
            raise ValueError(
                f"cosine_pairs_blocked: {n_vec} vectors exceeds the "
                f"max_vectors={max_vectors} all-pairs gate — exact "
                "all-pairs cosine is O(N²·d); use the cluster-bucketed "
                "semantic dedup (queries/llm3.q_llm_semantic_dedup) or "
                "the SimHash-bucketed ANN (lsh_topk_scaled) at this "
                "scale, or pass max_vectors=None to accept the "
                "quadratic knowingly")

    d = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    # A side of pair (i, j): block i rows, replicated for every j >= i.
    # B side: block j rows, replicated for every i <= j. Keys are always
    # (min, max), so each unordered block pair materializes exactly once.
    a = d.select(
        F.col("_blk").alias("_pi"),
        F.explode(F.sequence(F.col("_blk"), F.lit(n_blocks - 1))).alias("_pj"),
        F.lit(0).alias("_side"), "_id", "_vec",
    )
    b = d.select(
        F.explode(F.sequence(F.lit(0), F.col("_blk"))).alias("_pi"),
        F.col("_blk").alias("_pj"),
        F.lit(1).alias("_side"), "_id", "_vec",
    )

    out_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType()),
         StructField("cosine", DoubleType())]
    )

    def score(key, pdf):
        import pandas as pd

        i, j = key
        a_pdf = pdf[pdf["_side"] == 0]
        b_pdf = pdf[pdf["_side"] == 1]
        if a_pdf.empty or b_pdf.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        a_ids = a_pdf["_id"].to_numpy(dtype=np.int64)
        b_ids = b_pdf["_id"].to_numpy(dtype=np.int64)
        A = np.array(list(a_pdf["_vec"]), dtype=np.float64)
        B = np.array(list(b_pdf["_vec"]), dtype=np.float64)
        dim = A.shape[1]
        # ascending-dimension accumulation == the oracle's left fold
        dots = np.zeros((len(a_ids), len(b_ids)))
        na_sq = np.zeros(len(a_ids))
        nb_sq = np.zeros(len(b_ids))
        for k in range(dim):
            dots += np.outer(A[:, k], B[:, k])
            na_sq += A[:, k] * A[:, k]
            nb_sq += B[:, k] * B[:, k]
        na, nb = np.sqrt(na_sq), np.sqrt(nb_sq)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dots / np.outer(na, nb)
        mask = (np.outer(na > 0, nb > 0)) & (sims >= threshold)
        if i == j:  # A == B: keep each unordered pair once, drop self-pairs
            mask &= a_ids[:, None] < b_ids[None, :]
        ii, jj = np.nonzero(mask)
        ia, ib = a_ids[ii], b_ids[jj]
        return pd.DataFrame(
            {"id_a": np.minimum(ia, ib), "id_b": np.maximum(ia, ib),
             "cosine": sims[ii, jj]}
        )

    return (
        a.unionByName(b)
        .groupBy("_pi", "_pj")
        .applyInPandas(score, schema=out_schema)
    )


def cosine_pairs_oracle_sql(threshold: float = 0.45,
                            table: str = "embeddings") -> str:
    """DuckDB replay of :func:`cosine_pairs_blocked` (the hash-verified
    contract of the retired q_llm_dedup_embed declared key, kept as a
    unit-tested operator per the round-6 q_llm_knn_ivf precedent):
    exact all-pairs cosine with the identical ascending-dimension
    left-fold arithmetic, (id_a, id_b, cosine_r) with id_a < id_b."""
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
    p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_reduce(list_transform(generate_series(1, len(a.e)),
                                          i -> a.e[i] * b.e[i]), (x, y) -> x + y)
               / (sqrt(list_reduce(list_transform(a.e, x -> x * x), (x, y) -> x + y))
                  * sqrt(list_reduce(list_transform(b.e, x -> x * x), (x, y) -> x + y)))
                   AS cosine
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cosine, 6) AS cosine_r
    FROM p WHERE cosine >= {threshold}
    """


def lsh_topk_oracle_sql(k: int = 5, n_planes: int = 6, n_tables: int = 8,
                        table: str = "embeddings") -> str:
    """DuckDB SQL replaying :func:`lsh_topk` end to end: the ±1 plane
    matrix comes from the parity of md5(j||':'||d)'s first byte (its
    second hex char), projections and cosines are ordered left-folds
    (list_reduce) matching the engine's ascending-dimension
    accumulation, buckets are integer bit-sums, and candidates are
    distinct directed same-bucket pairs across tables. The bucket-width
    cap needs no oracle counterpart: sub-block splitting changes the
    compute shape, never the result set."""
    total = n_planes * n_tables
    return f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
    dim AS (SELECT max(len(e)) AS nd FROM emb),
    planes AS (
        SELECT j.j,
               list(CASE WHEN substring(md5(CAST(j.j AS VARCHAR) || ':'
                                        || CAST(d.d - 1 AS VARCHAR)), 2, 1)
                         IN ('0','2','4','6','8','a','c','e')
                    THEN 1.0 ELSE -1.0 END ORDER BY d.d) AS sv
        FROM generate_series(0, {total - 1}) AS j(j),
             (SELECT unnest(generate_series(1, (SELECT nd FROM dim))) AS d) AS d
        GROUP BY j.j
    ),
    proj AS (
        SELECT emb.vec_id, planes.j,
               list_reduce(list_transform(generate_series(1, len(e)),
                                          d -> e[d] * sv[d]),
                           (a, b) -> a + b) AS p
        FROM emb, planes
    ),
    buckets AS (
        SELECT vec_id, j // {n_planes} AS t,
               CAST(SUM(CASE WHEN p >= 0
                             THEN (1 << (j % {n_planes})) ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id, j // {n_planes}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
        FROM buckets a JOIN buckets b USING (t, bucket)
        WHERE a.vec_id <> b.vec_id
    ),
    norms AS (SELECT vec_id, e,
                     sqrt(list_reduce(list_transform(e, x -> x * x),
                                      (a, b) -> a + b)) AS nrm
              FROM emb),
    scored AS (
        SELECT q_id, c_id,
               list_reduce(list_transform(generate_series(1, len(qa.e)),
                                          d -> qa.e[d] * ca.e[d]),
                           (a, b) -> a + b) / (qa.nrm * ca.nrm) AS cosine
        FROM cand
        JOIN norms qa ON qa.vec_id = q_id
        JOIN norms ca ON ca.vec_id = c_id
        WHERE qa.nrm > 0 AND ca.nrm > 0
    )
    SELECT q_id AS vec_id, c_id AS neighbor_id, rank,
           round(cosine, 6) AS cosine_r
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, c_id) AS rank
          FROM scored)
    WHERE rank <= {k}
    """


MAX_ANN_BUCKET = 256  # per-(table,bucket) width cap — the O(w²) kernel guard


def lsh_topk(df: DataFrame, k: int, id_col: str = "vec_id",
             vec_col: str = "embedding", n_planes: int = 6,
             n_tables: int = 8, max_bucket: int = MAX_ANN_BUCKET) -> DataFrame:
    """Approximate top-k cosine neighbors for every vector via
    MULTI-TABLE SimHash buckets (Indyk-Motwani style: L independent
    tables of m planes each) with exact re-rank over the candidate
    union. Returns (vec_id, neighbor_id, rank, cosine) — rank within
    retrieved candidates.

    Recall math (Charikar): a neighbor at angle θ agrees with one plane
    w.p. p = 1 - θ/π; same bucket of one table w.p. p^m; retrieved w.p.
    1-(1-p^m)^L. This corpus's true top-5 neighbors sit near cos 0.45
    (p ≈ 0.65), so m=6, L=8 → ~0.45 expected recall — ≥3× the
    single-table Hamming≤1 multiprobe this replaces (measured 0.11),
    at candidate volume ≈ L/2^m of the N² bruteforce per table set.
    At 100 TB tune (m, L): +1 plane halves candidates per table,
    +1 table buys recall linearly in cost; each table is one narrow
    equi-join — no crossJoin anywhere.

    Bucket-width cap (the MinHash path's MAX_BUCKET analog): a dense
    region of the embedding space can put w ≫ ``max_bucket`` vectors in
    one (table, bucket) — an O(w²) kernel on an unbounded w is the one
    straggler/OOM risk of the plan. Buckets wider than ``max_bucket``
    are split into ``ceil(w/max_bucket)`` sub-blocks and scored as
    block PAIRS (the ``cosine_pairs_blocked`` idiom), so every
    within-bucket pair is still scored exactly — recall is unchanged,
    per-kernel memory is bounded by ~2·``max_bucket`` vectors, and the
    extra cost is the textbook ×n_sub replication only inside the
    oversized buckets.
    """
    # All L·m plane projections in ONE Arrow pass per batch (a JVM fold
    # per plane per row was the remaining bottleneck): S is a ±1 matrix
    # derived from md5(plane, dim) — deterministic, seed-free, built
    # identically on every worker without shipping anything.
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import ArrayType, IntegerType

    total_planes = n_planes * n_tables
    pow2 = 2 ** np.arange(n_planes)

    def _buckets(v):
        import hashlib

        X = np.array(list(v), dtype=np.float64)
        dim = X.shape[1]
        S = np.array(
            [
                [
                    1.0
                    if hashlib.md5(f"{j}:{d}".encode()).digest()[0] % 2 == 0
                    else -1.0
                    for j in range(total_planes)
                ]
                for d in range(dim)
            ]
        )
        # ascending-dimension accumulation instead of BLAS `X @ S`: a
        # matmul's reduction order is implementation-defined, and a
        # last-ulp difference flips the sign of a near-zero projection —
        # the explicit fold makes every bucket bit reproducible by any
        # engine's ordered left-fold (the DuckDB oracle's list_reduce).
        proj = np.zeros((len(X), total_planes))
        for d in range(dim):
            proj += np.outer(X[:, d], S[d])
        bits = proj >= 0  # n × (L·m) sign bits
        per_table = bits.reshape(len(X), n_tables, n_planes) @ pow2
        return pd.Series(list(per_table.astype("int32")))

    buckets_udf = F.pandas_udf(_buckets, ArrayType(IntegerType()))
    sk = df.select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(buckets_udf(F.col(vec_col))).alias("t", "bucket"),
    )
    # Score each bucket's pairs with one vectorized numpy kernel per
    # (table, bucket) group — a JVM higher-order fold per candidate pair
    # was the bottleneck (L·N·w candidate dots). The per-dimension
    # accumulation order is fixed (ascending), so a pair's cosine is
    # bit-identical no matter which bucket scores it — dropDuplicates
    # across tables is then value-stable.
    import numpy as np

    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [StructField("q_id", LongType()), StructField("c_id", LongType()),
         StructField("cosine", DoubleType())]
    )

    def _directed(a_ids, b_ids, A, B):
        """Directed candidate pairs A→B with ascending-dim cosine."""
        import pandas as pd

        dim = A.shape[1]
        dots = np.zeros((len(a_ids), len(b_ids)))
        na_sq = np.zeros(len(a_ids))
        nb_sq = np.zeros(len(b_ids))
        for d in range(dim):  # fixed order -> deterministic per pair
            dots += np.outer(A[:, d], B[:, d])
            na_sq += A[:, d] * A[:, d]
            nb_sq += B[:, d] * B[:, d]
        na, nb = np.sqrt(na_sq), np.sqrt(nb_sq)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dots / np.outer(na, nb)
        ii, jj = np.nonzero(
            (a_ids[:, None] != b_ids[None, :]) & np.outer(na > 0, nb > 0)
        )
        return pd.DataFrame(
            {"q_id": a_ids[ii], "c_id": b_ids[jj], "cosine": sims[ii, jj]}
        )

    def score(key, pdf):
        import pandas as pd

        a_pdf = pdf[pdf["_pa"] == pdf["_sub"]]
        b_pdf = pdf[pdf["_pb"] == pdf["_sub"]]
        if a_pdf.empty or b_pdf.empty:
            return pd.DataFrame({"q_id": [], "c_id": [], "cosine": []}).astype(
                {"q_id": "int64", "c_id": "int64", "cosine": "float64"}
            )
        a_ids = a_pdf["_idc"].to_numpy(dtype=np.int64)
        b_ids = b_pdf["_idc"].to_numpy(dtype=np.int64)
        A = np.array(list(a_pdf["_vecc"]), dtype=np.float64)
        B = np.array(list(b_pdf["_vecc"]), dtype=np.float64)
        out = [_directed(a_ids, b_ids, A, B)]
        if key[2] != key[3]:  # off-diagonal sub-block pair: both directions
            out.append(_directed(b_ids, a_ids, B, A))
        return pd.concat(out, ignore_index=True)

    # Width-capped grouping: rows are numbered within each (t, bucket)
    # (same shuffle key as the kernel groupBy — one exchange, the window
    # partitioning is reused by the aggregation), assigned a sub-block
    # in [0, n_sub), and replicated to every sub-block PAIR (pa <= pb)
    # they participate in. For w <= max_bucket, n_sub == 1 and the plan
    # degenerates to exactly one (0, 0) diagonal group per bucket with
    # no replication.
    rows = sk.select(
        "t", "bucket", F.col(id_col).alias("_idc"), F.col(vec_col).alias("_vecc")
    )
    wb = Window.partitionBy("t", "bucket")
    sub = rows.withColumn(
        "_nsub",
        F.ceil(F.count(F.lit(1)).over(wb) / F.lit(max_bucket)).cast("int"),
    ).withColumn(
        "_sub",
        ((F.row_number().over(wb.orderBy("_idc")) - 1) % F.col("_nsub")).cast("int"),
    )
    replicated = sub.select(
        "t", "bucket", "_idc", "_vecc", "_sub",
        F.explode(
            F.flatten(F.array(
                # as the A side: pairs (_sub, j) for j >= _sub
                F.transform(
                    F.sequence(F.col("_sub"), F.col("_nsub") - 1),
                    lambda j: F.struct(F.col("_sub").alias("_pa"), j.alias("_pb")),
                ),
                # as the B side: pairs (i, _sub) for i < _sub.
                # (sequence(0, -1) is DESCENDING in Spark, not empty —
                # guard _sub == 0 explicitly.)
                F.transform(
                    F.when(F.col("_sub") > 0,
                           F.sequence(F.lit(0), F.col("_sub") - F.lit(1)))
                    .otherwise(F.array().cast("array<int>")),
                    lambda i: F.struct(i.alias("_pa"), F.col("_sub").alias("_pb")),
                ),
            ))
        ).alias("_p"),
    ).select("t", "bucket", "_idc", "_vecc", "_sub", "_p._pa", "_p._pb")
    # One exchange for dedup + top-k (round 17, guide §2.4): hash the
    # scored candidates by q_id ONCE — HashPartitioning(q_id) satisfies
    # the dedup's ClusteredDistribution(q_id, c_id) AND the rank
    # window's (q_id), so the previous two back-to-back exchanges
    # (dedup by (q_id, c_id), then re-shuffle by q_id) collapse to one.
    # Values are unchanged: cosine is bit-identical across tables (the
    # ascending-dim kernel), so whichever duplicate survives carries
    # the same number.
    scored = (
        replicated.groupBy("t", "bucket", "_pa", "_pb")
        .applyInPandas(score, schema=out_schema)
        .repartition("q_id")
        .dropDuplicates(["q_id", "c_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("q_id").alias(id_col), F.col("c_id").alias("neighbor_id"),
                "rank", "cosine")
    )


def lsh_planes_for(n_vectors: int, target_bucket: int = MAX_ANN_BUCKET) -> int:
    """Planes-per-table for a corpus of ``n_vectors`` so the EXPECTED
    bucket width stays near ``target_bucket``: m = ceil(log2(n/target)),
    clamped to [4, 24]. This is the knob the round-5 100x soak proved
    load-bearing: with m FIXED (fixture-tuned 6 -> 64 buckets/table),
    bucket width grows linearly with the corpus and the exact
    within-bucket scoring is Sum(w^2) — at 2M vectors the shuffle spill
    filled the disk. With m from this formula, per-bucket width is
    ~constant and total candidate volume stays ~linear (n x
    target_bucket x L), the standard multi-table LSH deployment rule.
    Recall per table drops as p^m — compensate with more tables (L),
    which scales cost linearly, not quadratically.

    Pure integer arithmetic (smallest m in [4, 24] with
    target · 2^m >= n — identical to the clamped ceil(log2) it
    replaces) so a SQL engine derives the same m from COUNT(*) with no
    floating log2 at a power-of-two boundary to disagree about — what
    lets lsh_topk_scaled_oracle_sql hash-match."""
    for m in range(4, 25):
        if target_bucket * (1 << m) >= n_vectors:
            return m
    return 24


def lsh_topk_scaled(df: DataFrame, k: int, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_tables: int = 8,
                    target_bucket: int = MAX_ANN_BUCKET) -> DataFrame:
    """:func:`lsh_topk` with planes auto-scaled from the corpus size —
    the deployment form, and since r6 the DECLARED oracle-backed key
    (q_llm_knn_ivf_scaled): :func:`lsh_topk_scaled_oracle_sql` derives
    the same m from COUNT(*) inside the SQL, so the oracle replays the
    auto-scaling decision itself, not a frozen fixture constant. One
    extra count() job picks m before planning; the round-5 100x soak
    proved this knob load-bearing (fixed m=6 went quadratic and filled
    the disk; scaled m soaked linear at 245.7s)."""
    n = df.count()
    return lsh_topk(df, k, id_col=id_col, vec_col=vec_col,
                    n_planes=lsh_planes_for(n, target_bucket),
                    n_tables=n_tables)


def lsh_topk_scaled_oracle_sql(k: int = 5, n_tables: int = 8,
                               target_bucket: int = MAX_ANN_BUCKET,
                               table: str = "embeddings") -> str:
    """DuckDB SQL replaying :func:`lsh_topk_scaled` INCLUDING the
    corpus-size-derived plane count: m = smallest value in [4, 24] with
    target_bucket · 2^m >= COUNT(*) — the same integer arithmetic as
    :func:`lsh_planes_for`, evaluated over the same table, so Spark and
    the oracle always pick the identical m. The plane pool is built for
    the m=24 maximum and filtered to the first m·L planes; projections,
    buckets, candidates and cosines replay :func:`lsh_topk_oracle_sql`
    verbatim from there."""
    max_total = 24 * n_tables
    return f"""
    WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),
    dim AS (SELECT max(len(e)) AS nd FROM emb),
    mm AS (
        SELECT COALESCE(
            (SELECT min(c.m) FROM generate_series(4, 24) AS c(m)
             WHERE {target_bucket} * (CAST(1 AS BIGINT) << c.m)
                   >= (SELECT count(*) FROM emb)),
            24) AS m
    ),
    planes AS (
        SELECT j.j,
               list(CASE WHEN substring(md5(CAST(j.j AS VARCHAR) || ':'
                                        || CAST(d.d - 1 AS VARCHAR)), 2, 1)
                         IN ('0','2','4','6','8','a','c','e')
                    THEN 1.0 ELSE -1.0 END ORDER BY d.d) AS sv
        FROM generate_series(0, {max_total - 1}) AS j(j),
             (SELECT unnest(generate_series(1, (SELECT nd FROM dim))) AS d) AS d
        WHERE j.j < (SELECT m FROM mm) * {n_tables}
        GROUP BY j.j
    ),
    proj AS (
        SELECT emb.vec_id, planes.j,
               list_reduce(list_transform(generate_series(1, len(e)),
                                          d -> e[d] * sv[d]),
                           (a, b) -> a + b) AS p
        FROM emb, planes
    ),
    buckets AS (
        SELECT vec_id, j // (SELECT m FROM mm) AS t,
               CAST(SUM(CASE WHEN p >= 0
                             THEN (CAST(1 AS BIGINT)
                                   << (j % (SELECT m FROM mm))) ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM proj GROUP BY vec_id, j // (SELECT m FROM mm)
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
        FROM buckets a JOIN buckets b USING (t, bucket)
        WHERE a.vec_id <> b.vec_id
    ),
    norms AS (SELECT vec_id, e,
                     sqrt(list_reduce(list_transform(e, x -> x * x),
                                      (a, b) -> a + b)) AS nrm
              FROM emb),
    scored AS (
        SELECT q_id, c_id,
               list_reduce(list_transform(generate_series(1, len(qa.e)),
                                          d -> qa.e[d] * ca.e[d]),
                           (a, b) -> a + b) / (qa.nrm * ca.nrm) AS cosine
        FROM cand
        JOIN norms qa ON qa.vec_id = q_id
        JOIN norms ca ON ca.vec_id = c_id
        WHERE qa.nrm > 0 AND ca.nrm > 0
    )
    SELECT q_id AS vec_id, c_id AS neighbor_id, rank,
           round(cosine, 6) AS cosine_r
    FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                       ORDER BY cosine DESC, c_id) AS rank
          FROM scored)
    WHERE rank <= {k}
    """
