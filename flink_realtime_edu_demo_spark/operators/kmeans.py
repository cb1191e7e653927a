"""Distributed k-means (Lloyd's algorithm) over an embedding column —
the iterative-algorithm demonstrator (SURVEY.md §2.11; genuinely
non-SQL-expressible, hence rows-only + a numpy-reference unit test).

Driver-loop shape done right for 100 TB:
- per iteration the ONLY driver-side state is the k×dim centroid
  matrix (k=8, dim=64 → 4 KB) — the assignment pass never collects
  data rows;
- assignment is one Arrow-batched pandas UDF with the centroid matrix
  in the closure (numpy argmin over a (batch × k) distance GEMM);
- the update pass reuses the posexplode + exact-decimal mean layout of
  q_llm_centroids, so partition order cannot perturb centroids and the
  iteration is bit-deterministic run-to-run;
- ties (equidistant centroids) break to the lowest cluster id, and
  empty clusters keep their previous centroid — both deterministic.

Init is deterministic too: the k vectors with the smallest ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _assign_udf(centroids: list[list[float]]):
    """Arrow-batched assignment UDF for the given centroid matrix
    (k × dim floats in the closure — the only state shipped)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import IntegerType

    C = np.array(centroids, dtype=np.float64)  # k × dim, tiny closure

    def _assign(v):
        X = np.array(list(v), dtype=np.float64)
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row →
        # argmin over -2x·c + ||c||², ties to the lowest cluster id
        # (np.argmin returns the first minimal index). Dots and ||c||²
        # accumulate in ascending-dimension order (not BLAS matmul,
        # whose reduction order is implementation-defined) so every
        # distance is reproducible by an engine's ordered left-fold —
        # what makes the unrolled DuckDB oracle hash-match.
        dim = X.shape[1]
        dots = np.zeros((len(X), C.shape[0]))
        cc = np.zeros(C.shape[0])
        for d in range(dim):
            dots += np.outer(X[:, d], C[:, d])
            cc += C[:, d] * C[:, d]
        dmat = -2.0 * dots + cc[None, :]
        return pd.Series(np.argmin(dmat, axis=1).astype("int32"))

    # functional form: string type hints don't resolve under
    # `from __future__ import annotations` with locally-imported pandas
    return F.pandas_udf(_assign, IntegerType())


def assign_udf(centroids: list[list[float]]):
    """Public handle on the Arrow assignment UDF — lets a caller inline
    the cluster column into its own select (no join against a separate
    assignment frame; q_llm_semantic_dedup does this)."""
    return _assign_udf(centroids)


def kmeans_assign(df: DataFrame, centroids: list[list[float]],
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """One assignment pass: (id_col, cluster) for the given centroids."""
    assign = _assign_udf(centroids)
    return df.select(F.col(id_col), assign(F.col(vec_col)).cast("int").alias("cluster"))


def kmeans(df: DataFrame, k: int = 8, n_iter: int = 5,
           id_col: str = "vec_id", vec_col: str = "embedding"):
    """Lloyd's iterations; returns (assignments DataFrame, centroids).

    Each iteration: one Arrow assignment pass + one exact-decimal
    centroid aggregation (two shuffles), k×dim floats to the driver.
    The input is persisted for the duration of the loop (the canonical
    Spark idiom for iterative algorithms — every iteration re-reads the
    same working set) and released before returning. The returned
    assignment frame is LAZY (round 17): the final centroids are plain
    literals in its plan, so its lineage is one scan + one Arrow pass —
    recomputed from source after the unpersist. The previous eager
    localCheckpoint here paid a full extra assignment job during
    construction only to snapshot rows the caller's own action
    recomputes in one pass anyway (guide §1.2: don't compute things
    twice).
    """
    df = df.persist()
    first = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(map(float, r[0])) for r in first]

    for _ in range(n_iter):
        # assignment UDF inlined in the SAME select as the posexplode:
        # no per-iteration join of the corpus against its own
        # assignments (the round-5 100x soak's heaviest cost — a
        # 5-iteration loop paid 5 full shuffle joins of N vectors);
        # each iteration is now one scan of the persisted input +
        # explode + partial-aggregated groupBy.
        assign = _assign_udf(centroids)
        per_dim = (
            df.select(
                assign(F.col(vec_col)).cast("int").alias("cluster"),
                F.posexplode(vec_col).alias("dim", "v"),
            )
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.col("v").cast("double").cast("decimal(18,6)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()  # k × dim scalar means — driver state, not data rows
        )
        new_c = [list(c) for c in centroids]  # empty cluster keeps previous
        by_cluster: dict[int, dict[int, float]] = {}
        for r in per_dim:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = r["m"]
        for c, dims in by_cluster.items():
            new_c[c] = [dims[i] for i in range(len(dims))]
        centroids = new_c

    out = kmeans_assign(df, centroids, id_col, vec_col)
    df.unpersist()
    return out, centroids


def kmeans_oracle_sql(k: int = 8, n_iter: int = 5,
                      table: str = "embeddings") -> str:
    """DuckDB SQL replaying :func:`kmeans` with the iterations UNROLLED
    into chained CTEs (n_iter is a compile-time constant here, so Lloyd's
    'iterative, not SQL-expressible' caveat reduces to SQL generation):
    c0 = first k vectors by id; each round assigns by ordered-fold
    distance (ties to the lowest cluster) and rebuilds centroids with
    the same exact-DECIMAL(18,6) mean the engine uses, empty clusters
    keeping their previous centroid. Output = the final assignment
    pass, identical to the engine's (vec_id, cluster)."""
    parts = [
        f"WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM {table}),",
        f"""c0 AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, e AS cv
        FROM (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT {k})
    ),""",
    ]
    dist = (
        "(-2.0 * list_reduce(list_transform(generate_series(1, len(e)),"
        " i -> e[i] * cv[i]), (x, y) -> x + y)"
        " + list_reduce(list_transform(cv, x -> x * x), (x, y) -> x + y))"
    )
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        parts.append(f"""a{it} AS (
        SELECT vec_id, cluster FROM (
            SELECT emb.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY emb.vec_id
                                      ORDER BY {dist}, c.cluster) AS rn
            FROM emb, {prev} c)
        WHERE rn = 1
    ),
    m{it} AS (
        SELECT a{it}.cluster, t.i AS dim,
               CAST(SUM(CAST(e[t.i] AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*) AS m
        FROM emb JOIN a{it} USING (vec_id),
             unnest(generate_series(1, len(e))) AS t(i)
        GROUP BY a{it}.cluster, t.i
    ),
    p{it} AS (
        SELECT cluster, d.d AS dim, cv[d.d] AS pv
        FROM {prev}, unnest(generate_series(1, len(cv))) AS d(d)
    ),
    c{it} AS (
        SELECT cluster, list(COALESCE(m, pv) ORDER BY dim) AS cv
        FROM p{it} LEFT JOIN m{it} USING (cluster, dim)
        GROUP BY cluster
    ),""")
    parts.append(f"""final_assign AS (
        SELECT vec_id, cluster FROM (
            SELECT emb.vec_id, c.cluster,
                   row_number() OVER (PARTITION BY emb.vec_id
                                      ORDER BY {dist}, c.cluster) AS rn
            FROM emb, c{n_iter} c)
        WHERE rn = 1
    )
    SELECT vec_id, CAST(cluster AS INTEGER) AS cluster FROM final_assign""")
    return "\n    ".join(parts)
