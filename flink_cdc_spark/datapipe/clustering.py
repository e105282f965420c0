"""K-means clustering over embedding columns — Lloyd iterations as a
distributed DataFrame loop, exactly mirrorable by a SQL oracle.

The op a training-data pipeline runs before SemDeDup / IVF indexing:
fit cluster assignments over an ``array<float>`` column.

Determinism design (the part that makes an exact oracle possible):
  * unit-normalize inputs with the same ordered-fold dot products the
    similarity module uses (sequential left fold on both engines);
  * centroid update uses EXACT integer arithmetic — each unit coordinate
    quantizes to ``round(u * SCALE)`` int64, the per-cluster per-dim sum
    is an exact integer (order-independent!), and the centroid coordinate
    is one IEEE division ``sum / (SCALE * n)``. No float summation order
    can diverge between engines;
  * assignment is argmin squared distance, computed as
    ``argmax(dot(u, c) - 0.5 * |c|^2)`` (equivalent for unit vectors),
    with ties broken on the lower cluster id;
  * initial centroids are the unit vectors of the k smallest keys.

Scale shape: per iteration, ONE map pass scores every vector against the
k broadcast centroids (centroid literals live in the plan — k*dim
doubles) and ONE hash aggregation computes the k*dim integer sums. The
only driver traffic is the k*dim centroid matrix per iteration — the
same control-plane size the reference's coordinator ships, and exactly
what Spark MLlib's KMeans collects per step too.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, functions as F

from .similarity import EMBED_DIM, _dot, _unit_duck, _unit_expr

SCALE = 1_000_000  # quantization grid for exact integer centroid sums
DEFAULT_K = 8
DEFAULT_ITERS = 2


def _score_exprs(centroids: List[List[float]]):
    """Per-cluster affinity: dot(u, c) - 0.5*|c|^2 (argmin distance)."""
    exprs = []
    for c in centroids:
        arr = "array(" + ", ".join(repr(float(v)) for v in c) + ")"
        normsq = sum(float(v) * float(v) for v in c)
        exprs.append(f"({_dot('u', arr)} - {repr(0.5 * normsq)})")
    return exprs


def _assign_expr(centroids: List[List[float]]) -> str:
    scores = _score_exprs(centroids)
    arr = "array(" + ", ".join(scores) + ")"
    # array_position returns the FIRST max position -> lowest cid on ties
    return f"array_position({arr}, array_max({arr})) - 1"


def kmeans_fit(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
):
    """-> (assignments DataFrame (vec_id, cluster), fitted centroids
    [[float]*dim]*k) after `iters` Lloyd iterations."""
    normed = df.selectExpr(f"{key} AS vec_id", f"{_unit_expr(vec)} AS u")
    # init: unit vectors of the k smallest keys (driver-side: k rows)
    init = normed.orderBy("vec_id").limit(k).collect()
    if len(init) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(init)}")
    centroids = [[float(x) for x in r["u"]] for r in init]

    quant = normed.select(
        "vec_id",
        "u",
        F.expr(
            f"transform(u, x -> cast(round(x * {SCALE}) AS bigint))"
        ).alias("q"),
    )
    for _ in range(iters):
        assigned = quant.withColumn(
            "cluster", F.expr(_assign_expr(centroids)).cast("int")
        )
        sums = (
            assigned.select(
                "cluster", F.posexplode("q").alias("d", "qv")
            )
            .groupBy("cluster", "d")
            .agg(F.sum("qv").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new_c = [list(c) for c in centroids]  # empty cluster keeps its old
        by_cluster: dict = {}
        for r in sums:
            by_cluster.setdefault(int(r["cluster"]), {})[int(r["d"])] = (
                int(r["s"]), int(r["n"])
            )
        for cid, dims in by_cluster.items():
            for d, (s, n) in dims.items():
                new_c[cid][d] = s / (SCALE * n)
        centroids = new_c
    assignments = quant.withColumn(
        "cluster", F.expr(_assign_expr(centroids)).cast("int")
    ).select("vec_id", "cluster")
    return assignments, centroids


def kmeans_assign(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
) -> DataFrame:
    """-> (vec_id, cluster) after `iters` Lloyd iterations."""
    assignments, _ = kmeans_fit(df, key, vec, k, iters)
    return assignments


def _kmeans_ctes(
    table: str,
    key: str,
    vec: str,
    k: int,
    iters: int,
):
    """-> (with_body_sql, final_centroid_cte_name, dot_uc_expr): the
    shared CTE chain both the assignment oracle and the fitted-IVF
    oracle build on."""
    dot_uc = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {EMBED_DIM} + 1), i -> u[i] * cv[i])), "
        "(acc, v) -> acc + v)"
    )
    prev = "c0"
    parts = [
        f"""
    normed AS (
      SELECT {key} AS vec_id, {_unit_duck(vec)} AS u FROM {table}
    ),
    quant AS (
      SELECT vec_id, u,
             list_transform(u, x -> CAST(round(x * {SCALE}) AS BIGINT)) AS q
      FROM normed
    ),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid,
             u AS cv
      FROM (SELECT vec_id, u FROM normed ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for it in range(1, iters + 1):
        cur = f"c{it}"
        parts.append(f"""
    score{it} AS (
      SELECT q.vec_id, c.cid,
             {dot_uc} - 0.5 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(cv, x -> x * x)), (acc, v) -> acc + v) AS s
      FROM quant q CROSS JOIN {prev} c
    ),
    assign{it} AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY s DESC, cid ASC) AS rn
        FROM score{it}
      ) WHERE rn = 1
    ),
    mean{it} AS (
      SELECT a.cluster AS cid, t.d,
             CAST(sum(q.q[t.d + 1]) AS DOUBLE) / ({SCALE} * count(*)) AS val
      FROM assign{it} a
      JOIN quant q USING (vec_id)
      CROSS JOIN (SELECT unnest(range({EMBED_DIM})) AS d) t
      GROUP BY a.cluster, t.d
    ),
    {cur} AS (
      SELECT cid,
             coalesce(
               (SELECT list(val ORDER BY d) FROM mean{it} m WHERE m.cid = p.cid),
               cv
             ) AS cv
      FROM {prev} p
    )""")
        prev = cur
    body = ",".join(parts)
    return body, prev, dot_uc


def kmeans_oracle_sql(
    table: str = "embeddings",
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
) -> str:
    """DuckDB mirror: same init, same integer-exact updates, same argmax.

    Centroids live in (cid, cv) form; each unrolled iteration is
    assignment (ordered-fold dot per (vec, cid) + window argmax with
    cid tie-break) followed by the exact integer mean. Empty clusters
    keep their previous centroid via the coalesce fallback."""
    body, prev, dot_uc = _kmeans_ctes(table, key, vec, k, iters)
    return f"""
    WITH {body},
    final_score AS (
      SELECT q.vec_id, c.cid,
             {dot_uc} - 0.5 * list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(cv, x -> x * x)), (acc, v) -> acc + v) AS s
      FROM quant q CROSS JOIN {prev} c
    )
    SELECT vec_id, CAST(cid AS INTEGER) AS cluster FROM (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY s DESC, cid ASC) AS rn
      FROM final_score
    ) WHERE rn = 1
    """


def ivf_fitted_oracle_sql(
    table: str = "embeddings",
    key: str = "vec_id",
    vec: str = "embedding",
    n_queries: int = 10,
    topk: int = 5,  # similarity.TOPK_DEFAULT
    k: int = 16,
    iters: int = DEFAULT_ITERS,
) -> str:
    """DuckDB mirror of kmeans_fit |> (normalize centroids) |> ivf_topk:
    the index-build composition. Cell numbers are (cid + 1) — the fitted
    centroid list order — matching the Spark side's 1-based
    array_position cells; ties rank by the lower cid, matching
    array_position's first-occurrence rule."""
    body, prev, _dot_uc = _kmeans_ctes(table, key, vec, k, iters)
    foldsq = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        "list_transform(cv, x -> x * x)), (acc, v) -> acc + v)"
    )
    dot_u_cn = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {EMBED_DIM} + 1), i -> u[i] * cn[i])), "
        "(acc, v) -> acc + v)"
    )
    dot_qu_cu = (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {EMBED_DIM} + 1), i -> qu[i] * cu[i])), "
        "(acc, v) -> acc + v)"
    )
    return f"""
    WITH {body},
    cnorm AS (
      SELECT cid, list_transform(cv, x -> x / sqrt({foldsq})) AS cn
      FROM {prev}
    ),
    cell_scores AS (
      SELECT n.vec_id, c.cid, {dot_u_cn} AS s
      FROM normed n CROSS JOIN cnorm c
    ),
    ranked_cells AS (
      SELECT vec_id, cid, row_number() OVER (
               PARTITION BY vec_id ORDER BY s DESC, cid ASC) AS rn
      FROM cell_scores
    ),
    cells AS (
      SELECT vec_id, CAST(cid + 1 AS INTEGER) AS cell
      FROM ranked_cells WHERE rn = 1
    ),
    q AS (
      SELECT vec_id AS query_id,
             max(CASE WHEN rn = 1 THEN cid + 1 END) AS cell1,
             max(CASE WHEN rn = 2 THEN cid + 1 END) AS cell2
      FROM ranked_cells WHERE vec_id < {n_queries} AND rn <= 2
      GROUP BY vec_id
    ),
    cand AS (
      SELECT q.query_id, c.vec_id AS nbr_id
      FROM cells c JOIN q
        ON (c.cell = q.cell1 OR c.cell = q.cell2)
       AND c.vec_id <> q.query_id
    ),
    scored AS (
      SELECT cand.query_id, cand.nbr_id,
             round({dot_qu_cu}, 4) AS cosine
      FROM cand
      JOIN (SELECT vec_id, u AS qu FROM normed) a ON a.vec_id = cand.query_id
      JOIN (SELECT vec_id, u AS cu FROM normed) b ON b.vec_id = cand.nbr_id
    ),
    topk AS (
      SELECT query_id, nbr_id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, nbr_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, nbr_id, rank, cosine FROM topk WHERE rank <= {topk}
    """
