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


def kmeans_assign(
    df: DataFrame,
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
) -> DataFrame:
    """-> (vec_id, cluster) after `iters` Lloyd iterations."""
    spark = df.sparkSession
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
    return quant.withColumn(
        "cluster", F.expr(_assign_expr(centroids)).cast("int")
    ).select("vec_id", "cluster")


def kmeans_oracle_sql(
    table: str = "embeddings",
    key: str = "vec_id",
    vec: str = "embedding",
    k: int = DEFAULT_K,
    iters: int = DEFAULT_ITERS,
) -> str:
    """DuckDB mirror: same init, same integer-exact updates, same argmax.

    Centroids live in (cid, d, val) long form; each unrolled iteration is
    assignment (ordered-fold dot per (vec, cid) + window argmax with
    cid tie-break) followed by the exact integer mean. Empty clusters
    keep their previous centroid via the anti-join union."""
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
