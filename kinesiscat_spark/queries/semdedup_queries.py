"""SemDeDup lane: semantic dedup flags, hash-checked end to end.

The whole operator is IEEE-deterministic arithmetic (fold-based dot
products — DuckDB's ``list_sum`` and Spark's ``aggregate`` both fold
left over the same array; sqrt/divide are correctly-rounded IEEE ops),
so the oracle replays the full pipeline exactly:

- centroids: the ``_SD_CELLS`` lowest-id vectors, unit-normalized — the
  deterministic n_iters=0 seed build of ``ivf_centroids`` (the
  ``similarity_topk_ivf`` lane's already-hash-green replay);
- assignment by NEGATIVE RAW DOT, ties to the lowest cell (the exact
  expression ``ivf_assign`` evaluates — see the IVF-refined lane's
  rationale for why the twin must not substitute squared L2);
- rank within cell ascending by cosine-to-centroid (the paper's
  keep-the-outliers order), ties on id;
- drop x iff ANY earlier-ranked same-cell y has cos(x, y) >= tau — the
  published implementation's declarative greedy (independent of which
  y survive), one within-cell self-join in both engines.

Registered past the driver's 50-lane cap (like text_bpe_train);
``tests/test_oracle_parity.py`` runs the identical sf0.01 hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.registry import query

_SD_CELLS = 16
_SD_TAU = 0.3

_COS = (
    "(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))))"
)
_NEG_DOT = (
    "-(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))))"
)

_SQ_NORM = (
    "list_sum(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)

# Mirrors the operator's zero-norm/NULL/empty carve-out (semdedup.py:84-99):
# directionless vectors are excluded from the cell machinery and emitted
# kept with NULL cell/centroid_sim.  DuckDB's list_sum over NULL or an
# empty list is NULL, Spark's fold over an empty array is 0.0 — both fail
# the COALESCE(norm² > 0, FALSE) test, so the split agrees row for row.
_SEMDEDUP_ORACLE = f"""
WITH e0 AS (
  SELECT vec_id, embedding AS v FROM embeddings
),
e AS (
  SELECT vec_id, v FROM e0
  WHERE COALESCE({_SQ_NORM.format(v='v')} > 0, FALSE)
),
directionless AS (
  SELECT vec_id, CAST(NULL AS BIGINT) AS cell,
         CAST(NULL AS DOUBLE) AS centroid_sim, TRUE AS kept
  FROM e0
  WHERE NOT COALESCE({_SQ_NORM.format(v='v')} > 0, FALSE)
),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cell,
         list_transform(v, x -> CAST(x AS DOUBLE) /
           sqrt(list_sum(list_transform(v,
                y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS cvec
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_SD_CELLS})
),
assigned AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, cents.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_NEG_DOT.format(a='e.v', b='cents.cvec')}, cents.cell) AS r
    FROM e CROSS JOIN cents
  ) WHERE r = 1
),
ranked AS (
  SELECT e.vec_id, assigned.cell, e.v,
         {_COS.format(a='e.v', b='cents.cvec')} AS centroid_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY assigned.cell
           ORDER BY {_COS.format(a='e.v', b='cents.cvec')} ASC, e.vec_id)
           AS BIGINT) AS rnk
  FROM e JOIN assigned USING (vec_id) JOIN cents USING (cell)
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM ranked b JOIN ranked a
    ON a.cell = b.cell AND a.rnk < b.rnk
   AND {_COS.format(a='a.v', b='b.v')} >= {_SD_TAU}
)
SELECT r.vec_id, r.cell, ROUND(r.centroid_sim, 6) AS centroid_sim,
       (d.vec_id IS NULL) AS kept
FROM ranked r LEFT JOIN dropped d ON r.vec_id = d.vec_id
UNION ALL
SELECT vec_id, cell, centroid_sim, kept FROM directionless
"""


@query("dedup_semantic", oracle=_SEMDEDUP_ORACLE)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/semdedup.py; Abbas et al. 2023): k-means cells
    over the embeddings table, then within each cell drop every vector
    within cosine tau of an earlier-kept-order vector.  Emits the
    per-vector (cell, centroid_sim, kept) flags the pipeline filters on.

    Scale shape: centroid build and assignment are the (hash-green) IVF
    operators; the quadratic stage is confined per cell, so total pair
    cost is sum(|cell|^2) — a factor n_cells below the all-pairs join —
    and the self-join shuffles only (cell, rank, id, vec)."""
    from kinesiscat_spark.operators.semdedup import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    out = semdedup(emb, n_cells=_SD_CELLS, tau=_SD_TAU)
    return out.select(
        "vec_id", "cell", F.round("centroid_sim", 6).alias("centroid_sim"), "kept"
    )
