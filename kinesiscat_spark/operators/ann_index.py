"""Persisted IVF index: build once, query many batches.

``ivf_topk`` (operators/similarity.py) rebuilds centroids and cell
assignments inside every query plan — right for one-shot queries, wasteful
for the steady state of a retrieval service where the corpus is indexed
once and queried forever. This module materializes the index to storage in
the layout that makes cell pruning a SCAN property:

- ``centroids.parquet``: (cell, cvec) — n_cells rows, trivially broadcast.
- ``cells/``: the corpus written ``partitionBy("cell")`` — one directory
  per IVF cell, carrying the float vector AND its SQ8 codes. A probe of
  n_probe cells therefore reads n_probe/n_cells of the data via parquet
  PARTITION PRUNING (directory-level skipping, visible as PartitionFilters
  in the scan), not a post-scan filter: at 100 TB the unprobed cells are
  never opened, let alone decoded.

Queries collect the probed cell ids to the driver (n_probe × |queries|
integers — k-proportional metadata, not data) and push them as a literal
IN filter, so the pruning is static and plan-visible. Search semantics are
identical to ``ivf_topk`` / ``ivf_sq_topk`` with the same centroids:
``tests/test_ann_index.py`` pins result equality and the pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesiscat_spark.operators.quantize import (
    exact_float_rerank,
    int8_dot,
    pq_adc_score,
    pq_encode,
    pq_query_lut,
    pq_train,
    quantize_embeddings,
)
from kinesiscat_spark.operators.similarity import (
    cosine,
    ivf_assign,
    ivf_assign_arrow,
    ivf_centroids,
)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_cells: int = 16,
    n_iters: int = 0,
    id_col: str = "vec_id",
    vec: str = "embedding",
    pq: tuple[int, int] | None = None,
    pq_n_iters: int = 0,
) -> None:
    """Materialize the IVF index: centroids + cell-partitioned corpus
    (float vectors AND SQ8 codes, so both search modes read one layout;
    pass ``pq=(m, ks)`` to additionally store PQ codes + codebooks — the
    FAISS "IVF,PQ" layout whose hot scan is m BYTES per vector).

    One shuffle on the cell assignment, then a partitioned write — the
    standard index-build cost. Deterministic for a given corpus (seeded
    centroids, quantized Lloyd refinement — see ``ivf_centroids``).
    """
    from kinesiscat_spark.operators.similarity import (
        _cents_relation,
        _collect_cents,
    )

    # one centroid collect for the write AND the assign (round 9; see
    # ivf_topk) — bit-identical doubles round-trip
    cents_rows = _collect_cents(
        ivf_centroids(corpus, n_cells, n_iters, id_col, vec)
    )
    cents = _cents_relation(corpus.sparkSession, cents_rows)
    cents.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    # Arrow corpus assign (round 6): bit-identical to the Column fold at
    # numpy constants; the READ path keeps the Column probe (queries are
    # tiny) so its plan stays EvalPython-free (test_plan_shape.py)
    cells = ivf_assign_arrow(corpus, cents, id_col, vec, _rows=cents_rows)
    codes = quantize_embeddings(corpus, id_col, vec).select(
        F.col(id_col), F.col("codes")
    )
    rows = corpus.select(id_col, vec).join(cells, id_col).join(codes, id_col)
    if pq is not None:
        m, ks = pq
        pq_cents = pq_train(corpus, m, ks, pq_n_iters, id_col, vec)
        pq_cents.write.mode("overwrite").parquet(f"{path}/pq_centroids.parquet")
        rows = rows.join(
            pq_encode(corpus, pq_cents, m, id_col, vec).select(
                F.col(id_col), F.col("codes").alias("pq_codes")
            ),
            id_col,
        )
    if rows.isEmpty():
        # partitionBy on an empty frame writes a directory with no parquet
        # footers — unreadable (UNABLE_TO_INFER_SCHEMA). Write the
        # schema-bearing empty file unpartitioned; the read path's cell
        # filter still applies (there is nothing to prune).
        rows.write.mode("overwrite").parquet(f"{path}/cells")
        return
    (
        rows.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/cells")
    )


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int,
    n_probe: int = 4,
    use_sq8: bool = False,
    use_pq: bool = False,
    rerank_k: int | None = None,
    query_id: str = "qid",
    vec: str = "embedding",
    id_col: str = "vec_id",
    _cents: DataFrame | None = None,
) -> DataFrame:
    """Top-k search against a persisted index.

    ``_cents`` injects an already-materialized centroid frame (the
    ``ivf_topk`` passthrough precedent) so a caller that probes the same
    persisted index repeatedly — the steady state the lane measures —
    skips the per-call centroids.parquet read; it must hold exactly the
    rows that file holds.

    ``use_sq8=False``: exact cosine inside the probed cells (ivf_topk
    semantics). ``use_sq8=True``: int8 phase-1 rank on the stored codes,
    exact float re-rank of the ``rerank_k`` survivors (ivf_sq_topk
    semantics) — the scan then prunes to the probed cells AND reads only
    the codes column for phase 1 (partition pruning × column pruning).
    ``use_pq=True`` (index built with ``pq=(m, ks)``): ADC phase-1 rank
    on the stored PQ codes (``pq_adc_topk`` semantics restricted to the
    probed cells) — the deepest compression: the phase-1 scan reads m
    longs per vector (m bytes in an int8 store), the FAISS "IVF,PQ"
    configuration that serves billion-vector deployments.
    """
    cents = (
        _cents
        if _cents is not None
        else spark.read.parquet(f"{path}/centroids.parquet")
    )
    # k-proportional metadata to the driver: the (query, cell) probe rows.
    # Collected ONCE (round 9) — the former plan recomputed the assign a
    # second time inside the q-side join after the distinct-cells collect;
    # a local relation of the same rows feeds both uses.
    assign = ivf_assign(queries, cents, query_id, vec, n_probe=n_probe)
    probe_rows = assign.collect()
    probes = spark.createDataFrame(probe_rows, assign.schema)
    probe_cells = sorted(
        {r[1] for r in probe_rows if r[1] is not None}
    )
    indexed = spark.read.parquet(f"{path}/cells").filter(
        F.col("cell").isin(probe_cells)
    )
    from kinesiscat_spark.expr_memo import expr_memo

    def build_exact() -> dict:
        w = Window.partitionBy(query_id).orderBy(F.desc("sim"), F.asc("cid"))
        return {
            "q_sel": [F.col(query_id), F.col(vec).alias("_qvec")],
            "sim_sel": [
                F.col(query_id),
                F.col(id_col).alias("cid"),
                cosine(F.col("_qvec"), F.col(vec)).alias("sim"),
            ],
            "rnk": F.row_number().over(w).cast("long"),
            "keep": F.col("rnk") <= k,
        }

    exx = expr_memo(
        ("ann.ivf_index_exact", query_id, id_col, vec, k), build_exact
    )
    q = queries.select(*exx["q_sel"]).join(probes, query_id)
    if not use_sq8 and not use_pq:
        # Column cosine, not the Arrow pair kernel: the candidate set is
        # already pruned to n_probe/n_cells of the corpus, so the
        # interpreted-fold cost is bounded, and keeping the whole read
        # path JVM-side makes the lane plan EvalPython-free
        # (test_plan_shape.py pins it).  cosine() folds in the same
        # order as pair_cosine_udf (differential-tested), so results
        # are bit-identical either way.
        cand = indexed.join(F.broadcast(q), "cell").select(*exx["sim_sel"])
        return cand.withColumn("rnk", exx["rnk"]).filter(exx["keep"])
    rerank_k = rerank_k or 4 * k
    if use_pq:
        # IVF,PQ: the probed-cell scan reads cell + pq_codes ONLY —
        # partition pruning × column pruning down to m longs per row
        # (m bytes in an int8 store); the float column is touched only
        # for the rerank_k survivors via the candidate-side broadcast.
        pq_cents = spark.read.parquet(f"{path}/pq_centroids.parquet")
        max_sub = pq_cents.agg(F.max("sub")).collect()[0][0]
        if max_sub is None:
            raise ValueError(
                f"{path}/pq_centroids.parquet is empty — was the index "
                "built from a non-empty corpus with pq=(m, ks)?"
            )
        m = max_sub + 1
        lut = pq_query_lut(queries, pq_cents, m, query_id, vec).join(
            probes, query_id
        )
        approx = (
            indexed.select(F.col(id_col).alias("cid"), "cell", "pq_codes")
            .join(F.broadcast(lut), "cell")
            .select(
                query_id,
                "cid",
                pq_adc_score(F.col("pq_codes"), F.col("_lut"), m).alias("_asim"),
            )
        )
        w1 = Window.partitionBy(query_id).orderBy(
            F.desc_nulls_last("_asim"), F.asc("cid")
        )
        cand = (
            approx.withColumn("_r", F.row_number().over(w1))
            .filter(F.col("_r") <= rerank_k)
            .select(query_id, "cid")
        )
        return exact_float_rerank(indexed, queries, cand, k, id_col, query_id, vec)
    def build_sq8() -> dict:
        w1 = Window.partitionBy(query_id).orderBy(
            F.desc_nulls_last("_asim"), F.asc("cid")
        )
        return {
            "qc_sel": [F.col(query_id), F.col("codes").alias("_qc")],
            "qn": F.sqrt(int8_dot(F.col("_qc"), F.col("_qc")).cast("double")),
            "scan_sel": [
                F.col(id_col).alias("cid"),
                F.col("cell"),
                F.col("codes").alias("_cc"),
            ],
            "cn": F.sqrt(int8_dot(F.col("_cc"), F.col("_cc")).cast("double")),
            "asim": F.try_divide(
                int8_dot(F.col("_qc"), F.col("_cc")).cast("double"),
                F.col("_qn") * F.col("_cn"),
            ).alias("_asim"),
            "r": F.row_number().over(w1),
            "keep": F.col("_r") <= rerank_k,
            "cand_sel": [F.col(query_id), F.col("cid")],
        }

    exs = expr_memo(
        ("ann.ivf_index_sq8", query_id, id_col, rerank_k), build_sq8
    )
    qc = (
        quantize_embeddings(queries, query_id, vec)
        .select(*exs["qc_sel"])
        .withColumn("_qn", exs["qn"])
        .join(probes, query_id)
    )
    scans = indexed.select(*exs["scan_sel"]).withColumn("_cn", exs["cn"])
    approx = scans.join(F.broadcast(qc), "cell").select(
        query_id, "cid", exs["asim"]
    )
    cand = (
        approx.withColumn("_r", exs["r"])
        .filter(exs["keep"])
        .select(*exs["cand_sel"])
    )
    return exact_float_rerank(indexed, queries, cand, k, id_col, query_id, vec)
