"""Physical-plan regression tests for the headline queries.

Correctness is the oracle's job (``tools/oracle_check.py``); these tests pin
the *plan shape* that makes each query viable at 100 TB — filters reaching
the parquet scan, column pruning, dimension broadcasts, and a Python-free
hot path (SURVEY §4).  A refactor that silently turns a broadcast join into
a shuffle or drags a pandas UDF into a scan-agg pipeline fails here long
before it shows up as a bench regression.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    qs = entrymod.queries()

    def plan(name: str) -> str:
        df = qs[name](spark, SF_DIR)
        return df._jdf.queryExecution().explainString(mode)

    return plan


def test_q1_scan_pushdown_and_pruning(plans):
    s = plans("tpch_q1_pricing_summary")
    # shipdate filter reaches the parquet reader
    assert "LessThanOrEqual(l_shipdate" in s
    # column pruning: the scan must not read join keys the query never uses
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read and all("l_partkey" not in l and "l_suppkey" not in l for l in read)
    # pure JVM pipeline: partial agg -> exchange -> final agg, no Python
    assert "EvalPython" not in s
    assert "HashAggregate" in s


def test_q3_selective_filters_and_broadcast(plans):
    s = plans("tpch_q3_shipping_priority")
    assert "EqualTo(c_mktsegment,BUILDING)" in s  # pushed to customer scan
    assert "LessThan(o_orderdate" in s  # pushed to orders scan
    assert "GreaterThan(l_shipdate" in s  # pushed to lineitem scan
    assert "BroadcastHashJoin" in s  # filtered customer broadcasts
    assert "EvalPython" not in s


def test_q5_dims_broadcast(plans):
    s = plans("tpch_q5_local_supplier")
    # supplier + nation + region must all broadcast; no shuffle join of a
    # dim against the fact pipeline at any SF
    assert s.count("BroadcastHashJoin") >= 3
    assert "GreaterThanOrEqual(o_orderdate" in s
    assert "EvalPython" not in s


def test_jmespath_filter_is_native(plans):
    # the JMESPath expression compiled to Columns — no Python in the plan
    s = plans("jp_filter_compare")
    assert "EvalPython" not in s
    assert "codegen id" in s
    # json field pruning: the from_json schema narrows to the referenced key
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read and all("user_id" not in l for l in read)


def test_exact_dedup_single_shuffle(plans):
    s = plans("dedup_exact")
    assert "EvalPython" not in s
    # one logical shuffle on the dedup key (AQE may print the exchange in
    # both initial and final sections; assert the *distinct* exchange ids)
    ex = {l.split("Exchange", 1)[0].strip() for l in s.splitlines() if "Exchange" in l and "Reused" not in l}
    assert len(ex) >= 1


def test_q6_pure_pushdown(plans):
    # q6 lives in the merged lineitem_scalar_aggregates lane (round-6
    # fold) — its branch must still push all three predicates to the scan
    s = plans("lineitem_scalar_aggregates")
    assert "GreaterThanOrEqual(l_shipdate" in s
    assert "GreaterThanOrEqual(l_discount" in s
    assert "LessThan(l_quantity" in s
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read and all("l_returnflag" not in l for l in read)
    assert "EvalPython" not in s


def test_events_topk_native_window(plans):
    s = plans("events_topk_users_per_type")
    assert "EvalPython" not in s


def _final_plan(spark, df) -> str:
    """Execute and return the AQE FINAL plan section (the plan that ran)."""
    df.collect()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    s = df._jdf.queryExecution().explainString(mode)
    if "== Final Plan ==" in s:
        s = s.split("== Final Plan ==", 1)[1].split("== Initial Plan ==", 1)[0]
    return s


def test_minhash_single_kernel_join_est_codegen(spark):
    """Minhash runs exactly ONE Arrow signature kernel at runtime — both
    self-join sides share the band-key exchange (ReusedExchange); the
    candidate join and the agreement estimate stay JVM-side (scalar column
    comparisons, no interpreted HOFs over signature arrays). Pinned at
    the OPERATOR (round 7: the lane materializes the pair frame once
    behind localCheckpoint for its four kinds, so the pipeline no longer
    appears in the lane plan); the lane must read the checkpointed frame,
    not replan the pipeline per branch."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs

    df = minhash_lsh_pairs(
        load_table(spark, SF_DIR, "documents"), 0.5, 32, 8
    )
    s = _final_plan(spark, df)
    assert s.count("ArrowEvalPython") == 1
    assert "ReusedExchange" in s
    assert "zip_with" not in s and "ZipWith" not in s
    lane = _final_plan(
        spark, entrymod.queries()["dedup_minhash_lsh"](spark, SF_DIR)
    )
    assert "ExistingRDD" in lane
    assert "ArrowEvalPython" not in lane


def test_fingerprint_single_kernel_pass(plans):
    """Winnowing runs ONE Arrow kernel (one md5 per k-gram); the Column
    spec's multi-slice form would show repeated md5 subtrees instead."""
    s = plans("text_fingerprint")
    # formatted explain prints each node twice (tree + detail); count the
    # detail headers "(n) ArrowEvalPython" for the true node count
    assert sum(1 for l in s.splitlines() if l.strip().endswith("ArrowEvalPython")) == 1
    assert "md5" not in s  # hashing is inside the kernel, not the plan


def test_embedding_near_dup_no_cartesian_no_table_broadcast(plans, spark):
    """The block nested-loop pairs packed CHUNKS via a co-partitioned
    equi-join on (ck_a, ck_b) — never a cartesian of row-level vectors,
    and never a FORCED broadcast of the packed vector table (VERDICT r2
    #4: the only broadcast hint is the 1-row chunk-id bounds aggregate).
    AQE may still elect to broadcast a small side at test scale, so the
    forced-broadcast check runs with auto-broadcast disabled: any
    BroadcastExchange that survives is hint-driven."""
    s = plans("dedup_embedding_cosine")
    assert "CartesianProduct" not in s
    # chunk packing is one hash aggregation over the chunk id
    assert "HashAggregate" in s or "ObjectHashAggregate" in s
    assert "mapInPandas" in s.lower() or "MapInPandas" in s

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        for k in saved:
            spark.conf.set(k, "-1")
        df = entrymod.queries()["dedup_embedding_cosine"](spark, SF_DIR)
        for block in _explain_blocks(df):
            if "BroadcastExchange" in block:
                assert "rows" not in block, "packed vector table is broadcast"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_simhash_band_join_shares_signature_exchange(spark):
    """Both sides of the band self-join must reuse ONE signature
    computation: after execution the adaptive plan shows a ReusedExchange
    (or a single python-kernel stage), not two kernel evaluations."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.dedup import simhash_pairs

    df = simhash_pairs(load_table(spark, SF_DIR, "documents"), 3)
    s = _final_plan(spark, df)
    assert s.count("ArrowEvalPython") == 1
    assert "ReusedExchange" in s


def test_temporal_joins_no_nested_loop(plans):
    """Both temporal joins live in the merged events_temporal_joins lane
    (round-6 fold). The as-of side must be the union+window single-shuffle
    form and the bucketed interval side a plain equi-join — an
    inequality-join formulation of either would plan a
    BroadcastNestedLoopJoin whose candidate set explodes at scale."""
    s = plans("events_temporal_joins")
    assert "BroadcastNestedLoopJoin" not in s
    assert "CartesianProduct" not in s
    assert "Window" in s
    assert "Union" in s
    assert "BroadcastHashJoin" in s or "SortMergeJoin" in s or "ShuffledHashJoin" in s


def _explain_blocks(df) -> list[str]:
    """Formatted-explain detail blocks, one per physical node."""
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return s.split("\n\n")


def test_ivf_assign_exchange_carries_no_vectors(spark):
    """VERDICT r2 #6: the n_probe=1 assign is a partial-combined min-struct
    aggregation — the shuffle ships (id, dist, cell), never the vectors."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.similarity import ivf_assign, ivf_centroids

    emb = load_table(spark, SF_DIR, "embeddings")
    df = ivf_assign(emb, ivf_centroids(emb, 8), n_probe=1)
    blocks = _explain_blocks(df)
    assert any("partial_min" in b for b in blocks)  # map-side combine
    shuffles = [b for b in blocks if "hashpartitioning(vec_id" in b]
    assert shuffles
    for b in shuffles:
        assert "_v#" not in b and "cvec#" not in b and "embedding#" not in b


def test_lloyd_loop_norm_is_materialized_once(spark):
    """VERDICT r3 #2: the Lloyd refinement must not normalize() the corpus
    — the norm has to be ONE materialized attribute (computed once per
    row) that the exploded elements divide by. A normalize() regression
    shows up as a lambdafunction (with the full norm fold inside) in the
    Generate node's generator or in the avg aggregate.  Round 6: the
    public ivf_centroids materializes each iteration's k rows (its final
    plan is a local relation), so the pin inspects the lazy _lloyd_step
    pipeline the loop executes."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.similarity import _lloyd_step, ivf_centroids

    emb = load_table(spark, SF_DIR, "embeddings")
    df = _lloyd_step(emb, ivf_centroids(emb, 8), "vec_id", "embedding", 12)
    blocks = _explain_blocks(df)
    gens = [b for b in blocks if "(\n" not in b and "Generate" in b and "posexplode" in b]
    assert gens, "expected a posexplode Generate node in the Lloyd loop"
    for b in gens:
        assert "lambdafunction" not in b, "corpus-wide normalize() is back"
    # the per-dimension mean consumes x / _n (two attributes), not an
    # inlined norm fold
    avgs = [b for b in blocks if "partial_avg" in b]
    assert avgs and all("aggregate(" not in b for b in avgs)


def test_lsh_topk_dedup_exchange_carries_no_vectors(spark):
    """VERDICT r2 #7: the candidate dedup shuffles (qid, cid) only;
    vectors are joined back after deduplication."""
    df = entrymod.queries()["similarity_topk_lsh"](spark, SF_DIR)
    blocks = _explain_blocks(df)
    dedup = [
        b for b in blocks
        if "Exchange" in b and "hashpartitioning(qid" in b and "cid" in b
    ]
    assert dedup
    for b in dedup:
        assert "_qvec" not in b and "_cvec" not in b and "embedding" not in b


def test_decontaminate_one_pass_broadcast(plans):
    """The exact half of contamination_report makes ONE pass over the
    corpus grams (corpus explode LEFT-joined against the broadcast
    benchmark gram set, one aggregation); the bloom half adds exactly
    three more Generates (its own corpus explode, the build's position
    explode, the candidate explode) — a double corpus explode for
    totals in EITHER half would raise the count. All THREE benchmark
    gram consumers (exact broadcast, bloom build, bloom verify) read
    the lane's single materialized gram set (round 9), so no benchmark
    explode appears at all: 4 Generates total, plus the checkpoint's
    RDD scans. The only Python is the round-7 SEMANTIC branch's
    deliberate Arrow kernel (one per-row batch kernel over the
    embeddings scan — never a row-at-a-time BatchEvalPython)."""
    s = plans("curation_decontaminate")
    assert "BroadcastExchange" in s or "BroadcastHashJoin" in s
    assert "BatchEvalPython" not in s
    import re

    assert len(re.findall(r"^\(\d+\) MapInPandas", s, re.M)) == 1
    assert "ArrowEvalPython" not in s
    assert len(re.findall(r"^\(\d+\) Generate", s, re.M)) == 4
    assert "Scan ExistingRDD" in s  # the shared benchmark gram set


def test_bloom_probe_stays_out_of_object_agg(plans):
    """The bloom membership probes must evaluate in a codegen Project,
    never inside the collect_list ObjectHashAggregate (interpreted,
    no whole-stage codegen — hoisting the getbit/transform chain there
    measured ~40× slower per row)."""
    import re

    s = plans("curation_decontaminate")
    # formatted explain: the details block for each node starts with its
    # "(id) NodeName" header; collect the ObjectHashAggregate blocks
    blocks = re.split(r"^\((\d+)\) ", s, flags=re.M)
    for header, body in zip(blocks[1::2], blocks[2::2]):
        if body.startswith("ObjectHashAggregate"):
            assert "getbit" not in body, f"probe inside node ({header})"
    assert "getbit" in s  # the probes exist somewhere (a Project)


def test_curation_signals_scan_stage(plans):
    """The repetition+PII signals lane is pure scan-stage: no exchange at
    all, no Python — per-row cost only, the shape that scales linearly."""
    s = plans("curation_signals")
    assert "Exchange" not in s
    assert "EvalPython" not in s


def test_packing_single_exchange_no_python(spark, plans):
    """pack_sequences: the ONLY exchange in the operator's plan is the
    per-shard window's hash partitioning on (shard) — the span/offset
    arithmetic after it is scan-stage — and the whole plan is
    Python-free. Pinned at the OPERATOR (round 7: the lane unions the
    efficiency report, whose bounded shard aggregate adds its own
    exchange); the lane plan stays Python-free and column-pruned."""
    import re

    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.packing import pack_sequences

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    df = pack_sequences(
        load_table(spark, SF_DIR, "documents"), budget=512, n_shards=8
    )
    s = df._jdf.queryExecution().explainString(mode)
    exchanges = re.findall(r"^\(\d+\) Exchange", s, re.M)
    assert len(exchanges) == 1, s
    assert "hashpartitioning(shard" in s
    assert "ArrowEvalPython" not in s and "BatchEvalPython" not in s
    # the scan reads only what packing needs (id + text), not the whole row
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read and all("lang" not in l and "source" not in l for l in read)

    lane = plans("packing_layout")
    assert "ArrowEvalPython" not in lane and "BatchEvalPython" not in lane
    lane_read = [l for l in lane.splitlines() if "ReadSchema" in l]
    assert lane_read and all(
        "lang" not in l and "source" not in l for l in lane_read
    )


def test_ppjoin_suffix_filter_in_join_codegen(spark):
    """Round 5: all three PPJoin filters (length, positional, suffix) run
    INSIDE the candidate join's condition — before the dedupe exchange —
    not as a post-join Filter node over materialized candidates.
    Pinned at the OPERATOR plan (round-7: the lane now materializes the
    pair frames once behind localCheckpoint for its three consumers, so
    the join no longer appears in the lane's own plan)."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.dedup import ngram_jaccard_pairs

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    df = ngram_jaccard_pairs(load_table(spark, SF_DIR, "documents"), 0.4)
    s = df._jdf.queryExecution().explainString(mode)
    conds = [l for l in s.splitlines() if "Join condition:" in l]
    # the suffix bound compares the pivot structs (w) and partition sizes
    # inside a join condition (broadcast at tiny SF, shuffled at scale)
    assert any("w#" in c and "l#" in c and "r#" in c for c in conds), conds


def test_semdedup_equijoin_and_broadcast_centroids(plans):
    """SemDeDup's quadratic stage must stay confined per cell: the
    self-join hashes on the cell key (never BroadcastNestedLoop /
    Cartesian over the corpus); the scan+assign+rank pipeline is
    materialized ONCE behind a checkpoint and read by all three
    consumers (both self-join sides + the flag join).  The only Python
    is the single Arrow ASSIGN kernel (round 6, ivf_assign_arrow —
    bit-identical to the Column fold, pinned in test_semdedup.py), and
    it lives in the once-materialized lineage, so at most one
    ArrowEvalPython node may appear; the quadratic self-join itself
    stays JVM-side.  The assign stage's broadcast-centroid shape is
    pinned separately in test_ivf_assign_exchange_carries_no_vectors."""
    s = plans("dedup_semantic")
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin LeftSemi" not in s
    assert ("SortMergeJoin LeftSemi" in s) or ("ShuffledHashJoin LeftSemi" in s)
    # the checkpointed ranked table is what the join sides scan — the
    # expensive assign/rank pipeline must not be replanned per branch
    assert "ExistingRDD" in s
    assert "BatchEvalPython" not in s
    assert s.count("ArrowEvalPython") <= 2  # tree + detail line of ONE node


def test_heavy_hitters_sketch_probe_in_project(plans):
    """The count-min probe must evaluate in a Project (whole-stage
    codegen), the sketch must broadcast, and the only corpus-keyed
    exchange is the survivor-only exact count — no Python anywhere."""
    s = plans("text_heavy_ngrams")
    assert "BroadcastExchange" in s
    assert "CartesianProduct" not in s
    assert "Python" not in s and "ArrowEval" not in s
    # the estimate filter runs before the gram aggregation: a Filter
    # mentioning the cms array appears below the final HashAggregate
    assert "cms" in s


def test_pca_lane_projection_no_exchange(plans):
    """The embeddings_pca lane (round 6) runs the fixed-basis projection
    scan-stage: posexplode of dim_out coordinates per row, zero
    exchanges, zero Python — the plan that makes PCA a free preprocessing
    pass at 100 TB."""
    s = plans("embeddings_pca")
    assert "Exchange" not in s
    assert "Python" not in s and "ArrowEval" not in s


def test_ivf_index_read_path_no_python(spark):
    """The persisted-index read path (similarity_topk_ivf lane,
    method='ivf_index') must be EvalPython-free end to end: the re-rank
    is the Column cosine kernel, and the probed-cell restriction reaches
    the scan as a partition filter (VERDICT r5 task 6)."""
    from kinesiscat_spark.operators.ann_index import ivf_index_topk
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.queries.similarity_queries import (
        N_PROBE,
        N_QUERIES,
        TOP_K,
        _ivf_index_dir,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    df = ivf_index_topk(
        spark, _ivf_index_dir(spark, SF_DIR), queries, TOP_K, n_probe=N_PROBE
    )
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    s = df._jdf.queryExecution().explainString(mode)
    # no Python EVALUATION nodes (the round-9 probe local relation's RDD
    # callsite string mentions applySchemaToPythonRDD — that is driver
    # metadata entering the plan, not per-row Python execution)
    for node in ("EvalPython", "ArrowEval", "MapInArrow", "InPandas"):
        assert node not in s, node
    assert "PartitionFilters: [cell" in s or "cell#" in s


def test_partsupp_tpch_lanes_jvm_side(plans):
    """The round-6 TPC-H widenings stay pure-JVM: no Python anywhere in
    the four widened relational lanes, and the only cartesian product is
    the deliberate derived-partsupp generator (part x supplier, dim-sized
    at any SF — see relational.PARTSUPP_SQL)."""
    for lane in (
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "orders_priority_custdist",
        "customers_no_big_orders",
        "lineitem_scalar_aggregates",
    ):
        s = plans(lane)
        assert "EvalPython" not in s, lane
        assert "BroadcastHashJoin" in s, lane


def test_q9_partsupp_folds_to_scan_stage(plans):
    """Q9's derived-partsupp 'join' must be a scan-stage key expression on
    lineitem (membership filter + inline supplycost), NOT a join against a
    materialized view — the 2.5x round-6 fix. The q5 lane's plan must
    contain the membership predicate and no partsupp-side exchange for it."""
    s = plans("tpch_q5_local_supplier")
    # the membership filter reaches the lineitem side as a plain predicate
    assert "% 4" in s
    # supplycost is computed inline (the *7/*13 key expression), never read
    assert "ps_supplycost" in s and "* 13" in s


def test_no_forced_broadcast_of_per_document_frames():
    """Source audit (round-7, VERDICT r6 #2): every `F.broadcast(...)` hint
    in the package must target a BOUNDED frame — query sets, centroids,
    LUTs, 1-row stats/bounds, LM/model tables, TPC-H dimensions. A hint on
    a per-document frame (one row per corpus doc, e.g. shingle-size frames)
    overrides AQE's size check and is a driver/executor OOM at 100 TB.

    The whitelist below pins the leading identifier of every allowed
    broadcast argument per file. Adding a new `F.broadcast` site fails this
    test until the new frame's boundedness is argued here.
    """
    import ast
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "kinesiscat_spark"
    allowed = {
        # ANN/quantize/similarity: query frames, centroid tables, LUTs —
        # bounded by n_queries x k / n_cells x dim, never by corpus rows.
        "operators/ann_index.py": {"qc", "q", "lut"},
        "operators/quantize.py": {"q_norm", "cand", "lut", "qv", "cents"},
        "operators/similarity.py": {"q", "centroids", "qv"},
        "operators/semdedup.py": {"cents"},
        # curation: benchmark gram set / bloom bits / benchmark embedding
        # rows — all bounded by the reference benchmark (test sets), not
        # the corpus (documented opt-in for grams).
        "operators/curation.py": {"bench_grams", "bloom", "bench_rows"},
        # 1-row frames: chunk bounds, weight rows, sketch rows, stats;
        # "n1" = calibration_report's 1-row corpus count.
        "operators/dedup.py": {"bounds"},
        "operators/quality_classifier.py": {"wrow", "n1"},
        "operators/sketches.py": {"cms"},
        # LM/model tables: bounded by the reference-corpus vocab (see the
        # bigram size guard in operators/text.py). "g"/"z" = DoReMi's
        # 1-row global-loss and normalizer aggregates (domain-count-
        # bounded inputs, single-row outputs).
        "operators/sampling.py": {"m_r", "m_t", "g", "z"},
        # "n1" = inter_event_gap_percentiles' 1-row total-gap count.
        "operators/funnel.py": {"n1"},
        # "total" = token_length_quantiles' 1-row histogram-mass count.
        "operators/packing.py": {"total"},
        # "back" = the Kneser-Ney continuation fan-in table — vocab-sized,
        # same boundedness (and the same size switch) as "ctx"/"bi";
        # "kbi"/"kctx"/"kback" = the fused bigram+KN scorer's KN tables
        # (round 9) — the same bigram/vocab-bounded frames behind the
        # same n_types <= broadcast_rows size switch.
        # "total" = rm3_terms' 1-row feedback score sum; "model" also
        # covers rm3_topk's ≤(|Q|+fb_terms)-row term frame.
        "operators/text.py": {"stats", "model", "un", "cuts", "ctx", "bi",
                              "back", "total", "kbi", "kctx", "kback"},
        "queries/text_queries.py": {"model"},
        # pipelines: bloom bits row + collected benchmark gram set.
        "pipelines.py": {"frozenset", "bits"},
        # TPC-H dimension tables (nation/region/part/supplier/customer
        # subsets and 1-row aggregates) — dim-sized at any SF.
        "queries/relational.py": {
            "asia_supp", "region", "part2", "supp", "nation", "n1", "n2",
            "asia", "cust_b", "cust", "promo", "part",
        },
        "queries/relational_ext.py": {
            "n5_supp", "nation", "supp", "total", "excess_supp", "part_all",
            "bad_supp", "max_rev", "part16", "std_parts", "part", "avg_bal",
        },
    }
    violations = []
    for p in sorted(root.rglob("*.py")):
        rel = str(p.relative_to(root))
        src = p.read_text()
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "broadcast"
                and node.args
            ):
                seg = ast.get_source_segment(src, node.args[0]) or "?"
                head = seg.split("(")[0].split(".")[0].strip()
                if head not in allowed.get(rel, set()):
                    violations.append(f"{rel}:{node.lineno} F.broadcast({seg})")
    assert not violations, (
        "unreviewed F.broadcast hint(s) — argue boundedness in the "
        "whitelist or drop the hint (AQE broadcasts small frames itself):\n"
        + "\n".join(violations)
    )


def test_round7_operators_jvm_side_no_text_in_wide_exchanges(spark):
    """The round-7 operators stay pure-JVM and their corpus-wide
    exchanges never carry document text (novelty: 64-bit shingle hashes;
    line dedup's frequency count: 64-bit line hashes; vocab coverage:
    vocabulary-sized rank window):
    - no EvalPython anywhere;
    - no Exchange whose partitioning expression mentions the text column
      (the per-doc line REBUILD legitimately groups lines by id — that
      exchange is keyed on id, not text)."""
    import re

    from kinesiscat_spark.operators.curation import dedup_lines_across_docs
    from kinesiscat_spark.operators.text import ngram_novelty, vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for name, df in [
        ("novelty", ngram_novelty(docs)),
        ("line_dedup", dedup_lines_across_docs(docs)),
        ("vocab_coverage", vocab_coverage(docs)),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, name
        assert not re.search(
            r"Exchange hashpartitioning[^\n]*\btext\b", plan
        ), name


def test_semantic_contamination_scan_stage(spark):
    """The arrow semantic-decontamination path is ONE corpus scan with a
    per-row kernel — zero exchanges; the bench matrix rides the closure."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.curation import (
        semantic_contamination_report,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_contamination_report(
        emb, emb.filter(F.col("vec_id") % 9 == 0), tau=0.4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_prototype_prune_scan_stage_single_exchange(spark):
    """Cluster pruning is literal-prototype Column algebra: no Python
    anywhere, and the ONLY exchange is the per-cell rank window."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.sampling import prototype_prune
    from kinesiscat_spark.queries.prototypes import PROTOTYPES

    emb = load_table(spark, SF_DIR, "embeddings")
    p = (
        prototype_prune(emb, PROTOTYPES, 24)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in p
    assert p.count("Exchange") == 1
    assert "hashpartitioning(cell" in p


def test_corpus_minhash_single_corpus_pass(spark):
    """The pairwise self-join must NOT re-run the corpus signature
    pipeline per side: signatures are materialized once (n_groups rows),
    so the final plan holds ONE group exchange and zero parquet scans."""
    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.dedup import corpus_minhash_similarity

    docs = load_table(spark, SF_DIR, "documents")
    p = (
        corpus_minhash_similarity(docs, n_hashes=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in p
    # the checkpointed signature table feeds BOTH join sides: the corpus
    # scan + signature aggregation appear at most once in the plan (zero
    # once the checkpoint has materialized), never once per side
    assert p.count("Scan parquet") + p.count("FileScan") <= 1
    assert p.count("Exchange hashpartitioning(grp") <= 1


def test_export_manifest_one_aggregate_no_python(spark):
    """export_manifest (round 9): one partial+final hash aggregate over
    (shard) — text never shuffles (the exchange carries the n_shards
    grouped rows, not documents), no Python, and the scan reads only the
    two columns the manifest needs."""
    import re

    from kinesiscat_spark.io_tables import load_table
    from kinesiscat_spark.operators.packing import export_manifest

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    df = export_manifest(
        load_table(spark, SF_DIR, "documents"), budget=512, n_shards=8
    )
    s = df._jdf.queryExecution().explainString(mode)
    exchanges = re.findall(r"^\(\d+\) Exchange", s, re.M)
    assert len(exchanges) == 1, s
    assert "hashpartitioning(shard" in s
    assert "ArrowEvalPython" not in s and "BatchEvalPython" not in s
    read = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read and all("lang" not in l and "source" not in l for l in read)
