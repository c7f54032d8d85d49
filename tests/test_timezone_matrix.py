"""Non-UTC parity sweep (VERDICT r2 #9): the oracle-parity gate must
hold when the host/JVM/session timezone is not UTC — the interval-join and
events-timestamp class of bug regresses silently otherwise.

Runs tools/oracle_check.py in a SUBPROCESS so TZ reaches JVM startup (the
JVM default zone, and therefore spark.sql.session.timeZone, is fixed at
launch — an in-process conf flip would not exercise the Python-side
datetime handling or DuckDB's zone).

The UTC leg is the regular test_oracle_parity.py suite; this file adds the
America/New_York leg at the smoke scale. Round 10 (VERDICT r9 item 2 —
the full suite outgrew the driver's verify window): the non-UTC leg runs
only the lanes that can SEE a timezone — those reading a table with a
TIMESTAMP/DATE column (events, orders, lineitem) or running a streaming
drain. Lanes over documents/embeddings alone carry no temporal value in
any input or output, so their plans are timezone-inert by construction;
``test_tz_partition_is_total`` pins that every registered lane is
explicitly classified, so a new lane fails here until it is.
"""

from __future__ import annotations

import os
import subprocess
import sys

from tests.conftest import REPO, SF_SMOKE

# Lanes whose inputs carry TIMESTAMP/DATE columns (events.ts,
# orders.o_orderdate, lineitem.l_*date) or that drain a streaming source.
TZ_SENSITIVE = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "lineitem_scalar_aggregates",
    "orders_priority_custdist",
    "customers_no_big_orders",
    "revenue_rollup_nation_segment",
    "analytics_windows_setops",
    "events_tumbling_window",
    "events_sessionization",
    "events_topk_users_per_type",
    "events_temporal_joins",
    "envelope_formats",
    "jp_filter_compare",
    "jp_array_index_slice",
    "jp_udf_dynamic",
    "jp_object_functions",
    "jp_error_fidelity",
    "stream_stateful_dedup",
    "stream_lag_metric",
    "stream_tumbling_window",
    "stream_minhash_candidates",
    "stream_config_echo",
)

# Lanes over documents/embeddings only: no temporal column exists in any
# input table or output row, so no timezone-dependent expression can
# appear in their plans.
TZ_INERT = (
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_semantic",
    "dedup_incremental",
    "sampling_mix",
    "curation_signals",
    "curation_span_dup",
    "curation_decontaminate",
    "curation_pipeline",
    "text_quality_score",
    "text_fingerprint",
    "text_bm25_topk",
    "text_bpe_train",
    "text_quality_classifier",
    "text_chunks_shuffled",
    "text_heavy_ngrams",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "similarity_topk_quantized",
    "similarity_topk_ivf_sq",
    "similarity_hybrid_rrf",
    "packing_layout",
    "embeddings_pca",
    "multimodal_frame_ops",
)


def test_tz_partition_is_total():
    from kinesiscat_spark.registry import all_queries

    names = set(all_queries())
    classified = set(TZ_SENSITIVE) | set(TZ_INERT)
    assert names == classified, (
        f"unclassified lanes: {sorted(names - classified)}; "
        f"stale entries: {sorted(classified - names)}"
    )
    assert not set(TZ_SENSITIVE) & set(TZ_INERT)


def test_oracle_parity_in_new_york():
    env = dict(os.environ, TZ="America/New_York")
    proc = subprocess.run(
        [
            sys.executable,
            "tools/oracle_check.py",
            "--bare",
            SF_SMOKE,
            *TZ_SENSITIVE,
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    tail = "\n".join(proc.stdout.splitlines()[-60:])
    assert proc.returncode == 0, f"non-UTC parity sweep failed:\n{tail}"
    assert "all queries match" in proc.stdout
