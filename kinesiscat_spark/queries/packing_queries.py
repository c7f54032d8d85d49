"""Sequence-packing lane (operators/packing.py — the concat-and-chunk
layout every pretraining pipeline runs; Brown et al. 2020 §2.3).

The layout is content-addressed (md5 shard routing) and id-ordered within
each shard, so the DuckDB oracle replays it ROW FOR ROW: same shards, same
running offsets, same (doc × sequence) incidence, same per-sequence token
intervals — a full hash check on a windowed/exploded distributed layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.packing import pack_sequences
from kinesiscat_spark.registry import query

BUDGET = 512
N_SHARDS = 8
CONTEXTS = (128, 512, 2048)
# token-length histogram grid (round 9): corpus doc lengths are 10-99
# whitespace tokens, so a width-8 16-bin grid populates ~12 bins
HIST_BINS = 16
HIST_WIDTH = 8
HIST_QS = (0.5, 0.9, 0.99)


def _efficiency_selects() -> str:
    """kind='efficiency' (round 7): the padding-waste report
    (operators/packing.py packing_efficiency_report) — per context
    length, total tokens / naive per-doc padding / packed per-shard
    padding, all exact integer arithmetic. Context rides seq, the naive
    total rides seq_off, the packed total rides n_in_seq."""
    rows = []
    for c in CONTEXTS:
        rows.append(f"""
UNION ALL
SELECT 'efficiency' AS kind, CAST(NULL AS INT) AS shard,
       CAST({c} AS BIGINT) AS seq, CAST(NULL AS BIGINT) AS id,
       (SELECT SUM(n_tokens) FROM base)::BIGINT AS n_tokens,
       (SELECT SUM(CAST(ceil(n_tokens / {c}.0) AS BIGINT) * {c})
        FROM base)::BIGINT AS seq_off,
       (SELECT SUM(CAST(ceil(st / {c}.0) AS BIGINT) * {c}) FROM
          (SELECT SUM(n_tokens)::BIGINT AS st FROM base GROUP BY shard)
       )::BIGINT AS n_in_seq""")
    return "".join(rows)

# DuckDB twin of pack_sequences: identical shard math ((md5_48 * n) >> 48),
# identical whitespace token counts (NULL text -> 0 tokens), identical
# cumulative window and floor-division sequence spans. generate_series is
# inclusive on both ends, matching Spark's sequence().
_PACKING_ORACLE = f"""
WITH base AS (
  SELECT CAST((('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
               * {N_SHARDS}) >> 48 AS INT) AS shard,
         doc_id AS id,
         CAST(CASE WHEN text IS NULL THEN 0
              ELSE len(string_split(lower(text), ' ')) END AS BIGINT) AS n_tokens
  FROM documents
),
spans AS (
  SELECT shard, id, n_tokens,
         CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS t_start,
         CAST(SUM(n_tokens) OVER w AS BIGINT) AS t_end
  FROM base
  WINDOW w AS (PARTITION BY shard ORDER BY id ROWS UNBOUNDED PRECEDING)
),
incidence AS (
  SELECT shard, id, n_tokens, t_start,
         unnest(generate_series(t_start // {BUDGET}, (t_end - 1) // {BUDGET}))
           AS seq
  FROM spans WHERE t_end > t_start
),
lh AS (
  SELECT LEAST(CAST(floor(n_tokens / {HIST_WIDTH}.0) AS BIGINT),
               {HIST_BINS - 1}) AS bin,
         COUNT(*)::BIGINT AS n_docs
  FROM base GROUP BY 1
),
lhc AS (
  SELECT bin, bin * {HIST_WIDTH} AS bin_lo, n_docs,
         SUM(n_docs) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(n_docs) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) - n_docs
           AS cum_before
  FROM lh
),
lhn AS (SELECT SUM(n_docs)::BIGINT AS n FROM lh),
lq AS (
  (SELECT 500 AS qp,
          bin_lo + {HIST_WIDTH}.0 * ((n * 0.5) - cum_before) / n_docs AS est
   FROM lhc, lhn WHERE cum >= n * 0.5 ORDER BY bin LIMIT 1)
  UNION ALL
  (SELECT 900 AS qp,
          bin_lo + {HIST_WIDTH}.0 * ((n * 0.9) - cum_before) / n_docs AS est
   FROM lhc, lhn WHERE cum >= n * 0.9 ORDER BY bin LIMIT 1)
  UNION ALL
  (SELECT 990 AS qp,
          bin_lo + {HIST_WIDTH}.0 * ((n * 0.99) - cum_before) / n_docs AS est
   FROM lhc, lhn WHERE cum >= n * 0.99 ORDER BY bin LIMIT 1)
)
SELECT 'layout' AS kind, shard, CAST(seq AS BIGINT) AS seq, id, n_tokens,
       CAST(greatest(t_start - seq * {BUDGET}, 0) AS BIGINT) AS seq_off,
       CAST(least(t_start + n_tokens, (seq + 1) * {BUDGET})
            - greatest(t_start, seq * {BUDGET}) AS BIGINT) AS n_in_seq
FROM incidence
UNION ALL
-- manifest twin (round 9, operators/packing.py export_manifest): per
-- shard, the auditable export record — digest = bit_xor of the 48-bit
-- md5 prefix of each (id, n_tokens) pair (rides seq), n_docs rides id,
-- max doc rides seq_off, sequence count rides n_in_seq
SELECT 'manifest' AS kind, shard, CAST(bit_xor(
         CAST(('0x' || substring(md5(CAST(id AS VARCHAR) || chr(31)
                  || CAST(n_tokens AS VARCHAR)), 1, 12))::BIGINT AS BIGINT)
       ) AS BIGINT) AS seq,
       COUNT(*)::BIGINT AS id, SUM(n_tokens)::BIGINT AS n_tokens,
       MAX(n_tokens)::BIGINT AS seq_off,
       CAST(ceil(SUM(n_tokens) / {BUDGET}.0) AS BIGINT) AS n_in_seq
FROM base GROUP BY shard
UNION ALL
-- token-length histogram (round 9, operators/packing.py
-- token_length_histogram): fixed-grid mergeable distribution sketch —
-- bin rides seq, count rides id, [bin_lo, bin_hi) ride n_tokens/seq_off
SELECT 'len_hist' AS kind, CAST(NULL AS INT) AS shard,
       bin AS seq, n_docs AS id, bin * {HIST_WIDTH} AS n_tokens,
       (bin + 1) * {HIST_WIDTH} AS seq_off, CAST(NULL AS BIGINT) AS n_in_seq
FROM lh
UNION ALL
-- interpolated quantiles off the histogram (histogram_quantiles):
-- q permille rides seq, the micro-quantized estimate rides n_tokens,
-- the grid-resolution error bound rides seq_off
SELECT 'len_q' AS kind, CAST(NULL AS INT) AS shard, qp AS seq,
       CAST(NULL AS BIGINT) AS id,
       CAST(round(est * 1e6) AS BIGINT) AS n_tokens,
       CAST({HIST_WIDTH} AS BIGINT) AS seq_off, CAST(NULL AS BIGINT) AS n_in_seq
FROM lq
{_efficiency_selects()}
"""


@query("packing_layout", oracle=_PACKING_ORACLE)
def packing_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators/packing.py pack_sequences): lay the
    documents table into {BUDGET}-token training sequences across
    {N_SHARDS} md5-routed shards; one row per (document × sequence it
    touches) with the exact token interval occupied.

    Scale shape: the shard is the unit of sequentiality — the only
    exchange carries (shard, id, n_tokens) into the per-shard cumulative
    window; the sequence span/offset arithmetic is scan-stage, and shard
    count is the knob that bounds per-task state (thousands of shards on
    a real cluster). Deterministic and partition-invariant by
    construction, which is exactly what the oracle hash-verifies.
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.packing import (
        packing_efficiency_report,
        whitespace_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize scan serves all five kinds (layout, efficiency,
    # manifest, len_hist→len_q each need only (doc_id, n_tokens)):
    # materialize the 2-column count frame once and feed it through the
    # operators' n_tokens_col path. At 100 TB the same sharing holds via
    # a persisted columnar intermediate (or simply re-scanning — the
    # text column never moves either way); identical arithmetic to the
    # operators' internal tokenizer, which the oracle hash re-proves.
    # NOT checkpointed: every consumer is a cheap aggregate over this
    # 2-column frame, and fusing all branches into the one collect job
    # measured ~2x faster than splitting the plan with a materialization
    # (fixed per-job cost dominates at bench scale; at 100 TB the
    # duplicate scans stay map-side and the text column never moves)
    ntok = docs.select(
        "doc_id", whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    layout = pack_sequences(
        ntok, budget=BUDGET, n_shards=N_SHARDS, id_col="doc_id",
        n_tokens_col="n_tokens",
    ).select(F.lit("layout").alias("kind"), "*")
    # kind='efficiency' (round-7 continuation): the padding-waste report
    # that justifies packing — context rides seq, naive/packed padded
    # totals ride seq_off/n_in_seq, all exact integers.
    eff = packing_efficiency_report(
        ntok, CONTEXTS, n_shards=N_SHARDS, n_tokens_col="n_tokens"
    ).select(
        F.lit("efficiency").alias("kind"),
        F.lit(None).cast("int").alias("shard"),
        F.col("context").alias("seq"),
        F.lit(None).cast("long").alias("id"),
        F.col("total_tokens").alias("n_tokens"),
        F.col("padded_naive").alias("seq_off"),
        F.col("padded_packed").alias("n_in_seq"),
    )
    # kind='manifest' (round 9, operators/packing.py export_manifest):
    # the per-shard export audit record — exact doc/token mass, the
    # engine-portable order-insensitive md5 membership digest, the skew
    # and sequence-count columns. What a consumer verifies before
    # training on a 100 TB export; one groupBy(shard) over the same
    # routing the layout ships with.
    from kinesiscat_spark.operators.packing import export_manifest

    man = export_manifest(
        ntok, BUDGET, n_shards=N_SHARDS, n_tokens_col="n_tokens"
    ).select(
        F.lit("manifest").alias("kind"),
        "shard",
        F.col("digest").alias("seq"),
        F.col("n_docs").alias("id"),
        "n_tokens",
        F.col("max_doc_tokens").alias("seq_off"),
        F.col("n_sequences").alias("n_in_seq"),
    )
    # kinds 'len_hist' + 'len_q' (round 9): the fixed-grid MERGEABLE
    # token-length histogram and its interpolated quantiles — the
    # distribution that justifies the budget choice; counts merge by
    # addition across shards/partitions/days (the 100 TB path), the
    # quantile estimates carry an explicit grid-resolution error bound.
    from kinesiscat_spark.operators.packing import (
        histogram_quantiles,
        token_length_histogram,
    )

    null_i = F.lit(None).cast("int")
    null_l = F.lit(None).cast("long")
    hist = token_length_histogram(
        ntok, n_bins=HIST_BINS, bin_width=HIST_WIDTH,
        n_tokens_col="n_tokens",
    )
    lh = hist.select(
        F.lit("len_hist").alias("kind"),
        null_i.alias("shard"),
        F.col("bin").alias("seq"),
        F.col("n_docs").alias("id"),
        F.col("bin_lo").alias("n_tokens"),
        F.col("bin_hi").alias("seq_off"),
        null_l.alias("n_in_seq"),
    )
    lq = histogram_quantiles(hist, HIST_QS, bin_width=HIST_WIDTH).select(
        F.lit("len_q").alias("kind"),
        null_i.alias("shard"),
        F.col("q_permille").cast("long").alias("seq"),
        null_l.alias("id"),
        F.round(F.col("est") * 1e6).cast("long").alias("n_tokens"),
        F.col("err_bound").cast("long").alias("seq_off"),
        null_l.alias("n_in_seq"),
    )
    from kinesiscat_spark.debug_digests import observe_kind_digests

    return observe_kind_digests(
        layout.unionByName(eff)
        .unionByName(man)
        .unionByName(lh)
        .unionByName(lq),
        "packing_layout",
        ["layout", "efficiency", "manifest", "len_hist", "len_q"],
    )
