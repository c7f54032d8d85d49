"""Chunking + deterministic-shuffle lane: document chunks (the RAG /
context-window operator) with their global training ORDER materialized
as data — closing the last pytest-only sampling surfaces
(`chunk_documents`, `deterministic_shuffle`) with a full hash twin.

Order is checkable because the shuffle is content-hashed: the lane
emits each chunk's global rank under the md5 order (the engine-portable
method of `deterministic_shuffle`), so the DuckDB twin must reproduce
the exact permutation, not just the row set.  The lane ranks through a
global window for checkability; production uses the range-exchange sort
(`deterministic_shuffle` itself) — same order by construction.

Registered past the driver's 50-lane cap; `tests/test_oracle_parity.py`
runs the identical sf0.01 hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.registry import query

_CHUNK = 32
_OVERLAP = 8
_STEP = _CHUNK - _OVERLAP
_SHUF_SALT = 3
_FIM_RATE = 0.5
_FIM_SALT = 41

# FIM replay (Bavarian et al. 2022): three 48-bit dyadic u's per doc
# (the DSIR recipe), char offsets a = floor(u1·L) / b = floor(u2·L)
# ordered, PSM concat — pure string arithmetic, identical in any engine.
_FIM_U = (
    "(concat('0x', substr(md5(doc_id || chr(31) || '{s}'), 1, 12)))::BIGINT"
    " / 281474976710656.0"
)

_FIM_CTE = f"""
fimu AS (
  SELECT doc_id, text, coalesce(text, '') AS txt,
         length(coalesce(text, ''))::BIGINT AS L,
         {_FIM_U.format(s=_FIM_SALT)} AS u0,
         {_FIM_U.format(s=_FIM_SALT + 1)} AS u1,
         {_FIM_U.format(s=_FIM_SALT + 2)} AS u2
  FROM documents
),
fimc AS (
  SELECT doc_id, text, txt, L,
         (u0 < {_FIM_RATE!r} AND L >= 2) AS applied,
         least(CAST(floor(u1 * L) AS BIGINT),
               CAST(floor(u2 * L) AS BIGINT)) AS a,
         greatest(CAST(floor(u1 * L) AS BIGINT),
                  CAST(floor(u2 * L) AS BIGINT)) AS b
  FROM fimu
)"""

_FIM_SELECT = f"""
UNION ALL
SELECT 'fim' AS kind, doc_id AS id, CAST(NULL AS BIGINT) AS chunk_idx,
       CASE WHEN applied
            THEN '<PRE>' || substr(txt, 1, a) || '<SUF>'
                 || substr(txt, b + 1, L - b) || '<MID>'
                 || substr(txt, a + 1, b - a)
            ELSE text END AS chunk_text,
       CASE WHEN applied THEN b - a END AS n_chunk_tokens,
       CAST(applied AS BIGINT) AS shuffle_rank
FROM fimc"""

_CHUNK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id AS id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\\s+'),
                     t -> len(t) > 0) AS t
  FROM documents
),
sized AS (
  SELECT id, t, len(t) AS n,
         CASE WHEN len(t) > 0
              THEN CAST(floor((len(t) - 1) / {_STEP}.0) AS INTEGER) + 1
              ELSE 0 END AS n_chunks,
         CASE WHEN len(t) > {_CHUNK}
              THEN CAST(ceil((len(t) - {_CHUNK}) / {_STEP}.0) AS INTEGER) + 1
              WHEN len(t) > 0 THEN 1 ELSE 0 END AS n_full
  FROM toks
),
ch AS (
  SELECT id, u.i AS chunk_idx,
         t[u.i * {_STEP} + 1 : u.i * {_STEP} + {_CHUNK}] AS c
  FROM sized, unnest(range(0, least(n_chunks, n_full))) AS u(i)
),
{_FIM_CTE.lstrip()}
SELECT 'chunk' AS kind, id, chunk_idx::BIGINT AS chunk_idx,
       array_to_string(c, ' ') AS chunk_text,
       len(c)::BIGINT AS n_chunk_tokens,
       CAST(ROW_NUMBER() OVER (
         ORDER BY substr(md5(id || chr(31) || chunk_idx || chr(31)
                          || '{_SHUF_SALT}'), 1, 12),
                  id, chunk_idx) AS BIGINT) AS shuffle_rank
FROM ch
{_FIM_SELECT}
"""


@query("text_chunks_shuffled", oracle=_CHUNK_ORACLE)
def text_chunks_shuffled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunks with overlap (operators/text.py
    chunk_documents — scan-stage, no shuffle) plus each chunk's global
    rank under the md5 deterministic-shuffle order
    (operators/sampling.py): the exact permutation any engine, cluster,
    or rerun produces for the training order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.sampling import _md5_prefix
    from kinesiscat_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, _CHUNK, _OVERLAP)
    hk = _md5_prefix(["id", "chunk_idx"], _SHUF_SALT)
    w = Window.orderBy(hk, "id", "chunk_idx")
    ranked = chunks.withColumn(
        "shuffle_rank", F.row_number().over(w).cast("long")
    ).select(F.lit("chunk").alias("kind"), "*")
    # kind='fim' (round-7 continuation): the PSM fill-in-the-middle
    # transform (operators/text.py fim_transform, Bavarian et al. 2022)
    # — scan-stage, md5-derived split points, the transformed text rides
    # chunk_text, the middle length rides n_chunk_tokens, the applied
    # flag rides shuffle_rank.
    from kinesiscat_spark.operators.text import fim_transform

    fim = fim_transform(docs, rate=_FIM_RATE, salt=_FIM_SALT).select(
        F.lit("fim").alias("kind"),
        "id",
        F.lit(None).cast("long").alias("chunk_idx"),
        F.col("fim_text").alias("chunk_text"),
        F.col("n_middle").alias("n_chunk_tokens"),
        F.col("applied").cast("long").alias("shuffle_rank"),
    )
    return ranked.unionByName(fim)
