"""Incremental cross-snapshot dedup lane: a NEW batch (odd doc_ids)
deduped against an EXISTING corpus snapshot (even doc_ids) with
``dedup_against`` — exact sha-256 stage plus the asymmetric minhash
near stage, both replayed in the DuckDB twin.

The near-stage CTEs are rendered from the SAME imported constants and
shingle/signature SQL as the hash-green ``dedup_minhash_lsh`` lane
(kinesiscat_spark/queries/dedup_queries.py), so the two can never
drift; the incremental twist is only the asymmetric candidate join
(new-side × corpus-side instead of id_a < id_b) and the final
anti-semantics (survivors = new docs with no exact twin and no
corpus neighbor estimating >= t).

On the sf0.01 corpus the exact stage is vacuous (no exact cross-parity
twins exist — it is exercised by constructed data in
tests/test_dedup_against.py) while the near stage drops real planted
near-duplicates, so the lane hash-checks both the survivors and the
drop decisions.

Registered past the driver's 50-lane cap; ``tests/test_oracle_parity.py``
runs the identical sf0.01 hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.queries.dedup_queries import (
    _R,
    _SHINGLES_CTE,
    MINHASH_T,
    MOD48,
    N_BANDS,
    N_HASHES,
)
from kinesiscat_spark.registry import query

_INCR_ORACLE = f"""
WITH {_SHINGLES_CTE},
hp AS (
  SELECT doc_id,
         list_transform(list_transform(s, x -> md5(x)),
           m -> {{'a': ('0x' || substring(m, 1, 12))::BIGINT,
                  'b': ('0x' || substring(m, 13, 12))::BIGINT}}) AS hp
  FROM sh
),
sigs AS (
  SELECT doc_id,
         list_transform(generate_series(0, {N_HASHES - 1}),
           i -> list_min(list_transform(hp, p -> (p.a + i * p.b) % {MOD48}))) AS sig
  FROM hp
),
bands AS (
  SELECT doc_id, sig, t.b AS band, sig[{_R}*t.b + 1 : {_R}*t.b + {_R}] AS key
  FROM sigs CROSS JOIN range(0, {N_BANDS}) t(b)
),
near_hits AS (
  SELECT DISTINCT n.doc_id
  FROM bands n JOIN bands c
    ON n.band = c.band AND n.key = c.key
   AND n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
  WHERE len(list_filter(list_zip(n.sig, c.sig), p -> p[1] = p[2]))
          / {N_HASHES}.0 >= {MINHASH_T}
),
exact_hits AS (
  SELECT DISTINCT n.doc_id
  FROM documents n JOIN documents c
    ON sha256(n.text) = sha256(c.text)
   AND n.doc_id % 2 = 1 AND c.doc_id % 2 = 0
)
SELECT doc_id FROM documents
WHERE doc_id % 2 = 1
  AND doc_id NOT IN (SELECT doc_id FROM near_hits)
  AND doc_id NOT IN (SELECT doc_id FROM exact_hits)
"""


@query("dedup_incremental", oracle=_INCR_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-pretraining dedup (operators/dedup.py dedup_against):
    new-snapshot documents (odd ids) that survive exact + minhash-near
    dedup against the existing corpus (even ids).

    Scale shape: only 32-byte digests and (8-byte band key, signature)
    rows shuffle; the corpus side collapses losslessly to one row per
    (band key, signature) before the asymmetric join, so corpus-side
    boilerplate buckets cannot blow up a join task."""
    from kinesiscat_spark.operators.dedup import dedup_against

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    out = dedup_against(new, corpus, near_threshold=MINHASH_T)
    return out.select("doc_id")
