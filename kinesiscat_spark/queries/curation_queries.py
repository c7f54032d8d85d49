"""Curation-pipeline lanes: deterministic sampling / corpus mixing and
duplicate-cluster resolution — the operators a training-data pipeline runs
between near-dup detection and the final corpus (SURVEY §2b; previously
pytest-only, surfaced here as driver-hash-checked lanes).

The sampling lane uses ``hash_sample``'s md5 method so the EXACT selected
row set reproduces in DuckDB (xxhash64 has no DuckDB twin); the cluster
lane's oracle re-derives connected components with a recursive CTE over
the same Jaccard pair query the dedup lane checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.clusters import keep_canonical
from kinesiscat_spark.operators.dedup import ngram_jaccard_pairs
from kinesiscat_spark.operators.sampling import md5_threshold, mix_corpora
from kinesiscat_spark.queries.dedup_queries import _SHINGLES_CTE, JACCARD_T
from kinesiscat_spark.registry import query

_EN_W, _REST_W = 0.5, 0.25
_MIX_SALT = 7

_SAMPLING_ORACLE = f"""
SELECT doc_id, lang, 0 AS source_id
FROM documents
WHERE lang = 'en'
  AND substr(md5(doc_id || chr(31) || '{_MIX_SALT}'), 1, 12)
        < '{md5_threshold(_EN_W)}'
UNION ALL
SELECT doc_id, lang, 1 AS source_id
FROM documents
WHERE lang <> 'en'
  AND substr(md5(doc_id || chr(31) || '{_MIX_SALT + 1}'), 1, 12)
        < '{md5_threshold(_REST_W)}'
"""


@query("sampling_mix", oracle=_SAMPLING_ORACLE)
def sampling_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixture (operators/sampling.py): keep 50% of
    English documents and 25% of the rest, selected by CONTENT HASH so the
    same documents are chosen on any cluster, any partitioning, any rerun
    — never ``rand()``, whose per-partition seeding reshuffles the sample
    whenever the file layout changes. The md5 method makes the selection
    engine-portable, which is exactly what the oracle verifies row-by-row.
    Pure scan-stage filters: no shuffle, no state, pushdown-friendly.
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    return mix_corpora(
        [(en, _EN_W), (rest, _REST_W)],
        key_cols=["doc_id"],
        salt=_MIX_SALT,
        method="md5",
    ).select("doc_id", "lang", "source_id")


_KEEP_CANONICAL_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
dsh AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
inv AS (SELECT doc_id, unnest(s) AS shingle FROM dsh),
sizes AS (SELECT doc_id, len(s) AS n FROM dsh),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_T}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
-- transitive closure (tiny near-dup graph at oracle SF), then min-reach
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
),
losers AS (SELECT id FROM labels WHERE id <> cluster_id)
SELECT d.doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM losers)
"""


@query("dedup_keep_canonical", oracle=_KEEP_CANONICAL_ORACLE)
def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution (operators/clusters.py): Jaccard
    pairs → hash-to-min connected components → keep the lowest-id document
    per duplicate cluster (plus all unpaired documents).

    Scale shape: each CC round exchanges (id, label) pairs only, with
    localCheckpoint truncating lineage between rounds; banded near-dup
    clusters are near-cliques, so the loop converges in 2-4 rounds. The
    oracle recomputes the same clusters with a recursive-CTE transitive
    closure — exact agreement on the surviving doc_id set.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=JACCARD_T, n=3)
    return keep_canonical(docs, pairs).select("doc_id")
