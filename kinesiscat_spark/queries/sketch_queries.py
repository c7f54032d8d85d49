"""Heavy-hitters lane: count-min-prefiltered frequent n-grams, exact.

The sketch path's contract is EXACTNESS (count-min never
underestimates, so the scan-stage estimate filter keeps a superset of
the true heavy hitters, and the exact re-count kills the collisions) —
the DuckDB twin is therefore the plain GROUP BY/HAVING, and a hash
match proves the sketch plumbing end to end, the same way the
Bloom-prefiltered decontamination twin works.

Registered past the driver's 50-lane cap; ``tests/test_oracle_parity.py``
runs the identical sf0.01 hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.queries.curation_queries import _ngrams_sql
from kinesiscat_spark.registry import query

_HH_N = 2
_HH_MIN = 30

_HEAVY_ORACLE = f"""
WITH g AS (
  SELECT unnest({_ngrams_sql('text', _HH_N)}) AS gram FROM documents
)
SELECT gram, COUNT(*)::BIGINT AS cnt
FROM g GROUP BY gram HAVING COUNT(*) >= {_HH_MIN}
"""


@query("text_heavy_ngrams", oracle=_HEAVY_ORACLE)
def text_heavy_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent word {n}-grams (boilerplate detection) via the count-min
    scale path (operators/sketches.py; Cormode & Muthukrishnan 2005):
    one d·w-row sketch aggregation, broadcast probe in the scan stage,
    exact count over the surviving occurrences only.

    Scale shape: the corpus-wide exchange shrinks from every gram
    occurrence to the heavy ∪ collision-noise subset; output is exactly
    the full GROUP BY/HAVING result (no-underestimate guarantee + exact
    re-count)."""
    from kinesiscat_spark.operators.curation import word_ngrams
    from kinesiscat_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        F.explode(word_ngrams(F.col("text"), _HH_N)).alias("gram")
    )
    return heavy_hitters(grams, "gram", min_count=_HH_MIN)
