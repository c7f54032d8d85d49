"""kinesiscat_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of robbles/kinesiscat (streaming JSON-record
ingestion + JMESPath per-record querying + formatted emission), extended with
large-scale training-data pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Everything is expressed Spark-first: DataFrame/SQL logical plans optimized by
Catalyst, JMESPath expressions compiled to native Column trees (Arrow-batched
pandas UDF only as the full-fidelity fallback), Structured Streaming for the
stream surface.
"""

from kinesiscat_spark.session import get_spark
from kinesiscat_spark.io_tables import TABLES, load_table

__all__ = ["get_spark", "load_table", "TABLES"]

__version__ = "0.1.0"
