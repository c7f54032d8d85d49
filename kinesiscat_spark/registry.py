"""Query registry backing ``__spark_entry__.queries()`` / ``oracle_sql()``.

Each registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional DuckDB-runnable ANSI-SQL oracle string over the same tables. The
driver hash-compares both at sf0.01 (row count + schema + order-insensitive
value hash), so conventions matter:

- alias every computed column identically in Spark and SQL;
- cast aggregate outputs to the exact Spark result type in the SQL twin
  (DuckDB ``sum(INTEGER)`` is HUGEINT, Spark's is BIGINT, etc.);
- round floating-point aggregates on BOTH sides (partial-aggregation order
  differs between engines, so raw double sums differ in the last ulps);
- render timestamps with an explicit format (session tz is UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver records a weaker rows-only check
    doc: str = ""


REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the DuckDB SQL twin (None = rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all_query_modules() -> None:
    """Import every module that registers queries (idempotent).

    Import order == registration order == the order the driver checks
    lanes in; keep the operator-coverage lanes (dedup/envelope/jmespath/
    joins/multimodal/text) ahead of the relational showcase so a capped
    or truncated harness run still verdicts every distinct operator.

    Round 6: the registry is EXACTLY 50 lanes — the round-5 flagships
    (BPE, quality classifier, hybrid RRF, chunk-shuffle, SemDeDup, heavy
    hitters, incremental dedup) rotated inside the driver's verdicted 50
    by folding low-information relational/jmespath/join slots into
    multi-kind lanes (VERDICT r5 task 1); every folded operator keeps its
    full hash check inside a UNION ALL oracle.
    """
    from kinesiscat_spark.queries import (  # noqa: F401
        dedup_queries,
        curation_queries,
        envelope_queries,
        jmespath_queries,
        join_queries,
        multimodal_queries,
        packing_queries,
        text_queries,
        bpe_queries,
        classifier_queries,
        hybrid_queries,
        chunk_queries,
        semdedup_queries,
        sketch_queries,
        incremental_queries,
        pca_queries,
        relational,
        relational_ext,
        similarity_queries,
        stream_queries,
        window_queries,
    )


def all_queries() -> dict[str, QueryFn]:
    load_all_query_modules()
    return {name: rq.fn for name, rq in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    load_all_query_modules()
    return {name: rq.oracle for name, rq in REGISTRY.items() if rq.oracle is not None}
