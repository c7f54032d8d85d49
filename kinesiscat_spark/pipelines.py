"""End-to-end corpus curation: the composed pipeline a training-data team
actually runs, built entirely from this engine's operators.

    raw documents
      → quality gate        (text heuristics — scan-stage filter)
      → language gate       (char-n-gram language ID)
      → exact dedup         (sha-256 digest, keep lowest id)
      → near-dup dedup      (minhash LSH pairs → connected components →
                             keep one canonical doc per cluster)
      → sampling / mixing   (deterministic content-hash)

Each stage is independently oracle-checked through its query lane; this
module only composes them, so the pipeline inherits their scale shapes:
the gates are scan-stage filters (pushdown-friendly), dedup shuffles
fixed-width keys, and sampling decisions are partition-invariant hashes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationConfig:
    min_tokens: int = 8
    min_stopword_ratio: float = 0.0  # 0 disables the stopword gate
    keep_langs: tuple[str, ...] = ()  # empty = keep all
    near_dup_threshold: float = 0.5
    minhash_hashes: int = 32
    minhash_bands: int = 8
    sample_fraction: float = 1.0  # 1.0 disables sampling
    sample_salt: int = 0
    id_col: str = "doc_id"
    text_col: str = "text"
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in")
    # Audit opt-in: pass an (empty) dict to have curate() record per-stage
    # surviving-row counts into it. None (the default) keeps the pipeline a
    # single lazy plan — no eager counts, no stage re-execution.
    stage_counts: dict | None = None


def quality_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Length + stopword-density heuristics (C4/Gopher-style), scan-stage."""
    tokens = F.split(F.lower(F.col(cfg.text_col)), " ")
    n_tokens = F.size(tokens)
    out = docs.filter(n_tokens >= cfg.min_tokens)
    if cfg.min_stopword_ratio > 0:
        stop_arr = F.array(*[F.lit(s) for s in cfg.stopwords])
        n_stop = F.size(F.filter(tokens, lambda t: F.array_contains(stop_arr, t)))
        out = out.filter(
            n_stop.cast("double") / n_tokens >= cfg.min_stopword_ratio
        )
    return out


def language_gate(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    if not cfg.keep_langs:
        return docs
    from kinesiscat_spark.operators.text import language_id

    pred, _score = language_id(F.col(cfg.text_col))
    return docs.filter(pred.isin(*cfg.keep_langs))


def exact_dedup(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    """Keep the lowest-id doc per identical text (sha-256 digest key, so
    only (digest, id) shuffles — never the text)."""
    winners = (
        docs.select(F.sha2(cfg.text_col, 256).alias("_h"), cfg.id_col)
        .groupBy("_h")
        .agg(F.min(cfg.id_col).alias(cfg.id_col))
        .select(cfg.id_col)
    )
    return docs.join(winners, cfg.id_col, "left_semi")


def near_dedup(docs: DataFrame, cfg: CurationConfig) -> DataFrame:
    from kinesiscat_spark.operators.clusters import keep_canonical
    from kinesiscat_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs,
        threshold=cfg.near_dup_threshold,
        n_hashes=cfg.minhash_hashes,
        n_bands=cfg.minhash_bands,
        id_col=cfg.id_col,
        text_col=cfg.text_col,
    )
    return keep_canonical(docs, pairs, id_col=cfg.id_col)


def curate(docs: DataFrame, cfg: CurationConfig | None = None) -> DataFrame:
    """Run the full curation pipeline.

    By default the stages compose lazily into ONE plan — no job runs until
    the caller acts on the result. Auditing is opt-in: pass a cfg with
    ``stage_counts={}`` and per-stage surviving-row counts are recorded in
    it (each count materializes its stage — audit runs re-execute the full
    upstream pipeline once per stage, so never audit in production plans).
    """
    cfg = cfg or CurationConfig()
    audit = cfg.stage_counts is not None

    def step(name: str, df: DataFrame) -> DataFrame:
        if audit:
            cfg.stage_counts[name] = df.count()
        return df

    out = step("input", docs)
    out = step("quality", quality_gate(out, cfg))
    out = step("language", language_gate(out, cfg))
    out = step("exact_dedup", exact_dedup(out, cfg))
    out = step("near_dedup", near_dedup(out, cfg))
    if cfg.sample_fraction < 1.0:
        from kinesiscat_spark.operators.sampling import hash_sample

        out = step(
            "sample",
            hash_sample(out, cfg.sample_fraction, [cfg.id_col], cfg.sample_salt),
        )
    return out
