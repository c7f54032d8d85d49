"""Model persistence (operators/model_store.py) and the end-to-end
"train tokenizer → persist → tokenize → pack by real token counts"
composition a pretraining pipeline runs."""

from __future__ import annotations

import pyspark.sql.functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.bpe import tokenize, train_bpe
from kinesiscat_spark.operators.model_store import (
    load_bpe,
    load_quality_model,
    save_bpe,
    save_quality_model,
)
from kinesiscat_spark.operators.packing import pack_sequences
from kinesiscat_spark.operators.quality_classifier import (
    score_documents_quality,
    train_quality_classifier,
)

from .conftest import SF_SMOKE


def test_bpe_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    merges = train_bpe(docs, n_merges=6)
    assert merges
    save_bpe(spark, merges, str(tmp_path / "bpe"))
    assert load_bpe(spark, str(tmp_path / "bpe")) == merges


def test_quality_model_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    labeled = docs.select(
        "text", (F.col("lang") == "en").cast("int").alias("label")
    )
    model = train_quality_classifier(
        labeled, n_features=32, n_iter=4, hash_method="md5", hash_salt=3
    )
    save_quality_model(spark, model, str(tmp_path / "qm"))
    loaded = load_quality_model(spark, str(tmp_path / "qm"))
    assert loaded == model
    # the loaded model scores identically (weights AND hash config survive)
    a = score_documents_quality(docs, model).select("doc_id", "quality_score")
    b = score_documents_quality(docs, loaded).select("doc_id", "quality_score")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tokenize_then_pack_by_bpe_counts(spark, tmp_path):
    """The pretraining layout composition: learn a tokenizer, persist it,
    tokenize the corpus, pack sequences by the REAL (BPE) token counts —
    and the packing invariant (n_in_seq sums to n_tokens per doc) holds
    on those counts."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(80)
    save_bpe(spark, train_bpe(docs, n_merges=8), str(tmp_path / "bpe"))
    merges = load_bpe(spark, str(tmp_path / "bpe"))

    toks = tokenize(docs, merges)
    packed = pack_sequences(
        toks, budget=256, n_shards=4, n_tokens_col="n_bpe_tokens"
    )
    per_doc = (
        packed.groupBy("id").agg(F.sum("n_in_seq").alias("s")).collect()
    )
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in toks.select("doc_id", "n_bpe_tokens").collect()
    }
    assert per_doc
    for r in per_doc:
        assert r.s == counts[r.id]
    # BPE tokens (subword) outnumber whitespace words
    n_words = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    assert sum(counts.values()) > n_words


def test_lm_roundtrip_preserves_scores(spark, tmp_path):
    """Unigram and bigram models survive persist -> reload with identical
    document scores (the broadcast tables are plain parquet; the scalars
    ride a one-row meta table)."""
    from kinesiscat_spark.operators.model_store import (
        load_bigram,
        load_unigram,
        save_bigram,
        save_unigram,
    )
    from kinesiscat_spark.operators.text import (
        bigram_model,
        score_documents,
        score_documents_bigram,
        unigram_model,
    )

    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "the cat ran"), (2, "dogs bark loud")],
        ["doc_id", "text"],
    )
    uni = unigram_model(docs)
    save_unigram(spark, uni, str(tmp_path / "uni"))
    uni2 = load_unigram(spark, str(tmp_path / "uni"))
    a = {r.doc_id: r.avg_logp for r in score_documents(docs, uni).collect()}
    b = {r.doc_id: r.avg_logp for r in score_documents(docs, uni2).collect()}
    assert a == b

    bg = bigram_model(docs, k=0.5, lam=0.7)
    save_bigram(spark, bg, str(tmp_path / "bg"))
    bg2 = load_bigram(spark, str(tmp_path / "bg"))
    assert (bg2.v, bg2.k, bg2.lam) == (bg.v, bg.k, bg.lam)
    x = {r.doc_id: r.avg_logp2 for r in score_documents_bigram(docs, bg).collect()}
    y = {r.doc_id: r.avg_logp2 for r in score_documents_bigram(docs, bg2).collect()}
    assert x == y
