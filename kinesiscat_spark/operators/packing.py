"""Sequence packing: lay documents into fixed token-budget training rows.

LLM pretraining consumes fixed-length sequences, not documents. The
standard pipeline step (the "concat-and-chunk" packing of the GPT-2/GPT-3
lineage; Brown et al. 2020 §2.3 describe document packing with delimiter
tokens) concatenates documents in a deterministic order and slices the
token stream at budget boundaries — a document may straddle two (or, when
longer than the budget, several) sequences.

Spark shape, designed for 100 TB:

- Documents are routed to ``n_shards`` independent packing shards by an
  md5 hash range of their id (``envelope.shard_id`` — the same
  DuckDB-reproducible routing the stream envelope uses). A shard is the
  unit of sequentiality: the token stream is only ordered WITHIN a shard,
  so packing parallelizes across shards exactly like the stream layer
  parallelizes across Kinesis shards. Shard count is the knob that keeps
  per-task state bounded — thousands of shards on a real cluster.
- Within a shard, one window (partitioned by shard, ordered by doc id)
  computes each document's [start, end) interval in the shard's token
  stream — the only exchange in the plan, carrying (id, n_tokens) plus
  the document row. Everything after is scan-stage arithmetic: the
  sequence span a document covers is ``floor(start/B) .. floor((end-1)/B)``,
  exploded with ``sequence()``.
- Output: one row per (document × sequence it touches) with the exact
  token interval it occupies inside that sequence. Downstream writers
  group by (shard, seq) to materialize training rows; every sequence
  except the last of each shard is exactly ``budget`` tokens.

Token counts default to the whitespace tokenizer used across the text
surface (``size(split(lower(text), ' '))``) so the operator needs no
tokenizer round-trip; pass ``n_tokens_col`` to pack by a real tokenizer's
counts computed upstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _shard_of(key: Column, n_shards: int) -> Column:
    """Integer md5 hash-range shard — THE Kinesis-faithful routing
    (``envelope.shard_index``; one shared implementation with the n_shards
    overflow guard, per the round-5 review)."""
    from kinesiscat_spark.envelope import shard_index

    return shard_index(key, n_shards).cast("int")


def whitespace_token_count(text: Column) -> Column:
    """Tokens under the corpus-wide whitespace tokenizer. NULL text is an
    empty document (0 tokens) — NOT size(split(NULL)) = -1, which would
    silently shift every later document's offset in the shard. Non-NULL
    text is ≥ 1 token (the split of '' is [''])."""
    return F.when(text.isNull(), F.lit(0)).otherwise(
        F.size(F.split(F.lower(text), " "))
    ).cast("long")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed ``budget``-token training sequences.

    Returns one row per (document, sequence) incidence:

    - ``shard``: md5-range packing shard (0 .. n_shards-1);
    - ``seq``: sequence index within the shard (0-based);
    - ``id``: the document id;
    - ``n_tokens``: the document's total token count;
    - ``seq_off``: 0-based token offset of this document's first token
      inside sequence ``seq``;
    - ``n_in_seq``: how many of the document's tokens land in ``seq``
      (sums to ``n_tokens`` over the document's rows).

    Deterministic for a given (corpus, budget, n_shards): shard routing is
    content-addressed (md5 of the id) and the within-shard order is the id
    order, so the layout is partition-count-invariant and reproducible in
    any engine with md5 — the DuckDB oracle replays it row for row.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if not 1 <= n_shards < (1 << 15):
        raise ValueError(f"n_shards must be in [1, 32768), got {n_shards}")
    # A NULL or negative upstream count would corrupt the running offset of
    # every later document in the shard; clamp to 0 (an empty document).
    n_tok = (
        F.greatest(F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0)), F.lit(0))
        if n_tokens_col
        else whitespace_token_count(F.col(text_col))
    )
    base = docs.select(
        _shard_of(F.col(id_col).cast("string"), n_shards).alias("shard"),
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = base.select(
        "shard",
        "id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("t_start"),
        F.sum("n_tokens").over(w).alias("t_end"),
    )
    b = F.lit(int(budget)).cast("long")
    first_seq = F.floor(F.col("t_start") / b)
    last_seq = F.floor((F.col("t_end") - 1) / b)
    # Zero-token documents occupy no sequence: emit no rows for them. The
    # guard matters because sequence(a, b) with a > b DESCENDS (default
    # step -1) — an empty doc on a budget boundary would otherwise emit
    # spurious (doc, seq) rows. explode() drops the NULL array.
    out = spans.select(
        "shard",
        "id",
        "n_tokens",
        "t_start",
        F.explode(
            F.when(F.col("t_end") > F.col("t_start"), F.sequence(first_seq, last_seq))
        ).alias("seq"),
    )
    seq_base = F.col("seq") * b
    return out.select(
        F.col("shard").cast("int").alias("shard"),
        F.col("seq").cast("long").alias("seq"),
        "id",
        "n_tokens",
        F.greatest(F.col("t_start") - seq_base, F.lit(0).cast("long")).alias(
            "seq_off"
        ),
        (
            F.least(F.col("t_start") + F.col("n_tokens"), seq_base + b)
            - F.greatest(F.col("t_start"), seq_base)
        ).alias("n_in_seq"),
    )


def materialize_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the packed layout into actual training rows: one row
    per (shard, seq) carrying the concatenated token slice of every
    document that touches the sequence, in stream order.

    Output: ``shard``, ``seq``, ``doc_ids`` (in order), ``tokens``
    (exactly ``budget`` tokens for every sequence except each shard's
    last — the invariant tests/test_packing.py verifies on real tokens).

    Scale shape: rides the ``pack_sequences`` incidence rows (one small
    window over each document's few incidences to recover its per-doc
    offset), joins the text in ONCE, slices scan-stage, and assembles
    each sequence with a single (shard, seq) aggregation whose groups are
    bounded by ``budget`` tokens — the natural unit of work for a
    training-data writer. Downstream writers usually follow with
    ``.write.partitionBy("shard")``.
    """
    packed = pack_sequences(docs, budget, n_shards, id_col, text_col)
    w = (
        Window.partitionBy("id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    inc = packed.withColumn(
        "_doc_off", F.sum("n_in_seq").over(w) - F.col("n_in_seq")
    )
    toks = F.when(F.col(text_col).isNull(), F.array().cast("array<string>")).otherwise(
        F.split(F.lower(F.col(text_col)), " ")
    )
    side = docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    pieces = inc.join(side, "id").select(
        "shard",
        "seq",
        "id",
        "seq_off",
        F.slice(
            F.col("_toks"), (F.col("_doc_off") + 1).cast("int"), F.col("n_in_seq").cast("int")
        ).alias("_piece"),
    )
    assembled = (
        pieces.groupBy("shard", "seq")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seq_off", "id", "_piece"))
            ).alias("_ps")
        )
        .select(
            "shard",
            "seq",
            F.transform(F.col("_ps"), lambda s: s["id"]).alias("doc_ids"),
            F.flatten(F.transform(F.col("_ps"), lambda s: s["_piece"])).alias(
                "tokens"
            ),
        )
    )
    return assembled


def packing_efficiency_report(
    docs: DataFrame,
    contexts: tuple[int, ...] = (128, 512, 2048),
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Padding-waste report across candidate context lengths — the number
    every packing decision is justified by: for each context ``c``,

    - ``total_tokens``: real token mass;
    - ``padded_naive``: Σ ceil(n_doc/c)·c — one document per row, padded
      (the no-packing baseline every fine-tuning collator defaults to);
    - ``padded_packed``: Σ_shard ceil(shard_tokens/c)·c — this module's
      concat-and-chunk layout at the same sharding (only per-shard tails
      waste).

    ``total/padded`` is the token efficiency of each strategy; the gap
    between the two columns is what packing buys at that context length.
    All-integer arithmetic — exact in any engine. Returns (context,
    total_tokens, padded_naive, padded_packed).

    Scale shape: one scan computes per-doc token counts; everything
    aggregates to n_shards rows then 1 row per context — two bounded
    map-side-combinable aggregations, no window, text never shuffles.
    """
    if not contexts:
        raise ValueError("contexts must be non-empty")
    for c in contexts:
        if c <= 0:
            raise ValueError(f"context lengths must be positive (got {c})")
    n_tok = (
        F.greatest(
            F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0)), F.lit(0)
        )
        if n_tokens_col
        else whitespace_token_count(F.col(text_col))
    )
    base = docs.select(
        _shard_of(F.col(id_col).cast("string"), n_shards).alias("shard"),
        n_tok.alias("_n"),
    )
    per_doc = base.agg(
        F.sum("_n").alias("_total"),
        *[
            F.sum(F.ceil(F.col("_n") / F.lit(c)).cast("long") * c).alias(
                f"_naive{c}"
            )
            for c in contexts
        ],
    )
    per_shard = (
        base.groupBy("shard")
        .agg(F.sum("_n").alias("_st"))
        .agg(
            *[
                F.sum(
                    F.ceil(F.col("_st") / F.lit(c)).cast("long") * c
                ).alias(f"_packed{c}")
                for c in contexts
            ]
        )
    )
    joined = per_doc.crossJoin(per_shard)
    rows = joined.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).cast("long").alias("context"),
                        F.col("_total").cast("long").alias("total_tokens"),
                        F.col(f"_naive{c}").cast("long").alias(
                            "padded_naive"
                        ),
                        F.col(f"_packed{c}").cast("long").alias(
                            "padded_packed"
                        ),
                    )
                    for c in contexts
                ]
            )
        ).alias("s")
    )
    return rows.select("s.context", "s.total_tokens", "s.padded_naive",
                       "s.padded_packed")


def export_manifest(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Per-shard export manifest — the audit record a training job checks
    BEFORE consuming a 100 TB export: for each packing shard,

    - ``n_docs`` / ``n_tokens``: exact row and token mass;
    - ``digest``: order-insensitive content digest of the shard's
      (id, n_tokens) membership — ``bit_xor`` over the 48-bit md5 prefix
      of each pair, so a dropped, duplicated, or re-routed document flips
      the digest, and the consumer can recompute it IN ANY ENGINE with
      md5 (the DuckDB oracle does exactly that);
    - ``max_doc_tokens``: the largest single document (skew audit — one
      giant document dominates its shard's packing tail);
    - ``n_sequences``: how many ``budget``-token training sequences the
      shard materializes (= ceil(n_tokens / budget), the concat-and-chunk
      invariant of :func:`pack_sequences`).

    Same md5 shard routing and token counts as :func:`pack_sequences`, so
    the manifest describes exactly the layout that ships.

    Scale shape: one scan computes (shard, id, n_tokens); one
    map-side-combinable groupBy(shard) reduces to ``n_shards`` rows —
    text never shuffles, no window, no collect.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = (
        F.greatest(
            F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0)), F.lit(0)
        )
        if n_tokens_col
        else whitespace_token_count(F.col(text_col))
    )
    base = docs.select(
        _shard_of(F.col(id_col).cast("string"), n_shards).alias("shard"),
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
    )
    # 48-bit md5 prefix of "id\x1fn_tokens" — positive, so the xor stays
    # in 48 bits and compares exactly across engines
    pair_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", F.col("id"), F.col("n_tokens"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    b = F.lit(int(budget)).cast("long")
    return base.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.bit_xor(pair_hash).alias("digest"),
        F.max("n_tokens").alias("max_doc_tokens"),
        F.ceil(F.sum("n_tokens") / b).cast("long").alias("n_sequences"),
    )


def token_length_histogram(
    docs: DataFrame,
    n_bins: int = 32,
    bin_width: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Fixed-grid token-length histogram — the MERGEABLE distribution
    sketch behind every packing/budget decision: bin ``i`` covers token
    counts ``[i*bin_width, (i+1)*bin_width)`` (the last bin absorbs the
    tail), and per-bin counts merge by plain addition, so shards /
    partitions / days combine associatively with no rank, no sort, no
    global pass — the property ``percentile_approx``'s GK sketch buys
    with approximation, bought here with a fixed grid whose resolution
    (``bin_width``) is explicit and whose counts are EXACT.

    Returns (bin, bin_lo, bin_hi, n_docs) for non-empty bins only.

    Scale shape: one scan computes each doc's bin; one
    map-side-combinable groupBy reduces to ≤ n_bins rows. Deterministic
    integer arithmetic — replayable in any SQL engine.
    """
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    n_tok = (
        F.greatest(
            F.coalesce(F.col(n_tokens_col).cast("long"), F.lit(0)), F.lit(0)
        )
        if n_tokens_col
        else whitespace_token_count(F.col(text_col))
    )
    b = F.least(
        F.floor(n_tok / F.lit(int(bin_width))), F.lit(int(n_bins - 1))
    ).cast("long")
    return (
        docs.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "bin",
            (F.col("bin") * bin_width).alias("bin_lo"),
            # the open upper edge; the last bin's is unbounded by
            # construction but reported at grid resolution for display
            ((F.col("bin") + 1) * bin_width).alias("bin_hi"),
            "n_docs",
        )
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles=(0.5, 0.9, 0.99),
    bin_width: int = 64,
) -> DataFrame:
    """Interpolated quantile estimates off a :func:`token_length_histogram`
    frame: for each ``q``, the smallest bin whose cumulative count reaches
    ``q·N``, linearly interpolated inside the bin —

        est(q) = bin_lo + bin_width · (q·N − cum_before) / bin_count

    with worst-case error one ``bin_width`` (the grid resolution, reported
    as ``err_bound``). Returns (q_permille, est, err_bound).

    Scale shape: the histogram is ≤ n_bins rows, so the cumulative window
    and per-q selection cost nothing; the expensive part (the corpus scan)
    happened in the mergeable histogram. Exact-integer inputs and a fixed
    evaluation order make the interpolated double bit-identical across
    engines — the oracle hash checks it nano-quantized.
    """
    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    for q in quantiles:
        if not 0.0 < q < 1.0:
            raise ValueError(f"quantiles must be in (0, 1), got {q}")
    # NB: the histogram subtree appears twice below (cumulative rows +
    # the total), so an unmaterialized ``hist`` re-runs its corpus scan
    # once more INSIDE the same fused job — measured cheaper at bench
    # scale than splitting the plan with a checkpoint (fixed per-job cost
    # dominates tiny aggregates). A caller whose scan is genuinely
    # expensive passes a materialized frame (.localCheckpoint()) and pays
    # it once.
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        "bin",
        "bin_lo",
        "n_docs",
        F.sum("n_docs").over(w).alias("cum"),
        (F.sum("n_docs").over(w) - F.col("n_docs")).alias("cum_before"),
    )
    total = cum.agg(F.max("cum").cast("long").alias("n"))
    # ONE aggregate selects every quantile's bin at once: min over the
    # qualifying rows of a (bin, ...) struct == the smallest bin whose
    # cumulative count reaches q·N — no per-q sort/limit subplans
    joined = cum.crossJoin(F.broadcast(total))
    sels = []
    for q in quantiles:
        qn = F.col("n") * F.lit(float(q))
        sels.append(
            F.min(
                F.when(
                    F.col("cum") >= qn,
                    F.struct("bin", "bin_lo", "cum_before", "n_docs", "n"),
                )
            ).alias(f"_h{int(round(q * 1000))}")
        )
    picked = joined.agg(*sels)
    rows = []
    for q in quantiles:
        qp = int(round(q * 1000))
        h = F.col(f"_h{qp}")
        qn = h["n"] * F.lit(float(q))
        rows.append(
            F.struct(
                F.lit(qp).alias("q_permille"),
                (
                    h["bin_lo"]
                    + F.lit(float(bin_width))
                    * (qn - h["cum_before"])
                    / h["n_docs"]
                ).alias("est"),
                F.lit(float(bin_width)).alias("err_bound"),
            )
        )
    return picked.select(F.explode(F.array(*rows)).alias("s")).select(
        "s.q_permille", "s.est", "s.err_bound"
    )
