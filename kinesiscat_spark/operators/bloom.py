"""Scan-stage Bloom filter as pure Column algebra.

Spark's internal ``BloomFilterAggregate`` is not SQL-registered in this
build, and ``DataFrameStatFunctions.bloomFilter`` collects a driver-side
sketch object that can only be probed from a Python UDF.  This module
builds the filter AS A DATAFRAME instead: a single row holding a
bit-packed ``array<long>``, assembled entirely JVM-side (explode the k
probe positions, ``bit_or`` the per-word masks, scatter into a dense
array with one ``transform`` over ``sequence``).  Consumers broadcast
that one row and probe it with ``getbit`` — no driver round-trip, no
Python in the hot path, and the whole build is one aggregation whose
shuffle payload is at most ``n_bits/64`` (word, mask) rows.

Why it matters at 100 TB: benchmark-decontamination joins the corpus
n-grams against the held-out set.  When the held-out set is small the
existing broadcast LEFT join is optimal; when it is NOT broadcastable
(every eval suite ever published, deduplicated — easily 10⁸ grams) the
join degrades to shuffling the full corpus gram stream.  A Bloom filter
at ~10 bits/element is 8× smaller than the key set itself and rejects
non-members in the scan stage, so only true hits plus an FPR-sized
trickle of false positives ever reach the exact verify join.  No false
negatives: the verified output is IDENTICAL to the exact join's, which
is what lets ``curation_decontaminate``'s DuckDB oracle check this path
row-for-row with the same SQL twin.

Hashing is the double-hashing scheme (Kirsch & Mitzenmacher 2006):
``pos_i = (h1 + i·h2) mod m`` from TWO xxhash64 evaluations per value
instead of k — asymptotically the same FPR, and the position array is
let-bound once so a k-probe membership test costs 2 hashes + k adds.
Sizing per Broder & Mitzenmacher 2004: FPR ≈ (1 − e^{−kn/m})^k; the
defaults m/n ≈ 10, k = 5 give ≈ 1 %.

Keep the probes OUT of interpreted operators: evaluate membership in a
Project (whole-stage codegen), never inside a ``collect_list``-style
ObjectHashAggregate expression — hoisting them there re-evaluates the
lambda chain interpreted per row, ~40× slower (measured; see
``curation._contamination_report_bloom``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesiscat_spark.let import let_

N_BITS_DEFAULT = 1 << 22  # 512 KiB packed; ~10 bits/elem for 4e5 keys
K_DEFAULT = 5


def _probe_positions(value: Column, n_bits: int, k: int) -> Column:
    """array<long> of the k probe bit positions for ``value``.

    ``(h1 + i·h2) mod m`` with h1 ∈ [0, m), h2 ∈ [1, m−1] (never 0 —
    a zero stride would collapse every probe onto h1).  Both hashes are
    let-bound, so the whole array costs two xxhash64 evaluations; the
    modular pre-reduction keeps ``h1 + i·h2`` far from long overflow
    (ANSI mode would throw on wrap).
    """
    if n_bits < 2 or k <= 0:
        raise ValueError(f"need n_bits >= 2 and k > 0 (got {n_bits}, {k})")

    def with_h1(h1: Column) -> Column:
        def with_h2(h2: Column) -> Column:
            return F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(n_bits)),
            )

        return let_(
            F.pmod(F.xxhash64(F.lit(1), value), F.lit(n_bits - 1)) + F.lit(1),
            with_h2,
        )

    return let_(F.pmod(F.xxhash64(F.lit(0), value), F.lit(n_bits)), with_h1)


def bloom_build(
    df: DataFrame,
    col: str = "g",
    n_bits: int = N_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> DataFrame:
    """One-row DataFrame ``(bloom: array<long>)`` — the bit-packed filter
    over every value of ``df[col]``.

    Plan shape: explode k positions per key → ``bit_or`` of the
    per-64-bit-word masks (partially aggregated map-side, ≤ n_bits/64
    groups) → one ``map_from_entries`` row → dense array via
    ``transform(sequence(...))``.  An empty input yields the all-zeros
    filter, so membership is vacuously false rather than an error.
    """
    n_words = (n_bits + 63) // 64
    pos = df.select(
        F.explode(_probe_positions(F.col(col), n_bits, k)).alias("p")
    )
    packed = (
        pos.select(
            F.shiftright(F.col("p"), 6).alias("w"),
            F.col("p").bitwiseAND(F.lit(63)).cast("int").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("bits"))
    )
    # Sparse → dense via a left join against range(n_words), NOT
    # single-row expression work: per-index map lookups are a linear
    # scan each (O(n_words · |set words|) interpreted — minutes at the
    # 2^22 default), and a concat fold over sorted entries re-copies the
    # accumulator per entry (O(|set words|²) when most words are
    # non-zero — ~50 s measured at 4·10⁵ keys).  The join costs one tiny
    # exchange of ≤ n_words narrow rows and the final sort/collect is
    # O(n_words log n_words) — milliseconds at any sane filter size.
    rng = df.sparkSession.range(n_words).select(F.col("id").alias("w"))
    dense_rows = rng.join(packed, "w", "left").select(
        "w", F.coalesce(F.col("bits"), F.lit(0).cast("long")).alias("bits")
    )
    return dense_rows.agg(
        F.array_sort(F.collect_list(F.struct("w", "bits"))).alias("e")
    ).select(F.transform(F.col("e"), lambda s: s["bits"]).alias("bloom"))


def bloom_might_contain(
    bloom: Column,
    value: Column,
    n_bits: int = N_BITS_DEFAULT,
    k: int = K_DEFAULT,
) -> Column:
    """True iff every probe bit of ``value`` is set in ``bloom`` (the
    packed array from :func:`bloom_build`).  Guaranteed true for every
    inserted key; false with probability ≈ FPR for others.

    The k probes are UNROLLED as AND'd scalar expressions rather than a
    ``forall`` over the position array: only the two hash values are
    let-bound (array-backed), and each probe is pure arithmetic — no
    per-row array allocation for positions.  Same bits as the build
    side's :func:`_probe_positions`; measured ~30 % faster per gram
    than the array+forall spelling at sf0.1.  Recomputing the pmod
    twice per probe (word index + bit index) is add/multiply only."""
    if n_bits < 2 or k <= 0:
        raise ValueError(f"need n_bits >= 2 and k > 0 (got {n_bits}, {k})")

    def with_h1(h1: Column) -> Column:
        def with_h2(h2: Column) -> Column:
            conds = []
            for i in range(k):
                p = F.pmod(h1 + F.lit(i).cast("long") * h2, F.lit(n_bits))
                word = F.element_at(
                    bloom, F.shiftright(p, 6).cast("int") + F.lit(1)
                )
                conds.append(
                    F.getbit(word, p.bitwiseAND(F.lit(63)).cast("int"))
                    == F.lit(1)
                )
            out = conds[0]
            for c in conds[1:]:
                out = out & c
            return out

        return let_(
            F.pmod(F.xxhash64(F.lit(1), value), F.lit(n_bits - 1)) + F.lit(1),
            with_h2,
        )

    return let_(F.pmod(F.xxhash64(F.lit(0), value), F.lit(n_bits)), with_h1)
