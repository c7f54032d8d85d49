"""Count-min sketch as pure Column algebra, and exact heavy hitters.

Count-min (Cormode & Muthukrishnan 2005): d hash rows of w counters;
insert adds 1 to one slot per row, the frequency estimate is the MIN
over the d slots — an overestimate, never an underestimate (each slot
holds the key's true count plus whatever collided into it).

Why it matters at 100 TB: finding frequent n-grams (boilerplate
headers, license blurbs, navigation chrome) with a plain
``groupBy(gram).count()`` shuffles EVERY gram occurrence — the corpus
itself.  The sketch route is the ``operators/bloom.py`` discipline
applied to frequencies:

  1. build the sketch in one aggregation whose shuffle payload is at
     most d·w (slot, count) rows — the same bit_or/map/dense-array
     shape as ``bloom_build``, with SUM instead of OR;
  2. broadcast the one sketch row and probe it scan-stage: only gram
     occurrences whose ESTIMATE reaches the threshold survive to the
     exact count.  The no-underestimate guarantee makes the survivor
     set a superset of the true heavy hitters, so
  3. the exact groupBy over survivors returns EXACTLY the same rows a
     full groupBy-HAVING would — which is what lets the
     ``text_heavy_ngrams`` lane hash-check this path against the
     trivial SQL twin — while the corpus-wide exchange shrinks from
     all occurrences to (heavy ∪ collision-noise) occurrences.

Sizing: estimate error ≤ 2N/w with probability 1 − (1/2)^d over the
hash draws (N = total insertions).  For a threshold T, pick
w ≳ 2N/(T·slack); the defaults (d=4, w=4096) keep the broadcast at
d·w longs = 128 KiB.

Probes stay in Project operators (whole-stage codegen), never inside
ObjectHashAggregate expressions — the bloom.py lesson (~40× measured).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D_DEFAULT = 4
W_DEFAULT = 1 << 12


def _slot(value: Column, row: int, w: int, method: str = "xxhash64") -> Column:
    """Flat index of ``value``'s counter in hash row ``row``: row-major
    ``row·w + hash(row-seed, value) mod w``. ``method='md5'`` derives the
    row hash from md5's first 48 bits (slower, but bit-identical in ANSI
    SQL — the oracle-checkable path, mirroring ``hll_build``)."""
    if method == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.lit(str(row)), value)), 1, 12
            ),
            16,
            10,
        ).cast("long")
        return F.lit(row * w) + F.pmod(h, F.lit(w))
    return F.lit(row * w) + F.pmod(F.xxhash64(F.lit(row), value), F.lit(w))


def cms_build(
    df: DataFrame,
    col: str = "g",
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
    weight: str | None = None,
    method: str = "xxhash64",
) -> DataFrame:
    """One-row DataFrame ``(cms: array<long>)`` — the d×w count-min
    sketch over every value of ``df[col]`` (row-major flat layout).

    Plan shape: explode the d slot indices per value → SUM per slot
    (map-side partials; ≤ d·w groups) → one ``map_from_entries`` row →
    dense array via ``transform(sequence(...))``.  ``weight`` names an
    optional long column of per-row increments (e.g. pre-aggregated
    counts); default weight is 1.  Empty input → all-zero sketch.

    ``weight`` values MUST be non-negative: the count-min
    no-underestimate guarantee (which ``heavy_hitters``'s exactness
    proof relies on) only holds for non-negative increments — a
    negative weight can drive a slot below a colliding value's true
    count and produce silent false negatives downstream.  Enforced
    here with a runtime check folded into the slot explode (a negative
    weight raises at execution time rather than corrupting the sketch).
    """
    if d <= 0 or w < 2:
        raise ValueError(f"need d > 0 and w >= 2 (got {d}, {w})")
    return cms_from_slots(cms_slots(df, col, d, w, weight, method), d, w)


def cms_slots(
    df: DataFrame,
    col: str = "g",
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
    weight: str | None = None,
    method: str = "xxhash64",
) -> DataFrame:
    """The sparse half of ``cms_build``: ``(i, c)`` slot-count rows —
    ≤ d·w of them regardless of input size.

    Works on BATCH and STREAMING DataFrames alike: the groupBy-sum is a
    standard streaming aggregation (bounded state — at most d·w groups),
    so a streaming caller gets a live sketch that is ADDITIVE across
    micro-batches by construction (sum of per-batch increments = the
    batch sum; count-min is a linear sketch).  Drain in complete mode and
    finish with ``cms_from_slots`` — byte-identical to ``cms_build`` over
    the same rows (pinned in tests/test_sketches.py)."""
    if d <= 0 or w < 2:
        raise ValueError(f"need d > 0 and w >= 2 (got {d}, {w})")
    if weight:
        raw = F.col(weight).cast("long")
        wcol = F.when(raw >= 0, raw).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("cms_build: negative weight breaks the count-min "
                          "no-underestimate guarantee (got "),
                    raw.cast("string"),
                    F.lit(")"),
                )
            ).cast("long")
        )
    else:
        wcol = F.lit(1).cast("long")
    slots = df.select(
        F.explode(
            F.array(*[_slot(F.col(col), r, w, method) for r in range(d)])
        ).alias("i"),
        wcol.alias("_w"),
    )
    return slots.groupBy("i").agg(F.sum("_w").alias("c"))


def cms_from_slots(
    packed: DataFrame, d: int = D_DEFAULT, w: int = W_DEFAULT
) -> DataFrame:
    """Densify ``(i, c)`` slot rows into the one-row ``(cms: array<long>)``
    sketch (batch only — run it over a drained/materialized slot table).

    Sparse → dense via a left join against range(d·w), NOT single-row
    expression work: per-index map lookups are a linear scan each
    (element_at on a Spark map has no hash index — O(d·w · |entries|)
    interpreted, ~4 s measured at d·w=16384), and a concat fold over
    sorted entries is O(|entries|²) when most slots are hit.  The join
    costs one tiny exchange of ≤ d·w narrow rows; the final
    sort/collect is O(d·w log d·w) — milliseconds at any sane size."""
    if d <= 0 or w < 2:
        raise ValueError(f"need d > 0 and w >= 2 (got {d}, {w})")
    rng = packed.sparkSession.range(d * w).select(F.col("id").alias("i"))
    dense_rows = rng.join(packed, "i", "left").select(
        "i", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    return dense_rows.agg(
        F.array_sort(F.collect_list(F.struct("i", "c"))).alias("e")
    ).select(F.transform(F.col("e"), lambda s: s["c"]).alias("cms"))


def cms_estimate(
    cms: Column, value: Column, d: int = D_DEFAULT, w: int = W_DEFAULT
) -> Column:
    """Frequency estimate: min over the d hash rows — ≥ the true count
    always, close to it with high probability.  Pure arithmetic + d
    array reads, unrolled for whole-stage codegen (the bloom.py probe
    spelling)."""
    if d <= 0 or w < 2:
        raise ValueError(f"need d > 0 and w >= 2 (got {d}, {w})")
    reads = [
        F.element_at(cms, (_slot(value, r, w) + F.lit(1)).cast("int"))
        for r in range(d)
    ]
    return F.least(*reads) if d > 1 else reads[0]


def heavy_hitters(
    df: DataFrame,
    col: str = "g",
    min_count: int = 100,
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
) -> DataFrame:
    """(value, cnt) for every value occurring ≥ ``min_count`` times —
    EXACT output (identical to ``groupBy.count().filter``), computed
    the sketch way: broadcast count-min prefilter in the scan stage,
    exact count only over the surviving occurrences.

    No false negatives (count-min never underestimates), and the final
    filter re-checks the exact count, so false positives die before
    the output — same contract as the Bloom-prefiltered
    decontamination path.

    TWO-SCAN CONTRACT: ``df`` is evaluated twice — once inside
    ``cms_build`` and once for the probe/exact-count pass.  The two
    passes are inherent to the sketch design, but recomputing expensive
    upstream lineage (e.g. a documents scan + n-gram explode feeding
    ``df``) is not: at corpus scale the gram explode dominates, so
    callers with non-trivial lineage should ``.persist()`` /
    ``.localCheckpoint()`` the input (or pass a pre-materialized
    DataFrame) before calling.  The ``text_heavy_ngrams`` lane accepts
    the recompute deliberately — its explode is one scan-stage pass and
    caching it at sf0.1 costs more than recomputing.
    """
    cms = cms_build(df, col, d, w)
    survivors = df.crossJoin(F.broadcast(cms)).filter(
        cms_estimate(F.col("cms"), F.col(col), d, w) >= F.lit(min_count)
    )
    return (
        survivors.groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


# ---------------------------------------------------------------------------
# HyperLogLog cardinality (Flajolet, Fusy, Gandouet & Meunier 2007) — the
# distinct-count companion to the count-min frequency sketch above, as pure
# Column algebra with the same build shape (explode → bounded groupBy →
# dense one-row array) and the same cross-engine discipline (md5-derived
# hashes reproduce in any engine; the estimator folds in register order so
# the double arithmetic is order-defined on both sides).
# ---------------------------------------------------------------------------

HLL_P_DEFAULT = 12  # m = 4096 registers; relative error ~ 1.04/sqrt(m) ~ 1.6%
_HLL_HASH_BITS = 60  # 15 md5 hex chars -> non-negative in a signed long


def _hll_hash60(value: Column, method: str) -> Column:
    """60-bit non-negative hash of ``value``.  ``md5`` (15 hex chars via
    conv) reproduces bit-for-bit in DuckDB/Trino/BigQuery — the oracle
    path; ``xxhash64`` (sign bit shifted off) is the cheaper JVM path."""
    if method == "md5":
        return F.conv(F.substring(F.md5(value.cast("string")), 1, 15), 16, 10).cast(
            "long"
        )
    if method == "xxhash64":
        return F.shiftrightunsigned(F.xxhash64(value), 4)
    raise ValueError(f"unknown hash method {method!r}")


def hll_build(
    df: DataFrame,
    col: str = "g",
    p: int = HLL_P_DEFAULT,
    method: str = "xxhash64",
) -> DataFrame:
    """One-row DataFrame ``(hll: array<long>)`` — the 2^p HyperLogLog
    registers over every value of ``df[col]``.

    Register index = top p hash bits; rank = position of the highest set
    bit in the remaining (60-p) bits, counted from the top (+1), with the
    all-zeros remainder taking rank 60-p+1.  Plan shape mirrors
    ``cms_build``: one (idx, rank) row per value → MAX per register
    (map-side partials, ≤ 2^p groups) → dense array via the range join.
    Empty input → all-zero registers (estimate 0).

    MERGEABILITY (the 100 TB property): registers of a union are the
    element-wise max of the parts' registers — ``hll_merge`` — so
    per-partition/per-day sketches combine without re-reading data;
    pinned exactly (register-for-register) in tests/test_sketches.py.
    """
    return hll_from_slots(hll_slots(df, col, p, method), p)


def hll_slots(
    df: DataFrame,
    col: str = "g",
    p: int = HLL_P_DEFAULT,
    method: str = "xxhash64",
) -> DataFrame:
    """The sparse half of ``hll_build``: ``(i, r)`` register-max rows —
    ≤ 2^p of them regardless of input size.

    Works on BATCH and STREAMING DataFrames alike: groupBy-MAX is a
    standard streaming aggregation with bounded state (≤ 2^p groups), and
    HLL registers merge by max, so the streaming aggregation's state IS
    the live sketch — micro-batch additivity for free, exactly like
    ``cms_slots``.  Drain in complete mode and finish with
    ``hll_from_slots`` — register-identical to ``hll_build`` over the
    same rows (pinned in tests/test_sketches.py)."""
    if not 4 <= p <= 18:
        raise ValueError(f"need 4 <= p <= 18 (got {p})")
    rem_bits = _HLL_HASH_BITS - p
    h = _hll_hash60(F.col(col), method)
    idx = F.shiftright(h, rem_bits)
    rem = h.bitwiseAND(F.lit((1 << rem_bits) - 1))
    # bin() renders without leading zeros, so length(bin(rem)) is the
    # bit-length; rank = rem_bits - bit_length + 1 (DuckDB: same via bin())
    rank = F.when(
        rem > 0, F.lit(rem_bits) - F.length(F.bin(rem)) + F.lit(1)
    ).otherwise(F.lit(rem_bits + 1))
    pairs = df.select(idx.alias("i"), rank.cast("long").alias("r"))
    return pairs.groupBy("i").agg(F.max("r").alias("r"))


def hll_from_slots(packed: DataFrame, p: int = HLL_P_DEFAULT) -> DataFrame:
    """Densify ``(i, r)`` register rows into the one-row
    ``(hll: array<long>)`` sketch (batch only; the same range-join
    densification as ``cms_from_slots``)."""
    if not 4 <= p <= 18:
        raise ValueError(f"need 4 <= p <= 18 (got {p})")
    m = 1 << p
    rng = packed.sparkSession.range(m).select(F.col("id").alias("i"))
    dense = rng.join(packed, "i", "left").select(
        "i", F.coalesce(F.col("r"), F.lit(0).cast("long")).alias("r")
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("i", "r"))).alias("e")
    ).select(F.transform(F.col("e"), lambda s: s["r"]).alias("hll"))


def hll_estimate(hll: Column, p: int = HLL_P_DEFAULT) -> Column:
    """Cardinality estimate from the register array: the raw HLL
    harmonic-mean estimator with the paper's small-range (linear
    counting) correction.  The 2^-r sum folds in REGISTER ORDER (array
    order) — identical in Spark's ``aggregate`` and DuckDB's
    ``list_sum(list_transform(...))`` — so the estimate is bit-stable
    across engines and partitionings.  The 60-bit hash space makes the
    paper's large-range correction vacuous at any real cardinality."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = F.aggregate(
        hll, F.lit(0.0), lambda a, r: a + F.pow(F.lit(2.0), -r.cast("double"))
    )
    raw = F.lit(alpha * m * m) / s
    zeros = F.size(F.filter(hll, lambda r: r == 0))
    return F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)


def hll_merge(a: Column, b: Column) -> Column:
    """Union of two sketches: element-wise register max."""
    return F.zip_with(a, b, lambda x, y: F.greatest(x, y))


def hll_distinct(
    df: DataFrame,
    col: str = "g",
    p: int = HLL_P_DEFAULT,
    method: str = "xxhash64",
) -> DataFrame:
    """One-row DataFrame ``(est: double)`` — approximate COUNT(DISTINCT
    col).  One bounded-exchange pass at any corpus size (vs the exact
    count-distinct's full shuffle of every distinct value)."""
    return hll_build(df, col, p, method).select(
        hll_estimate(F.col("hll"), p).alias("est")
    )


def cms_inner_product(
    a: Column, b: Column, d: int = D_DEFAULT, w: int = W_DEFAULT
) -> Column:
    """Count-min INNER-PRODUCT estimate (Cormode & Muthukrishnan 2005
    §4.3): ``min over rows r of Σ_w a[r·w+j]·b[r·w+j]`` estimates
    ``Σ_g f_a(g)·f_b(g)`` — the join-size / co-occurrence mass between
    two frequency distributions, straight from two mergeable d×w
    sketches without touching the raw streams. One-sided like the point
    estimate: never an underestimate, within ε·|a|₁·|b|₁ whp.

    All-integer arithmetic (long counters, long products), so the
    estimate is bit-identical in any engine and any fold order.
    """
    sums = [
        F.aggregate(
            F.zip_with(
                F.slice(a, r * w + 1, w),
                F.slice(b, r * w + 1, w),
                lambda x, y: x * y,
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        for r in range(d)
    ]
    return F.least(*sums)
