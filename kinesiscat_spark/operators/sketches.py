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


def _slot(value: Column, row: int, w: int) -> Column:
    """Flat index of ``value``'s counter in hash row ``row``: row-major
    ``row·w + xxhash64(row-seed, value) mod w``."""
    return F.lit(row * w) + F.pmod(F.xxhash64(F.lit(row), value), F.lit(w))


def cms_build(
    df: DataFrame,
    col: str = "g",
    d: int = D_DEFAULT,
    w: int = W_DEFAULT,
    weight: str | None = None,
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
            F.array(*[_slot(F.col(col), r, w) for r in range(d)])
        ).alias("i"),
        wcol.alias("_w"),
    )
    packed = slots.groupBy("i").agg(F.sum("_w").alias("c"))
    # Sparse → dense via a left join against range(d·w), NOT single-row
    # expression work: per-index map lookups are a linear scan each
    # (element_at on a Spark map has no hash index — O(d·w · |entries|)
    # interpreted, ~4 s measured at d·w=16384), and a concat fold over
    # sorted entries is O(|entries|²) when most slots are hit.  The join
    # costs one tiny exchange of ≤ d·w narrow rows; the final
    # sort/collect is O(d·w log d·w) — milliseconds at any sane size.
    rng = df.sparkSession.range(d * w).select(F.col("id").alias("i"))
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
