"""Count-min sketch (operators/sketches.py): no-underestimate guarantee,
exact heavy-hitter differential vs plain groupBy, weighted build,
partition invariance, degenerate shapes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    heavy_hitters,
)


def _zipf_rows(n, n_keys, seed):
    rng = random.Random(seed)
    # key k appears with weight ~ 1/(k+1): a few heavy keys, a long tail
    return [(f"k{int(rng.paretovariate(1.0)) % n_keys}",) for _ in range(n)]


def test_estimate_never_underestimates(spark):
    rows = _zipf_rows(3000, 40, seed=2)
    df = spark.createDataFrame(rows, "g string")
    truth = {r.g: r.cnt for r in df.groupBy("g").agg(F.count("*").alias("cnt")).collect()}
    est = (
        df.distinct()
        .crossJoin(F.broadcast(cms_build(df, "g", d=4, w=256)))
        .select("g", cms_estimate(F.col("cms"), F.col("g"), 4, 256).alias("e"))
        .collect()
    )
    assert est and all(r.e >= truth[r.g] for r in est)


def test_heavy_hitters_exact_differential(spark):
    rows = _zipf_rows(5000, 60, seed=9)
    df = spark.createDataFrame(rows, "g string")
    for min_count in (10, 50, 200):
        want = sorted(
            (r.g, r.cnt)
            for r in df.groupBy("g")
            .agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= min_count)
            .collect()
        )
        # deliberately tiny sketch: heavy collision noise, output still exact
        got = sorted(
            (r.g, r.cnt)
            for r in heavy_hitters(df, "g", min_count, d=3, w=64).collect()
        )
        assert got == want, min_count


def test_weighted_build_equals_exploded(spark):
    """A pre-aggregated (key, count) build must equal the exploded one."""
    rows = [("a", 5), ("b", 3), ("a", 2), ("c", 1)]
    agg = spark.createDataFrame(rows, "g string, n long")
    exploded = spark.createDataFrame(
        [(k,) for k, n in rows for _ in range(n)], "g string"
    )
    s1 = cms_build(agg, "g", d=2, w=32, weight="n").collect()[0].cms
    s2 = cms_build(exploded, "g", d=2, w=32).collect()[0].cms
    assert s1 == s2


def test_partition_invariance(spark):
    rows = _zipf_rows(2000, 30, seed=4)
    df = spark.createDataFrame(rows, "g string")
    a = sorted(tuple(r) for r in heavy_hitters(df, "g", 25).collect())
    b = sorted(
        tuple(r) for r in heavy_hitters(df.repartition(17), "g", 25).collect()
    )
    assert a == b


def test_empty_input(spark):
    df = spark.createDataFrame([], "g string")
    assert cms_build(df, "g", d=2, w=16).collect()[0].cms == [0] * 32
    assert heavy_hitters(df, "g", 1).count() == 0


def test_bad_args(spark):
    df = spark.createDataFrame([("x",)], "g string")
    with pytest.raises(ValueError):
        cms_build(df, "g", d=0, w=16)
    with pytest.raises(ValueError):
        cms_estimate(F.lit([0]), F.lit("x"), d=2, w=1)


# --- HyperLogLog (round 6) -------------------------------------------------


def test_hll_estimate_accuracy(spark):
    """p=12 → ~1.6% expected relative error; assert 5% on 20k distinct."""
    from kinesiscat_spark.operators.sketches import hll_distinct

    df = spark.range(20_000).select(
        (F.col("id") % 17_000).cast("string").alias("g")
    )
    for method in ("xxhash64", "md5"):
        est = hll_distinct(df, "g", method=method).collect()[0].est
        assert abs(est - 17_000) / 17_000 < 0.05, (method, est)


def test_hll_merge_equals_union(spark):
    """Registers of the union == element-wise max of part registers —
    EXACT register-for-register (the mergeability contract that lets
    per-partition/per-day sketches combine without re-reading data)."""
    from kinesiscat_spark.operators.sketches import hll_build, hll_merge

    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("g"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("g"))
    ra = hll_build(a, "g").collect()[0].hll
    rb = hll_build(b, "g").collect()[0].hll
    runion = hll_build(a.unionAll(b), "g").collect()[0].hll
    merged = (
        spark.createDataFrame([(ra, rb)], "a array<long>, b array<long>")
        .select(hll_merge(F.col("a"), F.col("b")).alias("m"))
        .collect()[0]
        .m
    )
    assert merged == runion


def test_hll_partition_invariant_and_empty(spark):
    from kinesiscat_spark.operators.sketches import hll_distinct

    df = spark.range(5000).select((F.col("id") % 999).cast("string").alias("g"))
    e1 = hll_distinct(df, "g", method="md5").collect()[0].est
    e2 = hll_distinct(df.repartition(13), "g", method="md5").collect()[0].est
    assert e1 == e2  # bit-identical under repartitioning

    empty = spark.createDataFrame([], "g string")
    assert hll_distinct(empty, "g").collect()[0].est == 0.0


def test_hll_python_differential(spark):
    """Register build replayed in pure python (md5 path) — the same
    differential discipline as the minhash/simhash kernels."""
    import hashlib

    from kinesiscat_spark.operators.sketches import hll_build

    vals = [f"v{i}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "g string")
    got = hll_build(df, "g", method="md5").collect()[0].hll

    regs = [0] * 4096
    for v in vals:
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        i = h >> 48
        rem = h & ((1 << 48) - 1)
        r = (48 - rem.bit_length() + 1) if rem > 0 else 49
        regs[i] = max(regs[i], r)
    assert got == regs


def test_hll_validation(spark):
    from kinesiscat_spark.operators.sketches import hll_build

    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError):
        hll_build(df, "g", p=2)
    with pytest.raises(ValueError):
        hll_build(df, "g", method="sha1")


def test_streaming_cms_equals_batch(spark, tmp_path):
    """Count-min is a LINEAR sketch: the streaming groupBy-sum over slot
    increments (cms_slots on a readStream, drained in complete mode)
    must produce the byte-identical dense sketch cms_build computes over
    the same rows in one batch — across MULTIPLE micro-batches."""
    from kinesiscat_spark.operators.sketches import (
        cms_build,
        cms_from_slots,
        cms_slots,
    )
    from kinesiscat_spark.streaming.source import StreamConfig, run_to_memory

    rng = random.Random(7)
    rows = [(i, f"w{rng.randint(0, 40)}") for i in range(500)]
    df = spark.createDataFrame(rows, ["i", "g"])
    src = str(tmp_path / "src")
    # 5 files -> 5 micro-batches at batch_size=1
    df.repartition(5).write.parquet(src)

    stream = spark.readStream.schema("i long, g string").parquet(src)
    d, w = 3, 64
    slot_table = run_to_memory(
        cms_slots(stream, "g", d, w),
        output_mode="complete",
        cfg=StreamConfig(batch_size=1),
    )
    streamed = cms_from_slots(slot_table, d, w).collect()[0].cms
    batch = cms_build(df, "g", d, w).collect()[0].cms
    assert streamed == batch


def test_streaming_heavy_hitters_composition(spark, tmp_path):
    """The drained streaming sketch plugs into the same probe + exact
    count as the batch path and returns the identical heavy-hitter set."""
    from kinesiscat_spark.operators.sketches import (
        cms_estimate,
        cms_from_slots,
        cms_slots,
        heavy_hitters,
    )
    from kinesiscat_spark.streaming.source import StreamConfig, run_to_memory

    rng = random.Random(11)
    rows = [(i, f"t{rng.randint(0, 15)}") for i in range(400)]
    df = spark.createDataFrame(rows, ["i", "g"])
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)

    d, w, min_count = 3, 32, 25
    stream = spark.readStream.schema("i long, g string").parquet(src)
    slot_table = run_to_memory(
        cms_slots(stream, "g", d, w),
        output_mode="complete",
        cfg=StreamConfig(batch_size=1),
    )
    cms = cms_from_slots(slot_table, d, w)
    survivors = df.crossJoin(F.broadcast(cms)).filter(
        cms_estimate(F.col("cms"), F.col("g"), d, w) >= min_count
    )
    streamed = {
        (r.g, r.cnt)
        for r in survivors.groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .collect()
    }
    batch = {
        (r.g, r.cnt) for r in heavy_hitters(df, "g", min_count, d, w).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_hll_equals_batch(spark, tmp_path):
    """HLL registers merge by max, so the streaming groupBy-max over
    register ranks (hll_slots on a readStream, complete mode) must equal
    the batch build register-for-register across micro-batches — and
    therefore give the identical estimate."""
    from kinesiscat_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_from_slots,
        hll_slots,
    )
    from kinesiscat_spark.streaming.source import StreamConfig, run_to_memory

    rng = random.Random(13)
    rows = [(i, f"v{rng.randint(0, 300)}") for i in range(600)]
    df = spark.createDataFrame(rows, ["i", "g"])
    src = str(tmp_path / "src")
    df.repartition(4).write.parquet(src)

    p = 8
    stream = spark.readStream.schema("i long, g string").parquet(src)
    slot_table = run_to_memory(
        hll_slots(stream, "g", p),
        output_mode="complete",
        cfg=StreamConfig(batch_size=1),
    )
    streamed = hll_from_slots(slot_table, p)
    batch = hll_build(df, "g", p)
    assert streamed.collect()[0].hll == batch.collect()[0].hll
    est = streamed.select(hll_estimate(F.col("hll"), p).alias("e")).collect()[0].e
    exact = df.select("g").distinct().count()
    assert abs(est - exact) / exact < 0.25


def test_hll_setops_inclusion_exclusion_accuracy(spark):
    """Union via register max equals the full-stream build exactly;
    the inclusion-exclusion intersection estimate lands within ~5% of
    the true overlap at p=12 on overlapping synthetic sets."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.sketches import (
        hll_build,
        hll_estimate,
        hll_merge,
    )

    a = spark.range(0, 30_000).select(F.concat(F.lit("v"), "id").alias("g"))
    b = spark.range(20_000, 50_000).select(
        F.concat(F.lit("v"), "id").alias("g")
    )
    ha = hll_build(a, "g", p=12, method="md5")
    hb = hll_build(b, "g", p=12, method="md5")
    hu = hll_build(a.unionByName(b), "g", p=12, method="md5")
    row = (
        ha.select(F.col("hll").alias("_a"))
        .crossJoin(hb.select(F.col("hll").alias("_b")))
        .crossJoin(hu.select(F.col("hll").alias("_u")))
        .select(
            (hll_merge(F.col("_a"), F.col("_b")) == F.col("_u")).alias("eq"),
            hll_estimate(F.col("_a"), 12).alias("ea"),
            hll_estimate(F.col("_b"), 12).alias("eb"),
            hll_estimate(F.col("_u"), 12).alias("eu"),
        )
        .collect()[0]
    )
    assert row.eq  # merged registers ARE the full-stream registers
    inter = row.ea + row.eb - row.eu
    assert abs(inter - 10_000) / 10_000 < 0.05


def test_cms_inner_product_one_sided_and_close(spark):
    """The CMS inner-product estimate never underestimates the exact
    Σ f_a(g)·f_b(g) and lands within a few percent at d=4, w=2^14;
    holds for both hash methods."""
    import random

    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.sketches import (
        cms_build,
        cms_inner_product,
    )

    rng = random.Random(5)
    # skewed (Zipf-ish) draws: co-occurrence mass concentrates on the
    # shared head, where the CMS dot is RELATIVELY tight; the absolute
    # error bound eps*|a|1*|b|1 is asserted either way
    a_vals = [f"k{min(int(rng.expovariate(0.01)), 2000)}" for _ in range(20_000)]
    b_vals = [f"k{min(int(rng.expovariate(0.01)), 2000)}" for _ in range(20_000)]
    from collections import Counter

    ca, cb = Counter(a_vals), Counter(b_vals)
    exact = sum(ca[k] * cb[k] for k in ca.keys() & cb.keys())
    dfa = spark.createDataFrame([(v,) for v in a_vals], ["g"])
    dfb = spark.createDataFrame([(v,) for v in b_vals], ["g"])
    for method in ("xxhash64", "md5"):
        sa = cms_build(dfa, "g", d=4, w=1 << 14, method=method)
        sb = cms_build(dfb, "g", d=4, w=1 << 14, method=method)
        est = (
            sa.select(F.col("cms").alias("_a"))
            .crossJoin(sb.select(F.col("cms").alias("_b")))
            .select(
                cms_inner_product(F.col("_a"), F.col("_b"), 4, 1 << 14)
                .alias("e")
            )
            .collect()[0]
            .e
        )
        assert est >= exact                      # one-sided guarantee
        # the paper's whp bound: error <= (e/w)*|a|1*|b|1 per row
        import math

        bound = math.e / (1 << 14) * 20_000 * 20_000
        assert est - exact <= bound
        assert (est - exact) / exact < 0.05      # tight on skewed mass
