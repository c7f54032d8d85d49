"""Property fuzz for the Bloom filter: random unicode key/probe sets over
edge-case (n_bits, k) configurations, all batched into a few Spark jobs
(the span-removal fuzz pattern).  The invariants that must NEVER break:
no false negatives, the all-zeros empty filter, and build determinism."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from kinesiscat_spark.operators.bloom import bloom_build, bloom_might_contain

CONFIGS = [(64, 1), (100, 3), (127, 2), (1 << 10, 4), (1 << 14, 7)]


def _rand_strings(rng: random.Random, n: int) -> list[str]:
    alphabet = "ab \t\n€🎉é0\x1f."
    out = []
    for _ in range(n):
        ln = rng.randint(0, 24)
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


def test_bloom_fuzz_no_false_negatives_and_determinism(spark):
    rng = random.Random(20260815)
    for n_bits, k in CONFIGS:
        keys = list(dict.fromkeys(_rand_strings(rng, 120) + [""]))
        others = [s + "~x" for s in _rand_strings(rng, 200)]
        keys_df = spark.createDataFrame([(v,) for v in keys], "g string")
        bloom = bloom_build(keys_df, "g", n_bits, k)
        [r1] = bloom.collect()
        [r2] = bloom_build(keys_df.repartition(5), "g", n_bits, k).collect()
        assert r1.bloom == r2.bloom, (n_bits, k)  # partition-invariant bits
        assert len(r1.bloom) == (n_bits + 63) // 64

        probes = spark.createDataFrame(
            [(v, v in set(keys)) for v in keys + others], "g string, member boolean"
        )
        rows = (
            probes.crossJoin(F.broadcast(bloom))
            .select(
                "member",
                bloom_might_contain(F.col("bloom"), F.col("g"), n_bits, k).alias(
                    "m"
                ),
            )
            .collect()
        )
        assert all(r.m for r in rows if r.member), (n_bits, k)
        # tiny tables can saturate tiny filters; only bound FPR when the
        # sizing is sane (>= ~8 bits/elem)
        if n_bits >= 8 * len(keys):
            fp = sum(1 for r in rows if r.m and not r.member)
            n_other = sum(1 for r in rows if not r.member)
            assert fp / n_other < 0.25, (n_bits, k, fp)
