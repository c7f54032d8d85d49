"""Near-duplicate detection over text columns (extension surface X2).

All operators are pure DataFrame compositions designed around one idea:
never shuffle the documents themselves — shuffle fixed-width keys
(shingle hashes, minhash bands, simhash bands) and join doc ids back.

- ``shingles``: word n-grams as an array column (JVM transform over a
  sequence — no Python, no explode until needed).
- ``ngram_jaccard_pairs``: EXACT pairwise Jaccard ≥ t via an inverted
  index (explode shingle hashes → self-join on hash → count intersections
  → |A∪B| from per-doc counts). The join key is a 32-bit hash: at 100 TB
  the exchange carries (hash, doc_id) pairs only.
- ``minhash_signature`` / ``minhash_lsh_pairs``: approximate candidates via
  banded minhash (H hash functions = murmur3 with H seeds; band key =
  packed band row), then estimated-similarity filter. Collision work scales
  with actual near-dup density, not n².
- ``simhash64`` / ``simhash_pairs``: 64-bit simhash; near-dups = Hamming
  distance ≤ d found via 4-way band join (pigeonhole: distance ≤ 3 ⇒ at
  least one 16-bit quarter equal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string>; docs shorter than n words
    produce a single shingle of the whole doc."""
    toks = tokens(text)
    count = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct 32-bit murmur3 hashes of the n-gram shingles."""
    return F.array_distinct(F.transform(shingles(text, n), lambda s: F.hash(s)))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs ≥ threshold.

    Inverted-index plan: explode distinct shingle hashes, self-join on the
    hash (ids ordered to dedupe pairs), count co-occurrences = |A∩B|, then
    |A∪B| = |A| + |B| − |A∩B| from broadcast per-doc cardinalities.
    """
    sh = docs.select(
        F.col(id_col).alias("id"), shingle_hashes(F.col(text_col), n).alias("sh")
    )
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("h"))
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    sim = (
        common.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
    )
    return sim.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_signature(text: Column, n_hashes: int = 32, n: int = 3) -> Column:
    """array<int> minhash signature: element h = min over shingles of
    murmur3(shingle, seed=h). All JVM-side."""
    sh = shingles(text, n)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.hash(s, F.lit(h))))
            for h in range(n_hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    n_hashes: int = 32,
    n_bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs via banded minhash; estimated Jaccard = fraction of
    agreeing minhashes, filtered at `threshold`."""
    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), n_hashes, n).alias("sig"),
    )
    bands = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(F.slice("sig", b * r + 1, r)).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = cand.withColumn(
        "est_jaccard",
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.size("sig_a"),
    )
    return est.filter(F.col("est_jaccard") >= threshold).select(
        "id_a", "id_b", "est_jaccard"
    )


def simhash64(text: Column) -> Column:
    """64-bit simhash over word tokens: bit b is the sign of the sum of
    (±1) contributions of each token's murmur3-derived bit b."""
    toks = tokens(text)
    # two 32-bit murmur3 hashes with different seeds form the 64-bit space
    bit_sums = [
        F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t, b=b: acc
            + F.when(
                (
                    (F.hash(t, F.lit(1 if b < 32 else 2)).cast("long") >> (b % 32))
                    .bitwiseAND(F.lit(1))
                )
                == 1,
                1,
            ).otherwise(-1),
        )
        for b in range(64)
    ]
    out = F.lit(0).cast("long")
    for b, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(1).cast("long") << b).otherwise(0)
    return out


def simhash_pairs(
    docs: DataFrame,
    max_distance: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs with simhash Hamming distance ≤ max_distance (≤ 3 guaranteed
    found: 4 disjoint 16-bit bands ⇒ one must match exactly)."""
    sig = docs.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh")
    )
    bands = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        ((F.col("sh") >> (16 * b)).bitwiseAND(F.lit(0xFFFF))).alias(
                            "key"
                        ),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    dist = F.bit_count(xor)
    return cand.withColumn("hamming", dist).filter(
        F.col("hamming") <= max_distance
    ).select("id_a", "id_b", "hamming")
