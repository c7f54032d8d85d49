"""Sketch lanes: count-min-prefiltered frequent n-grams (EXACT output)
and HyperLogLog distinct-gram cardinality, one multi-kind lane.

The count-min path's contract is EXACTNESS (no-underestimate prefilter +
exact re-count), so its twin is the plain GROUP BY/HAVING and a hash match
proves the sketch plumbing end to end — the Bloom-decontamination pattern.
The HLL path (round 6) is approximate but DETERMINISTIC: md5-derived
60-bit hashes, register folds in array order — so the DuckDB twin replays
hash → register → harmonic-mean estimator bit-for-bit and the hash check
covers the estimator itself, next to an ``exact_distinct`` row that shows
the accuracy in-lane.

Round 6: registered INSIDE the driver's verdicted 50 (the round-5 cap
note is obsolete — see registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.queries.curation_queries import _WORDS, _ngrams_sql
from kinesiscat_spark.registry import query

_HH_N = 2
_HH_MIN = 30
_HLL_P = 12  # m = 4096
_VOCAB_TARGETS = (0.5, 0.9, 0.99)
_ZIPF_TOP = 512
_CSIM_H = 64  # corpus-similarity minhash width
_MOD48 = 1 << 48
_CMS_D, _CMS_W = 4, 1 << 14  # inner-product sketch (w sized for ~% error)

_HEAVY_ORACLE = f"""
WITH g AS (
  SELECT unnest({_ngrams_sql('text', _HH_N)}) AS gram FROM documents
),
hllh AS (
  SELECT CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS h FROM g
),
hllir AS (
  SELECT h >> 48 AS i,
         CASE WHEN (h & 281474976710655) > 0
              THEN 48 - length(bin(h & 281474976710655)) + 1
              ELSE 49 END AS r
  FROM hllh
),
hllreg AS (SELECT i, MAX(r) AS r FROM hllir GROUP BY i),
hlldense AS (
  SELECT t.i AS i, coalesce(hllreg.r, 0) AS r
  FROM (SELECT unnest(range(4096)) AS i) t LEFT JOIN hllreg USING (i)
),
hllarr AS (SELECT list(r ORDER BY i) AS regs FROM hlldense),
hllest AS (
  SELECT CASE WHEN raw <= 10240.0 AND zeros > 0
              THEN 4096.0 * ln(4096.0 / zeros)
              ELSE raw END AS est
  FROM (
    SELECT 12098218.894406674 / list_sum(list_transform(regs, r -> pow(2.0, -r))) AS raw,
           len(list_filter(regs, r -> r = 0)) AS zeros
    FROM hllarr
  )
)
SELECT 'heavy' AS kind, gram, COUNT(*)::BIGINT AS cnt,
       CAST(NULL AS DOUBLE) AS est
FROM g GROUP BY gram HAVING COUNT(*) >= {_HH_MIN}
UNION ALL
SELECT 'exact_distinct' AS kind, CAST(NULL AS VARCHAR) AS gram,
       COUNT(DISTINCT gram)::BIGINT AS cnt, CAST(NULL AS DOUBLE) AS est
FROM g
UNION ALL
SELECT 'hll_distinct' AS kind, CAST(NULL AS VARCHAR) AS gram,
       CAST(NULL AS BIGINT) AS cnt, ROUND(est, 4) AS est
FROM hllest
UNION ALL
SELECT 'vocab' AS kind, t.lbl AS gram,
       (SELECT MIN(rk) FROM vrk WHERE cum::DOUBLE / total >= t.t) AS cnt,
       (SELECT ROUND(MIN(struct_pack(rk := rk, cum := cum)).cum::DOUBLE
                     / MAX(total), 6)
        FROM vrk WHERE cum::DOUBLE / total >= t.t) AS est
FROM (VALUES {", ".join(f"('{t:g}', {t!r}::DOUBLE)" for t in _VOCAB_TARGETS)}) t(lbl, t)
"""

# Round-7 continuation widenings: Zipf-law fit (rides the vocab CTEs —
# regression sums fold in RANK order, the DSIR-proven list_sum <->
# sort_array+aggregate pairing) and the corpus-level MinHash similarity
# matrix (per-source UNION signatures, minhash_lsh's md5 Carter-Wegman
# hash family).
_ZIPF_CSIM_CTE = f""",
zrk AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk, c FROM vwc
  QUALIFY rk <= {_ZIPF_TOP}
),
zs AS (
  SELECT count(*)::DOUBLE AS n,
         list_sum(list(ln(rk::DOUBLE) ORDER BY rk)) AS sx,
         list_sum(list(ln(c::DOUBLE) ORDER BY rk)) AS sy,
         list_sum(list(ln(rk::DOUBLE) * ln(c::DOUBLE) ORDER BY rk)) AS sxy,
         list_sum(list(ln(rk::DOUBLE) * ln(rk::DOUBLE) ORDER BY rk)) AS sxx
  FROM zrk
),
zfit AS (  -- CASE-guarded like the Spark fit: NULL on degenerate corpora
  SELECT n::BIGINT AS n_points,
         CASE WHEN n * sxx - sx * sx <> 0
              THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
         CASE WHEN n <> 0 AND n * sxx - sx * sx <> 0
              THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
         END AS icpt
  FROM zs
),
cm_hp AS (
  SELECT source,
         ('0x' || substring(md5(sgl), 1, 12))::BIGINT AS h1,
         ('0x' || substring(md5(sgl), 13, 12))::BIGINT AS h2
  FROM (
    SELECT source, unnest(list_transform(
             generate_series(1, greatest(len(t) - 2, 1)),
             i -> array_to_string(t[i:i+2], ' '))) AS sgl
    FROM (SELECT source, string_split_regex(lower(text), '\\s+') AS t
          FROM documents)
  )
),
cm_min AS (
  SELECT source, t.i AS i, MIN((h1 + t.i * h2) % {_MOD48}) AS v
  FROM cm_hp CROSS JOIN range(0, {_CSIM_H}) t(i)
  GROUP BY source, t.i
),
cm_sig AS (SELECT source, list(v ORDER BY i) AS sig FROM cm_min GROUP BY source),
cm_pairs AS (
  SELECT a.source AS ga, b.source AS gb,
         len(list_filter(list_zip(a.sig, b.sig), p -> p[1] = p[2])) AS m
  FROM cm_sig a JOIN cm_sig b ON a.source < b.source
)"""

_ZIPF_CSIM_SELECTS = f"""
UNION ALL
SELECT 'zipf' AS kind, 'slope' AS gram, n_points AS cnt,
       ROUND(slope, 6) AS est
FROM zfit
UNION ALL
SELECT 'zipf' AS kind, 'intercept' AS gram, n_points AS cnt,
       ROUND(icpt, 6) AS est
FROM zfit
UNION ALL
SELECT 'corpus_sim' AS kind, ga || '|' || gb AS gram, m::BIGINT AS cnt,
       ROUND(m / {_CSIM_H}.0, 6) AS est
FROM cm_pairs"""

# Per-half HLL register/estimator replay (round-7 continuation set ops):
# same hash → register → harmonic-mean machinery as the full-stream
# pipeline, restricted by a doc-parity predicate. The union estimate
# needs NO new pipeline: max-over-subsets partitions, so the merged
# registers ARE the full-stream registers (hllest).
def _hll_half_ctes(s: str, pred: str) -> str:
    return f""",
hllh_{s} AS (
  SELECT CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) AS h
  FROM gd WHERE {pred}
),
hllir_{s} AS (
  SELECT h >> 48 AS i,
         CASE WHEN (h & 281474976710655) > 0
              THEN 48 - length(bin(h & 281474976710655)) + 1
              ELSE 49 END AS r
  FROM hllh_{s}
),
hllreg_{s} AS (SELECT i, MAX(r) AS r FROM hllir_{s} GROUP BY i),
hlldense_{s} AS (
  SELECT t.i AS i, coalesce(hllreg_{s}.r, 0) AS r
  FROM (SELECT unnest(range(4096)) AS i) t LEFT JOIN hllreg_{s} USING (i)
),
hllarr_{s} AS (SELECT list(r ORDER BY i) AS regs FROM hlldense_{s}),
hllest_{s} AS (
  SELECT CASE WHEN raw <= 10240.0 AND zeros > 0
              THEN 4096.0 * ln(4096.0 / zeros)
              ELSE raw END AS est
  FROM (
    SELECT 12098218.894406674 / list_sum(list_transform(regs, r -> pow(2.0, -r))) AS raw,
           len(list_filter(regs, r -> r = 0)) AS zeros
    FROM hllarr_{s}
  )
)"""


_HLL_SETOPS_CTE = f""",
gd AS (
  SELECT doc_id, unnest({_ngrams_sql('text', _HH_N)}) AS gram FROM documents
){_hll_half_ctes('e', 'doc_id % 2 = 0')}{_hll_half_ctes('o', 'doc_id % 2 = 1')},
gboth AS (
  SELECT gram FROM (
    SELECT gram,
           MAX(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS me,
           MAX(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS mo
    FROM gd GROUP BY gram
  ) WHERE me = 1 AND mo = 1
)"""

# CMS inner-product replay: md5 slot hashes per half, slot-count frames
# joined on the flat index, per-row product sums, min over rows — exact
# BIGINT arithmetic end to end (no float-order concerns).
_CMS_DOT_CTE = f""",
cse AS (
  SELECT t.r * {_CMS_W} + ('0x' || substr(md5(CAST(t.r AS VARCHAR)
           || chr(31) || gram), 1, 12))::BIGINT % {_CMS_W} AS i,
         COUNT(*)::BIGINT AS c
  FROM gd CROSS JOIN range(0, {_CMS_D}) t(r) WHERE doc_id % 2 = 0
  GROUP BY 1
),
cso AS (
  SELECT t.r * {_CMS_W} + ('0x' || substr(md5(CAST(t.r AS VARCHAR)
           || chr(31) || gram), 1, 12))::BIGINT % {_CMS_W} AS i,
         COUNT(*)::BIGINT AS c
  FROM gd CROSS JOIN range(0, {_CMS_D}) t(r) WHERE doc_id % 2 = 1
  GROUP BY 1
),
cdot AS (
  SELECT MIN(s) AS est FROM (
    SELECT e.i // {_CMS_W} AS r, SUM(e.c * o.c)::BIGINT AS s
    FROM cse e JOIN cso o ON e.i = o.i
    GROUP BY 1
  )
),
cexact AS (
  SELECT SUM(ce * co)::BIGINT AS dot FROM (
    SELECT SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS ce,
           SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS co
    FROM gd GROUP BY gram
  )
)"""

_CMS_DOT_SELECT = """
UNION ALL
SELECT 'cms_dot' AS kind, CAST(NULL AS VARCHAR) AS gram,
       (SELECT dot FROM cexact) AS cnt,
       CAST(est AS DOUBLE) AS est
FROM cdot"""

# c-TF-IDF replay (Grootendorst 2022): per-class term counts, corpus term
# totals from the SAME counts, A = mean class token mass; score and rank
# in the exact arithmetic order of operators/text.py class_tfidf.
_CTFIDF_TOPK = 3
_CTFIDF_CTE = """,
ctf_ct AS (
  SELECT source AS grp, w AS t, COUNT(*)::BIGINT AS c FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS w
    FROM documents
  ) GROUP BY 1, 2
),
ctf_ft AS (SELECT t, SUM(c)::BIGINT AS f FROM ctf_ct GROUP BY t),
ctf_mass AS (SELECT grp, SUM(c)::BIGINT AS m FROM ctf_ct GROUP BY grp),
ctf_a AS (SELECT SUM(m)::DOUBLE / COUNT(*) AS a FROM ctf_mass),
ctf_scored AS (
  SELECT grp, t,
         c::DOUBLE * ln(1.0 + (SELECT a FROM ctf_a) / f::DOUBLE) AS score
  FROM ctf_ct JOIN ctf_ft USING (t)
),
ctf_top AS (
  SELECT grp, t, score,
         ROW_NUMBER() OVER (PARTITION BY grp
                            ORDER BY score DESC, t ASC) AS rk
  FROM ctf_scored
)"""

_CTFIDF_SELECT = f"""
UNION ALL
SELECT 'ctfidf' AS kind, grp || '|' || t AS gram, CAST(rk AS BIGINT) AS cnt,
       ROUND(score, 6) AS est
FROM ctf_top WHERE rk <= {_CTFIDF_TOPK}"""

_HLL_SETOPS_SELECTS = """
UNION ALL
SELECT 'hll_union' AS kind, CAST(NULL AS VARCHAR) AS gram,
       CAST(NULL AS BIGINT) AS cnt, ROUND(est, 4) AS est
FROM hllest
UNION ALL
SELECT 'hll_intersect' AS kind, CAST(NULL AS VARCHAR) AS gram,
       (SELECT COUNT(*) FROM gboth)::BIGINT AS cnt,
       ROUND(e.est + o.est - u.est, 4) AS est
FROM hllest_e e, hllest_o o, hllest u"""

# PMI collocation replay (Church & Hanks 1990): unigram counts off the
# SAME trimmed word stream word_ngrams rides, bigram counts straight from
# the existing g CTE, score = five ln calls folded in the operator's
# written order (same libm doubles — the Zipf precedent), rank over the
# min-count-filtered collocation table only.
_PMI_MIN = 5
_PMI_TOPK = 10
_PMI_CTE = f""",
pmi_w AS (
  SELECT unnest({{words}}) AS w FROM documents
),
pmi_uc AS (SELECT w, COUNT(*)::BIGINT AS c FROM pmi_w GROUP BY w),
pmi_tot AS (
  SELECT (SELECT COUNT(*) FROM pmi_w)::BIGINT AS n,
         (SELECT COUNT(*) FROM g)::BIGINT AS m
),
pmi_pc AS (
  SELECT gram, COUNT(*)::BIGINT AS cnt FROM g GROUP BY gram
  HAVING COUNT(*) >= {_PMI_MIN}
),
pmi_scored AS (
  SELECT p.gram, p.cnt,
         ln(p.cnt::DOUBLE) - ln(ca.c::DOUBLE) - ln(cb.c::DOUBLE)
           + 2.0 * ln(t.n::DOUBLE) - ln(t.m::DOUBLE) AS pmi
  FROM pmi_pc p
  JOIN pmi_uc ca ON ca.w = split_part(p.gram, ' ', 1)
  JOIN pmi_uc cb ON cb.w = split_part(p.gram, ' ', 2)
  CROSS JOIN pmi_tot t
),
pmi_top AS (
  SELECT gram, cnt, pmi,
         ROW_NUMBER() OVER (ORDER BY pmi DESC, gram ASC) AS rk
  FROM pmi_scored
)"""

_PMI_SELECT = f"""
UNION ALL
SELECT 'pmi' AS kind, gram, cnt, ROUND(pmi, 6) AS est
FROM pmi_top WHERE rk <= {_PMI_TOPK}"""

# Corpus-card replay (round-7 continuation): per-source datasheet
# aggregates — all integer counts, argmax via struct MIN over
# (−count, lang), one exact ratio for the dominant-language share.
_CARD_CTE = """,
cc0 AS (
  SELECT source AS g, coalesce(lang, '') AS l,
         len({words})::BIGINT AS ntok
  FROM documents
),
ccl AS (
  SELECT g, l, COUNT(*)::BIGINT AS nl, SUM(ntok)::BIGINT AS tl
  FROM cc0 GROUP BY g, l
),
ccg AS (
  SELECT g, SUM(nl)::BIGINT AS n_docs, SUM(tl)::BIGINT AS n_tokens,
         COUNT(*)::BIGINT AS n_langs,
         MIN(struct_pack(neg := -nl, l := l)) AS top
  FROM ccl GROUP BY g
)"""

_CARD_SELECT = """
UNION ALL
SELECT 'card' AS kind, g || '|docs' AS gram, n_docs AS cnt,
       CAST(NULL AS DOUBLE) AS est
FROM ccg
UNION ALL
SELECT 'card', g || '|tokens', n_tokens, CAST(NULL AS DOUBLE) FROM ccg
UNION ALL
SELECT 'card', g || '|langs', n_langs, CAST(NULL AS DOUBLE) FROM ccg
UNION ALL
SELECT 'card', g || '|top|' || top.l, CAST(NULL AS BIGINT),
       ROUND((-top.neg)::DOUBLE / n_docs, 6)
FROM ccg
UNION ALL
SELECT 'distinct_n' AS kind, CAST(NULL AS VARCHAR) AS gram,
       COUNT(*)::BIGINT AS cnt,
       ROUND(COUNT(DISTINCT gram)::DOUBLE / COUNT(*), 6) AS est
FROM g"""

_VOCAB_CTE = """,
vw AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w FROM documents
),
vwc AS (SELECT w, COUNT(*)::BIGINT AS c FROM vw GROUP BY w),
vrk AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk,
         SUM(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS total
  FROM vwc
)
"""
_HEAVY_ORACLE = _HEAVY_ORACLE.replace(
    ")\nSELECT 'heavy'",
    ")" + _VOCAB_CTE.rstrip() + _ZIPF_CSIM_CTE + _HLL_SETOPS_CTE
    + _CMS_DOT_CTE + _CTFIDF_CTE
    + _PMI_CTE.format(words=_WORDS.format(t="text"))
    + _CARD_CTE.format(words=_WORDS.format(t="coalesce(text, '')"))
    + "\nSELECT 'heavy'",
) + (
    _ZIPF_CSIM_SELECTS + _HLL_SETOPS_SELECTS + _CMS_DOT_SELECT
    + _CTFIDF_SELECT + _PMI_SELECT + _CARD_SELECT
)


def _single_row_exprs() -> dict:
    """Every Column expression of the fused single-row branch, built ONCE
    per process (kinesiscat_spark/expr_memo.py — the curation_signals
    memo discipline): all of them are pure functions of literal lane
    constants and the g2/range column NAMES, so the trees are reusable
    verbatim; rebuilding them cost ~1 s of py4j round trips per
    invocation (HLL estimator HOF folds dominate, measured)."""
    from kinesiscat_spark.expr_memo import expr_memo

    def build() -> dict:
        from kinesiscat_spark.operators.sketches import (
            _hll_hash60,
            _slot,
            cms_inner_product,
            hll_estimate,
            hll_merge,
        )

        null_est = F.lit(None).cast("double")
        _rem_bits = 60 - _HLL_P
        _h60 = _hll_hash60(F.col("gram"), "md5")
        _ridx = F.shiftright(_h60, _rem_bits)
        _rem = _h60.bitwiseAND(F.lit((1 << _rem_bits) - 1))
        _rank = (
            F.when(
                _rem > 0, F.lit(_rem_bits) - F.length(F.bin(_rem)) + F.lit(1)
            )
            .otherwise(F.lit(_rem_bits + 1))
            .cast("long")
        )
        _zero = F.lit(0).cast("long")
        _e_a = hll_estimate(F.col("_a"), p=_HLL_P)
        _e_b = hll_estimate(F.col("_b"), p=_HLL_P)
        _e_u = hll_estimate(hll_merge(F.col("_a"), F.col("_b")), p=_HLL_P)
        _ngram = F.lit(None).cast("string")
        _ncnt = F.lit(None).cast("long")
        return {
            "hs_sel": [
                _ridx.alias("i"), _rank.alias("r"), F.col("_ce"),
                F.col("_co"),
            ],
            "hs_agg": [
                F.max("r").alias("_rf"),
                F.max(F.when(F.col("_ce") > 0, F.col("r"))).alias("_re"),
                F.max(F.when(F.col("_co") > 0, F.col("r"))).alias("_ro"),
            ],
            "hll3_agg": F.array_sort(
                F.collect_list(
                    F.struct(
                        "i",
                        F.coalesce("_rf", _zero).alias("f"),
                        F.coalesce("_re", _zero).alias("e"),
                        F.coalesce("_ro", _zero).alias("o"),
                    )
                )
            ).alias("s"),
            "hll3_sel": [
                F.transform("s", lambda x: x["f"]).alias("_hf"),
                F.transform("s", lambda x: x["e"]).alias("_a"),
                F.transform("s", lambda x: x["o"]).alias("_b"),
            ],
            "cs_sel": [
                F.explode(
                    F.array(
                        *[
                            _slot(F.col("gram"), r, _CMS_W, "md5")
                            for r in range(_CMS_D)
                        ]
                    )
                ).alias("i"),
                F.col("_ce"),
                F.col("_co"),
            ],
            "cs_agg": [
                F.sum("_ce").alias("_se"), F.sum("_co").alias("_so"),
            ],
            "cms2_agg": F.array_sort(
                F.collect_list(
                    F.struct(
                        "i",
                        F.coalesce("_se", _zero).alias("e"),
                        F.coalesce("_so", _zero).alias("o"),
                    )
                )
            ).alias("s"),
            "cms2_sel": [
                F.transform("s", lambda x: x["e"]).alias("_ca"),
                F.transform("s", lambda x: x["o"]).alias("_cb"),
            ],
            "scal_agg": [
                F.count("*").alias("_d"),
                F.coalesce(
                    F.sum(F.col("_ce") + F.col("_co")), F.lit(0)
                ).alias("_tot"),
                F.sum(F.col("_ce") * F.col("_co")).alias("_dot"),
                F.coalesce(
                    F.sum(
                        ((F.col("_ce") > 0) & (F.col("_co") > 0)).cast("long")
                    ),
                    F.lit(0),
                ).alias("_nboth"),
            ],
            "rows_sel": F.explode(
                F.array(
                    F.struct(
                        F.lit("exact_distinct").alias("kind"),
                        _ngram.alias("gram"),
                        F.col("_d").alias("cnt"),
                        null_est.alias("est"),
                    ),
                    F.struct(
                        F.lit("hll_distinct").alias("kind"),
                        _ngram.alias("gram"),
                        _ncnt.alias("cnt"),
                        F.round(hll_estimate(F.col("_hf"), p=_HLL_P), 4)
                        .alias("est"),
                    ),
                    F.struct(
                        F.lit("distinct_n").alias("kind"),
                        _ngram.alias("gram"),
                        F.col("_tot").alias("cnt"),
                        F.round(
                            F.try_divide(
                                F.col("_d").cast("double"), F.col("_tot")
                            ),
                            6,
                        ).alias("est"),
                    ),
                    F.struct(
                        F.lit("hll_union").alias("kind"),
                        _ngram.alias("gram"),
                        _ncnt.alias("cnt"),
                        F.round(_e_u, 4).alias("est"),
                    ),
                    F.struct(
                        F.lit("hll_intersect").alias("kind"),
                        _ngram.alias("gram"),
                        F.col("_nboth").alias("cnt"),
                        F.round(_e_a + _e_b - _e_u, 4).alias("est"),
                    ),
                    F.struct(
                        F.lit("cms_dot").alias("kind"),
                        _ngram.alias("gram"),
                        F.col("_dot").cast("long").alias("cnt"),
                        cms_inner_product(
                            F.col("_ca"), F.col("_cb"), _CMS_D, _CMS_W
                        )
                        .cast("double")
                        .alias("est"),
                    ),
                )
            ).alias("s"),
        }

    return expr_memo(
        ("heavy_single_rows", _HLL_P, _CMS_D, _CMS_W), build
    )


@query("text_heavy_ngrams", oracle=_HEAVY_ORACLE)
def text_heavy_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch family over word {n}-grams, three hash-checked kinds.

    ``kind='heavy'``: frequent n-grams (boilerplate detection) — exactly
    the full GROUP BY/HAVING result, read from the lane's shared
    per-gram count aggregate (round 9; the count-min prefilter path —
    operators/sketches.py heavy_hitters, Cormode & Muthukrishnan 2005 —
    remains the scale answer when no count table exists, and its sketch
    machinery is exercised by ``kind='cms_dot'`` below).

    ``kind='hll_distinct'`` (round 6): HyperLogLog distinct-gram count
    (Flajolet et al. 2007; ``hll_distinct(method='md5')``) — ONE
    bounded-exchange pass (≤ 2^p register rows shuffle) where the exact
    count-distinct shuffles every distinct gram; the oracle replays
    hash → registers → estimator bit-for-bit, so the hash check covers
    the estimator math itself.  ``kind='exact_distinct'`` rides along as
    the accuracy yardstick (p=12 → ~1.6% expected relative error,
    asserted in tests/test_sketches.py).

    ``kind='zipf'`` (round 7): least-squares Zipf-law fit (slope /
    intercept of ln freq on ln rank over the top-512 tokens) —
    corpus-level token-diversity diagnostic; regression sums fold in
    RANK order on both engines so the fit hash-checks exactly.

    ``kind='corpus_sim'`` (round 7): corpus-LEVEL MinHash similarity
    matrix (operators/dedup.py corpus_minhash_similarity; Broder 1997
    union-signature property) — estimated shingle-set Jaccard between
    every ``source`` pair from per-source element-wise-min signatures;
    the dataset-overlap signal behind mixing decisions. The only
    exchange is (n_sources x 64) minima.
    """
    from kinesiscat_spark.operators.curation import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    # ONE gram-count subtree feeds every duplicate-insensitive or
    # count-derived kind (r8, VERDICT r7 task 3c): HLL registers over
    # DISTINCT grams are bit-identical to the full stream's (duplicate
    # insensitivity), and the exact-distinct / distinct-n scalars are
    # count-table aggregates. Round 9 (guide §2.4): that subtree is now
    # DERIVED from the even/odd-half aggregate ``g2`` below — per-gram
    # count = _ce + _co exactly (every occurrence is in exactly one
    # half, integer addition), so the former second full-corpus
    # explode+groupBy(gram) exchange is gone and ReuseExchange serves
    # all nine count-derived consumers from ONE exchange.
    # The subtree is MATERIALIZED once (lazy localCheckpoint): its ~12
    # consumers prune different column subsets, so their canonical
    # exchange subtrees differ and ReuseExchange never fires — the
    # before-plan carried 38 parquet scans / 48 explodes / 122 Exchanges
    # for ONE lane invocation (plans/r09/text_heavy_ngrams_before.txt).
    # Checkpointing pins the corpus scan + explode + count exchange to
    # exactly one execution (guide §2.4/§5 — "materialise an intermediate
    # result truncates the plan"); at 100 TB this is the "build the gram
    # count table once, then aggregate against it" design.
    # Round 10 (VERDICT r9 item 5, guide §2.3/§2.4): the gram stream and
    # the (source, token) stream explode from ONE corpus scan as a
    # tagged union of structs, and ONE combined (tag, grp, key) count
    # exchange replaces the former two corpus explode+groupBy passes.
    # The aggregate values are exact integers, identical to the split
    # pipelines: gram groups (tag=true) only ever contain gram rows, so
    # their conditional even/odd sums are the old _ce/_co; token groups
    # (tag=false) count the same rows ct counted. The checkpoint then
    # splits by tag into the same two count tables every downstream
    # consumer read before.
    from kinesiscat_spark.operators.dedup import tokens

    _null_s = F.lit(None).cast("string")
    tagged = docs.select(
        F.explode(
            F.concat(
                F.transform(
                    word_ngrams(F.col("text"), _HH_N),
                    lambda g: F.struct(
                        F.lit(True).alias("ig"),
                        (F.col("doc_id") % 2 == 0).alias("even"),
                        _null_s.alias("grp"),
                        g.alias("key"),
                    ),
                ),
                F.transform(
                    tokens(F.col("text")),
                    lambda t: F.struct(
                        F.lit(False).alias("ig"),
                        F.lit(None).cast("boolean").alias("even"),
                        F.col("source").alias("grp"),
                        t.alias("key"),
                    ),
                ),
            )
        ).alias("r")
    ).select("r.ig", "r.even", "r.grp", "r.key")
    both_counts = (
        tagged.groupBy("ig", "grp", "key")
        .agg(
            F.sum(F.col("even").cast("long")).alias("_ce"),
            F.sum((~F.col("even")).cast("long")).alias("_co"),
            F.count("*").alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    g2 = both_counts.filter(F.col("ig")).select(
        F.col("key").alias("gram"), "_ce", "_co"
    )
    gcounts = g2.select(
        "gram", (F.col("_ce") + F.col("_co")).alias("_c")
    )
    null_est = F.lit(None).cast("double")
    # `heavy` reads the SAME gcounts table (round 9, guide §1.2/§2.4):
    # heavy_hitters' contract is "EXACT output, identical to
    # groupBy.count().filter" — and this lane already pays the full
    # per-gram count aggregate for its nine other consumers, so the
    # operator's CMS two-pass raw stream (still the right call when no
    # count table exists — operators/sketches.py heavy_hitters, kept,
    # tested, and demonstrated by kind='cms_dot' here) would re-explode
    # the corpus twice for a result the shared exchange already holds.
    heavy = gcounts.filter(F.col("_c") >= _HH_MIN).select(
        F.lit("heavy").alias("kind"),
        "gram",
        F.col("_c").alias("cnt"),
        null_est.alias("est"),
    )
    # Round 9 (guide §2.4, "two operations keyed the same way share one
    # exchange"): every single-row kind — exact_distinct, hll_distinct,
    # distinct_n, hll_union, hll_intersect, cms_dot — now derives from
    # THREE fused aggregates over the checkpointed g2 instead of ten
    # separate pipelines:
    #   * ONE (register i) -> (max r | full, max r | even, max r | odd)
    #     aggregate replaces the three hll_build passes (registers of a
    #     filtered stream are the conditional MAX over the same rows, and
    #     a register no half-gram hits densifies to the same 0);
    #   * ONE (slot i) -> (sum _ce, sum _co) aggregate replaces the two
    #     cms_build passes (weight 0 rows add nothing to a slot sum);
    #   * ONE scalar aggregate replaces the four scalar passes
    #     (count-over-filter == sum of the indicator, coalesced at 0).
    # All values are bit-identical (exact integer counts; the HLL/CMS
    # estimator expressions are unchanged and run over identical arrays),
    # pinned by the lane's unchanged DuckDB oracle hash.
    _ex = _single_row_exprs()
    hslots = (
        g2.select(*_ex["hs_sel"]).groupBy("i").agg(*_ex["hs_agg"])
    )
    hll3 = (
        spark.range(1 << _HLL_P)
        .select(F.col("id").alias("i"))
        .join(hslots, "i", "left")
        .agg(_ex["hll3_agg"])
        .select(*_ex["hll3_sel"])
    )
    cslots = (
        g2.select(*_ex["cs_sel"]).groupBy("i").agg(*_ex["cs_agg"])
    )
    cms2 = (
        spark.range(_CMS_D * _CMS_W)
        .select(F.col("id").alias("i"))
        .join(cslots, "i", "left")
        .agg(_ex["cms2_agg"])
        .select(*_ex["cms2_sel"])
    )
    scal = g2.agg(*_ex["scal_agg"])
    single_rows = (
        hll3.crossJoin(cms2)
        .crossJoin(scal)
        .select(_ex["rows_sel"])
        .select("s.kind", "s.gram", "s.cnt", "s.est")
    )
    # round-7 widening: vocabulary-coverage curve (operators/text.py
    # vocab_coverage) — minimal most-frequent-first vocab reaching each
    # coverage target over whitespace tokens; the rank window runs over
    # the VOCAB table, never corpus tokens. Target labels are f"{t:g}"
    # strings on both engines.
    from kinesiscat_spark.operators.dedup import tokens
    from kinesiscat_spark.operators.text import vocab_coverage

    # ONE lowercased-token explode serves the whole `tokens()` family
    # (round 9, guide §2.4): the (source, term) count table is
    # class_tfidf's own aggregate, and the global word-count table the
    # vocab/zipf windows rank is its exact integer marginal
    # (sum over sources) — so vocab, zipf and ctfidf share a single
    # corpus scan+explode+exchange instead of paying one each. Round 10:
    # that count table now arrives as the tag=false half of the fused
    # `both_counts` checkpoint above (one corpus pass for the WHOLE lane).
    ct = both_counts.filter(~F.col("ig")).select(
        "grp", F.col("key").alias("t"), "c"
    )
    wc = (
        ct.groupBy("t")
        .agg(F.sum("c").alias("c"))
        .select(F.col("t").alias("w"), "c")
    )
    # ONE materialized (rk, c, cum, total) ranking under the
    # (count DESC, word ASC) window serves BOTH vocab_coverage and
    # zipf_fit (round 9, guide §2.4): the global single-partition sort —
    # the expensive part of both — runs once instead of once per
    # consumer; exact integer ranks, so both outputs are bit-identical.
    from pyspark.sql.window import Window

    _wnd = Window.orderBy(F.desc("c"), F.asc("w"))
    ranked = wc.select(
        F.row_number().over(_wnd).alias("rk"),
        "c",
        F.sum("c")
        .over(_wnd.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("total"),
    ).localCheckpoint(eager=True)
    lbl = F.array(*[F.lit(f"{t:g}") for t in _VOCAB_TARGETS])
    tgt = F.array(*[F.lit(float(t)) for t in _VOCAB_TARGETS])
    vocab = vocab_coverage(
        docs, targets=_VOCAB_TARGETS, _counts=wc, _ranked=ranked
    ).select(
        F.lit("vocab").alias("kind"),
        F.element_at(
            lbl, (F.array_position(tgt, F.col("target"))).cast("int")
        ).alias("gram"),
        F.col("vocab_size").alias("cnt"),
        F.col("coverage").alias("est"),
    )
    # round-7 continuation widenings: Zipf-law fit over the same vocab
    # table (kind='zipf' — corpus-level token-diversity diagnostic) and
    # the corpus-level MinHash similarity matrix (kind='corpus_sim' —
    # estimated shingle-Jaccard between every source pair from per-source
    # UNION signatures; the dataset-overlap signal behind mixing
    # decisions). Both deterministic and replayed in the SQL twin.
    from kinesiscat_spark.operators.dedup import corpus_minhash_similarity
    from kinesiscat_spark.operators.text import zipf_fit

    zipf = zipf_fit(docs, top_n=_ZIPF_TOP, _counts=wc, _ranked=ranked).select(
        F.lit("zipf").alias("kind"),
        F.col("stat").alias("gram"),
        F.col("n_points").alias("cnt"),
        F.col("value").alias("est"),
    )
    csim = corpus_minhash_similarity(docs, n_hashes=_CSIM_H).select(
        F.lit("corpus_sim").alias("kind"),
        F.concat_ws("|", "group_a", "group_b").alias("gram"),
        F.col("n_matches").alias("cnt"),
        F.col("est_jaccard").alias("est"),
    )
    # round-7 continuation: c-TF-IDF per-source distinctive terms
    # (Grootendorst 2022 — the per-source corpus-card diagnostic); rank
    # rides cnt, score rides est.
    from kinesiscat_spark.operators.text import class_tfidf

    ctfidf = class_tfidf(
        docs, group_col="source", top_k=_CTFIDF_TOPK, _ct=ct
    ).select(
        F.lit("ctfidf").alias("kind"),
        F.concat_ws("|", "group", "term").alias("gram"),
        F.col("rank").alias("cnt"),
        F.col("score").alias("est"),
    )
    # round-7 continuation: PMI collocations (Church & Hanks 1990) — the
    # phrase-mining / tokenizer-seeding diagnostic; rides the same word
    # stream as the heavy bigrams, distributed top-k via orderBy+limit.
    from kinesiscat_spark.operators.text import pmi_collocations

    # PMI's bigram table IS gcounts (same word_ngrams(text, 2) stream) —
    # derived from the shared g2 exchange instead of a third bigram
    # explode (round 9, guide §2.4)
    pmi = pmi_collocations(
        docs,
        min_count=_PMI_MIN,
        top_k=_PMI_TOPK,
        _pairs_all=gcounts.select("gram", F.col("_c").alias("cnt")),
    ).select(
        F.lit("pmi").alias("kind"),
        F.col("gram"),
        F.col("cnt"),
        F.col("pmi").alias("est"),
    )
    # round-7 continuation: per-source corpus card (datasheet aggregates,
    # Gebru et al. 2021) — four rows per source under kind='card'
    # (operators/text.py corpus_card).
    from kinesiscat_spark.operators.text import corpus_card

    null_cnt = F.lit(None).cast("long")
    card = corpus_card(docs).select(
        F.explode(
            F.array(
                F.struct(
                    F.concat(F.col("group"), F.lit("|docs")).alias("gram"),
                    F.col("n_docs").alias("cnt"),
                    null_est.alias("est"),
                ),
                F.struct(
                    F.concat(F.col("group"), F.lit("|tokens")).alias("gram"),
                    F.col("n_tokens").alias("cnt"),
                    null_est.alias("est"),
                ),
                F.struct(
                    F.concat(F.col("group"), F.lit("|langs")).alias("gram"),
                    F.col("n_langs").alias("cnt"),
                    null_est.alias("est"),
                ),
                F.struct(
                    F.concat(
                        F.col("group"), F.lit("|top|"), F.col("top_lang")
                    ).alias("gram"),
                    null_cnt.alias("cnt"),
                    F.col("top_lang_share").alias("est"),
                ),
            )
        ).alias("s")
    ).select(
        F.lit("card").alias("kind"),
        F.col("s.gram"),
        F.col("s.cnt"),
        F.col("s.est"),
    )
    out = (
        heavy.unionByName(single_rows)
        .unionByName(vocab)
        .unionByName(zipf)
        .unionByName(csim)
        .unionByName(ctfidf)
        .unionByName(pmi)
        .unionByName(card)
    )
    # per-kind (count, xor) digests ride the driver's collect job into
    # DEBUG_text_heavy_ngrams.jsonl — a future 13-kind hash red is
    # self-localizing (VERDICT r8 task 7)
    from kinesiscat_spark.debug_digests import observe_kind_digests

    return observe_kind_digests(
        out,
        "text_heavy_ngrams",
        ["heavy", "exact_distinct", "hll_distinct", "distinct_n", "vocab",
         "zipf", "corpus_sim", "hll_union", "hll_intersect", "cms_dot",
         "ctfidf", "pmi", "card"],
    )
