"""Curation-pipeline lanes: deterministic sampling / corpus mixing and
duplicate-cluster resolution — the operators a training-data pipeline runs
between near-dup detection and the final corpus (SURVEY §2b; previously
pytest-only, surfaced here as driver-hash-checked lanes).

The sampling lane uses ``hash_sample``'s md5 method so the EXACT selected
row set reproduces in DuckDB (xxhash64 has no DuckDB twin); the cluster
lane's oracle re-derives connected components with a recursive CTE over
the same Jaccard pair query the dedup lane checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesiscat_spark.io_tables import load_table
from kinesiscat_spark.operators.clusters import keep_canonical
from kinesiscat_spark.operators.dedup import ngram_jaccard_pairs
from kinesiscat_spark.operators.sampling import (
    hash_split,
    md5_threshold,
    mix_corpora,
    mix_corpora_tokens,
)
from kinesiscat_spark.queries.dedup_queries import _SHINGLES_CTE, JACCARD_T
from kinesiscat_spark.registry import query

_EN_W, _REST_W = 0.5, 0.25
_MIX_SALT = 7
_TOK_EN, _TOK_REST = 3000, 1500
_TOK_SALT = 13
_SPLIT_W = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SALT = 11

# token-budget prefix per source: naive global-cumsum replay of the
# hierarchical Spark plan (same md5 order keys → same selected set)
def _tok_cte(name: str, pred: str, salt: int, budget: int) -> str:
    return f"""
{name} AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY hk, doc_id
             ROWS UNBOUNDED PRECEDING) AS c
    FROM (
      SELECT doc_id,
             substr(md5(doc_id || chr(31) || '{salt}'), 1, 12) AS hk,
             len(list_filter(string_split_regex(trim(coalesce(text, '')),
                 '\\s+'), x -> len(x) > 0))::BIGINT AS n_tokens
      FROM documents WHERE {pred}
    )
  ) WHERE c - n_tokens < {budget}
)"""


_TEMP_TOTAL = 4000
_TEMP_SALT = 19

# temperature-mixture twin (round 6): per-source token counts are exact
# integer aggregates, n^0.5 is pow() on both engines (same libm), and the
# budget expression evaluates in one fixed order — so the floored budgets
# (and therefore the exact per-source md5-prefix selections) reproduce
# bit-for-bit.  The per-source prefix replay is the same naive global
# cumsum the 'tok' kind already hash-checks, with the budget as a scalar
# subquery instead of a literal.
_TEMP_NTOK = (
    "(SELECT coalesce(sum(len(list_filter(string_split_regex(trim(coalesce("
    "text, '')), '\\s+'), x -> len(x) > 0))), 0) FROM documents WHERE {pred})"
)


def _temp_ctes() -> str:
    return f"""
temp_counts AS (
  SELECT {_TEMP_NTOK.format(pred="lang = 'en'")} AS n_en,
         {_TEMP_NTOK.format(pred="lang <> 'en'")} AS n_rest
),
temp_b_en AS (
  SELECT CAST(floor({_TEMP_TOTAL} * pow(n_en, 0.5) /
              (pow(n_en, 0.5) + pow(n_rest, 0.5))) AS BIGINT) AS b
  FROM temp_counts
),
temp_b_rest AS (
  SELECT CAST(floor({_TEMP_TOTAL} * pow(n_rest, 0.5) /
              (pow(n_en, 0.5) + pow(n_rest, 0.5))) AS BIGINT) AS b
  FROM temp_counts
),
temp_en AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY hk, doc_id
             ROWS UNBOUNDED PRECEDING) AS c
    FROM (
      SELECT doc_id,
             substr(md5(doc_id || chr(31) || '{_TEMP_SALT}'), 1, 12) AS hk,
             len(list_filter(string_split_regex(trim(coalesce(text, '')),
                 '\\s+'), x -> len(x) > 0))::BIGINT AS n_tokens
      FROM documents WHERE lang = 'en'
    )
  ) WHERE c - n_tokens < (SELECT b FROM temp_b_en)
),
temp_rest AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY hk, doc_id
             ROWS UNBOUNDED PRECEDING) AS c
    FROM (
      SELECT doc_id,
             substr(md5(doc_id || chr(31) || '{_TEMP_SALT + 1}'), 1, 12) AS hk,
             len(list_filter(string_split_regex(trim(coalesce(text, '')),
                 '\\s+'), x -> len(x) > 0))::BIGINT AS n_tokens
      FROM documents WHERE lang <> 'en'
    )
  ) WHERE c - n_tokens < (SELECT b FROM temp_b_rest)
)"""


_DSIR_KEEP = 64
_DSIR_SALTS = (17, 18)
_STRAT_SALT = 23
_STRAT_N = 8
_RESV_K = 64
_RESV_SALT = 31

# A-ES weighted-reservoir twin (round-7 continuation): the same 48-bit
# dyadic-rational u as DSIR's Gumbel, key = ln(u)/n_tokens rounded to
# 9 dp, exact top-k with id tie-break — token-count-proportional
# without-replacement sampling, engine-replayable end to end.
_RESV_NTOK = (
    "len(list_filter(string_split_regex(trim(coalesce(text, '')), "
    "'\\s+'), x -> len(x) > 0))::BIGINT"
)


def _resv_cte() -> str:
    u = _DSIR_U.replace("d.doc_id", "doc_id").format(salt=_RESV_SALT)
    return f"""
resv AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           round(ln({u}) / n_tokens, 9) AS key
    FROM (SELECT doc_id, {_RESV_NTOK} AS n_tokens FROM documents)
    WHERE n_tokens > 0
  ) QUALIFY ROW_NUMBER() OVER (ORDER BY key DESC, doc_id ASC) <= {_RESV_K}
)"""

# DSIR twin (round 6, VERDICT r5 task 4): two add-0.5 unigram models
# (target = English docs, raw = all docs), per-doc log importance weight
# as VALUE-ordered folds (list_sum(list(lp ORDER BY lp)) <-> Spark
# sort_array+aggregate — the hash-proven pairing), deterministic Gumbel
# noise from the md5 prefix (u is an exact 48-bit dyadic rational), exact
# top-64 by round(log_w + gumbel, 9) with id tie-break — the full
# operators/sampling.py dsir_resample(method='md5') replay.
_DSIR_U = (
    "greatest(least(CAST(concat('0x', substr(md5(d.doc_id || chr(31) || "
    "'{salt}'), 1, 12)) AS BIGINT) / 281474976710656.0, 1.0 - 1e-15), 1e-15)"
)


def _dsir_ctes() -> str:
    oov = "(SELECT ln(0.5 / (n + 0.5 * v)) FROM dm_{m}_tot)"
    base = f"""
dm_t_counts AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
    FROM documents WHERE lang = 'en') GROUP BY w
),
dm_t_tot AS (SELECT sum(c)::DOUBLE AS n, count(*)::DOUBLE AS v FROM dm_t_counts),
dm_t AS (SELECT w, ln((c + 0.5) / (n + 0.5 * v)) AS lp FROM dm_t_counts, dm_t_tot),
dm_r_counts AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
    FROM documents) GROUP BY w
),
dm_r_tot AS (SELECT sum(c)::DOUBLE AS n, count(*)::DOUBLE AS v FROM dm_r_counts),
dm_r AS (SELECT w, ln((c + 0.5) / (n + 0.5 * v)) AS lp FROM dm_r_counts, dm_r_tot),
dsir_tok AS (
  SELECT doc_id AS id,
         unnest(string_split_regex(lower(text), '\\s+')) AS w
  FROM documents
),
dsir_sums AS (
  SELECT id, count(*) AS n_tokens,
         list_sum(list(lt ORDER BY lt)) AS st,
         list_sum(list(lr ORDER BY lr)) AS sr
  FROM (
    SELECT t.id,
           coalesce(dm_t.lp, {oov.format(m='t')}) AS lt,
           coalesce(dm_r.lp, {oov.format(m='r')}) AS lr
    FROM dsir_tok t LEFT JOIN dm_t USING (w) LEFT JOIN dm_r USING (w)
  ) GROUP BY id
)"""
    per_salt = []
    for i, salt in enumerate(_DSIR_SALTS):
        per_salt.append(f"""
dsir_sel_{i} AS (
  SELECT id, n_tokens FROM (
    SELECT d.doc_id AS id, coalesce(s.n_tokens, 0)::BIGINT AS n_tokens,
           round(coalesce(s.st - s.sr, 0.0) +
                 (-ln(-ln({_DSIR_U.format(salt=salt)}))), 9) AS key
    FROM documents d LEFT JOIN dsir_sums s ON s.id = d.doc_id
  ) QUALIFY ROW_NUMBER() OVER (ORDER BY key DESC, id ASC) <= {_DSIR_KEEP}
)""")
    return base + "," + ",".join(per_salt)


def _dsir_selects() -> str:
    return "\nUNION ALL\n".join(
        f"""SELECT 'dsir' AS kind, id AS doc_id, CAST(NULL AS VARCHAR) AS lang,
       {i} AS source_id, n_tokens, CAST(NULL AS VARCHAR) AS split
FROM dsir_sel_{i}"""
        for i in range(len(_DSIR_SALTS))
    )


_UNIMAX_TOTAL = 24000
_UNIMAX_EPOCHS = 1.0
_UNIMAX_SALT = 29


# UniMax twin (round-7 continuation): the 2-source water-fill unrolled —
# smallest source first ((count, index) order, so en wins ties), each step
# one double multiply/divide in the same fixed order as the driver-side
# loop, budgets floored to BIGINT, then the same naive global-cumsum
# prefix replay the 'tok'/'temp' kinds already hash-check.
def _unimax_ctes() -> str:
    e, b = _UNIMAX_EPOCHS, _UNIMAX_TOTAL
    cap_en = f"least({e!r} * n_en, {b} / 2.0)"
    cap_rest = f"least({e!r} * n_rest, {b} / 2.0)"
    return f"""
um_counts AS (
  SELECT {_TEMP_NTOK.format(pred="lang = 'en'")} AS n_en,
         {_TEMP_NTOK.format(pred="lang <> 'en'")} AS n_rest
),
um_b AS (
  SELECT CASE WHEN n_en <= n_rest
              THEN CAST(floor({cap_en}) AS BIGINT)
              ELSE CAST(floor(least({e!r} * n_en, {b} - {cap_rest}))
                   AS BIGINT) END AS b_en,
         CASE WHEN n_en <= n_rest
              THEN CAST(floor(least({e!r} * n_rest, {b} - {cap_en}))
                   AS BIGINT)
              ELSE CAST(floor({cap_rest}) AS BIGINT) END AS b_rest
  FROM um_counts
),
um_en AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY hk, doc_id
             ROWS UNBOUNDED PRECEDING) AS c
    FROM (
      SELECT doc_id,
             substr(md5(doc_id || chr(31) || '{_UNIMAX_SALT}'), 1, 12) AS hk,
             len(list_filter(string_split_regex(trim(coalesce(text, '')),
                 '\\s+'), x -> len(x) > 0))::BIGINT AS n_tokens
      FROM documents WHERE lang = 'en'
    )
  ) WHERE c - n_tokens < (SELECT b_en FROM um_b)
),
um_rest AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           SUM(n_tokens) OVER (ORDER BY hk, doc_id
             ROWS UNBOUNDED PRECEDING) AS c
    FROM (
      SELECT doc_id,
             substr(md5(doc_id || chr(31) || '{_UNIMAX_SALT + 1}'), 1, 12)
               AS hk,
             len(list_filter(string_split_regex(trim(coalesce(text, '')),
                 '\\s+'), x -> len(x) > 0))::BIGINT AS n_tokens
      FROM documents WHERE lang <> 'en'
    )
  ) WHERE c - n_tokens < (SELECT b_rest FROM um_b)
)"""


# Prototype-based cluster pruning (round-7 continuation): fixed
# prototypes inlined as literals (queries/prototypes.py), squared-L2
# assignment with the repo's IEEE-identical left-fold pairing, keep-hard
# rank per cell. The distance rides the n_tokens column as an exact
# nano-quantized integer so the hash pins the arithmetic, not just
# membership.
def _cluster_prune_ctes() -> str:
    from kinesiscat_spark.queries.prototypes import (
        PROTO_KEEP,
        prototypes_values_sql,
    )

    d2 = (
        "round(list_sum(list_transform(list_zip(e.embedding, pr.p), "
        "z -> (CAST(z[1] AS DOUBLE) - z[2]) * "
        "(CAST(z[1] AS DOUBLE) - z[2]))), 9)"
    )
    return f"""
pp_assign AS (
  SELECT vec_id, cell, d2 FROM (
    SELECT e.vec_id, pr.cell, {d2} AS d2,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {d2} ASC, pr.cell ASC) AS rn
    FROM embeddings e CROSS JOIN {prototypes_values_sql()}
    WHERE e.embedding IS NOT NULL AND len(e.embedding) = 64
  ) WHERE rn = 1
),
pp_keep AS (
  SELECT vec_id, cell, d2 FROM pp_assign
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cell
                             ORDER BY d2 DESC, vec_id ASC) <= {PROTO_KEEP}
)"""


# DoReMi twin (round 8): one exponentiated-gradient step of domain
# reweighting (Xie et al. 2023) under the add-0.5 unigram proxy loss —
# the model IS the DSIR CTEs' raw model (dm_r), so the twin adds only
# the per-doc / per-domain / global value-ordered folds and the
# share·exp(η·excess) arithmetic in the operator's written order.
def _doremi_ctes() -> str:
    return r"""
dw_tok AS (
  SELECT source AS grp, doc_id AS id,
         unnest(string_split_regex(lower(text), '\s+')) AS w
  FROM documents
),
dw_doc AS (
  SELECT grp, id, list_sum(list(lp ORDER BY lp)) AS s, count(*) AS nt
  FROM dw_tok JOIN dm_r USING (w) GROUP BY grp, id
),
dw_dom AS (
  SELECT grp, list_sum(list(s ORDER BY s)) AS slp, sum(nt)::BIGINT AS nt
  FROM dw_doc GROUP BY grp
),
dw_g AS (
  SELECT list_sum(list(slp ORDER BY slp)) AS gs, sum(nt)::BIGINT AS gn
  FROM dw_dom
),
dw_pre AS (
  SELECT grp, nt,
         (CAST(nt AS DOUBLE) / gn)
           * exp(1.0 * ((-(slp / nt)) - (-(gs / gn)))) AS raw
  FROM dw_dom, dw_g
),
dw_z AS (SELECT list_sum(list(raw ORDER BY raw)) AS z FROM dw_pre),
dw AS (SELECT grp, round(raw / z, 9) AS weight FROM dw_pre, dw_z)"""


_SAMPLING_ORACLE = f"""
WITH {_tok_cte("tb_en", "lang = 'en'", _TOK_SALT, _TOK_EN)},
{_tok_cte("tb_rest", "lang <> 'en'", _TOK_SALT + 1, _TOK_REST)},
{_temp_ctes()},
{_dsir_ctes()},
{_unimax_ctes().lstrip()},
{_cluster_prune_ctes().lstrip()},
{_doremi_ctes().lstrip()},
{_resv_cte().lstrip()}
SELECT 'frac' AS kind, doc_id, lang, 0 AS source_id,
       CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS VARCHAR) AS split
FROM documents
WHERE lang = 'en'
  AND substr(md5(doc_id || chr(31) || '{_MIX_SALT}'), 1, 12)
        < '{md5_threshold(_EN_W)}'
UNION ALL
SELECT 'frac', doc_id, lang, 1, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
FROM documents
WHERE lang <> 'en'
  AND substr(md5(doc_id || chr(31) || '{_MIX_SALT + 1}'), 1, 12)
        < '{md5_threshold(_REST_W)}'
UNION ALL
SELECT 'tok', doc_id, CAST(NULL AS VARCHAR), 0, n_tokens,
       CAST(NULL AS VARCHAR)
FROM tb_en
UNION ALL
SELECT 'tok', doc_id, CAST(NULL AS VARCHAR), 1, n_tokens,
       CAST(NULL AS VARCHAR)
FROM tb_rest
UNION ALL
SELECT 'split', doc_id, lang, CAST(NULL AS INTEGER),
       CAST(NULL AS BIGINT),
       CASE WHEN substr(md5(doc_id || chr(31) || '{_SPLIT_SALT}'), 1, 12)
                 < '{md5_threshold(0.8)}' THEN 'train'
            WHEN substr(md5(doc_id || chr(31) || '{_SPLIT_SALT}'), 1, 12)
                 < '{md5_threshold(0.9)}' THEN 'val'
            ELSE 'test' END
FROM documents
UNION ALL
SELECT 'temp', doc_id, CAST(NULL AS VARCHAR), 0, n_tokens,
       CAST(NULL AS VARCHAR)
FROM temp_en
UNION ALL
SELECT 'temp', doc_id, CAST(NULL AS VARCHAR), 1, n_tokens,
       CAST(NULL AS VARCHAR)
FROM temp_rest
UNION ALL
SELECT 'strat', doc_id, lang, CAST(NULL AS INTEGER),
       CAST(NULL AS BIGINT), source
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY substr(md5(doc_id || chr(31) || '{_STRAT_SALT}'), 1, 12),
                    doc_id) AS rk
  FROM documents
) WHERE rk <= {_STRAT_N}
UNION ALL
{_dsir_selects()}
UNION ALL
SELECT 'unimax' AS kind, doc_id, CAST(NULL AS VARCHAR) AS lang,
       0 AS source_id, n_tokens, CAST(NULL AS VARCHAR) AS split
FROM um_en
UNION ALL
SELECT 'unimax' AS kind, doc_id, CAST(NULL AS VARCHAR) AS lang,
       1 AS source_id, n_tokens, CAST(NULL AS VARCHAR) AS split
FROM um_rest
UNION ALL
SELECT 'reservoir' AS kind, CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS INTEGER) AS source_id,
       n_tokens, CAST(NULL AS VARCHAR) AS split
FROM resv
UNION ALL
SELECT 'reservoir_stream' AS kind, CAST(doc_id AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS INTEGER) AS source_id,
       n_tokens, CAST(NULL AS VARCHAR) AS split
FROM resv
UNION ALL
SELECT 'cluster' AS kind, CAST(vec_id AS VARCHAR) AS doc_id,
       CAST(NULL AS VARCHAR) AS lang, cell AS source_id,
       CAST(round(d2 * 1e9) AS BIGINT) AS n_tokens,
       CAST(NULL AS VARCHAR) AS split
FROM pp_keep
UNION ALL
SELECT 'doremi' AS kind, CAST(NULL AS BIGINT) AS doc_id,
       CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS INTEGER) AS source_id,
       CAST(round(weight * 1e9) AS BIGINT) AS n_tokens,
       grp AS split
FROM dw
"""


def _token_weighted_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, whitespace-token count) — the shared weight frame of the
    batch reservoir kind (sampling_mix) and the streaming reservoir lane;
    one definition so the two lanes' inputs cannot drift."""
    from pyspark.sql import functions as F

    return docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).cast("long").alias("n_tokens"),
    )


@query("sampling_mix", oracle=_SAMPLING_ORACLE)
def sampling_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sampling surface (operators/sampling.py), three kinds
    in one lane (round-5 fold), all selected by CONTENT HASH so the same
    rows are chosen on any cluster, any partitioning, any rerun — never
    ``rand()``, whose per-partition seeding reshuffles the sample whenever
    the file layout changes. The md5 method makes every selection
    engine-portable, which is exactly what the oracle verifies row-by-row:

    - ``kind='frac'``: weighted corpus mixture — 50% of English documents,
      25% of the rest (``mix_corpora``; pure scan-stage filters).
    - ``kind='tok'``: TOKEN-budget mixture — the prefix of the md5-shuffled
      order reaching 3000 (en) / 1500 (rest) whitespace tokens, crossing
      document kept (``mix_corpora_tokens``; hierarchical bucket plan, the
      oracle replays the naive global cumsum and must agree exactly).
    - ``kind='split'``: deterministic 80/10/10 train/val/test assignment
      (``hash_split``; one scan-stage CASE over the hash interval —
      exclusive, exhaustive, leak-free across reruns).
    - ``kind='temp'`` (round 6): TEMPERATURE-weighted mixture
      (``mix_corpora_temperature``; XLM/mT5 α-sampling, α=0.5) — each
      source's token budget is total·n_i^α/Σn_j^α computed from the
      corpus's own token counts, then the deterministic token-budget
      prefix; the oracle recomputes counts, budgets (same pow/floor
      order), and the exact selected set.
    - ``kind='strat'`` (round 7): EXACT per-stratum quotas
      (``exact_stratified_sample(method='md5')``) — exactly ``_STRAT_N``
      documents per ``source`` stratum, ranked by the salted md5 of the
      id inside each stratum (ties → id). One shuffle on the stratum;
      the window's group-limit caps what each map task forwards at n
      rows per stratum. The stratum rides the ``split`` column.
    - ``kind='unimax'`` (round 7): UniMax mixture (Chung et al. 2023) —
      water-filling budgets with a per-source EPOCH cap: smallest source
      first, each gets ``min(max_epochs·n_i, remaining/left)`` tokens, so
      small sources are never oversampled and the leftover pools to the
      large ones. The oracle unrolls the 2-source water-fill and replays
      the exact budgets and prefixes.
    - ``kind='cluster'`` (round 7): PROTOTYPE-based pruning (Sorscher et
      al. 2022 "Beyond neural scaling laws" keep-hard selection) —
      nearest fixed prototype by squared L2 (literals in both engines,
      queries/prototypes.py), each cell keeps its ``PROTO_KEEP`` hardest
      members (largest distance, ties → id). Cell rides ``source_id``;
      the exact nano-quantized distance rides ``n_tokens`` so the hash
      pins the fold arithmetic itself.
    - ``kind='dsir'`` (round 6): DSIR importance resampling
      (``dsir_resample(method='md5')``, Xie et al. 2023) — top-64 raw
      documents by log importance weight (target = English docs) plus
      deterministic md5-derived Gumbel noise, at TWO salts
      (``source_id`` 0/1); the oracle replays models, value-ordered
      folds, noise, and the exact top-k row-for-row.
    """
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    null_lang = F.lit(None).cast("string")
    null_src = F.lit(None).cast("int")
    null_tok = F.lit(None).cast("long")
    null_split = F.lit(None).cast("string")
    frac = mix_corpora(
        [(en, _EN_W), (rest, _REST_W)],
        key_cols=["doc_id"],
        salt=_MIX_SALT,
        method="md5",
    ).select(
        F.lit("frac").alias("kind"), "doc_id", "lang", "source_id",
        null_tok.alias("n_tokens"), null_split.alias("split"),
    )
    tok = mix_corpora_tokens(
        [(en, _TOK_EN), (rest, _TOK_REST)], salt=_TOK_SALT
    ).select(
        F.lit("tok").alias("kind"), F.col("id").alias("doc_id"),
        null_lang.alias("lang"), "source_id", "n_tokens",
        null_split.alias("split"),
    )
    spl = hash_split(docs, _SPLIT_W, ["doc_id"], salt=_SPLIT_SALT).select(
        F.lit("split").alias("kind"), "doc_id", "lang",
        null_src.alias("source_id"), null_tok.alias("n_tokens"), "split",
    )
    out = frac.unionByName(tok).unionByName(spl)
    from kinesiscat_spark.operators.sampling import (
        dsir_resample,
        mix_corpora_temperature,
    )

    temp = mix_corpora_temperature(
        [en, rest], _TEMP_TOTAL, alpha=0.5, salt=_TEMP_SALT
    ).select(
        F.lit("temp").alias("kind"),
        F.col("id").alias("doc_id"),
        null_lang.alias("lang"),
        F.col("source_id").cast("int").alias("source_id"),
        "n_tokens",
        null_split.alias("split"),
    )
    out = out.unionByName(temp)

    from kinesiscat_spark.operators.sampling import exact_stratified_sample

    strat = exact_stratified_sample(
        docs, "source", _STRAT_N, ["doc_id"], salt=_STRAT_SALT, method="md5"
    ).select(
        F.lit("strat").alias("kind"),
        "doc_id",
        "lang",
        null_src.alias("source_id"),
        null_tok.alias("n_tokens"),
        F.col("source").alias("split"),
    )
    out = out.unionByName(strat)

    for i, s in enumerate(_DSIR_SALTS):
        kept = dsir_resample(docs, en, _DSIR_KEEP, salt=s, method="md5")
        out = out.unionByName(
            kept.select(
                F.lit("dsir").alias("kind"),
                F.col("id").alias("doc_id"),
                null_lang.alias("lang"),
                F.lit(i).cast("int").alias("source_id"),
                "n_tokens",
                null_split.alias("split"),
            )
        )

    # kind='unimax' (round-7 continuation): UniMax water-filling mixture
    # (Chung et al. 2023) — per-source epoch cap, leftover pools to the
    # large sources; at lane constants the small source gets its FULL
    # epoch and the large one is budget-limited.
    from kinesiscat_spark.operators.sampling import mix_corpora_unimax

    unimax = mix_corpora_unimax(
        [en, rest], _UNIMAX_TOTAL, max_epochs=_UNIMAX_EPOCHS,
        salt=_UNIMAX_SALT,
    ).select(
        F.lit("unimax").alias("kind"),
        F.col("id").alias("doc_id"),
        null_lang.alias("lang"),
        F.col("source_id").cast("int").alias("source_id"),
        "n_tokens",
        null_split.alias("split"),
    )
    out = out.unionByName(unimax)

    # kind='cluster' (round-7 continuation): prototype-based pruning
    # (Sorscher et al. 2022 keep-hard) — fixed literal prototypes, cell
    # rides source_id, the exact nano-quantized distance rides n_tokens.
    from kinesiscat_spark.operators.sampling import prototype_prune
    from kinesiscat_spark.queries.prototypes import PROTO_KEEP, PROTOTYPES

    emb = load_table(spark, sf_dir, "embeddings")
    clus = prototype_prune(emb, PROTOTYPES, PROTO_KEEP).select(
        F.lit("cluster").alias("kind"),
        F.col("id").cast("string").alias("doc_id"),
        null_lang.alias("lang"),
        F.col("cell").alias("source_id"),
        F.round(F.col("dist2") * 1e9).cast("long").alias("n_tokens"),
        null_split.alias("split"),
    )
    out = out.unionByName(clus)

    # kind='reservoir' (round-7 continuation): A-ES weighted reservoir
    # sampling (Efraimidis & Spirakis 2006) — top-64 by ln(u)/w with
    # w = whitespace-token count and the DSIR 48-bit dyadic u, the
    # token-proportional without-replacement sample; scan-stage key +
    # TakeOrderedAndProject, replayed row-for-row in the twin.
    from kinesiscat_spark.operators.sampling import weighted_reservoir_sample

    wdocs = _token_weighted_docs(docs)
    resv = weighted_reservoir_sample(
        wdocs, _RESV_K, "n_tokens", salt=_RESV_SALT, method="md5"
    ).select(
        F.lit("reservoir").alias("kind"),
        F.col("id").alias("doc_id"),
        null_lang.alias("lang"),
        null_src.alias("source_id"),
        F.col("weight").alias("n_tokens"),
        null_split.alias("split"),
    )
    out = out.unionByName(resv)

    # kind='doremi' (round 8): one exponentiated-gradient step of DoReMi
    # domain reweighting (operators/sampling.py doremi_domain_weights;
    # Xie et al. 2023) — per-source mixture weights share·exp(η·excess
    # unigram loss), each weight hash-pinned as a nano-quantized integer
    # riding n_tokens (the 'cluster' fold's trick), doc_id = the source.
    from kinesiscat_spark.operators.sampling import doremi_domain_weights

    # the source NAME rides `split` (the lane's string column — the
    # 'strat' fold's precedent); Spark's ANSI union resolves a
    # string/bigint doc_id to BIGINT, which would reject 'src7'
    dw = doremi_domain_weights(docs).select(
        F.lit("doremi").alias("kind"),
        F.lit(None).cast("long").alias("doc_id"),
        null_lang.alias("lang"),
        null_src.alias("source_id"),
        F.round(F.col("weight") * 1e9).cast("long").alias("n_tokens"),
        F.col("group").alias("split"),
    )
    out = out.unionByName(dw)

    # kind='reservoir_stream' (round-7 continuation, restored in-lane for
    # round 9's optimization phase — the driver verdicts exactly the r8
    # 50-lane registry, so the briefly-split standalone lane is refolded):
    # the SAME selection drained through the STREAMING reservoir
    # (streaming/stateful.py streaming_reservoir) across 3 single-file
    # micro-batches. Shard admission thresholds are monotone, so the
    # top-k over the admitted stream equals the batch reservoir exactly
    # — the oracle rows are identical to kind='reservoir', making the
    # hash check a batch≡stream equality proof under the driver gate.
    # The slice fixture is cached under a key that is a CONTENT digest of
    # the exact (doc_id, n_tokens) rows it will hold, plus every operator
    # parameter baked into the slices (ADVICE r7 #2).
    import os

    from kinesiscat_spark.io_tables import cached_fixture_dir
    from kinesiscat_spark.streaming.source import run_to_memory
    from kinesiscat_spark.streaming.stateful import streaming_reservoir

    # one aggregate yields the content digest, the row count the drain
    # contract pins, AND the per-residue slice counts (a corpus missing
    # a doc_id mod-3 class writes an empty slice — the min-batch
    # expectation must count only NON-EMPTY slices or degenerate-but-
    # valid inputs would spuriously raise)
    [dig] = wdocs.agg(
        F.expr("bit_xor(xxhash64(doc_id, n_tokens))").alias("digest"),
        F.count("*").alias("n_rows"),
        *[
            F.sum((F.col("doc_id") % 3 == i).cast("long")).alias(f"n{i}")
            for i in range(3)
        ],
    ).collect()
    n_nonempty = sum(
        1 for i in range(3) if (getattr(dig, f"n{i}") or 0) > 0
    )
    key = (
        f"v3|{dig.digest}|{dig.n_rows}|k={_RESV_K}|salt={_RESV_SALT}|shards=4"
    )

    def _build(stage: str) -> None:
        for i in range(3):
            sub = os.path.join(stage, f"slice_{i:03d}")
            wdocs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(
                sub
            )
            for root, _, files in os.walk(sub):
                for fname in files:
                    os.utime(
                        os.path.join(root, fname),
                        (1_700_000_000 + i, 1_700_000_000 + i),
                    )

    src = cached_fixture_dir(key, "kc_resv_stream_", _build)
    # Drain contract: every slice row must be consumed, across at least
    # one micro-batch per NON-EMPTY slice, or run_to_memory raises
    # IncompleteDrainError — a truncated drain surfaces as `err`, never
    # as a silently different top-64 (VERDICT r7 task 1a). The drain
    # runs on every invocation (round 10 — the round-9 drain memo was
    # removed; only the input-slice fixture above is staged per process).
    emitted = run_to_memory(
        streaming_reservoir(
            spark.readStream.schema("doc_id long, n_tokens long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/slice_*"),
            _RESV_K,
            "n_tokens",
            salt=_RESV_SALT,
            n_shards=4,
        ),
        output_mode="append",
        expect_input_rows=int(dig.n_rows),
        expect_min_batches=n_nonempty,
    )
    streamed = (
        emitted.orderBy(F.desc("key"), F.asc("id"))
        .limit(_RESV_K)
        .select(F.col("id").alias("doc_id"), F.col("weight").alias("n_tokens"))
    )

    # in-lane batch≡stream SELF-CHECK (VERDICT r8 task 1b): both sides
    # are <= _RESV_K rows by construction, so the collects are bounded;
    # a divergence raises HERE with the differing doc_ids, turning what
    # was a silent driver hash mismatch into a named error.
    stream_ids = {(r.doc_id, r.n_tokens) for r in streamed.collect()}
    batch_ids = {
        (r.id, r.weight)
        for r in weighted_reservoir_sample(
            wdocs, _RESV_K, "n_tokens", salt=_RESV_SALT, method="md5"
        ).collect()
    }
    if stream_ids != batch_ids:
        only_stream = sorted(stream_ids - batch_ids)
        only_batch = sorted(batch_ids - stream_ids)
        raise AssertionError(
            "streaming reservoir diverged from batch reservoir: "
            f"only_in_stream={only_stream} only_in_batch={only_batch} "
            f"(k={_RESV_K}, salt={_RESV_SALT}, corpus_key={key})"
        )

    resv_stream = streamed.select(
        F.lit("reservoir_stream").alias("kind"),
        "doc_id",
        null_lang.alias("lang"),
        null_src.alias("source_id"),
        "n_tokens",
        null_split.alias("split"),
    )
    out = out.unionByName(resv_stream)

    # Per-kind (count, xor) digests ride the driver's own collect job
    # into DEBUG_sampling_mix.jsonl, so any future driver-side hash red
    # names its divergent kind instead of adjudicating as an
    # unreproducible flake (VERDICT r8 task 1a).
    from kinesiscat_spark.debug_digests import observe_kind_digests

    return observe_kind_digests(
        out,
        "sampling_mix",
        [
            "frac",
            "tok",
            "split",
            "temp",
            "strat",
            "dsir",
            "unimax",
            "cluster",
            "reservoir",
            "reservoir_stream",
            "doremi",
        ],
    )


_KEEP_CANONICAL_ORACLE = f"""
WITH RECURSIVE {_SHINGLES_CTE},
dsh AS (SELECT doc_id, list_distinct(s) AS s FROM sh),
inv AS (SELECT doc_id, unnest(s) AS shingle FROM dsh),
sizes AS (SELECT doc_id, len(s) AS n FROM dsh),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common / (sa.n + sb.n - n_common) >= {JACCARD_T}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
-- transitive closure (tiny near-dup graph at oracle SF), then min-reach
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
labels AS (
  SELECT u AS id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
),
losers AS (SELECT id FROM labels WHERE id <> cluster_id)
SELECT d.doc_id
FROM documents d
WHERE d.doc_id NOT IN (SELECT id FROM losers)
"""


def dedup_keep_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup resolution (operators/clusters.py): Jaccard
    pairs → hash-to-min connected components → keep the lowest-id document
    per duplicate cluster (plus all unpaired documents).

    Scale shape: each CC round exchanges (id, label) pairs only, with
    localCheckpoint truncating lineage between rounds; banded near-dup
    clusters are near-cliques, so the loop converges in 2-4 rounds. The
    oracle recomputes the same clusters with a recursive-CTE transitive
    closure — exact agreement on the surviving doc_id set.

    Driver lane: upgraded to the full ``curation_pipeline`` lane (round
    5) — cluster resolution is hash-checked there inside the composed
    pipeline (minhash pairs → recursive-CTE closure → canonical filter),
    and this Jaccard-pairs variant stays differential-tested in
    tests/test_clusters.py against ``_KEEP_CANONICAL_ORACLE``.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=JACCARD_T, n=3)
    return keep_canonical(docs, pairs).select("doc_id")



# DuckDB twin of curation.words / word_ngrams (also imported by
# tests/test_curation.py so the lane oracle and the pytest differential
# can never drift).
_WORDS = "list_filter(string_split_regex(trim({t}), '\\s+'), x -> len(x) > 0)"


def _ngrams_sql(t: str, n: int) -> str:
    ws = _WORDS.format(t=t)
    return (
        f"CASE WHEN len({ws}) >= {n} THEN "
        f"list_transform(generate_series(1, len({ws}) - {n} + 1), "
        f"i -> array_to_string(({ws})[i:i+{n}-1], ' ')) "
        f"ELSE [] END"
    )


# lane blocklist: two words present in the synthetic corpus so the
# signal is non-degenerate (real pipelines pass the published C4 list)
_BLOCKLIST = ("slow", "stale")
_BLOCKLIST_SQL = "[" + ", ".join(f"'{w}'" for w in _BLOCKLIST) + "]"



def _c4_fixture_col():
    """The deterministic punctuation-bearing fixture document (round 6):
    sentence lines from the doc's own words + id-salted terminal marks,
    short lines, a javascript line, '{' and 'lorem ipsum' page poisons —
    the SAME derivation as the oracle's ``_c4_fixture_cte``. Shared by
    curation_signals (C4/Gopher line signals) and curation_span_dup's
    round-7 line-dedup fold (the raw corpus has no newlines, so every
    line-level operator runs over this fixture)."""
    from pyspark.sql import functions as F

    w = F.filter(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    aj = lambda a, b: F.array_join(F.slice(w, a, b), " ")  # noqa: E731
    did = F.col("doc_id")
    l1 = F.concat(
        aj(1, 6),
        F.lit("."),
        F.when(did % 17 == 0, F.lit(" {")).otherwise(F.lit("")),
    )
    l2 = F.concat(aj(7, 2), F.lit("!"))
    l3 = F.concat(
        aj(9, 6), F.when(did % 3 == 0, F.lit("?")).otherwise(F.lit(""))
    )
    l4 = F.when(
        did % 13 == 0,
        F.lit("this line mentions javascript and has many words."),
    ).otherwise(aj(3, 6))
    l5 = F.when(
        did % 19 == 0, F.lit("lorem ipsum dolor sit amet here.")
    ).otherwise(F.concat(aj(1, 5), F.lit(".")))
    return F.concat_ws("\n", l1, l2, l3, l4, l5)


def _c4_fixture_cte() -> str:
    """DuckDB twin of ``_c4_fixture_col`` — 'c4src'/'c4fix' CTE bodies."""
    return """
c4src AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                     x -> len(x) > 0) AS w
  FROM documents
),
c4fix AS (
  SELECT doc_id,
    array_to_string(w[1:6], ' ') || '.' ||
      (CASE WHEN doc_id % 17 = 0 THEN ' {' ELSE '' END)
    || chr(10) || array_to_string(w[7:8], ' ') || '!'
    || chr(10) || array_to_string(w[9:14], ' ') ||
      (CASE WHEN doc_id % 3 = 0 THEN '?' ELSE '' END)
    || chr(10) || (CASE WHEN doc_id % 13 = 0
        THEN 'this line mentions javascript and has many words.'
        ELSE array_to_string(w[3:8], ' ') END)
    || chr(10) || (CASE WHEN doc_id % 19 = 0
        THEN 'lorem ipsum dolor sit amet here.'
        ELSE array_to_string(w[1:5], ' ') || '.' END)
    AS t
  FROM c4src
)"""


def _signals_oracle() -> str:
    from kinesiscat_spark.operators.curation import (
        C4_BAD_LINE_WORD,
        C4_MIN_SENTENCES,
        C4_MIN_WORDS_PER_LINE,
        C4_TERMINAL_RE,
        EMAIL_RE,
        IPV4_RE,
        PHONE_RE,
    )

    g2, g3 = _ngrams_sql("text", 2), _ngrams_sql("text", 3)
    # Gopher §A1.1 signal replay (round 6): word-level stats over the RAW
    # text, line/symbol stats over the punctuation fixture extended with
    # id-salted bullet/ellipsis/hash lines (the raw corpus has none).
    _SYM_RE = r"#|\.\.\.|…"
    _BUL = "('•', '‣', '-', '*')"
    _STOPS = "['the', 'a']"

    def _gopher_cte(name: str, src: str) -> str:
        return f"""
{name} AS (
  SELECT doc_id,
    len(w)::BIGINT AS {name}_n_words,
    CASE WHEN len(w) > 0
         THEN list_sum(list_transform(w, x -> len(x)))::DOUBLE / len(w)
    END AS {name}_mwl,
    CASE WHEN len(w) > 0
         THEN len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
              / len(w)
    END AS {name}_alpha,
    CASE WHEN len(w) > 0
         THEN len(regexp_extract_all(gt, '{_SYM_RE}'))::DOUBLE / len(w)
    END AS {name}_sym,
    CASE WHEN len(w) > 0
         THEN len(regexp_extract_all(gt, '#'))::DOUBLE / len(w)
    END AS {name}_hash,
    CASE WHEN len(w) > 0
         THEN len(regexp_extract_all(gt, '\\.\\.\\.|…'))::DOUBLE / len(w)
    END AS {name}_ellipw,
    CASE WHEN len(ls) > 0
         THEN len(list_filter(ls, l -> substr(ltrim(l), 1, 1) IN {_BUL}))::DOUBLE
              / len(ls)
    END AS {name}_bul,
    CASE WHEN len(ls) > 0
         THEN len(list_filter(ls,
              l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$')))::DOUBLE / len(ls)
    END AS {name}_ell,
    len(list_filter({_STOPS},
        s -> list_contains(list_transform(w, x -> lower(x)), s)))::BIGINT
      AS {name}_stops
  FROM (SELECT doc_id, gt, {_WORDS.format(t="gt")} AS w,
               string_split(gt, chr(10)) AS ls
        FROM ({src}))
)"""

    gw_cte = _gopher_cte("gw", "SELECT doc_id, text AS gt FROM documents")
    gx_cte = _gopher_cte(
        "gx",
        """SELECT doc_id,
  t || (CASE WHEN doc_id % 5 = 0 THEN chr(10) || '- bullet point item' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'to be continued...' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN chr(10) || '# hashtag # content # here' ELSE '' END)
  AS gt FROM c4fix""",
    )
    # Non-degenerate C4 fixture (round 6): same deterministic derivation
    # as the Spark side — sentence lines from the doc's own words with
    # id-salted terminal marks / poisons, then the full c4_signals replay.
    c4_fix = f"""
{_c4_fixture_cte()},
c4 AS (
  SELECT doc_id,
         len(lines)::BIGINT AS c4_n_lines,
         len(kept)::BIGINT AS c4_kept_lines,
         len(clean)::BIGINT AS c4_clean_chars,
         (NOT contains(t, '{{') AND NOT contains(lower(t), 'lorem ipsum')
          AND len(regexp_extract_all(clean, '[.!?]')) >= {C4_MIN_SENTENCES})
           AS c4_keep,
         clean AS c4_clean_text
  FROM (
    SELECT doc_id, t, lines, kept, array_to_string(kept, chr(10)) AS clean
    FROM (
      SELECT doc_id, t, lines,
             list_filter(lines, l ->
               regexp_matches(rtrim(l), '{C4_TERMINAL_RE}')
               AND len(list_filter(string_split_regex(trim(l), '\\s+'),
                       x -> len(x) > 0)) >= {C4_MIN_WORDS_PER_LINE}
               AND NOT contains(lower(l), '{C4_BAD_LINE_WORD}')) AS kept
      FROM (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM c4fix)
    )
  )
)"""
    # token-entropy replay (round-7 continuation): value-sorted term fold
    # (list_sum(list_sort(...)) ↔ Spark sort_array+aggregate), each term's
    # probability the same BIGINT/DOUBLE division both engines.
    tent_term = "(len(list_filter(w, x -> x = t)) / len(w)::DOUBLE)"
    tent_cte = f"""
tent AS (
  SELECT doc_id,
         CASE WHEN len(w) > 0 THEN
           ROUND(-list_sum(list_sort(list_transform(list_distinct(w),
             t -> {tent_term} * ln({tent_term})))), 6)
         END AS tok_entropy
  FROM (SELECT doc_id, {_WORDS.format(t="text")} AS w FROM documents)
)"""
    return f"""
WITH g AS (
  SELECT doc_id, text, {g2} AS grams2, {g3} AS grams3,
         string_split(text, chr(10)) AS lines
  FROM documents
),
{c4_fix},
{gw_cte},
{gx_cte},
{tent_cte.strip()}
SELECT doc_id,
  CASE WHEN len(list_distinct(grams2)) > 0 THEN round(
    (SELECT cnt * len(g) FROM (
       SELECT g, len(list_filter(grams2, x -> x = g)) AS cnt
       FROM unnest(list_distinct(grams2)) AS t(g))
     ORDER BY cnt DESC, g DESC LIMIT 1)
    / greatest(len(text), 1)::double, 6) ELSE 0.0 END AS top2,
  round(least(coalesce((
    SELECT sum(CASE WHEN cnt > 1 THEN cnt * len(g) ELSE 0 END) FROM (
       SELECT g, len(list_filter(grams3, x -> x = g)) AS cnt
       FROM unnest(list_distinct(grams3)) AS t(g))), 0)
    / greatest(len(text), 1)::double, 1.0), 6) AS dup3,
  CASE WHEN len(lines) > 0
       THEN 1.0 - len(list_distinct(lines)) / len(lines)::double
  END AS dup_line_frac,
  len(regexp_extract_all(text, '{EMAIL_RE}'))::bigint AS n_emails,
  len(regexp_extract_all(text, '{IPV4_RE}'))::bigint AS n_ipv4,
  len(regexp_extract_all(text, '{PHONE_RE}'))::bigint AS n_phones,
  len(list_filter({_WORDS.format(t="text")},
      x -> list_contains({_BLOCKLIST_SQL}, lower(x))))::bigint AS n_list_hits,
  CASE WHEN len({_WORDS.format(t="text")}) > 0 THEN
    len(list_filter({_WORDS.format(t="text")},
        x -> list_contains({_BLOCKLIST_SQL}, lower(x))))
    / len({_WORDS.format(t="text")})::double END AS list_word_frac,
  c4_n_lines, c4_kept_lines, c4_clean_chars, c4_keep, c4_clean_text,
  gw_n_words,
  ROUND(gw_mwl, 6) AS gw_mean_wl,
  ROUND(gw_alpha, 6) AS gw_alpha_frac,
  gw_stops AS gw_stop_hits,
  ((gw_n_words >= 50) AND (gw_n_words <= 100000)
   AND COALESCE(gw_mwl >= 3.0, FALSE) AND COALESCE(gw_mwl <= 10.0, FALSE)
   AND COALESCE(gw_hash <= 0.1, FALSE)
   AND COALESCE(gw_ellipw <= 0.1, FALSE)
   AND COALESCE(gw_bul <= 0.9, FALSE)
   AND COALESCE(gw_ell <= 0.3, FALSE)
   AND COALESCE(gw_alpha >= 0.8, FALSE)
   AND (gw_stops >= 2)) AS gw_keep,
  ROUND(gx_sym, 6) AS gx_symbol_ratio,
  ROUND(gx_hash, 6) AS gx_hash_ratio,
  ROUND(gx_ellipw, 6) AS gx_ellipsis_word_ratio,
  ROUND(gx_bul, 6) AS gx_bullet_frac,
  ROUND(gx_ell, 6) AS gx_ellipsis_frac,
  ((gx_n_words >= 10) AND (gx_n_words <= 100000)
   AND COALESCE(gx_mwl >= 3.0, FALSE) AND COALESCE(gx_mwl <= 10.0, FALSE)
   AND COALESCE(gx_hash <= 0.1, FALSE)
   AND COALESCE(gx_ellipw <= 0.1, FALSE)
   AND COALESCE(gx_bul <= 0.1, FALSE)
   AND COALESCE(gx_ell <= 0.1, FALSE)
   AND COALESCE(gx_alpha >= 0.5, FALSE)
   AND (gx_stops >= 0)) AS gx_keep,
  tok_entropy
FROM g JOIN c4 USING (doc_id)
JOIN gw USING (doc_id) JOIN gx USING (doc_id) JOIN tent USING (doc_id)
"""


@query("curation_signals", oracle=_signals_oracle())
def curation_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate signals a training-data pipeline computes per document
    (operators/curation.py): Gopher-style repetition statistics (top-2-gram
    char fraction, duplicated-3-gram char fraction, duplicate-line
    fraction; Rae et al. 2021 §A1.1) and PII detector counts (emails,
    IPv4, phone numbers — the redaction twin is differential-tested in
    tests/test_curation.py).

    All columns are pure built-in Column expressions over the document's
    own line/word arrays — scan-stage, whole-stage codegen, ZERO shuffle —
    so the operator scales linearly to 100 TB (per-row cost is a
    per-document constant, independent of corpus size).

    Round 6 (VERDICT r5 task 7): the C4 cleaning signals
    (``operators/curation.py c4_signals`` — line retention, page gate,
    rebuilt text) are hash-checked here over a NON-DEGENERATE fixture:
    the driver corpus has no terminal punctuation, so the lane derives a
    deterministic punctuation-bearing document per row (sentence lines
    built from the doc's own words + id-salted terminal marks, short
    lines, a javascript line, '{' and 'lorem ipsum' page poisons — the
    same derivation in both engines) and emits the full c4 struct as
    ``c4_*`` columns.  Every C4 rule flips on some subset of ids, so
    the columns are non-constant and the hash is load-bearing."""
    docs = load_table(spark, sf_dir, "documents")
    stage1, stage2 = _signals_select_cols()
    return docs.select(*stage1).select(*stage2)


_SIGNALS_COLS: "tuple | None" = None


def _signals_select_cols() -> tuple:
    """The curation_signals projection, built ONCE per process, in TWO
    stages.

    Every column is a pure function of the row's own ``doc_id``/``text``
    and module constants — no session, path or data dependence — so the
    Column expression trees are reusable verbatim across invocations.
    Building them cost ~6,300 py4j round trips (~2.3 s of driver time,
    measured with cProfile) against a lane whose EXECUTION is ~0.15 s;
    the memo removes that construction cost from every call after the
    first (round 9, guide §1.2 step 2 — per-query driver work counts).

    The two-stage shape exists for the ANALYZER, not the executor: the
    single-select form embedded each shared signal STRUCT tree (c4, gw,
    gx, pii, blocklist) once per extracted field, so eager analysis
    re-walked the same giant subtree ~5x per struct (~1.6 s JVM-side per
    select, measured). Stage 1 projects each struct exactly once; stage
    2 extracts fields from the now-atomic struct columns. Catalyst
    collapses the two Projects, so the physical plan — and every output
    value — is unchanged. Expression reuse is NOT result caching: the
    plan still scans and computes from the parquet input on every
    action."""
    global _SIGNALS_COLS
    if _SIGNALS_COLS is not None:
        return _SIGNALS_COLS
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.curation import (
        blocklist_signals,
        c4_signals,
        dup_ngram_char_frac,
        gopher_keep,
        gopher_signals,
        pii_signals,
        repetition_signals,
        token_entropy,
        top_ngram_char_frac,
    )

    did = F.col("doc_id")
    c4_text = _c4_fixture_col()
    c4 = c4_signals(c4_text)
    # Gopher §A1.1 (round 6): word-level signals over the RAW text (word
    # counts/lengths/stopwords are non-degenerate there), line/symbol
    # signals over the fixture extended with id-salted bullet / ellipsis /
    # hash lines (the raw corpus has none — same derivation both engines).
    # Stopwords are corpus-adapted ('the','a' — the published set's words
    # barely occur in the synthetic vocabulary); thresholds for gx_keep
    # are tightened to the fixture's scale so every rule flips on some id
    # subset. gw_keep uses the PUBLISHED Gopher defaults.
    gx_text = F.concat(
        c4_text,
        F.when(did % 5 == 0, F.lit("\n- bullet point item")).otherwise(F.lit("")),
        F.when(did % 7 == 0, F.lit("\nto be continued...")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit("\n# hashtag # content # here")).otherwise(
            F.lit("")
        ),
    )
    _stops = ("the", "a")
    gw = gopher_signals(F.col("text"), stopwords=_stops)
    gx = gopher_signals(gx_text, stopwords=_stops)
    pii = pii_signals(F.col("text"))
    bl = blocklist_signals(F.col("text"), _BLOCKLIST)
    stage1 = [
        "doc_id",
        "text",
        c4.alias("_c4"),
        gw.alias("_gw"),
        gx.alias("_gx"),
        pii.alias("_pii"),
        bl.alias("_bl"),
        repetition_signals(F.col("text")).alias("_rep"),
    ]
    _c4, _gw, _gx = F.col("_c4"), F.col("_gw"), F.col("_gx")
    stage2 = [
        "doc_id",
        F.round(top_ngram_char_frac(F.col("text"), 2), 6).alias("top2"),
        F.round(dup_ngram_char_frac(F.col("text"), 3), 6).alias("dup3"),
        F.col("_rep")["dup_line_frac"].alias("dup_line_frac"),
        F.col("_pii")["n_emails"].alias("n_emails"),
        F.col("_pii")["n_ipv4"].alias("n_ipv4"),
        F.col("_pii")["n_phones"].alias("n_phones"),
        F.col("_bl")["n_list_hits"].alias("n_list_hits"),
        F.col("_bl")["list_word_frac"].alias("list_word_frac"),
        _c4["n_lines"].alias("c4_n_lines"),
        _c4["kept_lines"].alias("c4_kept_lines"),
        _c4["clean_chars"].alias("c4_clean_chars"),
        _c4["keep"].alias("c4_keep"),
        _c4["clean_text"].alias("c4_clean_text"),
        _gw["n_words"].alias("gw_n_words"),
        F.round(_gw["mean_word_len"], 6).alias("gw_mean_wl"),
        F.round(_gw["alpha_word_frac"], 6).alias("gw_alpha_frac"),
        _gw["stop_hits"].alias("gw_stop_hits"),
        gopher_keep(_gw).alias("gw_keep"),
        F.round(_gx["symbol_word_ratio"], 6).alias("gx_symbol_ratio"),
        # per-symbol ratios thresholded individually as published (round
        # 7, ADVICE r6: A1.1 applies 0.1 to EACH symbol ratio, not their
        # sum — gopher_keep now checks these two, not gx_symbol_ratio)
        F.round(_gx["hash_word_ratio"], 6).alias("gx_hash_ratio"),
        F.round(_gx["ellipsis_word_ratio"], 6).alias(
            "gx_ellipsis_word_ratio"
        ),
        F.round(_gx["bullet_line_frac"], 6).alias("gx_bullet_frac"),
        F.round(_gx["ellipsis_line_frac"], 6).alias("gx_ellipsis_frac"),
        gopher_keep(
            _gx,
            min_words=10,
            max_bullet_frac=0.1,
            max_ellipsis_frac=0.1,
            min_alpha_frac=0.5,
            min_stop_hits=0,
        ).alias("gx_keep"),
        # round-7 continuation: Shannon entropy of the doc's own token
        # distribution (operators/curation.py token_entropy) — the
        # repetitiveness/gibberish diagnostic; value-sorted term fold
        # replayed in the twin's tent CTE.
        F.round(token_entropy(F.col("text")), 6).alias("tok_entropy"),
    ]
    _SIGNALS_COLS = (stage1, stage2)
    return _SIGNALS_COLS


_SPAN_N = 6
_LINE_MIN_DOCS = 2

_SPAN_DUP_ORACLE = f"""
WITH dg AS (
  SELECT doc_id AS id, unnest(list_distinct({_ngrams_sql("text", _SPAN_N)})) AS span
  FROM documents
),
spans AS (SELECT span FROM dg GROUP BY span HAVING count(*) >= 2),
per_doc AS (SELECT id, count(*) AS n_grams FROM dg GROUP BY id),
rep AS (
  SELECT id, count(*) AS n_repeated FROM dg JOIN spans USING (span) GROUP BY id
),
toks AS (
  SELECT doc_id AS id, {_WORDS.format(t="text")} AS t FROM documents
),
sized AS (SELECT id, t, len(t) AS n_tokens FROM toks),
wins AS (
  SELECT id, win_idx,
         md5(array_to_string(t[win_idx*{_SPAN_N}+1 : win_idx*{_SPAN_N}+{_SPAN_N}], ' ')) AS h,
         array_to_string(t[win_idx*{_SPAN_N}+1 : win_idx*{_SPAN_N}+{_SPAN_N}], ' ') AS wtext,
         least({_SPAN_N}, n_tokens - win_idx*{_SPAN_N}) AS win_len
  FROM sized, UNNEST(range(CAST(ceil(n_tokens / {_SPAN_N}.0) AS BIGINT))) AS u(win_idx)
),
ranked AS (SELECT *, row_number() OVER (PARTITION BY h ORDER BY id, win_idx) AS rn FROM wins),
rebuilt AS (
  SELECT id,
         coalesce(string_agg(wtext, ' ' ORDER BY win_idx) FILTER (WHERE rn = 1), '') AS clean_text,
         coalesce(sum(win_len) FILTER (WHERE rn > 1), 0)::BIGINT AS n_removed
  FROM ranked GROUP BY id
)
SELECT p.id, coalesce(n_repeated, 0)::bigint AS n_repeated, n_grams,
       round(coalesce(n_repeated, 0) / n_grams::double, 6) AS span_dup_frac,
       s.n_tokens::BIGINT AS n_tokens, r.n_removed, r.clean_text,
       ld.n_lines, ld.n_removed_lines, ld.line_clean_text
FROM per_doc p LEFT JOIN rep USING (id)
JOIN sized s ON s.id = p.id
JOIN rebuilt r ON r.id = p.id
JOIN line_dedup ld ON ld.id = p.id
"""


def _span_dup_oracle() -> str:
    # round-7 widening: cross-document LINE dedup over the c4 fixture
    # (the raw corpus has no newlines) — drop lines appearing in >= 2
    # distinct docs, rebuild in order. Same derivation as the Spark
    # operator dedup_lines_across_docs.
    line_ctes = f""",
{_c4_fixture_cte()},
doc_lines AS (
  SELECT doc_id AS id, g.i AS pos, g.line
  FROM (SELECT doc_id, string_split(t, chr(10)) AS ls FROM c4fix),
       LATERAL (SELECT unnest(ls) AS line,
                       generate_subscripts(ls, 1) AS i) g(line, i)
),
line_freq AS (
  SELECT line, COUNT(DISTINCT id) AS n_docs FROM doc_lines GROUP BY line
),
line_kept AS (
  SELECT l.id, l.pos, l.line
  FROM doc_lines l JOIN line_freq f USING (line)
  WHERE f.n_docs < {_LINE_MIN_DOCS}
),
line_dedup AS (
  SELECT t.id, t.n_lines,
         (t.n_lines - coalesce(k.n_kept, 0))::BIGINT AS n_removed_lines,
         coalesce(k.line_clean_text, '') AS line_clean_text
  FROM (SELECT id, COUNT(*)::BIGINT AS n_lines FROM doc_lines GROUP BY id) t
  LEFT JOIN (
    SELECT id, COUNT(*) AS n_kept,
           string_agg(line, chr(10) ORDER BY pos) AS line_clean_text
    FROM line_kept GROUP BY id
  ) k USING (id)
)"""
    head, tail = _SPAN_DUP_ORACLE.split("SELECT p.id,", 1)
    return head.rstrip().rstrip(")") + ")" + line_ctes + "\nSELECT p.id," + tail



@query("curation_span_dup", oracle=_span_dup_oracle())
def curation_span_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated spans: DETECT and REMOVE in one lane.

    Detection (operators/curation.py span_dup_frac): per document, the
    fraction of its distinct word 6-grams that also appear in ≥ 1 other
    document. Removal (remove_duplicate_spans, round 5): ExactSubstr-style
    rewrite at 6-token-window granularity — every window whose exact token
    sequence occurred earlier in the corpus is dropped, first occurrence
    kept, document reassembled (Lee et al. 2022 §3.1; idempotent by the
    fixed-point test in tests/test_curation.py).

    Scale shape, detection side: the text scan + n-gram explode — the
    widest stage — runs ONCE; the cross-document count is a window riding
    the span-keyed exchange, and the per-document rollup is a plain
    (id, counts) aggregation, partially combined map-side. Removal side:
    one ~52-byte-per-window hash exchange for global first-occurrence,
    then a narrow (id, array<long>) join back — the text itself is never
    shuffled; the cleaned string is rebuilt scan-side by an index filter."""
    from kinesiscat_spark.operators.curation import (
        remove_duplicate_spans,
        span_dup_frac,
    )

    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.curation import dedup_lines_across_docs

    docs = load_table(spark, sf_dir, "documents")
    frac = span_dup_frac(docs, n=_SPAN_N)
    cleaned = remove_duplicate_spans(docs, w=_SPAN_N)
    # round-7 widening: cross-document LINE dedup (RefinedWeb line-wise
    # stage, operators/curation.py dedup_lines_across_docs) over the c4
    # FIXTURE text (the raw corpus is newline-free; the fixture's poison
    # lines — javascript/lorem — are genuine cross-doc boilerplate, so
    # the operator is non-degenerate and every column flips per id).
    fixture = docs.select("doc_id", _c4_fixture_col().alias("text"))
    lines = dedup_lines_across_docs(
        fixture, min_docs=_LINE_MIN_DOCS
    ).select(
        "id",
        "n_lines",
        "n_removed_lines",
        F.col("clean_text").alias("line_clean_text"),
    )
    return frac.join(cleaned, "id").join(lines, "id")


_DECON_N = 5

_SEM_TAU = 0.4

_DECON_ORACLE = f"""
WITH bench AS (
  SELECT array_to_string(
           (string_split_regex(trim(text), '\\s+'))[3:14], ' ') AS text
  FROM documents WHERE doc_id % 7 = 0
),
bg AS (
  SELECT DISTINCT g
  FROM (SELECT unnest({_ngrams_sql("text", _DECON_N)}) AS g FROM bench)
),
dg AS (
  SELECT doc_id AS id, unnest(list_distinct({_ngrams_sql("text", _DECON_N)})) AS g
  FROM documents
),
per_doc AS (SELECT id, count(*) AS n_grams FROM dg GROUP BY id),
hits AS (
  SELECT id, count(*) AS n_gram_hits FROM dg JOIN bg USING (g) GROUP BY id
),
report AS (
  SELECT id, n_gram_hits, n_grams,
         round(n_gram_hits / n_grams::double, 6) AS contamination_frac
  FROM per_doc JOIN hits USING (id)
  WHERE n_gram_hits >= 1
)
SELECT 'exact' AS method, * FROM report
UNION ALL
SELECT 'bloom' AS method, * FROM report WHERE id % 3 = 0
UNION ALL
SELECT 'semantic' AS method, id, n_bench_hits AS n_gram_hits,
       CAST(NULL AS BIGINT) AS n_grams, max_sim AS contamination_frac
FROM (
  SELECT id, COUNT(*)::BIGINT AS n_bench_hits, ROUND(MAX(sim), 6) AS max_sim
  FROM (
    SELECT a.vec_id AS id,
      list_sum(list_transform(list_zip(a.embedding, b.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      (sqrt(list_sum(list_transform(a.embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       sqrt(list_sum(list_transform(b.embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
    FROM embeddings a
    JOIN embeddings b ON b.vec_id % 9 = 0
  ) WHERE sim >= {_SEM_TAU}
  GROUP BY id
)
"""

_DECON_BLOOM_BITS = 1 << 18


@query("curation_decontaminate", oracle=_DECON_ORACLE)
def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/curation.py
    contamination_report; Brown et al. 2020 §C): documents sharing ≥ 1
    distinct word 5-gram with a benchmark set, computed BOTH ways — the
    broadcast-join path (method='exact') and the Bloom-prefilter scale
    path (method='bloom', operators/bloom.py). Bloom filters have no
    false negatives and survivors are re-verified exactly, so the two
    must agree row-for-row: the oracle emits the same SQL result under
    both labels, which makes the hash check an equality proof for the
    bloom path. The report is per-document independent, so the bloom
    half runs on the doc_id%3 third of the corpus (its oracle is a row
    filter of the same report) — a full per-row proof at a third of the
    lane cost; the 4× scale receipt in COVERAGE.md covers the full-corpus
    path. The benchmark here is derived in-query — a 12-word
    window from every 7th document — so the oracle can rebuild it from
    the same tables (real pipelines pass the actual test sets).

    Scale shape: exact path broadcasts the benchmark n-gram set (test
    sets are small by construction) and the corpus never shuffles by
    gram; the bloom path replaces that broadcast with a 32 KiB
    bit-packed filter and an FPR-sized verify join — the shape that
    survives a benchmark set too large to broadcast."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.curation import (
        contamination_report,
        word_ngrams,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.array_join(
            F.slice(F.split(F.trim("text"), r"\s+"), 3, 12), " "
        ).alias("text")
    )
    # ONE materialized benchmark gram set serves all three consumers —
    # the exact path's broadcast side, the Bloom build, and the Bloom
    # verify join (round 9, guide §2.4): the benchmark scan + explode +
    # distinct exchange ran three times before, once now. Benchmark gram
    # sets are small by construction (test sets), so the checkpoint is
    # bounded at any corpus scale.
    bench_grams = (
        bench.select(
            F.explode(word_ngrams(F.col("text"), _DECON_N)).alias("g")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
        .localCheckpoint(eager=True)
    )
    exact = contamination_report(
        docs, bench, n=_DECON_N, _bench_grams=bench_grams
    )
    bloom = contamination_report(
        docs.filter(F.col("doc_id") % 3 == 0),
        bench,
        n=_DECON_N,
        broadcast_benchmark=False,
        bloom_bits=_DECON_BLOOM_BITS,
        _bench_grams=bench_grams,
    )
    # round-7 widening: SEMANTIC decontamination (embedding-space leakage
    # the n-gram overlap misses — operators/curation.py
    # semantic_contamination_report). Benchmark = every 9th embedding
    # (derived in-query so the oracle rebuilds it); benchmark members in
    # the corpus flag themselves at sim 1.0, the realistic case.
    from kinesiscat_spark.operators.curation import (
        semantic_contamination_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    sem = semantic_contamination_report(
        emb, emb.filter(F.col("vec_id") % 9 == 0), tau=_SEM_TAU
    ).select(
        F.lit("semantic").alias("method"),
        "id",
        F.col("n_bench_hits").alias("n_gram_hits"),
        F.lit(None).cast("long").alias("n_grams"),
        F.round("max_sim", 6).alias("contamination_frac"),
    )
    return (
        exact.select(F.lit("exact").alias("method"), "*")
        .unionByName(bloom.select(F.lit("bloom").alias("method"), "*"))
        .unionByName(sem)
    )


# --- end-to-end curation pipeline lane (round 5) ---------------------------

_PIPE_MIN_TOKENS = 5
_PIPE_MAX_DUP_LINE = 0.3
_PIPE_MAX_TOP2 = 0.2
_PIPE_DECON_N = 5
_PIPE_MINHASH_T = 0.5
_PIPE_N_HASHES, _PIPE_N_BANDS = 32, 8
_PIPE_SAMPLE_FRAC, _PIPE_SAMPLE_SALT = 0.5, 7
_PIPE_SEM_TAU = 0.4


def _pipeline_oracle() -> str:
    """DuckDB twin of the ENTIRE curate() pipeline, stage by stage — each
    CTE layer is the SQL twin of one pipeline stage, reusing the exact
    formulas the per-operator lanes already hash-check."""
    from kinesiscat_spark.operators.curation import EMAIL_RE, IPV4_RE, PHONE_RE
    from kinesiscat_spark.operators.dedup import MOD48
    from kinesiscat_spark.operators.sampling import md5_threshold

    g2 = _ngrams_sql("text", 2)
    gd = _ngrams_sql("text", _PIPE_DECON_N)
    r = _PIPE_N_HASHES // _PIPE_N_BANDS
    return f"""
WITH RECURSIVE
g_quality AS (  -- quality gate: whitespace token count >= {_PIPE_MIN_TOKENS}
  SELECT * FROM documents
  WHERE len(string_split(lower(text), ' ')) >= {_PIPE_MIN_TOKENS}
),
g_rep AS (  -- repetition gates (Gopher A1.1): dup-line frac + top-2-gram frac
  SELECT * FROM g_quality
  WHERE coalesce(CASE WHEN len(string_split(text, chr(10))) > 0
          THEN 1.0 - len(list_distinct(string_split(text, chr(10))))
               / len(string_split(text, chr(10)))::double END, 0)
        <= {_PIPE_MAX_DUP_LINE}
    AND (CASE WHEN len(list_distinct({g2})) > 0 THEN
          (SELECT cnt * len(g) FROM (
             SELECT g, len(list_filter({g2}, x -> x = g)) AS cnt
             FROM unnest(list_distinct({g2})) AS t(g))
           ORDER BY cnt DESC, g DESC LIMIT 1)
          / greatest(len(text), 1)::double ELSE 0.0 END) <= {_PIPE_MAX_TOP2}
),
g_block AS (  -- blocklist gate (C4 2.2): any blocklist hit drops
  SELECT * FROM g_rep
  WHERE len(list_filter({_WORDS.format(t="text")},
        x -> list_contains({_BLOCKLIST_SQL}, lower(x)))) = 0
),
g_pii AS (  -- pii_policy='drop': no email/IPv4/intl-phone matches
  SELECT * FROM g_block
  WHERE len(regexp_extract_all(text, '{EMAIL_RE}'))
      + len(regexp_extract_all(text, '{IPV4_RE}'))
      + len(regexp_extract_all(text, '{PHONE_RE}')) = 0
),
bench AS (  -- held-out benchmark derived from the RAW corpus (as the lane fn does)
  SELECT array_to_string(
           (string_split_regex(trim(text), '\\s+'))[3:14], ' ') AS text
  FROM documents WHERE doc_id % 7 = 0
),
bg AS (
  SELECT DISTINCT g FROM (SELECT unnest({gd}) AS g FROM bench)
),
dirty AS (
  SELECT DISTINCT dg.id FROM (
    SELECT doc_id AS id, unnest(list_distinct({gd})) AS g FROM g_pii
  ) dg JOIN bg USING (g)
),
g_decon AS (  -- decontamination: drop docs sharing any benchmark n-gram
  SELECT * FROM g_pii WHERE doc_id NOT IN (SELECT id FROM dirty)
),
sem_flagged AS (  -- SEMANTIC decontamination (round 7): cosine >= tau to
                  -- any benchmark embedding (bench = every 9th vector)
  SELECT DISTINCT a.vec_id AS id
  FROM embeddings a JOIN embeddings b ON b.vec_id % 9 = 0
  WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
        (sqrt(list_sum(list_transform(a.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
         sqrt(list_sum(list_transform(b.embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        >= {_PIPE_SEM_TAU}
),
g_sem AS (
  SELECT * FROM g_decon WHERE doc_id NOT IN (SELECT id FROM sem_flagged)
),
winners AS (SELECT MIN(doc_id) AS doc_id FROM g_sem GROUP BY sha256(text)),
g_exact AS (  -- exact dedup: lowest id per identical text
  SELECT g_sem.* FROM g_sem JOIN winners USING (doc_id)
),
toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t FROM g_exact
),
mh_sh AS (
  SELECT doc_id, list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                 i -> array_to_string(t[i:i+2], ' ')) AS s
  FROM toks
),
hp AS (
  SELECT doc_id,
         list_transform(list_transform(s, x -> md5(x)),
           m -> {{'a': ('0x' || substring(m, 1, 12))::BIGINT,
                  'b': ('0x' || substring(m, 13, 12))::BIGINT}}) AS hp
  FROM mh_sh
),
sigs AS (
  SELECT doc_id,
         list_transform(generate_series(0, {_PIPE_N_HASHES - 1}),
           i -> list_min(list_transform(hp, p -> (p.a + i * p.b) % {MOD48}))) AS sig
  FROM hp
),
bands AS (
  SELECT doc_id, sig, t.b AS band, sig[{r}*t.b + 1 : {r}*t.b + {r}] AS key
  FROM sigs CROSS JOIN range(0, {_PIPE_N_BANDS}) t(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
mpairs AS (
  SELECT id_a, id_b FROM (
    SELECT id_a, id_b,
           len(list_filter(list_zip(sig_a, sig_b), p -> p[1] = p[2]))
             / {_PIPE_N_HASHES}.0 AS est
    FROM cand
  ) WHERE est >= {_PIPE_MINHASH_T}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM mpairs
  UNION SELECT id_b, id_a FROM mpairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT rc.u, e.v FROM reach rc JOIN edges e ON rc.v = e.u
),
labels AS (SELECT u AS id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u),
losers AS (SELECT id FROM labels WHERE id <> cluster_id),
g_near AS (  -- near-dup cluster dedup: keep one canonical doc per cluster
  SELECT * FROM g_exact WHERE doc_id NOT IN (SELECT id FROM losers)
),
best_losers AS (  -- keep-BEST policy (round 7): highest n_chars wins,
                  -- ties -> lowest id (operators/clusters.py keep_best)
  SELECT id FROM (
    SELECT l.id,
           ROW_NUMBER() OVER (PARTITION BY l.cluster_id
                              ORDER BY d.n_chars DESC, l.id ASC) AS rk
    FROM labels l JOIN g_exact d ON d.doc_id = l.id
  ) WHERE rk > 1
),
g_near_best AS (
  SELECT * FROM g_exact WHERE doc_id NOT IN (SELECT id FROM best_losers)
)
-- kind='batch': the full batch pipeline; kind='stream': the STREAMING
-- pipeline (curate_stream) — identical gate/dedup/sample layers, but no
-- inline near-dup stage (candidates are a separate stream; cluster
-- resolution is a periodic batch job), so its twin samples g_exact.
SELECT 'batch' AS kind, doc_id FROM g_near
WHERE substr(md5(doc_id || chr(31) || '{_PIPE_SAMPLE_SALT}'), 1, 12)
      < '{md5_threshold(_PIPE_SAMPLE_FRAC)}'
UNION ALL
SELECT 'stream' AS kind, doc_id FROM g_exact
WHERE substr(md5(doc_id || chr(31) || '{_PIPE_SAMPLE_SALT}'), 1, 12)
      < '{md5_threshold(_PIPE_SAMPLE_FRAC)}'
UNION ALL
SELECT 'batch_best' AS kind, doc_id FROM g_near_best
WHERE substr(md5(doc_id || chr(31) || '{_PIPE_SAMPLE_SALT}'), 1, 12)
      < '{md5_threshold(_PIPE_SAMPLE_FRAC)}'
-- kind='attr_<stage>' (round 7): the pipeline ATTRITION funnel — one
-- surviving-row count per curate() stage, replayed off the SAME stage
-- CTEs the doc rows flow through. Gopher and language gates are
-- disabled under the lane config (pass-throughs), so their counts ride
-- their predecessors' layers.
UNION ALL
SELECT 'attr_input' AS kind, (SELECT COUNT(*) FROM documents) AS doc_id
UNION ALL
SELECT 'attr_quality', (SELECT COUNT(*) FROM g_quality)
UNION ALL
SELECT 'attr_repetition', (SELECT COUNT(*) FROM g_rep)
UNION ALL
SELECT 'attr_gopher', (SELECT COUNT(*) FROM g_rep)
UNION ALL
SELECT 'attr_blocklist', (SELECT COUNT(*) FROM g_block)
UNION ALL
SELECT 'attr_language', (SELECT COUNT(*) FROM g_block)
UNION ALL
SELECT 'attr_pii', (SELECT COUNT(*) FROM g_pii)
UNION ALL
SELECT 'attr_decontaminate', (SELECT COUNT(*) FROM g_decon)
UNION ALL
SELECT 'attr_semantic_decontaminate', (SELECT COUNT(*) FROM g_sem)
UNION ALL
SELECT 'attr_exact_dedup', (SELECT COUNT(*) FROM g_exact)
UNION ALL
SELECT 'attr_near_dedup', (SELECT COUNT(*) FROM g_near)
UNION ALL
SELECT 'attr_sample', (
  SELECT COUNT(*) FROM g_near
  WHERE substr(md5(doc_id || chr(31) || '{_PIPE_SAMPLE_SALT}'), 1, 12)
        < '{md5_threshold(_PIPE_SAMPLE_FRAC)}'
)
"""


@query("curation_pipeline", oracle=_pipeline_oracle())
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENTIRE training-data curation pipeline (pipelines.py curate),
    hash-checked end to end: quality gate → Gopher repetition gates →
    blocklist gate (C4 any-hit drop) → PII
    drop → benchmark decontamination → exact dedup → minhash-LSH near-dup
    pairs → connected components → keep-canonical → deterministic md5
    sampling. One lazy Spark plan; the oracle replays every stage as a CTE
    layer using the same formulas the per-operator lanes verify, so a
    semantic drift in ANY composed stage breaks this lane's hash.

    Scale shape is inherited from the component operators (scan-stage
    gates with pushdown, digest-keyed dedup exchange, banded LSH with the
    hot-bucket guard, (id,label)-only CC rounds, partition-invariant
    content-hash sampling); the language gate is exercised by its own
    lane (text_language_id) and disabled here to keep the oracle bounded.

    ``kind='stream'`` (round-6 widening): the STREAMING pipeline
    (``pipelines.curate_stream``) drained over the same documents at the
    same config — identical gate/decontaminate/dedup/sample layers
    hash-checked doc-for-doc; the near-dup stage is absent by design
    (candidates are a separate stream, cluster resolution a periodic
    batch job), so its twin samples the exact-dedup layer. The lane
    drains in one availableNow trigger (first-seen == min-id within a
    single micro-batch, making the result file-order-independent); the
    cross-batch state path is pinned in tests/test_curate_stream.py.
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.pipelines import CurationConfig, curate, curate_stream
    from kinesiscat_spark.streaming.source import (
        StreamConfig,
        read_table_stream,
        run_to_memory,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.array_join(F.slice(F.split(F.trim("text"), r"\s+"), 3, 12), " ").alias(
            "text"
        )
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cfg = CurationConfig(
        min_tokens=_PIPE_MIN_TOKENS,
        max_dup_line_frac=_PIPE_MAX_DUP_LINE,
        max_top_ngram_char_frac=_PIPE_MAX_TOP2,
        top_ngram_n=2,
        blocklist=_BLOCKLIST,
        pii_policy="drop",
        benchmark=bench,
        contamination_ngram=_PIPE_DECON_N,
        near_dup_threshold=_PIPE_MINHASH_T,
        minhash_hashes=_PIPE_N_HASHES,
        minhash_bands=_PIPE_N_BANDS,
        sample_fraction=_PIPE_SAMPLE_FRAC,
        sample_salt=_PIPE_SAMPLE_SALT,
        sample_method="md5",
        # round-7 widening: the SEMANTIC decontamination stage rides the
        # pipeline in BOTH twins (batch anti-join / stream-static anti-
        # join) — bench = every 9th embedding, derived in-query so the
        # oracle rebuilds it
        benchmark_embeddings=emb.filter(F.col("vec_id") % 9 == 0),
        corpus_embeddings=emb,
        semantic_tau=_PIPE_SEM_TAU,
    )
    batch = curate(docs, cfg).select(
        F.lit("batch").alias("kind"), "doc_id"
    )
    stream_docs = read_table_stream(
        spark, sf_dir, "documents", StreamConfig(batch_size=100000)
    )
    drained = run_to_memory(curate_stream(stream_docs, cfg), output_mode="append")
    stream = drained.select(F.lit("stream").alias("kind"), "doc_id")
    # kind='batch_best' (round-7 continuation): the SAME pipeline with the
    # quality-aware cluster winner (keep_best on n_chars — longest member
    # wins, ties -> lowest id) instead of lowest-id keep_canonical.
    import dataclasses

    best_cfg = dataclasses.replace(
        cfg, near_dup_keep="best", near_dup_score_col="n_chars"
    )
    best = curate(docs, best_cfg).select(
        F.lit("batch_best").alias("kind"), "doc_id"
    )
    # kind='attr_<stage>' (round-7 continuation): the attrition funnel —
    # one surviving-row count per stage in ONE lazy plan
    # (pipelines.attrition_report); the count rides doc_id, the oracle
    # replays each count off its stage CTE.
    from kinesiscat_spark.pipelines import attrition_report

    attr = attrition_report(docs, cfg).select(
        F.concat(F.lit("attr_"), F.col("stage")).alias("kind"),
        F.col("n_docs").alias("doc_id"),
    )
    return (
        batch.unionByName(stream).unionByName(best).unionByName(attr)
    )
