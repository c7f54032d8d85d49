"""pack_sequences (operators/packing.py): layout correctness at every
boundary the arithmetic has — budget-exact documents, docs straddling
several sequences, empty/NULL text, shard routing, partition invariance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesiscat_spark.operators.packing import (
    _shard_of,
    pack_sequences,
    whitespace_token_count,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _layout(df):
    return {
        (r.shard, r.seq, r.id): (r.n_tokens, r.seq_off, r.n_in_seq)
        for r in df.collect()
    }


def _python_pack(rows, budget, n_shards):
    """Driver-side replay of the documented layout: md5 shard routing,
    id-ordered running offsets, floor-division sequence spans."""
    import hashlib

    out = {}
    shards: dict[int, list] = {}
    for doc_id, text in rows:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
        shard = (h * n_shards) >> 48
        n_tok = 0 if text is None else len(text.lower().split(" "))
        shards.setdefault(shard, []).append((doc_id, n_tok))
    for shard, docs in shards.items():
        t = 0
        for doc_id, n_tok in sorted(docs):
            start, end = t, t + n_tok
            t = end
            if n_tok == 0:
                continue
            for seq in range(start // budget, (end - 1) // budget + 1):
                base = seq * budget
                out[(shard, seq, doc_id)] = (
                    n_tok,
                    max(start - base, 0),
                    min(end, base + budget) - max(start, base),
                )
    return out


def test_matches_python_replay(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(3 + (i * 7) % 40))) for i in range(60)]
    got = _layout(pack_sequences(_docs(spark, rows), budget=16, n_shards=4))
    assert got == _python_pack(rows, budget=16, n_shards=4)


def test_single_shard_budget_boundaries(spark):
    # one shard so the token stream is fully ordered: doc 1 has exactly
    # the budget, doc 2 starts exactly at a boundary, doc 3 straddles it
    rows = [(1, " ".join(["a"] * 8)), (2, " ".join(["b"] * 4)), (3, " ".join(["c"] * 6))]
    out = _layout(pack_sequences(_docs(spark, rows), budget=8, n_shards=1))
    assert out[(0, 0, 1)] == (8, 0, 8)  # fills sequence 0 exactly
    assert out[(0, 1, 2)] == (4, 0, 4)  # starts at the seq-1 boundary
    assert out[(0, 1, 3)] == (6, 4, 4)  # straddles 1 -> 2
    assert out[(0, 2, 3)] == (6, 0, 2)
    assert len(out) == 4


def test_doc_longer_than_budget_spans_many_sequences(spark):
    rows = [(1, " ".join(["x"] * 35))]
    out = pack_sequences(_docs(spark, rows), budget=10, n_shards=1)
    got = sorted((r.seq, r.seq_off, r.n_in_seq) for r in out.collect())
    assert got == [(0, 0, 10), (1, 0, 10), (2, 0, 10), (3, 0, 5)]


def test_n_in_seq_sums_to_n_tokens(spark):
    rows = [(i, " ".join(["t"] * (1 + (i * 13) % 50))) for i in range(100)]
    out = pack_sequences(_docs(spark, rows), budget=32, n_shards=8)
    per_doc = (
        out.groupBy("id", "n_tokens").agg(F.sum("n_in_seq").alias("s")).collect()
    )
    assert per_doc and all(r.s == r.n_tokens for r in per_doc)


def test_every_sequence_full_except_shard_tail(spark):
    rows = [(i, " ".join(["t"] * (1 + (i * 13) % 50))) for i in range(100)]
    out = pack_sequences(_docs(spark, rows), budget=32, n_shards=4)
    per_seq = out.groupBy("shard", "seq").agg(F.sum("n_in_seq").alias("fill"))
    last = out.groupBy("shard").agg(F.max("seq").alias("seq"))
    non_tail = per_seq.join(last, ["shard", "seq"], "left_anti").collect()
    assert non_tail and all(r.fill == 32 for r in non_tail)


def test_partition_invariance(spark):
    rows = [(i, " ".join(["t"] * (1 + (i * 11) % 30))) for i in range(80)]
    docs = _docs(spark, rows)
    a = _layout(pack_sequences(docs.repartition(1), budget=16, n_shards=4))
    b = _layout(pack_sequences(docs.repartition(13, "text"), budget=16, n_shards=4))
    assert a == b


def test_null_text_is_zero_tokens_and_does_not_shift_offsets(spark):
    # ADVICE round 4: NULL text must count 0 (not size(split(NULL)) = -1)
    # and must not corrupt later documents' offsets in the shard.
    with_null = [(1, "a b c"), (2, None), (3, "d e")]
    without = [(1, "a b c"), (3, "d e")]
    a = _layout(pack_sequences(_docs(spark, with_null), budget=4, n_shards=1))
    b = _layout(pack_sequences(_docs(spark, without), budget=4, n_shards=1))
    assert a == b  # the NULL doc emits no rows and occupies no tokens
    assert not any(doc_id == 2 for (_, _, doc_id) in a)


def test_empty_string_is_one_token(spark):
    # split('') == [''] -> 1 token, matching the corpus-wide tokenizer
    out = pack_sequences(_docs(spark, [(1, "")]), budget=4, n_shards=1).collect()
    assert len(out) == 1 and out[0].n_tokens == 1 and out[0].n_in_seq == 1


def test_upstream_counts_null_and_negative_clamped(spark):
    # zero-token doc on a budget boundary must NOT explode a descending
    # sequence() into spurious rows (ADVICE round 4)
    df = spark.createDataFrame(
        [(1, 4), (2, None), (3, -7), (4, 4)], "doc_id long, n long"
    )
    out = pack_sequences(
        df, budget=4, n_shards=1, n_tokens_col="n", text_col="n"
    ).collect()
    ids = sorted(r.id for r in out)
    assert ids == [1, 4]
    by_id = {r.id: r for r in out}
    assert (by_id[1].seq, by_id[1].n_in_seq) == (0, 4)
    assert (by_id[4].seq, by_id[4].n_in_seq) == (1, 4)  # offsets unshifted


def test_validation(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, budget=4, n_shards=1 << 15)


def test_shard_math_is_exact_long_division(spark):
    # (h * n) >> 48 over longs: exact for large non-power-of-two shard
    # counts where the old double formula could misroute boundary keys
    import hashlib

    n_shards = 12345
    df = spark.range(500).select(
        F.col("id"), _shard_of(F.col("id").cast("string"), n_shards).alias("s")
    )
    for r in df.collect():
        h = int(hashlib.md5(str(r.id).encode()).hexdigest()[:12], 16)
        assert r.s == (h * n_shards) >> 48


def test_whitespace_token_count_null(spark):
    df = spark.createDataFrame([(None,), ("a b",), ("",)], "t string")
    got = [r.n for r in df.select(whitespace_token_count(F.col("t")).alias("n")).collect()]
    assert got == [0, 2, 1]


def test_materialize_sequences_token_level_invariants(spark):
    """The assembled training rows hold at the TOKEN level: every sequence
    except each shard's last is exactly budget tokens; concatenating a
    document's pieces across its sequences reproduces its token stream;
    doc order inside a sequence follows the layout."""
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.packing import materialize_sequences

    rows = [(i, " ".join(f"d{i}t{j}" for j in range(1 + (i * 13) % 50))) for i in range(80)]
    docs = _docs(spark, rows)
    out = materialize_sequences(docs, budget=32, n_shards=4)
    got = out.collect()
    assert got

    # full-sequence invariant on real tokens
    last = {r.shard: r.seq for r in out.groupBy("shard").agg(F.max("seq").alias("seq")).collect()}
    for r in got:
        if r.seq != last[r.shard]:
            assert len(r.tokens) == 32, (r.shard, r.seq, len(r.tokens))

    # per-document reconstruction: tokens attributed to doc i, in
    # (shard-stream) order, equal the doc's own token stream
    from collections import defaultdict

    rebuilt = defaultdict(list)
    for r in sorted(got, key=lambda r: (r.shard, r.seq)):
        # pieces inside a sequence are laid out consecutively in doc_ids order
        idx = 0
        per_doc = []
        for did in r.doc_ids:
            per_doc.append(did)
        # walk tokens by doc: the doc's tokens are contiguous within the seq
        # and prefixed d{i}t{j}, so attribute by prefix
        for t in r.tokens:
            did = int(t.split("t")[0][1:])
            rebuilt[did].append(t)
    for i, text in rows:
        assert rebuilt[i] == text.split(" "), f"doc {i}"


def test_packing_hypothesis_fuzz_vs_python_replay(spark):
    """Property fuzz: random (budget, n_shards, doc lengths incl. zeros)
    against the pure-python layout replay — catches off-by-ones the
    hand-picked cases miss."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        budget=st.integers(1, 24),
        n_shards=st.integers(1, 6),
        lens=st.lists(st.integers(0, 40), min_size=1, max_size=25),
    )
    def run(budget, n_shards, lens):
        rows = [
            (i, None if n == 0 else " ".join(["w"] * n)) for i, n in enumerate(lens)
        ]
        got = _layout(
            pack_sequences(_docs(spark, rows), budget=budget, n_shards=n_shards)
        )
        assert got == _python_pack(rows, budget=budget, n_shards=n_shards)

    run()


def test_packing_efficiency_report_hand_computed(spark):
    """Exact padding math on a tiny corpus: naive pads every doc to a
    context multiple, packed pads only per-shard tails; identical totals
    when the context is 1 (no padding possible)."""
    import pytest

    from kinesiscat_spark.operators.packing import packing_efficiency_report

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r.context: r
        for r in packing_efficiency_report(
            docs, (4, 1), n_shards=1
        ).collect()
    }
    # tokens: 3 + 2 + 0 = 5
    assert got[4].total_tokens == 5
    assert got[4].padded_naive == 4 + 4          # ceil(3/4)*4 + ceil(2/4)*4
    assert got[4].padded_packed == 8             # one shard: ceil(5/4)*4
    assert got[1].padded_naive == 5 == got[1].padded_packed
    # packing never pads more than the naive collator
    assert got[4].padded_packed <= got[4].padded_naive
    with pytest.raises(ValueError):
        packing_efficiency_report(docs, ())
    with pytest.raises(ValueError):
        packing_efficiency_report(docs, (0,))


class TestExportManifest:
    """export_manifest: the per-shard audit record must agree exactly with
    a driver-side replay, and its digest must catch membership edits."""

    def _manifest(self, spark, rows, budget=16, n_shards=4):
        from kinesiscat_spark.operators.packing import export_manifest

        return {
            r.shard: (r.n_docs, r.n_tokens, r.digest, r.max_doc_tokens,
                      r.n_sequences)
            for r in export_manifest(
                _docs(spark, rows), budget=budget, n_shards=n_shards
            ).collect()
        }

    def _python_manifest(self, rows, budget, n_shards):
        import hashlib

        shards: dict[int, list] = {}
        for doc_id, text in rows:
            h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
            shard = (h * n_shards) >> 48
            n_tok = 0 if text is None else len(text.lower().split(" "))
            shards.setdefault(shard, []).append((doc_id, n_tok))
        out = {}
        for shard, docs in shards.items():
            dig = 0
            for doc_id, n_tok in docs:
                pair = f"{doc_id}\x1f{n_tok}".encode()
                dig ^= int(hashlib.md5(pair).hexdigest()[:12], 16)
            total = sum(n for _, n in docs)
            out[shard] = (
                len(docs),
                total,
                dig,
                max(n for _, n in docs),
                -(-total // budget),
            )
        return out

    def test_matches_python_replay(self, spark):
        rows = [
            (i, " ".join(f"w{j}" for j in range(1 + (i * 5) % 30)))
            for i in range(50)
        ]
        assert self._manifest(spark, rows) == self._python_manifest(
            rows, 16, 4
        )

    def test_digest_flips_on_membership_edits(self, spark):
        rows = [(i, f"a b c d{i}") for i in range(20)]
        base = self._manifest(spark, rows)
        # dropping one doc flips exactly its shard's digest and counts
        dropped = self._manifest(spark, rows[1:])
        changed = {s for s in base if base[s] != dropped.get(s)}
        assert len(changed) == 1
        # editing one doc's token count flips its shard's digest too
        edited = self._manifest(spark, [(0, "a b c d0 extra")] + rows[1:])
        assert sum(base[s] != edited.get(s) for s in base) == 1

    def test_digest_is_order_insensitive(self, spark):
        rows = [(i, f"t{i} u v") for i in range(30)]
        assert self._manifest(spark, rows) == self._manifest(
            spark, list(reversed(rows))
        )

    def test_null_text_counts_zero_and_validation(self, spark):
        rows = [(1, None), (2, "a b")]
        man = self._manifest(spark, rows, budget=2, n_shards=1)
        assert man[0][:2] == (2, 2)  # 2 docs, 2 tokens (NULL -> 0)
        assert man[0][4] == 1  # one sequence
        with pytest.raises(ValueError, match="budget"):
            from kinesiscat_spark.operators.packing import export_manifest

            export_manifest(_docs(spark, rows), budget=0)


class TestTokenLengthHistogram:
    """token_length_histogram + histogram_quantiles: exact counts, the
    mergeability contract, and interpolation correctness."""

    def _hist(self, spark, rows, n_bins=8, bin_width=4):
        from kinesiscat_spark.operators.packing import token_length_histogram

        return {
            r.bin: (r.bin_lo, r.bin_hi, r.n_docs)
            for r in token_length_histogram(
                _docs(spark, rows), n_bins=n_bins, bin_width=bin_width
            ).collect()
        }

    def test_matches_python_replay(self, spark):
        rows = [(i, " ".join("w" for _ in range(1 + (i * 3) % 37)))
                for i in range(60)]
        got = self._hist(spark, rows)
        want: dict[int, int] = {}
        for _, text in rows:
            n = len(text.lower().split(" "))
            b = min(n // 4, 7)
            want[b] = want.get(b, 0) + 1
        assert {b: c for b, (_, _, c) in got.items()} == want
        assert all(lo == b * 4 and hi == (b + 1) * 4
                   for b, (lo, hi, _) in got.items())

    def test_counts_merge_associatively(self, spark):
        rows = [(i, " ".join("x" for _ in range(2 + i % 20)))
                for i in range(40)]
        a, b = rows[:17], rows[17:]
        ha = self._hist(spark, a)
        hb = self._hist(spark, b)
        merged = {
            k: (ha.get(k, (0, 0, 0))[2] + hb.get(k, (0, 0, 0))[2])
            for k in set(ha) | set(hb)
        }
        assert {k: c for k, (_, _, c) in self._hist(spark, rows).items()} \
            == merged

    def test_quantiles_interpolate_and_bound(self, spark):
        from kinesiscat_spark.operators.packing import (
            histogram_quantiles,
            token_length_histogram,
        )

        # 100 docs with lengths 1..100: true P50 ~ 50, P90 ~ 90
        rows = [(i, " ".join("t" for _ in range(i + 1))) for i in range(100)]
        hist = token_length_histogram(
            _docs(spark, rows), n_bins=32, bin_width=8
        )
        got = {
            r.q_permille: (r.est, r.err_bound)
            for r in histogram_quantiles(
                hist, (0.5, 0.9, 0.99), bin_width=8
            ).collect()
        }
        import numpy as np

        lengths = sorted(len(t.split(" ")) for _, t in rows)
        for qp, q in ((500, 0.5), (900, 0.9), (990, 0.99)):
            est, err = got[qp]
            true = float(np.quantile(lengths, q))
            assert err == 8.0
            assert abs(est - true) <= err + 1, (qp, est, true)
        assert got[500][0] < got[900][0] < got[990][0]

    def test_validation(self, spark):
        from kinesiscat_spark.operators.packing import (
            histogram_quantiles,
            token_length_histogram,
        )

        d = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError, match="n_bins"):
            token_length_histogram(d, n_bins=1)
        with pytest.raises(ValueError, match="bin_width"):
            token_length_histogram(d, bin_width=0)
        h = token_length_histogram(d)
        with pytest.raises(ValueError, match="quantiles"):
            histogram_quantiles(h, ())
        with pytest.raises(ValueError, match="quantiles"):
            histogram_quantiles(h, (1.5,))
