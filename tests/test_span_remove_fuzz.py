"""Property fuzz for remove_duplicate_spans: many random corpora replayed
against a pure-python reference in ONE Spark job (same batching pattern as
the packing fuzz) — boundary arithmetic (tail windows, w=1, doc-internal
repeats, empty docs) is exactly where off-by-ones live."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from kinesiscat_spark.operators.curation import remove_duplicate_spans

VOCAB = ["a", "b", "c", "dd", "eee", "zz"]


def _py_remove(corpus: list[tuple[int, str]], w: int) -> dict[int, tuple]:
    """Pure-python replay: non-overlapping w-token windows, global
    (id, win_idx) first occurrence kept, later exact windows removed."""
    seen: set[tuple[str, ...]] = set()
    out: dict[int, tuple] = {}
    for doc_id, text in sorted(corpus):
        toks = [t for t in text.split() if t]
        kept: list[str] = []
        removed = 0
        for i in range(0, len(toks), w):
            win = tuple(toks[i : i + w])
            if win in seen:
                removed += len(win)
            else:
                seen.add(win)
                kept.extend(win)
        out[doc_id] = (len(toks), removed, " ".join(kept))
    return out


def test_remove_duplicate_spans_matches_python_replay(spark):
    rng = random.Random(20250814)
    cases = []
    for case in range(40):
        w = rng.choice([1, 2, 3, 5])
        n_docs = rng.randint(1, 8)
        docs = []
        for d in range(n_docs):
            n = rng.randint(0, 17)
            toks = [rng.choice(VOCAB) for _ in range(n)]
            # inject repeats: sometimes copy a window from an earlier doc
            if docs and rng.random() < 0.6:
                src = rng.choice(docs)[1].split()
                if len(src) >= w:
                    start = rng.randrange(0, len(src) - w + 1)
                    pos = rng.randint(0, len(toks))
                    toks[pos:pos] = src[start : start + w]
            docs.append((d, " ".join(toks)))
        cases.append((case, w, docs))

    # one Spark job per distinct w (grouped), each over a batched corpus
    by_w: dict[int, list[tuple[int, list]]] = {}
    for case, w, docs in cases:
        by_w.setdefault(w, []).append((case, docs))
    for w, group in by_w.items():
        rows = [
            (case * 1000 + doc_id, text)
            for case, docs in group
            for doc_id, text in docs
        ]
        got = {
            r.id: (r.n_tokens, r.n_removed, r.clean_text)
            for r in remove_duplicate_spans(
                spark.createDataFrame(rows, ["doc_id", "text"]), w=w
            ).collect()
        }
        # NOTE: batching merges all cases of a w into ONE corpus — the
        # python replay runs on the same merged corpus, so cross-case
        # dedup is part of the property, not an artifact
        want = _py_remove(rows, w)
        assert got == want, (w, {k: (got.get(k), want.get(k)) for k in set(got) ^ set(want) or list(got)[:3]})
        # global invariant: every repeated window survives exactly once
        total_kept_tokens = sum(v[0] - v[1] for v in got.values())
        assert total_kept_tokens == sum(
            len(v[2].split()) for v in got.values()
        )


def test_remove_duplicate_spans_null_text_is_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, "a b a b"), (2, "a b q")], ["doc_id", "text"]
    )
    got = {
        r.id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in remove_duplicate_spans(docs, w=2).collect()
    }
    assert got[0] == (0, 0, "")
    assert got[1] == (4, 2, "a b")      # doc-internal repeat removed
    assert got[2] == (3, 2, "q")        # [a b] seen in doc 1 first
