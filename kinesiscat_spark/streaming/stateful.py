"""Custom stateful streaming operators (applyInPandasWithState).

The reference keeps no cross-record state at all — its only cursor is the
shard iterator string (`/root/reference/worker/worker.go:210-243`), so a
crash forgets everything it has seen. Spark's arbitrary stateful
processing is the extension surface for operators the built-in streaming
aggregates can't express; the first one a training-data ingest pipeline
needs is **streaming dedup**: emit a record the first time its key
appears, drop every later duplicate, across micro-batches, surviving
restarts (state lives in the checkpoint).

Scale design (100 TB): state is partitioned by the dedup key — each
executor holds only its shard of the key space (RocksDB state store in
production; set a watermark-based state TTL when keys expire). Per batch
the work is one shuffle on the key plus an Arrow-batched pandas call per
key group; nothing ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

_STATE_SCHEMA = "seen boolean"


def dedup_first_seen(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    output_schema: StructType | str,
) -> DataFrame:
    """Streaming first-seen dedup: one output row per distinct key — the
    row with the smallest ``order_col`` in the key's first micro-batch —
    suppressed forever after via per-key state.

    ``output_schema`` must cover exactly the columns to emit (a subset of
    ``df``'s columns, keys included). Within a micro-batch the winner is
    deterministic (min by ``order_col``); across batches "first" follows
    micro-batch arrival order, which is the stream's notion of time.
    """
    out_schema = output_schema
    out_cols = (
        [f.name for f in out_schema.fields]
        if isinstance(out_schema, StructType)
        else [c.split()[0] for c in out_schema.split(",")]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key already emitted in an earlier batch
        best: pd.DataFrame | None = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if best is None or cand[order_col].iat[0] < best[order_col].iat[0]:
                best = cand
        if best is None:
            return
        state.update((True,))
        yield best[out_cols]

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_minhash_candidates(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 32,
    n_bands: int = 8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming near-dup detection: banded-minhash candidate pairs ACROSS
    micro-batches. The ingest-pipeline twin of the batch
    ``operators.dedup.minhash_lsh_pairs`` — a document arriving now is
    checked against every document ever seen in any of its LSH buckets,
    with bucket membership persisted in per-group state (checkpointed, so
    it survives restarts — strictly more durable than the reference's
    iterator-string cursor, worker/worker.go:210-243).

    Emits (id_a, id_b, est_jaccard) rows with est ≥ threshold; a pair that
    collides in several bands is emitted once per colliding band (dedupe
    downstream — streaming dropDuplicates would hold its own state).

    Scale design: state is partitioned by (band, band_key) — each executor
    holds only its shard of the bucket space, and per batch the work is one
    shuffle on the bucket key plus an Arrow call per touched bucket. Bucket
    state grows with corpus size; production deployments put a TTL on
    buckets (GroupStateTimeout) or rotate the hash seed per epoch.
    Signatures come from the same Arrow kernel as the batch path
    (``minhash_signature_udf``), so batch and stream agree bit-for-bit.
    """
    import numpy as np

    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.dedup import minhash_signature_udf

    assert n_hashes % n_bands == 0
    r = n_hashes // n_bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature_udf(n_hashes, n)(F.col(text_col)).alias("sig"),
    )
    bands = sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("sig", b * r + 1, r)).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (seen_ids, seen_sigs) = state.get
            seen_ids = list(seen_ids)
            seen_sigs = [list(s) for s in seen_sigs]
        else:
            seen_ids, seen_sigs = [], []
        out_a, out_b, out_est = [], [], []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                new_id = int(row["id"])
                # plain Python ints: numpy scalars in the state tuple break
                # the JVM unpickler (ClassDict numpy.dtype)
                new_sig = [int(x) for x in row["sig"]]
                if seen_ids:
                    S = np.asarray(seen_sigs, dtype=np.int64)
                    agree = (S == np.asarray(new_sig, dtype=np.int64)).sum(axis=1)
                    est = agree / float(n_hashes)
                    for j in np.nonzero(est >= threshold)[0]:
                        a, b = sorted((seen_ids[int(j)], new_id))
                        if a != b:
                            out_a.append(a)
                            out_b.append(b)
                            out_est.append(float(est[int(j)]))
                seen_ids.append(new_id)
                seen_sigs.append(new_sig)
        state.update((seen_ids, seen_sigs))
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "est_jaccard": out_est}
            )

    return bands.groupBy("band", "key").applyInPandasWithState(
        fn,
        outputStructType="id_a long, id_b long, est_jaccard double",
        stateStructType="ids array<long>, sigs array<array<long>>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_remove_duplicate_spans(
    docs: DataFrame,
    w: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of ``curation.remove_duplicate_spans``: emits one
    row per REMOVED window — ``(id, win_idx, win_len)`` — deciding
    duplicates ACROSS micro-batches via per-hash first-seen state
    (checkpointed, restart-surviving). A window is removed iff its exact
    token sequence was already seen in an earlier batch (state) or
    earlier in this batch (within-batch order = (id, win_idx), the batch
    operator's global order — so an id-ordered stream reproduces the
    batch result exactly; tests pin this).

    The caller rewrites documents downstream (e.g. in ``foreachBatch``:
    join the removal rows back and drop the flagged windows — the same
    index-filter rebuild the batch operator uses). Emitting decisions
    rather than rewritten text keeps the stateful stage's shuffle at a
    fixed ~20 bytes per window and leaves the text in the scan, exactly
    like the batch plan.

    Scale design: state is partitioned by the window hash — each executor
    holds its shard of the seen-hash space; per batch the work is one
    shuffle on the hash plus an Arrow call per touched hash group. The
    window derivation is the shared ``curation.doc_windows``, so batch
    and stream hash identically by construction.
    """
    from kinesiscat_spark.operators.curation import doc_windows

    wins = doc_windows(docs, w, id_col, text_col)
    # derive the id type from the input — string/UUID document ids are
    # common, and a hardcoded schema would fail Arrow conversion
    id_type = docs.schema[id_col].dataType.simpleString()

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        batch = pd.concat(rows).sort_values(["id", "win_idx"])
        if state.exists:
            removed = batch  # hash seen in an earlier batch: all dups
        else:
            state.update((True,))
            removed = batch.iloc[1:]  # first occurrence survives
        if len(removed):
            yield removed[["id", "win_idx", "win_len"]]

    return wins.groupBy("h").applyInPandasWithState(
        fn,
        outputStructType=f"id {id_type}, win_idx int, win_len int",
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_STATE = "session_id long, start_us long, last_us long, n long"


def streaming_sessionize(
    events: DataFrame,
    gap_us: int,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    order_col: str = "event_id",
) -> DataFrame:
    """Streaming sessionization: fold each user's event stream into
    gap-delimited sessions ACROSS micro-batches, emitting a session row
    the moment a later event CLOSES it (append mode — closed sessions are
    immutable, the streaming-correct contract).

    The ingest twin of the batch ``events_sessionization`` lane: same gap
    rule (a session breaks when the inter-event gap exceeds ``gap_us``),
    same 1-based per-user session numbering, same output columns
    ``(user_id, session_id, n_events, session_start_us,
    session_end_us)``.  On an in-order drain, the emitted set is exactly
    the batch result minus each user's LAST session (which no later event
    ever closes — production deployments close idle sessions with an
    event-time timeout/watermark; the open-session tail lives in state
    either way).  Pinned against the batch lane in
    tests/test_streaming_sessionize.py.

    Within a micro-batch events sort by (ts, order_col) — the batch
    lane's deterministic order; ACROSS batches the fold assumes per-user
    arrival follows event time (true for log ingestion; out-of-order
    sources need the watermarked window-join path instead).

    Scale design: state is one 4-long tuple per ACTIVE user — bounded by
    the live-user cardinality, not history; per batch the work is one
    shuffle on ``user_col`` plus an Arrow call per touched user.
    """
    out_schema = (
        "user_id long, session_id long, n_events long, "
        "session_start_us long, session_end_us long"
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        if state.exists:
            sid, start, last, n = state.get
        else:
            sid, start, last, n = 0, None, None, 0
        closed: list[tuple] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values([ts_us_col, order_col])
            for ts in batch[ts_us_col]:
                ts = int(ts)
                if start is None:
                    sid, start, last, n = sid + 1, ts, ts, 1
                elif ts - last > gap_us:
                    closed.append((user, sid, n, start, last))
                    sid, start, last, n = sid + 1, ts, ts, 1
                else:
                    last, n = ts, n + 1
        if start is not None:
            state.update((sid, start, last, n))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id",
                    "session_id",
                    "n_events",
                    "session_start_us",
                    "session_end_us",
                ],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_FUNNEL_STATE = "stage long, t0_us long, t_prev_us long"


def streaming_funnel(
    events: DataFrame,
    steps: "tuple[str, ...]",
    horizon_us: int,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Streaming funnel: advance each user's ordered-step progression
    ACROSS micro-batches and emit one row the moment the LAST step
    matches (append mode — a completion is immutable).

    The ingest twin of ``operators/funnel.py funnel_report``: same greedy
    earliest-completion rule (step i+1 matches the first event of its
    type STRICTLY after the matched step-i event), same horizon flag. On
    an in-order drain the emitted set is exactly the batch rows with
    ``reached == len(steps)`` — partially-progressed users live in state,
    as an open funnel should (production closes them with a timeout).
    Pinned against the batch operator in tests/test_streaming_funnel.py.

    Scale design: state is one 3-long tuple per user still mid-funnel —
    completed users keep a terminal marker; per batch the work is one
    shuffle on ``user_col`` plus an Arrow call per touched user.
    """
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps (got {list(steps)})")
    if horizon_us <= 0:
        raise ValueError(f"horizon_us must be > 0 (got {horizon_us})")
    k = len(steps)
    out_schema = "user_id long, t0_us long, t_end_us long, completed boolean"

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        stage, t0, t_prev = state.get if state.exists else (0, None, None)
        done: list[tuple] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) and stage < k:
            batch = batch.sort_values([ts_us_col, order_col])
            for ts, typ in zip(batch[ts_us_col], batch[type_col]):
                if stage >= k:
                    break
                ts = int(ts)
                if typ != steps[stage]:
                    continue
                if stage > 0 and ts <= t_prev:
                    continue
                if stage == 0:
                    t0 = ts
                stage, t_prev = stage + 1, ts
                if stage == k:
                    done.append((user, t0, ts, ts - t0 <= horizon_us))
        if stage > 0:  # users who matched nothing carry no state
            state.update((stage, t0, t_prev))
        if done:
            yield pd.DataFrame(
                done, columns=["user_id", "t0_us", "t_end_us", "completed"]
            )

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_reservoir(
    rows: DataFrame,
    k: int,
    weight_col: str,
    salt: int = 0,
    id_col: str = "doc_id",
    n_shards: int = 8,
    method: str = "md5",
) -> DataFrame:
    """Streaming A-ES weighted reservoir (Efraimidis & Spirakis 2006 —
    the algorithm's ORIGINAL one-pass streaming setting): maintain the
    top-``k`` rows by the exponential key ln(u)/w across micro-batches,
    with deterministic u so the stream selects exactly what the batch
    operator selects.

    Contract: rows are emitted (append mode) the moment they are
    ADMITTED to their shard's k-row reservoir. Admission is monotone —
    a shard's k-th key only improves — so every row of the final global
    reservoir was necessarily admitted on arrival, and the emitted
    stream is a small superset of it: the exact reservoir is the top-k
    (key DESC, id ASC) over the emitted rows, pinned equal to the batch
    ``weighted_reservoir_sample`` in tests/test_streaming_reservoir.py.
    Rows with non-positive weight never enter (the paper requires
    w > 0).

    Scale design: the key is the same scan-stage column as the batch
    path (``operators.sampling.reservoir_key`` — bit-identical
    selection); state is ≤ k (id, weight, key) triples PER SHARD with
    rows sharded by id hash, so admission pressure spreads over
    ``n_shards`` state partitions instead of one hot key; per batch the
    work is one shuffle on the shard id plus an Arrow call per touched
    shard. Emission volume is bounded by total admissions — O(k·log n)
    expected per shard over the stream's life, not O(n).
    """
    from pyspark.sql import functions as F

    from kinesiscat_spark.operators.sampling import reservoir_key

    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    keyed = rows.filter(F.col(weight_col).cast("double") > 0.0).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(weight_col).cast("long").alias("weight"),
        reservoir_key(id_col, weight_col, salt, method).alias("key"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("shard"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, weights, keys = state.get
            res = [
                (float(kk), int(i), int(w))
                for kk, i, w in zip(keys, ids, weights)
            ]
        else:
            res = []
        # ordering: key DESC, id ASC == sort key (-key, id) ASC
        res.sort(key=lambda t: (-t[0], t[1]))
        out_id, out_w, out_k = [], [], []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                cand = (float(row["key"]), int(row["id"]), int(row["weight"]))
                if len(res) < k or (-cand[0], cand[1]) < (
                    -res[-1][0],
                    res[-1][1],
                ):
                    res.append(cand)
                    res.sort(key=lambda t: (-t[0], t[1]))
                    del res[k:]
                    out_k.append(cand[0])
                    out_id.append(cand[1])
                    out_w.append(cand[2])
        state.update(
            (
                [i for _, i, _ in res],
                [w for _, _, w in res],
                [kk for kk, _, _ in res],
            )
        )
        if out_id:
            yield pd.DataFrame(
                {"id": out_id, "weight": out_w, "key": out_k}
            )

    return keyed.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType="id long, weight long, key double",
        stateStructType="ids array<long>, weights array<long>,"
        " keys array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
