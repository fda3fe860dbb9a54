"""Custom stateful streaming operator — cross-batch first-arrival dedup.

Reference analogue: the rejected/success stores that persist across runs so a
file seen once is never reprocessed (reference config/config.yml:33-36,80-84
— `store_modified_files_only` + rejected short-circuit), recast with
Structured Streaming state instead of bookmark files.

``dedup_first_arrival`` keeps one state cell per url holding the first-seen
``warc_ts``; re-arrivals inside the state horizon emit nothing (or, with
``emit_updates=True``, an update row flagged ``is_rearrival``).  Unlike
``dropDuplicatesWithinWatermark`` this keeps the *payload decision* of the
first arrival and gives per-key control (e.g. admit re-arrivals whose content
hash changed — the md5-compare semantics of the reference).

State is bounded by processing-time timeout: a url idle longer than
``ttl_minutes`` is evicted (at crawl scale the state store holds only the
active horizon, same role as the watermark in the stateless variant).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("is_rearrival", T.BooleanType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("first_ts", T.LongType()),      # epoch micros of first arrival
    T.StructField("content_md5", T.StringType()),  # md5 of first payload
])


def _first_arrival_fn(emit_updates: bool, ttl_minutes: int | None):
    import hashlib

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            if state.hasTimedOut:
                state.remove()
            return iter(())
        rows = rows.sort_values("warc_ts", ignore_index=True)

        def md5_of(r) -> str:
            payload = r["html"] if r["html"] is not None else (
                r["text"].encode("utf-8") if r["text"] is not None else b"")
            return hashlib.md5(bytes(payload)).hexdigest()

        # re-arrival chain semantics ("emit only if content changed") reduce
        # to collapsing consecutive equal md5s: a skipped row always equals
        # the running hash, so after any row i the running hash == md5[i] and
        # row i emits iff md5[i] != md5[i-1] — one vectorized compare, no
        # per-row python loop
        md5s = rows.apply(md5_of, axis=1)
        is_new_key = not state.exists
        if is_new_key:
            first_ts = int(rows["warc_ts"].iloc[0].value // 1000)
            prev = md5s.shift(1)  # row 0 emits: NaN != md5
        else:
            first_ts, content_md5 = state.get
            prev = md5s.shift(1, fill_value=content_md5)
        changed = md5s.ne(prev)
        mask = changed | emit_updates
        out = rows[mask].copy()
        out["is_rearrival"] = True
        if is_new_key:
            out.iloc[0, out.columns.get_loc("is_rearrival")] = False
        state.update((first_ts, md5s.iloc[-1]))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if out.empty:
            return iter(())
        return iter([out[[f.name for f in OUTPUT_SCHEMA]]])

    return fn


def dedup_first_arrival(stream: DataFrame, emit_updates: bool = False,
                        ttl_minutes: int | None = None) -> DataFrame:
    """Streaming DataFrame -> first-arrival-per-url stream (content-aware).

    ``ttl_minutes=None`` keeps state forever (NoTimeout) — right for bounded
    replays and availableNow runs (a processing-time timeout keeps the query
    scheduling wake-up batches, so an availableNow trigger never drains).
    Set a TTL for continuous deployments to bound the state store."""
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_minutes
               else GroupStateTimeout.NoTimeout)
    return stream.groupBy("url").applyInPandasWithState(
        _first_arrival_fn(emit_updates, ttl_minutes),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
