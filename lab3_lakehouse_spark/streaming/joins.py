"""Stream-stream joins and streaming deduplication (Structured
Streaming surface the batch operators can't stand in for).

- ``interval_join``: inner join of two event streams on a key plus an
  event-time interval (right.ts ∈ [left.ts - lookback, left.ts]).
  Watermarks on BOTH sides bound the buffered state: Spark keeps only
  rows young enough to still find a partner, evicting as the watermarks
  advance — without the time bound, stream-stream join state grows
  forever.
- ``dedup_stream``: exact streaming dedup by key with a watermark-bound
  state (the training-pipeline "have I seen this doc id" filter). State
  is O(distinct keys within the watermark horizon), not O(stream).

Batch/stream parity: the same join/dropDuplicates expressions on static
DataFrames give the batch semantics; tests diff the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lookback: str = "1 hour",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream join: pairs where the right event happened in
    ``[left_ts - lookback, left_ts]`` for the same key."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return l.join(r, on=cond, how="inner")


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins; state
    for keys older than the watermark horizon is evicted."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)


def throttle_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Streaming debounce — the stream COUSIN of the batch
    ``operators/events.throttle``: ``dropDuplicatesWithinWatermark``
    keeps one event per key within the watermark delay, then forgets
    the key, so the SAME key may re-emit once its earlier state ages
    past the horizon. State is O(keys active inside the delay), which
    is what makes per-key rate-limiting affordable on an infinite
    stream.

    The two operators agree exactly only when bursts are separated by
    more than the gap/delay: under a SUSTAINED sub-gap storm the batch
    LAG formulation suppresses everything after the storm's first
    event (each raw event resets the clock), while this one re-emits
    once per state expiration — last-KEPT-event semantics. See the
    batch docstring for the full contrast.

    Eviction timing matters (pinned by the planted test): dedup is a
    key-existence lookup, and expired state is cleaned up at the END of
    a micro-batch — so a key re-emits only in a batch that starts
    AFTER some earlier batch's watermark passed the key's expiration.
    On an infinite stream that's the steady state; in bounded tests it
    takes an intervening watermark-advancing batch.

    Not in the oracle registry: which physical row survives inside a
    cluster depends on micro-batch arrival order (the retained COUNT is
    only deterministic when clusters are separated by more than the
    delay — exactly what the planted unit test pins); the batch twin
    carries the cross-engine contract.
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
