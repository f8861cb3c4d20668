"""Event-time windowed aggregation over streams.

Watermark + window semantics (the part the reference lacks entirely —
SURVEY.md §2.2 "Streaming semantics"): late data within the watermark is
incorporated, later-than-watermark data is dropped, results finalize per
window. Each function takes an (unbounded) streaming DataFrame shaped like
the ``events`` table and returns the transformed streaming DataFrame; the
caller picks the sink/trigger.

Scale notes: streaming state lives in the HDFS/RocksDB state store keyed
by (window, group) — state size is bounded by the watermark horizon, not
the stream length. Aggregations are partial-aggregated before the shuffle
exactly as in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dual of queries/events.py::events_hourly_stats.

    Tumbling (or sliding, if ``slide`` given) event-time windows with
    late-data tolerance = ``watermark``.
    """
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
            "avg_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dual of queries/events.py::user_sessions.

    ``session_window`` merges events whose gaps are < ``gap`` into one
    growing window per user — Spark's native stateful sessionization.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication — the streaming face of the dedup
    operator family (queries/dedup.py): drop repeats of ``keys`` with
    dedup state bounded by the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` so state for a key is evicted
    once the watermark passes it — the formulation that runs forever on an
    unbounded stream (plain ``dropDuplicates`` on a stream grows state
    without bound).
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def purchase_click_interval_join(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to every click by the
    same user in the preceding ``lookback`` interval (strictly earlier).

    The canonical Structured Streaming two-stream join: both sides carry
    watermarks and the join condition bounds event-time distance, so the
    state store retains each side only for watermark + lookback — bounded
    state on an unbounded stream. (The as-of variant — most recent click
    only — is the batch operator queries/events.py::purchase_asof_click;
    streaming emits per-match because append mode can't retract an earlier
    "most recent".)
    """
    purchases, clicks, cond = _interval_join_frames(
        events, lookback, watermark
    )
    joined = purchases.join(clicks, cond)
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def _interval_join_frames(
    events: DataFrame, lookback: str, watermark: str
):
    """(purchases, clicks, condition): the shared operands of the
    inner/left/full interval joins — one projection + watermark per
    side, one band condition, so the three join flavors cannot drift."""
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") < F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}")
        )
    )
    return purchases, clicks, cond


def purchase_click_interval_left_join(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase emits, with
    null click columns when no same-user click preceded it in ``lookback``.

    The semantics inner joins cannot give: "purchases WITHOUT a recent
    click" is exactly the null-extended set. Matched rows emit on match
    like the inner join; null-extended rows emit only when the watermark
    passes the purchase's match window (the state store then knows no
    qualifying click can still arrive) — so run-to-completion equality
    with the batch LEFT JOIN requires the watermark to advance past the
    final real event, which the sentinel-file runner in streaming_ops
    provides. State stays bounded exactly as in the inner join.
    """
    purchases, clicks, cond = _interval_join_frames(
        events, lookback, watermark
    )
    joined = purchases.join(clicks, cond, "leftOuter")
    # Sentinel watermark-advance rows (negative event_ids) flow through to
    # the sink and are dropped by the caller on the batch read-back: a
    # purchase_id >= 0 filter HERE would be pushed below the
    # EventTimeWatermark node and the sentinel would then never advance
    # the purchase-side frontier (measured: the max-ts purchase's null row
    # stays stuck in state forever).
    return joined.select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def user_running_totals(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Custom stateful operator: per-user cumulative purchase totals via
    ``applyInPandasWithState`` — the escape hatch for operators Spark's
    built-in streaming aggregates can't express (reference has nothing
    comparable; this is the §2.4 'custom stateful' extension point).

    Emits one row per user per micro-batch in which that user had events:
    (user_id, batch_events, total_events, total_value) with totals
    accumulated across batches in the state store.
    """
    import pandas as pd  # noqa: F401 — used inside the worker closure

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id bigint, batch_events bigint, total_events bigint, total_value double"
    )
    state_schema = "total_events bigint, total_value double"

    def update(key, pdf_iter, state):
        user_id = key[0]
        batch_n = 0
        batch_v = 0.0
        for pdf in pdf_iter:
            batch_n += len(pdf)
            batch_v += float(pdf["value"].sum())
        if state.exists:
            (tot_n, tot_v) = state.get
        else:
            tot_n, tot_v = 0, 0.0
        tot_n += batch_n
        tot_v += batch_v
        state.update((tot_n, tot_v))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "batch_events": [batch_n],
                "total_events": [tot_n],
                "total_value": [tot_v],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )


def user_daily_totals_closed(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Custom stateful operator with *deterministic* run-to-completion
    output: per-(user, day) totals emitted only once the event-time
    watermark passes the day's end.

    ``applyInPandasWithState`` + ``EventTimeTimeout``, keyed by **user
    only**: the open days of a user live in the state value as parallel
    arrays, new batches merge into them vectorized (one pandas groupby
    per user-batch), and every day whose end the current watermark has
    passed is emitted exactly once and dropped from the arrays. Days the
    final watermark never passes are never emitted, so the output is a
    pure function of the data (finalized groups), not of micro-batch
    boundaries: the shape that gives a custom stateful operator an exact
    batch oracle.

    Keying by user instead of (user, day) matters for throughput: the
    framework pays a Python callback + pandas construction per *group*
    per batch, and distinct (user, day) outnumbers users ~27× in this
    corpus. State stays bounded by the watermark horizon either way —
    closed days leave the arrays the moment the watermark passes them,
    so a user carries only the days still inside the horizon.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id bigint, day date, n_events bigint, total_value double"
    state_schema = "days array<long>, ns array<long>, vs array<double>"
    day_ms = 24 * 3600 * 1000

    def update(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        user_id = key[0]
        days, ns, vs = state.get if state.exists else ([], [], [])
        days = {d: [n, v] for d, n, v in zip(days, ns, vs)}
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                # epoch-day ints; one vectorized groupby per (user, batch)
                ed = (pdf["ts"].values.astype("datetime64[D]")).astype("int64")
                per_day = pd.DataFrame({"d": ed, "v": pdf["value"].values}).groupby("d")["v"]
                cnt, sm = per_day.count(), per_day.sum()
                for d, n, v in zip(cnt.index, cnt.values, sm.values):
                    acc = days.setdefault(int(d), [0, 0.0])
                    acc[0] += int(n)
                    acc[1] += float(v)
        # Emit every day the watermark has strictly passed — the same set
        # a per-(user, day) keying would have emitted via its timeouts
        # (closed days can't receive data: their rows are older than the
        # watermark and already filtered, so emitting them on the data
        # path too only moves the emission to the same batch's start).
        wm = state.getCurrentWatermarkMs()
        closed = sorted(d for d in days if (d + 1) * day_ms < wm)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(closed), user_id, dtype="int64"),
                    "day": [pd.Timestamp(d, unit="D").date() for d in closed],
                    "n_events": np.array([days[d][0] for d in closed], dtype="int64"),
                    "total_value": np.array([days[d][1] for d in closed]),
                }
            )
            for d in closed:
                del days[d]
        if days:
            state.update(
                (list(days), [n for n, _ in days.values()], [v for _, v in days.values()])
            )
            # fire when the watermark passes the earliest open day's end
            state.setTimeoutTimestamp(max((min(days) + 1) * day_ms, wm + 1))
        elif state.exists:
            state.remove()

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def user_daily_totals_closed_tws(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """The same deterministic finalized-(user, day) operator as
    :func:`user_daily_totals_closed`, on the ``transformWithState``
    API — Spark's successor to ``applyInPandasWithState`` for custom
    stateful operators (arbitrary typed state + first-class timers).

    Differences that matter at scale:
    - open days live in a **MapState** (one typed entry per day) instead
      of parallel arrays in one value blob — per-day point updates and
      deletes instead of rewriting the whole user state every batch;
    - day closure uses **registered event-time timers** (one per user,
      at the earliest open day's end) rather than a manually maintained
      timeout timestamp;
    - requires the RocksDB state store (column families), i.e. the
      scale-safe provider is the only provider — see
      session.use_rocksdb_state_store.

    Emission contract is identical: a (user, day) row is emitted exactly
    once, when the watermark strictly passes the day's end — a pure
    function of the data, so the same exact batch oracle applies.
    """
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    out_schema = "user_id bigint, day date, n_events bigint, total_value double"
    day_ms = 24 * 3600 * 1000

    class DailyTotalsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self.handle = handle
            self.days = handle.getMapState("open_days", "day long", "n bigint, v double")

        def _emit_closed(self, user_id: int, wm: int):
            import numpy as np
            import pandas as pd

            closed = sorted(d[0] for d in list(self.days.keys()) if (d[0] + 1) * day_ms < wm)
            if not closed:
                return None
            vals = [self.days.getValue((d,)) for d in closed]
            for d in closed:
                self.days.removeKey((d,))
            return pd.DataFrame(
                {
                    "user_id": np.full(len(closed), user_id, dtype="int64"),
                    "day": [pd.Timestamp(d, unit="D").date() for d in closed],
                    "n_events": np.array([v[0] for v in vals], dtype="int64"),
                    "total_value": np.array([v[1] for v in vals]),
                }
            )

        def _retime(self, wm: int) -> None:
            open_days = [d[0] for d in list(self.days.keys())]
            want = max((min(open_days) + 1) * day_ms, wm + 1) if open_days else None
            for t in list(self.handle.listTimers()):
                if t != want:
                    self.handle.deleteTimer(t)
            if want is not None:
                self.handle.registerTimer(want)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            for pdf in rows:
                ed = pdf["ts"].values.astype("datetime64[D]").astype("int64")
                per_day = pd.DataFrame({"d": ed, "v": pdf["value"].values}).groupby("d")["v"]
                cnt, sm = per_day.count(), per_day.sum()
                for d, n, v in zip(cnt.index, cnt.values, sm.values):
                    k = (int(d),)
                    prev = self.days.getValue(k) if self.days.containsKey(k) else (0, 0.0)
                    self.days.updateValue(k, (int(prev[0]) + int(n), float(prev[1]) + float(v)))
            out = self._emit_closed(key[0], timerValues.getCurrentWatermarkInMs())
            self._retime(timerValues.getCurrentWatermarkInMs())
            if out is not None:
                yield out

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            out = self._emit_closed(key[0], timerValues.getCurrentWatermarkInMs())
            self._retime(timerValues.getCurrentWatermarkInMs())
            if out is not None:
                yield out

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=DailyTotalsProcessor(),
            outputStructType=out_schema,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


def purchase_click_interval_full_join(
    events: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream FULL OUTER interval join: every purchase emits (null
    click columns when nothing preceded it in ``lookback``) AND every
    click emits (null purchase columns when no purchase followed it
    within ``lookback``) — the audit view that answers both "unattributed
    purchases" and "clicks that never converted" in one stream.

    Both null-extension classes are watermark-gated: a side's unmatched
    row emits only when the OTHER side's watermark proves no partner can
    still arrive, so run-to-completion equality with the batch FULL JOIN
    needs the sentinel runner to advance BOTH frontiers past the real
    data. State stays bounded by the interval exactly as in the
    inner/left forms."""
    purchases, clicks, cond = _interval_join_frames(
        events, lookback, watermark
    )
    joined = purchases.join(clicks, cond, "fullOuter")
    # sentinel rows (negative ids, both streams) flow through to the sink
    # and drop on the batch read-back — a filter HERE would push below
    # the EventTimeWatermark nodes (see the left-join note above)
    return joined.select(
        "purchase_id",
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )
