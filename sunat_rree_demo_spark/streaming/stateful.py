"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.10 extension surface — arbitrary per-key state beyond what
windows/dropDuplicates express).

State design for scale: state lives in the state store keyed by the
group; each micro-batch touches only keys present in the batch. Keep the
state payload O(1) per key (here: Welford triples / counters) — never
accumulate raw events into state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, mean) maintained across
    micro-batches — the canonical custom-stateful shape. Emits one
    updated summary row per user per batch (output mode 'update')."""
    import pandas as pd

    out_schema = "user_id bigint, n_events bigint, total_value double, mean_value double"
    state_schema = "n bigint, s double"

    def fn(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(s, 2)],
            "mean_value": [round(s / n, 4) if n else None],
        })

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                GroupStateTimeout.NoTimeout)
    )


def anomaly_flags(events: DataFrame, sigma: float = 3.0,
                  min_history: int = 10) -> DataFrame:
    """Streaming anomaly detector: flag events deviating more than
    ``sigma`` running standard deviations from the user's own history
    (Welford's online algorithm in O(1) state per user — the streaming
    counterpart of the batch σ-outlier operator Y1)."""
    import math

    import pandas as pd

    out_schema = "user_id bigint, event_id bigint, value double, zscore double"
    state_schema = "n bigint, mean double, m2 double"

    def fn(key, pdfs, state: GroupState):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        flagged = {"user_id": [], "event_id": [], "value": [], "zscore": []}
        for pdf in pdfs:
            for eid, v in zip(pdf["event_id"], pdf["value"]):
                v = float(v)
                # n >= 2 floor: var needs two observations; a caller's
                # min_history=1 would otherwise divide by zero on a
                # user's second event
                if n >= max(min_history, 2):
                    var = m2 / (n - 1)
                    std = math.sqrt(var) if var > 0 else 0.0
                    if std > 0 and abs(v - mean) > sigma * std:
                        flagged["user_id"].append(key[0])
                        flagged["event_id"].append(int(eid))
                        flagged["value"].append(v)
                        flagged["zscore"].append(round((v - mean) / std, 4))
                n += 1
                delta = v - mean
                mean += delta / n
                m2 += delta * (v - mean)
        state.update((n, mean, m2))
        yield pd.DataFrame(flagged)

    return (
        events.select("user_id", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                GroupStateTimeout.NoTimeout)
    )


def heavy_hitters(events: DataFrame, k: int = 8) -> DataFrame:
    """Streaming heavy hitters per event_type: which users dominate a
    stream, maintained in O(k) state per key via the Misra-Gries
    summary (Misra & Gries 1982; the "frequent" algorithm behind
    space-saving sketches). Guarantees after N items: every user with
    true count > N/(k+1) is IN the summary, and each kept counter c
    satisfies true − N/(k+1) ≤ c ≤ true — an underestimate with a
    bounded gap, the right trade for alerting on dominant keys without
    per-user state.

    State is exactly (k user ids, k counters, N) per event_type —
    independent of user cardinality, the whole point at 100 TB/day:
    per-user running counts (running_user_stats) keep state linear in
    users; this keeps it constant. Emits the current summary each
    batch (output mode 'update')."""
    import pandas as pd

    out_schema = ("event_type string, user_id bigint, est_count bigint, "
                  "n_total bigint")
    state_schema = "ids array<bigint>, counts array<bigint>, n bigint"

    def fn(key, pdfs, state: GroupState):
        if state.exists:
            ids, counts, n = state.get
            summary = dict(zip(ids, counts))
        else:
            summary, n = {}, 0
        for pdf in pdfs:
            for uid in pdf["user_id"]:
                uid = int(uid)
                n += 1
                if uid in summary:
                    summary[uid] += 1
                elif len(summary) < k:
                    summary[uid] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    summary = {u: c - 1 for u, c in summary.items()
                               if c > 1}
        state.update((list(summary), [summary[u] for u in summary], n))
        out = sorted(summary.items(), key=lambda uc: (-uc[1], uc[0]))
        yield pd.DataFrame({
            "event_type": [key[0]] * len(out),
            "user_id": [u for u, _ in out],
            "est_count": [c for _, c in out],
            "n_total": [n] * len(out),
        })

    return (
        events.select("event_type", "user_id")
        .groupBy("event_type")
        .applyInPandasWithState(fn, out_schema, state_schema, "update",
                                GroupStateTimeout.NoTimeout)
    )


def category_running_totals(ticks: DataFrame) -> DataFrame:
    """Per-category running trade totals via Spark 4's
    ``transformWithStateInPandas`` — the NEW arbitrary-state API
    (StatefulProcessor + typed state handles), demonstrated alongside
    the classic ``applyInPandasWithState`` ops above: a ValueState
    holds (n_ticks, cents) per category and every micro-batch emits
    the updated running row.

    Integer cents keep the running sum exact under any batch split
    (the same discipline as the batch side). Requires the RocksDB
    state store provider (transformWithState's backing store —
    ``spark.sql.streaming.stateStore.providerClass``) AND
    ``google.protobuf`` for the driver-side streaming runner; this
    container ships without protobuf, so the e2e test skips there —
    the plumbing is exercised up to query start and runs fully on a
    stock Spark 4 deployment.

    Scale shape: state is one (bigint, bigint) pair per category —
    O(|categories|), bounded forever; each micro-batch shuffles once
    on the category key."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType([
        T.StructField("category", T.StringType()),
        T.StructField("n_ticks", T.LongType()),
        T.StructField("total_usd", T.DoubleType()),
    ])

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals",
                T.StructType([T.StructField("n", T.LongType()),
                              T.StructField("cents", T.LongType())]))

        def handleInputRows(self, key, rows, timerValues):
            n, cents = 0, 0
            if self._state.exists():
                n, cents = self._state.get()
            for pdf in rows:
                n += len(pdf)
                # exact cents per tick: usd is a 2dp double by
                # construction, so round(x*100) is the integer it means
                cents += int((pdf["usd"] * 100).round().astype("int64")
                             .sum())
            self._state.update((n, cents))
            yield pd.DataFrame({"category": [key[0]], "n_ticks": [n],
                                "total_usd": [cents / 100.0]})

        def close(self) -> None:
            pass

    return (
        ticks.groupBy("category")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )
