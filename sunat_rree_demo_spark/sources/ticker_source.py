"""Streaming Python DataSource (Spark 4): a deterministic synthetic
trade ticker — completes the custom-source matrix (batch reader
``trade_xlsx``, batch writer ``jsonl_report``, and now a micro-batch
STREAM source with real offset tracking).

The source emits ``rows_per_batch`` trade ticks per micro-batch, each
derived purely from its global row index by sha-256 (no RNG state, no
wall clock), so any offset range replays bit-identically — which is
exactly what Structured Streaming's exactly-once contract requires of
a source: ``read`` is planned from a start offset, and a checkpoint
recovery calls ``readBetweenOffsets`` with the SAME range and must get
the SAME rows.

Usage::

    spark.dataSource.register(TradeTickerDataSource)
    s = (spark.readStream.format("trade_ticker")
         .option("rows_per_batch", 100).load())

Offsets are ``{"index": N}`` — the count of rows emitted so far.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TICKER_SCHEMA = StructType([
    StructField("tick_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("flow", StringType()),
    StructField("category", StringType()),
    StructField("usd", DoubleType()),
])

#: event-time epoch: tick i carries ts = _EPOCH + i seconds — a
#: deterministic clock, so watermarked windows over the stream have a
#: batch-computable expectation.
_EPOCH = 1704067200  # 2024-01-01T00:00:00Z

_CATEGORIES = ("minerals", "agro", "textiles", "chemicals", "machinery")


def tick_row(i: int):
    """Deterministic tick for global row index i (pure function of i —
    the replay guarantee). Engine-neutral: sha-256 of the decimal
    index, like the engine's other content hashes."""
    import datetime

    h = hashlib.sha256(f"tick:{i}".encode()).digest()
    ts = datetime.datetime.fromtimestamp(_EPOCH + i,
                                         tz=datetime.timezone.utc)
    flow = "export" if h[0] % 2 == 0 else "import"
    cat = _CATEGORIES[h[1] % len(_CATEGORIES)]
    usd = round(int.from_bytes(h[2:6], "big") / 100.0, 2)
    return (i, ts, flow, cat, usd)


class TickerStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = start["index"]
        e = s + self.rows_per_batch
        return (iter([tick_row(i) for i in range(s, e)]), {"index": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        # checkpoint replay: MUST reproduce the committed batch exactly
        return iter([tick_row(i)
                     for i in range(start["index"], end["index"])])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: rows are derived, not buffered


class TradeTickerDataSource(DataSource):
    """``spark.readStream.format("trade_ticker")``."""

    @classmethod
    def name(cls) -> str:
        return "trade_ticker"

    def schema(self):
        return TICKER_SCHEMA

    def simpleStreamReader(self, schema):
        return TickerStreamReader(self.options)


def expected_ticks(n: int) -> list:
    """First n rows the source will ever emit (test golden)."""
    return [tick_row(i) for i in range(n)]


__all__ = ["TradeTickerDataSource", "TICKER_SCHEMA", "expected_ticks",
           "tick_row"]
