"""Table catalog: parquet scans over the test warehouse + existence probes.

Reference counterparts (SURVEY.md §2.1): S9 SQL table scan
(``metrics.py:17-28``, ``app.py:38-49``), S10 table-existence probe
(``metrics_products.py:22-28``, ``app.py:29-35``), S12 result cache
(``app.py:23,58``).

Scale notes: scans stay declarative (``spark.read.parquet``) so Catalyst
pushes filters/projections into the parquet reader; at 100 TB the same
call reads a partitioned (``year=…``) directory tree and partition pruning
is automatic. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

#: Tables the driver's testdata provides (TESTDATA.md).
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

#: Size-gated hot-table cache (S12 generalized): tables whose on-disk
#: parquet is under this many bytes are ``persist()``-ed per
#: (session, sf_dir, table), so a workload that touches the same small
#: table from many queries scans it once. The gate is deliberately
#: dimension-sized: for a large fact table a columnar parquet scan with
#: pushdown beats a deserialized row cache (measured: caching the
#: 10 MB lineitem regressed sort-heavy queries 2-5× via storage-memory
#: eviction churn), and at warehouse scale a multi-TB fact must stream
#: anyway — the gate is what makes the cache scale-honest.
#: Override via SPARK_GRAFT_HOT_CACHE_BYTES (0 disables).
HOT_CACHE_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_HOT_CACHE_BYTES", str(4 * 1024 * 1024)))

_HOT_CACHE: dict[tuple[str, str, str], DataFrame] = {}

#: Every session-keyed DataFrame memo in the package registers here so
#: eviction/clearing covers them all (queries.base adds its plan and
#: monthly-flows memos on import).
_SESSION_CACHES: list[dict] = [_HOT_CACHE]


def register_session_cache(cache: dict) -> None:
    """Opt a {key-starting-with-app-id: DataFrame} memo into the shared
    eviction sweep below.

    Membership is by IDENTITY: ``in`` would compare dicts by VALUE, and
    two empty memos compare equal — registering a fresh dict while any
    registered memo is empty would silently no-op, exempting it from
    eviction/unpersist forever."""
    if not any(c is cache for c in _SESSION_CACHES):
        _SESSION_CACHES.append(cache)


def session_memo(spark, cache: dict, key_suffix: tuple, build,
                 parquet_name: str | None = None):
    """One implementation of the app-id-keyed lazy memo every
    session-scoped materialized intermediate uses (monthly flows,
    shingle arrays, pair graphs): look up (app_id, *key_suffix) in
    ``cache``, else ``build()``, materialize, store, return. The
    cache must be ``register_session_cache``-ed by its owner.

    Two materialization tiers:

    - default (``parquet_name=None``): ``persist()`` — right for tiny
      frames (monthly flows, k-means assignments) whose recompute is
      one cheap aggregate.
    - ``parquet_name="..."``: write the built frame ONCE to a
      session-scoped parquet directory under the warehouse and memoize
      the READ-BACK scan. For intermediates whose recompute is an
      expensive Python pass (the mapInPandas shingler, the pair-graph
      joins) this removes the BlockManager from the availability story
      entirely: persisted blocks compete with 200+ other queries'
      execution memory and whatever LRU evicts is silently recomputed
      — the r9 bench flagged exactly the shingle/pair-graph consumer
      family (q40 1.1→8.3 s, q41 1.1→14.0 s) under the media family's
      fixture pressure. A columnar re-scan of the materialized table
      is O(100 ms) and, unlike block survival, deterministic. This is
      also the honest 100 TB shape: a real pipeline WRITES its shingle
      table once and every later pass reads it (same contract as the
      persisted MinHash/IVF indexes in operators/*_index.py).
    """
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # Spark Connect has no sparkContext
        app = str(id(spark))
    key = (app, *key_suffix)
    cached = cache.get(key)
    if cached is not None:
        return cached
    if parquet_name is None:
        df = build().persist()
    else:
        df = _materialize_via_warehouse(spark, app, parquet_name,
                                        key_suffix, build)
    cache[key] = df
    return df


def _memo_dir_name(name: str, key_suffix: tuple, app: str) -> str:
    """Directory name for a parquet-tier memo. Sanitizing is lossy
    ('sf0.1' and 'sf0_1' both become 'sf0_1'), so a short hash of the
    RAW key rides along — the path is injective in key_suffix, and two
    sessions can never overwrite each other's live memo files."""
    import hashlib
    import re

    safe = "_".join(re.sub(r"\W", "_", str(p)).strip("_")
                    for p in key_suffix if str(p))
    safe += "_" + hashlib.sha1(
        repr(key_suffix).encode()).hexdigest()[:8]
    own = re.sub(r"\W", "_", app)
    return f"{name}_{safe}_{own}"


def _materialize_via_warehouse(spark, app: str, name: str,
                               key_suffix: tuple, build):
    """Write build() to ``<warehouse>/<name>_<key>_<app>`` and return
    the read-back scan. The directory name ends with the sanitized
    application id (``local_<13-digit start millis>``), the exact shape
    ``sources.sinks.drop_stale_app_tables`` reaps, so abandoned
    generations from dead sessions are bounded by the same janitor the
    bucketed index tables already use (called here at build time)."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = f"{warehouse}/{_memo_dir_name(name, key_suffix, app)}"
    build().write.mode("overwrite").parquet(path)
    try:  # janitor: reap parquet memos of sessions dead > TTL
        from sunat_rree_demo_spark.sources.sinks import (
            drop_stale_app_tables,
        )

        drop_stale_app_tables(spark, f"{name}_")
    except Exception:  # janitor failure must never fail the build
        pass
    return spark.read.parquet(path)


def _session_stopped(df: DataFrame) -> bool:
    try:
        return df.sparkSession.sparkContext._jsc.sc().isStopped()
    except Exception:  # Spark Connect / session already torn down
        return True


def evict_stopped_sessions() -> None:
    """Drop memo entries owned by stopped sessions: their persisted
    blocks died with the executors, so the dict entry is the only leak —
    long-lived processes cycling get_spark()/stop() would otherwise
    accumulate one stale generation per cycle. Runs on every hot-cache
    miss (a handful of py4j liveness probes, driver-side only)."""
    for cache in _SESSION_CACHES:
        for key, df in list(cache.items()):
            if _session_stopped(df):
                cache.pop(key, None)


def clear_caches(unpersist: bool = True) -> None:
    """Explicitly empty every registered memo, unpersisting live
    DataFrames (no-op on never-persisted plan-memo entries) — the
    programmatic reset tests and notebooks need."""
    for cache in _SESSION_CACHES:
        for key, df in list(cache.items()):
            if unpersist:
                try:
                    df.unpersist()
                except Exception:  # session gone → blocks already freed
                    pass
            cache.pop(key, None)


def _session_key(spark: SparkSession) -> str:
    try:
        return spark.sparkContext.applicationId
    except Exception:  # Spark Connect has no sparkContext
        return str(id(spark))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one warehouse table.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (earlier
    testdata) and as TIMESTAMP(MICROS) without a timezone (current);
    vanilla Spark rejects the former and reads the latter as
    TIMESTAMP_NTZ, which time functions like ``unix_millis`` refuse.
    Both variants are normalized here to TIMESTAMP_LTZ under the UTC
    session zone — bit-identical instants to DuckDB's naive TIMESTAMP
    view of the same file, so the oracle agrees either way.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (_session_key(spark), sf_dir, name)
    cached = _HOT_CACHE.get(key)
    if cached is not None:
        return cached
    evict_stopped_sessions()
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # integer division: (ts / 1000) in double loses ulps above
            # 2^53 ns and lands 1 µs off DuckDB's exact conversion
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ micros → LTZ: session TZ is pinned to UTC (session.tune),
            # so the wall-clock reinterpretation is the identity instant
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    if HOT_CACHE_MAX_BYTES > 0 and _path_bytes(path, HOT_CACHE_MAX_BYTES) > 0:
        df = df.persist()
        _HOT_CACHE[key] = df
    return df


def _path_bytes(path: str, cap: int) -> int:
    """On-disk bytes of a parquet file OR partitioned directory tree,
    walking with early exit: returns 0 (→ don't cache) as soon as the
    running total exceeds ``cap``, so probing a 100 TB table costs a few
    stat calls, not a full tree walk."""
    try:
        if os.path.isfile(path):
            size = os.path.getsize(path)
            return size if 0 < size <= cap else 0
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
                if total > cap:
                    return 0
        return total if total > 0 else 0
    except OSError:
        return 0


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view for the SQL entry point (S9)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def table_exists(spark: SparkSession, name: str) -> bool:
    """S10 table-existence probe: ``spark.catalog`` replaces the
    reference's try/except-around-COUNT(*) pattern
    (``metrics_products.py:22-28``)."""
    try:
        return spark.catalog.tableExists(name)
    except Exception:
        return False
