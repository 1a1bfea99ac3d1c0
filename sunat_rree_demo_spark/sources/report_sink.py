"""Python DataSource WRITER (Spark 4): a JSONL report sink with the
real two-phase commit protocol — ``df.write.format("jsonl_report")``.

The reference emits report artifacts driver-side (plans/eda.py mirrors
that for parity). This is the distributed form of the report/export
sink (SURVEY.md §2.1 S11 family): every partition serializes its own
rows ON AN EXECUTOR into a uniquely-named temp file, returns the name
as its commit message, and the driver's ``commit`` publishes exactly
the acknowledged files (abort removes stragglers) — so a task retry or
a speculative duplicate can never leave a half-written or doubled
shard in the output, and nothing row-sized ever moves through the
driver.

``path`` must be a filesystem SHARED by executors and driver (NFS /
fuse-mounted object store / local mode): the rename-to-publish step
runs driver-side against the same directory the executor tasks wrote.
On a cluster without a shared mount, point it at the mounted store or
use the built-in distributed writers — this module demonstrates the
COMMIT PROTOCOL of the Python DataSource API, which is
filesystem-agnostic; the paths here are not.

Usage::

    spark.dataSource.register(JsonlReportDataSource)
    (df.write.format("jsonl_report").mode("overwrite")
       .option("path", out_dir).save())
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class JsonlReportWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_report requires option('path', …)")
        self.overwrite = overwrite

    def write(self, iterator):
        """Runs per partition on an executor: stream rows into one
        uniquely-named shard (the uuid keeps retries/speculative twins
        from colliding; only the acknowledged name gets published)."""
        os.makedirs(self.path, exist_ok=True)
        name = f"_tmp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), sort_keys=True,
                                    default=str) + "\n")
                n += 1
        return _ShardCommit(name, n)

    def commit(self, messages):
        """Driver-side publish: rename exactly the acknowledged temp
        shards to their final names and drop everything else — the
        atomic-visibility half of the protocol. Overwrite clears the
        previous run's published shards; append numbers new shards
        after the existing ones (a zero-task write still publishes an
        empty-but-valid result)."""
        os.makedirs(self.path, exist_ok=True)
        existing = sorted(f for f in os.listdir(self.path)
                          if f.startswith("part-"))
        if self.overwrite:
            for f in existing:
                os.remove(os.path.join(self.path, f))
            offset = 0
        else:
            offset = len(existing)
        for i, m in enumerate(messages):
            os.replace(os.path.join(self.path, m.filename),
                       os.path.join(self.path,
                                    f"part-{offset + i:05d}.jsonl"))
        for f in os.listdir(self.path):
            if f.startswith("_tmp-"):
                os.remove(os.path.join(self.path, f))
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps(
                {"shards": offset + len(messages),
                 "rows": sum(m.n_rows for m in messages)}))

    def abort(self, messages):
        if os.path.isdir(self.path):
            for f in os.listdir(self.path):
                if f.startswith("_tmp-"):
                    os.remove(os.path.join(self.path, f))


class JsonlReportDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_report"

    def writer(self, schema, overwrite: bool) -> JsonlReportWriter:
        return JsonlReportWriter(self.options, overwrite)
