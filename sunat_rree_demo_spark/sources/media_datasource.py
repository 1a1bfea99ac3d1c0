"""Spark-native media-directory source via the Python DataSource API
(Spark 4): ``spark.read.format("media_dir")`` over a directory of image
/audio/opaque files, planned as ONE INPUT PARTITION PER FILE GROUP, each
row in the canonical MEDIA_SCHEMA (operators/multimodal.py) — the
ingestion edge of the multimodal family: payloads load on EXECUTORS
(never through the driver), media_type sniffs from the real magic bytes
(the same stdlib parsers ``decode_dims``/``decode_audio_meta`` use),
and the meta map carries filename + sniffed dimensions so downstream
``image_pixel_stats``/``decode_media`` can route without re-probing.

Usage::

    spark.dataSource.register(MediaDirDataSource)
    df = (spark.read.format("media_dir")
          .option("path", "/data/crawl_images")
          .option("glob", "*.png")              # optional, default '*'
          .option("files_per_partition", "64")  # optional, default 64
          .load())

Scale notes: planning lists the directory once (names + sizes only —
no payload I/O on the driver); files group into fixed-size partitions
so a million-file drop fans out evenly; each task reads only its own
files. For object stores the same structure applies with the listing
swapped for the store's paginated API.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from sunat_rree_demo_spark.operators.multimodal import MEDIA_SCHEMA


#: re-exported from the multimodal module — one source of truth for
#: magic-byte signatures (review finding r6: duplicating them here
#: meant codec fixes needed synchronized edits in two files)
from sunat_rree_demo_spark.operators.multimodal import (  # noqa: E402
    sniff_media_type,
)


class FileGroupPartition(InputPartition):
    def __init__(self, paths: list[str], start_id: int):
        self.paths, self.start_id = paths, start_id


class MediaDirReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("media_dir needs option('path', directory)")
        self.glob = options.get("glob", "*")
        self.per_part = int(options.get("files_per_partition", "64"))
        if self.per_part < 1:
            raise ValueError(
                f"files_per_partition must be >= 1, got {self.per_part}")

    def partitions(self):
        import glob as globmod
        import os

        files = sorted(
            p for p in globmod.glob(os.path.join(self.path, self.glob))
            if os.path.isfile(p))
        return [FileGroupPartition(files[i:i + self.per_part], i)
                for i in range(0, len(files), self.per_part)] \
            or [FileGroupPartition([], 0)]

    def read(self, partition: FileGroupPartition):
        import os

        from sunat_rree_demo_spark.operators.multimodal import decode_dims

        for offset, path in enumerate(partition.paths):
            with open(path, "rb") as fh:
                payload = fh.read()
            dims = decode_dims(payload)
            meta = {"filename": os.path.basename(path),
                    "byte_len": str(len(payload))}
            if dims:
                meta["width"], meta["height"] = str(dims[0]), str(dims[1])
            yield (partition.start_id + offset, payload,
                   sniff_media_type(payload), meta)


class MediaDirDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "media_dir"

    def schema(self):
        return MEDIA_SCHEMA

    def reader(self, schema) -> MediaDirReader:
        return MediaDirReader(self.options)
