"""media_dir Python DataSource: directory of real (stdlib-built) media
files → MEDIA_SCHEMA rows with sniffed types, partition-per-file-group
planning, and a full read→decode pipeline over the source."""

from __future__ import annotations

import pytest

from tests.test_multimodal import _tiny_gif, _tiny_jpeg, _tiny_png, _tiny_wav


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    from sunat_rree_demo_spark.operators.multimodal import encode_png_gray

    d = tmp_path_factory.mktemp("media_files")
    (d / "a.png").write_bytes(_tiny_png(12, 34))
    (d / "b.jpg").write_bytes(_tiny_jpeg(56, 78))
    (d / "c.gif").write_bytes(_tiny_gif(9, 4))
    (d / "d.wav").write_bytes(_tiny_wav(16000, 1, 16, 1600))
    (d / "e.bin").write_bytes(b"opaque payload")
    (d / "f.png").write_bytes(encode_png_gray(bytes(range(24)), 6))
    return str(d)


def test_media_dir_reads_schema_and_types(spark, media_dir):
    from sunat_rree_demo_spark.sources.media_datasource import (
        MediaDirDataSource,
    )

    spark.dataSource.register(MediaDirDataSource)
    df = (spark.read.format("media_dir")
          .option("path", media_dir).load())
    rows = {r.meta["filename"]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.jpg", "c.gif", "d.wav", "e.bin",
                         "f.png"}
    assert rows["a.png"].media_type == "image/png"
    assert rows["b.jpg"].media_type == "image/jpeg"
    assert rows["c.gif"].media_type == "image/gif"
    assert rows["d.wav"].media_type == "audio/wav"
    assert rows["e.bin"].media_type == "application/octet-stream"
    # planning-time dims ride the meta map (real header parse)
    assert (rows["a.png"].meta["width"],
            rows["a.png"].meta["height"]) == ("12", "34")
    assert rows["b.jpg"].meta["width"] == "56"
    # ids unique, payloads intact
    assert len({r.media_id for r in rows.values()}) == 6
    assert bytes(rows["e.bin"].content) == b"opaque payload"


def test_media_dir_glob_and_pipeline(spark, media_dir):
    """glob filtering + the full source→pixel-stats pipeline: the PNGs
    read from DISK decode to the same stats as their in-memory bytes."""
    from sunat_rree_demo_spark.operators.multimodal import (
        image_pixel_stats,
    )
    from sunat_rree_demo_spark.sources.media_datasource import (
        MediaDirDataSource,
    )

    spark.dataSource.register(MediaDirDataSource)
    pngs = (spark.read.format("media_dir")
            .option("path", media_dir).option("glob", "*.png").load())
    stats = {r.media_id: r for r in image_pixel_stats(pngs).collect()}
    metas = {r.media_id: r.meta["filename"] for r in pngs.collect()}
    assert set(metas.values()) == {"a.png", "f.png"}
    by_name = {metas[k]: v for k, v in stats.items()}
    assert (by_name["a.png"].width, by_name["a.png"].height) == (12, 34)
    assert by_name["a.png"].sum_val == 12 * 34 * 0x7F
    assert by_name["f.png"].sum_val == sum(range(24))
    assert (by_name["f.png"].width, by_name["f.png"].height) == (6, 4)


def test_media_dir_partition_planning(spark, media_dir):
    """files_per_partition controls fan-out; empty dirs read as empty."""
    from sunat_rree_demo_spark.sources.media_datasource import (
        MediaDirDataSource,
        MediaDirReader,
    )

    r = MediaDirReader({"path": media_dir, "files_per_partition": "2"})
    parts = r.partitions()
    assert len(parts) == 3 and all(len(p.paths) == 2 for p in parts)

    spark.dataSource.register(MediaDirDataSource)
    empty = (spark.read.format("media_dir")
             .option("path", media_dir)
             .option("glob", "*.nomatch").load())
    assert empty.count() == 0
