"""Multimodal plumbing tests: binary media columns, Arrow-batched decode
stub, frame sampling."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    from sunat_rree_demo_spark.operators.multimodal import docs_as_media
    from sunat_rree_demo_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    return docs_as_media(docs).cache()


def test_media_schema_and_metadata(media):
    assert dict(media.dtypes)["content"] == "binary"
    row = media.first()
    assert set(row.meta) == {"source", "lang"}


def test_decode_media_stub_features(spark, media):
    from sunat_rree_demo_spark.operators.multimodal import decode_media

    feats = decode_media(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    originals = {r.media_id: bytes(r.content) for r in media.collect()}
    for r in rows[:10]:
        payload = originals[r.media_id]
        assert r.byte_len == len(payload)
        assert r.digest == hashlib.sha256(payload).hexdigest()
        assert r.width == payload[0] + 1 and r.height == payload[-1] + 1


def test_decode_media_real_codec_is_stubbed(media):
    from sunat_rree_demo_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(media, real_codec=True)


def test_frame_sample_offsets(media):
    from sunat_rree_demo_spark.operators.multimodal import frame_sample

    frames = frame_sample(media, every_n_bytes=64)
    one = frames.filter(F.col("media_id") == media.first().media_id).collect()
    assert [r.frame_no for r in sorted(one, key=lambda r: r.frame_no)] == \
        list(range(len(one)))
    assert all(r.offset == r.frame_no * 64 for r in one)
    assert all(r.offset < r.byte_len for r in one)
