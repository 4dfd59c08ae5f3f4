"""Multimodal plumbing: blob stats, deterministic fake decode, feature
extraction, frame sampling ([EXT] — SURVEY §2 multimodal mandate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.operators import multimodal as MM
from write_optimized_vector_database_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def blobs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", MM.blob_column("text").alias("blob")).cache()


def test_blob_stats(blobs):
    out = MM.blob_stats(blobs).collect()
    assert all(r.blob_size == len(bytes(r.blob)) for r in out)
    assert all(len(r.blob_md5) == 32 for r in out)


def test_decode_image_is_stubbed_without_codec(blobs):
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG1234")


def test_fake_decode_meta_deterministic(spark, blobs):
    a = {r.doc_id: r.meta for r in MM.with_decoded_meta(blobs).collect()}
    b = {r.doc_id: r.meta for r in MM.with_decoded_meta(blobs).collect()}
    assert a == b
    m = next(iter(a.values()))
    assert 64 <= m.width < 256 and 64 <= m.height < 256 and 1 <= m.n_channels <= 3


def test_byte_histogram_features_shape(blobs):
    feats = MM.byte_histogram_features(blobs).collect()
    assert all(len(r.features) == MM.FEATURE_DIM for r in feats)
    for r in feats[:10]:
        assert abs(sum(r.features) - 1.0) < 1e-5  # normalized histogram


def test_frame_sample_fanout(blobs):
    frames = MM.frame_sample(blobs, n_frames=4)
    counts = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in counts)
    assert frames.count() == blobs.count() * 4


def test_sniff_mime():
    assert MM.sniff_mime(b"\x89PNGxxxx") == "image/png"
    assert MM.sniff_mime(b"\xff\xd8\xffxx") == "image/jpeg"
    assert MM.sniff_mime(b"plain text") == "application/octet-stream"
    assert MM.sniff_mime(b"") == "application/octet-stream"
