"""Interchange round-trips: JSONL/CSV writes must come back value- and
schema-identical (sources/formats.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.sources.formats import (
    export_changelog_jsonl,
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from write_optimized_vector_database_spark.sources.tables import load_table


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_jsonl_round_trip_with_vectors(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "emb_jsonl")
    write_jsonl(emb, path)
    back = read_jsonl(spark, path, emb.schema)
    assert back.schema == emb.schema
    assert _sorted_rows(back, "vec_id") == _sorted_rows(emb, "vec_id")


def test_csv_round_trip_flat(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_csv")
    write_csv(docs, path)
    back = read_csv(spark, path, docs.schema)
    assert back.schema == docs.schema
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_csv_refuses_nested_columns(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="embedding"):
        write_csv(emb, str(tmp_path / "nope"))


def test_changelog_jsonl_export_replays(spark, sf_dir, tmp_path):
    from write_optimized_vector_database_spark.operators.changelog import (
        synthetic_changelog,
    )
    from write_optimized_vector_database_spark.operators.compaction import visible

    log = synthetic_changelog(spark, sf_dir)
    path = str(tmp_path / "wal_jsonl")
    export_changelog_jsonl(log, path)
    replayed = read_jsonl(spark, path, log.schema)
    # the replayed WAL must produce the identical visible state
    want = {(r.id, r.epoch) for r in visible(log).select("id", "epoch").collect()}
    got = {(r.id, r.epoch) for r in visible(replayed).select("id", "epoch").collect()}
    assert got == want
