"""Tag dictionary (reference config.h:122-123, types.h:32-33): build,
stable extension, encode/decode round-trip, string tags_any through the
collection query paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from write_optimized_vector_database_spark.collection import VectorCollection
from write_optimized_vector_database_spark.operators.tags import (
    build_tag_dictionary,
    decode_tags,
    encode_tags,
    extend_tag_dictionary,
    lookup_tag_ids,
    tags_any_strings_filter,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, tags array<string>")


def test_build_dict_dense_alphabetical(spark):
    df = _df(spark, [(1, ["b", "a"]), (2, ["c", "a"])])
    d = {r.tag: r.tag_id for r in build_tag_dictionary(df).collect()}
    assert d == {"a": 0, "b": 1, "c": 2}


def test_build_dict_cap(spark):
    df = _df(spark, [(1, [f"t{i}" for i in range(10)])])
    with pytest.raises(ValueError, match="tag_dict_size"):
        build_tag_dictionary(df, max_size=5)


def test_extend_keeps_existing_ids(spark):
    base = build_tag_dictionary(_df(spark, [(1, ["m", "z"])]))
    ext = extend_tag_dictionary(base, _df(spark, [(2, ["a", "m"])]))
    d = {r.tag: r.tag_id for r in ext.collect()}
    # m/z keep their original ids; the novel 'a' appends AFTER them
    assert d == {"m": 0, "z": 1, "a": 2}


def test_encode_decode_roundtrip_preserves_order(spark):
    df = _df(spark, [(1, ["b", "a", "c"]), (2, []), (3, ["c"])])
    td = build_tag_dictionary(df)
    enc = encode_tags(df, td, id_col="id")
    got = {r.id: r.tags for r in enc.collect()}
    assert got[1] == [1, 0, 2]  # positional order kept, not sorted
    assert got[2] == []
    dec = decode_tags(enc, td, id_col="id")
    back = {r.id: r.tags for r in dec.collect()}
    assert back == {1: ["b", "a", "c"], 2: [], 3: ["c"]}


def test_unknown_tags_dropped_on_encode(spark):
    td = build_tag_dictionary(_df(spark, [(1, ["a"])]))
    enc = encode_tags(_df(spark, [(9, ["a", "zzz"])]), td, id_col="id")
    assert enc.collect()[0].tags == [0]


def test_string_filter_and_lookup(spark):
    df = _df(spark, [(1, ["red", "hot"]), (2, ["blue"]), (3, ["hot"])])
    td = build_tag_dictionary(df)
    enc = encode_tags(df, td, id_col="id")
    assert lookup_tag_ids(td, ["hot"]) == [1]
    kept = {r.id for r in enc.filter(tags_any_strings_filter(td, ["hot"])).collect()}
    assert kept == {1, 3}
    # wholly-unknown query tags match nothing (not everything)
    assert enc.filter(tags_any_strings_filter(td, ["nope"])).count() == 0
    with pytest.raises(ValueError, match="max_tags_per_vector"):
        lookup_tag_ids(td, ["t"] * 17)


def test_collection_string_tag_ingest_and_query(spark, tmp_path):
    """End to end: string tags at ingest are dict-encoded in storage;
    string tags_any at query time resolves through the persisted dict."""
    c = VectorCollection(spark, str(tmp_path / "c"), metric="ip")
    rows = [
        ("UPSERT", i, "t0", "ns", [float(i), 1.0], ["even" if i % 2 == 0 else "odd", "all"], i)
        for i in range(10)
    ]
    batch = spark.createDataFrame(
        rows,
        "op string, id long, tenant string, namespace string, "
        "vector array<float>, tags array<string>, epoch long",
    )
    c.ingest(batch)
    # storage holds ints, dict persisted: all=0, even=1, odd=2
    stored = c.current().select("id", "tags").collect()
    assert all(all(isinstance(t, int) for t in r.tags) for r in stored)
    d = {r.tag: r.tag_id for r in c.tag_dict().collect()}
    assert d == {"all": 0, "even": 1, "odd": 2}
    # second batch with a novel tag keeps old ids stable
    batch2 = spark.createDataFrame(
        [("UPSERT", 100, "t0", "ns", [0.5, 1.0], ["brand_new"], 100)],
        batch.schema,
    )
    c.ingest(batch2)
    d2 = {r.tag: r.tag_id for r in c.tag_dict().collect()}
    assert d2 == {"all": 0, "even": 1, "odd": 2, "brand_new": 3}
    # string tags_any through the exact path
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<float>")
    out = c.topk(q, k=3, tags_any=["even"]).collect()
    assert out and all(r.vec_id % 2 == 0 for r in out)
