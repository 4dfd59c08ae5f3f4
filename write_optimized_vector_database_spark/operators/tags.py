"""Tag dictionary — string tags ↔ dense uint32 dict ids.

Reference (/root/reference/src/cpp/core/config.h:122-123: tag_dict_size
50 000, max_tags_per_vector 16; /root/reference/include/woved/types.h:32-33:
`using Tag = uint32_t` with a string→Tag dictionary at the edge): users
ingest STRING tags; the engine stores only dense integer ids and keeps
the ≤50k-entry dictionary as a side table.

Spark design:
- the dictionary is a tiny DataFrame (tag, tag_id) — dense ids assigned
  by alphabetical row_number so rebuilds are deterministic and the
  DuckDB oracle can reproduce them;
- encode is posexplode → **broadcast** dict join → re-group ordered by
  element position: one narrow shuffle on the row id, never on the
  dictionary; at 100 TB the dict stays ≤50k rows (~1 MB) and rides the
  broadcast path, exactly the reference's in-memory dict;
- query-side `tags_any` strings become a ≤16-element literal id array
  (driver-side lookup against the broadcast-collected dict), so the
  stored-side filter stays the same pushdown-friendly `arrays_overlap`
  used for int tags.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TAG_DICT_SIZE = 50_000  # reference config.h:122
MAX_TAGS_PER_VECTOR = 16  # reference config.h:123


def build_tag_dictionary(
    df: DataFrame, tags_col: str = "tags", max_size: int = TAG_DICT_SIZE
) -> DataFrame:
    """Distinct string tags → dense ids (tag, tag_id), alphabetical.

    Raises if the vocabulary exceeds `max_size` (config.h:122) — the
    reference rejects new tags past the cap rather than silently
    growing an unbounded dictionary.
    """
    from pyspark.sql import Window

    distinct = df.select(F.explode(tags_col).alias("tag")).distinct()
    n = distinct.count()
    if n > max_size:
        raise ValueError(f"tag vocabulary {n} exceeds tag_dict_size={max_size}")
    w = Window.orderBy("tag")  # dict is ≤50k rows — single-task sort is fine
    return distinct.withColumn(
        "tag_id", (F.row_number().over(w) - 1).cast("int")
    )


def extend_tag_dictionary(
    existing: DataFrame | None,
    df: DataFrame,
    tags_col: str = "tags",
    max_size: int = TAG_DICT_SIZE,
) -> DataFrame:
    """Add a batch's novel tags to an existing dictionary WITHOUT
    renumbering: already-assigned ids are immutable (encoded data on
    disk references them); new tags get dense ids after the current max,
    alphabetical among themselves, so any replay of the same batch
    sequence rebuilds the identical dictionary."""
    from pyspark.sql import Window

    if existing is None:
        return build_tag_dictionary(df, tags_col, max_size)
    novel = (
        df.select(F.explode(tags_col).alias("tag"))
        .distinct()
        .join(existing.select("tag"), "tag", "anti")
    )
    base = existing.agg(F.max("tag_id")).collect()[0][0]
    base = -1 if base is None else int(base)
    n_new = novel.count()
    if n_new == 0:
        return existing
    n_total = existing.count() + n_new
    if n_total > max_size:
        raise ValueError(f"tag vocabulary {n_total} exceeds tag_dict_size={max_size}")
    w = Window.orderBy("tag")
    appended = novel.withColumn(
        "tag_id", (F.row_number().over(w) + base).cast("int")
    )
    return existing.select("tag", "tag_id").unionByName(appended)


def encode_tags(
    df: DataFrame,
    tag_dict: DataFrame,
    id_col: str,
    tags_col: str = "tags",
    out_col: str | None = None,
) -> DataFrame:
    """Replace an `array<string>` tags column with `array<int>` dict ids,
    preserving element order. Out-of-dictionary tags are dropped (the
    reference's dict rejects unknown tags at the edge).

    Rows whose tag array is empty keep an empty array.
    """
    out_col = out_col or tags_col
    pos = df.select(id_col, F.posexplode(tags_col).alias("pos", "tag"))
    enc = (
        pos.join(F.broadcast(tag_dict), "tag")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tag_id"))),
                lambda x: x.getField("tag_id"),
            ).alias("__enc_tags")
        )
    )
    return (
        df.join(enc, id_col, "left")
        .withColumn(
            out_col,
            F.coalesce(F.col("__enc_tags"), F.array().cast("array<int>")),
        )
        .drop("__enc_tags")
    )


def decode_tags(
    df: DataFrame, tag_dict: DataFrame, id_col: str, tags_col: str = "tags"
) -> DataFrame:
    """Inverse of encode_tags: `array<int>` ids back to `array<string>`
    (QueryResult carries decoded tags for the user, types.h:81)."""
    pos = df.select(id_col, F.posexplode(tags_col).alias("pos", "tag_id"))
    dec = (
        pos.join(F.broadcast(tag_dict), "tag_id")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tag"))),
                lambda x: x.getField("tag"),
            ).alias("__dec_tags")
        )
    )
    return (
        df.join(dec, id_col, "left")
        .withColumn(
            tags_col,
            F.coalesce(F.col("__dec_tags"), F.array().cast("array<string>")),
        )
        .drop("__dec_tags")
    )


def lookup_tag_ids(tag_dict: DataFrame, tags: list[str]) -> list[int]:
    """Driver-side string→id lookup for the query edge (≤16 tags per
    request, config.h:123 — a bounded collect by construction)."""
    if len(tags) > MAX_TAGS_PER_VECTOR:
        raise ValueError(
            f"{len(tags)} query tags exceeds max_tags_per_vector={MAX_TAGS_PER_VECTOR}"
        )
    rows = tag_dict.filter(F.col("tag").isin(list(tags))).select("tag_id").collect()
    return sorted(r.tag_id for r in rows)


def tags_any_strings_filter(tag_dict: DataFrame, tags_any: list[str]) -> Column:
    """String-tag ANY-of filter: translate through the dictionary, then
    the same `arrays_overlap` pushdown filter the int path uses. Unknown
    query tags translate to nothing and so never match."""
    ids = lookup_tag_ids(tag_dict, tags_any)
    if not ids:
        return F.lit(False)  # no known tag can match
    return F.arrays_overlap(F.col("tags"), F.array(*[F.lit(int(t)) for t in ids]))
