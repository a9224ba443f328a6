"""Metadata projection operators over the MAP<STRING, ARRAY<STRING>>
metadata column (core/src/main/java/org/apache/stormcrawler/Metadata.java:35-44
— multi-valued, prefix-addressable).

Two projection policies from util/MetadataTransfer.java:
  - ``outlink_metadata`` (:124-145): project parent metadata onto outlinks —
    keep configured transfer keys (glob-capable), append source URL as
    ``url.path``, increment ``depth``.
  - ``persist_metadata`` (:151-159): project to persisted keys before the
    frontier write — transfer keys ∪ persist keys (defaults ``_redirTo``,
    ``error.*``, ``isSitemap``, ``isFeed``, always ``fetch.error.count`` —
    crawler-default.yaml:75-80).

All native ``map_filter``/``map_concat`` expressions — no UDF, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PERSIST_KEYS = ["_redirTo", "error.cause", "error.source", "isSitemap",
                        "isFeed", "fetch.error.count"]


def _glob_condition(key: Column, patterns: list[str]) -> Column:
    """key matches any glob in patterns (globs: trailing '*' per
    MetadataTransfer.java:165-180 / AbstractIndexerBolt.java:208-214)."""
    cond = F.lit(False)
    for p in patterns:
        if p.endswith("*"):
            cond = cond | key.startswith(p[:-1])
        else:
            cond = cond | (key == p)
    return cond


def filter_metadata_keys(metadata: Column, patterns: list[str]) -> Column:
    """map_filter keeping keys matching the glob list."""
    return F.map_filter(metadata, lambda k, v: _glob_condition(k, patterns))


def outlink_metadata(
    outlinks: DataFrame,
    transfer_keys: list[str],
    source_url_col: str = "source_url",
    metadata_col: str = "metadata",
    track_path: bool = True,
    track_depth: bool = True,
) -> DataFrame:
    """Compute each outlink's metadata from its parent's
    (MetadataTransfer.getMetaForOutlink, :124-145)."""
    md = F.coalesce(
        F.col(metadata_col),
        F.expr("map()").cast("map<string,array<string>>"),
    )
    kept = filter_metadata_keys(md, transfer_keys)
    additions = []
    if track_path:
        additions.append((F.lit("url.path"), F.array(F.col(source_url_col))))
    if track_depth:
        depth_vals = F.try_element_at(md, F.lit("depth"))
        depth = F.coalesce(
            F.try_element_at(depth_vals, F.lit(1)).cast("int"), F.lit(0)
        )
        additions.append(
            (F.lit("depth"), F.array((depth + 1).cast("string")))
        )
    out = kept
    for k, v in additions:
        out = F.map_concat(F.map_filter(out, lambda kk, vv: kk != k), F.create_map(k, v))
    return outlinks.withColumn(metadata_col, out)


def persist_metadata(
    updates: DataFrame,
    transfer_keys: list[str] | None = None,
    persist_keys: list[str] | None = None,
    metadata_col: str = "metadata",
) -> DataFrame:
    """Project metadata to the persisted key set before the frontier MERGE
    (MetadataTransfer.filter, :151-159)."""
    keys = (transfer_keys or []) + (persist_keys or DEFAULT_PERSIST_KEYS)
    return updates.withColumn(
        metadata_col, filter_metadata_keys(F.col(metadata_col), keys)
    )


def metadata_value(metadata: Column, key: str) -> Column:
    """First value for a key (Metadata.getFirstValue)."""
    return F.try_element_at(F.try_element_at(metadata, F.lit(key)), F.lit(1))


def indexer_projection(
    docs: DataFrame,
    mapping: dict[str, str],
    metadata_col: str = "metadata",
    filter_key: str | None = None,
    filter_value: str | None = None,
    canonical_key: str | None = None,
    text_max_length: int | None = None,
) -> DataFrame:
    """The AbstractIndexerBolt projection contract
    (core/.../indexing/AbstractIndexerBolt.java:46,158-247):

    - ``mapping``: metadata-key → index-field renames
    - ``filter_key/value``: drop docs not carrying k=v (:191-200)
    - ``canonical_key``: metadata key overriding the doc URL (:219-230)
    - ``text_max_length``: trim indexed text (:175-179)

    Pure select/filter — Catalyst prunes everything else away.
    """
    md = F.col(metadata_col)
    out = docs
    if filter_key is not None:
        out = out.where(
            F.array_contains(
                F.coalesce(F.try_element_at(md, F.lit(filter_key)), F.array()),
                filter_value,
            )
        )
    cols = [
        F.coalesce(metadata_value(md, canonical_key), F.col("url")).alias("url")
        if canonical_key
        else F.col("url")
    ]
    if "text" in docs.columns:
        text = F.col("text")
        if text_max_length:
            text = F.substring(text, 1, text_max_length)
        cols.append(text.alias("text"))
    for md_key, field_name in mapping.items():
        cols.append(metadata_value(md, md_key).alias(field_name))
    return out.select(*cols)
