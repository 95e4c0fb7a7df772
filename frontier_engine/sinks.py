"""Output sinks (SURVEY §2.1 S6/S7, §2.5 J5).

S6 — spreadsheet-style export (/root/reference/deepbnb/exporter.py):
* fixed export column list FEED_EXPORT_FIELDS (settings.py.dist:99-133);
  columns the spider never sets (review_score, notes, response_rate,
  response_time) export as empty strings — the exporter serializes
  missing values as '' (exporter.py:34, default_value='').
* multivalued cells joined with ',' (exporter.py:50-56);
* ``name`` rewritten to a HYPERLINK formula (exporter.py:31-32).
The engine writes CSV (openpyxl xlsx is a driver-side format; CSV is the
distributed equivalent — same cells, same order).

S7 — upsert sink (pipelines.py:112-184): update-if-exists-else-insert on
id, with a ``datetime_scrape`` stamp (pipelines.py:113) and a
``coordinates`` (lon, lat) struct (pipelines.py:138). Expressed as the
MERGE the Icebergish store supports: anti-join existing on id + union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# settings.py.dist:99-133 (33 columns, order preserved)
FEED_EXPORT_FIELDS = [
    "name", "url", "price_rate", "price_rate_type", "total_price",
    "room_and_property_type", "latitude", "longitude",
    "monthly_price_factor", "weekly_price_factor", "room_type",
    "person_capacity", "amenities", "review_count", "review_score",
    "rating_accuracy", "rating_checkin", "rating_cleanliness",
    "rating_communication", "rating_location", "rating_value",
    "star_rating", "satisfaction_guest", "description",
    "neighborhood_overview", "notes", "additional_house_rules",
    "interaction", "access", "transit", "response_rate", "response_time",
    "photos",
]


def export_frame(listings: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """The S6 cell grid as a DataFrame of strings."""
    fields = fields or FEED_EXPORT_FIELDS
    df = listings
    # hyperlink formula (exporter.py:31-32): name or id as the label
    if "name" in fields:
        df = df.withColumn(
            "name",
            F.format_string(
                '=HYPERLINK("https://www.airbnb.com/rooms/%s", "%s")',
                F.col("id"),
                F.coalesce(F.col("name"), F.col("id")),
            ),
        )
    cols = []
    for f in fields:
        if f not in df.columns:
            cols.append(F.lit("").alias(f))  # never-set fields → ''
            continue
        dt = dict(df.dtypes)[f]
        c = F.col(f)
        if dt.startswith("array<string>"):
            c = F.array_join(c, ",")  # exporter.py:50-56
        elif dt.startswith("array<int"):
            c = F.array_join(F.transform(c, lambda x: x.cast("string")), ",")
        cols.append(F.coalesce(c.cast("string"), F.lit("")).alias(f))
    return df.select(*cols)


def write_csv(listings: DataFrame, path: str, fields: list[str] | None = None) -> None:
    export_frame(listings, fields).coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(path)


def merge_upsert(existing: DataFrame | None, batch: DataFrame, scrape_ts: str) -> DataFrame:
    """S7/J5: MERGE batch INTO existing ON id (update wins), stamping
    datetime_scrape and the coordinates geopoint struct. *scrape_ts* is an
    explicit ISO timestamp — deterministic inputs only, no wall clock."""
    enriched = batch.withColumn(
        "coordinates",
        F.struct(F.col("longitude").alias("lon"), F.col("latitude").alias("lat")),
    ).withColumn("datetime_scrape", F.lit(scrape_ts).cast("timestamp"))
    if existing is None:
        return enriched
    keep = existing.join(enriched.select("id"), "id", "left_anti")
    return keep.unionByName(enriched, allowMissingColumns=True)
