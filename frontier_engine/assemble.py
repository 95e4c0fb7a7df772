"""Listing assembly: join search-phase, PDP-phase, and review data into the
final listings table (SURVEY §2.5 J1-J3; DeepbnbItem construction at
/root/reference/deepbnb/api/PdpPlatformSections.py:117-172).

The reference joins via an in-memory dict (``self.__data_cache[listing_id]``
— KeyError means the listing never appeared in search, i.e. INNER-join
semantics) and embeds reviews fetched synchronously. The engine:

* J1: ``pdp_rows ⋈ search_results`` on listing_id, inner. Both sides are
  bounded by the crawl (politeness), far smaller than pages; AQE picks
  broadcast when one side is small.
* J3: ``review_rows`` batches → per-listing array via collect_list of
  (offset, reviews) pairs, array_sort by offset (the reference extends
  batches in ascending-offset order, PdpReviews.py:19-23), then flatten —
  exact ordering parity without any per-row Python.
* J2: geography enrichment. The reference keeps ONE mutable geography dict
  last-write-wins across hosts (ExploreSearch.py:91) — a race in a
  multi-host crawl. The engine carries geography per search page (struct
  column), so each listing is enriched from its own search response:
  deterministic, and identical to the reference for single-host crawls.
  city falls back cached→geography (PdpPlatformSections.py:130),
  name falls back cached→listing_id (:148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DeepbnbItem field order (items.py:14-62) — the engine's output schema
LISTING_COLUMNS = [
    "id", "access", "additional_house_rules", "allows_events", "amenities",
    "amenity_ids", "avg_rating", "bathrooms", "bedrooms", "beds",
    "business_travel_ready", "city", "country", "description", "host_id",
    "house_rules", "interaction", "is_hotel", "latitude",
    "listing_expectations", "longitude", "monthly_price_factor", "name",
    "neighborhood_overview", "person_capacity", "photo_count", "photos",
    "place_id", "price_rate", "price_rate_type", "province",
    "rating_accuracy", "rating_checkin", "rating_cleanliness",
    "rating_communication", "rating_location", "rating_value",
    "review_count", "reviews", "room_and_property_type", "room_type",
    "room_type_category", "satisfaction_guest", "star_rating", "state",
    "total_price", "transit", "url", "weekly_price_factor",
]


def aggregate_reviews(review_rows: DataFrame) -> DataFrame:
    """J3/A2/O4: per-listing review arrays, batches flattened in ascending
    offset order (collect_list is unordered → sort the (offset, batch)
    pairs explicitly; deterministic at any parallelism)."""
    return (
        review_rows.groupBy("listing_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("offset"), F.col("reviews")))
                    ),
                    lambda x: x["reviews"],
                )
            ).alias("reviews"),
            F.max("reviews_total").alias("reviews_total"),
        )
    )


def assemble_listings(
    search_results: DataFrame,
    pdp_rows: DataFrame,
    review_rows: DataFrame | None = None,
) -> DataFrame:
    """The DeepbnbItem join (PdpPlatformSections.py:117-172)."""
    sr = search_results.select(
        F.col("listing_id"),
        "geography", "avg_rating", "bathrooms", "bedrooms", "beds",
        "business_travel_ready", "city", "host_id", "latitude", "longitude",
        "name", "neighborhood_overview", "person_capacity", "photo_count",
        "photos", "review_count", "room_and_property_type", "room_type",
        "room_type_category", "star_rating", "monthly_price_factor",
        "weekly_price_factor", "price_rate", "price_rate_type", "total_price",
    )
    pdp = pdp_rows.select(
        "listing_id", "access", "additional_house_rules", "allows_events",
        "amenities", "amenity_ids", "description", "house_rules", "is_hotel",
        "listing_expectations", "rating_accuracy", "rating_checkin",
        "rating_cleanliness", "rating_communication", "rating_location",
        "rating_value", "satisfaction_guest", "transit", "interaction",
        F.col("listing_url"),
    )
    joined = pdp.join(sr, "listing_id", "inner")  # J1: KeyError ≡ inner

    if review_rows is not None:
        joined = joined.join(aggregate_reviews(review_rows), "listing_id", "left")
    else:
        joined = joined.withColumn("reviews", F.lit(None).cast(
            "array<struct<comments:string,created_at:string,language:string,rating:int,response:string>>"
        ))

    geo = F.col("geography")
    return joined.select(
        F.col("listing_id").alias("id"),
        "access",
        "additional_house_rules",
        "allows_events",
        "amenities",
        "amenity_ids",
        "avg_rating",
        "bathrooms",
        "bedrooms",
        "beds",
        "business_travel_ready",
        F.coalesce(F.col("city"), geo["city"]).alias("city"),  # J2
        geo["country"].alias("country"),
        "description",
        "host_id",
        "house_rules",
        "interaction",
        "is_hotel",
        "latitude",
        "listing_expectations",
        "longitude",
        "monthly_price_factor",
        F.coalesce(F.col("name"), F.col("listing_id")).alias("name"),
        "neighborhood_overview",
        "person_capacity",
        "photo_count",
        "photos",
        geo["placeId"].alias("place_id"),
        "price_rate",
        "price_rate_type",
        geo["province"].alias("province"),
        "rating_accuracy",
        "rating_checkin",
        "rating_cleanliness",
        "rating_communication",
        "rating_location",
        "rating_value",
        "review_count",
        "reviews",
        "room_and_property_type",
        "room_type",
        "room_type_category",
        "satisfaction_guest",
        "star_rating",
        geo["state"].alias("state"),
        "total_price",
        "transit",
        F.col("listing_url").alias("url"),
        "weekly_price_factor",
    ).select(*LISTING_COLUMNS)
