"""Pure-Python golden oracle for listing extraction (SURVEY §5.2).

Recomputes, from a fixture world's JSON page bodies alone, the exact
DeepbnbItem rows the reference would assemble — reimplementing the
reference's semantics (cited below) in plain dict/loop Python as an
execution path independent of the Spark engine. Field-for-field equality
of ``engine_assemble == golden`` is the extraction-correctness gate.

Semantics mirrored (all /root/reference/):
* search-phase cache fields + F8 heuristic: deepbnb/spiders/airbnb.py:198-270
* pricing scalars: airbnb.py:291-325
* PDP item assembly: deepbnb/api/PdpPlatformSections.py:94-203
* reviews accumulation: deepbnb/api/PdpReviews.py:13-42

Known deliberate deviations (documented in the engine modules):
* null pricingQuote with checkin → total_price None (reference raises)
* geography comes from each host's own search response (reference keeps a
  single last-write-wins dict)
"""

from __future__ import annotations

import json
import re

from frontier_engine.fixtures import WorldSpec, pdp_url, reviews_url, search_url
from frontier_engine.html_text import html_to_text

_AMENITY_RX = re.compile(r"^([a-z0-9]+_)+([0-9]+)_")


def _price_key(pricing):
    return "price" if "price" in pricing["structuredStayDisplayPrice"]["primaryLine"] else "discountedPrice"


def _price_rate(pricing):
    if pricing:
        key = _price_key(pricing)
        return int(pricing["structuredStayDisplayPrice"]["primaryLine"][key].lstrip("$").replace(",", ""))
    return None


def _rate_type(pricing):
    return pricing["structuredStayDisplayPrice"]["primaryLine"]["qualifier"] if pricing else None


def _total_price(pricing, checkin):
    if not checkin or not pricing:
        return None
    ssdp = pricing["structuredStayDisplayPrice"]
    if ssdp["secondaryLine"]:
        m = re.match(r"\$([\w,]+) total", ssdp["secondaryLine"]["price"])
    else:
        m = re.match(r"\$([\w,]+)", ssdp["primaryLine"][_price_key(pricing)])
    return int(m[1].replace(",", "")) if m else None


def _render_titles(title_list, sep=": ", join=True):
    lines = [
        f"{t['title']}{sep}{t['subtitle']}" if t.get("subtitle") else t.get("title")
        for t in title_list
    ]
    return "\n".join(lines) if join else lines


def _amenity_ids(amenities):
    out = []
    for a in amenities:
        m = _AMENITY_RX.match(a["id"])
        out.append(int(m.group(m.lastindex)))
    return out


def golden_listings(
    spec: WorldSpec,
    pages: dict[str, str],
    checkin: str | None,
    price_max: int | None,
    robots_block_reviews: set[str] = frozenset(),
) -> dict[str, dict]:
    """{listing_id: expected DeepbnbItem dict} for every listing that (a)
    survives the F8 heuristic in search, (b) has its PDP page present.
    *robots_block_reviews*: hosts whose review fetches are blocked →
    reviews None for their listings."""
    out: dict[str, dict] = {}
    for i in range(spec.n_hosts):
        host = spec.host(i)
        lids = spec.listings_of_host(i)
        n_pages = max(1, -(-len(lids) // spec.items_per_grid))
        for p in range(n_pages):
            body = pages.get(search_url(spec, i, (p * spec.items_per_grid) or None))
            if body is None:
                continue
            data = json.loads(body)
            explore = data["data"]["dora"]["exploreV3"]
            geography = explore["metadata"]["geography"]
            for section in explore["sections"]:
                if section["sectionComponentType"] != "listings_ListingsGrid_Explore":
                    continue
                for item in section["items"]:
                    listing = item["listing"]
                    pricing = item["pricingQuote"]
                    if pricing and price_max and price_max > 1000:
                        rwsf = pricing["rateWithServiceFee"]
                        amt = (rwsf["amount"] if rwsf else None) or 0
                        if (
                            pricing["structuredStayDisplayPrice"]["primaryLine"]["qualifier"] != "month"
                            and amt * 28 > price_max
                        ):
                            continue
                    lid = listing["id"]
                    pdp_body = pages.get(pdp_url(spec, i, lid))
                    if pdp_body is None:
                        continue  # fetch-miss: never assembled
                    out[lid] = _assemble(
                        spec, i, host, listing, pricing, geography, json.loads(pdp_body),
                        pages, checkin, robots_block_reviews,
                    )
    return out


def _reviews_for(spec, host_i, lid, pages):
    first = pages.get(reviews_url(spec, host_i, lid, 0))
    if first is None:
        return None
    data = json.loads(first)["data"]["merlin"]["pdpReviews"]
    total = int(data["metadata"]["reviewsCount"])
    limit = spec.reviews_limit

    def project(rs):
        return [
            {
                "comments": r["comments"],
                "created_at": r["createdAt"],
                "language": r["language"],
                "rating": r["rating"],
                "response": r["response"],
            }
            for r in rs
        ]

    reviews = project(data["reviews"])
    for off in range(limit, total, limit):
        b = pages.get(reviews_url(spec, host_i, lid, off))
        if b is not None:
            reviews.extend(project(json.loads(b)["data"]["merlin"]["pdpReviews"]["reviews"]))
    return reviews


def _assemble(spec, host_i, host, listing, pricing, geography, pdp_data, pages, checkin, robots_block_reviews):
    pdp = pdp_data["data"]["merlin"]["pdpSections"]
    lid = pdp["id"]
    sections = pdp["sections"]
    sec = lambda sid: [s for s in sections if s["sectionId"] == sid][0]["section"]
    amenities_section = sec("AMENITIES_DEFAULT")
    description_section = sec("DESCRIPTION_DEFAULT")
    host_profile = sec("HOST_PROFILE_DEFAULT")
    location = sec("LOCATION_DEFAULT")
    policies = sec("POLICIES_DEFAULT")
    logging_data = pdp["metadata"]["loggingContext"]["eventDataLogging"]

    groups = amenities_section["seeAllAmenitiesGroups"]
    access = [g["amenities"] for g in groups if g["title"] == "Guest access"]
    avail = [a for g in groups for a in g["amenities"] if a["available"]]
    pricing = pricing or {}

    item = {
        "id": lid,
        "access": _render_titles(access[0]) if access else None,
        "additional_house_rules": policies["additionalHouseRules"],
        "allows_events": "No parties or events" in [r["title"] for r in policies["houseRules"]],
        "amenities": _render_titles(avail, sep=" - ", join=False),
        "amenity_ids": _amenity_ids(avail),
        "avg_rating": listing["avgRating"],
        "bathrooms": listing["bathrooms"],
        "bedrooms": listing["bedrooms"],
        "beds": listing["beds"],
        "business_travel_ready": listing["isBusinessTravelReady"],
        "city": listing["city"] if listing.get("city") is not None else geography["city"],
        "country": geography["country"],
        "description": (
            html_to_text(description_section["htmlDescription"]["htmlText"])
            if description_section.get("htmlDescription")
            else None
        ),
        "host_id": listing["user"]["id"],
        "house_rules": [r["title"] for r in policies["houseRules"]],
        "interaction": None,
        "is_hotel": pdp["metadata"]["bookingPrefetchData"]["isHotelRatePlanEnabled"],
        "latitude": listing["lat"],
        "listing_expectations": _render_titles(policies["listingExpectations"]) if policies else None,
        "longitude": listing["lng"],
        "monthly_price_factor": pricing.get("monthlyPriceFactor"),
        "name": listing["name"] if listing.get("name") is not None else lid,
        "neighborhood_overview": listing["neighborhoodOverview"],
        "person_capacity": listing["personCapacity"],
        "photo_count": listing["pictureCount"],
        "photos": [p["picture"] for p in listing["contextualPictures"]],
        "place_id": geography["placeId"],
        "price_rate": _price_rate(pricing),
        "price_rate_type": _rate_type(pricing),
        "province": geography.get("province"),
        "rating_accuracy": logging_data["accuracyRating"],
        "rating_checkin": logging_data["checkinRating"],
        "rating_cleanliness": logging_data["cleanlinessRating"],
        "rating_communication": logging_data["communicationRating"],
        "rating_location": logging_data["locationRating"],
        "rating_value": logging_data["valueRating"],
        "review_count": listing["reviewsCount"],
        "reviews": (
            None if host in robots_block_reviews else _reviews_for(spec, host_i, lid, pages)
        ),
        "room_and_property_type": listing["roomAndPropertyType"],
        "room_type": listing["roomType"],
        "room_type_category": listing["roomTypeCategory"],
        "satisfaction_guest": logging_data["guestSatisfactionOverall"],
        "star_rating": listing["starRating"],
        "state": geography["state"],
        "total_price": _total_price(pricing, checkin),
        "transit": None,
        "url": f"https://www.airbnb.com/rooms/{lid}",
        "weekly_price_factor": pricing.get("weeklyPriceFactor"),
    }
    # detail properties (PdpPlatformSections.py:200-203)
    loc_details = location["seeAllLocationDetails"]
    if "Getting around" in [i["title"] for i in loc_details]:
        item["transit"] = html_to_text(
            [i["content"]["htmlText"] for i in loc_details if i["title"] == "Getting around"][0]
        )
    infos = host_profile["hostInfos"]
    if "During your stay" in [i["title"] for i in infos]:
        item["interaction"] = html_to_text(
            [i["html"]["htmlText"] for i in infos if i["title"] == "During your stay"][0]
        )
    return item
