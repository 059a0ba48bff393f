"""aws_pricing_v1: deep-explode flattening + conditional upsert
(reference: lib/webhookdb/replicator/aws_pricing_v1.rb:240-370)."""

from __future__ import annotations

import json
from decimal import Decimal

from webhookdb_spark.replicators.aws_pricing_v1 import (
    AWS_PRICING_V1,
    flatten_price_list,
    upsert_price_lists,
)
from webhookdb_spark.storage import Warehouse


def _price_list(pub="2024-03-01T00:00:00Z", usd="0.0840"):
    return {
        "publicationDate": pub,
        "offerCode": "AmazonEC2",
        "version": "20240301000000",
        "products": {
            "SKU1": {
                "sku": "SKU1",
                "productFamily": "Compute Instance",
                "attributes": {
                    "group": "m5",
                    "location": "US East (N. Virginia)",
                    "operation": "RunInstances",
                    "usagetype": "BoxUsage:m5.large",
                },
            },
            "SKU2": {
                "sku": "SKU2",
                "productFamily": "Storage",
                "attributes": {"location": "Atlantis (Underwater)"},
            },
        },
        "terms": {
            "OnDemand": {
                "SKU1": {
                    "SKU1.JRTCKXETXF": {
                        "offerTermCode": "JRTCKXETXF",
                        "effectiveDate": "2024-03-01T00:00:00Z",
                        "termAttributes": {},
                        "priceDimensions": {
                            "SKU1.JRTCKXETXF.6YS6EN2CT7": {
                                "appliesTo": [],
                                "beginRange": "0",
                                "endRange": "Inf",
                                "description": "$0.084 per hour",
                                "unit": "Hrs",
                                "pricePerUnit": {"USD": usd},
                            }
                        },
                    }
                },
                "SKU2": {
                    "SKU2.JRTCKXETXF": {
                        "offerTermCode": "JRTCKXETXF",
                        "effectiveDate": "2024-03-01T00:00:00Z",
                        "termAttributes": {},
                        "priceDimensions": {
                            "SKU2.JRTCKXETXF.AAA": {
                                "appliesTo": None,
                                "beginRange": "0",
                                "endRange": "1024",
                                "description": "storage tier 1",
                                "unit": "GB-Mo",
                                "pricePerUnit": {"USD": "0.10"},
                            },
                            "SKU2.JRTCKXETXF.BBB": {
                                "appliesTo": ["SKU1.JRTCKXETXF.6YS6EN2CT7"],
                                "beginRange": "1024",
                                "endRange": "Inf",
                                "description": "storage tier 2",
                                "unit": "GB-Mo",
                                "pricePerUnit": {"USD": "0.08"},
                            },
                        },
                    }
                },
            },
            "Reserved": {
                "SKU1": {
                    "SKU1.38NPMPTW36": {
                        "offerTermCode": "38NPMPTW36",
                        "effectiveDate": "2024-03-01T00:00:00Z",
                        "termAttributes": {"LeaseContractLength": "3yr"},
                        "priceDimensions": {
                            "SKU1.38NPMPTW36.CCC": {
                                "appliesTo": [],
                                "beginRange": None,
                                "endRange": None,
                                "description": "3yr reserved",
                                "unit": "Quantity",
                                "pricePerUnit": {"CNY": "1234.5"},
                            }
                        },
                    }
                }
            },
        },
    }


def _docs(spark, pl):
    return spark.createDataFrame([(json.dumps(pl),)], "body string")


def test_flatten_rate_rows(spark):
    flat = flatten_price_list(_docs(spark, _price_list()))
    rows = {r.rate_code: r for r in flat.collect()}
    assert len(rows) == 4
    r = rows["SKU1.JRTCKXETXF.6YS6EN2CT7"]
    assert r.product_sku == "SKU1"
    assert r.term_type == "OnDemand"
    assert r.product_region == "us-east-1"  # location → region lookup
    assert r.product_group == "m5"
    assert r.end_range is None  # Inf → NULL
    assert r.begin_range == Decimal("0")
    assert r.price_per_unit_currency == "USD"
    assert r.price_per_unit_amount == Decimal("0.0840")
    assert json.loads(r.price_per_unit_raw) == {"USD": "0.0840"}
    # unknown location passes through (LOCATIONS_TO_REGIONS.fetch(loc, loc))
    assert rows["SKU2.JRTCKXETXF.AAA"].product_region == "Atlantis (Underwater)"
    assert rows["SKU2.JRTCKXETXF.AAA"].end_range == Decimal("1024")
    assert rows["SKU2.JRTCKXETXF.BBB"].applies_to == ["SKU1.JRTCKXETXF.6YS6EN2CT7"]
    cny = rows["SKU1.38NPMPTW36.CCC"]
    assert cny.term_type == "Reserved"
    assert cny.price_per_unit_currency == "CNY"
    assert json.loads(cny.term_attributes) == {"LeaseContractLength": "3yr"}


def test_upsert_guards_stale_publication(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "aws_pricing_v1")
    res = upsert_price_lists(t, _docs(spark, _price_list(pub="2024-03-01T00:00:00Z")))
    assert res.inserted == 4

    # newer publication updates
    res = upsert_price_lists(
        t, _docs(spark, _price_list(pub="2024-04-01T00:00:00Z", usd="0.0900"))
    )
    assert res.updated == 4 and res.inserted == 0
    amount = {
        r.rate_code: r.price_per_unit_amount for r in t.read().collect()
    }["SKU1.JRTCKXETXF.6YS6EN2CT7"]
    assert amount == Decimal("0.0900")

    # older publication must not overwrite
    res = upsert_price_lists(
        t, _docs(spark, _price_list(pub="2024-02-01T00:00:00Z", usd="0.0100"))
    )
    assert res.updated == 0
    amount = {
        r.rate_code: r.price_per_unit_amount for r in t.read().collect()
    }["SKU1.JRTCKXETXF.6YS6EN2CT7"]
    assert amount == Decimal("0.0900")


def test_schema_matches_spec(spark):
    flat = flatten_price_list(_docs(spark, _price_list()))
    spec_fields = [f.name for f in AWS_PRICING_V1.schema().fields]
    assert flat.columns == spec_fields
