"""AWS price-list replicator (reference:
lib/webhookdb/replicator/aws_pricing_v1.rb:27-142 columns,
:240-370 flattening).

A price-list document is deeply nested JSON:

    {publicationDate, offerCode, version,
     products: {sku: {sku, productFamily, attributes: {...}}},
     terms: {termType: {sku: {termCode: {offerTermCode, effectiveDate,
               termAttributes, priceDimensions: {rateCode: rate}}}}}}

and flattens to one row per (product × term × priceDimension) rate,
keyed by ``rate_code`` with a ``publication_date`` freshness guard
(aws_pricing_v1.rb:65-83).

Spark-first shape: the reference streams the 200 MB file line-by-line
with regex state (aws_pricing_v1.rb:255-262 explains why: a single Ruby
process cannot hold the parsed JSON). Distributed execution removes
that constraint entirely — ``from_json`` into typed maps, a 4-level
``explode`` chain for the terms side, a 1-level explode for the
products side, and an equi-join on (doc, sku) that Spark plans as a
shuffle or broadcast hash join. Nothing is line-oriented and every
stage scales horizontally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webhookdb_spark.spec import Col, ReplicatorSpec, register
from webhookdb_spark.types import ColumnType

# Rate payload inside priceDimensions (aws_pricing_v1.rb:326-351).
_RATE_TYPE = (
    "struct<appliesTo:array<string>, beginRange:string, endRange:string,"
    " description:string, unit:string, pricePerUnit:map<string,string>>"
)
_TERM_TYPE = (
    "struct<offerTermCode:string, effectiveDate:string,"
    f" termAttributes:map<string,string>, priceDimensions:map<string,{_RATE_TYPE}>>"
)
TERMS_SCHEMA = f"map<string, map<string, map<string,{_TERM_TYPE}>>>"
PRODUCTS_SCHEMA = (
    "map<string, struct<sku:string, productFamily:string,"
    " attributes:map<string,string>>>"
)

# Public AWS region metadata (the reference derives the same map from
# the SDK's partition data, lib/webhookdb/aws.rb:92-97). Lookup is
# passthrough-on-miss, like LOCATIONS_TO_REGIONS.fetch(loc, loc).
LOCATIONS_TO_REGIONS = {
    "US East (N. Virginia)": "us-east-1",
    "US East (Ohio)": "us-east-2",
    "US West (N. California)": "us-west-1",
    "US West (Oregon)": "us-west-2",
    "Africa (Cape Town)": "af-south-1",
    "Asia Pacific (Hong Kong)": "ap-east-1",
    "Asia Pacific (Mumbai)": "ap-south-1",
    "Asia Pacific (Tokyo)": "ap-northeast-1",
    "Asia Pacific (Seoul)": "ap-northeast-2",
    "Asia Pacific (Singapore)": "ap-southeast-1",
    "Asia Pacific (Sydney)": "ap-southeast-2",
    "Canada (Central)": "ca-central-1",
    "Europe (Frankfurt)": "eu-central-1",
    "Europe (Ireland)": "eu-west-1",
    "Europe (London)": "eu-west-2",
    "Europe (Paris)": "eu-west-3",
    "Europe (Stockholm)": "eu-north-1",
    "South America (Sao Paulo)": "sa-east-1",
}


def _region_lookup(loc: Column) -> Column:
    """converter_map_lookup semantics (column.rb:244-264): map through
    the lookup table, passthrough on miss."""
    pairs = []
    for k, v in LOCATIONS_TO_REGIONS.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.element_at(F.create_map(*pairs), loc), loc)


def _range(col: Column) -> Column:
    """'Inf' and missing → NULL, else decimal (aws_pricing_v1.rb:364-368)."""
    return F.nullif(col, F.lit("Inf")).cast("decimal(38,18)")


def flatten_price_list(docs: DataFrame, body_col: str = "body") -> DataFrame:
    """One price-list JSON document per input row → one output row per
    rate, with the reference's exact column set.

    ``doc_id`` disambiguates multiple documents in one batch (the
    reference processes one file at a time; here many flatten in
    parallel and the products⋈terms join keys on (doc, sku)).
    """
    body = F.col(body_col)
    base = docs.select(
        F.monotonically_increasing_id().alias("_doc"),
        F.to_timestamp(F.get_json_object(body, "$.publicationDate")).alias(
            "publication_date"
        ),
        F.get_json_object(body, "$.offerCode").alias("service_code"),
        F.get_json_object(body, "$.version").alias("version"),
        F.from_json(F.get_json_object(body, "$.products"), PRODUCTS_SCHEMA).alias(
            "_products"
        ),
        F.from_json(F.get_json_object(body, "$.terms"), TERMS_SCHEMA).alias("_terms"),
    )

    products = base.select(
        "_doc", F.explode("_products").alias("product_sku", "_p")
    ).select(
        "_doc",
        "product_sku",
        F.col("_p.productFamily").alias("product_family"),
        F.to_json(F.col("_p.attributes")).alias("product_attributes"),
        F.element_at(F.col("_p.attributes"), "group").alias("product_group"),
        F.element_at(F.col("_p.attributes"), "location").alias("product_location"),
        _region_lookup(F.element_at(F.col("_p.attributes"), "location")).alias(
            "product_region"
        ),
        F.element_at(F.col("_p.attributes"), "operation").alias("product_operation"),
        F.element_at(F.col("_p.attributes"), "usagetype").alias("product_usagetype"),
    )

    # terms: termType → sku → termCode → term → priceDimensions → rate
    rates = (
        base.select(
            "_doc",
            "publication_date",
            "service_code",
            "version",
            F.explode("_terms").alias("term_type", "_by_sku"),
        )
        .select(
            "_doc",
            "publication_date",
            "service_code",
            "version",
            "term_type",
            F.explode("_by_sku").alias("product_sku", "_by_term"),
        )
        .select(
            "_doc",
            "publication_date",
            "service_code",
            "version",
            "term_type",
            "product_sku",
            F.explode("_by_term").alias("term_code", "_term"),
        )
        .select(
            "_doc",
            "publication_date",
            "service_code",
            "version",
            "term_type",
            "product_sku",
            "term_code",
            F.col("_term.offerTermCode").alias("offer_term_code"),
            F.to_timestamp(F.col("_term.effectiveDate")).alias("effective_date"),
            F.to_json(F.col("_term.termAttributes")).alias("term_attributes"),
            F.explode(F.col("_term.priceDimensions")).alias("rate_code", "_rate"),
        )
    )

    # pricePerUnit is a single-entry {currency: amount} map; take the
    # lexicographically-first key for determinism (Ruby's .first is
    # JSON-insertion order — identical for one-entry maps,
    # aws_pricing_v1.rb:327).
    ppu = F.col("_rate.pricePerUnit")
    currency = F.array_min(F.map_keys(ppu))
    flat = rates.select(
        "_doc",
        "publication_date",
        "service_code",
        "version",
        "term_type",
        "product_sku",
        "term_code",
        "offer_term_code",
        "effective_date",
        "term_attributes",
        "rate_code",
        F.col("_rate.appliesTo").alias("applies_to"),
        _range(F.col("_rate.beginRange")).alias("begin_range"),
        F.col("_rate.description").alias("description"),
        _range(F.col("_rate.endRange")).alias("end_range"),
        F.col("_rate.unit").alias("unit"),
        F.to_json(ppu).alias("price_per_unit_raw"),
        F.element_at(ppu, currency).cast("decimal(38,18)").alias(
            "price_per_unit_amount"
        ),
        currency.alias("price_per_unit_currency"),
    )

    out = flat.join(products, on=["_doc", "product_sku"], how="left").drop("_doc")
    cols = [c.name for c in AWS_PRICING_V1.all_cols]
    return out.select(*cols, F.lit(None).cast("string").alias("data"))


AWS_PRICING_V1 = register(
    ReplicatorSpec(
        supports_backfill=True,
        name="aws_pricing_v1",
        table="aws_pricing_v1",
        # rate codes are globally unique ("SKU.TermCode.RateCode")
        remote_key=Col("rate_code", ColumnType.TEXT),
        denorm_cols=(
            Col("product_sku", ColumnType.TEXT, index=True),
            Col("product_family", ColumnType.TEXT, index=True),
            Col("product_attributes", ColumnType.OBJECT),
            Col("product_group", ColumnType.TEXT, index=True),
            Col("product_location", ColumnType.TEXT, index=True),
            Col("product_region", ColumnType.TEXT, index=True),
            Col("product_operation", ColumnType.TEXT, index=True),
            Col("product_usagetype", ColumnType.TEXT, index=True),
            Col("publication_date", ColumnType.TIMESTAMP, index=True),
            Col("service_code", ColumnType.TEXT, index=True),
            Col("version", ColumnType.TEXT, index=True),
            Col("term_type", ColumnType.TEXT),
            Col("term_code", ColumnType.TEXT, index=True),
            Col("offer_term_code", ColumnType.TEXT, index=True),
            Col("effective_date", ColumnType.TIMESTAMP, index=True),
            Col("applies_to", ColumnType.TEXT_ARRAY),
            Col("begin_range", ColumnType.DECIMAL),
            Col("description", ColumnType.TEXT),
            Col("end_range", ColumnType.DECIMAL),
            Col("unit", ColumnType.TEXT),
            Col("term_attributes", ColumnType.OBJECT),
            Col("price_per_unit_raw", ColumnType.OBJECT),
            Col("price_per_unit_amount", ColumnType.DECIMAL),
            Col("price_per_unit_currency", ColumnType.TEXT),
        ),
        timestamp_col="publication_date",
        # never replace fresh prices with an older publication
        # (aws_pricing_v1.rb:81-83)
        update_where=lambda s, t: t("publication_date") < s("publication_date"),
        # backfill-only integration: no webhook verification
        # (aws_pricing_v1.rb:85-88); _resource_to_data returns {} so the
        # raw 200MB document is NOT stored per-row (aws_pricing_v1.rb:76-78)
        data_key=None,
    )
)


def upsert_price_lists(table, docs: DataFrame):
    """Backfill path: price-list documents → flatten → conditional MERGE
    (ServiceBackfiller + Bulk upsert, aws_pricing_v1.rb:190-207; page
    size is irrelevant here — one distributed merge replaces paging)."""
    from webhookdb_spark.operators.upsert import merge_upsert

    if not table.exists():
        table.create(
            AWS_PRICING_V1.schema(),
            key="rate_code",
            n_buckets=AWS_PRICING_V1.n_buckets,
        )
    batch = flatten_price_list(docs).withColumn(
        "_received_at", F.current_timestamp()
    )
    return merge_upsert(table, batch, AWS_PRICING_V1)
