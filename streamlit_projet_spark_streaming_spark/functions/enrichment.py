"""The reconstructed Consumer's enrichment chain (SURVEY.md §2.H3, §7).

The reference's Spark Consumer is absent from the repo; its contract is the
10 derived columns observed in the dashboard's projection
(``/root/reference/streamlit/streamlit_app.py:166-186``, §1.2 cols 12-21).
Exact thresholds are engine config (documented here) since the source is
absent — what matters is that the derivations are STATELESS pure
expressions, so stream and batch application are bit-identical
(stream/batch parity, SURVEY.md §5.3).

Evidence per column:
- ``final_amount_usd``      summed at ``streamlit_app.py:350``
- ``amount_category``       'Premium' filter ``:686``, value_counts ``:952``
- ``customer_segment``      'VIP' filter ``:349,685``
- ``satisfaction_level``    domain {Very Satisfied, Satisfied, Neutral,
                            Dissatisfied} ``:891``
- ``is_anomaly``            boolean sum ``:347``, filter ``:751``
- ``estimated_clv``         mean ``:697``
- ``frequency_category``    value_counts ``:966``
- ``estimated_profit_usd``  sum ``:348,833``
- ``season_type``           projected ``:185``
- ``loyalty_score``         value_counts → pie ``:727-734``

All derivations use only builtin ``F.*`` expressions (no UDFs): they
pipeline into the ingest scan and cost ~zero at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Enrichment thresholds (engine config).
PREMIUM_MIN = 200.0
STANDARD_MIN = 50.0
VIP_MIN_FINAL = 300.0
ANOMALY_HIGH = 400.0
ANOMALY_LOW = 1.0
SUBSCRIPTION_DISCOUNT = 0.95  # 5% off for subscribers
WINTER_DISCOUNT = 0.9  # seasonal promotion
PROFIT_MARGIN = 0.3
CLV_MONTHS = 12.0
CLV_SUBSCRIBER_BOOST = 1.5


def season_type(processed_time: Column) -> Column:
    m = F.month(processed_time)
    return (
        F.when(m.isin(12, 1, 2), "Winter")
        .when(m.isin(3, 4, 5), "Spring")
        .when(m.isin(6, 7, 8), "Summer")
        .otherwise("Fall")
    )


def final_amount_usd(amount: Column, subscription_status: Column, season: Column) -> Column:
    sub_factor = F.when(subscription_status == "Yes", SUBSCRIPTION_DISCOUNT).otherwise(1.0)
    season_factor = F.when(season == "Winter", WINTER_DISCOUNT).otherwise(1.0)
    return F.round(amount * sub_factor * season_factor, 2)


def amount_category(final_amount: Column) -> Column:
    return (
        F.when(final_amount < STANDARD_MIN, "Budget")
        .when(final_amount < PREMIUM_MIN, "Standard")
        .otherwise("Premium")
    )


def customer_segment(final_amount: Column, subscription_status: Column) -> Column:
    return (
        F.when(final_amount >= VIP_MIN_FINAL, "VIP")
        .when(
            (subscription_status == "Yes") & (final_amount >= PREMIUM_MIN), "VIP"
        )
        .when(final_amount >= 100.0, "Premium")
        .otherwise("Regular")
    )


def satisfaction_level(review_rating: Column) -> Column:
    return (
        F.when(review_rating >= 4.5, "Very Satisfied")
        .when(review_rating >= 3.5, "Satisfied")
        .when(review_rating >= 2.5, "Neutral")
        .otherwise("Dissatisfied")
    )


def is_anomaly(amount: Column) -> Column:
    return (amount > ANOMALY_HIGH) | (amount < ANOMALY_LOW)


def estimated_clv(final_amount: Column, subscription_status: Column) -> Column:
    boost = F.when(subscription_status == "Yes", CLV_SUBSCRIBER_BOOST).otherwise(1.0)
    return F.round(final_amount * CLV_MONTHS * boost, 2)


def estimated_profit_usd(final_amount: Column) -> Column:
    return F.round(final_amount * PROFIT_MARGIN, 2)


def frequency_category(customer_id: Column) -> Column:
    """Deterministic stand-in for purchase-frequency history: stable hash of
    the customer id → {Weekly, Monthly, Quarterly, Annually}."""
    bucket = F.pmod(F.crc32(customer_id.cast("string")), F.lit(4))
    return (
        F.when(bucket == 0, "Weekly")
        .when(bucket == 1, "Monthly")
        .when(bucket == 2, "Quarterly")
        .otherwise("Annually")
    )


def loyalty_score(review_rating: Column, subscription_status: Column) -> Column:
    return (
        F.when((review_rating >= 4.0) & (subscription_status == "Yes"), "High")
        .when(review_rating >= 3.0, "Medium")
        .otherwise("Low")
    )


def enrich(df: DataFrame) -> DataFrame:
    """Apply the full 10-column enrichment chain to raw order rows.

    Input: the 11 raw columns (§1.2 cols 1-11, incl. ``processed_time``).
    Output: the full 21-column enriched schema, column order matching the
    dashboard projection (``streamlit_app.py:166-186``).
    """
    season = season_type(F.col("processed_time"))
    df = df.withColumn("season_type", season)
    df = df.withColumn(
        "final_amount_usd",
        final_amount_usd(
            F.col("purchase_amount_usd"),
            F.col("subscription_status"),
            F.col("season_type"),
        ),
    )
    return (
        df.withColumn("amount_category", amount_category(F.col("final_amount_usd")))
        .withColumn(
            "customer_segment",
            customer_segment(F.col("final_amount_usd"), F.col("subscription_status")),
        )
        .withColumn("satisfaction_level", satisfaction_level(F.col("review_rating")))
        .withColumn("is_anomaly", is_anomaly(F.col("purchase_amount_usd")))
        .withColumn(
            "estimated_clv",
            estimated_clv(F.col("final_amount_usd"), F.col("subscription_status")),
        )
        .withColumn("frequency_category", frequency_category(F.col("customer_id")))
        .withColumn(
            "estimated_profit_usd", estimated_profit_usd(F.col("final_amount_usd"))
        )
        .withColumn(
            "loyalty_score",
            loyalty_score(F.col("review_rating"), F.col("subscription_status")),
        )
        .select(
            "customer_id",
            "age",
            "gender",
            "category",
            "item_purchased",
            "purchase_amount_usd",
            "location",
            "review_rating",
            "subscription_status",
            "payment_method",
            "processed_time",
            "final_amount_usd",
            "amount_category",
            "customer_segment",
            "satisfaction_level",
            "is_anomaly",
            "estimated_clv",
            "frequency_category",
            "estimated_profit_usd",
            "season_type",
            "loyalty_score",
        )
    )
