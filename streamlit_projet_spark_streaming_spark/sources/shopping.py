"""Shopping ``orders`` schema + deterministic fixture generator
(FIXTURES.md §B — the reference-faithful table the driver fixtures lack).

Raw schema = §1.2 cols 1-11 of SURVEY.md (the Kaggle-style order
attributes + ingestion timestamp); the enriched 21-column schema is
produced by ``functions.enrichment.enrich``. The generator emits RAW rows
only — enriched columns must come from the engine, so the same fixture
validates batch views AND stream/batch enrichment parity (SURVEY.md §5.3).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Raw order-event schema (explicit — streaming schema inference stays off).
RAW_ORDER_SCHEMA = StructType(
    [
        StructField("customer_id", StringType(), False),
        StructField("age", LongType(), False),
        StructField("gender", StringType(), False),
        StructField("category", StringType(), False),
        StructField("item_purchased", StringType(), False),
        StructField("purchase_amount_usd", DoubleType(), False),
        StructField("location", StringType(), False),
        StructField("review_rating", DoubleType(), False),
        StructField("subscription_status", StringType(), False),
        StructField("payment_method", StringType(), False),
        StructField("processed_time", TimestampType(), False),
    ]
)

CATEGORIES = (
    "Clothing",
    "Footwear",
    "Accessories",
    "Outerwear",
    "Electronics",
    "Beauty",
    "Home",
    "Sports",
)
ITEMS_PER_CATEGORY = 4
GENDERS = ("Female", "Male")
LOCATIONS = tuple(f"State{i:02d}" for i in range(50))
PAYMENT_METHODS = (
    "Credit Card",
    "PayPal",
    "Cash",
    "Debit Card",
    "Venmo",
    "Bank Transfer",
)


def generate_raw_orders(n_rows: int, seed: int = 42) -> list[dict]:
    """Deterministic raw order rows (seed=42 per FIXTURES.md).

    numpy RNG; value domains per FIXTURES.md §B: age uniform 18-70 (all six
    buckets populated), lognormal-ish amounts 5-500 with a heavy right tail
    (so Premium/anomaly slices are non-empty), ≥24 hourly processed_time
    buckets, ~10% distinct customers.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    n_customers = max(1, n_rows // 10)
    t0 = datetime(2024, 3, 1, 0, 0, 0)

    cust = rng.integers(0, n_customers, n_rows)
    age = rng.integers(18, 71, n_rows)
    gender = rng.integers(0, 2, n_rows)
    cat = rng.integers(0, len(CATEGORIES) ** 2, n_rows) % len(CATEGORIES)  # mild skew
    cat = (np.minimum(cat, rng.integers(0, len(CATEGORIES), n_rows))).astype(int)
    item = rng.integers(0, ITEMS_PER_CATEGORY, n_rows)
    amount = np.clip(np.round(np.exp(rng.normal(3.6, 1.0, n_rows)), 2), 5.0, 500.0)
    loc = rng.integers(0, len(LOCATIONS), n_rows)
    rating = np.round(rng.uniform(1.0, 5.0, n_rows), 1)
    sub = rng.random(n_rows) < 0.35
    pay = rng.integers(0, len(PAYMENT_METHODS), n_rows)
    # monotone-ish ingestion over ~50 hours, ms precision
    offsets_ms = np.sort(rng.integers(0, 50 * 3600 * 1000, n_rows))

    rows = []
    for i in range(n_rows):
        rows.append(
            {
                "customer_id": f"CUST-{cust[i]:06d}",
                "age": int(age[i]),
                "gender": GENDERS[gender[i]],
                "category": CATEGORIES[cat[i]],
                "item_purchased": f"{CATEGORIES[cat[i]]}-Item{item[i]}",
                "purchase_amount_usd": float(amount[i]),
                "location": LOCATIONS[loc[i]],
                "review_rating": float(rating[i]),
                "subscription_status": "Yes" if sub[i] else "No",
                "payment_method": PAYMENT_METHODS[pay[i]],
                "processed_time": t0 + timedelta(milliseconds=int(offsets_ms[i])),
            }
        )
    return rows
