"""Reference-faithful view parity: the four shopping views vs DuckDB oracles
over the generated shopping fixture (FIXTURES.md §B, SURVEY.md §5)."""

import duckdb
import pytest

from streamlit_projet_spark_streaming_spark.functions.enrichment import enrich
from streamlit_projet_spark_streaming_spark.plans import shopping_views as SV

from .oracle_harness import compare
from .shopping_fixture import raw_df

VIEW_BUILDERS = {
    "v_age_preferences": SV.v_age_preferences,
    "v_gender_preferences": SV.v_gender_preferences,
    "v_location_preferences": SV.v_location_preferences,
    "v_age_gender_category": SV.v_age_gender_category,
}


@pytest.fixture(scope="module")
def enriched(spark):
    df = enrich(raw_df(spark, 20000))
    df.cache().count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def shopping_con(spark, enriched):
    con = duckdb.connect()
    pdf = enriched.toPandas()
    con.register("shopping_orders", pdf)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(VIEW_BUILDERS))
def test_shopping_view_matches_oracle(spark, enriched, shopping_con, name):
    df = VIEW_BUILDERS[name](enriched)
    oracle = SV.oracle_sql_shopping("shopping_orders")[name]
    # strict=False: the shopping twins are pytest-only reference-parity
    # surfaces (never driver-hashed), and their top-N list columns are
    # part of the reference's own shape.
    problems = compare(df, shopping_con, oracle, name, strict=False)
    assert not problems, "\n".join(problems)


def test_enrichment_domains(spark, enriched):
    """Enriched column domains match the reference's observed domains
    (streamlit_app.py:891 satisfaction, :349 VIP, :185 seasons, etc.)."""
    pdf = enriched.toPandas()
    assert set(pdf["satisfaction_level"]) <= {
        "Very Satisfied",
        "Satisfied",
        "Neutral",
        "Dissatisfied",
    }
    assert set(pdf["customer_segment"]) <= {"Regular", "Premium", "VIP"}
    assert "VIP" in set(pdf["customer_segment"])
    assert set(pdf["amount_category"]) <= {"Budget", "Standard", "Premium"}
    assert "Premium" in set(pdf["amount_category"])
    assert set(pdf["season_type"]) <= {"Winter", "Spring", "Summer", "Fall"}
    assert set(pdf["frequency_category"]) <= {
        "Weekly",
        "Monthly",
        "Quarterly",
        "Annually",
    }
    assert set(pdf["loyalty_score"]) <= {"Low", "Medium", "High"}
    assert 0 < pdf["is_anomaly"].sum() < len(pdf) * 0.2
    assert (pdf["estimated_profit_usd"] <= pdf["final_amount_usd"]).all()
