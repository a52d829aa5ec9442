"""Driver-hashability guard over EVERY registry builder's output schema.

The driver's canonicalizer pandas-sorts each result over all columns and
dies with ``TypeError: unhashable type: 'list'`` on any complex-typed cell
— three r6 red rows (`embedding_quantize_int8`, `embedding_pq_codes`,
`embedding_pq_codes_trained`) plus two latent repeats found by schema scan
(`dedup_minhash_clusters`, `text_inverted_index`) were exactly this. This
test builds every registry plan (schema analysis only — no action) and
rejects top-level ArrayType/MapType/StructType so the class can never
ship again: stringify at the builder (``array_join`` / DuckDB
``array_to_string``), the `multimodal_features` pattern.
"""

from pyspark.sql.types import ArrayType, MapType, StructType

from streamlit_projet_spark_streaming_spark.registry import REGISTRY

from .conftest import SF_SMOKE


def test_no_complex_top_level_output_types(spark):
    offenders = []
    for name, entry in REGISTRY.items():
        df = entry.builder(spark, SF_SMOKE)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append(
                    f"{name}.{field.name}: {field.dataType.simpleString()}"
                )
    assert not offenders, (
        "driver-unhashable output columns (stringify via array_join "
        "in the builder + array_to_string in the oracle): "
        + "; ".join(offenders)
    )
