"""Cross-engine text-semantics contract (r8 portability audit v4).

Pins byte-equality of the shared normalization surface on BOTH engines
for every divergence class measured this round:

- FULL vs SIMPLE Unicode case mapping (İ, final sigma, ß, ligatures) —
  closed by ``ascii_lower`` (translate over the 26 ASCII letters);
- Java ``\\s`` vs RE2 ``\\s`` (vertical tab U+000B) — closed by the
  explicit ``WS_CLASS``;
- one-arg trim's whitespace set (DuckDB strips NBSP/U+3000, Spark
  strips ASCII space only) — closed by two-arg ``trim(x, ' ')`` in
  ``NORM_SQL``;
- code-point agreement on emoji / combining chars / supplementary
  planes (measured to agree; pinned here so an engine upgrade that
  breaks it fails THIS test, not a driver round).

These run on literal probe strings — no fixtures — so they stay fast
and survive every fixture regeneration unchanged.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from streamlit_projet_spark_streaming_spark.operators.dedup import NORM_SQL, _norm

PROBES = [
    "plain ascii Text",
    "  leading and trailing  ",
    "MIXED Case WORDS",
    "İstanbul ß ΣΟΦΟΣ ﬁle DŽUNGLA Iı",  # full-vs-simple case mapping
    "a\x0bb\x0cc\rd\te\nf",  # VT / FF / CR / tab / LF
    "\xa0nbsp edges　",  # Unicode whitespace at the edges
    "emoji 👍 text é combining 🇫🇷 flag",  # supplementary planes
    "tab\tseparated\twords",
    "",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_norm_identical_on_both_engines(spark, duck):
    df = spark.createDataFrame([(s,) for s in PROBES], ["text"])
    spark_out = [
        r[0] for r in df.select(_norm(F.col("text"))).collect()
    ]
    sql = NORM_SQL.format(col="?")
    duck_out = [duck.execute(f"SELECT {sql}", [s]).fetchone()[0] for s in PROBES]
    assert spark_out == duck_out


def test_codepoint_semantics_agree(spark, duck):
    df = spark.createDataFrame([(s,) for s in PROBES if s], ["s"])
    spark_rows = df.select(
        F.length("s").alias("l"), F.substring("s", 2, 3).alias("sub")
    ).collect()
    for s, row in zip([p for p in PROBES if p], spark_rows):
        dl, dsub = duck.execute(
            "SELECT length(?), substr(?, 2, 3)", [s, s]
        ).fetchone()
        assert (row["l"], row["sub"]) == (dl, dsub), s
