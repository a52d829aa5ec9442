"""Driver-contract cwd-independence (VERDICT r8 "What's wrong" item 1).

The round driver imports ``__spark_entry__`` via ``sys.path.insert`` and
may run from ANY cwd. ``sys.path`` edits don't propagate to Spark's
Python workers — only an inherited repo-root cwd made the 10
mapper-internal package imports (``operators/text.py``, ``quantize.py``,
``similarity.py``, ``multimodal.py``) work before r9. The fix
(``session.ensure_package_on_workers``: package zip + ``addPyFile``,
invoked from BOTH ``get_spark`` and the ``load_table`` catalog boundary
so driver-OWNED sessions are covered) must keep those entries green when
the harness cwd is a foreign directory.

This test spawns a REAL subprocess with cwd=tmp_path and a plain
``SparkSession.builder`` session (driver-owned style — deliberately NOT
``get_spark``), and runs one entry from each formerly-failing mapper
family at sf0.001. ~60 s: a fresh JVM is the point — an in-process test
would inherit this suite's repo-root cwd and prove nothing.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .appName("cwd-independence-test")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
from streamlit_projet_spark_streaming_spark.registry import REGISTRY
# one entry per formerly-failing mapper family (text / multimodal /
# similarity+quantize) — each ships a package import inside its Arrow
# mapper, which only works if the worker can import the package zip
for name in ["text_compression_signals", "multimodal_metadata",
             "embedding_semantic_dedup"]:
    n = REGISTRY[name].builder(spark, "/root/testdata/sf0.001").count()
    assert n > 0, (name, n)
    print("PASS", name, n)
print("ALL-PASS")
"""


def test_mapper_entries_run_from_foreign_cwd(tmp_path):
    script = tmp_path / "probe.py"
    script.write_text(_SCRIPT.format(repo=REPO))
    env = dict(os.environ)
    # the repo must NOT be reachable via cwd or PYTHONPATH in the worker:
    # strip any repo entry so only the shipped zip can satisfy the import
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "ALL-PASS" in proc.stdout
