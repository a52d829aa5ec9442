"""Capture ``.explain("formatted")`` for registry queries into plans/<round>/.

Usage: python tools/explain_capture.py <suffix> <entry> [entry ...]
       python tools/explain_capture.py before ivf_cell_stats ivf_maintenance_report

The output round directory defaults to ``plans/r11`` and is overridable
with ``$SPARK_GRAFT_PLANS_DIR`` (an absolute or repo-relative directory).

Writes plans/<round>/<entry>_<suffix>.txt with the formatted physical plan
of the query as built (AQE initial plan — the judge checks plan claims
against these files). Builds plans only; runs no actions beyond what plan
construction itself triggers (the conditional-spread probe on scan-rooted
inputs is job-free).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streamlit_projet_spark_streaming_spark.registry import REGISTRY
from streamlit_projet_spark_streaming_spark.session import get_spark

_DEFAULT_ROUND_DIR = os.path.join("plans", "r11")


def main() -> None:
    if len(sys.argv) < 3:
        print(
            "usage: python tools/explain_capture.py <suffix> <entry> [entry ...]\n"
            "       (output dir: $SPARK_GRAFT_PLANS_DIR, default plans/r11)",
            file=sys.stderr,
        )
        raise SystemExit(2)
    suffix = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown registry entries: {unknown}", file=sys.stderr)
        raise SystemExit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.environ.get("SPARK_GRAFT_PLANS_DIR", _DEFAULT_ROUND_DIR)
    if not os.path.isabs(out_dir):
        out_dir = os.path.join(repo_root, out_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-capture")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].builder(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
