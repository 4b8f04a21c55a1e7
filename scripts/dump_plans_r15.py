"""Dump ``.explain("formatted")`` for named catalog queries into
``plans/r15/<name>_<tag>.txt`` (r15 deliverable: before/after plan
evidence for every query the optimization round touched).

Usage::

    python scripts/dump_plans_r15.py before q1 q2 ...
    python scripts/dump_plans_r15.py after  q1 q2 ...

Iterative operators checkpoint per round, so the catalog query's own
explain shows the final segment over opaque RDD scans — exactly how the
driver sees it; the factored round-body shapes live in
``scripts/explain_audit.py`` (the @-entries), which asserts them
machine-checkably. Plans here are captured at sf0.01 (plan SHAPE is
scale-free; building an iterative query's DataFrame runs its loop, so
the small SF keeps capture cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflow_flex_pyarrow_to_gds_spark import get_spark
from dataflow_flex_pyarrow_to_gds_spark import queries as catalog


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans_r15_{tag}")
    qs = dict(catalog.queries())
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record the failure loudly
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
