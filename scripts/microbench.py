"""A/B microbench: time individual catalog queries at sf0.1.

Usage: python scripts/microbench.py NAME [NAME...] [--trials N]

Mirrors bench.py's protocol (warm-up at sf0.001, best-of-N with a noop
sink) so numbers are comparable to BENCH_r{N}.json, without paying for
the whole 38-query suite while iterating on one operator.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataflow_flex_pyarrow_to_gds_spark import get_spark
from dataflow_flex_pyarrow_to_gds_spark import queries as catalog


def main() -> None:
    argv = sys.argv[1:]
    trials = 3
    if "--trials" in argv:
        i = argv.index("--trials")
        trials = int(argv[i + 1])
        del argv[i : i + 2]
    args = argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="microbench")
    qs = catalog.queries()
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in args:
        qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {}
    for _ in range(trials):
        for name in args:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[name] = min(best.get(name, 1e9), dt)
    print(json.dumps({k: round(v, 3) for k, v in best.items()}))


if __name__ == "__main__":
    main()
