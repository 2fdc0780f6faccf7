"""Per-query profiler: min-of-3 noop-sink timing + final AQE plan dump.

Usage: python tools/profile_queries.py OUTDIR [sf_dir] [query ...]

For each query (default: the bench HEADLINE list) this
- builds the frame, times ``write.format("noop")`` three times (min),
- captures ``explain("formatted")`` AFTER the last run, so the dumped
  plan is the final AQE plan (isFinalPlan=true): ReusedExchange,
  runtime join strategy changes and coalesced partitions are visible,
- writes ``OUTDIR/<query>.txt`` with the timing header + plan,
- prints one JSON line per query and a total at the end.

The methodology matches bench.py (same noop sink, same min-of-3), so
numbers are comparable; this tool exists to attribute time to plan
shape, not to replace the bench.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from end_to_end_database_pipeline_project_spark.plans import QUERIES
from end_to_end_database_pipeline_project_spark.plans import load_all  # noqa: F401
from end_to_end_database_pipeline_project_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or [n for n in HEADLINE if n in QUERIES]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("profile")

    # same warmup as bench.py: worker pool + table footers
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    from end_to_end_database_pipeline_project_spark.sources.catalog import (
        TABLES,
        load_table,
    )

    for t in TABLES:
        try:
            load_table(spark, sf_dir, t).count()
        except Exception:
            pass

    total = 0.0
    timings = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile: {name}")
        best = None
        df = None
        runs = []
        for _ in range(3):
            df = QUERIES[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 4))
            best = dt if best is None else min(best, dt)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(f"# {name}  min={best:.4f}s  runs={runs}  sf_dir={sf_dir}\n")
            f.write(plan)
        timings[name] = round(best, 4)
        total += best
        print(json.dumps({"query": name, "min": round(best, 4), "runs": runs}),
              flush=True)
    print(json.dumps({"metric": "profile_total", "value": round(total, 4),
                      "queries": timings}), flush=True)


if __name__ == "__main__":
    main()
