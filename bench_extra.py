"""Per-query isolation bench (guide §1.4): times individual declared queries
with the same construct -> warmup -> timed noop-sink methodology as bench.py,
prints one JSON line, and optionally dumps .explain("formatted") per query.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
    python bench_extra.py --explain-dir plans/r06 --suffix before q1 q2
    python bench_extra.py --repeat 2 q1        # min of k timed runs

This file is NOT the driver's frozen bench; it exists so optimization
evidence (OPTIMIZATION_r06.md) can cite isolated per-query numbers without
touching bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orientdb_neo4j_importer_plugin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    spark = get_spark(master=f"local[{CPUS}]", app_name="bench_extra")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # warmup JVM

    qset = entrymod.queries()
    times: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        df = qset[name](spark, SF_DIR)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            with open(
                os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        _run(df)  # warmup: codegen compile
        runs = []
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            _run(df)
            runs.append(round(time.perf_counter() - t0, 3))
        times[name] = min(runs)
        samples[name] = runs
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "queries_min": times,
        "queries_samples": samples,
        "value": round(sum(times.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
