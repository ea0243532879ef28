"""Extra per-query benchmarks for optimization work (guide §1.4).

NOT the driver contract — bench.py is frozen for measurement. This
harness isolates individual declared queries with the noop sink so a
change's effect is visible without waiting for the full bench:

  python bench_extra.py [--sf DIR] [--rounds N] [--plans OUTDIR] q1 q2 ...

Times each named query over N fully interleaved rounds (q1..qn per
round), prints one JSON line {"sf":..., "queries": {name: median},
"spread": {name: [min,max]}}; with --plans, also writes each query's
.explain("formatted") to OUTDIR/<name>.txt before timing.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--plans", default=None)
    args = ap.parse_args()

    from rios_spark.queries import QUERIES
    from rios_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)

    def _force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.names:
            df = QUERIES[name](spark, args.sf)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    from pyspark.sql import functions as F

    def _alu() -> float:
        # pure-ALU host-health control, same construct as bench.py
        x = (F.col("id") % 1000).cast("double")
        ctl = spark.range(60_000_000, numPartitions=cpus * 4).select(
            F.sum(F.sin(x) * F.cos(x) + F.sqrt(x + 1.0) - F.log(x + 2.0)).alias("s")
        )
        t0 = time.monotonic()
        ctl.collect()
        return round(time.monotonic() - t0, 3)

    _alu()  # warm
    for name in args.names:  # warm: plan + fs cache
        spark.sparkContext.setJobDescription(f"warm:{name}")
        _force(QUERIES[name](spark, args.sf))
    samples: dict[str, list[float]] = {n: [] for n in args.names}
    controls: list[float] = []
    for _ in range(args.rounds):
        controls.append(_alu())
        for name in args.names:
            spark.sparkContext.setJobDescription(f"bench:{name}")
            t0 = time.monotonic()
            _force(QUERIES[name](spark, args.sf))
            samples[name].append(round(time.monotonic() - t0, 3))
    out = {
        "sf": args.sf,
        "alu_controls": controls,
        "queries": {n: round(float(statistics.median(s)), 3) for n, s in samples.items()},
        "spread": {n: [min(s), max(s)] for n, s in samples.items()},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
