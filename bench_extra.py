"""Isolated per-query measurement harness for optimization work (r7).

NOT part of the driver contract — bench.py is the frozen measured bench.
This file exists so individual analytical queries can be timed (and their
plans captured) without paying for the whole suite, per the optimization
guide §1 (measure first, label jobs, isolate with noop-ish sinks).

Usage:
    python bench_extra.py [--sf DIR] [--repeat N] [--explain] [query ...]

Timing methodology matches bench.py exactly: wall of `fn(spark, SF_DIR)`
+ `df.count()` in a fresh local[$SPARK_GRAFT_CPUS] session with the same
session config.  `--explain` additionally writes
plans/r07/<query>_current.txt with df.explain("formatted") output.
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def make_session(cores: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"smartreader-bench-extra-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "12g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC -Xms2g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    args = sys.argv[1:]
    sf = SF_DIR
    repeat = 1
    explain = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            i += 1
            sf = args[i]
        elif a == "--repeat":
            i += 1
            repeat = int(args[i])
        elif a == "--explain":
            explain = True
        else:
            names.append(a)
        i += 1

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if not names:
        names = list(qs)
    spark = make_session(CPUS)
    results: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        walls = []
        for r in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{r}")
            t0 = time.time()
            df = fn(spark, sf)
            n = df.count()
            walls.append(round(time.time() - t0, 2))
        results[name] = walls
        print(f"{name}: {walls} rows={n}", flush=True)
        if explain:
            os.makedirs("plans/r07", exist_ok=True)
            df = qs[name](spark, sf)
            txt = spark.sparkContext._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r07/{name}_current.txt", "w") as fh:
                fh.write(txt)
    spark.sparkContext.setJobDescription(None)
    print({k: min(v) for k, v in results.items()})


if __name__ == "__main__":
    main()
