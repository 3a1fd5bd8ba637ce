"""Ad-hoc per-query measurement harness for the optimization round
(guide §1.4/§1.5): times individual queries() entries with the noop sink,
optionally dumps .explain("formatted") to plans/r06/.

Usage:
  python bench_extra.py --sf /root/testdata/sf0.1 --trials 2 \
      dedup_minhash incremental_minhash
  python bench_extra.py --explain before dedup_minhash   # writes plans/r06/

bench.py stays FROZEN (driver contract); all extra numbers cited in
OPTIMIZATION_r06.md come from here.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from pyspider_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--explain", default=None,
                    help="suffix (before/after): write plans/r06/<q>_<suffix>.txt and skip timing")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus,
                      extra_confs={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for name in args.names:
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = f"plans/r06/{name}_{args.explain}.txt"
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
        spark.stop()
        return

    out: dict[str, list[float]] = {}
    for name in args.names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if not args.no_warm:
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        trials = []
        for _ in range(args.trials):
            t0 = time.time()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            trials.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = trials
        print(f"{name}: {trials}", flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
