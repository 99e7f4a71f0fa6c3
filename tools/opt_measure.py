"""Optimization-round measurement harness (guide §1).

Times individual registered queries through the noop sink (warmup +
N timed passes, best-of), labels jobs, and captures
``.explain('formatted')`` to plans/<tag>/<name>_<suffix>.txt so plan
claims in OPTIMIZATION_r*.md are reproducible.

    python tools/opt_measure.py [--sf DIR] [--passes N] [--plans TAG:SUFFIX] name...

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS honored via session.get_spark.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kakfa_spark.registry import all_queries
from flink_kakfa_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--plans",
        default=None,
        help="TAG:SUFFIX -> write plans/<TAG>/<name>_<SUFFIX>.txt",
    )
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra k=v Spark conf (repeatable)",
    )
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark("opt-measure", extra_conf=extra or None)
    queries = all_queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    out: dict[str, float] = {}
    for name in args.names:
        q = queries[name]

        def run() -> float:
            # Build INSIDE the timed region, like bench.py does — for
            # queries with eager localCheckpoint builds the build IS
            # most of the cost and must stay in the measurement.
            spark.sparkContext.setJobDescription(f"opt: {name}")
            t0 = time.time()
            q(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            return dt

        run()  # warmup: codegen + file listing
        out[name] = round(min(run() for _ in range(args.passes)), 3)
        print(f"## {name}: {out[name]}s", file=sys.stderr)

        if args.plans:
            # ONE extra build serves both the static explain and the
            # AQE-final dump (previously explain and the timed runs each
            # built their own frame, doubling eager-checkpoint work).
            tag, suffix = args.plans.split(":", 1)
            plan_dir = os.path.join(repo, "plans", tag)
            os.makedirs(plan_dir, exist_ok=True)
            df = q(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            # The noop write runs its own command QueryExecution and
            # leaves THIS DataFrame's AdaptiveSparkPlanExec at
            # isFinalPlan=false; collect() finalizes it so the dump
            # carries the AQE-final exchange counts / join strategies
            # (like-for-like with tools/plan_audit.py).
            spark.sparkContext.setJobDescription(f"opt-finalize: {name}")
            df.collect()
            spark.sparkContext.setJobDescription(None)
            final = df._jdf.queryExecution().executedPlan().toString()
            final = final.split("== Initial Plan ==")[0]
            with open(os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
                f.write("\n\n== Final executed plan (post-collect, AQE-final) ==\n\n")
                f.write(final)

    print(json.dumps({"sf": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
