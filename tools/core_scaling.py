"""Core-scaling evidence runner (round 12, VERDICT r11 item 2).

Times the named queries through the noop sink (warm + best-of-N) at the
given fixture dir under the CURRENT $SPARK_GRAFT_CPUS, printing one JSON
line. Run it twice back-to-back (SPARK_GRAFT_CPUS=32 then =8) per
fixture and compare sec8/sec32 per row — `wordcount` rides along as the
load sentinel so the two runs' host windows are comparable.

    SPARK_GRAFT_CPUS=8 python tools/core_scaling.py SF_DIR q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_kakfa_spark.registry import all_queries
from flink_kakfa_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    passes = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "2")))
    spark = get_spark("core-scaling")
    qs = all_queries()
    out: dict[str, float] = {}
    for name in names:
        def run() -> float:
            spark.sparkContext.setJobDescription(f"scale: {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            return dt

        run()  # warm
        out[name] = round(min(run() for _ in range(passes)), 3)
        print(f"## {name}: {out[name]}s", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "queries": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
