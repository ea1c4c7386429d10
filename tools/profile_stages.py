#!/usr/bin/env python
"""Run one driver entry under the noop protocol with event logging and
print per-stage durations + concurrency, to attribute a suite's exec
time to stages (the UI is disabled in the bench session; this is the
offline equivalent of the Stages tab).

    python tools/profile_stages.py q33 [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_DRIVER_MEMORY", "12g")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefix")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    evdir = tempfile.mkdtemp(prefix="spark_events_")
    from etl_pipelines_spark.session import get_spark

    spark = get_spark(
        "profile_stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    from etl_pipelines_spark.queries import DRIVER_QUERIES

    name = next(n for n in sorted(DRIVER_QUERIES) if n.startswith(args.prefix))
    spec = DRIVER_QUERIES[name]
    for r in range(args.runs):
        t0 = time.time()
        spec.spark_fn(spark, SF).write.format("noop").mode("overwrite").save()
        print(f"run{r}: {time.time()-t0:.2f}s", flush=True)
        spark.catalog.clearCache()
    spark.stop()

    # parse the event log: stage submit/complete windows
    logf = [os.path.join(evdir, f) for f in os.listdir(evdir)]
    stages = []
    for lf in logf:
        for line in open(lf):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                if sub and com:
                    stages.append(
                        (
                            sub,
                            com,
                            si["Stage ID"],
                            si["Number of Tasks"],
                            si["Stage Name"].split("\n")[0][:90],
                        )
                    )
    stages.sort()
    if not stages:
        print("no stages captured")
        return
    t0 = stages[0][0]
    print(f"{'stage':>5} {'start':>8} {'end':>8} {'dur':>7} {'tasks':>5}  name")
    for sub, com, sid, nt, nm in stages:
        print(
            f"{sid:>5} {(sub-t0)/1000:8.2f} {(com-t0)/1000:8.2f} "
            f"{(com-sub)/1000:7.2f} {nt:>5}  {nm}"
        )


if __name__ == "__main__":
    main()
