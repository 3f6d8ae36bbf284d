#!/usr/bin/env python
"""Isolate and time individual headline queries (guide §1: measure first).

Usage:
    python tools/bench_one.py q_sssp q_triangle_count [--runs 2] \
        [--explain-dir plans/r11 --explain-suffix before]

Same methodology as bench.py (noop sink, warm session, min-of-N), plus:
- spark.sparkContext.setJobDescription per query (guide §1.5),
- optional .explain("formatted") dump per query (guide §7.2).
Timing output is one JSON line: {"queries": {...}, "runs": N}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--explain-suffix", default="before")
    ap.add_argument("--no-time", action="store_true",
                    help="only dump plans, skip the timed runs")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from d_sparq_spark import registry
    from d_sparq_spark.session import build_session

    spark = build_session(app_name="d-sparq-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = registry.all_queries()

    # same global warm-up as bench.py so numbers are comparable
    all_q["q_flagship"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    from d_sparq_spark.sources.derived_rdf import (
        catalog_cached,
        derive_triples_cached,
        encoded_planning_stats_cached,
        encoded_store_cached,
        planning_stats_cached,
    )

    derive_triples_cached(spark, sf_dir).write.format("noop").mode("overwrite").save()
    catalog_cached(spark, sf_dir, "pt").ptable.count()
    for red, _ratio in catalog_cached(spark, sf_dir, "extvp")._extvp.values():
        red.count()
    enc, d = encoded_store_cached(spark, sf_dir)
    enc.count(), d.count()
    planning_stats_cached(spark, sf_dir)
    encoded_planning_stats_cached(spark, sf_dir)

    def njobs() -> int:
        v = spark._jsc.sc().dagScheduler().nextJobId()
        return v if isinstance(v, int) else v.get()

    timings: dict[str, float] = {}
    jobs: dict[str, int] = {}
    for name in args.names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            import io
            from contextlib import redirect_stdout

            df = all_q[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(
                    args.explain_dir, f"{name}_{args.explain_suffix}.txt"
                ),
                "w",
            ) as f:
                f.write(buf.getvalue())
        if args.no_time:
            continue
        best = float("inf")
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_one: {name}")
            j0 = njobs()
            t0 = time.perf_counter()
            all_q[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            jobs[name] = njobs() - j0  # jobs of one full invocation
            spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 4)

    print(json.dumps({"queries": timings, "jobs": jobs, "runs": args.runs}))
    spark.stop()


if __name__ == "__main__":
    main()
