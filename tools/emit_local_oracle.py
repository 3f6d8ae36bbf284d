#!/usr/bin/env python
"""Emit LOCAL_ORACLE_r{N}.json — the full local oracle sweep as an artifact.

The driver's per-round CORRECTNESS file covers a 50-query prefix; the
other registered queries are verified each round only by the local
replica (tests/test_queries_oracle.py), which the judge cannot see.
This script runs that exact comparison for EVERY registered query at the
driver's scale (sf0.01) under a vanilla session (driver conditions: no
tuned confs, foreign cwd is fine because queries ship the package), and
writes one JSON file per round so attestation rotation never hides a
regression.

Usage: python tools/emit_local_oracle.py <round> [sf_dir] [skip_regex]

With sf_dir other than sf0.01 the artifact is suffixed with the scale tag
(LOCAL_ORACLE_sf01_r{N}.json for sf0.1 — the r8 cross-scale lap, VERDICT
r7 #8: constants tuned at one scale can pass vacuously at another, so the
non-iterative oracled queries get one pass at sf0.1 too). skip_regex
excludes keys whose ORACLE side is documented to spill/blow up in DuckDB
at the larger scale (iterative closures, quadratic truth sets); skipped
keys are recorded as "skipped", never silently dropped.

r9 (VERDICT r8 #8): a skip-matched key with an entry in ALT_ORACLES runs
against that NON-RECURSIVE closed-form oracle instead of skipping — the
synthetic closure graphs are block-local, so their closure counts/pair
sets have O(n) closed forms the recursive CTE spills on. The closed
forms are cross-validated against the recursive oracles at sf0.001 and
sf0.01 by tests/test_sparql_paths.py, so a pass here carries the same
weight as the primary oracle. Recorded with mode "oracle_closed_form".

r10 (VERDICT r9 #7): a skip-matched key with an entry in INVARIANTS runs
a STRUCTURAL-INVARIANT check instead of skipping: the Spark result is
registered as a DuckDB view and a violation query over it + the parquet
tables must return ZERO rows. Used where the exact oracle's unrolled
iteration rounds spill DuckDB at sf0.1 (q_sssp: the invariant is the
Bellman fixpoint equations + tightness + closure, whose unique solution
with positive weights IS the shortest-path labeling). Cross-validated at
sf0.01 against the exact oracle, with perturbation-rejection, by
tests/test_graph_analytics.py. Recorded with mode "oracle_invariant".
Note the r10 lap also STOPS skipping q_pagerank/q_kmeans: their unrolled
oracles measure 0.4 s / 1.3 s at sf0.1 — they were regex-skipped, never
actually expensive (the r9 lap's skip list was over-broad).
"""

from __future__ import annotations

import json
import os
import re
import sys
import traceback


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    skip_re = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode hosts the executors INSIDE the driver JVM (BASELINE.md
        # heavy-closure note): the sf0.1 closures the r9 lap un-skipped
        # hold ~6.8M pairs, beyond the 1g default. Correctness-only knob —
        # a real cluster spreads the same state across executor memory.
        .config("spark.driver.memory", "16g")
        .appName("local-oracle-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from d_sparq_spark import registry
    from d_sparq_spark.sources.synth_graph import (
        synth_closure_closed_sql,
        synth_hub_closure_closed_sql,
    )
    from tests.oracle import canon, run_oracle

    alt_oracles = {
        "q_sparql_path_plus_big": synth_closure_closed_sql(False),
        "q_closure_big_int": synth_closure_closed_sql(False),
        "q_sparql_path_plus_big_seeded": synth_closure_closed_sql(True),
        "q_sparql_path_plus_hub": synth_hub_closure_closed_sql(False),
        "q_sparql_path_plus_hub_seeded": synth_hub_closure_closed_sql(True),
    }
    from d_sparq_spark.queries.graph_analytics import sssp_invariant_sql
    from tests.oracle import run_invariant

    invariants = {"q_sssp": sssp_invariant_sql()}

    out: dict[str, dict] = {}
    for name, q in registry.all_queries().items():
        entry: dict = {"mode": "oracle" if q.oracle else "rows_only"}
        oracle = q.oracle
        invariant = None
        if skip_re is not None and skip_re.search(name):
            if name in alt_oracles:
                oracle = alt_oracles[name]
                entry["mode"] = "oracle_closed_form"
            elif name in invariants:
                invariant = invariants[name]
                entry["mode"] = "oracle_invariant"
            else:
                entry["status"] = "skipped"
                out[name] = entry
                print(name, "skipped", flush=True)
                continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
            entry["rows"] = int(len(sdf))
            if invariant is not None:
                viol = run_invariant(invariant, sf_dir, {"spark_result": sdf})
                entry["violations"] = [str(v) for v in viol.iloc[:, 0]][:5]
                entry["status"] = (
                    "pass" if len(viol) == 0 and len(sdf) > 0 else "fail"
                )
            elif oracle is None:
                entry["status"] = "pass" if len(sdf.columns) > 0 else "fail"
            else:
                odf = run_oracle(oracle, sf_dir)
                ok = (
                    len(sdf) == len(odf)
                    and sorted(sdf.columns) == sorted(odf.columns)
                    and canon(sdf).equals(canon(odf))
                )
                entry["status"] = "pass" if ok else "fail"
        except Exception as exc:  # keep sweeping; record the failure
            entry["status"] = "error"
            entry["err"] = f"{type(exc).__name__}: {exc}"[:300]
            traceback.print_exc(limit=1, file=sys.stderr)
        out[name] = entry
        print(name, entry["status"], flush=True)

    spark.stop()
    counts = {
        "total": len(out),
        "pass": sum(1 for e in out.values() if e["status"] == "pass"),
        "fail": sum(1 for e in out.values() if e["status"] == "fail"),
        "error": sum(1 for e in out.values() if e["status"] == "error"),
        "skipped": sum(1 for e in out.values() if e["status"] == "skipped"),
        "sf_dir": sf_dir,
    }
    doc = {"summary": counts, "queries": out}
    tag = os.path.basename(sf_dir.rstrip("/")).replace("sf0.", "sf0")
    suffix = "" if tag == "sf001" else f"_{tag}"
    path = os.path.join(repo, f"LOCAL_ORACLE{suffix}_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(counts))


if __name__ == "__main__":
    main()
