"""Run the full oracle sweep at an arbitrary sf dir with per-query timing.

Used for the sf1 validation sweep (VERDICT r3 item #1): the driver tops
out at sf0.1, so scale validation runs against the repo's own generated
data (columnflow_spark/testgen.py).

    python scripts/sweep_sf.py <sf_dir> <out_jsonl>
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    # size the single-JVM driver to the box: local[32] runs all executor
    # threads in the driver heap, and sf>=1 aggregation buffers do not fit
    # the 1g vanilla default (observed OOM in ObjectHashAggregate at sf1)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "64g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from columnflow_spark.oracle import compare, duckdb_connection, CompareResult
    from columnflow_spark.queries import all_oracles, all_queries

    queries, oracles = all_queries(), all_oracles()
    con = duckdb_connection(sf_dir)
    n_fail = 0
    done: set[str] = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            done = {json.loads(line)["name"] for line in fh if line.strip()}
    # optional subset: comma-separated names (targeted re-validation of a
    # round's new/changed queries without the full 50-minute sweep)
    subset = os.environ.get("SWEEP_QUERIES")
    if subset:
        keep = {s for s in subset.split(",") if s}
        queries = {k: v for k, v in queries.items() if k in keep}
    from columnflow_spark.oracle import (
        STEPWISE_PREFIXES,
        compare_frames,
        run_oracle_stepwise,
    )

    # cross-query step cache for the iterative oracle families: the 8
    # graph-ANN oracles share their build CTEs (ge/bk/cand/.../adj), so
    # stepwise execution pays the 6-8 min build replay ONCE per sweep
    # instead of per query (VERDICT r10 next #7); steps are hash-VERSIONED so
    # variant chains (predicated builds) coexist without name thrash
    step_tables: set[str] = set()
    stepwise = os.environ.get("SWEEP_STEPWISE_ORACLES", "1") not in ("0", "false")

    with open(out_path, "a") as out:
        for name, fn in sorted(queries.items()):
            if name in done:
                continue
            # engine and oracle sides timed separately (VERDICT r9 next
            # #6/#7): rows dominated by a DuckDB recursive-closure oracle
            # (leakage_safe_split, dedup_cluster_stats, ...) must not be
            # read as engine cost
            t0 = time.time()
            t_engine = t_oracle = 0.0
            try:
                if name not in oracles:
                    cnt = fn(spark, sf_dir).count()
                    t_engine = time.time() - t0
                    res = CompareResult(name, cnt >= 0, cnt, -1, [])
                else:
                    spark_pdf = fn(spark, sf_dir).toPandas()
                    t_engine = time.time() - t0
                    t1 = time.time()
                    if stepwise and name.startswith(STEPWISE_PREFIXES):
                        oracle_pdf = run_oracle_stepwise(con, oracles[name], step_tables)
                    else:
                        oracle_pdf = con.sql(oracles[name]).df()
                    t_oracle = time.time() - t1
                    res = compare_frames(name, spark_pdf, oracle_pdf)
            except Exception as ex:  # noqa: BLE001 - record, keep sweeping
                res = CompareResult(name, False, -1, -1, [f"exception: {ex!r:.500}"])
            dt = time.time() - t0
            n_fail += not res.ok
            out.write(json.dumps({
                "name": name, "ok": res.ok, "sec": round(dt, 2),
                "engine_sec": round(t_engine, 2), "oracle_sec": round(t_oracle, 2),
                "spark_rows": res.spark_rows, "oracle_rows": res.oracle_rows,
                "issues": res.issues,
            }) + "\n")
            out.flush()
    print(f"DONE {len(queries)} queries, {n_fail} failures")


if __name__ == "__main__":
    main()
