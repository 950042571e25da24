#!/usr/bin/env python
"""Run the driver-contract correctness gate locally: every (or a chosen
slice of) ``__spark_entry__.queries()`` entry vs its DuckDB oracle on
the same parquet tables, using the same canonicalization the grading
driver applies (tests/driver_sim.py).

    python scripts/oracle_sweep.py                 # whole contract
    python scripts/oracle_sweep.py --start 100     # resume a slice
    python scripts/oracle_sweep.py --names dedup_exact q1_pricing_summary
    python scripts/oracle_sweep.py --sf-dir /root/testdata/sf0.001
    python scripts/oracle_sweep.py --budget 5      # flag slow entries

The sweep is the repo's de-facto regression harness for the full
contract: any entry exceeding ``--budget`` seconds (default 5) is
tagged ``SLOW`` inline and re-listed in a summary, so plan-time
blowups (lineage re-derivation in iterative ops, a lost broadcast)
surface automatically as the contract ages.  Exit code 0 iff every
checked entry passes (rows-only entries count as pass when they
execute and return a row count); SLOW alone does not fail the sweep
(toy-scale wall-time is advisory — correctness gates are the pytest
plan-lint suite).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--master", default="local[8]")
    parser.add_argument("--start", type=int, default=0)
    parser.add_argument("--stop", type=int, default=None)
    parser.add_argument("--names", nargs="*", default=None)
    parser.add_argument(
        "--json",
        default=None,
        help="also write a machine-readable per-entry record (CORRECTNESS-"
        "style: pass/mode/wall_sec/detail + run metadata) to this path",
    )
    parser.add_argument(
        "--budget",
        type=float,
        default=5.0,
        help="per-entry wall-time budget in seconds; slower entries are "
        "tagged SLOW and re-listed in the summary (advisory, not a fail)",
    )
    args = parser.parse_args()

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import driver_sim  # noqa: E402
    import __spark_entry__ as entry  # noqa: E402
    from pyspark.sql import SparkSession  # noqa: E402

    shuffle = args.master[args.master.find("[") + 1 : args.master.find("]")]
    spark = (
        SparkSession.builder.master(args.master)
        .config(
            "spark.sql.shuffle.partitions",
            shuffle if shuffle.isdigit() else "8",
        )
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .appName("oracle-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = driver_sim.duckdb_conn(args.sf_dir)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    items = list(queries.items())
    if args.names:
        items = [(n, queries[n]) for n in args.names]
    else:
        items = items[args.start : args.stop]

    t0 = time.time()
    fails = []
    slow = []
    records: dict[str, dict] = {}
    for i, (name, fn) in enumerate(items):
        t = time.time()
        mode = "oracle" if name in oracles else "rows_only"
        try:
            if name in oracles:
                ok, msg = driver_sim.compare_query(
                    spark, con, fn, oracles[name], args.sf_dir
                )
            else:
                n = fn(spark, args.sf_dir).count()
                ok, msg = True, f"rows-only n={n}"
        except Exception as ex:  # noqa: BLE001 — report, don't abort the sweep
            ok, msg = False, f"EXC {type(ex).__name__}: {ex}"
        dt = time.time() - t
        records[name] = {
            "pass": ok,
            "mode": mode,
            "wall_sec": round(dt, 1),
            "detail": None if ok and mode == "oracle" else msg[:300],
        }
        if ok and dt > args.budget:
            slow.append((name, dt))
        tag = "OK " if ok else "FAIL"
        over = " SLOW" if ok and dt > args.budget else ""
        print(
            f"{args.start + i:3d} {tag} {name:32s} {dt:6.1f}s{over}"
            f" {'' if ok else msg[:300]}",
            flush=True,
        )
        if not ok:
            fails.append((name, msg))
    if args.json:
        import json as _json
        import subprocess as _sp

        try:
            commit = _sp.run(
                ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, check=True,
            ).stdout.strip()
        except Exception:  # noqa: BLE001
            commit = None
        with open(args.json, "w") as f:
            _json.dump(
                {
                    "method": (
                        "scripts/oracle_sweep.py — the grading driver's "
                        "exact canonicalized Spark-vs-DuckDB compare "
                        "(tests/driver_sim.py) run locally"
                    ),
                    "sf_dir": args.sf_dir,
                    "master": args.master,
                    "git_commit": commit,
                    "total_sec": round(time.time() - t0, 1),
                    "fails": len(fails),
                    "entries": records,
                },
                f,
                indent=1,
            )
    print(
        f"TOTAL {time.time() - t0:.0f}s fails={len(fails)} "
        f"slow(>{args.budget:g}s)={len(slow)}"
    )
    for name, dt in slow:
        print(f"SLOW {name}: {dt:.1f}s over {args.budget:g}s budget")
    for name, msg in fails:
        print(f"FAIL {name}: {msg[:500]}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
