#!/usr/bin/env python3
"""Parallel variant of selfcheck.py for large SFs.

Usage: python3 tools/selfcheck_par.py <outDir> <sfDir> [workers] [perQueryTimeoutSec]

Same compare semantics as selfcheck.py (it imports them), but each query's
DuckDB oracle runs in its own worker process — at sf1 several oracles are
individually CPU-heavy (list-lambda minhash, unrolled label propagation) and
a serial pass is wall-clock-bound by their sum. A per-query timeout turns a
pathologically slow ORACLE (not engine) into a named TIMEOUT row instead of
hanging the run. NOT part of the shipped library — driver-side tooling only.
"""
import sys, json, glob, os
import multiprocessing as mp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import TABLES, compare  # noqa: E402


def run_one(args):
    rd, sf_dir, oracle_sql, timeout = args
    name = os.path.basename(rd)
    import duckdb
    import pandas as pd
    files = glob.glob(os.path.join(rd, "*.parquet"))
    if not files:
        return (name, "FAIL", "no parquet output")
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                         ignore_index=True)
    if oracle_sql is None:
        return (name, "SKIP", f"no oracle (rows={len(spark_df)})")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    try:
        duck_df = con.execute(oracle_sql).fetchdf()
    except Exception as e:
        return (name, "FAIL", f"oracle error {e}")
    from selfcheck import type_mismatch
    err = type_mismatch(sorted(files)[0], con, oracle_sql) \
        or compare(name, spark_df, duck_df)
    return (name, "FAIL", err) if err else (name, "PASS", f"{len(spark_df)} rows")


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    timeout = int(sys.argv[4]) if len(sys.argv) > 4 else 3600
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    result_dirs = sorted(d for d in glob.glob(os.path.join(out_dir, "*"))
                         if os.path.isdir(d))
    jobs = [(rd, sf_dir, oracles.get(os.path.basename(rd)), timeout)
            for rd in result_dirs]
    n_pass = n_fail = n_noracle = 0
    with mp.Pool(workers) as pool:
        results = [pool.apply_async(run_one, (j,)) for j in jobs]
        for job, res in zip(jobs, results):
            name = os.path.basename(job[0])
            try:
                name, status, msg = res.get(timeout=timeout)
            except mp.TimeoutError:
                status, msg = "FAIL", f"TIMEOUT after {timeout}s (oracle-side)"
            except Exception as e:
                status, msg = "FAIL", f"worker error {e}"
            print(f"{status} {name}: {msg}", flush=True)
            if status == "PASS":
                n_pass += 1
            elif status == "SKIP":
                n_noracle += 1
            else:
                n_fail += 1
    for name in oracles:
        if not os.path.isdir(os.path.join(out_dir, name)):
            print(f"FAIL {name}: declared oracle but no result dir")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
