#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the raw testdata parquet and compare against the Spark result
parquet dumped by graft.Verify. Compares schema (column names), row count,
and values (sorted by all columns; doubles with 1e-9 tolerance).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def values_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        # exact: the driver hashes values, so bit-identity is the bar
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main(sf_dir, out_dir):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file parquet; Spark-written fixture
        # dirs (tools/ScaleDataGen output) are directories of part files
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    # Queries that errored during Verify never dump a dir, so iterating
    # dumped dirs alone silently shrinks the gate (r5: 119→83 unnoticed).
    # _errors.json makes every non-dumped query an explicit failure.
    err_path = f"{out_dir}/_errors.json"
    if os.path.exists(err_path):
        for name, msg in sorted(json.load(open(err_path)).items()):
            print(f"{name:28s} VERIFY-ERROR {msg[:160]}")
            failures += 1
    # Every oracle key must have a dumped dir (or a recorded error above).
    recorded = set(names) | (set(json.load(open(err_path)))
                             if os.path.exists(err_path) else set())
    for name in sorted(set(oracle) - recorded):
        print(f"{name:28s} MISSING-DUMP (no result dir, no recorded error)")
        failures += 1
    # CHECK_ORACLE_SKIP: comma-separated query names to pass over — for
    # scale-up replays where an oracle's own SQL is superlinear in DuckDB
    # (the multimodal fingerprint arithmetic at sf1 runs for hours / 100+ GB).
    # Skipped queries stay gated at the base sf; skipping is printed, never
    # silent.
    skip = set(filter(None,
                      os.environ.get("CHECK_ORACLE_SKIP", "").split(",")))
    for name in names:
        if name in skip:
            print(f"{name:28s} SKIPPED (CHECK_ORACLE_SKIP)")
            continue
        spark_rel = con.sql(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            n = spark_rel.aggregate("count(*)").fetchone()[0]
            print(f"{name:28s} NO-ORACLE rows={n} " +
                  ("OK" if n > 0 else "EMPTY!"))
            if n == 0:
                failures += 1
            continue
        try:
            duck = con.sql(oracle[name])
        except Exception as e:
            print(f"{name:28s} ORACLE-SQL-ERROR {str(e)[:160]}")
            failures += 1
            continue
        scols = sorted(spark_rel.columns)
        dcols = sorted(duck.columns)
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            print(f"{name:28s} SCHEMA-MISMATCH spark={scols} duck={dcols}")
            failures += 1
            continue
        srows = spark_rel.df()[scols].values.tolist()
        drows = duck.df()[dcols].values.tolist()
        if len(srows) != len(drows):
            print(f"{name:28s} ROWCOUNT spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        key = lambda r: tuple(str(norm(v)) for v in r)
        srows.sort(key=key)
        drows.sort(key=key)
        bad = None
        for i, (sr, dr) in enumerate(zip(srows, drows)):
            for j, (sv, dv) in enumerate(zip(sr, dr)):
                if not values_equal(sv, dv):
                    bad = (i, scols[j], sv, dv)
                    break
            if bad:
                break
        if bad:
            print(f"{name:28s} VALUE-MISMATCH row={bad[0]} col={bad[1]} "
                  f"spark={bad[2]!r} duck={bad[3]!r}")
            failures += 1
        else:
            print(f"{name:28s} OK rows={len(srows)}")
    print(f"\n{'FAILURES: ' + str(failures) if failures else 'ALL OK'}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
