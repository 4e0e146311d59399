#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfdir] [verify_outdir] [query ...]

Reads each spark result parquet under verify_outdir/<name>/, runs the
matching oracle SQL from verify_outdir/oracle_sql.json in DuckDB over the
same sf tables, sorts columns by name, and compares shape + values exactly.
"""
import sys, json, glob, math
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray) else v)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if (pd.isna(a) is True) != (pd.isna(b) is True):
            return False
    except (TypeError, ValueError):
        pass
    try:
        if isinstance(a, float) or isinstance(b, float):
            return float(a) == float(b)
    except (TypeError, ValueError):
        pass
    return a == b

def type_family(t):
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    return "other"

def int_family_issues(spark_schema, duck_schema):
    """Type-strict gate on integer-family columns (round-8, per r07 verdict):
    the driver's hash gate is type-sensitive, so a Spark BIGINT vs DuckDB
    HUGEINT/DOUBLE column (e.g. a bare SUM(integer) in the oracle) must FAIL
    here even though the values match cell-for-cell."""
    issues = []
    sm = {f.name: f.type for f in spark_schema}
    dm = {f.name: f.type for f in duck_schema}
    for c in sorted(set(sm) & set(dm)):
        fs, fd = type_family(sm[c]), type_family(dm[c])
        if "int" in (fs, fd) and fs != fd:
            issues.append(
                f"col {c}: integer-family type mismatch spark={sm[c]} "
                f"duck={dm[c]} (driver hash gate is type-sensitive; "
                f"CAST the oracle aggregate)")
    return issues

def compare(name, spark_df, duck_df):
    issues = []
    s, d = norm(spark_df), norm(duck_df)
    if list(s.columns) != list(d.columns):
        return [f"columns differ: spark={list(s.columns)} duck={list(d.columns)}"]
    if len(s) != len(d):
        return [f"row count differ: spark={len(s)} duck={len(d)}"]
    for c in s.columns:
        sv, dv = s[c].to_numpy(object), d[c].to_numpy(object)
        bad = [i for i in range(len(sv)) if not cells_equal(sv[i], dv[i])]
        if bad:
            i = bad[0]
            extra = ""
            try:
                diffs = [abs(float(sv[j]) - float(dv[j])) for j in bad
                         if sv[j] is not None and dv[j] is not None]
                if diffs:
                    extra = f" maxdiff={max(diffs):.3e}"
            except (TypeError, ValueError):
                pass
            issues.append(
                f"col {c}: {len(bad)}/{len(sv)} cells differ; first@{i}: "
                f"spark={sv[i]!r} duck={dv[i]!r}{extra}")
    return issues

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gverify"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Per-process spill dir (round 12): an in-memory DuckDB spills large
    # operators to cwd-relative .tmp/duckdb_temp_storage-N.tmp; parallel
    # check.py workers sharing one cwd DELETE EACH OTHER'S live spill on
    # cleanup (serial mystery crashes at sf1). mkdtemp gives each run a
    # fresh namespace (PIDs recycle), and the atexit hook reclaims the
    # multi-GB sf1 spill even on a crashed check (round-12 advice).
    import atexit, shutil, tempfile
    tmpdir = tempfile.mkdtemp(prefix="duckchk_")
    atexit.register(shutil.rmtree, tmpdir, ignore_errors=True)
    con.execute(f"SET temp_directory = '{tmpdir}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output at {out}/{name}")
            n_bad += 1
            continue
        spark_tbl = pq.read_table(files)
        spark_df = spark_tbl.to_pandas()
        try:
            # ONE execution per oracle: schema and data from the same
            # arrow table (round 12: the heavy sf1 oracles made the old
            # run-twice shape — .arrow() for schema, .df() for data —
            # pay double on multi-minute queries)
            duck_tbl = con.sql(sql).arrow()
            duck_schema = duck_tbl.schema
            duck_df = duck_tbl.to_pandas()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        issues = int_family_issues(spark_tbl.schema, duck_schema)
        issues += compare(name, spark_df, duck_df)
        if issues:
            print(f"FAIL {name}:")
            for i in issues:
                print(f"  - {i}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(spark_df)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
