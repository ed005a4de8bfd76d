#!/usr/bin/env python3
"""Local pre-validation of oracle parity (mirrors the driver's DuckDB
compare): reads each Verify output parquet, runs the matching oracle SQL
in DuckDB over the same sf tables, sorts columns by name and rows by
value, and diffs. Driver-side tooling only — not part of the library.

Usage: check_oracle.py <verify_out_dir> <sf_dir> [name_prefix...]
(prefixes restrict the check to matching queries — for use with a
filtered Verify run; the FULL run must always be checked unfiltered,
absence ≠ green)
"""
import json, math, os, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


INT64_CLASS = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
               "UTINYINT", "USMALLINT", "UINTEGER"}


def normty(t):
    return "BIGINT" if t in INT64_CLASS else t


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main(outdir, sfdir, prefixes=()):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is a single file; ScaleUp-synthesized dirs are
        # Spark-written DIRECTORIES of part files — glob those
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            got_cols = list(got_rel.columns)
            got_types = [str(t) for t in got_rel.types]
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp_types = [str(t) for t in exp_rel.types]
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        # Types compared in column-name-sorted order: the driver's hasher
        # is type-sensitive (round 5: DuckDB HUGEINT vs Spark BIGINT
        # failed q41 while the old str()-based compare here passed it —
        # the local mirror must be at least as strict as the gate it
        # mirrors). The one width the driver provably normalizes is
        # sub-64-bit ints (q07/q08/q43: Spark INT32 ranks vs DuckDB
        # BIGINT, driver-green since r4), so those fold to BIGINT here;
        # HUGEINT/int128 deliberately does NOT.
        got_ct = sorted(zip(got_cols, (normty(t) for t in got_types)))
        exp_ct = sorted(zip(exp_cols, (normty(t) for t in exp_types)))
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols spark={sorted(got_cols)} duck={sorted(exp_cols)}")
            n_bad += 1
        elif got_ct != exp_ct:
            diff = [(g, e) for g, e in zip(got_ct, exp_ct) if g != e]
            print(f"FAIL {name}: column types spark={diff[0][0]} duck={diff[0][1]}"
                  + (f" (+{len(diff)-1} more)" if len(diff) > 1 else ""))
            n_bad += 1
        elif got != exp:
            print(f"FAIL {name}: {len(got)} vs {len(exp)} rows")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff row {i}:\n    spark={g}\n    duck ={e}")
                    break
            else:
                print(f"  row count mismatch only (prefix equal)")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
