#!/usr/bin/env python3
"""Times the relational q-subset's oracle SQL in in-process DuckDB over
the same sf parquet — the stand-in baseline Bench publishes next to its
own numbers so the Spark/DuckDB ratio trends automatically per round
(VERDICT r7 item 7). Driver-side tooling only — not part of the library.

Usage: duckdb_bench.py <sf_dir> <oracle_sql.json>
Prints ONE json line: {"duckdb_subset_secs": s, "n": k, "failed": [...]}
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sfdir, oracle_path):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    qs = {k: v for k, v in sorted(oracle.items()) if k.startswith("q")}
    # one untimed warm pass (parquet metadata/OS cache), mirroring Bench
    for sql in qs.values():
        try:
            con.sql(sql).fetchall()
        except Exception:
            pass
    total = 0.0
    n = 0
    failed = []
    per_query = {}
    for name, sql in qs.items():
        t0 = time.time()
        try:
            con.sql(sql).fetchall()
            # failures are excluded from the total so the Spark/DuckDB
            # ratio compares the SAME (successful) query set on both
            # sides; per-query times let the consumer intersect exactly.
            elapsed = time.time() - t0
            total += elapsed
            per_query[name] = round(elapsed, 4)
            n += 1
        except Exception:
            failed.append(name)
    print(json.dumps({"duckdb_subset_secs": round(total, 3),
                      "n": n, "failed": failed, "queries": per_query}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
