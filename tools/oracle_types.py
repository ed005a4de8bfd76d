#!/usr/bin/env python3
"""Sanctioned-type gate for oracle SQL: every column every oracle query
produces in DuckDB must be one of the repo's sanctioned result types.
DuckDB widens aggregates beyond what Spark emits (SUM(INTEGER) →
HUGEINT/int128) and the driver's hasher is type-sensitive, so an uncast
aggregate passes a value-only compare locally yet fails the driver
(round 5: q41). This gate makes that class unrepresentable: any new
oracle with an unsanctioned output type fails ContractSpec at build
time, not the driver three rounds later.

Sanctioned = types the round-5 driver gate has proven hash-compatible
between Spark parquet output and DuckDB evaluation.

Usage: oracle_types.py <oracle_sql.json> <sf_dir>
Prints offending name.column:type lines; exit 1 if any.
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

SANCTIONED = {
    "BIGINT", "INTEGER", "DOUBLE", "BOOLEAN", "VARCHAR", "DATE",
    "TIMESTAMP",
    # q17 total_rev: DuckDB SUM(DECIMAL(15,2)) = DECIMAL(38,4), and Spark
    # sum over the same parquet decimal lands on the same type — driver-
    # verified green since round 4. Any OTHER decimal width is a smell.
    "DECIMAL(38,4)",
}


def main(oracle_json, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(oracle_json))
    bad = []
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
        except Exception as e:
            bad.append(f"{name}: oracle SQL failed to plan: {e}")
            continue
        for c, ty in zip(rel.columns, rel.types):
            if str(ty) not in SANCTIONED:
                bad.append(f"{name}.{c}: {ty}")
    for b in bad:
        print(b)
    print(f"== {len(oracle)} oracles checked, {len(bad)} unsanctioned columns")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
