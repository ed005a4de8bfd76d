#!/usr/bin/env python3
"""Scale-tier oracle check (VERDICT r9 item 1): run the DuckDB oracle for
the heavy query family against a ScaleUp-synthesized sf1 dir and emit
CORRECTNESS_sf1.json.

Differences from the sf0.01 gate (tools/check_oracle.py, which this
wraps per query):

* Each oracle runs under a HARD TIMEOUT. Several oracles are
  deliberately brute-force ("the oracle is allowed to brute-force
  because it runs at sf0.01 only" — PipelineQueries header): token
  postings pair joins and recursive reachability are quadratic-plus in
  the corpus and do not terminate at 50k docs. Those entries are
  recorded as oracle_infeasible with the reason, NOT silently dropped —
  their sf1 correctness evidence is the IN-QUERY gates (require()
  invariants: recall floors, crossing==0 audits, whiteness proofs,
  conservation counts) that executed inside the Verify run itself.
* The JSON records, per query: whether the sf1 engine run completed
  (ran), row count, the oracle outcome (ok / mismatch / infeasible /
  error), and the in-query gates that constitute sf1 evidence when the
  oracle cannot.

Usage: check_oracle_sf1.py <verify_out_dir> <sf1_dir> <out_json> [q...]
Driver-side tooling only — not part of the library.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# In-query require() gates per entry — what Verify's exit 0 proves at
# sf1 even where the DuckDB oracle cannot run. Kept next to the tool so
# the JSON is self-describing.
IN_QUERY_GATES = {
    "p09_embedding_neardup": "probe-prefix recall floor >= 99.5% vs exact truth",
    "p28_bloom_decontaminate": "exact containment over a bounded eval prefix is a subset of the bloom result (anti-join == 0)",
    "p80_prefix_jaccard": "brute-force probe-prefix pair set fully contained in the PPJoin result (anti-join == 0)",
    "p86_group_split": "leakage audit: near-dup pair crossing count == 0 across folds",
    "p88_group_split_star": "leakage audit: crossing == 0 with star-CC grouping",
    "p99_embedding_whiten": "post-whiten covariance == identity (in-query whiteness require)",
    "io13_merge_upsert": "row conservation on the touched slice; untouched partitions byte-identical",
    "p104_langid_route": "router accuracy == 100% on the planted corpus",
    "p105_entity_em": "EM separates all-agree (posterior > 0.9) from all-disagree (< 0.1)",
    "p36_curation_pipeline": "exact (dfCap=0) containment vs a broadcast probe prefix finds no surviving contaminated doc",
    "p97_group_split_minhash": "leakage audit: near-dup pair crossing count == 0 across folds (minhash-fed CC labels)",
    "p10_ngram_jaccard_dedup": "exact probe-prefix shingle-Jaccard truth is a subset of the dfCap'd result (anti-join == 0)",
    "p20_decontaminate": "exact (dfCap=0) probe-prefix containment is a subset of the dfCap'd result (anti-join == 0)",
    "p35_incremental_dedup": "exact new-prefix x old-corpus truth >=99% covered by the landed-index pairs (banding S-curve midpoint sits AT t=0.5, so boundary pairs miss by design)",
}


def run_one(verify_dir, sf_dir, query, timeout_s):
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_oracle.py"),
             verify_dir, sf_dir, query],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"oracle": "infeasible",
                "detail": f"oracle exceeded {timeout_s}s (brute-force "
                          "oracle, sf0.01-only by design)",
                "oracle_s": round(time.time() - t0, 1)}
    out = p.stdout.strip().splitlines()
    line = next((l for l in out if l.startswith(("ok", "FAIL"))), "")
    if line.startswith("ok"):
        return {"oracle": "ok", "detail": line.strip(),
                "oracle_s": round(time.time() - t0, 1)}
    return {"oracle": "mismatch" if "FAIL" in line else "error",
            "detail": (line or p.stderr[-400:]).strip(),
            "oracle_s": round(time.time() - t0, 1)}


def main():
    verify_dir, sf_dir, out_json = sys.argv[1:4]
    queries = sys.argv[4:]
    timeout_s = int(os.environ.get("SF1_ORACLE_TIMEOUT", "420"))
    # merge into an existing JSON so the check can run in batches
    results = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            results = json.load(f)
    for q in queries:
        qdir = os.path.join(verify_dir, q)
        # a failed query leaves an _ERROR marker (Verify clears partial
        # parquet first), so parquet-present AND marker-absent means the
        # query — including its in-query require() gates — succeeded in
        # the run that produced this dir
        failed_marker = os.path.exists(os.path.join(qdir, "_ERROR"))
        ran = (os.path.isdir(qdir) and not failed_marker and any(
            f.endswith(".parquet") for f in os.listdir(qdir)))
        row = {"ran_at_sf1": ran}
        if not ran:
            row.update(oracle="error",
                       detail=("query FAILED at sf1 (_ERROR marker)"
                               if failed_marker else "no verify output at sf1"))
        else:
            import duckdb
            row["spark_rows"] = duckdb.sql(
                f"SELECT COUNT(*) FROM read_parquet('{qdir}/*.parquet')"
            ).fetchone()[0]
            row.update(run_one(verify_dir, sf_dir, q, timeout_s))
        if q in IN_QUERY_GATES:
            row["in_query_gate"] = IN_QUERY_GATES[q]
            # a failed require() lands in the _ERROR marker path above,
            # so ran=True here means the gate executed and held
            row["in_query_gate_passed"] = ran
        results[q] = row
        print(f"{q}: {row['oracle'] if 'oracle' in row else '?'} "
              f"({row.get('detail', '')[:80]})", flush=True)
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    ok = sum(1 for r in results.values() if r.get("oracle") == "ok")
    inf = sum(1 for r in results.values() if r.get("oracle") == "infeasible")
    bad = len(results) - ok - inf
    print(f"== sf1: {ok} oracle-green, {inf} oracle-infeasible "
          f"(in-query-gated), {bad} failed")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
