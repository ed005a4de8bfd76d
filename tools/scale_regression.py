#!/usr/bin/env python3
"""Scale-regression gate over the full query surface (VERDICT r10 item 2).

Compares a ×10 bench run (BENCH_sf1.json, produced by graft.Bench with
SPARK_GRAFT_SF_DIR pointing at a ScaleUp dir) against the committed
sf0.1 per-query map (BENCH_baseline.json), applying the sublinear-budget
law: at ×10 the data, a query's wall may grow at most 20× (10× data ×
2× constant-factor grace) unless it carries a named, gated exception.

Writes its verdict INTO the sf1 json under "scale_regressions" and exits
nonzero if any unexcepted query breaches the budget or failed outright.

Usage: scale_regression.py <BENCH_sf1.json> <BENCH_baseline.json>
Driver-side tooling only — not part of the library.
"""
import json
import sys

# Named exceptions: queries whose sf1 growth is allowed past the budget,
# each with the reason a reader needs. Keep this list SHORT — an entry
# here is a debt marker, not a free pass. Solo re-times below are TimeQ
# on the density-fixed ScaleUp corpus (cross-replica shingle-J 0.13-0.16,
# cross-replica cosine ~0), idle machine, r11.
EXCEPTIONS = {
    "q31_bitmap_hll":
        "FIXED in-round: collect_list bitmap build replaced by the "
        "mergeable Roaring aggregate; solo re-time 14.7s == the 20x "
        "budget (14.6s). The flagged 20.4s is the pre-fix number.",
    "p20_decontaminate":
        "within 1.05x of budget on the fixed corpus (60.5s vs 57.6s) "
        "and the sf0.1 baseline predates the r11-added linear-cost "
        "recall gate; re-baselines next round.",
    "p36_curation_pipeline":
        "within 1.2x of budget on the fixed corpus (73.8s vs 63.0s); "
        "same gate-baseline asymmetry as p20.",
    "p10_ngram_jaccard_dedup":
        "OPEN DEBT: 245s solo on the fixed corpus vs 52.5s budget "
        "(4.7x over; the r11 probe-truth gate contributes a large "
        "corpus-linear term absent from the baseline). Next round: "
        "re-baseline with the gate and profile the postings join.",
    "p07_ann_lsh":
        "OPEN DEBT (diagnosed): the threshold-0.45 hyperplane-LSH family is n^1.62 BY DESIGN between the bucket-occupancy regime and the SemDeDup-cell swap (autoLshParams at n=20k picks planes=8 / tables~180 vs 4/32 at n=2k; candidate work ~ tables*n*bucket). 10^1.62 = 42x against the 20x budget. Round-12 fix: engage the cell regime earlier (lower tablesCap / cellTarget crossover) or budget the family at its analytic exponent.",
    "p09_embedding_neardup":
        "OPEN DEBT (diagnosed): same n^1.62 LSH regime as p07 - at n=20k autoLshParams(0.45) yields planes=8/tables~180, 56x the sf0.1 posting volume; the dispatcher's cell swap engages only at n>~128k. Solo 361s vs 81s budget. Top round-12 item: move the regime crossover below the n^1.62/20x-law intersection (n~8k) or grade the family against its analytic exponent.",
    "p13_winnowing_dedup":
        "OPEN DEBT: 106s solo on the fixed corpus vs 35s budget (3x "
        "over). Winnowing fingerprint postings join suspected; "
        "next-round punch item.",
    "p68_semantic_decontaminate":
        "OPEN DEBT: 38s solo vs 15.6s budget (2.5x); same threshold-0.45 ANN family and n^1.62 regime as p07/p09.",
}

# Fixed floor: queries under this many seconds at sf1 are never flagged —
# a 0.05s -> 1.2s move is 24x but is job-overhead noise, not a scale cliff.
ABS_FLOOR_S = 2.0


def main():
    sf1_path, base_path = sys.argv[1], sys.argv[2]
    with open(sf1_path) as f:
        sf1 = json.load(f)
    with open(base_path) as f:
        base = json.load(f)
    q1 = sf1.get("queries", {})
    q0 = base.get("queries", {})
    failed = [k for k, v in q1.items() if v < 0]
    flags = []
    # Queries present at sf1 but missing/zero in the baseline cannot be
    # graded by the 20x law — say so (the repo's "no silent caps" rule):
    # a brand-new superlinear query must not pass by omission.
    ungraded = sorted(k for k, v in q1.items()
                      if v >= 0 and not (q0.get(k) or 0) > 0)
    for name, t1 in sorted(q1.items()):
        t0 = q0.get(name)
        if t1 < 0 or not t0 or t0 <= 0:
            continue
        ratio = t1 / t0
        if t1 >= ABS_FLOOR_S and ratio > 20.0:
            row = {"query": name, "sf0.1_s": round(t0, 3),
                   "sf1_s": round(t1, 3), "ratio": round(ratio, 1)}
            if name in EXCEPTIONS:
                row["exception"] = EXCEPTIONS[name]
            flags.append(row)
    breaches = [f for f in flags if "exception" not in f]
    sf1["scale_regressions"] = {
        "law": "sf1 wall <= 20x sf0.1 wall (abs floor 2s) or a named exception",
        "baseline_sha": base.get("sha", "?"),
        "failed_at_sf1": failed,
        "flagged": flags,
        "ungraded": ungraded,
        "breaches": len(breaches),
    }
    with open(sf1_path, "w") as f:
        json.dump(sf1, f, indent=1)
    n_compared = sum(1 for k in q1 if k in q0)
    print(f"compared {n_compared} queries; {len(failed)} failed at sf1; "
          f"{len(flags)} flagged; {len(breaches)} unexcepted breaches; "
          f"{len(ungraded)} ungraded (missing from baseline): {ungraded}")
    for f_ in flags:
        print("  ", f_)
    sys.exit(1 if (breaches or failed) else 0)


if __name__ == "__main__":
    main()
