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
# here is a debt marker, not a free pass.
#
# r12 note: gates are now OFF in both timing surfaces (Bench/TimeQ run
# operator-only; Verify runs every gate), so the r11 "gate asymmetry"
# exceptions are gone by construction, and most of the r11 scale debt
# was closed in code (measured solo on the density-fixed ScaleUp corpus,
# gates off, idle machine, r12):
#   p07 87 s -> 20.9 s (budget 31.3), p68 38.4 s -> 4.6 s (15.6),
#   p13 105.5 s -> 21.6 s (35.0), p10 245 s (gate-inflated) -> 52 s.
EXCEPTIONS = {}

# ANALYTIC BUDGETS (the 20x law's sanctioned alternative): families whose
# per-decade growth has a DERIVED exponent the 20x constant-grace law
# cannot represent. Value = allowed sf1/sf0.1 wall ratio, with the
# derivation a reader can check. An entry here must cite a measured
# exponent, not a hope.
ANALYTIC_BUDGETS = {
    "p09_embedding_neardup": (85.0,
        "hyperplane-LSH pair enumeration at cos 0.45: rho = ln(1/r)/ln 2 "
        "~ 0.62 (r = 1 - acos(0.45)/pi = 0.649), so candidate work is "
        "n^1.62 = 42x/decade analytically (r10 probe measured 40.3x on "
        "candidate volume). The WALL decade ratio is dominated by the "
        "recall-floor-preserving parameterization STEP, not the smooth "
        "exponent: autoLshParams(0.45) moves (planes, tables) from "
        "(4, 32) at n=2k to (8, 181) at n=20k, a 56.6x posting-volume "
        "jump in one decade (181*20000 / 32*2000). Measured solo wall "
        "at this decade: 360.7 s (r12) / 404.4 s (r13) vs 5.81 s sf0.1 "
        "= 62-70x across runs (this box's documented +-20-30% "
        "run-to-run band). The r12 budget of 50x cited only the smooth "
        "candidate exponent and was below its OWN cited measurement "
        "(62x) -- never satisfiable. Budget = the 70x measured-band "
        "ceiling * ~1.2 noise margin; a structural regression (lost "
        "dfCap, postings blowup) still lands >>100x and fails. r12 "
        "MEASURED the only linear alternative (SemDeDup cells from "
        "n=8k): 54.5 s but 60% probe recall at the 2.5% probed-cell "
        "fraction a x10 corpus implies (sf1 recall gate failed) -- "
        "recall at this threshold is bought with this exponent or not "
        "at all (the curve is now a PipelineSpec law)."),
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
    # graded by the 20x law — and "must not pass by omission" means they
    # FAIL the gate (exit 1) until the sf0.1 baseline is refreshed to
    # cover them; a brand-new superlinear query gets no free round.
    ungraded = sorted(k for k, v in q1.items()
                      if v >= 0 and not (q0.get(k) or 0) > 0)
    for name, t1 in sorted(q1.items()):
        t0 = q0.get(name)
        if t1 < 0 or not t0 or t0 <= 0:
            continue
        ratio = t1 / t0
        budget, why = ANALYTIC_BUDGETS.get(name, (20.0, None))
        if t1 >= ABS_FLOOR_S and ratio > budget:
            row = {"query": name, "sf0.1_s": round(t0, 3),
                   "sf1_s": round(t1, 3), "ratio": round(ratio, 1),
                   "budget": budget}
            if name in EXCEPTIONS:
                row["exception"] = EXCEPTIONS[name]
            flags.append(row)
        elif why is not None and t1 >= ABS_FLOOR_S and ratio > 20.0:
            # within its analytic budget but over the generic law:
            # record it so the analytic grading is visible, not silent
            flags.append({"query": name, "sf0.1_s": round(t0, 3),
                          "sf1_s": round(t1, 3), "ratio": round(ratio, 1),
                          "budget": budget, "exception": why})
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
          f"{len(ungraded)} ungraded (missing from baseline — these FAIL "
          f"the gate until the baseline covers them): {ungraded}")
    for f_ in flags:
        print("  ", f_)
    sys.exit(1 if (breaches or failed or ungraded) else 0)


if __name__ == "__main__":
    main()
