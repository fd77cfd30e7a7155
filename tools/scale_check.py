#!/usr/bin/env python3
"""Empirical scaling report: compare two bench artifacts measured at two
scale factors and grade each query's wall-clock growth against the data
growth (round-11 verdict ask #4 — scale evidence as an artifact, not a
ledger claim).

Usage:
  python3 tools/scale_check.py SMALL.json BIG.json FACTOR [--json OUT.json]

For each query present in both artifacts, reports
  ratio   = big_median / small_median
  expo    = log(ratio) / log(FACTOR)   (1.0 = linear, <1 sublinear)
and a verdict:
  sublinear  ratio <= 0.5*FACTOR            (fixed overhead dominates or
                                             the plan scales better than n)
  linear     ratio <= 1.5*FACTOR            (n log n lands here too)
  SUPERLINEAR otherwise — a scale smell to explain or fix.

Medians come from the median-of-N runner, so single contended reps don't
flip a verdict; the raw reps of both runs stay in their artifacts.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["parsed"] if isinstance(d.get("parsed"), dict) else d


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    small, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3])
    out_path = None
    if "--json" in sys.argv:
        out_path = sys.argv[sys.argv.index("--json") + 1]
    sq, bq = small["queries"], big["queries"]
    shared = sorted(set(sq) & set(bq))
    rows = []
    for q in shared:
        a, b = sq[q], bq[q]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        expo = math.log(ratio) / math.log(factor) if ratio > 0 else 0.0
        verdict = ("sublinear" if ratio <= 0.5 * factor
                   else "linear" if ratio <= 1.5 * factor
                   else "SUPERLINEAR")
        rows.append({"query": q, "small_s": a, "big_s": b,
                     "ratio": round(ratio, 2), "exponent": round(expo, 2),
                     "verdict": verdict})
    rows.sort(key=lambda r: -r["ratio"])
    n_super = sum(r["verdict"] == "SUPERLINEAR" for r in rows)
    print(f"scale_check: {len(rows)} shared queries, data factor {factor}x")
    print(f"  small: {sys.argv[1]} total={small.get('value')}s  "
          f"big: {sys.argv[2]} total={big.get('value')}s")
    print(f"  verdicts: "
          f"{sum(r['verdict'] == 'sublinear' for r in rows)} sublinear, "
          f"{sum(r['verdict'] == 'linear' for r in rows)} linear, "
          f"{n_super} SUPERLINEAR")
    for r in rows[:20]:
        print(f"  {r['query']:36s} {r['small_s']:8.3f}s -> {r['big_s']:8.3f}s"
              f"  {r['ratio']:6.2f}x  exp={r['exponent']:5.2f}  {r['verdict']}")
    if out_path:
        art = {"factor": factor, "small": sys.argv[1], "big": sys.argv[2],
               "small_total": small.get("value"), "big_total": big.get("value"),
               "small_env": small.get("env"), "big_env": big.get("env"),
               "n_superlinear": n_super, "queries": rows}
        with open(out_path, "w") as f:
            json.dump(art, f, indent=2)
        print(f"wrote {out_path} ({len(rows)} queries)")
    return 1 if n_super else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:
        sys.exit(0)
