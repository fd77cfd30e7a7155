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
and a verdict graded on the EXPONENT (r13 — the old ratio-vs-0.5x/1.5x
bands let exponent-1.18 growth grade "linear" at factor 10, overstating
scaling quality):
  sublinear    expo <  0.90
  linear       expo <= 1.05   (n log n lands here)
  SUPERLINEAR  expo >  1.05 — a scale smell to explain or fix.

Small-time guard: a SUPERLINEAR verdict only gates the exit code when the
big-side median is >= 1.0s — below that, sub-second host noise can move
an exponent past 1.05 on its own (0.08s -> 1.0s is "superlinear" but
means nothing); such rows are reported as SUPERLINEAR(small) and do not
fail the run.

Medians come from the median-of-N runner (interleaved reps since r13),
so single contended reps don't flip a verdict; the raw reps of both runs
stay in their artifacts.
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
        verdict = ("sublinear" if expo < 0.90
                   else "linear" if expo <= 1.05
                   else "SUPERLINEAR" if b >= 1.0
                   else "SUPERLINEAR(small)")
        rows.append({"query": q, "small_s": a, "big_s": b,
                     "ratio": round(ratio, 2), "exponent": round(expo, 2),
                     "verdict": verdict})
    rows.sort(key=lambda r: -r["exponent"])
    n_super = sum(r["verdict"] == "SUPERLINEAR" for r in rows)
    n_small = sum(r["verdict"] == "SUPERLINEAR(small)" for r in rows)
    print(f"scale_check: {len(rows)} shared queries, data factor {factor}x "
          f"(exponent bands: <0.9 sublinear, <=1.05 linear)")
    print(f"  small: {sys.argv[1]} total={small.get('value')}s  "
          f"big: {sys.argv[2]} total={big.get('value')}s")
    print(f"  verdicts: "
          f"{sum(r['verdict'] == 'sublinear' for r in rows)} sublinear, "
          f"{sum(r['verdict'] == 'linear' for r in rows)} linear, "
          f"{n_super} SUPERLINEAR, {n_small} superlinear-but-small (ungated)")
    for r in rows[:20]:
        print(f"  {r['query']:36s} {r['small_s']:8.3f}s -> {r['big_s']:8.3f}s"
              f"  {r['ratio']:6.2f}x  exp={r['exponent']:5.2f}  {r['verdict']}")
    if out_path:
        art = {"factor": factor, "small": sys.argv[1], "big": sys.argv[2],
               "small_total": small.get("value"), "big_total": big.get("value"),
               "small_env": small.get("env"), "big_env": big.get("env"),
               "bands": "exponent<0.9 sublinear, <=1.05 linear; "
                        "SUPERLINEAR gates exit only when big_s>=1.0s",
               "n_superlinear": n_super,
               "n_superlinear_small": n_small, "queries": rows}
        with open(out_path, "w") as f:
            json.dump(art, f, indent=2)
        print(f"wrote {out_path} ({len(rows)} queries)")
    return 1 if n_super else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:
        sys.exit(0)
