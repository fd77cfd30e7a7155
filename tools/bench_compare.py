#!/usr/bin/env python3
"""Compare two bench JSON artifacts per query and flag real regressions.

Usage: python3 tools/bench_compare.py OLD.json NEW.json [ratio]

Reads the per-query map from each file -- `queries` holds medians in the
median-of-N format (r8+); older single-shot artifacts hold one sample,
which this treats as a (noisy) median. Queries are compared as
new_median / old_median and reported when the ratio exceeds the threshold
(default 2.0) in either direction.

bench.var.json documents that single-shot totals on this host span 1x-7x
under contention with ~20x single-query spikes, so for pre-r8 artifacts a
flagged ratio is a *lead*, not a verdict: re-run the flagged query with
SPARK_GRAFT_BENCH_ONLY and compare medians before concluding anything.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    # driver-side BENCH_r{N}.json wraps the bench line under "parsed"
    # (and only carries the ~30-query headline subset that fits its tail
    # window); builder-side bench.json is the full flat line
    if "parsed" in d and isinstance(d["parsed"], dict):
        return d["parsed"]
    return d


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    flagged = []
    for q in shared:
        if oq[q] <= 0 or nq[q] <= 0:
            continue
        r = nq[q] / oq[q]
        if r >= ratio or r <= 1 / ratio:
            flagged.append((r, q, oq[q], nq[q]))
    flagged.sort(reverse=True)
    print(f"old: {sys.argv[1]}  total={old.get('value')}  "
          f"agg={old.get('agg', 'single-shot')}  n={len(oq)}")
    print(f"new: {sys.argv[2]}  total={new.get('value')}  "
          f"agg={new.get('agg', 'single-shot')}  n={len(nq)}")
    print(f"shared queries: {len(shared)}  threshold: {ratio}x\n")
    for r, q, a, b in flagged:
        direction = "SLOWER" if r > 1 else "faster"
        print(f"  {q:36s} {a:8.3f}s -> {b:8.3f}s  ({r:5.2f}x {direction})")
    if not flagged:
        print("  no per-query change beyond threshold")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"\nnew-only queries: {', '.join(only_new)}")

    # r12: contention attribution from the NEW artifact's raw reps — a
    # query whose max-rep/min-rep spread exceeds 2x was NOT uniformly slow,
    # so its median is contention-suspect (the r11 stream_neardup lesson:
    # 16.8s median / 10.1s min on the driver vs 2.95s committed was
    # unattributable without the raw reps).
    reps = new.get("queries_reps", {})
    spread = []
    for q, ts in reps.items():
        ts = [t for t in ts if t > 0]
        if len(ts) >= 2 and max(ts) / min(ts) >= 2.0:
            spread.append((max(ts) / min(ts), q, ts))
    if spread:
        spread.sort(reverse=True)
        print(f"\nrep-spread >2x in {sys.argv[2]} (contention-suspect medians):")
        for r, q, ts in spread:
            print(f"  {q:36s} reps={[round(t, 3) for t in ts]}  ({r:.1f}x spread)")

    # r13: contention-WINDOW attribution. Execution order is name order
    # (Bench sorts); reps are interleaved round-robin since r13, so a
    # multi-minute host-contention window lands on the SAME rep column of
    # an execution-order-contiguous block of queries. Flag maximal runs of
    # >=3 consecutive queries whose rep[k] is >=2x their own fastest rep
    # as ONE suspected window (the r12 driver artifact's five contiguous
    # x_approx_*..x_attribution_* outliers were exactly this shape, but
    # with back-to-back reps they were uniformly slow on all reps and
    # invisible to the spread flag above).
    if reps:
        names = sorted(reps)
        n_reps = max(len(ts) for ts in reps.values())
        windows = []
        for k in range(n_reps):
            run = []
            for q in names:
                ts = reps[q]
                pos = [t for t in ts if t > 0]
                hot = (len(ts) > k and ts[k] > 0 and len(pos) >= 2
                       and ts[k] >= 2.0 * min(pos))
                if hot:
                    run.append(q)
                else:
                    if len(run) >= 3:
                        windows.append((k, list(run)))
                    run = []
            if len(run) >= 3:
                windows.append((k, list(run)))
        if windows:
            print("\nsuspected contention windows (contiguous >=3-query "
                  "blocks >=2x slow in one rep column):")
            for k, qs in windows:
                worst = max(max(t for t in reps[q] if t > 0)
                            / min(t for t in reps[q] if t > 0) for q in qs)
                print(f"  rep {k + 1}: {qs[0]} .. {qs[-1]} "
                      f"({len(qs)} queries, worst spread {worst:.1f}x) — "
                      f"treat these medians' slow reps as environmental")
    # Old-format artifacts (back-to-back reps, pre-r13) can't localize a
    # window to a rep column; fall back to flagging an execution-order-
    # contiguous block among the >2x-SLOWER comparison flags.
    elif flagged:
        slower = sorted(q for r, q, a, b in flagged if r > 1)
        allq = sorted(set(oq) & set(nq))
        pos = {q: i for i, q in enumerate(allq)}
        block, blocks = [], []
        for q in slower:
            if block and pos[q] == pos[block[-1]] + 1:
                block.append(q)
            else:
                if len(block) >= 3:
                    blocks.append(list(block))
                block = [q]
        if len(block) >= 3:
            blocks.append(list(block))
        for b in blocks:
            print(f"\nsuspected contention window (execution-order-"
                  f"contiguous slowdowns): {b[0]} .. {b[-1]} "
                  f"({len(b)} queries) — re-run these with "
                  f"SPARK_GRAFT_BENCH_ONLY before concluding regression")

    env = new.get("env")
    if env:
        print(f"\nnew env: {env}")
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except BrokenPipeError:  # piped into head: not an error
        sys.exit(0)
