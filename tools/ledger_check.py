#!/usr/bin/env python3
"""Guard SURVEY.md's CURRENT-round ledger claims against the committed
artifacts, so typed numbers can never drift from measured ones again
(the round-11 lesson: the ledger said "3.2 s" and "265/265" while the
committed artifacts said 16.8 s and 266 — a judge caught both).

Usage: python3 tools/ledger_check.py [SURVEY.md]   (exit 1 on drift)

Checks, scoped to the LATEST "### Round N" section only (earlier
sections legitimately quote their own era's numbers):

1. all-pass claims "X/X" (3+ digits): X must equal the query count in
   the newest CORRECTNESS_r*.json AND that artifact must be all-green.
2. per-query timing claims "<query_name> ... <float> s" where the name
   is a bench.json query: the float must be within TOLERANCE of the
   committed MEDIAN (r13 — previously matching the min or any raw rep
   also validated, which with a 2x contention spread let almost any
   number pass). A claim matching only the min or a single rep now
   prints a WARNING (non-fatal: ledgers may legitimately quote the
   contention floor, but must say so).
3. suite-total claims "<float> s total" / "total ... <float> s": must
   be within TOLERANCE of bench.json's "value" (or, since r14, of
   bench.sf1.json's — a round legitimately quotes both suite totals).
4. scale claims (r13): "N sublinear", "N linear", "N SUPERLINEAR" and
   "worst exponent F" in the latest section must match the newest
   committed SCALE_sf*.json's verdict counts / max exponent.
5. full-suite sf1 bench gate (r14): if the latest section mentions
   bench.sf1.json, that artifact must exist, parse, cover the FULL
   suite (n_queries == the CORRECTNESS query count — a subset run must
   not masquerade as the committed full-suite number), and report zero
   failed queries.
6. cpu corroboration (r15): a round-over-round wall-regression claim
   ">1.3x" / "N x regression" in the latest section must be backed by
   the committed per-query/total CPU ratio (bench.json `queries_cpu` /
   `total_cpu` vs the prior round's BENCH_r*.json) — the r14 lesson:
   the wall headline moved +24% on pure host contention while CPU was
   flat. A claim whose cpu ratio is ~1.0 flags unless the surrounding
   text attributes it to contention/host noise.
7. artifact custody (r15): the newest BENCH_r*.json / CORRECTNESS_r*
   .json on disk must be TRACKED in git, and tracked bench.json /
   LEAKCHECK.json must not be dirty — round artifacts repeatedly landed
   uncommitted (r13 ask #2, recurred r14).
8. test-count gate (r15): claims like "N tests" / "N passed" in the
   latest section must match artifacts/test_summary.json (written at
   round close from the measured sbt test run) — SURVEY carried three
   different counts for one suite.
9. seed-corpus gate (r15): if the latest section mentions CHECK_seed2,
   that artifact must exist, parse, cover the full suite, and be
   all-green (same shape as gate 5).

This is a heuristic gate (regex, not a parser): it can miss a claim,
but anything it flags IS a number that does not reproduce from the
committed artifacts and must be regenerated, not argued with.
"""
import glob
import json
import os
import re
import sys

TOLERANCE = 0.25  # |claim/actual - 1| beyond this flags drift


def latest_round_section(text):
    starts = [(m.start(), int(m.group(1)))
              for m in re.finditer(r"^### Round (\d+)\b", text, re.M)]
    if not starts:
        return text, None
    pos, n = max(starts, key=lambda t: t[1])
    nxt = [p for p, k in starts if p > pos]
    return text[pos:min(nxt) if nxt else len(text)], n


def try_load(path):
    """(obj, err): obj None when missing or unparseable; err names why.

    Unparseable artifacts must surface as DRIFT flags, not tracebacks —
    the gate's whole job is to report, and a crash aborts every check
    after the bad file (r14 review finding)."""
    if not os.path.exists(path):
        return None, None
    try:
        return json.load(open(path)), None
    except ValueError as e:
        return None, f"unparseable ({e.__class__.__name__}: {e})"


def load_artifacts(repo):
    corr_files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    corr = json.load(open(corr_files[-1])) if corr_files else None
    bench, bench_err = try_load(os.path.join(repo, "bench.json"))
    return corr, (corr_files[-1] if corr_files else None), bench, bench_err


def close(claim, actual):
    return actual > 0 and abs(claim / actual - 1) <= TOLERANCE


def main():
    survey = sys.argv[1] if len(sys.argv) > 1 else "SURVEY.md"
    repo = os.path.dirname(os.path.abspath(survey)) or "."
    text = open(survey).read()
    section, round_n = latest_round_section(text)
    corr, corr_file, bench, bench_err = load_artifacts(repo)
    flags = []
    warns = []
    if bench_err:
        flags.append(f"bench.json is {bench_err}")
    # bench.sf1.json loads independently of bench.json so gates 3 and 5
    # still run when bench.json is absent/broken (previously nested under
    # `if bench:`, silently skipping the full-suite sf1 gate entirely)
    sf1, sf1_err = try_load(os.path.join(repo, "bench.sf1.json"))
    if sf1_err:
        flags.append(f"bench.sf1.json is {sf1_err}")

    # 1. all-pass claims X/X
    if corr is not None:
        n = len(corr)
        bad = [k for k, v in corr.items()
               if not (v.get("rows_match") and v.get("schema_match")
                       and v.get("hash_match"))]
        for m in re.finditer(r"\b(\d{3,})/(\d{3,})\b", section):
            a, b = int(m.group(1)), int(m.group(2))
            if a == b:
                if a != n:
                    flags.append(f"claim '{a}/{b}' != {n} queries in "
                                 f"{os.path.basename(corr_file)}")
                elif bad:
                    flags.append(f"claim '{a}/{b}' but {len(bad)} queries "
                                 f"fail in {os.path.basename(corr_file)}: "
                                 f"{bad[:5]}")

    # 2. per-query timing claims. A section legitimately quotes a query's
    # seconds at EITHER committed scale (bench.json sf0.1 or
    # bench.sf1.json), so a claim passes if either artifact's
    # median backs it (mirroring gate 3's either-total rule).
    if bench:
        qmed = bench.get("queries", {})
        qmin = bench.get("queries_min", {})
        qreps = bench.get("queries_reps", {})
        qmed_sf1 = (sf1 or {}).get("queries", {})
        qmin_sf1 = (sf1 or {}).get("queries_min", {})
        qreps_sf1 = (sf1 or {}).get("queries_reps", {})
        # anchor on KNOWN query names (a generic word+number regex is
        # non-overlapping and lets an unrelated earlier word consume the
        # window holding the real claim), then read the first "<float> s"
        # within 80 chars after the name
        num = re.compile(r"(\d+(?:\.\d+)?)\s*s\b")
        claims = []
        for name in qmed:
            for m in re.finditer(re.escape(name) + r"\b", section):
                n = num.search(section[m.end():m.end() + 80])
                if n:
                    claims.append((name, float(n.group(1))))
        def matches(val, c):
            return close(val, c) or abs(val - c) < 0.05
        for name, val in claims:
            if matches(val, qmed[name]):
                continue
            if name in qmed_sf1 and matches(val, qmed_sf1[name]):
                continue
            floor = ([qmin[name]] if name in qmin else []) + \
                qreps.get(name, []) + \
                ([qmin_sf1[name]] if name in qmin_sf1 else []) + \
                qreps_sf1.get(name, [])
            if any(matches(val, c) for c in floor):
                warns.append(
                    f"'{name}' claimed {val}s matches only the min/a raw "
                    f"rep, not the median ({qmed[name]}s) — if quoting "
                    f"the contention floor, say so in the ledger")
            else:
                flags.append(
                    f"'{name}' claimed {val}s; bench.json median="
                    f"{qmed[name]}s min={qmin.get(name)}s "
                    f"reps={qreps.get(name)}; bench.sf1.json median="
                    f"{qmed_sf1.get(name)}s")

    # 3. suite-total claims — a value may quote the sf0.1 suite
    # (bench.json) or, since r14, the full-suite sf1 run
    # (bench.sf1.json); either committed artifact backs the claim
    totals = [t for t in ((bench or {}).get("value"),
                          (sf1 or {}).get("value")) if t]
    if totals:
        for m in re.finditer(
                r"(\d+(?:\.\d+)?)\s*s\s+total|total[^\n]{0,40}?"
                r"(\d+(?:\.\d+)?)\s*s\b", section):
            val = float(m.group(1) or m.group(2))
            if val > 10 and not any(close(val, t) for t in totals):
                flags.append(f"suite-total claim {val}s vs bench.json/"
                             f"bench.sf1.json values={totals}")

    # 5. full-suite sf1 bench gate (r14): a section that cites
    # bench.sf1.json commits to a FULL-suite artifact with zero
    # failures — a subset run must not masquerade as it
    if "bench.sf1" in section:
        if sf1 is None:
            flags.append("section cites bench.sf1.json but the artifact "
                         f"is {sf1_err or 'missing'}")
        else:
            n_corr = len(corr) if corr is not None else None
            n_sf1 = sf1.get("n_queries", len(sf1.get("queries", {})))
            if n_corr is not None and n_sf1 != n_corr:
                flags.append(
                    f"bench.sf1.json covers {n_sf1} queries, not the "
                    f"full suite ({n_corr} in "
                    f"{os.path.basename(corr_file)}) — subset runs "
                    f"don't satisfy the full-suite sf1 gate")
            if sf1.get("failed"):
                flags.append(f"bench.sf1.json reports failed queries: "
                             f"{sf1['failed'][:5]}")

    # 4. scale claims vs the committed SCALE_sf*.json artifacts. A round
    # may quote several scale points (sf1 AND sf3); a count/exponent claim
    # passes if ANY committed scale artifact backs it, and flags only when
    # no artifact does.
    scale_files = sorted(glob.glob(os.path.join(repo, "SCALE_sf*.json")))
    if scale_files and re.search(r"\bsublinear\b", section, re.I):
        names = [os.path.basename(p) for p in scale_files]
        actuals = []   # per artifact: {kind: set(acceptable counts)}
        worsts = []    # per artifact: max exponent
        for p in scale_files:
            sc = json.load(open(p))
            verd = [r["verdict"] for r in sc.get("queries", [])]
            # "superlinear" accepts the gated count or the gated+small
            # total — either is an honest reading of the artifact
            actuals.append(
                {"sublinear": {sum(v == "sublinear" for v in verd)},
                 "linear": {sum(v == "linear" for v in verd)},
                 "superlinear": {sum(v == "SUPERLINEAR" for v in verd),
                                 sum(v.startswith("SUPERLINEAR")
                                     for v in verd)}})
            expos = [r["exponent"] for r in sc.get("queries", [])]
            if expos:
                worsts.append(max(expos))
        for m in re.finditer(
                r"(\d+)\s+(sublinear|linear|superlinear)\b", section, re.I):
            n, kind = int(m.group(1)), m.group(2).lower()
            if not any(n in a[kind] for a in actuals):
                flags.append(
                    f"claim '{n} {kind}' backed by none of {names} "
                    f"(actuals: {[sorted(a[kind]) for a in actuals]})")
        for m in re.finditer(
                r"worst exponent\s+(\d+(?:\.\d+)?)", section, re.I):
            if not any(abs(float(m.group(1)) - w) <= 0.015 for w in worsts):
                flags.append(f"claim 'worst exponent {m.group(1)}' backed "
                             f"by none of {names} (actuals: {worsts})")

    # 6. cpu corroboration: wall-regression claims vs the committed cpu
    # ratios. Anchor on "<float>x" within a few words of "regress"; the
    # claim needs either (a) a cpu ratio that also moved (>1.15x — a real
    # slowdown does more work or the same work slower on both clocks
    # only under contention), or (b) an explicit contention/noise
    # attribution within the claim's paragraph.
    # newest = highest round number, with the plain BENCH_r<N>.json
    # preferred over suffixed variants of the same round (BENCH_r15_c8.json
    # is the low-core scaling run, not the headline artifact)
    bench_rs = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")),
                      key=lambda p: (int(re.search(r"_r(\d+)", p).group(1)),
                                     re.search(r"_r\d+\.json$", p) is not None,
                                     p))
    prev_bench = None
    if bench_rs:
        prev_bench, _ = try_load(bench_rs[-1])
    claim_re = re.compile(
        r"(\d+(?:\.\d+)?)\s*[x×](?:\W+\w+){0,3}\W+regress|"
        r"regress\w*(?:\W+\w+){0,3}\W+(\d+(?:\.\d+)?)\s*[x×]", re.I)
    for m in claim_re.finditer(section):
        ratio = float(m.group(1) or m.group(2))
        if ratio <= 1.3:
            continue
        para = section[max(0, m.start() - 400):m.end() + 400]
        if re.search(r"contention|host noise|noise|drift|was(?: not|n't) one",
                     para, re.I):
            continue
        cpu_now = (bench or {}).get("total_cpu")
        # BENCH_r*.json nests the bench stats under "parsed" (the driver's
        # wrapper); fall back to top-level for plain bench.json-shaped files
        cpu_prev = (((prev_bench or {}).get("parsed") or prev_bench or {})
                    .get("total_cpu"))
        if cpu_now and cpu_prev and cpu_prev > 0:
            cpu_ratio = cpu_now / cpu_prev
            if cpu_ratio < 1.15:
                flags.append(
                    f"wall-regression claim '{ratio}x' not corroborated: "
                    f"total_cpu ratio vs {os.path.basename(bench_rs[-1])} "
                    f"is {cpu_ratio:.2f}x (~flat) — attribute to host "
                    f"contention explicitly or drop the claim")
        else:
            warns.append(
                f"wall-regression claim '{ratio}x' cannot be cpu-checked: "
                f"total_cpu missing from bench.json or the prior BENCH_r* "
                f"artifact — quote the per-query queries_cpu ratio or "
                f"attribute the claim explicitly")

    # 10. load-delta gate (r16, VERDICT r15 ask #1): a round-over-round
    # comparison between two bench runs whose 1-min load averages at
    # suite start differ by >2x is not a like-for-like measurement (the
    # r15 driver bench started at load 12.7 vs r14's 2.4 and produced 23
    # phantom wall regressions that the min/CPU stats contradicted).
    # WARN whenever the committed bench.json and the newest BENCH_r*.json
    # env blocks are load-mismatched; escalate to DRIFT when the latest
    # section ALSO makes an unattributed round-over-round claim.
    load_now = ((bench or {}).get("env") or {}).get("load_avg_start")
    prev_env = ((prev_bench or {}).get("parsed") or
                (prev_bench or {})).get("env") or {}
    load_prev = prev_env.get("load_avg_start")
    if load_now and load_prev and min(load_now, load_prev) > 0:
        ratio = max(load_now, load_prev) / min(load_now, load_prev)
        if ratio > 2:
            msg = (f"load-mismatched bench pair: bench.json started at "
                   f"load {load_now:.1f} vs {os.path.basename(bench_rs[-1])}"
                   f" at {load_prev:.1f} ({ratio:.1f}x) — wall-median "
                   f"comparisons between them are not like-for-like; use "
                   f"queries_min/queries_cpu or re-run on a quiet host")
            claims_rr = re.search(
                r"(speedup|geomean|regress\w*|improved)\b", section, re.I)
            attributed = re.search(
                r"contention|host noise|load[- ]mismatch", section, re.I)
            if claims_rr and not attributed:
                flags.append(msg)
            else:
                warns.append(msg)

    # 7. artifact custody: newest round artifacts must be tracked, and
    # tracked driver-contract files must not be dirty. Uses git; degrades
    # to a warning when git is unavailable.
    import subprocess
    def git(*a):
        return subprocess.run(["git", "-C", repo] + list(a),
                              capture_output=True, text=True)
    newest = []
    for pat in ("BENCH_r*.json", "CORRECTNESS_r*.json"):
        fs = sorted(glob.glob(os.path.join(repo, pat)),
                    key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
        if fs:
            newest.append(os.path.basename(fs[-1]))
    try:
        for f in newest:
            if git("ls-files", "--error-unmatch", f).returncode != 0:
                flags.append(f"round artifact {f} is NOT tracked in git — "
                             f"commit it (recurring r13/r14 finding)")
        for f in ("bench.json", "LEAKCHECK.json"):
            if os.path.exists(os.path.join(repo, f)) and \
                    git("ls-files", "--error-unmatch", f).returncode == 0:
                st = git("status", "--porcelain", "--", f).stdout.strip()
                if st:
                    flags.append(f"tracked artifact {f} has uncommitted "
                                 f"changes ({st.split()[0]}) — commit or "
                                 f"restore it")
    except OSError as e:
        warns.append(f"artifact-custody check skipped (git unavailable: {e})")

    # 8. test-count gate: "N tests"/"N passed" claims in the latest
    # section vs the committed measured count.
    tsum, tsum_err = try_load(os.path.join(repo, "artifacts",
                                           "test_summary.json"))
    if tsum_err:
        flags.append(f"artifacts/test_summary.json is {tsum_err}")
    if tsum and "tests_passed" in tsum:
        actual_tests = tsum["tests_passed"]
        for m in re.finditer(
                r"\b(\d{2,})\s+(?:tests\b|passed\b)", section):
            n = int(m.group(1))
            # skip query-count collisions (e.g. "266 queries ... passed")
            ctx = section[max(0, m.start() - 40):m.end()]
            if re.search(r"quer|/", ctx):
                continue
            if n != actual_tests:
                flags.append(
                    f"test-count claim '{m.group(0).strip()}' != measured "
                    f"{actual_tests} in artifacts/test_summary.json "
                    f"(suite: {tsum.get('suites', '?')} suites, ran "
                    f"{tsum.get('measured_at', '?')})")
    elif re.search(r"\b\d{2,}\s+tests\b", section):
        warns.append("section claims a test count but artifacts/"
                     "test_summary.json is missing — write it from the "
                     "measured sbt test run")

    # 9. seed-varied corpus gate: same contract as the sf1 gate — citing
    # CHECK_seed2 commits to a full-suite all-green artifact.
    if "CHECK_seed2" in section:
        s2, s2_err = try_load(os.path.join(repo, "artifacts",
                                           "CHECK_seed2.json"))
        if s2 is None:
            flags.append("section cites CHECK_seed2 but artifacts/"
                         f"CHECK_seed2.json is {s2_err or 'missing'}")
        else:
            n_corr = len(corr) if corr is not None else None
            if n_corr is not None and len(s2) != n_corr:
                flags.append(f"CHECK_seed2.json covers {len(s2)} queries, "
                             f"not the full suite ({n_corr})")
            bad2 = [k for k, v in s2.items()
                    if not (v.get("rows_match") and v.get("schema_match")
                            and v.get("hash_match"))]
            if bad2:
                flags.append(f"CHECK_seed2.json has {len(bad2)} failing "
                             f"queries: {bad2[:5]}")

    label = f"round {round_n}" if round_n else "whole file"
    for w in warns:
        print(f"  WARN: {w}")
    if flags:
        print(f"ledger_check: {len(flags)} claim(s) in {survey} ({label}) "
              f"do not reproduce from committed artifacts:")
        for f in flags:
            print(f"  DRIFT: {f}")
        return 1
    print(f"ledger_check: OK — no drift found in {survey} ({label}) "
          f"vs {os.path.basename(corr_file) if corr_file else 'n/a'}, "
          f"bench.json"
          + (f", {os.path.basename(scale_files[-1])}" if scale_files else "")
          + (f" ({len(warns)} warning(s))" if warns else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
