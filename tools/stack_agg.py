#!/usr/bin/env python3
"""Aggregate jstack samples from tools/profile_query.sh.

Counts RUNNABLE executor-task-thread samples by (a) leaf frame and by
(b) topmost "interesting" frame (first frame matching org.apache.spark.sql
catalyst/execution or graft), plus whole-stack signatures, so the hot code
path of a query is readable without a real profiler.
"""
import sys, glob, re, collections

d = sys.argv[1]
only_exec = "--all-threads" not in sys.argv
leaf = collections.Counter()
interesting = collections.Counter()
sig = collections.Counter()
total = 0
for f in glob.glob(d + "/s_*.txt"):
    txt = open(f, errors="replace").read()
    # split into thread blocks
    for block in txt.split("\n\n"):
        if not block.strip().startswith('"'):
            continue
        name = block.split('"')[1]
        if only_exec and not name.startswith("Executor task launch worker"):
            continue
        if "RUNNABLE" not in block:
            continue
        frames = re.findall(r"at ([\w.$<>]+)\(", block)
        if not frames:
            continue
        total += 1
        leaf[frames[0]] += 1
        intr = next((fr for fr in frames
                     if fr.startswith("org.apache.spark.sql.catalyst")
                     or fr.startswith("org.apache.spark.sql.execution")
                     or fr.startswith("graft.")), frames[0])
        interesting[intr] += 1
        sig[" <- ".join(frames[:6])] += 1

print(f"samples (runnable task threads): {total}\n")
print("== leaf frames ==")
for k, v in leaf.most_common(20):
    print(f"{v:6d}  {k}")
print("\n== first catalyst/graft frame ==")
for k, v in interesting.most_common(20):
    print(f"{v:6d}  {k}")
print("\n== top stack signatures (6 frames) ==")
for k, v in sig.most_common(12):
    print(f"{v:6d}  {k}")
