#!/bin/bash
# Poor-man's sampling profiler for one bench query.
#   tools/profile_query.sh <query[,query2]> [reps] [sfdir]
# Starts SPARK_GRAFT_BENCH_ONLY=<query> graft.Bench detached, waits for the
# forked JVM (distinct from the sbt JVM), then samples jstack until the run
# exits. Samples land in /tmp/prof_<query>/; aggregate with
#   python3 tools/stack_agg.py /tmp/prof_<query>
Q="$1"; REPS="${2:-10}"; SF="${3:-/root/testdata/sf0.1}"
OUT="/tmp/prof_${Q//,/|}"
rm -rf "$OUT"; mkdir -p "$OUT"
cd /root/repo
SPARK_GRAFT_BENCH_ONLY="$Q" SPARK_GRAFT_BENCH_REPS="$REPS" \
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT="$OUT/bench.dev.json" \
  sbt -batch "runMain graft.Bench" > "$OUT/bench.log" 2>&1 &
SBT_PID=$!
# wait for the forked Bench JVM: sbt's forked run invokes
# `java @/tmp/sbt-argsNNN.tmp` (an argfile), so the main class never appears
# in the cmdline — detect by the argfile pattern instead (the sbt launcher
# JVM itself has `-jar sbt-launch.jar runMain graft.Bench`, different shape)
JVM=""
for i in $(seq 1 240); do
  for p in $(pgrep -x java); do
    # the argfile pattern alone matches ANY concurrent sbt fork (tests,
    # another profile run) — confirm the argfile actually launches
    # graft.Bench before sampling this pid (ADVICE r15)
    ARGFILE=$(tr '\0' '\n' < /proc/$p/cmdline 2>/dev/null | grep -o '^@/tmp/sbt-args.*' | cut -c2-)
    if [ -n "$ARGFILE" ] && grep -q 'graft\.Bench' "$ARGFILE" 2>/dev/null; then
      JVM=$p; break
    fi
  done
  [ -n "$JVM" ] && break
  sleep 1
done
if [ -z "$JVM" ]; then echo "no Bench JVM found"; exit 1; fi
echo "sampling JVM $JVM"
N=0
while kill -0 "$JVM" 2>/dev/null; do
  jstack "$JVM" > "$OUT/s_$N.txt" 2>/dev/null
  N=$((N+1))
  sleep 0.2
done
wait $SBT_PID
echo "collected $N samples in $OUT"
grep '"metric"' "$OUT/bench.log"
