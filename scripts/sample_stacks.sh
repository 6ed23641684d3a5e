#!/bin/bash
# Stack-sample a running JVM (guide §7.3): N jcmd Thread.print dumps at a
# fixed interval, written to one file per dump under the given out dir.
#   usage: sample_stacks.sh <pid> <n_dumps> <interval_sec> <outdir>
set -u
PID="$1"; N="$2"; IV="$3"; OUT="$4"
mkdir -p "$OUT"
for i in $(seq 1 "$N"); do
  kill -0 "$PID" 2>/dev/null || break
  jcmd "$PID" Thread.print > "$OUT/dump_$(printf %04d "$i").txt" 2>/dev/null
  sleep "$IV"
done
echo "wrote $(ls "$OUT" | wc -l) dumps to $OUT"
