#!/usr/bin/env python3
"""Aggregate jcmd Thread.print dumps (guide §7.3).

For every RUNNABLE (or all, with --all-states) non-idle thread sample,
record (a) the topmost org.apache.spark / graft frame, and (b) the top
non-JDK frame — then print the dominant-frame histogram, split into
executor-task threads vs everything else (driver, streaming, RPC).

usage: agg_stacks.py <dumpdir> [--all-states] [--top N]
"""
import os, re, sys
from collections import Counter

dumpdir = sys.argv[1]
all_states = "--all-states" in sys.argv
topn = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv else 30

IDLE_PAT = re.compile(
    r"(Unsafe\.park|Object\.wait|epollWait|ThreadPoolExecutor\.getTask"
    r"|SynchronousQueue|LockSupport\.park|PlatformEvent|poll0|accept0"
    r"|socketAccept|Reference\$ReferenceHandler|Finalizer)")
FRAME = re.compile(r"^\s+at ([\w.$/]+)\(")

task_frames, other_frames = Counter(), Counter()
task_samples = other_samples = 0
for fn in sorted(os.listdir(dumpdir)):
    if not fn.endswith(".txt"):
        continue
    text = open(os.path.join(dumpdir, fn), errors="replace").read()
    # split into thread blocks
    for block in text.split('\n\n'):
        header = block.split('\n', 1)[0]
        if not header.startswith('"'):
            continue
        name = header.split('"')[1]
        if not all_states and "RUNNABLE" not in block:
            continue
        frames = FRAME.findall(block)
        if not frames:
            continue
        if IDLE_PAT.search(frames[0]):
            continue
        # pick the topmost spark/graft frame; fall back to top frame
        interesting = next(
            (f for f in frames
             if f.startswith(("org.apache.spark", "graft", "org.apache.parquet",
                              "org.apache.hadoop", "org.rocksdb", "org.codehaus.janino"))),
            frames[0])
        is_task = name.startswith("Executor task launch worker")
        if is_task:
            task_frames[interesting] += 1
            task_samples += 1
        else:
            other_frames[(name.split('-')[0], interesting)] += 1
            other_samples += 1

print(f"== executor task threads: {task_samples} busy samples ==")
for f, c in task_frames.most_common(topn):
    print(f"{c:6d}  {f}")
print(f"\n== other threads: {other_samples} busy samples ==")
for (name, f), c in other_frames.most_common(topn):
    print(f"{c:6d}  [{name}] {f}")
