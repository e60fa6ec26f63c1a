"""Machine-control microbenchmarks for the scaling harness
(BENCH/BASELINE.md "drift control" sections): pure-CPU and memcpy
scaling at the EXACT pinned geometry the flagship harness uses
(1 executor x 2 cores vs 4 executors x 2 cores; one worker process per
core, taskset core sets 0-1 vs 0-1/2-3/4-5/6-7; best of 3).

Run: python BENCH/scale_controls.py
Prints one JSON line per control with the 1x and 4x aggregate rates and
the 1x2 -> 4x2 efficiency.  pure-CPU pins the scheduler/clock term;
memcpy pins the shared-memory-bus term — a flagship efficiency shift
with CPU ~1.0 and memcpy degraded is bus contention, not code."""

import os, subprocess, sys, time, json

CPU_N = 60_000_000
def worker_src(kind):
    if kind == "cpu":
        return """
import time
t0=time.perf_counter()
x=0
for i in range(%d):
    x ^= (i*2654435761) & 0xffffffff
print((%d)/(time.perf_counter()-t0))
""" % (CPU_N, CPU_N)
    return """
import time
a=bytearray(64*1024*1024); b=bytearray(64*1024*1024)
t0=time.perf_counter(); n=0
while time.perf_counter()-t0 < 6.0:
    b[:]=a; n+=1
print(n*64/(time.perf_counter()-t0))
"""

def run_level(kind, coresets):
    # one worker process per core in each pinned set
    procs=[]
    for cs in coresets:
        lo,hi=cs
        for c in range(lo,hi+1):
            procs.append(subprocess.Popen(
                ["taskset","-c",str(c),sys.executable,"-c",worker_src(kind)],
                stdout=subprocess.PIPE))
    tot=0.0
    for p in procs:
        out,_=p.communicate()
        tot+=float(out.strip())
    return tot

for kind in ("cpu","memcpy"):
    best1=best4=0.0
    for rep in range(3):
        a=run_level(kind,[(0,1)])
        b=run_level(kind,[(0,1),(2,3),(4,5),(6,7)])
        best1=max(best1,a); best4=max(best4,b)
    print(json.dumps({"kind":kind,"x1_2core":round(best1,1),
                      "x4_2core":round(best4,1),
                      "eff":round(best4/best1/4,3)}))
