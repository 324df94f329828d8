#!/usr/bin/env python3
"""Deliberate background CPU load for bench wave-channel validation
(r14 verdict #2's done-criterion: a bench re-run under injected load must
flag the loaded segment's queries and leave quiet segments unflagged).
Spins N busy processes for S seconds, then exits.
Usage: cpu_hog.py [n_procs=16] [seconds=90]
"""
import multiprocessing, sys, time


def spin(deadline):
    x = 0
    while time.time() < deadline:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return x


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    s = float(sys.argv[2]) if len(sys.argv) > 2 else 90.0
    deadline = time.time() + s
    ps = [multiprocessing.Process(target=spin, args=(deadline,))
          for _ in range(n)]
    for p in ps:
        p.start()
    print(f"[cpu-hog] {n} spinners for {s:.0f}s", flush=True)
    for p in ps:
        p.join()
    print("[cpu-hog] done", flush=True)
