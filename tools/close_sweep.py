#!/usr/bin/env python3
"""Health-gated close-sweep driver (round 16, r15 verdict #3).

Three rounds of cross-round idle comparisons were dominated by box
drift, and r15's fresh-JVM tail child ran on a box that had degraded
3.5x MID-sweep — honest labeling wasn't enough. This driver adds the
missing control loop around `graft.Bench`:

  - run the sweep; read the artifact's own env evidence
    (loadavg_start, sentinel series, contended flag);
  - HEALTHY = contended==false AND max(series)/min(series) <= SPREAD
    (default 1.5) over the full sentinel series including first/last;
  - on an unhealthy run, retry up to --attempts times (every attempt's
    artifact is kept as <out>.attemptK so the evidence trail survives);
  - keep the healthiest attempt (smallest sentinel spread; contended
    runs rank after uncontended ones) as <out>.

Usage:
  python3 tools/close_sweep.py --sf /root/testdata/sf0.1 \
      --out bench_idle_r16.json [--attempts 3] [--spread 1.5] \
      [--tail-fresh 15] [--queries a,b,c] [--loadavg-max 1.5]

Never run concurrently with another sbt/Spark JVM (the round-6/7
lesson); the driver itself checks loadavg BEFORE launching and waits
for a quiet window (bounded) so a doomed attempt isn't even started.
"""
import argparse
import json
import os
import shutil
import subprocess
import sys
import time


def loadavg1():
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def series_of(art):
    s = [art.get("sentinel_first"), *art.get("sentinel_series", []),
         art.get("sentinel_last")]
    return [x for x in s if isinstance(x, (int, float)) and x > 0]


def spread_of(art):
    s = series_of(art)
    if len(s) < 2:
        return float("inf")
    return max(s) / min(s)


def healthy(art, max_spread):
    return (not art.get("contended", True)
            and not art.get("partial", False)
            and spread_of(art) <= max_spread)


def run_attempt(args, k):
    out = f"{args.out}.attempt{k}"
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = args.sf
    env["SPARK_GRAFT_CPUS"] = str(args.cpus)
    env["SPARK_GRAFT_BENCH_OUT"] = os.path.abspath(out)
    if args.tail_fresh:
        env["SPARK_GRAFT_BENCH_TAIL_FRESH"] = str(args.tail_fresh)
    if args.queries:
        env["SPARK_GRAFT_BENCH_QUERIES"] = args.queries
    t0 = time.time()
    rc = subprocess.call(
        ["sbt", "-batch", "runMain graft.Bench"], env=env,
        stdout=open(f"{out}.log", "w"), stderr=subprocess.STDOUT)
    wall = time.time() - t0
    try:
        with open(out) as f:
            art = json.loads(f.read().strip())
    except Exception as e:
        print(f"[close] attempt {k}: rc={rc}, artifact unreadable: {e}")
        return out, None, wall
    return out, art, wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sf", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--attempts", type=int, default=3)
    p.add_argument("--spread", type=float, default=1.5)
    p.add_argument("--loadavg-max", type=float, default=1.5)
    p.add_argument("--quiet-wait-sec", type=int, default=600)
    p.add_argument("--tail-fresh", type=int, default=15)
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--queries", default="")
    args = p.parse_args()

    results = []  # (out, art, wall)
    for k in range(1, args.attempts + 1):
        # pre-launch gate: don't start a sweep into a visibly-loaded box
        waited = 0
        while loadavg1() > args.loadavg_max and waited < args.quiet_wait_sec:
            print(f"[close] loadavg {loadavg1():.2f} > {args.loadavg_max}; "
                  f"waiting ({waited}s)")
            time.sleep(30)
            waited += 30
        la = loadavg1()
        print(f"[close] attempt {k}/{args.attempts} starting "
              f"(loadavg {la:.2f})")
        out, art, wall = run_attempt(args, k)
        if art is None:
            continue
        sp = spread_of(art)
        print(f"[close] attempt {k}: total={art.get('value')} "
              f"spread={sp:.2f} contended={art.get('contended')} "
              f"wall={wall:.0f}s")
        results.append((out, art, wall))
        if healthy(art, args.spread):
            print(f"[close] attempt {k} HEALTHY — done")
            break

    if not results:
        print("[close] no parseable attempt")
        sys.exit(1)
    # healthiest: uncontended before contended, then smallest spread
    best = min(results, key=lambda r: (bool(r[1].get("contended", True)),
                                       spread_of(r[1])))
    shutil.copyfile(best[0], args.out)
    ok = healthy(best[1], args.spread)
    print(f"[close] kept {best[0]} -> {args.out} "
          f"(healthy={ok}, spread={spread_of(best[1]):.2f}); "
          f"{len(results)} attempt artifact(s) retained")
    sys.exit(0 if ok else 3)


if __name__ == "__main__":
    main()
