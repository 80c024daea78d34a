#!/usr/bin/env python3
"""Per-gate isolated floor measurement (min-of-4, small batches).

Runs graft.Bench over small groups of gates with SPARK_GRAFT_ITERS=4
(one sbt/JVM per group, nothing else running), merges the per-query
minima into bench_floors.json, and prints a budget proposal of
max(2.5 x floor, 0.35 s) per gate.

The multiplier is 2.5, not 1.5: full-sweep times run 1.3-2x the
isolated floor under ambient contention (r13 measured: p13's 1.5x
budget breached in a hot sweep at 1.66x its floor while three other
sweeps passed), so 1.5x flags weather, not regressions. 2.5x still
sits far below any real slowdown's footprint (the r13 fixes cut their
gates 2-7x).

The r6/r7 measurement discipline: full-sweep numbers carry +/-40%
ambient variance; isolated min-of-4 is the steady-state floor and the
stable number budgets should key on. Groups are small (default 6) so
one session never degenerates into a sweep.

Usage: python3 tools/floors.py gate1,gate2,... [--group-size 6]
       python3 tools/floors.py --from-json SCALING_r8.json
"""
import json, os, subprocess, sys

def run_group(gates, sf_dir):
    env = dict(os.environ,
               SPARK_GRAFT_ONLY=",".join(gates),
               SPARK_GRAFT_ITERS="4",
               SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, capture_output=True, text=True, timeout=3600)
    for line in out.stdout.splitlines():
        line = line.replace("[info] ", "", 1).strip()
        if line.startswith('{"metric"'):
            rec = json.loads(line)
            # r16: Bench prints a compact total-only summary line BEFORE
            # the full record — skip any record without the per-query map
            if "queries" not in rec:
                continue
            # a gate that errored lands in "failed" and is absent from
            # "queries" — surface it loudly instead of silently leaving
            # a missing/stale floor (the ScalingProbe SKIPPED discipline)
            if rec.get("failed"):
                raise RuntimeError(
                    f"gates failed in group {gates}: {rec['failed']}")
            return rec["queries"]
    sys.stderr.write(out.stdout[-2000:] + "\n")
    raise RuntimeError(f"no bench JSON for group {gates}")

def main():
    args = sys.argv[1:]
    group_size = 6
    if "--group-size" in args:
        i = args.index("--group-size")
        group_size = int(args[i + 1])
        del args[i:i + 2]
    if args and args[0] == "--from-json":
        scaling = json.load(open(args[1]))
        gates = sorted(k for k in scaling
                       if k != "rows" and not k.endswith("_nx"))
    else:
        gates = [g for g in args[0].split(",") if g]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    floors = {}
    if os.path.exists("bench_floors.json"):
        floors = json.load(open("bench_floors.json")).get("floors", {})
    for i in range(0, len(gates), group_size):
        group = gates[i:i + group_size]
        print(f"[floors] group {i // group_size + 1}: {','.join(group)}",
              flush=True)
        for k, v in run_group(group, sf_dir).items():
            # a floor is the MINIMUM ever observed: a hot-ambient rerun
            # must never degrade a previously measured quiet-machine
            # floor upward (set FLOORS_OVERWRITE=1 to re-baseline after
            # a code change that legitimately slowed a gate)
            if os.environ.get("FLOORS_OVERWRITE") == "1" or k not in floors:
                floors[k] = round(v, 3)
            else:
                floors[k] = min(floors[k], round(v, 3))
            print(f"[floors]   {k}: {v:.2f} s (floor {floors[k]})",
                  flush=True)
        # durable per group: a failure in a later group (each costs
        # minutes of sbt+Spark) must not discard completed measurements
        json.dump({"iters": 4, "sf": sf_dir, "floors": floors},
                  open("bench_floors.json", "w"), indent=0, sort_keys=True)
    print("[floors] wrote bench_floors.json")
    budgets = json.load(open("bench_budgets.json"))
    proposal = {k: max(round(2.5 * v, 2), 0.35) for k, v in floors.items()}
    tighter = {k: (budgets.get(k), p) for k, p in proposal.items()
               if k in budgets and p < budgets[k]}
    print(f"[floors] budget proposal (2.5x floor) tightens "
          f"{len(tighter)} of {len(proposal)} gates:")
    for k, (old, new) in sorted(tighter.items()):
        print(f"[floors]   {k}: {old} -> {new}")

if __name__ == "__main__":
    main()
