"""Round-14 scaling lane (VERDICT r13 "Next round" #2).

The sf0.1 bench is floor-bound: every driver-measured slow query has an
8-vs-32-core ratio ~1 (two are FASTER at 8 cores), so real scan/shuffle
optimizations are invisible there. This lane times the heaviest operator
families at >=10x the sf0.1 rows — a scale where the distributed work, not
the per-query fixed floor, is the cost — at 32 AND 8 cores, each probe in a
FRESH subprocess (so `master local[$SPARK_GRAFT_CPUS]` and
`spark.sql.shuffle.partitions` both derive from the lane's core count, the
same mechanism the driver's own scaling block uses), and records the ratios.

Families (the five the r13 verdict names):
  - IVF funnels ............ consensus_funnel (1M vectors, 500x the bench store)
  - all-pairs templates .... allpairs (20k vectors = 10x rows, 100x pairs)
  - connected components ... cc (200k docs = 40x)
  - tfidf exact + sampled .. tfidf / sampled_cosine (50k docs = 10x)
  - streaming .............. streaming (5M events = 50x)

Usage:
    python tools/stress_lane.py [out.json]        # full lane, ~30-45 min
    python tools/stress_lane.py out.json cc,tfidf # subset

Writes one JSON file (default STRESS_LANE_r14.json) with per-probe seconds
at each core count and the low/high-core ratio. A ratio >> 1 means the
family's wall time is genuinely parallel work; ~1 means fixed-cost floor.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (probe, arg) — arg None means the probe's documented default scale.
PROBES: list[tuple[str, int | None]] = [
    ("consensus_funnel", None),   # 1M vectors
    ("allpairs", None),           # 20k vectors -> ~400M ordered pairs
    ("cc", None),                 # 200k docs
    ("tfidf", None),              # 50k docs, exact sum(df^2) join
    ("sampled_cosine", None),     # 50k docs, DIMSUM twin
    ("streaming", None),          # 5M events, 2 streaming entries
]

CPU_POINTS = ("32", "8")


def run_probe(probe: str, arg: int | None, cpus: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = cpus
    cmd = [sys.executable, os.path.join(REPO, "tools", "stress.py"), probe]
    if arg is not None:
        cmd.append(str(arg))
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env)
    wall = round(time.time() - t0, 1)
    line = ""
    for ln in reversed(proc.stdout.strip().splitlines()):
        if ln.startswith("{"):
            line = ln
            break
    if proc.returncode != 0 or not line:
        return {"probe": probe, "cpus": int(cpus), "error": proc.stderr[-2000:],
                "proc_wall_s": wall}
    out = json.loads(line)
    out["cpus"] = int(cpus)
    out["proc_wall_s"] = wall  # includes JVM/session startup (cold, both points)
    return out


# every timing field a probe may report; ratios are computed per field so
# multi-stage probes (cc: pair graph vs label propagation; streaming: two
# entries) read separately — a blended ratio would hide which stage scales
TIMING_KEYS = ("seconds", "secs", "wall_s", "pair_seconds", "cc_seconds",
               "user_stats_seconds", "ss_join_seconds")


def compute_ratios(hi: dict, lo: dict) -> dict:
    out = {}
    for k in TIMING_KEYS:
        if isinstance(hi.get(k), (int, float)) and isinstance(lo.get(k), (int, float)) and hi[k]:
            out[k] = round(lo[k] / hi[k], 2)
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "STRESS_LANE_r14.json")
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    probes = [(p, a) for p, a in PROBES if only is None or p in only]
    results: dict[str, dict] = {}
    for probe, arg in probes:
        rec: dict = {}
        for cpus in CPU_POINTS:
            print(f"[lane] {probe} @ {cpus} cores ...", flush=True)
            r = run_probe(probe, arg, cpus)
            rec[f"c{cpus}"] = r
            print(f"[lane]   -> {json.dumps(r)[:200]}", flush=True)
        hi, lo = rec.get(f"c{CPU_POINTS[0]}", {}), rec.get(f"c{CPU_POINTS[1]}", {})
        rec["low_over_high_ratio"] = compute_ratios(hi, lo)
        results[probe] = rec
    payload = {
        "lane": "r14_scaling",
        "cpu_points": [int(c) for c in CPU_POINTS],
        "note": ("each probe runs in a fresh subprocess per core count "
                 "(cold JVM both points); seconds are the probe's own timed "
                 "region, proc_wall_s includes startup"),
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
        f.write("\n")
    print(json.dumps({"lane_written": out_path,
                      "ratios": {k: v.get("low_over_high_ratio")
                                 for k, v in results.items()}}))


if __name__ == "__main__":
    main()
