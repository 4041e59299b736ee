"""Driver-window rotation planner.

The driver certifies only the FIRST 50 entries of the registry each round
(CORRECTNESS_r{N}.json). With 140+ oracle-backed entries, full certification
takes several rounds of rotating the `FLAGSHIP_FIRST` prefix in queries.py.
This tool reports, from the committed CORRECTNESS_r*.json artifacts plus the
current registry order:

  - which entries the CURRENT window will certify this round,
  - which oracle-backed entries have NEVER been driver-checked (rotation
    candidates for the next round),
  - which were checked and failed most recently (must stay in-window),
  - union coverage so far.

Usage: python tools/window_rotation.py
"""

from __future__ import annotations

import glob
import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import __spark_entry__ as E

    oracles = list(E.oracle_sql())
    window = set(oracles[:50])

    status: dict[str, tuple[int, bool]] = {}  # name -> (last round checked, passed)
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        rnd = int(path.rsplit("_r", 1)[1].split(".")[0])
        data = json.load(open(path))
        for name, rec in data.items():
            ok = bool(rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match") and not rec.get("err"))
            status[name] = (rnd, ok)

    ever_checked = set(status)
    never = [n for n in oracles if n not in ever_checked]
    failing = sorted(n for n, (_, ok) in status.items() if not ok)
    certified = sorted(n for n, (_, ok) in status.items() if ok)

    print(f"registry oracle entries : {len(oracles)}")
    print(f"current window (50)     : certifies {len(window - ever_checked)} first-timers")
    print(f"ever driver-checked     : {len(ever_checked)} ({len(certified)} green)")
    print(f"last-check FAILING      : {failing or 'none'}")
    print(f"never driver-checked    : {len(never)}")
    for n in never:
        mark = " <- IN current window" if n in window else ""
        print(f"  {n}{mark}")
    uncovered_next = [n for n in never if n not in window]
    print(f"\nrotation candidates for next round ({len(uncovered_next)}):")
    print("  " + ", ".join(uncovered_next) if uncovered_next else "  none — full union coverage after this round")

    # With full union coverage, recency is the signal: rank entries by how
    # long ago their last driver check was (assuming the CURRENT window all
    # passes this round) and print the staleness-ordered candidates for the
    # next rotation — oldest-certified first, skipping what's in-window now.
    latest_round = max((r for r, _ in status.values()), default=0)
    projected = {n: (latest_round + 1 if n in window else status.get(n, (0, False))[0]) for n in oracles}
    stale_next = sorted(
        (n for n in oracles if n not in window),
        key=lambda n: (projected[n], oracles.index(n)),
    )
    print("\nstaleness-ordered candidates for the NEXT window (oldest driver check first):")
    from itertools import groupby

    for rnd, grp in groupby(stale_next, key=lambda n: projected[n]):
        names = list(grp)
        print(f"  last checked r{rnd} ({len(names)}): {', '.join(names)}")


if __name__ == "__main__":
    main()
