"""Driver-window rotation reporter.

The driver certifies only the FIRST 50 entries of the registry each round
(CORRECTNESS_r{N}.json). Since round 13 the registry order is SELF-ROTATING:
`oaim_sandbox_spark.queries.flagship_order()` derives it at import time from
the committed CORRECTNESS_r*.json union (never-checked first, then failing,
then ascending last-certified round; committed-snapshot tie-break), so this
tool no longer plans a hand-edit — it REPORTS what the pure function derived:

  - which entries the CURRENT window will certify this round,
  - never-driver-checked / last-check-failing entries (both forced in-window
    by the ordering itself),
  - the staleness histogram and the projected next-round window.

Usage: python tools/window_rotation.py
"""

from __future__ import annotations

import sys
from itertools import groupby

sys.path.insert(0, "/root/repo")


def main() -> None:
    from oaim_sandbox_spark.queries import _correctness_union, flagship_order

    import __spark_entry__ as E

    oracles = list(E.oracle_sql())
    oset = set(oracles)
    derived = [n for n in flagship_order() if n in oset]
    assert oracles == derived, (
        "registry order no longer matches flagship_order() — the self-"
        "rotating derivation has been bypassed somewhere"
    )
    window = oracles[:50]
    wset = set(window)

    status = _correctness_union()
    ever_checked = set(status) & oset
    never = [n for n in oracles if n not in status]
    failing = sorted(n for n in ever_checked if not status[n][1])
    certified = sorted(n for n in ever_checked if status[n][1])

    def tier_key(union):
        # FAILING entries get their own tier label so a failing r5 and a
        # failing r9 don't fragment the round-tier groupby output
        def key(n):
            rec = union.get(n)
            if rec is None:
                return "never-checked"
            rnd, ok = rec
            return f"FAILING (last r{rnd})" if not ok else f"last checked r{rnd}"
        return key

    print(f"registry oracle entries : {len(oracles)}")
    print(f"current window (50)     : certifies {sum(1 for n in window if n not in status)} first-timers")
    print(f"ever driver-checked     : {len(ever_checked)} ({len(certified)} green)")
    print(f"last-check FAILING      : {failing or 'none'}")
    print(f"never driver-checked    : {len(never)}")
    for n in never:
        mark = " <- IN current window" if n in wset else " <- BUG: ordering must front never-checked"
        print(f"  {n}{mark}")

    print("\ncurrent window staleness tiers:")
    for tier, grp in groupby(window, key=tier_key(status)):
        names = list(grp)
        print(f"  {tier} ({len(names)}): {', '.join(names)}")

    # Projection: assume the current window all passes this round, then the
    # NEXT round's window is the staleness-ordered remainder — print its
    # tiers so PLANS.md can record the expected rotation.
    latest_round = max((r for r, _ in status.values()), default=0)
    projected_union = dict(status)
    for n in window:
        projected_union[n] = (latest_round + 1, True)
    nxt = [n for n in flagship_order(union=projected_union) if n in oset]
    print("\nprojected NEXT window (assuming the current 50 certify):")
    for tier, grp in groupby(nxt[:50], key=tier_key(projected_union)):
        names = list(grp)
        print(f"  {tier} ({len(names)}): {', '.join(names)}")


if __name__ == "__main__":
    main()
