"""Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt.

Run: python tools/dump_plans.py <tag> <suffix> <query> [<query> ...]
e.g. python tools/dump_plans.py r13 before knn_consensus_funnel topk_cosine

The optimization-round evidence files: the judge compares the committed
_before/_after plans against the code, so these are generated, not
hand-written.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oaim_sandbox_spark import queries as Q
from oaim_sandbox_spark.session import get_spark


def main() -> None:
    tag, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    queries = Q.spark_queries()
    for name in names:
        if name not in queries:
            print(f"SKIP {name}: not a registered query", file=sys.stderr)
            continue
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
