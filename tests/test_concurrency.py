"""Concurrent registry execution on ONE shared SparkSession: the r1
temp-view collision bug class (fixed by per-call unique materialized views)
must stay fixed, so run a mixed batch of view-materializing and plain
queries from multiple threads and require every result to match its serial
run."""

from concurrent.futures import ThreadPoolExecutor

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

# mix: materialized-view runners (minhash, simhash pair plans, winnowing,
# source vocab) alongside plain template queries
NAMES = [
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "winnowing_fingerprints",
    "source_vocab_overlap",
    "q1_pricing_summary",
    "classifier_quality_scores",
    "dedup_exact_first",
    "bm25_topk",
]


def test_registry_queries_concurrently_safe(spark):
    q = E.queries()
    serial = {}
    for n in NAMES:
        serial[n] = sorted(map(str, q[n](spark, SF).collect()))

    def run(n):
        return n, sorted(map(str, q[n](spark, SF).collect()))

    with ThreadPoolExecutor(max_workers=4) as ex:
        # two interleaved waves so materializations overlap
        results = list(ex.map(run, NAMES + list(reversed(NAMES))))
    for n, rows in results:
        assert rows == serial[n], f"concurrent run diverged for {n}"
