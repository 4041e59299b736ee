"""Fragment-level parity check: run each dual-dialect fragment over the real
sf0.001 tables on Spark and DuckDB and diff the results exactly."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
from oaim_sandbox_spark.functions import portable as P
from oaim_sandbox_spark.session import get_spark

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("parity-check", master="local[8]")
    spark.read.parquet(f"{SF}/documents.parquet").createOrReplaceTempView("documents")
    spark.read.parquet(f"{SF}/embeddings.parquet").createOrReplaceTempView("embeddings")
    duck = duckdb.connect()
    duck.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    duck.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")

    checks: list[tuple[str, str, str]] = []

    def frag(name: str, fn, *args):
        checks.append((name, fn(*args, "spark"), fn(*args, "duck")))

    frag("hash64", P.hash64, "text")
    frag("mock_embed_probe", lambda e, d: f"element_at({P.mock_embed(e, 8, d)}, 3)" if d == "spark" else f"({P.mock_embed(e, 8, d)})[3]", "text")
    frag("simhash", P.simhash, "text", 16)
    frag("normalize_hash", lambda e, d: P.hash64(P.normalize_text(e, d), d), "text")
    frag("ngram_count", lambda e, d: f"size({P.word_ngrams(e, 3, d)})" if d == "spark" else f"len({P.word_ngrams(e, 3, d)})", "text")
    frag("minhash_first", lambda e, d: f"element_at({P.minhash_signature(e, 4, 3, d)}, 1)" if d == "spark" else f"({P.minhash_signature(e, 4, 3, d)})[1]", "text")
    frag("stop_hits", lambda e, d: P.stopword_hits(P.tokens(e, d), ["the", "a", "data", "row"], d), "text")
    frag("tok_regex", P.regexp_count_portable, "text", "[a-z]+")

    for name, s_frag, d_frag in checks:
        srows = [r[0] for r in spark.sql(f"SELECT {s_frag} AS v FROM documents ORDER BY doc_id").collect()]
        drows = [r[0] for r in duck.sql(f"SELECT {d_frag} AS v FROM documents ORDER BY doc_id").fetchall()]
        ok = len(srows) == len(drows) and all(
            (a == b) or (isinstance(a, float) and abs(a - b) < 1e-9) for a, b in zip(srows, drows)
        )
        print(f"{'OK ' if ok else 'FAIL'} {name}  spark[0]={srows[0]!r} duck[0]={drows[0]!r}")
        if not ok:
            bad = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print("   mismatches:", bad)

    # vector fragments over embeddings (self-distance to row 0's vector)
    a = P.to_double_array("embedding", "spark")
    ad = P.to_double_array("embedding", "duck")
    for name, fn in [("dot", P.dot), ("cos", P.cosine_distance), ("euc", P.euclidean_distance), ("dotdist", P.dot_distance)]:
        s_frag = P.round6(fn(a, a, "spark"), "spark")
        d_frag = P.round6(fn(ad, ad, "duck"), "duck")
        srows = [r[0] for r in spark.sql(f"SELECT {s_frag} AS v FROM embeddings ORDER BY vec_id LIMIT 20").collect()]
        drows = [r[0] for r in duck.sql(f"SELECT {d_frag} AS v FROM embeddings ORDER BY vec_id LIMIT 20").fetchall()]
        ok = all(abs(x - y) < 1e-12 for x, y in zip(srows, drows))
        print(f"{'OK ' if ok else 'FAIL'} {name}(v,v)  spark[0]={srows[0]} duck[0]={drows[0]}")

    # cross-vector: distance from every vector to vec 0
    duck_q0 = "(SELECT embedding FROM embeddings WHERE vec_id = 0)"
    q0 = spark.sql("SELECT embedding FROM embeddings WHERE vec_id = 0").collect()[0][0]
    q0_lit_s = "array(" + ", ".join(f"cast({x!r} as float)" for x in q0) + ")"
    q0_lit_d = "[" + ", ".join(repr(x) for x in q0) + "]::FLOAT[]"
    for name, fn in [("cos_q0", P.cosine_distance), ("euc_q0", P.euclidean_distance)]:
        s_frag = P.round6(fn(a, P.to_double_array(q0_lit_s, "spark"), "spark"), "spark")
        d_frag = P.round6(fn(ad, P.to_double_array(q0_lit_d, "duck"), "duck"), "duck")
        srows = [r[0] for r in spark.sql(f"SELECT {s_frag} AS v FROM embeddings ORDER BY vec_id LIMIT 50").collect()]
        drows = [r[0] for r in duck.sql(f"SELECT {d_frag} AS v FROM embeddings ORDER BY vec_id LIMIT 50").fetchall()]
        ok = all(abs(x - y) < 1e-12 for x, y in zip(srows, drows))
        print(f"{'OK ' if ok else 'FAIL'} {name}  spark[1]={srows[1]} duck[1]={drows[1]}")

    spark.stop()


if __name__ == "__main__":
    main()
