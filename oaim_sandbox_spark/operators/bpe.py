"""Learned byte-pair-encoding tokenizer — tokenizer TRAINING as a pipeline op.

The reference counts tokens with a fixed pretrained tiktoken encoding
(reference src/server/embedding.py:107-116); that library (and its vocab
files) aren't in this container, and a 100 TB training-data pipeline needs
the other direction anyway: LEARN the tokenizer from the corpus, then apply
it at scale. This module implements classic BPE (Sennrich et al. 2016, the
GPT-2 merge-rank application algorithm):

- ``BPETokenizer.train``: merge rules learned driver-side from a BOUNDED
  word-frequency sample — the standard practice (real tokenizers train on a
  corpus sample, not the corpus); the distributed part is the word-frequency
  aggregation, which shuffles (word, count) pairs only and caps the
  vocabulary taken to the driver.
- ``tokenize_df``: distributed application via an Arrow-batched pandas UDF —
  the merge table broadcasts with the closure; per-word results are memoized
  per batch (Zipf makes the hit rate high).

The learned tokenizer is deterministic (count-then-lexicographic tie-break)
so train() on the same sample always yields the same merges — and it plugs
into ``TokenSplitter(count_tokens=bpe.count_tokens)`` to make P2's
token-budget splitting use a real subword vocabulary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_EOW = "</w>"  # end-of-word marker: lets merges distinguish suffixes


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (_EOW,)


class BPETokenizer:
    """Merge-list BPE: ``merges`` is an ordered list of (left, right) pairs,
    highest priority first; encoding greedily applies the best-ranked merge
    present (the GPT-2 algorithm)."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {pair: i for i, pair in enumerate(self.merges)}

    # -- training ------------------------------------------------------------
    @classmethod
    def train(
        cls,
        df: DataFrame,
        text_col: str = "text",
        num_merges: int = 200,
        max_words: int = 30_000,
    ) -> "BPETokenizer":
        """Distributed word-frequency agg -> driver-side merge learning.

        The agg shuffles (word, count) pairs with map-side combine; only the
        top ``max_words`` most frequent words reach the driver (Zipf: the
        tail adds almost no pair mass). The merge loop is pure Python over
        that bounded table. Words split on ALL whitespace (regex \\s+) to
        match what encode()/tokenize_df's str.split() sees at apply time —
        splitting on literal spaces only would train merges on forms like
        'fox\\nlower' that the tokenizer never encounters."""
        toks = f"filter(split({text_col}, '\\\\s+'), t -> t != '')"
        freq_rows = (
            df.select(F.explode(F.expr(toks)).alias("w"))
            .groupBy("w")
            .count()
            .orderBy(F.col("count").desc(), F.col("w").asc())
            .limit(max_words)
            .collect()
        )
        word_freqs = {r["w"]: int(r["count"]) for r in freq_rows}
        return cls(cls._learn_merges(word_freqs, num_merges))

    @staticmethod
    def _learn_merges(word_freqs: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
        seqs: dict[str, tuple[str, ...]] = {w: _word_symbols(w) for w in word_freqs}
        merges: list[tuple[str, str]] = []
        for _ in range(num_merges):
            pair_counts: dict[tuple[str, str], int] = {}
            for w, seq in seqs.items():
                f = word_freqs[w]
                for i in range(len(seq) - 1):
                    p = (seq[i], seq[i + 1])
                    pair_counts[p] = pair_counts.get(p, 0) + f
            if not pair_counts:
                break
            # deterministic: max count, then lexicographically smallest pair
            best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            if pair_counts[best] < 2:
                break
            merges.append(best)
            a, b, ab = best[0], best[1], best[0] + best[1]
            for w, seq in seqs.items():
                if a not in seq:
                    continue
                out: list[str] = []
                i = 0
                while i < len(seq):
                    if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seqs[w] = tuple(out)
        return merges

    # -- encoding ------------------------------------------------------------
    def encode_word(self, word: str) -> list[str]:
        seq = list(_word_symbols(word))
        while len(seq) > 1:
            ranked = [
                (self.ranks[(seq[i], seq[i + 1])], i)
                for i in range(len(seq) - 1)
                if (seq[i], seq[i + 1]) in self.ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            seq[i : i + 2] = [seq[i] + seq[i + 1]]
        return seq

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for word in text.split():
            out.extend(self.encode_word(word))
        return out

    def count_tokens(self, text: str) -> int:
        """TokenSplitter-compatible counter (P2 integration point)."""
        return len(self.encode(text))

    # -- distributed application ---------------------------------------------
    def tokenize_df(
        self, df: DataFrame, text_col: str = "text", out_col: str = "bpe_tokens"
    ) -> DataFrame:
        """Arrow-batched application; the merge table rides the closure
        (small: num_merges pairs). Per-batch word memoization exploits Zipf —
        each distinct word is encoded once per batch, not once per
        occurrence."""
        from pyspark.sql.functions import pandas_udf

        merges = self.merges  # capture the plain list, not self

        @pandas_udf("array<string>")
        def bpe_encode(texts: pd.Series) -> pd.Series:
            tok = BPETokenizer(merges)
            cache: dict[str, list[str]] = {}

            def enc(text: str) -> list[str]:
                out: list[str] = []
                for word in (text or "").split():
                    got = cache.get(word)
                    if got is None:
                        got = cache[word] = tok.encode_word(word)
                    out.extend(got)
                return out

            return texts.map(enc)

        return df.withColumn(out_col, bpe_encode(F.col(text_col)))

    # -- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        import json

        with open(path, "w") as fh:
            json.dump({"merges": [list(m) for m in self.merges]}, fh)

    @classmethod
    def load(cls, path: str) -> "BPETokenizer":
        import json

        with open(path) as fh:
            data = json.load(fh)
        return cls([tuple(m) for m in data["merges"]])
