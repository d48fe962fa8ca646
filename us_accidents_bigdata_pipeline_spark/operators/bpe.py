"""BPE tokenizer vocabulary induction (Sennrich et al. 2016) as a
distributed Spark algorithm.

Classic BPE never touches the raw corpus after one pass: it operates on
the WORD-FREQUENCY table (Zipf-bounded — ~100K-10M rows at any corpus
size), which is exactly the scale-correct Spark shape:

1. one distributed pass: explode whitespace tokens → (word, freq) agg
   (map-side combine; the shuffle carries per-partition distinct words);
2. per merge round, all on the tiny vocab frame: adjacent symbol pairs
   via ``arrays_zip(symbols, slice(symbols, 2, …))`` → freq-weighted
   pair counts → the top pair (one driver row) → greedy left-to-right
   merge applied with a single ``regexp_replace`` over the
   space-joined symbol string (Java's regex engine resumes scanning at
   the end of each match, which IS BPE's non-overlapping greedy
   semantics — verified against a pure-Python reference in
   tests/test_textops.py).

Reference scope note: the reference repo has no tokenizer code; this is
part of the LLM-training-data extension (SURVEY §7.2 item 7) alongside
vocab_top_tokens (unigram induction).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import word_tokens

# end-of-word marker, appended as its own symbol (standard BPE so that
# merges never cross word boundaries and suffixes tokenize distinctly)
EOW = "</w>"


def word_freq_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the single corpus-scale
    pass; everything after runs on this Zipf-bounded frame."""
    return (
        df.select(F.explode(word_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-symbol pair counts over the vocab frame."""
    pairs = F.arrays_zip(
        F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("a"),
        F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("b"),
    )
    return (
        vocab.filter(F.size("symbols") >= 2)
        .select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n"))
    )


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    checkpoint_every: int = 10,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns a DataFrame
    (rank, left, right, merged, pair_freq) with rank 1..n_merges in
    learning order. Ties on pair frequency break lexicographically on
    (left, right) so the learned table is deterministic on any cluster
    layout.

    Each round costs two jobs on the vocab frame (pair-count top-1 +
    nothing else — the merge itself is a lazy projection); lineage is
    truncated with ``localCheckpoint`` every ``checkpoint_every``
    rounds so round latency stays flat.
    """
    spark = df.sparkSession
    vocab = word_freq_table(df, text_col).select(
        # seed symbols: characters plus the end-of-word marker
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("symbols"),
        F.col("freq"),
    )
    vocab = vocab.persist()
    merges: list[tuple[int, str, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                _pair_counts(vocab)
                .orderBy(F.col("n").desc(), F.col("a"), F.col("b"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b, n = top[0].a, top[0].b, top[0].n
            merges.append((rank, a, b, a + b, n))
            # greedy left-to-right merge: Java regex resumes at match
            # end, so consecutive non-overlapping occurrences all merge
            # in one pass (the BPE semantics); symbols are quoted so
            # regex metacharacters in real text can't alter the pattern
            pat = f" {re.escape(a)} {re.escape(b)}(?= |$)"
            rep = " " + (a + b).replace("\\", "\\\\").replace("$", "\\$")
            joined = F.concat_ws(" ", F.col("symbols"))
            new_vocab = vocab.select(
                F.split(
                    F.regexp_replace(
                        F.concat(F.lit(" "), joined), F.lit(pat), F.lit(rep)
                    ),
                    " ",
                ).alias("_s"),
                F.col("freq"),
            ).select(
                F.filter(F.col("_s"), lambda s: s != "").alias("symbols"),
                F.col("freq"),
            )
            if rank % checkpoint_every == 0:
                new_vocab = new_vocab.localCheckpoint(eager=True)
            else:
                new_vocab = new_vocab.persist()
                new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq bigint"
    )


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to segment every document's words into
    BPE tokens — a pure map-only projection (one chained
    ``regexp_replace`` per merge over the per-word symbol string), so
    tokenizing 100 TB stays shuffle-free."""
    words = F.transform(
        word_tokens(text_col),
        lambda w: F.concat(
            F.lit(" "), F.concat_ws(" ", F.split(w, "")), F.lit(" " + EOW)
        ),
    )

    def apply_merges(sym: F.Column) -> F.Column:
        out = sym
        for a, b in merges:
            pat = f" {re.escape(a)} {re.escape(b)}(?= |$)"
            rep = " " + (a + b).replace("\\", "\\\\").replace("$", "\\$")
            out = F.regexp_replace(out, F.lit(pat), F.lit(rep))
        return out

    toks = F.flatten(
        F.transform(
            words,
            lambda w: F.filter(F.split(apply_merges(w), " "), lambda s: s != ""),
        )
    )
    return df.withColumn(out_col, toks)
