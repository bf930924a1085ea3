"""Distributed BPE tokenizer preparation.

Beyond the reference's surface (BASELINE.json north star): byte-pair
encoding merge training (Sennrich et al. 2016, arXiv:1508.07909) the way
map-reduce BPE trainers do it — all statistics run over the WORD-FREQUENCY
table (vocab-sized, ~10^6 rows at 100 TB), never over the raw corpus:

1. one corpus pass builds (word, n) counts;
2. each merge round counts weighted adjacent symbol pairs over that small
   relation, takes the (count desc, pair asc) argmax, and rewrites the
   symbol arrays — a driver loop of ``n_merges`` cheap jobs, the standard
   structure (the corpus is touched exactly once).

Encoding joins documents back to the merged word table on the word key —
the merge fold is a JVM higher-order function; no Python touches rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) frequency table — the only corpus-wide pass."""
    toks = F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                    lambda x: x != "")
    return (df.select(F.explode(toks).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _to_symbols(word: Column) -> Column:
    """Initial symbol sequence: characters, with the word-end marker on
    the final character (the classic BPE alphabet)."""
    chars = F.split(word, "")
    n = F.size(chars)
    return F.transform(
        chars,
        lambda c, i: F.when(i == n - 1, F.concat(c, F.lit("</w>"))).otherwise(c))


def _merge_pair(symbols: Column, left: str, right: str) -> Column:
    """Replace every leftmost non-overlapping adjacent (left, right) with
    the concatenation — one fold, JVM-side. State = (output array,
    pending symbol); the pending slot gives the single-symbol lookbehind
    the non-overlap rule needs."""
    merged = F.lit(left + right)
    empty = F.array().cast("array<string>")
    step = lambda acc, s: F.when(
        acc["pending"].isNotNull() & (acc["pending"] == F.lit(left)) & (s == F.lit(right)),
        F.struct(F.concat(acc["out"], F.array(merged)).alias("out"),
                 F.lit(None).cast("string").alias("pending"))
    ).otherwise(
        F.struct(
            F.when(acc["pending"].isNotNull(),
                   F.concat(acc["out"], F.array(acc["pending"])))
             .otherwise(acc["out"]).alias("out"),
            s.alias("pending")))
    finish = lambda acc: F.when(
        acc["pending"].isNotNull(), F.concat(acc["out"], F.array(acc["pending"]))
    ).otherwise(acc["out"])
    init = F.struct(empty.alias("out"), F.lit(None).cast("string").alias("pending"))
    return F.aggregate(symbols, init, step, finish)


def bpe_train(df: DataFrame, n_merges: int, text_col: str = "text",
              min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges. Returns the ordered merge list
    [(left, right, weighted_count)]; stops early when no pair reaches
    ``min_pair_count``.

    Deterministic: argmax ties break on (left, right) lexicographically.
    Each round shuffles only the vocab-sized symbol table; the word table
    is cached once and replaced (localCheckpoint) per round so the lineage
    does not accumulate ``n_merges`` nested folds."""
    words = (word_counts(df, text_col)
             .select(_to_symbols(F.col("word")).alias("syms"), "n")
             .localCheckpoint())
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (words.select(
            F.explode(F.when(
                F.size("syms") >= 2,
                F.transform(F.sequence(F.lit(1), (F.size("syms") - 1).cast("int")),
                            lambda i: F.struct(
                                F.element_at("syms", i).alias("left"),
                                F.element_at("syms", (i + 1).cast("int")).alias("right"))))
             .otherwise(F.array().cast("array<struct<left:string,right:string>>"))
            ).alias("p"), "n")
            .groupBy("p.left", "p.right").agg(F.sum("n").alias("c")))
        best = (pairs.orderBy(F.desc("c"), F.asc("left"), F.asc("right"))
                .limit(1).collect())
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right, c = best[0]["left"], best[0]["right"], int(best[0]["c"])
        merges.append((left, right, c))
        words = (words.select(_merge_pair(F.col("syms"), left, right).alias("syms"), "n")
                 .localCheckpoint())
    return merges


def bpe_encode(df: DataFrame, merges: list[tuple[str, str, int]],
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list: build the distinct-word → symbol-array
    map by folding the merges IN ONE PLAN over the (small) word table,
    then join documents' exploded tokens back on the word key — the
    corpus never runs the merge fold itself. Output one row per doc:
    (id, bpe_tokens array<string>, n_bpe_tokens)."""
    toks = F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                    lambda x: x != "")
    inst = (df.select(F.col(id_col), F.posexplode(toks).alias("pos", "word")))
    vocab = inst.select("word").distinct()
    syms = _to_symbols(F.col("word"))
    for left, right, _ in merges:
        syms = _merge_pair(syms, left, right)
    vocab = vocab.select("word", syms.alias("syms"))
    rebuilt = (inst.join(vocab, "word")
               .groupBy(id_col)
               .agg(F.flatten(
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                            lambda x: x["syms"])).alias("bpe_tokens")))
    return (df.select(id_col)
            .join(rebuilt, id_col, "left")
            .select(id_col,
                    F.coalesce("bpe_tokens", F.array().cast("array<string>"))
                     .alias("bpe_tokens"))
            .withColumn("n_bpe_tokens", F.size("bpe_tokens").cast("long")))
