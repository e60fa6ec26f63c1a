"""In-engine BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-construction stage of an LLM data pipeline, as Spark
DataFrame operations.

Scale shape (how industrial BPE trainers actually run):

1. The corpus is scanned ONCE into a word-frequency table — state is
   vocabulary-sized (~10M rows at web scale), not corpus-sized.
2. Each merge round is one ``groupBy(pair).sum(freq)`` over that word
   table (map-side partials, tiny shuffle), a ONE-ROW argmax collect
   (dimension-sized driver traffic, same contract as
   ``connected_components``), and a map-only string rewrite.
3. The learned merge table is a K-row dimension; tokenizing the corpus
   with it is a broadcast-free chained ``replace`` — one scan.

Correct canonical merging with a plain ``replace`` — the double-space
representation: a word's symbol list is rendered as

    ' ' + '  '.join(symbols) + ' '     (single-space ends, double-space
                                        separators)

Merging pair (a, b) is then ``replace(repr, ' a  b ', ' ab ')``.
Adjacent occurrences never share characters (each match consumes one of
the two separator spaces on each side), so the standard left-to-right
non-overlapping scan that BOTH Java (`UTF8String.replace`) and DuckDB
(`replace`) implement performs exactly BPE's leftmost-first
non-overlapping merge — including the ``a == b`` run case
(`' a  a  a '` → `' aa  a '`).  Canonical-equality is pinned by
``tests/test_bpe.py`` against a plain-Python reference implementation.

The per-round argmax tie-break is (count DESC, left ASC, right ASC) —
bit-deterministic in both engines (ASCII/binary string order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the one corpus-sized pass of BPE training."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def to_repr(word) -> F.Column:
    """Double-space symbol representation of a word (see module doc):
    ``'key'`` → ``' k  e  y  </w> '``."""
    col = F.col(word) if isinstance(word, str) else word
    return F.concat(
        F.lit(" "),
        F.regexp_replace(col, "(.)", "$1  "),
        F.lit(END_OF_WORD + " "),
    )


def _pairs(words: DataFrame) -> DataFrame:
    """Adjacent symbol pairs (with multiplicity) weighted by word freq.

    The symbol array binds to a column first (opt r6): the two slices
    and size() referencing the split EXPRESSION re-evaluated the
    split-of-trim chain three times per row under interpreted eval."""
    bound = words.select(
        "freq", F.split(F.trim(F.col("repr")), "  ").alias("_syms")
    )
    n = F.size("_syms")
    zipped = F.arrays_zip(
        F.slice("_syms", 1, n - 1).alias("l"),
        F.slice("_syms", 2, n - 1).alias("r"),
    )
    return (
        bound.select("freq", F.explode(zipped).alias("p"))
        .select("freq", F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_repr(repr_col: F.Column, left: str, right: str) -> F.Column:
    """One canonical BPE merge of (left, right) on the double-space
    representation — a single left-to-right ``replace``."""
    return F.replace(
        repr_col,
        F.lit(f" {left}  {right} "),
        F.lit(f" {left}{right} "),
    )


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns the merge table
    (rank, left, right, merged, cnt) as a K-row DataFrame.

    Driver-side loop with a ONE-ROW collect per round (the argmax);
    every round's rewrite is lazy-chained onto the word table, with a
    ``localCheckpoint`` every ``checkpoint_every`` rounds to keep the
    plan shallow (same pattern as connected_components' iteration).
    """
    from .dedup import selfjoin_ready

    # vocabulary-sized persist (opt r6): every round's argmax re-reads
    # the word table, and without it rounds before the first
    # localCheckpoint re-ran the corpus scan + word groupBy from
    # scratch (K=10 meant ~4 corpus scans); the persisted state is the
    # word-frequency dim, never corpus-sized (the module's scale note).
    words = selfjoin_ready(
        word_freqs(docs, text_col).select(to_repr("word").alias("repr"), "freq")
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for k in range(1, num_merges + 1):
        top = (
            _pairs(words)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, top[0].cnt
        merges.append((k, l, r, l + r, int(cnt)))
        words = words.withColumn("repr", merge_repr(F.col("repr"), l, r))
        if k % checkpoint_every == 0:
            words = words.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, merged string, cnt long"
    )


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out: str = "tokens",
) -> DataFrame:
    """Tokenize with a learned merge list: every word to its repr, the
    K merges applied IN RANK ORDER as chained replaces, tokens read
    back off the final representation.  Map-only — one scan of the
    corpus, no shuffle, no Python."""
    # per-word transform so merges never act across word boundaries
    def tok_word(w):
        rep = to_repr(w)
        for left, right in merges:
            rep = merge_repr(rep, left, right)
        return F.split(F.trim(rep), "  ")

    toks = F.flatten(
        F.transform(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != ""),
            tok_word,
        )
    )
    return docs.withColumn(out, toks)


# ------------------------------------------------------------- SQL twin


def to_repr_sql(expr: str) -> str:
    return (
        f"' ' || regexp_replace({expr}, '(.)', '\\1  ', 'g') "
        f"|| '{END_OF_WORD} '"
    )


def bpe_train_sql(num_merges: int, words_cte: str = "wf") -> tuple[str, str]:
    """(CTE chain, final merge-table select) mirroring :func:`bpe_train`
    as ``num_merges`` expanded SQL stages over a ``{words_cte}(word,
    freq)`` relation — the DuckDB oracle is the unrolled fixpoint."""
    parts = [
        f"w0 AS (SELECT {to_repr_sql('word')} AS repr, freq FROM {words_cte})"
    ]
    for k in range(1, num_merges + 1):
        prev = f"w{k - 1}"
        parts.append(f"""
p{k} AS (
  SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT syms, freq, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM (SELECT string_split(trim(repr), '  ') AS syms, freq
              FROM {prev}))
  GROUP BY 1, 2),
b{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
w{k} AS (
  SELECT replace(repr, ' ' || b.l || '  ' || b.r || ' ',
                 ' ' || b.l || b.r || ' ') AS repr, freq
  FROM {prev}, b{k} b)""")
    ctes = ",".join(parts)
    final = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS rank, l AS lhs, r AS rhs, "
        f"l || r AS merged, cnt FROM b{k}"
        for k in range(1, num_merges + 1)
    )
    return ctes, final
