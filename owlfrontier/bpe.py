"""Distributed BPE tokenizer: trainer + encoder (Sennrich et al. 2016).

Completes the tokenizer story whose first step ships as the
``bpe_merge_pairs`` query pair: this module ITERATES that statistic into
a trained merge table and applies it.

Scale shape (the classic vocab-weighted formulation):

* The corpus collapses ONCE into its distinct-word/frequency table
  (one explode + one partial+final hash agg — vocab is orders of
  magnitude smaller than the corpus, and pair counts over
  (word, freq) are exactly the corpus pair counts).
* Each training iteration is ONE aggregation job over that small vocab
  table: re-atomize every word under the current merge list (Arrow
  UDF over the vocab rows only — never the corpus), explode adjacent
  atom pairs weighted by word frequency, partial+final sum, and a
  deterministic TakeOrdered(1) winner ((count desc, pair asc) — the
  same boundary rule as ``vocab_topk``/``bpe_merge_pairs``).
* The merge table (k entries) is driver-held and broadcast into the
  next iteration's atomizer and the final encoder — the broadcast-
  codebook pattern the IVF trainer uses (queries.py).
* Encoding is one Arrow-vectorized pandas UDF (zero shuffle): greedy
  left-to-right application of the merges in training order per word,
  which reproduces training exactly (training applied merge i to the
  whole corpus before computing merge i+1).

The pure-Python functions are Spark-free so the pytest referee can run
them locally (the simulator pattern, crawler.py/simulate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# pair-key separator: atoms are substrings of real words, so U+001F
# (unit separator) cannot occur in them and ('a','bc') never collides
# with ('ab','c')
SEP = "\x1f"


# -- pure functions (shared by the Spark UDFs and the test referee) ----------


def merge_word(atoms: list[str], x: str, y: str) -> list[str]:
    """One merge pass: replace every non-overlapping left-to-right
    occurrence of the adjacent pair (x, y) with the atom x+y."""
    out: list[str] = []
    i, n = 0, len(atoms)
    while i < n:
        if i + 1 < n and atoms[i] == x and atoms[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(atoms[i])
            i += 1
    return out


def atomize(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Split a word into characters and apply the merge list in
    training order."""
    atoms = list(word)
    for x, y in merges:
        if len(atoms) < 2:
            break
        atoms = merge_word(atoms, x, y)
    return atoms


def encode_text(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Whitespace-pretokenized BPE encode: atomize each word; no merge
    crosses a word boundary (Sennrich's setting)."""
    toks: list[str] = []
    for w in text.split(" "):
        if w:
            toks.extend(atomize(w, merges))
    return toks


# -- Spark surface ------------------------------------------------------------


def _atomize_udf(merges: list[tuple[str, str]]):
    """Arrow-vectorized word -> atom-array UDF with the merge list
    captured in the closure (broadcast by Spark's task serialization —
    k entries, bytes)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ms = list(merges)

    def _atomize(word: "pd.Series") -> "pd.Series":
        return pd.Series([atomize(w, ms) for w in word.tolist()])

    _atomize.__annotations__ = {"word": pd.Series, "return": pd.Series}
    return pandas_udf("array<string>")(_atomize)


def vocab_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> distinct-word frequency table (the one corpus-sized
    job; everything after runs over this small table)."""
    return (
        df.select(F.explode(F.split(text_col, " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _top_pair(vocab: DataFrame, merges: list[tuple[str, str]]):
    """One training iteration: the corpus's most frequent adjacent atom
    pair under the current merges — (count desc, pair asc) winner, or
    None when no pair remains."""
    atoms = vocab.select(
        "freq", _atomize_udf(merges)(F.col("word")).alias("atoms")
    )
    pairs = atoms.where(F.size("atoms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(atoms) - 1), "
                f"i -> concat(atoms[i - 1], '{SEP}', atoms[i]))"
            )
        ).alias("pair"),
    )
    top = (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(1)
        .collect()
    )
    if not top:
        return None
    x, y = top[0]["pair"].split(SEP, 1)
    return x, y, top[0]["cnt"]


def train_merges(
    df: DataFrame, k: int, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Train k BPE merges over the corpus. One vocab job up front
    (localCheckpointed — every iteration reuses the materialized
    table), then one aggregation job per merge."""
    vocab = vocab_table(df, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        got = _top_pair(vocab, merges)
        if got is None:
            break
        merges.append((got[0], got[1]))
    return merges


def encode(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Append a ``tokens array<string>`` column: the BPE encoding of
    ``text_col`` under the trained merges. One Arrow UDF, zero
    shuffle."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ms = list(merges)

    def _encode(text: "pd.Series") -> "pd.Series":
        return pd.Series([encode_text(t, ms) for t in text.tolist()])

    _encode.__annotations__ = {"text": pd.Series, "return": pd.Series}
    return df.withColumn(
        "tokens", pandas_udf("array<string>")(_encode)(F.col(text_col))
    )


# -- pure-SQL encode (both dialects) ------------------------------------------
#
# The greedy left-to-right single-merge pass is expressible as a FOLD
# with a SEP-joined string accumulator: merge when the accumulator's
# last atom is x and the incoming atom is y. SEP (U+001F) never occurs
# inside an atom, so "last atom is x" is exactly
# ``acc = x OR acc ends with SEP||x`` and the fold provably equals
# :func:`merge_word` pass-for-pass. Chaining k merges = k fold levels,
# each re-splitting the previous level's string on SEP — linear SQL
# growth (the accumulator seed '' keeps each level referencing its
# input ONCE). Spark: ``aggregate``; DuckDB: ``list_reduce`` over
# ``list_prepend('', …)`` (its seed form).


def _q(s: str) -> str:
    return s.replace("'", "''")


def encode_fold_sql(
    word: str, merges: list[tuple[str, str]], dialect: str = "spark"
) -> str:
    """SQL expression (in ``dialect``) computing the SEP-joined BPE
    atoms of the word expression ``word`` under the FIXED merge list."""
    split_fn = "split" if dialect == "spark" else "string_split"
    arr = f"{split_fn}({word}, '')"
    folded = (
        f"array_join({arr}, chr(31))" if dialect == "spark"
        else f"array_to_string({arr}, chr(31))"
    )
    for x, y in merges:
        qx, qy, qxy = _q(x), _q(y), _q(x + y)
        if dialect == "spark":
            lam = (
                "(acc, v) -> CASE WHEN acc = '' THEN v "
                f"WHEN (acc = '{qx}' OR endswith(acc, concat(chr(31), "
                f"'{qx}'))) AND v = '{qy}' "
                f"THEN concat(left(acc, length(acc) - {len(x)}), '{qxy}') "
                "ELSE concat(acc, chr(31), v) END"
            )
            folded = f"aggregate({arr}, '', {lam})"
        else:
            lam = (
                "(acc, v) -> CASE WHEN acc = '' THEN v "
                f"WHEN (acc = '{qx}' OR ends_with(acc, chr(31) || "
                f"'{qx}')) AND v = '{qy}' "
                f"THEN left(acc, length(acc) - {len(x)}) || '{qxy}' "
                "ELSE acc || chr(31) || v END"
            )
            folded = f"list_reduce(list_prepend('', {arr}), {lam})"
        arr = f"{split_fn}({folded}, chr(31))"
    return folded
