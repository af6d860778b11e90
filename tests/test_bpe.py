"""BPE trainer/encoder vs a local pure-Python referee (the simulator
pattern): the distributed training must produce the IDENTICAL merge
sequence a sequential implementation produces on the same corpus, and
encodings must be exact."""

from collections import Counter

from owlfrontier.bpe import atomize, encode, encode_text, train_merges

SF_DIR = "/root/testdata/sf0.001"
K = 8


def _local_train(texts: list[str], k: int) -> list[tuple[str, str]]:
    """Sequential reference BPE trainer (Sennrich alg. 1 with the repo's
    deterministic (count desc, pair asc) tie-break)."""
    vocab = Counter(w for t in texts for w in t.split(" ") if w)
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        counts: Counter = Counter()
        for w, f in vocab.items():
            atoms = atomize(w, merges)
            for a, b in zip(atoms, atoms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
    return merges


def test_train_merges_matches_sequential_reference(spark):
    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    want = _local_train(texts, K)
    got = train_merges(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), K
    )
    assert got == want
    assert len(got) == K  # the corpus is rich enough to yield all K


def test_encode_matches_referee_and_reconstructs(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = train_merges(df, K)
    rows = (
        encode(df.limit(60), merges).select("doc_id", "text", "tokens")
        .collect()
    )
    assert len(rows) == 60
    for r in rows:
        assert r["tokens"] == encode_text(r["text"], merges)
        # lossless: token concatenation reproduces the text sans spaces
        assert "".join(r["tokens"]) == r["text"].replace(" ", "")
    # merges actually compress: fewer tokens than characters
    chars = sum(len(r["text"].replace(" ", "")) for r in rows)
    toks = sum(len(r["tokens"]) for r in rows)
    assert toks < chars


def test_merges_monotonically_reduce_token_count(spark):
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = train_merges(df, K)
    texts = [r["text"] for r in df.limit(40).collect()]
    prev = None
    for i in range(K + 1):
        total = sum(len(encode_text(t, merges[:i])) for t in texts)
        if prev is not None:
            assert total <= prev
        prev = total


def test_sql_fold_encode_matches_python_referee(spark):
    """Triangulation: the pure-SQL fold encode (both dialects hash-match
    via the oracle pair) must ALSO equal the pure-Python greedy encoder
    token-for-token — proving the fold == merge_word equivalence the
    bpe.py comment claims, on every corpus word."""
    from owlfrontier import queries as Q
    from owlfrontier.bpe import encode_fold_sql

    from pyspark.sql import functions as F

    merges = Q._BPE_FIXED_MERGES
    fold = encode_fold_sql("w", merges, "spark")
    rows = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "text",
            F.expr(
                "transform(filter(split(text, ' '), w -> w <> ''), "
                f"w -> {fold})"
            ).alias("folded"),
        )
        .limit(80)
        .collect()
    )
    for r in rows:
        for w, f in zip(
            [w for w in r["text"].split(" ") if w], r["folded"]
        ):
            assert f.split("\x1f") == atomize(w, merges), (w, f)
