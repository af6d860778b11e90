"""Driver-contract query registry: every SQL-expressible operator from
SURVEY.md §2 (and the training-data pipeline ops) as a (PySpark query,
DuckDB oracle SQL) pair over the driver's parquet tables
(``/root/testdata/sf*/`` — FIXTURES.md §4: ``documents`` stands in for
pages, ``events`` for the frontier, ``embeddings`` for the ANN surface).

Portability rules used throughout so Spark and DuckDB hash-match:

* 60-bit portable hash: Spark ``conv(substr(md5(x),1,15),16,10)::bigint``
  == DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT`` (verified equal).
* float aggregates are either avoided (ranks instead of scores), rounded
  after integer-exact arithmetic, or quantized to integers before summing
  (sums of doubles are NOT order-stable across engines).
* every computed column is aliased identically on both sides (the driver
  sorts columns by name and value-hashes).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Spark-side portable 60-bit hash of a string column expression (SQL text)
def _h60(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}),1,15),16,10) as bigint)"


# DuckDB-side equivalent
def _h60_duck(expr: str) -> str:
    return f"('0x'||substr(md5({expr}),1,15))::BIGINT"


# driver-side equivalent (for precomputing tiny data-independent matrices,
# e.g. the LSH hyperplane sign matrix, instead of hashing per row)
def _py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


STOPWORDS = ["the", "of", "and", "a", "to", "in", "is", "it", "on", "for"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin the rows across the cluster before a heavy per-row
    projection. The sandbox sf tables are single-row-group parquet —
    unsplittable, so a zero-shuffle plan would run its whole per-row array
    workload on ONE task; at 100 TB the scan has thousands of splits and
    this repartition is a no-op cost-wise (one narrow pass of the raw
    rows, no multiplication)."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


# ---------------------------------------------------------------------------
# Crawl-shaped operators (SURVEY.md §2.1)
# ---------------------------------------------------------------------------


def q_word_index(spark, sf_dir):
    """O14 — the CouchDB search view (couchdb.go:87-96): split text lines on
    ' ', keep words longer than 2 chars, build the inverted-index counts."""
    return (
        _spread(_docs(spark, sf_dir))
        .select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.length("word") > 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_WORD_INDEX = """
SELECT word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
WHERE length(word) > 2
GROUP BY word
"""


def q_index_stats(spark, sf_dir):
    """O15 — the stats map/reduce view (couchdb.go:97-109,291-311):
    conditional counts over one table, one output row."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.count(F.lit(1)).alias("total"),
        F.countDistinct("user_id").alias("users"),
        F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("errors"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


SQL_INDEX_STATS = """
SELECT count(*) AS total,
       count(DISTINCT user_id) AS users,
       count(*) FILTER (event_type = 'click') AS clicks,
       count(*) FILTER (event_type = 'error') AS errors,
       count(*) FILTER (event_type = 'purchase') AS purchases,
       round(sum(value), 2) AS total_value
FROM events
"""


def q_dedup_antijoin(spark, sf_dir):
    """O3 — the URL-seen gate as a left_anti join (couchdb.go:254-280):
    'clicks' whose user never appears in the 'signup' seen-set."""
    e = _events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click")
    seen = (
        e.where((F.col("event_type") == "signup") & (F.col("value") > 150))
        .select("user_id")
        .distinct()
    )
    return (
        clicks.join(seen, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_DEDUP_ANTIJOIN = """
SELECT user_id, count(*) AS cnt
FROM events e
WHERE event_type = 'click'
  AND NOT EXISTS (SELECT 1 FROM events s
                  WHERE s.event_type = 'signup' AND s.value > 150
                    AND s.user_id = e.user_id)
GROUP BY user_id
"""


def q_politeness_topk(spark, sf_dir):
    """O4 — per-host politeness budget: first k=2 rows per key in FIFO
    order via row_number (fetcher.go:97-99 generalized, SURVEY.md O4)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= 2)
        .select("user_id", "event_id", "rn")
    )


SQL_POLITENESS_TOPK = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
QUALIFY rn <= 2
"""


def q_frontier_expansion(spark, sf_dir):
    """O13 — frontier expansion: posexplode preserving document order
    (extractor.go:57-59 → one explode, SURVEY.md O13). 1-based pos to
    match SQL ordinality."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .select("doc_id", (F.col("pos") + 1).cast("bigint").alias("pos"), "word")
    )


SQL_FRONTIER_EXPANSION = """
SELECT doc_id,
       generate_subscripts(string_split(text, ' '), 1)::BIGINT AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents
"""


def q_crawl_order_topk(spark, sf_dir):
    """Sort/limit — global priority-queue head (frontier ORDER BY priority,
    SURVEY.md §2.2 sort/top-k row). Deterministic tiebreak on event_id."""
    return (
        _events(spark, sf_dir)
        .orderBy(F.desc("value"), F.asc("event_id"))
        .select("event_id", "value")
        .limit(100)
    )


SQL_CRAWL_ORDER_TOPK = """
SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 100
"""


def q_first_wins_dedup(spark, sf_dir):
    """Set ops — dropDuplicates with FIRST-wins order (SURVEY.md §2.2):
    row_number()==1, not dropDuplicates (which keeps an arbitrary row)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


SQL_FIRST_WINS_DEDUP = """
SELECT user_id, event_id, ts FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
"""


# ---------------------------------------------------------------------------
# Training-data pipeline operators (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------


def q_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep the lowest id."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("dupes"))
    )


SQL_EXACT_DEDUP = """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS dupes
FROM documents GROUP BY md5(text)
"""


def q_neardup_jaccard(spark, sf_dir):
    """N-gram-free Jaccard near-dup: word-set Jaccard between adjacent doc
    ids (integer-exact set sizes, so the double division is bit-identical).
    Declared BASELINE — the corpus-wide exact path is
    :func:`q_ngram_jaccard_pairs` (prefix-filtered candidate generation),
    and the sketch path is MinHash+LSH (:func:`q_minhash_lsh_pairs`)."""
    w = _spread(_docs(spark, sf_dir)).select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ws")
    )
    a = w.select(F.col("doc_id").alias("a_id"), F.col("ws").alias("aw"))
    b = w.select(F.col("doc_id").alias("b_id"), F.col("ws").alias("bw"))
    joined = a.join(b, F.col("b_id") == F.col("a_id") + 1)
    inter = F.size(F.array_intersect("aw", "bw"))
    union = F.size("aw") + F.size("bw") - inter
    return joined.select(
        "a_id",
        "b_id",
        F.round(inter.cast("double") / union.cast("double"), 6).alias("jaccard"),
    )


SQL_NEARDUP_JACCARD = """
WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
           FROM documents)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       round(len(list_intersect(a.ws, b.ws))::DOUBLE
             / (len(a.ws) + len(b.ws) - len(list_intersect(a.ws, b.ws)))::DOUBLE,
             6) AS jaccard
FROM w a JOIN w b ON b.doc_id = a.doc_id + 1
"""


_N_PERMS = 8


def _shingles_expr() -> str:
    # 3-word shingles, distinct. Callers must pre-filter size(w) >= 3 (Spark
    # sequence() DESCENDS when stop < start). Deliberately NOT wrapped in a
    # guarding CASE + post-filter on the result: a filter on the computed
    # array gets predicate-pushed below the projection, substituting this
    # whole expression into the filter — measured 5-6× slower from double
    # evaluation. Filter the cheap size(w) upstream instead.
    return (
        "array_distinct(transform("
        "  sequence(1, size(w) - 2),"
        "  i -> concat_ws(' ', element_at(w, i), element_at(w, i+1), element_at(w, i+2))"
        "))"
    )


def q_minhash_signatures(spark, sf_dir):
    """MinHash over 3-word shingles with 8 portable md5-derived permutations
    — the signature stage of MinHash+LSH dedup.

    Scale shape: each shingle is md5-hashed ONCE; the 8 permutation values
    are 8 overlapping 13-hex-char (52-bit) windows of that one digest, so
    the per-permutation minima fold into one array column per document
    (``transform(sequence(..), p -> array_min(..))``) and posexplode — a
    single narrow projection, zero shuffle, zero row multiplication, and
    1/8th the hashing of the naive shingles×perms crossJoin that pushes 8×
    rows through an aggregation exchange."""
    w = (
        _spread(_docs(spark, sf_dir))
        .select("doc_id", F.split("text", " ").alias("w"))
        .where(F.size("w") >= 3)  # early filter on the CHEAP column — see
        # _shingles_expr: filtering the computed array instead double-
        # evaluates the whole shingle transform via predicate pushdown
    )
    sh = w.select("doc_id", F.expr(_shingles_expr()).alias("sh"))
    hashed = sh.select(
        "doc_id", F.expr("transform(sh, s -> md5(s))").alias("hs")
    )
    mins = (
        f"transform(sequence(0, {_N_PERMS - 1}), p -> array_min(transform("
        f"hs, m -> cast(conv(substring(m, p * 2 + 1, 13), 16, 10) as bigint))))"
    )
    return hashed.select(
        "doc_id", F.posexplode(F.expr(mins)).alias("p", "minhash")
    ).select("doc_id", F.col("p").cast("bigint").alias("p"), "minhash")


SQL_MINHASH_SIGNATURES = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         CASE WHEN len(w) >= 3 THEN
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            for i in generate_series(1, len(w) - 2)]
         ELSE [] END)) AS s
       FROM w),
hs AS (SELECT doc_id, md5(s) AS m FROM sh),
perms AS (SELECT unnest(generate_series(0, {_N_PERMS - 1})) AS p)
SELECT doc_id, p,
       min(('0x' || substr(m, (p * 2 + 1)::INT, 13))::BIGINT) AS minhash
FROM hs CROSS JOIN perms
GROUP BY doc_id, p
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash LSH banding: 4 bands × 2 rows; candidate near-dup pairs =
    docs sharing any band key (shingle→minhash→band→bucket-join)."""
    sig = q_minhash_signatures(spark, sf_dir).withColumn(
        "band", (F.col("p") / 2).cast("int")
    )
    bands = sig.groupBy("doc_id", "band").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "minhash"))),
                lambda x: x["minhash"].cast("string"),
            ),
            ",",
        ).alias("band_key")
        # materialize once: both self-join sides read the band keys, and
        # recomputing the signature pipeline per side doubles the work
        # (at corpus scale the signatures are a stored table)
    ).localCheckpoint(eager=True)
    a = bands.select(
        F.col("doc_id").alias("a_id"), "band", F.col("band_key").alias("k1")
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), "band", F.col("band_key").alias("k2")
    )
    return (
        a.join(b, ["band"])
        .where((F.col("k1") == F.col("k2")) & (F.col("a_id") < F.col("b_id")))
        .select("a_id", "b_id")
        .distinct()
    )


SQL_MINHASH_LSH_PAIRS = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
         CASE WHEN len(w) >= 3 THEN
           [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
            for i in generate_series(1, len(w) - 2)]
         ELSE [] END)) AS s
       FROM w),
hs AS (SELECT doc_id, md5(s) AS m FROM sh),
perms AS (SELECT unnest(generate_series(0, {_N_PERMS - 1})) AS p),
sig AS (SELECT doc_id, p, (p // 2)::INT AS band,
               min(('0x' || substr(m, (p * 2 + 1)::INT, 13))::BIGINT) AS minhash
        FROM hs CROSS JOIN perms GROUP BY doc_id, p),
bands AS (SELECT doc_id, band,
                 string_agg(minhash::VARCHAR, ',' ORDER BY p) AS band_key
          FROM sig GROUP BY doc_id, band)
SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING — the end-to-end dedup decision the pair list
    feeds (keep one representative per cluster): connected components over
    the MinHash-LSH candidate graph by min-label propagation. Every doc's
    cluster_id = the smallest doc_id in its component; singletons label
    themselves.

    Scale shape (see :mod:`owlfrontier.graph`): each round is one
    equi-join of the edge list with the current labels plus a groupBy-min
    — |E| rows through one shuffle, no row multiplication — and rounds
    converge in graph-diameter steps (near-dup components are
    clique/star-like, diameter ≲ 3). ``graph.connected_components`` also
    offers ``mode="star"`` (alternating large-star/small-star, O(log² n)
    rounds for ANY diameter — the safe default when the graph shape is
    unknown); equivalence of the two is pytest-pinned, label mode is used
    here because the near-dup diameter is known-small."""
    from owlfrontier.graph import connected_components

    pairs = q_minhash_lsh_pairs(spark, sf_dir)
    nodes = _docs(spark, sf_dir).select(F.col("doc_id").alias("id"))
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    return connected_components(nodes, edges, mode="label").select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
pairs AS ({SQL_MINHASH_LSH_PAIRS}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL
          SELECT b_id AS src, a_id AS dst FROM pairs),
reach(root, node) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
)
SELECT root AS doc_id, min(node)::BIGINT AS cluster_id
FROM reach GROUP BY root
"""


_SIMHASH_BITS = 32


def q_simhash(spark, sf_dir):
    """SimHash (32-bit) over distinct words: per-bit ±1 votes from the
    portable word hash, integer-exact so both engines agree bit-for-bit.

    Scale shape: each word is md5-hashed ONCE into an ``hs`` array column
    (kept as its own projection so CollapseProject can't inline the
    non-cheap multi-referenced transform), then all 32 bit-votes and the
    final bit-pack are folded per row with ``aggregate``/``zip_with`` —
    zero shuffle and zero row multiplication, vs the naive words×32-bits
    crossJoin through a two-level aggregation exchange."""
    ws = (
        _spread(_docs(spark, sf_dir))
        .where(F.col("text").isNotNull())  # filter the raw column, not the
        # computed array (predicate pushdown would re-evaluate the split)
        .select("doc_id", F.array_distinct(F.split("text", " ")).alias("ws"))
    )
    hashed = ws.select(
        "doc_id", F.expr(f"transform(ws, w -> {_h60('w')})").alias("hs")
    )
    votes = (
        f"transform(sequence(0, {_SIMHASH_BITS - 1}), b -> "
        f"aggregate(hs, cast(0 as bigint), (a, h) -> "
        f"a + IF((shiftright(h, b) & 1) = 1, cast(1 as bigint), cast(-1 as bigint))))"
    )
    simhash = (
        f"aggregate(zip_with({votes}, sequence(0, {_SIMHASH_BITS - 1}), "
        f"(s, b) -> IF(s > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))), "
        f"cast(0 as bigint), (a, x) -> a + x)"
    )
    return hashed.select("doc_id", F.expr(simhash).alias("simhash"))


SQL_SIMHASH = f"""
WITH words AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
               FROM documents),
bits AS (SELECT unnest(generate_series(0, {_SIMHASH_BITS - 1}))::INT AS bit),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (({_h60_duck("word")} >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM words CROSS JOIN bits GROUP BY doc_id, bit)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
FROM per_bit GROUP BY doc_id
"""


_HAMMING_BANDS = 2  # 16-bit bands over the 32-bit simhash
_HAMMING_MAX = 1


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup PAIRS (exact hamming ≤ 1) at scale via query
    expansion: each doc emits 33 probe keys (its fingerprint + every
    single-bit flip) and an equi-join on the full 32-bit value returns
    exactly the answer pairs — candidates == answers, no all-pairs, no
    skewed LSH band buckets. The oracle computes the same pair set through
    the equivalent 16-bit-band + hamming-filter formulation (both are
    exact for hamming ≤ 1 by pigeonhole), so the two engines agree
    row-for-row."""
    # materialize the fingerprints once (localCheckpoint): both self-join
    # sides read them, and recomputing the simhash pipeline per side
    # measured 6× slower. At corpus scale the fingerprints are a stored
    # table anyway — this is that shape at benchmark scale.
    sim = q_simhash(spark, sf_dir).localCheckpoint(eager=True)
    # query expansion: each doc probes its own fingerprint plus all 32
    # single-bit flips; an equi-join on the FULL 32-bit value then yields
    # exactly the hamming ≤ 1 pairs. Candidates == answers — no skewed
    # band buckets (16-bit banding measured 1.2M candidate pairs for ~100k
    # answers on this near-dup-heavy corpus). Each unordered pair emerges
    # exactly once: (a probes, b matches) survives a_id < b_id, the mirror
    # row doesn't, so no distinct is needed.
    probes = sim.select(
        F.col("doc_id").alias("a_id"),
        F.col("simhash").alias("a_sim"),
        F.explode(
            F.expr(
                f"concat(array(simhash), transform("
                f"sequence(0, {_SIMHASH_BITS - 1}), "
                f"k -> simhash ^ shiftleft(cast(1 as bigint), k)))"
            )
        ).alias("probe"),
    )
    b = sim.select(F.col("doc_id").alias("b_id"),
                   F.col("simhash").alias("b_sim"))
    return (
        probes.join(b, F.col("probe") == F.col("b_sim"))
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.bit_count(F.expr("a_sim ^ b_sim")).cast("int").alias("hamming"),
        )
    )


SQL_SIMHASH_PAIRS = f"""
WITH words AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS word
               FROM documents),
bits AS (SELECT unnest(generate_series(0, {_SIMHASH_BITS - 1}))::INT AS bit),
per_bit AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (({_h60_duck("word")} >> bit) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM words CROSS JOIN bits GROUP BY doc_id, bit),
sim AS (SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
        FROM per_bit GROUP BY doc_id),
bands AS (SELECT doc_id, simhash, b AS band,
                 (simhash >> (b * 16)) & 65535 AS band_val
          FROM sim CROSS JOIN (SELECT unnest(generate_series(0, {_HAMMING_BANDS - 1})) AS b)),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
                bit_count(xor(a.simhash, b.simhash))::INT AS hamming
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_val = b.band_val
          AND a.doc_id < b.doc_id)
SELECT a_id, b_id, hamming FROM cand WHERE hamming <= {_HAMMING_MAX}
"""


_IVF_K = 8


def _ivf_cent_sql(e: DataFrame) -> str:
    """Collect the K×dim integer-quantized codebook (first K vectors — a
    deterministic stand-in for a trained k-means codebook) and render it as
    one Spark SQL array literal: the broadcast-codebook pattern shared by
    the IVF assign and search queries."""
    cents = (
        e.where(F.col("vec_id") < _IVF_K)
        .orderBy("vec_id")
        .select(
            "vec_id",
            F.expr(
                "transform(embedding, x -> "
                "cast(round(cast(x as double) * 1000000.0D) as bigint))"
            ).alias("ci"),
        )
        .collect()
    )
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"{v}L" for v in row["ci"]) + ")"
            for row in cents
        )
        + ")"
    )


def q_ann_ivf_assign(spark, sf_dir):
    """IVF coarse quantization (the other ANN scale path besides LSH):
    assign every vector to its nearest of K centroids by integer-quantized
    squared-L2 — at search time only the probed centroid's inverted list
    is scanned. The codebook here is the first K vectors (a deterministic
    stand-in for a k-means codebook — training is out of scope; the
    ASSIGN/probe dataflow is the Spark-side artifact). Scale shape: the
    K×dim codebook is collected once and embedded as a literal (the
    broadcast-codebook pattern); assignment is a per-row argmin fold —
    zero shuffle, zero row multiplication."""
    e = _emb(spark, sf_dir)
    cent_sql = _ivf_cent_sql(e)
    quant = _spread(e).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000000.0D) as bigint))"
        ).alias("xi"),
    )
    dists = (
        f"transform({cent_sql}, c -> aggregate("
        f"zip_with(xi, c, (a, b) -> (a - b) * (a - b)), "
        f"cast(0 as bigint), (acc, t) -> acc + t))"
    )
    # r6 (guide §1.2 per-task work): the K×dim distance fold is computed
    # ONCE as its own projection — inlining it into the argmin + dist2
    # expressions evaluated it 3× per row (CollapseProject keeps the
    # split because the alias is multi-referenced and non-cheap; the
    # same pattern q_simhash documents). argmin with lowest-centroid
    # tiebreak: array_position finds the FIRST occurrence of the minimum.
    return quant.select("vec_id", F.expr(dists).alias("d")).select(
        "vec_id",
        F.expr(
            "cast(array_position(d, array_min(d)) - 1 as bigint)"
        ).alias("centroid"),
        F.expr("array_min(d)").alias("dist2"),
    )


SQL_ANN_IVF_ASSIGN = f"""
WITH q AS (SELECT vec_id,
                  [round(x::DOUBLE * 1e6)::BIGINT for x in embedding] AS xi
           FROM embeddings),
c AS (SELECT vec_id AS cid, xi AS ci FROM q WHERE vec_id < {_IVF_K}),
d AS (SELECT q.vec_id, c.cid,
             list_sum([(q.xi[i] - c.ci[i]) * (q.xi[i] - c.ci[i])
                       for i in generate_series(1, len(q.xi))])::BIGINT AS dist2
      FROM q CROSS JOIN c)
SELECT vec_id, cid AS centroid, dist2
FROM d
QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) = 1
"""


_IVF_TRAIN_ITERS = 3


def _cent_literal(cents: list[list[int]]) -> str:
    return (
        "array("
        + ",".join(
            "array(" + ",".join(f"{v}L" for v in c) + ")" for c in cents
        )
        + ")"
    )


# (table path → validated dim): the uniformity check is ONE agg scan of
# the embeddings table — sound but not free on a 10^8-row corpus, and
# four ANN entry points call it; callers reading a known parquet table
# pass its path as `cache_key` so each table is validated once per
# session, not once per query (round-5 review). Ad-hoc DataFrames pass
# no key and are always re-checked (a plan-derived key is NOT safe:
# canonicalized LocalRelation plans elide their data).
_EMB_DIM_CACHE: dict[str, int] = {}


def _emb_dim(e, cache_key: str | None = None) -> int:
    """Embedding dimensionality, asserted UNIFORM across the table (one
    agg scan — the sound check a first()-row probe can't give; cached
    per table path so repeated ANN queries don't rescan). A silent
    size filter here would diverge from the DuckDB oracles, which apply
    none (ADVICE r4): a mixed-dim corpus now fails loudly on both paths
    instead of quietly disagreeing."""
    if cache_key is not None and cache_key in _EMB_DIM_CACHE:
        return _EMB_DIM_CACHE[cache_key]
    row = e.select(
        F.min(F.size("embedding")).alias("lo"),
        F.max(F.size("embedding")).alias("hi"),
    ).first()
    if row is None or row["lo"] is None:
        return 0  # empty tables are not cached: they may be written to
    if row["lo"] != row["hi"]:
        raise ValueError(
            f"mixed embedding dims ({row['lo']}..{row['hi']}) unsupported: "
            "LSH planes and quantized folds assume a uniform dimension"
        )
    if cache_key is not None:
        _EMB_DIM_CACHE[cache_key] = row["lo"]
    return row["lo"]


def _quantized_embeddings(spark, sf_dir):
    """(vec_id, xi array<bigint>) — embeddings quantized to integer
    micro-units so every distance/mean is associative and bit-identical
    at any cluster size (shared by the IVF training variants)."""
    e = _emb(spark, sf_dir)
    dim = _emb_dim(e, cache_key=f"{sf_dir}/embeddings.parquet")
    quant = _spread(e).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000000.0D) as bigint))"
        ).alias("xi"),
    ).localCheckpoint(eager=True)
    return quant, dim


def _lloyd_train(quant, dim: int, cents: list[list[int]],
                 iters: int) -> list[list[int]]:
    """Integer-exact Lloyd iterations from a given codebook (see
    q_ann_ivf_train for the scale shape per iteration)."""

    def trunc_div(s: int, n: int) -> int:
        # truncate toward zero — matches DuckDB's integer `//`
        return s // n if s >= 0 else -((-s) // n)

    for _ in range(iters):
        cent_sql = _cent_literal(cents)
        dists = (
            f"transform({cent_sql}, c -> aggregate("
            f"zip_with(xi, c, (a, b) -> (a - b) * (a - b)), "
            f"cast(0 as bigint), (acc, t) -> acc + t))"
        )
        # distance fold computed once per row (own projection — see
        # q_ann_ivf_assign), argmin over the materialized array
        rows = (
            quant.select(F.expr(dists).alias("d"), "xi")
            .select(
                F.expr(
                    "cast(array_position(d, array_min(d)) - 1 as bigint)"
                ).alias("cid"),
                "xi",
            )
            .groupBy("cid")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col("xi")[i]).alias(f"s{i}") for i in range(dim)],
            )
            .collect()
        )
        new = {
            int(r["cid"]): [
                trunc_div(int(r[f"s{i}"]), int(r["n"])) for i in range(dim)
            ]
            for r in rows
        }
        cents = [new.get(cid, old) for cid, old in enumerate(cents)]
    return cents


def _flatten_codebook(spark, cents: list[list[int]]):
    # Flattened to (cid, pos, value) scalar rows — array columns can't be
    # hashed by the driver's pandas canonicalizer (round-2 verdict #1).
    # pos is 1-based to match DuckDB's generate_subscripts.
    return spark.createDataFrame(
        [
            (cid, pos + 1, v)
            for cid, c in enumerate(cents)
            for pos, v in enumerate(c)
        ],
        "cid bigint, pos bigint, value bigint",
    )


def q_ann_ivf_train(spark, sf_dir):
    """IVF codebook TRAINING — integer-exact Lloyd k-means (3 iterations,
    K = _IVF_K, init = first K vectors), upgrading the assign/search
    queries' "first-K stand-in" to an actually trained codebook.

    Engine-exactness, like pagerank: float k-means sums coordinates in
    partition order and drifts run-to-run; here vectors are quantized
    bigints, per-cluster centroids are truncated integer means, and every
    step is associative — the trained codebook is bit-identical at any
    cluster size and hash-matches an unrolled-iteration DuckDB oracle.

    Scale shape per iteration: assignment is a per-row argmin fold over
    the broadcast codebook literal (zero shuffle, zero row
    multiplication); the update is ONE groupBy(cid) with dim+1 column
    sums (single shuffle of K×(dim+1) partial aggregates — never a
    dims× row explosion); only the K×dim codebook transits the driver,
    which is how every distributed k-means carries its centroids. Empty
    clusters keep their previous centroid."""
    quant, dim = _quantized_embeddings(spark, sf_dir)
    cents = [
        list(r["xi"])
        for r in quant.where(F.col("vec_id") < _IVF_K)
        .orderBy("vec_id").collect()
    ]
    cents = _lloyd_train(quant, dim, cents, _IVF_TRAIN_ITERS)
    return _flatten_codebook(spark, cents)


def _seed_farthest_first(quant, k: int) -> list[list[int]]:
    """Deterministic distributed seeding — farthest-first traversal
    (Gonzalez's k-center 2-approximation): start from the lowest vec_id,
    then k-1 rounds each pick the vector maximizing the MIN squared
    distance to the chosen set (ties: lowest vec_id).

    This is the integer-exact stand-in for k-means‖'s distance²-weighted
    oversampling (Bahmani et al.): the same "spread the initial centers
    by distance mass" idea, with the random draw replaced by the argmax
    so a DuckDB oracle can reproduce the codebook bit-for-bit. Scale
    shape per round: one per-row array fold over the broadcast chosen-set
    literal + a TakeOrdered top-1 (no shuffle, no full sort); only K×dim
    values ever transit the driver."""
    first = quant.orderBy("vec_id").select("xi").first()
    cents = [list(first["xi"])]
    for _ in range(k - 1):
        cent_sql = _cent_literal(cents)
        mind = (
            f"array_min(transform({cent_sql}, c -> aggregate("
            f"zip_with(xi, c, (a, b) -> (a - b) * (a - b)), "
            f"cast(0 as bigint), (acc, t) -> acc + t)))"
        )
        row = (
            quant.select("vec_id", "xi", F.expr(mind).alias("d"))
            .orderBy(F.desc("d"), F.asc("vec_id"))
            .first()
        )
        cents.append(list(row["xi"]))
    return cents


def q_ann_ivf_train_ff(spark, sf_dir):
    """IVF codebook training with DISTRIBUTED farthest-first seeding
    (_seed_farthest_first) instead of the first-K prefix init — the
    init-quality upgrade: the prefix init can start with K near-identical
    vectors, farthest-first provably spreads them. Same integer-exact
    Lloyd iterations afterwards; oracle-checked end to end (seeding
    included) against unrolled DuckDB CTEs."""
    quant, dim = _quantized_embeddings(spark, sf_dir)
    cents = _seed_farthest_first(quant, _IVF_K)
    cents = _lloyd_train(quant, dim, cents, _IVF_TRAIN_ITERS)
    return _flatten_codebook(spark, cents)


_DUCK_DIST2 = (
    "list_sum([(q.xi[i] - {c}[i]) * (q.xi[i] - {c}[i]) "
    "for i in generate_series(1, len(q.xi))])"
)


def _ff_seed_parts() -> list[str]:
    """Unrolled farthest-first seeding CTEs (mirrors _seed_farthest_first):
    u{r} accumulates the chosen set; e{r} computes each vector's min
    squared distance to it; s{r} is the deterministic argmax pick."""
    # fs/fu/fe prefixes: the Lloyd iteration CTEs already use u{k}/etc.
    parts = [
        "fs0 AS (SELECT vec_id, xi FROM q ORDER BY vec_id LIMIT 1)",
        "fu0 AS (SELECT xi FROM fs0)",
    ]
    d = _DUCK_DIST2.format(c="u.xi")
    for r in range(1, _IVF_K):
        parts.append(
            f"fe{r} AS (SELECT q.vec_id, any_value(q.xi) AS xi, "
            f"min({d})::BIGINT AS d "
            f"FROM q CROSS JOIN fu{r - 1} u GROUP BY q.vec_id)"
        )
        parts.append(
            f"fs{r} AS (SELECT vec_id, xi FROM fe{r} "
            f"ORDER BY d DESC, vec_id LIMIT 1)"
        )
        parts.append(
            f"fu{r} AS (SELECT xi FROM fu{r - 1} "
            f"UNION ALL SELECT xi FROM fs{r})"
        )
    union = " UNION ALL ".join(
        f"SELECT {r} AS cid, xi AS ci FROM fs{r}" for r in range(_IVF_K)
    )
    parts.append(f"c0 AS ({union})")
    return parts


def _ivf_train_sql(seed_parts: list[str] | None = None) -> str:
    """Unrolled Lloyd iterations in DuckDB: same init, same quantization,
    same truncating integer mean (`//`), empty clusters keep the previous
    centroid via LEFT JOIN + COALESCE. ``seed_parts`` supplies the CTEs
    defining ``c0`` (default: the first-K prefix init)."""
    parts = [
        "q AS (SELECT vec_id, [round(x::DOUBLE * 1e6)::BIGINT "
        "for x in embedding] AS xi FROM embeddings)",
    ] + (
        seed_parts
        if seed_parts is not None
        else [
            f"c0 AS (SELECT vec_id AS cid, xi AS ci FROM q "
            f"WHERE vec_id < {_IVF_K})"
        ]
    )
    for k in range(_IVF_TRAIN_ITERS):
        parts.append(
            f"d{k} AS (SELECT q.vec_id, c.cid, "
            f"list_sum([(q.xi[i] - c.ci[i]) * (q.xi[i] - c.ci[i]) "
            f"for i in generate_series(1, len(q.xi))])::BIGINT AS dist2 "
            f"FROM q CROSS JOIN c{k} c)"
        )
        parts.append(
            f"a{k} AS (SELECT vec_id, cid FROM d{k} "
            f"QUALIFY row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY dist2, cid) = 1)"
        )
        parts.append(
            f"u{k} AS (SELECT a.cid, generate_subscripts(q.xi, 1) AS pos, "
            f"unnest(q.xi) AS val "
            f"FROM a{k} a JOIN q ON q.vec_id = a.vec_id)"
        )
        parts.append(
            f"m{k} AS (SELECT cid, pos, "
            f"(sum(val)::BIGINT // count(*)::BIGINT) AS v "
            f"FROM u{k} GROUP BY cid, pos)"
        )
        parts.append(
            f"n{k} AS (SELECT cid, list(v ORDER BY pos) AS ci "
            f"FROM m{k} GROUP BY cid)"
        )
        parts.append(
            f"c{k + 1} AS (SELECT c.cid, COALESCE(n.ci, c.ci) AS ci "
            f"FROM c{k} c LEFT JOIN n{k} n ON n.cid = c.cid)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT cid, generate_subscripts(ci, 1)::BIGINT AS pos, "
        f"unnest(ci)::BIGINT AS value FROM c{_IVF_TRAIN_ITERS}"
    )


SQL_ANN_IVF_TRAIN = _ivf_train_sql()
SQL_ANN_IVF_TRAIN_FF = _ivf_train_sql(_ff_seed_parts())


_IVF_NPROBE = 2
_IVF_TOPK = 5
_IVF_NQUERIES = 5


def q_ann_ivf_topk(spark, sf_dir, nprobe: int = _IVF_NPROBE,
                   topk: int = _IVF_TOPK):
    """IVF search — completes the ANN IVF path (q_ann_ivf_assign is the
    build side): each query probes its ``nprobe`` nearest centroids and
    ranks exact cosine ONLY over those centroids' inverted lists, never
    the full corpus. Scale shape: assignment and probe selection are
    per-row array folds over the broadcast codebook literal (zero
    shuffle); the probe→candidate step is an equi-join on centroid id
    with the tiny probe side broadcast, so the corpus is scanned once and
    only 1/K·nprobe of it reaches the ranking window — vs the bruteforce
    baseline's full crossJoin.

    ``nprobe`` is THE recall/cost knob: each +1 scans one more inverted
    list (~1/K of the corpus) per query; ``nprobe == _IVF_K`` probes
    every list and returns exactly the brute-force answer. The recall
    contract (tests/test_ann_recall.py) pins recall@k ≥ 0.8 at the
    default nprobe on a clustered corpus, monotone non-decreasing in
    nprobe, and == 1.0 at nprobe == K."""
    e = _emb(spark, sf_dir)
    cent_sql = _ivf_cent_sql(e)
    quant = _spread(e).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000000.0D) as bigint))"
        ).alias("xi"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    dists = (
        f"transform({cent_sql}, c -> aggregate("
        f"zip_with(xi, c, (a, b) -> (a - b) * (a - b)), "
        f"cast(0 as bigint), (acc, t) -> acc + t))"
    )
    # r6: the K×dim distance fold runs once per row (own projection —
    # see q_ann_ivf_assign: inlined it was evaluated twice by the argmin
    # expression), and each side's norm is computed once per ROW here
    # instead of once per scored pair below (same sqrt/double math, so
    # cos is bit-identical)
    nn_ = "sqrt(aggregate(transform(v, x -> x * x), 0D, (a, x) -> a + x))"
    dq = quant.select("vec_id", "v", F.expr(dists).alias("d"))
    inv = dq.select(
        F.col("vec_id").alias("neighbor_id"),
        # coalesce is a value-level no-op (d is a non-empty literal-sized
        # array, so the argmin can never be null) but it makes the join
        # key NON-NULLABLE — without it the planner pushes an
        # isnotnull(cid) filter below the _spread exchange that re-runs
        # the whole K×dim fold per row ON THE UNSPLIT SCAN, i.e.
        # single-threaded (measured: 5.1 s join stage → 1.5 s)
        F.expr(
            "coalesce(cast(array_position(d, array_min(d)) - 1 as bigint),"
            " -1L)"
        ).alias("cid"),
        F.col("v").alias("nv"),
        F.expr(nn_).alias("nn"),
    )
    # nprobe nearest centroids per query: sort (dist2, cid) structs — the
    # same tiebreak as the assign — and slice the head
    probes = (
        dq.where(F.col("vec_id") < _IVF_NQUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.expr(nn_).alias("qn"),
            F.expr(
                f"slice(array_sort(zip_with(d, "
                f"sequence(0, {_IVF_K - 1}), "
                f"(dd, i) -> struct(dd AS d, cast(i as bigint) AS cid))), "
                f"1, {nprobe})"
            ).alias("probe"),
        )
        .select("query_id", "qv", "qn", F.explode("probe").alias("p"))
        .select("query_id", "qv", "qn", F.col("p.cid").alias("cid"))
    )
    dot = "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    scored = F.broadcast(probes).join(inv, "cid").select(
        "query_id",
        "neighbor_id",
        F.expr(f"({dot}) / (qn * nn)").alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= topk)
        .select("query_id", "neighbor_id", "rnk")
    )


SQL_ANN_IVF_TOPK = f"""
WITH q AS (SELECT vec_id,
                  [round(x::DOUBLE * 1e6)::BIGINT for x in embedding] AS xi,
                  embedding::DOUBLE[] AS v
           FROM embeddings),
c AS (SELECT vec_id AS cid, xi AS ci FROM q WHERE vec_id < {_IVF_K}),
d AS (SELECT q.vec_id, c.cid,
             list_sum([(q.xi[i] - c.ci[i]) * (q.xi[i] - c.ci[i])
                       for i in generate_series(1, len(q.xi))])::BIGINT AS dist2
      FROM q CROSS JOIN c),
assign AS (SELECT vec_id AS neighbor_id, cid FROM d
           QUALIFY row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist2, cid) = 1),
probes AS (SELECT vec_id AS query_id, cid FROM d
           WHERE vec_id < {_IVF_NQUERIES}
           QUALIFY row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist2, cid) <= {_IVF_NPROBE}),
s AS (SELECT p.query_id, a.neighbor_id,
             list_cosine_similarity(qe.v, ne.v) AS cos
      FROM probes p
      JOIN assign a ON a.cid = p.cid
      JOIN q qe ON qe.vec_id = p.query_id
      JOIN q ne ON ne.vec_id = a.neighbor_id)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY cos DESC, neighbor_id)::BIGINT AS rnk
FROM s QUALIFY rnk <= {_IVF_TOPK}
"""


_PR_ITERS = 5
_PR_SCALE = 10**12
_PR_DAMP_NUM = 85  # damping 0.85 as integer per-cents


def q_pagerank(spark, sf_dir):
    """PageRank over the deterministic doc link graph (doc i → (2i+1) mod N
    and (3i+7) mod N — the same graph the flagship crawl entry synthesizes)
    — the classic crawl-priority signal (feed it to ``--priority`` as a
    frontier expression to crawl important pages first).

    INTEGER-EXACT on purpose: ranks are bigints in units of 1e-12. Float
    PageRank sums contributions in partition order, so results vary
    run-to-run and engine-to-engine; quantized bigint arithmetic makes
    every iteration associative and the result bit-identical at any
    cluster size (and hash-matchable against the oracle). Scale shape:
    each of the 5 iterations is one edges⋈ranks equi-join plus a
    groupBy-sum — |E| rows through one shuffle, lineage truncated per
    iteration like the crawl loop."""
    docs = _docs(spark, sf_dir).select("doc_id")
    n = docs.count()
    base = _PR_SCALE // n
    base15 = (100 - _PR_DAMP_NUM) * base // 100
    edges = docs.selectExpr(
        "doc_id AS src", f"pmod(2 * doc_id + 1, {n}) AS dst"
    ).unionAll(
        docs.selectExpr("doc_id AS src", f"pmod(3 * doc_id + 7, {n}) AS dst")
    ).localCheckpoint(eager=True)
    r = docs.select(
        F.col("doc_id").alias("id"), F.lit(base).cast("bigint").alias("pr")
    )
    for _ in range(_PR_ITERS):
        contrib = edges.join(r, edges["src"] == r["id"]).select(
            "dst", F.expr("pr div 2").alias("c")  # outdegree is exactly 2
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("sc"))
        r = (
            docs.join(sums, docs["doc_id"] == sums["dst"], "left")
            .select(
                F.col("doc_id").alias("id"),
                (
                    F.lit(base15)
                    + F.expr(f"coalesce(sc, 0L) * {_PR_DAMP_NUM} div 100")
                ).cast("bigint").alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select(F.col("id").alias("doc_id"), "pr")


def _pagerank_sql() -> str:
    """Unrolled-iteration DuckDB oracle with IDENTICAL integer arithmetic
    (sum cast ::BIGINT — DuckDB sums BIGINT into HUGEINT, the float64
    hash pitfall)."""
    base = f"({_PR_SCALE} // (SELECT c FROM n))"
    base15 = f"((100 - {_PR_DAMP_NUM}) * {base} // 100)"
    ctes = [
        "n AS (SELECT count(*) AS c FROM documents)",
        "e AS (SELECT doc_id AS src, (2 * doc_id + 1) % (SELECT c FROM n) AS dst FROM documents "
        "UNION ALL SELECT doc_id, (3 * doc_id + 7) % (SELECT c FROM n) FROM documents)",
        f"r0 AS (SELECT doc_id AS id, {base}::BIGINT AS pr FROM documents)",
    ]
    for k in range(_PR_ITERS):
        ctes.append(
            f"r{k + 1} AS (SELECT d.doc_id AS id, "
            f"({base15} + COALESCE(s.sc, 0) * {_PR_DAMP_NUM} // 100)::BIGINT AS pr "
            f"FROM documents d LEFT JOIN ("
            f"SELECT e.dst, sum(r{k}.pr // 2)::BIGINT AS sc "
            f"FROM e JOIN r{k} ON r{k}.id = e.src GROUP BY e.dst) s "
            f"ON s.dst = d.doc_id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id AS doc_id, pr FROM r{_PR_ITERS}"
    )


SQL_PAGERANK = _pagerank_sql()


def q_order_seq(spark, sf_dir):
    """Dense order-preserving sequence numbers WITHOUT a global
    single-partition sort (ordering.with_order_preserving_seq: range
    partitions + per-partition offsets + one mapInPandas numbering pass) —
    the at-scale way to assign submission order to a 10^8-row seed table.
    Oracle = the equivalent global-sort row_number."""
    from owlfrontier.ordering import with_order_preserving_seq

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.length("text").cast("bigint").alias("text_len")
    )
    return with_order_preserving_seq(
        docs, ["text_len", "doc_id"], partitions=8
    ).select("doc_id", "seq")


SQL_ORDER_SEQ = """
SELECT doc_id,
       (row_number() OVER (ORDER BY length(text), doc_id) - 1)::BIGINT AS seq
FROM documents
"""


def q_ann_bruteforce_topk(spark, sf_dir):
    """Brute-force cosine top-k (the ANN baseline): 5 query vectors × all
    candidates; output integer ranks only (float scores are not
    hash-portable across engines)."""
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    q = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
    dot = "aggregate(zip_with(qv, nv, (x, y) -> x * y), 0D, (a, x) -> a + x)"
    qn = "sqrt(aggregate(transform(qv, x -> x * x), 0D, (a, x) -> a + x))"
    nn = "sqrt(aggregate(transform(nv, x -> x * x), 0D, (a, x) -> a + x))"
    scored = q.crossJoin(c).select(
        "query_id", "neighbor_id", F.expr(f"({dot}) / ({qn} * {nn})").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= 10)
        .select("query_id", "neighbor_id", "rnk")
    )


SQL_ANN_BRUTEFORCE_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
s AS (SELECT query_id, e.vec_id AS neighbor_id,
             list_cosine_similarity(qv, e.v) AS cos
      FROM q CROSS JOIN e)
SELECT query_id, neighbor_id,
       row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)::BIGINT AS rnk
FROM s QUALIFY rnk <= 10
"""


_LSH_PLANES = 16


def _lsh_bucket_expr(dim: int, planes: int) -> str:
    """Spark SQL expression packing a row's hyperplane-LSH bucket id: the
    data-independent ±1 sign matrix is precomputed driver-side (one md5
    per matrix CELL, not per row) and embedded as a literal; all `planes`
    projections fold per row over the quantized `xi` array — zero shuffle,
    zero row multiplication, zero per-row hashing."""
    signs = [
        [1 if _py_h60(f"{b},{d}") % 2 == 0 else -1 for d in range(dim)]
        for b in range(planes)
    ]
    signs_sql = (
        "array("
        + ",".join(
            "array(" + ",".join(f"{s}L" for s in row) + ")" for row in signs
        )
        + ")"
    )
    projs = (
        f"transform({signs_sql}, srow -> "
        f"aggregate(zip_with(xi, srow, (x, s) -> x * s), "
        f"cast(0 as bigint), (a, t) -> a + t))"
    )
    return (
        f"aggregate(zip_with({projs}, sequence(0, {planes - 1}), "
        f"(p, b) -> IF(p > 0, shiftleft(cast(1 as bigint), b), cast(0 as bigint))), "
        f"cast(0 as bigint), (a, t) -> a + t)"
    )


def q_ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucketing (the ANN scale path): 16 pseudo-
    hyperplanes from the portable hash; embeddings quantized to integers
    before summation so the sign is order-independent and engine-exact.

    Scale shape: the 16×dim ±1 sign matrix is data-independent, so it is
    precomputed on the driver (one md5 per matrix cell, not per row) and
    embedded as a literal — the standard hyperplane-LSH pattern of
    generating planes driver-side and broadcasting. Each vector folds all
    16 projections per row via ``zip_with``/``aggregate`` — zero shuffle,
    zero row multiplication, zero per-row hashing, vs the naive dims×16
    crossJoin through two aggregation exchanges. Assumes fixed-dimension
    embeddings (asserted uniform by _emb_dim), the norm for embedding
    tables."""
    e = _emb(spark, sf_dir)
    dim = _emb_dim(e, cache_key=f"{sf_dir}/embeddings.parquet")
    quant = _spread(e).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000000.0D) as bigint))"
        ).alias("xi"),
    )
    bucket = _lsh_bucket_expr(dim, _LSH_PLANES)
    return quant.select("vec_id", F.expr(bucket).alias("bucket"))


SQL_ANN_LSH_BUCKETS = f"""
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                  unnest(embedding) AS x
           FROM embeddings),
planes AS (SELECT unnest(generate_series(0, {_LSH_PLANES - 1}))::INT AS b),
proj AS (
  SELECT vec_id, b,
         sum(round(x::DOUBLE * 1e6)::BIGINT *
             (CASE WHEN {_h60_duck("b::VARCHAR || ',' || d::VARCHAR")} % 2 = 0
                   THEN 1 ELSE -1 END)) AS proj
  FROM e CROSS JOIN planes GROUP BY vec_id, b)
SELECT vec_id,
       sum(CASE WHEN proj > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS bucket
FROM proj GROUP BY vec_id
"""


_LSH_PAIR_PLANES = 8
# the synthetic embeddings are near-random (collision-pair cosine tops out
# ~0.44 at sf0.01) — 0.2 keeps a meaningful survivor set; a real near-dup
# corpus would run 0.9+
_LSH_PAIR_COS = 0.2


def q_ann_lsh_pairs(spark, sf_dir):
    """Embedding-cosine near-dup at corpus scale (the scale path whose
    baseline is q_neardup_embedding's adjacent-pair demo): candidate pairs
    are vectors COLLIDING in an 8-plane hyperplane-LSH bucket — a bucket
    equi-self-join compares only collisions, never all pairs — then exact
    integer-quantized cosine (order-stable, engine-exact) keeps pairs
    ≥ _LSH_PAIR_COS. Fewer planes than the bucketing query on purpose: pair recall
    wants coarser buckets (2^8) than point-lookup bucketing (2^16); a
    skew-hot bucket would be split by banding the planes minhash-style.
    The bucketed table is materialized once (localCheckpoint) because both
    self-join sides read it."""
    e = _emb(spark, sf_dir)
    dim = _emb_dim(e, cache_key=f"{sf_dir}/embeddings.parquet")
    quant = _spread(e).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("q"),
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000000.0D) as bigint))"
        ).alias("xi"),
    )
    bucket = _lsh_bucket_expr(dim, _LSH_PAIR_PLANES)
    # per-vector norm computed once (not per pair) — identical sqrt math
    norm = ("sqrt(cast(aggregate(transform(q, x -> x * x), "
            "cast(0 as bigint), (acc, v) -> acc + v) as double))")
    bk = quant.select(
        "vec_id", "q", F.expr(bucket).alias("bucket"),
        F.expr(norm).alias("rn"),
    ).localCheckpoint(eager=True)
    a = bk.select(F.col("vec_id").alias("a_id"), F.col("q").alias("qa"),
                  F.col("rn").alias("rna"), "bucket")
    b = bk.select(F.col("vec_id").alias("b_id"), F.col("q").alias("qb"),
                  F.col("rn").alias("rnb"), "bucket")
    j = a.join(b, "bucket").where(F.col("a_id") < F.col("b_id"))
    dot = ("aggregate(zip_with(qa, qb, (x, y) -> x * y), "
           "cast(0 as bigint), (acc, v) -> acc + v)")
    cos = F.expr(f"cast({dot} as double) / (rna * rnb)")
    return (
        j.select("a_id", "b_id", F.round(cos, 6).alias("cos_q"))
        .where(F.col("cos_q") >= _LSH_PAIR_COS)
    )


SQL_ANN_LSH_PAIRS = f"""
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                  unnest(embedding) AS x
           FROM embeddings),
planes AS (SELECT unnest(generate_series(0, {_LSH_PAIR_PLANES - 1}))::INT AS b),
proj AS (
  SELECT vec_id, b,
         sum(round(x::DOUBLE * 1e6)::BIGINT *
             (CASE WHEN {_h60_duck("b::VARCHAR || ',' || d::VARCHAR")} % 2 = 0
                   THEN 1 ELSE -1 END)) AS proj
  FROM e CROSS JOIN planes GROUP BY vec_id, b),
bk AS (SELECT vec_id,
              sum(CASE WHEN proj > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS bucket
       FROM proj GROUP BY vec_id),
q AS (SELECT vec_id, [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q
      FROM embeddings),
cand AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id
         FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
s AS (SELECT c.a_id, c.b_id,
             round(
               list_reduce(list_prepend(0::BIGINT,
                 [qa.q[i] * qb.q[i] for i in generate_series(1, len(qa.q))]),
                 (acc, v) -> acc + v)::DOUBLE
               / (sqrt(list_reduce(list_prepend(0::BIGINT,
                    [x * x for x in qa.q]), (acc, v) -> acc + v)::DOUBLE)
                  * sqrt(list_reduce(list_prepend(0::BIGINT,
                    [x * x for x in qb.q]), (acc, v) -> acc + v)::DOUBLE)),
               6) AS cos_q
      FROM cand c
      JOIN q qa ON qa.vec_id = c.a_id
      JOIN q qb ON qb.vec_id = c.b_id)
SELECT a_id, b_id, cos_q FROM s WHERE cos_q >= {_LSH_PAIR_COS}
"""


_LSH_BANDS = 4
_LSH_BAND_PLANES = 4  # bands × band-planes == _LSH_PLANES (16)
# Arrow-dot gate: above this the quantized-vector matrix no longer
# belongs in a driver collect + broadcast (1M × 64 × 8 B = 512 MB —
# a 2× margin under the default 1 GB spark.driver.maxResultSize, so an
# sf-escalated bench run degrades to the pure-Catalyst HOF fold instead
# of failing the collect) and the banded verify keeps the HOF fold
_ARROW_DOT_MAX_VECS = 1_000_000
# Arrow-intersect gate (q_ngram_jaccard_pairs): the padded sorted
# doc × gram-id matrix must stay collectable/broadcastable —
# 2^26 int64 cells = 512 MB, same 2× maxResultSize margin
_ARROW_INTERSECT_MAX_CELLS = 67_108_864


def q_ann_lsh_pairs_banded(spark, sf_dir):
    """Embedding near-dup candidate generation with BANDED hyperplane LSH
    — the recall-correct scale path. Single-bucket LSH (q_ann_lsh_pairs)
    requires ALL planes to agree, so even near-identical vectors
    (cos 0.99, per-plane agreement ~0.955) collide with probability only
    0.955^8 ≈ 0.69; banding (the minhash-LSH OR-of-ANDs shape) splits the
    16 planes into 4 bands of 4 and a pair is a candidate if ANY band's
    sub-bucket matches: miss probability (1 − 0.955⁴)⁴ ≈ 0.001. Recall
    contract in tests/test_ann_recall.py.

    Scale shape (r6 revision, guide §2.4/§3.1/§8): the 16-bit bucket is
    ONE per-row fold over the broadcast sign matrix (shared with
    q_ann_lsh_buckets); band keys are arithmetic bit-slices of it; the
    candidate self-join matches on (band, sub-bucket) with ONLY
    (vec_id, bucket) on the broadcast build side — never the quantized
    arrays. The OR-over-bands dedup is a MAP-SIDE FILTER: a pair
    colliding in several bands keeps only the row whose band is the
    SMALLEST matching band (decidable from the two bucket ids alone),
    which replaces the old groupBy(first(qa), first(qb)) pair dedup —
    array-typed aggregation buffers forced a SortAggregate plus a full
    pair-row exchange carrying both arrays (~1 KB/pair). Vector norms
    are precomputed once per vector (not per pair), and the arrays are
    re-attached by a second broadcast hash join, so the whole query is
    one shuffle-free codegen pipeline. Never all-pairs."""
    e = _emb(spark, sf_dir)
    dim = _emb_dim(e, cache_key=f"{sf_dir}/embeddings.parquet")
    quant = _spread(e).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("q"),
        F.expr(
            "transform(embedding, x -> "
            "cast(round(cast(x as double) * 1000000.0D) as bigint))"
        ).alias("xi"),
    )
    bucket = _lsh_bucket_expr(dim, _LSH_PLANES)
    # per-vector norm, computed once here instead of once per candidate
    # pair (the sqrt-of-bigint double math is unchanged, so cos_q is
    # bit-identical to the per-pair formulation)
    norm = ("sqrt(cast(aggregate(transform(q, x -> x * x), "
            "cast(0 as bigint), (acc, v) -> acc + v) as double))")
    from pyspark.sql import Observation

    # vector count rides the checkpoint job — gates the Arrow-dot path
    # below on the same fits-in-a-broadcast posture the norm joins assume
    _obs_bk = Observation()
    bk = quant.select(
        "vec_id", "q", F.expr(bucket).alias("bucket"),
        F.expr(norm).alias("rn"),
    ).observe(_obs_bk, F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )
    band_keys = F.array(*[
        F.struct(
            F.lit(b).cast("bigint").alias("band"),
            F.expr(
                f"(bucket div {1 << (b * _LSH_BAND_PLANES)}) "
                f"% {1 << _LSH_BAND_PLANES}"
            ).cast("bigint").alias("bb"),
        )
        for b in range(_LSH_BANDS)
    ])
    keys = bk.select(
        "vec_id", "bucket", F.explode(band_keys).alias("k")
    ).select("vec_id", "bucket", "k.band", "k.bb")
    a = keys.select(
        F.col("vec_id").alias("a_id"), F.col("bucket").alias("abkt"),
        "band", "bb",
    )
    b = keys.select(
        F.col("vec_id").alias("b_id"), F.col("bucket").alias("bbkt"),
        "band", "bb",
    )
    # smallest band in which the two buckets agree — every joined row has
    # at least one (its own), so the ELSE arm is exact, not a default
    first_band = "CASE " + " ".join(
        f"WHEN (abkt div {1 << (bi * _LSH_BAND_PLANES)}) "
        f"% {1 << _LSH_BAND_PLANES} = "
        f"(bbkt div {1 << (bi * _LSH_BAND_PLANES)}) "
        f"% {1 << _LSH_BAND_PLANES} THEN {bi}L"
        for bi in range(_LSH_BANDS - 1)
    ) + f" ELSE {_LSH_BANDS - 1}L END"
    # the broadcast hint on the index side is applied only inside the
    # size gate below (4n rows of 32 B — bounded by the same posture as
    # the vector-matrix collect); beyond the gate the planner chooses
    # the join strategy, so an arbitrarily large vector table degrades
    # to a shuffled join instead of blowing the 8 GB broadcast cap
    n_vec = _obs_bk.get["n"]
    in_gate = n_vec <= _ARROW_DOT_MAX_VECS
    cand = (
        a.join(F.broadcast(b) if in_gate else b, ["band", "bb"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(F.col("band") == F.expr(first_band))
        .select("a_id", "b_id")
    )
    # -- exact integer dot per candidate pair ------------------------------
    # r6 second revision (guide §4.2): the zip_with/aggregate fold was
    # measured as THE wall of this query — at sf1.0 the 46 M candidate
    # pairs cost 13.5 s in per-element interpreted lambda dispatch while
    # the entire candidate join + array attach was 1.8 s. The dot product
    # (and ONLY the dot product — an exact int64 sum, bit-identical in
    # any engine) moves to a vectorized numpy `mapInArrow`: just the
    # (a_id, b_id) pairs cross the Python boundary (16 bytes/row), the
    # quantized vectors ride a Spark broadcast as one (n × dim) int64
    # matrix fetched once per executor, and each Arrow batch is two
    # searchsorted gathers + one einsum in C. cos/round/threshold stay
    # in the JVM on the same broadcast-attached norms as before, so the
    # double math is unchanged expression-for-expression. Gated on the
    # vector-table size: beyond _ARROW_DOT_MAX_VECS (the same "fits in
    # a broadcast" posture the array-attach joins already assume) the
    # HOF-fold path below is the plan, unchanged from r6-rev1.
    if in_gate:
        va_n = F.broadcast(bk.select(
            F.col("vec_id").alias("a_id"), F.col("rn").alias("rna"),
        ))
        vb_n = F.broadcast(bk.select(
            F.col("vec_id").alias("b_id"), F.col("rn").alias("rnb"),
        ))
        import numpy as np

        tbl = bk.select("vec_id", "q", "rn").toArrow()
        ids = tbl.column("vec_id").to_numpy(zero_copy_only=False)
        rns = tbl.column("rn").to_numpy(zero_copy_only=False)
        qcol = tbl.column("q").combine_chunks()
        qmat = qcol.flatten().to_numpy(zero_copy_only=False).reshape(
            len(ids) if len(ids) else 0, dim
        ).astype(np.int64, copy=False)
        order = np.argsort(ids, kind="stable")
        ids_sorted = ids[order]
        qmat_sorted = np.ascontiguousarray(qmat[order])
        # narrowest exact storage / accumulator (guide §2.3 "narrower
        # types", applied to the gather traffic: two 64-element rows are
        # fetched per pair, so int16 storage quarters the dominant
        # memory traffic — measured 1.6x on the kernel; unit-norm
        # embeddings quantized at 1e3 are |q| <= 1000, but the dtypes
        # are chosen from the actual max so arbitrary inputs stay exact)
        qmax = int(np.abs(qmat_sorted).max()) if qmat_sorted.size else 0
        for store_t in (np.int16, np.int32, np.int64):
            if qmax <= np.iinfo(store_t).max:
                break
        qmat_sorted = qmat_sorted.astype(store_t, copy=False)
        acc_t = (
            np.int32
            if max(dim, 1) * qmax * qmax <= np.iinfo(np.int32).max
            else np.int64
        )
        rns_sorted = np.ascontiguousarray(rns[order])
        bc = spark.sparkContext.broadcast(
            (ids_sorted, qmat_sorted, rns_sorted, acc_t)
        )
        # conservative Python-side pre-gate: numpy float64 cos equals the
        # JVM's bit-for-bit (same exact-integer dot, same IEEE sqrt
        # products/division on the same collected norms), and the final
        # decision is round(cos,6) >= τ ⟺ cos >= τ - 5e-7 — keeping
        # everything >= τ - 1e-6 is a strict superset, so the JVM's
        # rounded filter below decides identically while the Arrow
        # return stream and the norm-attach joins shrink to the ~1%
        # survivors instead of every candidate pair.
        pre_gate = float(_LSH_PAIR_COS) - 1e-6

        def _dot_batches(batches):
            import numpy as np
            import pyarrow as pa

            ids_s, qs, rn_, acc = bc.value
            for batch in batches:
                a = batch.column(0).to_numpy(zero_copy_only=False)
                b_ = batch.column(1).to_numpy(zero_copy_only=False)
                ai = np.searchsorted(ids_s, a)
                bi = np.searchsorted(ids_s, b_)
                d = np.einsum("ij,ij->i", qs[ai], qs[bi], dtype=acc)
                # keep == NOT(cos < gate): NaN cos (zero-norm vector)
                # must SURVIVE the pre-gate — Spark SQL and DuckDB both
                # order NaN above every number, so the JVM's
                # round(cos,6) >= τ keeps those rows and the kernel
                # must not drop them
                with np.errstate(divide="ignore", invalid="ignore"):
                    cospy = d.astype(np.float64) / (rn_[ai] * rn_[bi])
                keep = ~(cospy < pre_gate)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(a[keep], type=pa.int64()),
                     pa.array(b_[keep], type=pa.int64()),
                     pa.array(d[keep].astype(np.int64), type=pa.int64())],
                    names=["a_id", "b_id", "dot"],
                )

        withdot = cand.mapInArrow(
            _dot_batches, "a_id bigint, b_id bigint, dot bigint"
        )
        cos = F.expr("cast(dot as double) / (rna * rnb)")
        return (
            withdot.join(va_n, "a_id").join(vb_n, "b_id")
            .select("a_id", "b_id", F.round(cos, 6).alias("cos_q"))
            .where(F.col("cos_q") >= _LSH_PAIR_COS)
        )
    # beyond-gate fallback: NO broadcast hints — the vector table is by
    # definition too big for the driver here, so the planner picks the
    # join strategy (a shuffled join at true scale, an auto-broadcast at
    # the test sizes that force this path)
    va = bk.select(
        F.col("vec_id").alias("a_id"), F.col("q").alias("qa"),
        F.col("rn").alias("rna"),
    )
    vb = bk.select(
        F.col("vec_id").alias("b_id"), F.col("q").alias("qb"),
        F.col("rn").alias("rnb"),
    )
    # dot via one zip_with/aggregate fold (measured: an unrolled
    # qa[0]*qb[0]+… flat sum was 12× SLOWER — the giant expression tree
    # drops out of codegen into interpreted per-element GetArrayItem)
    dot = ("aggregate(zip_with(qa, qb, (x, y) -> x * y), "
           "cast(0 as bigint), (acc, v) -> acc + v)")
    cos = F.expr(f"cast({dot} as double) / (rna * rnb)")
    return (
        cand.join(va, "a_id").join(vb, "b_id")
        .select("a_id", "b_id", F.round(cos, 6).alias("cos_q"))
        .where(F.col("cos_q") >= _LSH_PAIR_COS)
    )


SQL_ANN_LSH_PAIRS_BANDED = f"""
WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
                  unnest(embedding) AS x
           FROM embeddings),
planes AS (SELECT unnest(generate_series(0, {_LSH_PLANES - 1}))::INT AS b),
proj AS (
  SELECT vec_id, b,
         sum(round(x::DOUBLE * 1e6)::BIGINT *
             (CASE WHEN {_h60_duck("b::VARCHAR || ',' || d::VARCHAR")} % 2 = 0
                   THEN 1 ELSE -1 END)) AS proj
  FROM e CROSS JOIN planes GROUP BY vec_id, b),
bk AS (SELECT vec_id,
              sum(CASE WHEN proj > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS bucket
       FROM proj GROUP BY vec_id),
bands AS (SELECT vec_id, band,
                 (bucket // (1::BIGINT << (band * {_LSH_BAND_PLANES})))
                 % {1 << _LSH_BAND_PLANES} AS bb
          FROM bk CROSS JOIN
               (SELECT unnest(generate_series(0, {_LSH_BANDS - 1}))::BIGINT
                AS band)),
cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bb = b.bb AND a.vec_id < b.vec_id),
q AS (SELECT vec_id, [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q
      FROM embeddings),
s AS (SELECT c.a_id, c.b_id,
             round(
               list_reduce(list_prepend(0::BIGINT,
                 [qa.q[i] * qb.q[i] for i in generate_series(1, len(qa.q))]),
                 (acc, v) -> acc + v)::DOUBLE
               / (sqrt(list_reduce(list_prepend(0::BIGINT,
                    [x * x for x in qa.q]), (acc, v) -> acc + v)::DOUBLE)
                  * sqrt(list_reduce(list_prepend(0::BIGINT,
                    [x * x for x in qb.q]), (acc, v) -> acc + v)::DOUBLE)),
               6) AS cos_q
      FROM cand c
      JOIN q qa ON qa.vec_id = c.a_id
      JOIN q qb ON qb.vec_id = c.b_id)
SELECT a_id, b_id, cos_q FROM s WHERE cos_q >= {_LSH_PAIR_COS}
"""


def q_text_quality(spark, sf_dir):
    """Quality scoring: token counts, punctuation and stopword ratios —
    integer-exact numerators/denominators, division at the end."""
    stop_arr = ",".join(f"'{w}'" for w in STOPWORDS)
    d = _spread(_docs(spark, sf_dir)).select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        F.length("text").alias("n_chars_measured"),
        F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).alias("n_punct"),
    )
    d = d.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_tokens"),
        F.col("n_chars_measured").cast("bigint").alias("n_chars_measured"),
        F.expr(
            f"size(filter(ws, w -> array_contains(array({stop_arr}), w)))"
        ).cast("bigint").alias("n_stop"),
        F.col("n_punct").cast("bigint").alias("n_punct"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens").cast("double")
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars_measured").cast("double")
    return d.select(
        "doc_id", "n_tokens", "n_chars_measured", "n_stop", "n_punct",
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(0.5 * stop_ratio + 0.5 * (1 - punct_ratio), 6).alias("quality_score"),
    )


SQL_TEXT_QUALITY = f"""
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         length(text)::BIGINT AS n_chars_measured,
         len(list_filter(string_split(text, ' '),
             w -> list_contains([{",".join(repr(w) for w in STOPWORDS)}], w)))::BIGINT AS n_stop,
         length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::BIGINT AS n_punct
  FROM documents)
SELECT doc_id, n_tokens, n_chars_measured, n_stop, n_punct,
       round(n_stop::DOUBLE / n_tokens::DOUBLE, 6) AS stopword_ratio,
       round(n_punct::DOUBLE / n_chars_measured::DOUBLE, 6) AS punct_ratio,
       round(0.5 * (n_stop::DOUBLE / n_tokens::DOUBLE)
             + 0.5 * (1 - n_punct::DOUBLE / n_chars_measured::DOUBLE), 6) AS quality_score
FROM d
"""


_LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
}


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (marker-word presence) scored against the
    labeled ``lang`` column — confusion-matrix counts."""
    cases = " ".join(
        f"WHEN size(filter(ws, w -> array_contains(array("
        + ",".join(f"'{m}'" for m in ms)
        + f"), w))) > 0 THEN '{lang}'"
        for lang, ms in _LANG_MARKERS.items()
    )
    d = _spread(_docs(spark, sf_dir)).select(
        "lang", F.split("text", " ").alias("ws")
    ).withColumn("predicted", F.expr(f"CASE {cases} ELSE 'unknown' END"))
    return d.groupBy("lang", "predicted").agg(F.count(F.lit(1)).alias("cnt"))


def _sql_lang_cases() -> str:
    return " ".join(
        "WHEN len(list_filter(string_split(text, ' '), w -> list_contains(["
        + ",".join(repr(m) for m in ms)
        + f"], w))) > 0 THEN '{lang}'"
        for lang, ms in _LANG_MARKERS.items()
    )


SQL_LANG_ID = f"""
SELECT lang,
       CASE {_sql_lang_cases()} ELSE 'unknown' END AS predicted,
       count(*) AS cnt
FROM documents GROUP BY 1, 2
"""

_BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex tokenizer."""
    return _spread(_docs(spark, sf_dir)).select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_REGEX), 0))
        .cast("bigint")
        .alias("bpe_tokens"),
    )


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_REGEX}'))::BIGINT AS bpe_tokens
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: rolling polynomial hash over the word
    stream (integer-exact, order-sensitive — a true fingerprint)."""
    word_h = f"pmod({_h60('w')}, 1000003)"
    return _spread(_docs(spark, sf_dir)).select(
        "doc_id",
        F.expr(
            f"aggregate(transform(split(text, ' '), w -> {word_h}), "
            "cast(0 as bigint), (a, x) -> pmod(a * 31 + x, 1000000007))"
        ).alias("fingerprint"),
    )


SQL_DOC_FINGERPRINT = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
           [{_h60_duck("w")} % 1000003 for w in string_split(text, ' ')]),
         (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
FROM documents
"""


def q_gopher_repetition(spark, sf_dir):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, adapted to
    the corpus's single-line word streams): duplicate-word fraction, the
    most frequent 2-gram (deterministic tiebreak: smallest gram) with its
    token-mass fraction, and the fraction of 2-gram instances whose gram
    repeats. Scale shape: one explode + ONE groupBy(doc_id, gram) — the
    per-doc window ranks inside that grouped output (small), never the
    raw token stream; every numerator/denominator is integer-exact."""
    from pyspark.sql import Window

    d = _spread(_docs(spark, sf_dir)).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    base = d.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("ws")).cast("bigint").alias("n_distinct"),
    )
    grams = d.select(
        "doc_id",
        # guard: sequence(0, -1) would infer step -1 on a 1-token doc
        # (DuckDB's generate_series is empty there — keep them equal)
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(0, size(ws) - 2), "
                "i -> concat(ws[i], ' ', ws[i + 1])) "
                "ELSE array() END"
            )
        ).alias("gram"),
    )
    gc = grams.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # r6 (guide §2.4): totals, dup-instance mass AND the top gram come out
    # of ONE groupBy(doc_id) — min_by on the (-cnt, gram) key is exactly
    # the old window's (cnt DESC, gram ASC) row_number()=1 pick, so the
    # separate window sort + second per-doc join are gone (4 exchanges +
    # a sort → 2 exchanges)
    agg = gc.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("total_grams"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
        .cast("bigint").alias("dup_gram_inst"),
        F.min_by(
            F.struct(F.col("gram"), F.col("cnt")),
            F.struct((-F.col("cnt")).alias("nc"), F.col("gram")),
        ).alias("_top"),
    ).select(
        "doc_id", "total_grams", "dup_gram_inst",
        F.col("_top.gram").alias("top2_gram"),
        F.col("_top.cnt").cast("bigint").alias("top2_cnt"),
    )
    out = base.join(agg, "doc_id", "left")
    return out.select(
        "doc_id", "n_tokens", "n_distinct",
        F.round(
            1 - F.col("n_distinct").cast("double")
            / F.col("n_tokens").cast("double"), 6
        ).alias("dup_word_frac"),
        "top2_gram",
        F.coalesce("top2_cnt", F.lit(0)).cast("bigint").alias("top2_cnt"),
        F.round(
            2.0 * F.coalesce("top2_cnt", F.lit(0))
            / F.col("n_tokens").cast("double"), 6
        ).alias("top2_frac"),
        F.when(
            F.col("total_grams") > 0,
            F.round(
                F.col("dup_gram_inst").cast("double")
                / F.col("total_grams").cast("double"), 6
            ),
        ).otherwise(0.0).alias("dup2gram_frac"),
    )


SQL_GOPHER_REPETITION = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
base AS (SELECT doc_id, len(ws)::BIGINT AS n_tokens,
                len(list_distinct(ws))::BIGINT AS n_distinct FROM d),
grams AS (
  SELECT doc_id,
         unnest([ws[i] || ' ' || ws[i + 1]
                 for i in generate_series(1, len(ws) - 1)]) AS gram
  FROM d),
gc AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt
       FROM grams GROUP BY 1, 2),
agg AS (SELECT doc_id, sum(cnt)::BIGINT AS total_grams,
               sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END)::BIGINT
                 AS dup_gram_inst
        FROM gc GROUP BY 1),
top AS (SELECT doc_id, gram AS top2_gram, cnt AS top2_cnt FROM gc
        QUALIFY row_number() OVER (PARTITION BY doc_id
                                   ORDER BY cnt DESC, gram) = 1)
SELECT b.doc_id, b.n_tokens, b.n_distinct,
       round(1 - b.n_distinct::DOUBLE / b.n_tokens::DOUBLE, 6)
         AS dup_word_frac,
       t.top2_gram,
       COALESCE(t.top2_cnt, 0)::BIGINT AS top2_cnt,
       round(2.0 * COALESCE(t.top2_cnt, 0) / b.n_tokens::DOUBLE, 6)
         AS top2_frac,
       CASE WHEN a.total_grams > 0
            THEN round(a.dup_gram_inst::DOUBLE / a.total_grams::DOUBLE, 6)
            ELSE 0.0 END AS dup2gram_frac
FROM base b
LEFT JOIN agg a USING (doc_id)
LEFT JOIN top t USING (doc_id)
"""


_VOCAB_K = 100


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-K by frequency — the seed table every BPE /
    WordPiece tokenizer training run starts from. Scale shape: explode →
    ONE partial+final hash aggregation (map-side combine collapses each
    partition to its distinct tokens), then a TakeOrdered top-K by
    (count desc, token asc — deterministic boundary) over the |vocab|-
    sized aggregate, never the token stream. No salting needed: the
    hot-key mass is absorbed by the map-side combine."""
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    return (
        words.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(_VOCAB_K)
    )


SQL_VOCAB_TOPK = f"""
SELECT token, count(*)::BIGINT AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY cnt DESC, token
LIMIT {_VOCAB_K}
"""


_C4_MIN_WORDS = 5
_MWL_LO, _MWL_HI = 3.0, 10.0  # Gopher mean-word-length window


def q_webtext_filters(spark, sf_dir):
    """C4/Gopher-style document filter flags (Raffel et al. 2020 §2.2;
    Rae et al. 2021 §A1.1), adapted to single-line word streams: word
    count floor, mean word length window, lorem-ipsum and curly-brace
    content gates, terminal-punctuation flag (reported, not gating —
    the synthetic corpus carries none), and the composed keep decision.
    Pure column expressions — one scan, zero shuffle, pushdown-friendly."""
    d = _spread(_docs(spark, sf_dir)).select(
        "doc_id",
        F.split("text", " ").alias("ws"),
        F.col("text"),
    )
    d = d.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_tokens"),
        F.expr(
            "aggregate(ws, cast(0 as bigint), (a, w) -> a + length(w))"
        ).alias("n_word_chars"),
        F.col("text").rlike('[.!?"]$').alias("has_terminal_punct"),
        (~F.col("text").contains("lorem ipsum")).alias("no_lorem"),
        (~F.col("text").contains("{")).alias("no_braces"),
    )
    mwl = F.round(
        F.col("n_word_chars").cast("double")
        / F.col("n_tokens").cast("double"), 6
    )
    d = d.withColumn("mean_word_len", mwl)
    word_len_ok = (F.col("mean_word_len") >= _MWL_LO) & (
        F.col("mean_word_len") <= _MWL_HI
    )
    return d.select(
        "doc_id", "n_tokens", "mean_word_len", "has_terminal_punct",
        "no_lorem", "no_braces",
        word_len_ok.alias("word_len_ok"),
        (
            (F.col("n_tokens") >= _C4_MIN_WORDS)
            & F.col("no_lorem") & F.col("no_braces") & word_len_ok
        ).alias("kept"),
    )


SQL_WEBTEXT_FILTERS = f"""
WITH d AS (
  SELECT doc_id,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         list_sum([length(w)::BIGINT
                   for w in string_split(text, ' ')])::BIGINT
           AS n_word_chars,
         regexp_matches(text, '[.!?"]$') AS has_terminal_punct,
         NOT contains(text, 'lorem ipsum') AS no_lorem,
         NOT contains(text, '{{') AS no_braces
  FROM documents),
m AS (
  SELECT *, round(n_word_chars::DOUBLE / n_tokens::DOUBLE, 6)
           AS mean_word_len
  FROM d)
SELECT doc_id, n_tokens, mean_word_len, has_terminal_punct,
       no_lorem, no_braces,
       (mean_word_len >= {_MWL_LO} AND mean_word_len <= {_MWL_HI})
         AS word_len_ok,
       (n_tokens >= {_C4_MIN_WORDS} AND no_lorem AND no_braces
        AND mean_word_len >= {_MWL_LO} AND mean_word_len <= {_MWL_HI})
         AS kept
FROM m
"""


# per-mille keep rates by language: downsample the dominant language,
# keep the tail — the language-rebalancing move every training-data mix
# step makes. The seed string makes independent samples reproducible AND
# decorrelated (change the seed, get a fresh sample).
_SAMPLE_SEED = "s1"
_SAMPLE_RATES = {"en": 250, "zh": 500, "es": 500, "de": 750, "fr": 750}
_SAMPLE_DEFAULT = 100


def _sample_rate_case(col: str = "lang") -> str:
    """SQL CASE mapping a language column to its per-mille keep rate —
    identical text works in Spark SQL and DuckDB."""
    return (
        f"CASE {col} "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _SAMPLE_RATES.items())
        + f" ELSE {_SAMPLE_DEFAULT} END"
    )


def q_sample_stratified(spark, sf_dir):
    """Deterministic stratified sampling — the training-data-mix staple:
    keep a row iff h(seed, doc_id) mod 1000 < rate(lang), with per-stratum
    per-mille rates. The portable 60-bit hash makes the sample a PURE
    FILTER: reproducible across runs, engines and cluster sizes (unlike
    ``df.sample``, whose output depends on partitioning), zero shuffle,
    evaluated inside the scan stage, and composable — the same hash with
    a higher rate yields a strict superset (nested samples for
    scaling-law runs)."""
    rate = _sample_rate_case()
    key = f"concat('{_SAMPLE_SEED}:', cast(doc_id as string))"
    gate = f"pmod({_h60(key)}, 1000)"
    return (
        _docs(spark, sf_dir)
        .where(F.expr(f"{gate} < ({rate})"))
        .select("doc_id", "lang")
    )


SQL_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang
FROM documents
WHERE {_h60_duck(f"'{_SAMPLE_SEED}:' || doc_id::VARCHAR")} % 1000
      < ({_sample_rate_case()})
"""


_CORPUS_MIN_TOKENS = 20


def q_corpus_select(spark, sf_dir):
    """THE END-TO-END TRAINING-MIX QUERY — what a data engineer actually
    ships: the kept corpus after composing three pipeline stages, each
    individually oracle-verified elsewhere in this registry:

      1. near-dup dedup: keep only cluster REPRESENTATIVES (doc_id ==
         cluster_id from the MinHash-LSH connected components),
      2. quality floor: ≥ _CORPUS_MIN_TOKENS whitespace tokens,
      3. language re-balancing: the deterministic stratified hash gate.

    Composition is pure DataFrame algebra — the dedup join is the only
    shuffle beyond what clustering already did; quality and sampling are
    scan-stage filters. The oracle recomputes all three stages in one
    DuckDB statement (recursive-CTE closure + the same integer gates)."""
    clusters = q_dedup_clusters(spark, sf_dir)
    reps = clusters.where(
        F.col("cluster_id") == F.col("doc_id")
    ).select("doc_id")
    key = f"concat('{_SAMPLE_SEED}:', cast(doc_id as string))"
    return (
        _docs(spark, sf_dir)
        .join(reps, "doc_id")
        .where(F.expr(f"size(split(text, ' ')) >= {_CORPUS_MIN_TOKENS}"))
        .where(F.expr(
            f"pmod({_h60(key)}, 1000) < ({_sample_rate_case()})"
        ))
        .select(
            "doc_id",
            "lang",
            F.expr("cast(size(split(text, ' ')) as bigint)").alias(
                "n_tokens"
            ),
        )
    )


SQL_CORPUS_SELECT = f"""
WITH RECURSIVE
pairs AS ({SQL_MINHASH_LSH_PAIRS}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL
          SELECT b_id AS src, a_id AS dst FROM pairs),
reach(root, node) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
),
clusters AS (SELECT root AS doc_id, min(node)::BIGINT AS cluster_id
             FROM reach GROUP BY root)
SELECT d.doc_id, d.lang,
       len(string_split(d.text, ' '))::BIGINT AS n_tokens
FROM documents d JOIN clusters c ON c.doc_id = d.doc_id
WHERE c.cluster_id = d.doc_id
  AND len(string_split(d.text, ' ')) >= {_CORPUS_MIN_TOKENS}
  AND {_h60_duck(f"'{_SAMPLE_SEED}:' || d.doc_id::VARCHAR")} % 1000
      < ({_sample_rate_case("d.lang")})
"""




def q_search_phrase(spark, sf_dir):
    """O16 — search (elastic_search.go:74-157): phrase match with slop 0
    via positional self-join over the exploded word index; score = number
    of phrase occurrences per document (the DF re-expression of the ES
    phrase query; highlighting is presentation-only and out of scope)."""
    words = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
    )
    a = words.where(F.col("word") == "table").select(
        "doc_id", F.col("pos").alias("p1")
    )
    b = words.where(F.col("word") == "scan").select(
        "doc_id", F.col("pos").alias("p2")
    )
    return (
        a.join(b, ["doc_id"])
        .where(F.col("p2") == F.col("p1") + 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("score"))
    )


SQL_SEARCH_PHRASE = """
WITH words AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents)
SELECT a.doc_id, count(*) AS score
FROM words a JOIN words b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.word = 'table' AND b.word = 'scan'
GROUP BY a.doc_id
"""


def _highlights_query(spark, sf_dir, slop: int):
    from owlfrontier.search import search_with_highlights

    docs = _docs(spark, sf_dir).select(
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("").alias("title"),
        F.array(F.col("text")).alias("text"),
    )
    res = search_with_highlights(docs, "table scan", slop=slop, limit=20)
    return res.select(
        "url",
        "score",
        F.size("highlights").alias("n_fragments"),
        F.element_at("highlights", 1).alias("top_fragment"),
    )


def q_search_highlights(spark, sf_dir):
    """O16 full search surface — phrase hits over ``_all`` plus ES-config
    highlight fragments (search.py; elastic_search.go:111-157) at slop=0.
    The fragmenter is deterministic token/offset arithmetic, so this has
    a full DuckDB oracle (_search_highlights_sql below: greedy 150-char
    token-aligned chunking via a recursive CTE over a precomputed
    next-boundary table)."""
    return _highlights_query(spark, sf_dir, slop=0)


def q_search_highlights_slop1(spark, sf_dir):
    """The reference's ACTUAL ES search config — phrase_slop 1
    (elastic_search.go:144, highlightJson query body) — oracle-paired end
    to end. vs slop=0: the hit
    score counts positional PAIRS with the second term within 2 positions
    of the first (search_phrase's join is p1 < p2 <= p1 + 1 + slop), and
    a fragment phrase-start is any first-term position with the second
    term within that window (DISTINCT per start — two qualifying
    second-term positions are still one occurrence start)."""
    return _highlights_query(spark, sf_dir, slop=1)


def _search_highlights_sql(slop: int) -> str:
    """The exact Python fragmenter (search.py:highlight_fragments) in SQL,
    parameterized by phrase slop. Single-line docs (the query wraps each
    document's text as one line), so line_no is constant and fragment
    order is (-score, start_offset). Greedy token-aligned chunking: for
    each chunk start i, the chunk end is the greatest token j with
    end_char(j) - off(i) <= 150 (end_char is monotone in pos, so greedy
    == max-fitting); chunk starts then follow by a recursive CTE over
    that precomputed `nxt` table (no aggregates in the recursive term —
    DuckDB restriction). ``pairs`` drives the hit score (one row per
    (p1, p2) positional match — the search_phrase join semantics);
    ``starts`` is its DISTINCT first-position projection (the fragment
    phrase-occurrence starts). At slop=0 the two coincide."""
    return f"""
WITH RECURSIVE docs AS (
  SELECT 'doc:' || doc_id::VARCHAR AS url, string_split(text, ' ') AS toks
  FROM documents
),
words AS (
  SELECT url, generate_subscripts(toks, 1) AS pos, unnest(toks) AS word
  FROM docs
),
pairs AS (
  SELECT a.url, a.pos AS s
  FROM words a JOIN words b ON b.url = a.url
    AND b.pos BETWEEN a.pos + 1 AND a.pos + {slop + 1}
  WHERE a.word = 'table' AND b.word = 'scan'
),
starts AS (
  SELECT DISTINCT url, s FROM pairs
),
hits AS (
  SELECT url, count(*)::BIGINT AS score FROM pairs GROUP BY url
  ORDER BY score DESC, url LIMIT 20
),""" + """
offs AS (
  SELECT w.url, w.pos, w.word,
         COALESCE(sum(len(w.word) + 1) OVER
           (PARTITION BY w.url ORDER BY w.pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
         COALESCE(sum(len(w.word) + 1) OVER
           (PARTITION BY w.url ORDER BY w.pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + len(w.word) AS endc
  FROM words w JOIN hits h ON h.url = w.url
),
ntoks AS (SELECT url, max(pos) AS ntok FROM offs GROUP BY url),
nxt AS (
  SELECT o1.url, o1.pos AS i,
         max(CASE WHEN o2.endc - o1.off <= 150
                  THEN o2.pos ELSE o1.pos END) + 1 AS next_i
  FROM offs o1 JOIN offs o2 ON o2.url = o1.url AND o2.pos >= o1.pos
  GROUP BY o1.url, o1.pos
),
chunks(url, i) AS (
  SELECT url, 1 FROM hits
  UNION ALL
  SELECT c.url, n.next_i
  FROM chunks c
  JOIN nxt n ON n.url = c.url AND n.i = c.i
  JOIN ntoks t ON t.url = c.url
  WHERE n.next_i <= t.ntok
),
cspan AS (
  SELECT c.url, c.i, n.next_i - 1 AS j
  FROM chunks c JOIN nxt n ON n.url = c.url AND n.i = c.i
),
tokagg AS (
  SELECT c.url, c.i, min(o.off) AS start_off,
         sum(CASE WHEN o.word IN ('table', 'scan') THEN 1 ELSE 0 END)
           AS termcnt,
         string_agg(CASE WHEN o.word IN ('table', 'scan')
                    THEN '_-_strong_-_' || o.word || '_!-_strong_-_'
                    ELSE o.word END, ' ' ORDER BY o.pos) AS rendered
  FROM cspan c JOIN offs o ON o.url = c.url AND o.pos BETWEEN c.i AND c.j
  GROUP BY c.url, c.i
),
startagg AS (
  SELECT c.url, c.i, count(s.s) AS phr
  FROM cspan c
  LEFT JOIN starts s ON s.url = c.url AND s.s BETWEEN c.i AND c.j
  GROUP BY c.url, c.i
),
ranked AS (
  SELECT t.url, t.rendered,
         row_number() OVER (PARTITION BY t.url
                            ORDER BY 10 * sa.phr + t.termcnt DESC,
                                     t.start_off ASC) AS rn
  FROM tokagg t JOIN startagg sa ON sa.url = t.url AND sa.i = t.i
  WHERE 10 * sa.phr + t.termcnt > 0
),
fragstats AS (
  SELECT url, count(*) AS nf FROM ranked WHERE rn <= 3 GROUP BY url
)
SELECT h.url, h.score, COALESCE(f.nf, 0)::BIGINT AS n_fragments,
       t.rendered AS top_fragment
FROM hits h
LEFT JOIN fragstats f ON f.url = h.url
LEFT JOIN (SELECT url, rendered FROM ranked WHERE rn = 1) t
  ON t.url = h.url
"""


SQL_SEARCH_HIGHLIGHTS = _search_highlights_sql(0)
SQL_SEARCH_HIGHLIGHTS_SLOP1 = _search_highlights_sql(1)


def q_multimodal_features(spark, sf_dir):
    """Multimodal binary-column pipeline as a checked query (rows-only:
    the feature vector and payload hash depend on encoder bytes, not
    SQL-expressible — the SQL-expressible half of this pipeline is
    oracle-paired separately in q_multimodal_manifest, which hash-checks
    the decoded-pixel content manifest): deterministic payloads derived
    per doc_id — BMP (ids ≡ 0 mod 6), PNG (≡ 1), GIF (≡ 2, ≤256-color
    quantized), baseline JPEG (≡ 3), lossless WebP (≡ 4), baseline TIFF
    (≡ 5, LZW + horizontal predictor) — decoded for REAL by the stdlib
    codecs inside the ``mapInPandas`` feature pipeline (multimodal.py),
    exercising a mixed-format media column the way a real crawl store
    carries one."""
    from owlfrontier.multimodal import image_feature_pipeline

    docs = _spread(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("media_id")
    )

    def gen(it):
        import pandas as pd

        from owlfrontier.multimodal import synthetic_media_payload

        for pdf in it:
            payloads = [synthetic_media_payload(mid) for mid in pdf["media_id"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(gen, "media_id bigint, payload binary")
    return image_feature_pipeline(media, thumb=(2, 2), fake=False).select(
        "media_id", "sha256", "n_bytes", "thumb_w", "thumb_h"
    )


def q_frame_sample(spark, sf_dir):
    """Video-analog frame sampling as a checked query (rows-only: codec
    work is not SQL-expressible): a deterministic 4-frame animated GIF
    per doc_id, REAL composited frames extracted by the stdlib GIF/LZW
    decoder inside ``mapInPandas`` (every 2nd frame, 2 samples/doc) and
    hashed from decoded RGB bytes — one input row fanning out to N
    output rows, the video-pipeline shape."""
    import hashlib as _hl

    from owlfrontier.multimodal import encode_gif, frame_sample_pipeline

    docs = _spread(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("media_id")
    )

    def gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                digest = _hl.sha256(str(int(mid)).encode()).digest()
                base = np.frombuffer(
                    (digest * 6)[: 6 * 6 * 3], dtype=np.uint8
                ).reshape(6, 6, 3)
                frames = [
                    ((np.roll(base, k, axis=0) >> 5) << 5) for k in range(4)
                ]
                payloads.append(encode_gif(frames))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(gen, "media_id bigint, payload binary")
    return frame_sample_pipeline(media, every_n=2, n_frames=2, fake=False)


def q_multimodal_manifest(spark, sf_dir):
    """The ORACLE-PAIRED half of the multimodal split (VERDICT r4 item 3):
    binary decode itself can't be SQL, but a content manifest over the
    DECODED pixels can, because the test corpus derives each image from
    sha256(doc_id) — so DuckDB reconstructs the exact decoded bytes
    arithmetically while Spark gets them by genuinely round-tripping the
    payload through the real codecs (mapInPandas). Formats: BMP/PNG/
    WebP-VP8L/TIFF(LZW+predictor) decode bit-exactly; GIF decodes to the
    3-bit-quantized palette image (b & 0xE0, expressible as per-nibble
    hex translate in SQL); JPEG is excluded — lossy DCT output is not
    SQL-expressible (it stays pytest-pinned in q_multimodal_features).
    A wrong decoder, wrong encoder routing, or wrong compositing shows
    up as a hash mismatch here."""
    from owlfrontier.multimodal import image_content_manifest

    docs = _spread(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("media_id")
    ).where(F.col("media_id") % 6 != 3)  # JPEG rows: lossy, not SQL-able

    def gen(it):
        import pandas as pd

        from owlfrontier.multimodal import synthetic_media_payload

        for pdf in it:
            payloads = [synthetic_media_payload(mid) for mid in pdf["media_id"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(gen, "media_id bigint, payload binary")
    return image_content_manifest(media)


# DuckDB reconstructs the decoded RGB bytes that Spark obtained by real
# codec round-trips: rgb = sha256-digest(doc_id) x 6 (exactly 192 bytes =
# 8x8x3), as lowercase hex (DuckDB sha256() is VARCHAR-only, so both
# sides hash the hex serialization). GIF quantization b & 0xE0 == map the
# high nibble through '0022446688aaccee' and zero the low nibble.
SQL_MULTIMODAL_MANIFEST = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(doc_id AS BIGINT) % 6 AS m,
         repeat(sha256(CAST(CAST(doc_id AS BIGINT) AS VARCHAR)), 6)
           AS rgb_hex
  FROM documents
  WHERE CAST(doc_id AS BIGINT) % 6 <> 3
)
SELECT media_id,
       CASE m WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png'
              WHEN 2 THEN 'image/gif' WHEN 4 THEN 'image/webp'
              ELSE 'image/tiff' END AS mime,
       CAST(8 AS INT) AS width, CAST(8 AS INT) AS height,
       CASE WHEN m = 2 THEN sha256(
         (SELECT string_agg(
             translate(substr(d.rgb_hex, 2 * i - 1, 1),
                       '0123456789abcdef', '0022446688aaccee') || '0',
             '' ORDER BY i)
          FROM generate_series(1, 192) AS t(i)))
       ELSE sha256(rgb_hex) END AS rgb_sha256
FROM d
"""


def q_audio_manifest(spark, sf_dir):
    """Audio twin of q_multimodal_manifest, over the round-5 FLAC + WAV
    codecs: per doc_id a deterministic int16 PCM signal — sample k of
    channel c is ((id*7919 + k*104729 + c*31337) mod 65536) - 32768,
    150 + id%7 samples, stereo iff id%4 >= 2 — containered as PCM WAV
    (even ids) or FLAC (odd ids, blocksize 64 → multi-frame streams with
    a short last frame, mid/side for the stereo rows). Spark decodes the
    payloads for REAL (multimodal.audio_content_manifest, mapInPandas);
    DuckDB reconstructs the identical interleaved little-endian PCM hex
    arithmetically and hashes it. FLAC is lossless, so a WAV and a FLAC
    of the same signal share one pcm_sha256 — and any decoder bug
    (subframe reconstruction, stereo decorrelation, frame sequencing)
    is a hash mismatch here."""
    from owlfrontier.multimodal import (
        audio_content_manifest,
        encode_flac,
        encode_wav,
    )

    docs = _spread(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("media_id")
    )

    def gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            payloads = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                n = 150 + mid % 7
                nch = 2 if mid % 4 >= 2 else 1
                k = np.arange(n, dtype=np.int64)
                chans = [
                    ((mid * 7919 + k * 104729 + c * 31337) % 65536) - 32768
                    for c in range(nch)
                ]
                s = np.stack(chans, axis=1)
                if mid % 2 == 0:
                    payloads.append(encode_wav(s))
                else:
                    payloads.append(encode_flac(
                        s, blocksize=64,
                        stereo_mode="ms" if nch == 2 else "indep",
                    ))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = docs.mapInPandas(gen, "media_id bigint, payload binary")
    return audio_content_manifest(media)


# DuckDB rebuilds the interleaved int16-LE PCM hex that Spark obtained by
# real WAV/FLAC decodes: u16 two's complement = (x + 32768) % 65536,
# bytes lo||hi as %02x. generate_series can't take correlated bounds in
# this DuckDB, so iterate a constant 0..499 and filter i < n*ch
# (max n*ch = 156*2 = 312).
SQL_AUDIO_MANIFEST = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS mid,
         150 + CAST(doc_id AS BIGINT) % 7 AS n,
         CASE WHEN CAST(doc_id AS BIGINT) % 4 >= 2 THEN 2 ELSE 1 END AS ch
  FROM documents
)
SELECT mid AS media_id,
       CASE WHEN mid % 2 = 0 THEN 'audio/wav' ELSE 'audio/flac' END AS mime,
       CAST(n AS INT) AS n_samples,
       CAST(ch AS INT) AS channels,
       sha256((SELECT string_agg(printf('%02x%02x',
                ((mid*7919 + (i // ch)*104729 + (i % ch)*31337 + 32768)
                 % 65536) % 256,
                ((mid*7919 + (i // ch)*104729 + (i % ch)*31337 + 32768)
                 % 65536) // 256), '' ORDER BY i)
               FROM generate_series(0, 499) t(i)
               WHERE i < n * ch)) AS pcm_sha256
FROM d
"""


def q_neardup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup: adjacent-id pairs scored by cosine over
    integer-quantized vectors (sums of quantized ints are order-stable and
    engine-exact, unlike float sums), thresholded at 0.0."""
    e = _spread(_emb(spark, sf_dir)).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(round(cast(x as double) * 1000) as bigint))"
        ).alias("q"),
    )
    a = e.select(F.col("vec_id").alias("a_id"), F.col("q").alias("qa"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("q").alias("qb"))
    j = a.join(b, F.col("b_id") == F.col("a_id") + 1)
    dot = "aggregate(zip_with(qa, qb, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"
    na = "aggregate(transform(qa, x -> x * x), cast(0 as bigint), (acc, v) -> acc + v)"
    nb = "aggregate(transform(qb, x -> x * x), cast(0 as bigint), (acc, v) -> acc + v)"
    cos = F.expr(f"cast({dot} as double) / (sqrt(cast({na} as double)) * sqrt(cast({nb} as double)))")
    return (
        j.select("a_id", "b_id", F.round(cos, 6).alias("cos_q"))
        .where(F.col("cos_q") > 0.0)
    )


SQL_NEARDUP_EMBEDDING = """
WITH e AS (SELECT vec_id,
                  [round(x::DOUBLE * 1000)::BIGINT for x in embedding] AS q
           FROM embeddings),
j AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.q AS qa, b.q AS qb
      FROM e a JOIN e b ON b.vec_id = a.vec_id + 1),
s AS (SELECT a_id, b_id,
             round(
               list_reduce(list_prepend(0::BIGINT,
                 [qa[i] * qb[i] for i in generate_series(1, len(qa))]),
                 (acc, v) -> acc + v)::DOUBLE
               / (sqrt(list_reduce(list_prepend(0::BIGINT,
                    [x * x for x in qa]), (acc, v) -> acc + v)::DOUBLE)
                  * sqrt(list_reduce(list_prepend(0::BIGINT,
                    [x * x for x in qb]), (acc, v) -> acc + v)::DOUBLE)),
               6) AS cos_q
      FROM j)
SELECT a_id, b_id, cos_q FROM s WHERE cos_q > 0.0
"""




def q_stats_rollup(spark, sf_dir):
    """Rollup aggregation (grouping-sets coverage): doc counts and mean
    length at (lang, source), (lang), and grand-total levels."""
    return (
        _docs(spark, sf_dir)
        .rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


SQL_STATS_ROLLUP = """
SELECT lang, source, count(*) AS cnt, round(avg(n_chars), 4) AS avg_chars
FROM documents GROUP BY ROLLUP(lang, source)
"""


def q_events_daily(spark, sf_dir):
    """Date/time bucketing: per-day event counts + value totals (the
    generation-metrics time series shape, SURVEY.md O15)."""
    return (
        _events(spark, sf_dir)
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SQL_EVENTS_DAILY = """
SELECT ts::DATE AS day, count(*) AS cnt,
       round(sum(value), 2) AS total_value
FROM events GROUP BY 1
"""


def q_props_json(spark, sf_dir):
    """JSON extraction over the ``props`` string column: bucket the
    extracted integer and count (json-function coverage)."""
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        _spread(_events(spark, sf_dir))
        .select((k - (k % 10)).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_PROPS_JSON = """
SELECT k_bucket, count(*) AS cnt FROM (
  SELECT (json_extract_string(props, '$.k')::BIGINT
          - (json_extract_string(props, '$.k')::BIGINT % 10)) AS k_bucket
  FROM events) t
GROUP BY k_bucket
"""


# ---------------------------------------------------------------------------
# Training-corpus hygiene operators (round 5): cross-doc duplication,
# benchmark decontamination, PII scrubbing, ranked retrieval, URL
# canonicalization, sequence packing
# ---------------------------------------------------------------------------

_DUPGRAM_N = 3


def _gram_expr(n: int, arr: str = "ws") -> str:
    """Spark SQL expr: the array of word ``n``-grams of array column
    ``arr`` (space-joined; empty for docs shorter than ``n``)."""
    joined = ", ' ', ".join(f"{arr}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN size({arr}) >= {n} THEN "
        f"transform(sequence(0, size({arr}) - {n}), "
        f"i -> concat({joined})) ELSE array() END"
    )


def _gram_duck(n: int, arr: str = "ws") -> str:
    """DuckDB fragment: SELECT that unnests word n-grams (1-based lists)."""
    joined = "||' '||".join(f"{arr}[i + {k}]" for k in range(n))
    return (
        f"unnest([{joined} for i in generate_series(1, len({arr}) - {n - 1})])"
    )


def q_dup_ngram_frac(spark, sf_dir):
    """Cross-document duplicated n-gram fraction (the CCNet / FineWeb
    "fraction of text duplicated elsewhere in the corpus" signal): for
    each doc, the share of its DISTINCT 3-grams that also occur in at
    least one OTHER document. Scale shape: explode → per-doc-distinct
    grams in the same aggregation (groupBy doc_id+gram), then ONE
    groupBy(gram) for corpus doc-frequency, one join back on gram, one
    final per-doc aggregation — the classic two-agg + self-semi-join
    plan; nothing is ever all-pairs and every count is map-side
    combinable. Numerators/denominators integer-exact; only the final
    ratio is rounded."""
    n = _DUPGRAM_N
    d = _spread(_docs(spark, sf_dir)).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    # r6 (guide §2.3/§2.4): grams ride as xxhash64 bigints (the string is
    # only an equality identity here — nothing downstream returns it), the
    # post-distinct count is a plain count (the rows are already
    # (doc,gram)-distinct; countDistinct added an expand+second agg), and
    # the join BACK of corpus doc-frequencies onto the posting rows is
    # replaced by the complement: shared = n_grams − (grams this doc owns
    # uniquely), where a gram's unique owner is min(doc_id) when its doc
    # count is 1 — one tiny aggregate instead of a 2.6M-row equi-join.
    # (A 64-bit gram collision could merge two grams' counts, P ≈ 1e-9 at
    # sf1.0; hash-match vs the string-exact DuckDB oracle is verified at
    # every shipped sf.)
    grams = d.select(
        "doc_id", F.explode(F.expr(_gram_expr(n))).alias("gram")
    ).select("doc_id", F.xxhash64("gram").alias("g8")).distinct()
    grams = grams.localCheckpoint(eager=False)  # shared by both aggs
    gdf = grams.groupBy("g8").agg(
        F.count(F.lit(1)).alias("gram_docs"),
        F.min("doc_id").alias("owner"),
    )
    uniq = (
        gdf.where(F.col("gram_docs") == 1)
        .groupBy("owner")
        .agg(F.count(F.lit(1)).alias("uniq_grams"))
        .withColumnRenamed("owner", "doc_id")
    )
    ng = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    per_doc = ng.join(uniq, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        (F.col("n_grams") - F.coalesce("uniq_grams", F.lit(0)))
        .cast("bigint")
        .alias("shared_grams"),
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce("shared_grams", F.lit(0))
            .cast("bigint")
            .alias("shared_grams"),
            F.round(
                F.coalesce("shared_grams", F.lit(0))
                / F.greatest(F.coalesce("n_grams", F.lit(1)), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


SQL_DUP_NGRAM_FRAC = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT DISTINCT doc_id, gram
      FROM (SELECT doc_id, {_gram_duck(_DUPGRAM_N)} AS gram FROM t)),
c AS (SELECT gram, count(DISTINCT doc_id) AS gram_docs FROM g GROUP BY gram),
p AS (SELECT g.doc_id,
             count(*)::BIGINT AS n_grams,
             sum(CASE WHEN c.gram_docs > 1 THEN 1 ELSE 0 END)::BIGINT
               AS shared_grams
      FROM g JOIN c USING (gram) GROUP BY g.doc_id)
SELECT t.doc_id,
       coalesce(p.n_grams, 0)::BIGINT AS n_grams,
       coalesce(p.shared_grams, 0)::BIGINT AS shared_grams,
       round(coalesce(p.shared_grams, 0)
             / greatest(coalesce(p.n_grams, 1), 1)::DOUBLE, 6) AS dup_frac
FROM t LEFT JOIN p USING (doc_id)
"""


_DECON_N = 4
_DECON_EVAL_MOD = 97


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (the n-gram-overlap protocol of GPT-3
    appx. C / PaLM / Llama eval hygiene): flag every TRAINING doc that
    shares any 4-gram with the held-out EVAL set (deterministically
    designated here as ``doc_id % 97 == 0`` — the driver corpus carries
    no separate benchmark table). Scale shape: the eval side is tiny by
    construction (1/97 of the corpus), so its distinct-gram set is
    BROADCAST; the training side streams through one explode + broadcast
    left-semi probe and one per-doc aggregation — no shuffle of the
    corpus on the gram key and never an all-pairs comparison."""
    n = _DECON_N
    d = _spread(_docs(spark, sf_dir)).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    grams = d.select(
        "doc_id", F.explode(F.expr(_gram_expr(n))).alias("gram")
    )
    eval_grams = (
        grams.where(F.col("doc_id") % _DECON_EVAL_MOD == 0)
        .select("gram")
        .distinct()
    )
    train = grams.where(F.col("doc_id") % _DECON_EVAL_MOD != 0)
    hits = (
        train.join(F.broadcast(eval_grams), "gram", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hit_grams"))
    )
    return (
        d.where(F.col("doc_id") % _DECON_EVAL_MOD != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("hit_grams", F.lit(0))
            .cast("bigint")
            .alias("hit_grams"),
            (F.coalesce("hit_grams", F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


SQL_DECONTAMINATE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
g AS (SELECT doc_id, gram
      FROM (SELECT doc_id, {_gram_duck(_DECON_N)} AS gram FROM t)),
ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_DECON_EVAL_MOD} = 0),
h AS (SELECT doc_id, count(*)::BIGINT AS hit_grams
      FROM g JOIN ev USING (gram)
      WHERE doc_id % {_DECON_EVAL_MOD} <> 0 GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(h.hit_grams, 0)::BIGINT AS hit_grams,
       (coalesce(h.hit_grams, 0) > 0)::INT AS contaminated
FROM t LEFT JOIN h USING (doc_id)
WHERE t.doc_id % {_DECON_EVAL_MOD} <> 0
"""


# PII patterns kept inside the RE2 ∩ java.util.regex common dialect
# (no lookaround, no backrefs) so Spark and DuckDB compile them
# identically; replacements are plain strings (no group substitution —
# Spark writes $1 where DuckDB writes \\1, so none are used).
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
_PII_PHONE = "\\b555-[0-9]{4}\\b"

# the driver corpus is a clean synthetic word stream, so the PII surface
# is derived DETERMINISTICALLY from each row (same concat on both
# engines) — the scrubber then has real matches to find
_PII_AUG_SPARK = (
    "concat(text, ' contact user', cast(doc_id as string), '@mail-', source,"
    " '.com or ', cast(10 + doc_id % 90 as string), '.',"
    " cast(doc_id % 256 as string), '.', cast((doc_id * 7) % 256 as string),"
    " '.', cast((doc_id * 13) % 256 as string),"
    " ' tel 555-', lpad(cast((doc_id * 31) % 10000 as string), 4, '0'))"
)
_PII_AUG_DUCK = (
    "text || ' contact user' || doc_id::VARCHAR || '@mail-' || source"
    " || '.com or ' || (10 + doc_id % 90)::VARCHAR || '.'"
    " || (doc_id % 256)::VARCHAR || '.' || ((doc_id * 7) % 256)::VARCHAR"
    " || '.' || ((doc_id * 13) % 256)::VARCHAR"
    " || ' tel 555-' || lpad(((doc_id * 31) % 10000)::VARCHAR, 4, '0')"
)


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing — the pre-training redaction pass (C4 / FineWeb run
    the same shape): count then replace emails, IPv4s and phone numbers
    with typed placeholders. Pure scan-stage column expressions (three
    regexp passes per row, zero shuffle, zero UDF); the scrubbed text is
    emitted as an md5 signature so the oracle hash-checks the EXACT
    redacted bytes, not just the counts."""
    aug = F.expr(_PII_AUG_SPARK)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_IP,
            "<IP>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return _spread(_docs(spark, sf_dir)).select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(_PII_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(_PII_IP), 0))
        .cast("bigint")
        .alias("n_ips"),
        F.size(F.regexp_extract_all(aug, F.lit(_PII_PHONE), 0))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(scrubbed).alias("scrub_sig"),
    )


SQL_PII_SCRUB = f"""
SELECT doc_id,
       len(regexp_extract_all(aug, '{_PII_EMAIL}'))::BIGINT AS n_emails,
       len(regexp_extract_all(aug, '{_PII_IP}'))::BIGINT AS n_ips,
       len(regexp_extract_all(aug, '{_PII_PHONE}'))::BIGINT AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(aug,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_IP}', '<IP>', 'g'),
           '{_PII_PHONE}', '<PHONE>', 'g')) AS scrub_sig
FROM (SELECT doc_id, {_PII_AUG_DUCK} AS aug FROM documents) t
"""


_BM25_TERMS = ["spark", "hash", "window"]
_BM25_K = 20
# k1 = 1.2, b = 0.75 cleared to integers: tf_norm = 22·tf·S /
# (10·S·tf + 3·S + 9·dl·N) where S = Σdl, N = |docs| (exact rational)
_BM25_IDF_SCALE = 1000


def q_bm25_topk(spark, sf_dir):
    """BM25 ranked retrieval (Robertson–Spärck Jones, the ES-default
    scoring the reference's search tier uses — elastic_search.go:74-120)
    for a fixed 3-term query, made INTEGER-EXACT so both engines rank
    identically: the log idf is replaced by the rational surrogate
    idf_q = ⌊(N − df + 1)·1000 / (df + 1)⌋ (order-isomorphic to the RSJ
    idf) and the k1=1.2, b=0.75 tf-normalization is cleared of
    denominators — contrib = ⌊idf_q · 22·tf·S / (10·S·tf + 3·S +
    9·dl·N)⌋ over BIGINTs (DECIMAL(38) is the documented escape hatch
    past ~10^9-token corpora). Scale shape: one 1-row stats aggregate
    and one |terms|-row df aggregate, both broadcast; per-doc tf comes
    from a higher-order filter on the already-split token array (no
    explode of the corpus); one groupBy(doc_id) sum; TakeOrdered top-K
    with a deterministic (score desc, doc_id) tiebreak."""
    terms = _BM25_TERMS
    d = _spread(_docs(spark, sf_dir)).select(
        "doc_id", F.split("text", " ").alias("ws")
    ).withColumn("dl", F.size("ws").cast("bigint"))
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    term_lit = ", ".join(f"'{t}'" for t in terms)
    dfreq = (
        d.select(
            F.explode(
                F.array_intersect(
                    F.array_distinct("ws"), F.expr(f"array({term_lit})")
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    )
    scored = (
        d.crossJoin(F.broadcast(dfreq.crossJoin(stats)))
        .withColumn(
            "tf", F.expr("cast(size(filter(ws, w -> w = term)) as bigint)")
        )
        .where(F.col("tf") > 0)
        .withColumn(
            "idf_q",
            F.expr(
                f"(n_docs - df + 1) * {_BM25_IDF_SCALE} div (df + 1)"
            ),
        )
        .withColumn(
            "contrib",
            F.expr(
                "idf_q * (22 * tf * sum_dl) div "
                "(10 * sum_dl * tf + 3 * sum_dl + 9 * dl * n_docs)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("contrib").cast("bigint").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_K)
    )


SQL_BM25_TOPK = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws,
                  len(string_split(text, ' '))::BIGINT AS dl
           FROM documents),
stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl
          FROM d),
q AS (SELECT unnest([{", ".join(repr(t) for t in _BM25_TERMS)}]) AS term),
dfreq AS (SELECT term, count(*)::BIGINT AS df
          FROM d, q
          WHERE list_contains(ws, term) GROUP BY term),
scored AS (
  SELECT d.doc_id,
         ((n_docs - df + 1) * {_BM25_IDF_SCALE} // (df + 1))
         * (22 * tf * sum_dl)
         // (10 * sum_dl * tf + 3 * sum_dl + 9 * dl * n_docs) AS contrib
  FROM d, dfreq, stats,
       LATERAL (SELECT len(list_filter(ws, w -> w = term))::BIGINT AS tf)
  WHERE tf > 0)
SELECT doc_id, sum(contrib)::BIGINT AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {_BM25_K}
"""


# messy-URL surface derived deterministically from each row (the driver
# corpus has no url column); four case branches exercise fragment,
# trailing-slash, tracking-params and bare variants
_URL_RAW_SPARK = (
    "concat('HTTP://WWW.Src', cast(doc_id % 20 as string),"
    " '.Example.com:80/path/d', cast(doc_id % 50 as string),"
    " CASE cast(doc_id % 4 as int)"
    " WHEN 0 THEN '?utm_source=feed&ref=rss'"
    " WHEN 1 THEN '/' WHEN 2 THEN '#frag' ELSE '' END)"
)
_URL_RAW_DUCK = (
    "'HTTP://WWW.Src' || (doc_id % 20)::VARCHAR"
    " || '.Example.com:80/path/d' || (doc_id % 50)::VARCHAR"
    " || CASE doc_id % 4"
    " WHEN 0 THEN '?utm_source=feed&ref=rss'"
    " WHEN 1 THEN '/' WHEN 2 THEN '#frag' ELSE '' END"
)


# the canonicalization chain lives in urlutil (shared with the engine's
# CrawlConfig.canonical_keys frontier-ingress rewrite); this alias keeps
# the query/oracle pair and its tests reading naturally
from owlfrontier.urlutil import canonical_url_sql as _canon_steps


def q_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + dedup — the frontier-normalization pass a
    web-scale pipeline runs BEFORE the seen-gate (the reference
    deliberately never normalizes — parse.go:88-131 stores hrefs
    verbatim — so variant URLs crawl twice there; this is the fix a
    Common-Crawl-scale frontier needs). Canonical form: fragment
    stripped, scheme+host lowercased (path case preserved), default
    port and www. dropped, utm_*/ref tracking params removed, trailing
    slash trimmed. Pure scan-stage string expressions, then ONE
    groupBy(canonical_url): count of raw variants + min doc_id as the
    canonical representative (first-wins, map-side combinable)."""
    raw = _URL_RAW_SPARK
    canon = _canon_steps(raw, "spark")
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id", F.expr(canon).alias("canonical_url")
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.min("doc_id").cast("bigint").alias("rep_id"),
        )
    )


SQL_URL_CANONICAL_DEDUP = f"""
SELECT canonical_url, count(*)::BIGINT AS n_variants,
       min(doc_id)::BIGINT AS rep_id
FROM (SELECT doc_id, {_canon_steps(_URL_RAW_DUCK, "duck")} AS canonical_url
      FROM documents) t
GROUP BY canonical_url
"""


_PACK_CHUNK = 2048


def q_pack_sequences(spark, sf_dir):
    """Training-sequence packing (concatenate-and-chunk, the GPT-style
    pre-training layout): assign every doc its global token offset in
    doc_id order and the 2048-token chunk it lands in. The offset is an
    EXCLUSIVE prefix sum computed by the distributed two-job
    range-partition pattern (:func:`owlfrontier.ordering.
    with_running_total`) — a global ``SUM() OVER (ORDER BY …)`` window
    collapses to ONE partition and is a non-starter for a 10^10-doc
    corpus; here each partition adds a driver-computed base offset to
    its local cumsum (the oracle DOES use the window — DuckDB is the
    small-scale referee, not the scale model)."""
    from owlfrontier.ordering import with_running_total

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tok"),
    )
    packed = with_running_total(
        d, ["doc_id"], "n_tok", out_col="tok_offset"
    )
    return packed.select(
        "doc_id",
        "n_tok",
        "tok_offset",
        F.expr(f"tok_offset div {_PACK_CHUNK}").alias("chunk_id"),
        F.expr(
            f"cast((tok_offset + n_tok - 1) div {_PACK_CHUNK} "
            f"> tok_offset div {_PACK_CHUNK} as int)"
        ).alias("spans_boundary"),
    )


def q_ann_dedup_clusters(spark, sf_dir):
    """Embedding near-dup dedup END-TO-END — pairs → components → keep
    decision, mirroring what `dedup_clusters` does for the MinHash text
    path: connected components over the banded-LSH candidate graph
    (:func:`q_ann_lsh_pairs_banded`, the recall-contracted production
    pair generator), every vector labeled with the smallest vec_id in
    its component (cluster_id == vec_id ⇒ the kept representative).
    Scale shape inherits from both stages: banded bucket self-join for
    pairs (never all-pairs), then diameter-bounded label propagation —
    one |E|-row equi-join + groupBy-min per round
    (:mod:`owlfrontier.graph`)."""
    from owlfrontier.graph import connected_components

    pairs = q_ann_lsh_pairs_banded(spark, sf_dir)
    nodes = _emb(spark, sf_dir).select(F.col("vec_id").alias("id"))
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    return connected_components(nodes, edges, mode="label").select(
        F.col("id").alias("vec_id"), F.col("component").alias("cluster_id")
    )


SQL_ANN_DEDUP_CLUSTERS = f"""
WITH RECURSIVE
pairs AS ({SQL_ANN_LSH_PAIRS_BANDED}),
edges AS (SELECT a_id AS src, b_id AS dst FROM pairs
          UNION ALL
          SELECT b_id AS src, a_id AS dst FROM pairs),
reach(root, node) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
)
SELECT root AS vec_id, min(node)::BIGINT AS cluster_id
FROM reach GROUP BY root
"""


SQL_PACK_SEQUENCES = f"""
WITH d AS (SELECT doc_id,
                  len(string_split(text, ' '))::BIGINT AS n_tok
           FROM documents),
p AS (SELECT doc_id, n_tok,
             (sum(n_tok) OVER (ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_tok)::BIGINT
               AS tok_offset
      FROM d)
SELECT doc_id, n_tok, tok_offset,
       tok_offset // {_PACK_CHUNK} AS chunk_id,
       ((tok_offset + n_tok - 1) // {_PACK_CHUNK}
        > tok_offset // {_PACK_CHUNK})::INT AS spans_boundary
FROM p
"""


_SESSION_GAP_SEC = 1800


def q_sessionize(spark, sf_dir):
    """Event sessionization (the click-stream staple): a user's events
    split into sessions at >30-min gaps; one output row per session
    with its bounds and size. Scale shape: ONE shuffle on user_id —
    the session-boundary lag, the session-index running count and the
    final per-session aggregation all share the same partitioning, so
    Catalyst plans a single exchange; boundaries are integer-exact
    (epoch-second arithmetic, (ts, event_id) total order)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    # epoch seconds via unix_seconds (the parquet ts is NTZ; session tz
    # is pinned UTC on both engines, so this equals DuckDB's epoch(ts))
    epoch = F.unix_seconds(F.col("ts").cast("timestamp"))
    marked = e.withColumn(
        "new_sess",
        F.when(epoch - F.lag(epoch).over(w) > _SESSION_GAP_SEC, 1)
        .otherwise(0)
        .cast("bigint"),
    ).withColumn(
        "sess_idx",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return marked.groupBy("user_id", "sess_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
    )


SQL_SESSIONIZE = f"""
WITH m AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts)::BIGINT
                   - lag(epoch(ts)::BIGINT)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {_SESSION_GAP_SEC}
              THEN 1 ELSE 0 END::BIGINT AS new_sess
  FROM events),
s AS (SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_idx
      FROM m)
SELECT user_id, sess_idx, count(*)::BIGINT AS n_events,
       min(ts) AS sess_start, max(ts) AS sess_end
FROM s GROUP BY user_id, sess_idx
"""


def q_source_rollup(spark, sf_dir):
    """Per-source corpus health rollup (the FineWeb per-domain filter
    input: which sources are worth keeping): doc counts, token mass,
    exact-dup rate inside the source, language spread. ONE
    groupBy(source) over scan-stage expressions; the dup rate reuses
    the portable md5 identity entirely inside the aggregation
    (count distinct text-hash vs count), integer-exact with a rounded
    final ratio."""
    d = _docs(spark, sf_dir).select(
        "source",
        "lang",
        F.md5("text").alias("th"),
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("toks"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("toks").cast("bigint").alias("sum_tokens"),
        F.countDistinct("th").cast("bigint").alias("n_unique_texts"),
        F.round(
            1
            - F.countDistinct("th") / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )


SQL_SOURCE_ROLLUP = """
SELECT source,
       count(*)::BIGINT AS n_docs,
       sum(len(string_split(text, ' ')))::BIGINT AS sum_tokens,
       count(DISTINCT md5(text))::BIGINT AS n_unique_texts,
       round(1 - count(DISTINCT md5(text)) / count(*)::DOUBLE, 6)
         AS dup_frac,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM documents GROUP BY source
"""


_BPE_TOPK = 25


def q_bpe_merge_pairs(spark, sf_dir):
    """The first iteration of BPE training: corpus-wide adjacent
    character-pair frequencies (the statistic each merge step maximizes
    — Sennrich et al. 2016). Scale shape mirrors vocab_topk: explode
    words → explode in-word char bigrams → ONE partial+final hash agg
    (map-side combine absorbs the hot pairs) → TakeOrdered top-K with a
    deterministic (count desc, pair asc) boundary. A full BPE trainer
    iterates this query against an updating symbol table; each
    iteration stays this exact shape."""
    pairs = (
        _spread(_docs(spark, sf_dir))
        .select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_TOPK)
    )


SQL_BPE_MERGE_PAIRS = f"""
SELECT pair, count(*)::BIGINT AS cnt
FROM (
  SELECT unnest([w[i:i+1] for i in generate_series(1, len(w) - 1)]) AS pair
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) >= 2)
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {_BPE_TOPK}
"""


# ---------------------------------------------------------------------------
# Round-5 additions II: exact n-gram-Jaccard pairs (prefix-filtered),
# cross-doc paragraph dedup, overlap chunking, domain-blocklist gate
# ---------------------------------------------------------------------------

# Jaccard threshold τ = 1/2 kept as an exact rational so the verify
# predicate is pure integer arithmetic on both engines.
_JACC_NUM, _JACC_DEN = 1, 2
_JACC_N = 3  # word n for the gram sets


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs over the WHOLE corpus — the
    brief's "n-gram Jaccard" dedup family member, done exactly (MinHash
    is its sketch; this is the ground truth at a threshold). All pairs
    with Jaccard(distinct-3-gram sets) >= 1/2.

    Scale shape — the prefix-filtering principle (Bayardo et al. WWW'07
    / PPJoin): under ANY global total order on grams, two sets with
    J >= t MUST share a gram among each side's first
    ``|S| - ceil(t*|S|) + 1`` grams, so only those PREFIX grams are
    exploded into the inverted index that generates candidates — at
    t=1/2 that's ~half the explode volume, and crucially hot grams
    deep in a doc's suffix never fan out at all. The global order here
    is md5(gram) (r6: held as the 16-byte ``unhex`` BINARY — an
    injective, order-preserving recoding of the oracle's hex string, so
    the sort order, prefix set, distinctness and intersection sizes are
    bytewise-identical at half the bytes and memcmp-fast comparisons),
    which also double-duties as gram-frequency scrambling — stopword-ish
    hot grams land at random prefix positions instead of every doc's
    prefix front. Each doc's working array ``h8`` is the POSITIONAL
    ``xxhash64`` image of that md5-sorted digest array: element i of h8
    is xxhash64 of sorted-digest i, so prefix slices, sorted positions
    and (w.h.p.) distinctness/intersection sizes are preserved while
    every downstream comparison is a single long op. This matters twice:
    the inverted-index join key becomes a bigint equi-join, and — the r6
    headline — candidate verification's ``array_intersect`` runs on
    ``array<bigint>``, which takes Spark's specialized long-OpenHashSet
    O(|A|+|B|) path; on the binary/string digests it falls back to the
    generic O(|A|·|B|) ordering scan (measured: the verify stage alone
    was ~10× the whole candidate stage). A 64-bit collision could in
    principle perturb a count (P < 1e-8 corpus-wide at sf1.0;
    hash-match against the md5-exact DuckDB oracle is verified at every
    shipped sf). Verification itself is map-side against two BROADCAST
    copies of the n-row digest table (guide §8: attach the decision
    data without re-shuffling payload rows — the old shuffled attach
    joins re-exchanged every array-carrying candidate row on the second
    join key, ~2.5 KB × |candidates|): intersection size by
    ``array_intersect``, the τ gate as the integer predicate
    ``DEN*inter >= NUM*union``. Never all-pairs; the only row
    multiplication is the prefix explode."""
    n = _JACC_N
    d = (
        _spread(_docs(spark, sf_dir))
        .select("doc_id", F.split("text", " ").alias("ws"))
        .where(F.size("ws") >= n)  # cheap-column filter (see _shingles_expr)
    )
    # one sorted array of gram digests per doc (sorted in md5-BINARY
    # order == the oracle's hex order), then its positional xxhash64
    # image; sa = |distinct grams| (computed on the exact digests)
    sets = d.select(
        "doc_id",
        F.expr(
            f"array_sort(array_distinct(transform({_gram_expr(n, 'ws')}, "
            "g -> unhex(md5(g)))))"
        ).alias("hs"),
    ).select(
        "doc_id",
        F.expr("transform(hs, x -> xxhash64(x))").alias("h8"),
        F.size("hs").alias("sa"),
    )
    # shared by prefix + verify; eager (r6-rev2) so the doc-count
    # observation below resolves at construction and the Arrow verify can
    # collect the digest table from the materialized checkpoint
    from pyspark.sql import Observation

    _obs_sets = Observation()
    sets = sets.observe(
        _obs_sets, F.count(F.lit(1)).alias("n"), F.max("sa").alias("mx")
    ).localCheckpoint(eager=True)
    # ASYMMETRIC prefixes (PPJoin indexing, Xiao et al. VLDB'08): the
    # PROBE side uses the basic prefix |S| - ceil(τ|S|) + 1, the INDEX
    # side only |S| - ceil(2τ/(1+τ)·|S|) + 1, and a candidate row is
    # generated only when the indexed doc is the lexicographically
    # (size, id)-SMALLER side. Completeness: for a true pair with
    # sb ≤ sa, overlap o ≥ ceil(τ/(1+τ)(sa+sb)) ≥ ceil(2τ/(1+τ)·sb)
    # and (via the length filter sb ≥ τ·sa) o ≥ ceil(τ·sa); the
    # MINIMAL shared digest g has ≥ o−1 shared digests after it in BOTH
    # arrays, so pos_A(g) ≤ sa−o+1 ≤ probe-prefix(A) and pos_B(g) ≤
    # sb−o+1 ≤ index-prefix(B) simultaneously — the join on g emits the
    # pair. Extra candidates only ever ADD verify work; the exact τ
    # gate removes them, so the result set is unchanged (τ=1/2: probe
    # ~|S|/2, index ~|S|/3 — ~40% fewer candidate rows).
    plen = F.expr(
        f"sa - cast(ceil({_JACC_NUM} * sa / {_JACC_DEN}) as int) + 1"
    )
    ilen = F.expr(
        f"sa - cast(ceil(2 * {_JACC_NUM} * sa / "
        f"({_JACC_NUM} + {_JACC_DEN})) as int) + 1"
    )
    pref = sets.select(
        "doc_id",
        "sa",
        F.posexplode(F.slice("h8", F.lit(1), plen)).alias("pos", "pk"),
    )
    idx = sets.select(
        "doc_id",
        "sa",
        F.posexplode(F.slice("h8", F.lit(1), ilen)).alias("pos", "pk"),
    )
    # length filter (PPJoin): J >= τ implies τ·max(|A|,|B|) <= min(|A|,|B|)
    # — prunes size-incompatible candidates BEFORE the distinct+verify
    # without changing the result (the τ gate below subsumes it)
    len_ok = _JACC_DEN * F.least(F.col("a.sa"), F.col("b.sa")) >= (
        _JACC_NUM * F.greatest(F.col("a.sa"), F.col("b.sa"))
    )
    # positional filter (PPJoin): a shared gram at 0-based sorted
    # positions (i, j) bounds the overlap by min(i,j) + min(sa-i, sb-j),
    # and J >= τ needs overlap >= ceil(τ/(1+τ)·(sa+sb)); since the bound
    # holds for EVERY shared gram, every match row of a true pair passes
    # — map-side pruning before the distinct exchange, zero result change
    alpha = F.expr(
        f"cast(ceil({_JACC_NUM} * (a.sa + b.sa) / "
        f"({_JACC_NUM} + {_JACC_DEN})) as int)"
    )
    pos_ok = (
        F.least(F.col("a.pos"), F.col("b.pos"))
        + F.least(
            F.col("a.sa") - F.col("a.pos"), F.col("b.sa") - F.col("b.pos")
        )
    ) >= alpha
    # indexed side strictly (size, id)-smaller: excludes self-matches and
    # names each unordered pair once per shared prefix digest
    lex = (F.col("b.sa") < F.col("a.sa")) | (
        (F.col("b.sa") == F.col("a.sa"))
        & (F.col("b.doc_id") < F.col("a.doc_id"))
    )
    cand_raw = (
        pref.alias("a")
        .join(idx.alias("b"), F.col("a.pk") == F.col("b.pk"))
        .where(lex & len_ok & pos_ok)
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("a_id"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("b_id"),
        )
    )
    cand = cand_raw.distinct()
    # -- exact verification ------------------------------------------------
    # r6 second revision (guide §4.2, the same measurement story as the
    # banded-LSH dot product): at sf1.0 the per-candidate
    # array_intersect over ~33 M pairs was 12-15 s of the query — the
    # OpenHashSet build/probe per row is ~60 ns/element over
    # ~194 elements/pair. The intersection COUNT (and only it — an exact
    # integer) moves to a vectorized numpy `mapInArrow`: grams are
    # dictionary-encoded to dense int32 ids on the n-row digest table
    # (driver-side, the same fits-in-a-broadcast posture the old
    # broadcast array-attach already assumed), each doc becomes one
    # SORTED padded row of a (n × Lmax) matrix — probe side padded with
    # even ids past the universe, index side with odd, so pads can never
    # match — and a batch of pairs is two row gathers plus ONE flat
    # np.searchsorted over row-offset-shifted values (rows occupy
    # disjoint value ranges, so the flattened index side is globally
    # sorted). τ gate / union / jaccard stay in the JVM on broadcast-
    # attached set sizes, expression-identical to before. Intra-doc
    # xxhash64 collisions (which array_intersect would count once) are
    # deduplicated during matrix build, so the count semantics match
    # exactly. Gated on doc count and matrix cells; beyond the gate the
    # JVM array_intersect path below is the plan, unchanged.
    n_docs = _obs_sets.get["n"]
    max_len = _obs_sets.get["mx"] or 0
    va_n = F.broadcast(sets.select(
        F.col("doc_id").alias("a_id"), F.col("sa").alias("na"),
    ))
    vb_n = F.broadcast(sets.select(
        F.col("doc_id").alias("b_id"), F.col("sa").alias("nb"),
    ))
    if (
        n_docs <= _ARROW_DOT_MAX_VECS
        and n_docs * max(max_len, 1) <= _ARROW_INTERSECT_MAX_CELLS
    ):
        import numpy as np

        import pyarrow.compute as pc

        tbl = sets.select("doc_id", "h8").toArrow()
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        col = tbl.column("h8").combine_chunks()
        lens = pc.list_value_length(col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        vals = col.flatten().to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(lens)])
        uniq = np.unique(vals)
        n_uniq = len(uniq)
        lmax = int(lens.max()) if len(lens) else 0
        # pad ids live at [n_uniq, n_uniq + 2*lmax): even = probe side,
        # odd = index side — never equal to a real code or to each other
        pads_a = n_uniq + 2 * np.arange(lmax, dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        row_of = np.empty(len(ids), dtype=np.int64)
        row_of[order] = np.arange(len(ids))
        ga = np.tile(pads_a, (len(ids), 1))
        rix = np.repeat(row_of, lens)
        cix = np.arange(len(vals)) - np.repeat(offs[:-1], lens)
        ga[rix, cix] = np.searchsorted(uniq, vals)
        ga.sort(axis=1, kind="stable")
        dup = ga[:, 1:] == ga[:, :-1]
        if dup.any():  # intra-doc xxhash64 collision: count once, like
            ga[:, 1:][dup] = np.repeat(  # array_intersect — re-pad + re-sort
                pads_a[None, :], len(ids), axis=0
            )[:, 1:][dup]
            ga.sort(axis=1, kind="stable")
        gb = np.where(ga >= n_uniq, ga + 1, ga)  # odd pads for the B side
        ids_sorted = ids[order]
        lens_sorted = np.ascontiguousarray(lens[order])
        # narrowest exact id dtype (largest value = the top B-side pad
        # n_uniq + 2*lmax + 1; the cells gate already guarantees < 2^31):
        # int16 when the dictionary fits halves the per-batch sort
        # traffic again — measured 5.8 vs 10.4 ms / 10k-pair batch
        id_t = (
            np.int16
            if n_uniq + 2 * lmax + 1 <= np.iinfo(np.int16).max
            else np.int32
        )
        bc = spark.sparkContext.broadcast(
            (ids_sorted, ga.astype(id_t), gb.astype(id_t), lens_sorted)
        )

        def _inter_batches(batches):
            import numpy as np
            import pyarrow as pa

            ids_s, ga_, gb_, lens_ = bc.value
            for batch in batches:
                a = batch.column(0).to_numpy(zero_copy_only=False)
                b_ = batch.column(1).to_numpy(zero_copy_only=False)
                m = len(a)
                if m == 0 or ga_.size == 0:
                    inter = np.zeros(m, dtype=np.int64)
                    keep = np.zeros(m, dtype=bool)
                else:
                    ai = np.searchsorted(ids_s, a)
                    bi = np.searchsorted(ids_s, b_)
                    # per-pair concat of the two sorted unique rows,
                    # rowwise sort, adjacent equality == shared real
                    # gram id (probe pads are even past the universe,
                    # index pads odd — pads never match anything).
                    # Default (unstable) sort: only values are compared
                    # afterwards, and it measured ~1.8x faster than the
                    # stable merge on these short int rows
                    c = np.concatenate([ga_[ai], gb_[bi]], axis=1)
                    c.sort(axis=1)
                    inter = (c[:, 1:] == c[:, :-1]).sum(
                        axis=1, dtype=np.int64
                    )
                    # the τ gate is pure int64 arithmetic — EXACTLY the
                    # JVM predicate below — so applying it here only
                    # shrinks the Arrow return stream and the size-attach
                    # joins to the true result set; the JVM gate then
                    # passes every returned row unchanged
                    union = lens_[ai] + lens_[bi] - inter
                    keep = _JACC_DEN * inter >= _JACC_NUM * union
                yield pa.RecordBatch.from_arrays(
                    [pa.array(a[keep], type=pa.int64()),
                     pa.array(b_[keep], type=pa.int64()),
                     pa.array(inter[keep], type=pa.int64())],
                    names=["a_id", "b_id", "inter_n"],
                )

        # the Arrow path verifies the RAW candidate stream (measured
        # duplicate-pair multiplicity 1.04×) and dedups AFTER the exact
        # τ gate: the candidate `distinct` was the single biggest
        # exchange of the query (sf3: 33 s for 300 M pair rows vs 3.7 s
        # to enumerate them), while re-verifying a duplicate costs ~100
        # ns of kernel; duplicates of a pair produce identical rows, so
        # the post-gate distinct over the true result set is exact. The
        # JVM fallback below keeps the pre-verify distinct — its per-row
        # verify is ~60 ns/element, so there the worst-case multiplicity
        # blow-up (up to index-prefix-length on duplicate-saturated
        # corpora) is the bigger risk.
        withint = cand_raw.mapInArrow(
            _inter_batches, "a_id bigint, b_id bigint, inter_n bigint"
        )
        inter = F.col("inter_n")
        union = F.col("na") + F.col("nb") - inter
        return (
            withint.join(va_n, "a_id")
            .join(vb_n, "b_id")
            .where(_JACC_DEN * inter >= _JACC_NUM * union)
            .select(
                "a_id",
                "b_id",
                inter.cast("bigint").alias("inter"),
                union.cast("bigint").alias("union_sz"),
                F.round(inter / union, 6).alias("jaccard"),
            )
            .distinct()
        )
    # beyond-gate fallback: NO broadcast hints — this path only runs
    # when the digest table exceeds the driver-collect gate, so the
    # planner picks the join strategy (shuffled at true scale,
    # auto-broadcast at the test sizes that force this path)
    va = sets.select(
        F.col("doc_id").alias("a_id"),
        F.col("h8").alias("ha"),
        F.col("sa").alias("na"),
    )
    vb = sets.select(
        F.col("doc_id").alias("b_id"),
        F.col("h8").alias("hb"),
        F.col("sa").alias("nb"),
    )
    inter = F.size(F.array_intersect("ha", "hb"))
    union = F.col("na") + F.col("nb") - inter
    return (
        cand.join(va, "a_id")
        .join(vb, "b_id")
        .where(_JACC_DEN * inter >= _JACC_NUM * union)
        .select(
            "a_id",
            "b_id",
            inter.cast("bigint").alias("inter"),
            union.cast("bigint").alias("union_sz"),
            F.round(inter / union, 6).alias("jaccard"),
        )
    )


def _jacc_grams_duck(n: int) -> str:
    joined = "||' '||".join(f"ws[i + {k}]" for k in range(n))
    return f"[{joined} for i in generate_series(1, len(ws) - {n - 1})]"


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
           WHERE len(string_split(text, ' ')) >= {_JACC_N}),
s AS (SELECT doc_id,
             list_sort(list_distinct(list_transform(
                 {_jacc_grams_duck(_JACC_N)}, g -> md5(g)))) AS hs
      FROM t),
z AS (SELECT doc_id, hs, len(hs) AS sa FROM s),
p AS (SELECT doc_id,
             unnest(hs[1 : (sa - ceil({_JACC_NUM} * sa / {_JACC_DEN})::INT
                            + 1)]) AS pk
      FROM z),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM p a JOIN p b ON a.pk = b.pk AND a.doc_id < b.doc_id),
v AS (SELECT a_id, b_id,
             len(list_intersect(za.hs, zb.hs))::BIGINT AS inter,
             (za.sa + zb.sa - len(list_intersect(za.hs, zb.hs)))::BIGINT
               AS union_sz
      FROM cand JOIN z za ON za.doc_id = a_id
                JOIN z zb ON zb.doc_id = b_id)
SELECT a_id, b_id, inter, union_sz,
       round(inter / union_sz::DOUBLE, 6) AS jaccard
FROM v WHERE {_JACC_DEN} * inter >= {_JACC_NUM} * union_sz
"""


_PARA_WORDS = 8  # synthetic paragraph = 8-word block (the corpus is a
# single-line word stream; real pages would split on blank lines)


def q_paragraph_dedup(spark, sf_dir):
    """Cross-document paragraph dedup (the FineWeb / CCNet line-level
    pass): every repeated paragraph keeps only its FIRST occurrence in
    (doc_id, position) order — including repeats inside one doc — and
    each doc reports its scrubbed text as an md5 so the oracle checks
    the EXACT reassembled bytes. Scale shape: explode blocks → ONE
    map-side-combinable groupBy(block) min for the global winner (the
    winner is encoded as one BIGINT ``doc_id * 2^20 + idx`` — integer
    min instead of a struct min so both engines agree bit-for-bit;
    2^20 bounds blocks/doc, i.e. docs under ~8M words) → join back →
    per-doc reassembly groupBy. Nothing is pairwise; the dedup key is
    the block itself."""
    pw = _PARA_WORDS
    d = _spread(_docs(spark, sf_dir)).select("doc_id", F.split("text", " ").alias("ws"))
    blocks = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (size(ws) - 1) div {pw}), "
                f"b -> concat_ws(' ', slice(ws, b * {pw} + 1, {pw})))"
            )
        ).alias("idx", "block"),
    )
    winners = blocks.groupBy("block").agg(
        F.min(F.col("doc_id") * (1 << 20) + F.col("idx")).alias("wkey")
    )
    kept = blocks.join(winners, "block").where(
        F.col("doc_id") * (1 << 20) + F.col("idx") == F.col("wkey")
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_blocks"),
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(struct(idx, block))), "
                    "s -> s.block)"
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    totals = blocks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks")
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_blocks",
            F.coalesce("kept_blocks", F.lit(0))
            .cast("bigint")
            .alias("kept_blocks"),
            F.coalesce("clean_md5", F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


SQL_PARAGRAPH_DEDUP = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
b AS (SELECT doc_id, i - 1 AS idx,
             array_to_string(ws[(i - 1) * {_PARA_WORDS} + 1
                               : i * {_PARA_WORDS}], ' ') AS block
      FROM t, unnest(generate_series(
               1, (len(ws) - 1) // {_PARA_WORDS} + 1)) AS u(i)),
w AS (SELECT block, min(doc_id * {1 << 20} + idx) AS wkey
      FROM b GROUP BY block),
k AS (SELECT b.doc_id, b.idx, b.block FROM b JOIN w USING (block)
      WHERE b.doc_id * {1 << 20} + b.idx = w.wkey),
pd AS (SELECT doc_id, count(*)::BIGINT AS kept_blocks,
              md5(string_agg(block, ' ' ORDER BY idx)) AS clean_md5
       FROM k GROUP BY doc_id),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_blocks FROM b GROUP BY doc_id)
SELECT tot.doc_id, tot.n_blocks,
       coalesce(pd.kept_blocks, 0)::BIGINT AS kept_blocks,
       coalesce(pd.clean_md5, md5('')) AS clean_md5
FROM tot LEFT JOIN pd USING (doc_id)
"""


# chunk/stride scaled to this corpus's ~25-word docs; a 512/384 RAG or
# pre-training chunker is the same plan with different constants
_CHUNK_TOK = 16
_CHUNK_STRIDE = 12


def q_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (the RAG / long-context
    pre-training splitter): fixed-size windows with stride overlap,
    last window clipped at the doc end, every token covered. Pure
    scan-stage array expressions — ``sequence`` for the window starts,
    ``slice`` per window, zero shuffle and zero UDF; the per-chunk md5
    lets the oracle pin the exact chunk bytes."""
    ch, st = _CHUNK_TOK, _CHUNK_STRIDE
    d = _spread(_docs(spark, sf_dir)).select("doc_id", F.split("text", " ").alias("ws"))
    # windows = (max(n - ch, 0) + st - 1) div st + 1  (>=1, covers all)
    nc = F.expr(
        f"(greatest(size(ws) - {ch}, 0) + {st - 1}) div {st} + 1"
    )
    return d.select(
        "doc_id",
        F.size("ws").alias("n"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, (greatest(size(ws) - {ch}, 0) "
                f"+ {st - 1}) div {st}), "
                f"c -> concat_ws(' ', slice(ws, c * {st} + 1, {ch})))"
            )
        ).alias("chunk_idx", "chunk"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.least(F.lit(ch), F.col("n") - F.col("chunk_idx") * st)
        .cast("bigint")
        .alias("n_tok"),
        F.md5("chunk").alias("chunk_md5"),
    )


SQL_DOC_CHUNKS = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (SELECT doc_id, len(ws) AS n, i AS chunk_idx,
             array_to_string(ws[i * {_CHUNK_STRIDE} + 1
                               : i * {_CHUNK_STRIDE} + {_CHUNK_TOK}], ' ')
               AS chunk
      FROM t, unnest(generate_series(
               0, (greatest(len(ws) - {_CHUNK_TOK}, 0)
                   + {_CHUNK_STRIDE - 1}) // {_CHUNK_STRIDE})) AS u(i))
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
       least({_CHUNK_TOK}, n - chunk_idx * {_CHUNK_STRIDE})::BIGINT AS n_tok,
       md5(chunk) AS chunk_md5
FROM c
"""


# host surface derived deterministically per row (no url column in the
# corpus); the blocklist mixes registrable-domain and exact-host entries
_BLOCK_HOST_SPARK = (
    "concat('h', cast(doc_id % 7 as string), '.',"
    " CASE cast(doc_id % 3 as int) WHEN 0 THEN 'ads' WHEN 1 THEN 'cdn'"
    " ELSE 'web' END, '.example.',"
    " CASE cast(doc_id % 2 as int) WHEN 0 THEN 'com' ELSE 'org' END)"
)
_BLOCK_HOST_DUCK = (
    "'h' || (doc_id % 7)::VARCHAR || '.'"
    " || CASE doc_id % 3 WHEN 0 THEN 'ads' WHEN 1 THEN 'cdn'"
    " ELSE 'web' END || '.example.'"
    " || CASE doc_id % 2 WHEN 0 THEN 'com' ELSE 'org' END"
)
_BLOCKLIST = ["ads.example.com", "h3.cdn.example.org", "web.example.org"]


def q_domain_blocklist(spark, sf_dir):
    """Domain-blocklist gate (the UT1/adult-list filter every web-corpus
    pipeline runs): a doc is blocked when its host OR any parent domain
    is listed — suffix semantics, so ``ads.example.com`` kills every
    subdomain under it. Scale shape: each host explodes into its
    dot-suffix chain (bounded by label count, ~4 rows/doc) and probes
    the blocklist via one BROADCAST left-semi join — the corpus is
    never shuffled on the host key and the blocklist (thousands of
    rows in production) stays a map-side hash table."""
    host = F.expr(_BLOCK_HOST_SPARK)
    d = _spread(_docs(spark, sf_dir)).select("doc_id", host.alias("host"))
    sufs = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(host, '\\\\.'))), "
                "i -> array_join(slice(split(host, '\\\\.'), i, "
                "size(split(host, '\\\\.')) - i + 1), '.'))"
            )
        ).alias("suf"),
    )
    bl = spark.createDataFrame([(e,) for e in _BLOCKLIST], ["suf"])
    hits = (
        sufs.join(F.broadcast(bl), "suf", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("blocked", F.lit(1))
    )
    return d.join(hits, "doc_id", "left").select(
        "doc_id",
        "host",
        F.coalesce("blocked", F.lit(0)).cast("int").alias("blocked"),
    )


SQL_DOMAIN_BLOCKLIST = f"""
WITH d AS (SELECT doc_id, {_BLOCK_HOST_DUCK} AS host FROM documents),
bl AS (SELECT * FROM (VALUES
       {", ".join(f"('{e}')" for e in _BLOCKLIST)}) AS v(suf)),
s AS (SELECT doc_id,
             unnest([array_to_string((string_split(host, '.'))[i:],'.')
                     for i in generate_series(
                         1, len(string_split(host, '.')))]) AS suf
      FROM d),
h AS (SELECT DISTINCT doc_id FROM s JOIN bl USING (suf))
SELECT d.doc_id, d.host,
       CASE WHEN h.doc_id IS NULL THEN 0 ELSE 1 END::INT AS blocked
FROM d LEFT JOIN h USING (doc_id)
"""


_QUANTS = (0.5, 0.9, 0.99)


def q_length_quantiles(spark, sf_dir):
    """Per-language token-length quantiles (the corpus-profiling input
    to every length-filter threshold choice): EXACT interpolated
    percentiles, verified equal to DuckDB's ``quantile_cont``. Scale
    note: exact percentile buffers each group's values (fine for the
    5-language groups here; a 10^10-row group would not be) — the
    production path at that scale is the MERGEABLE ``approx_percentile``
    sketch (map-side-combinable, bounded memory), which
    ``test_length_quantiles_sketch_contract`` pins to the exact values
    within a rank-ε on this corpus. One groupBy, integer inputs, floats
    only in the final interpolation (rounded)."""
    qs = ", ".join(str(q) for q in _QUANTS)
    d = _docs(spark, sf_dir).select(
        "lang", F.expr("size(split(text, ' '))").alias("n")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("round(percentile(n, 0.5), 6)").alias("p50"),
        F.expr("round(percentile(n, 0.9), 6)").alias("p90"),
        F.expr("round(percentile(n, 0.99), 6)").alias("p99"),
    )


SQL_LENGTH_QUANTILES = """
SELECT lang, count(*)::BIGINT AS n_docs,
       round(quantile_cont(n, 0.5), 6) AS p50,
       round(quantile_cont(n, 0.9), 6) AS p90,
       round(quantile_cont(n, 0.99), 6) AS p99
FROM (SELECT lang, len(string_split(text, ' ')) AS n FROM documents) t
GROUP BY lang
"""


# The trained artifact pinned as a constant (the top-16 merges
# owlfrontier.bpe.train_merges produces on the sf0.001 corpus — includes
# multi-char x and y so the fold's generic-length branch is exercised).
# APPLICATION with a fixed vocabulary is the production op under test
# here; training ships as bpe.train_merges (pytest-refereed).
_BPE_FIXED_MERGES = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"),
]


def q_bpe_encode(spark, sf_dir):
    """BPE ENCODING as pure SQL — both engines apply the pinned
    16-merge table exactly, so the oracle hash-checks the full token
    stream (md5) and token counts. Each merge level is a fold
    (``aggregate`` / ``list_reduce``) with a U+001F-joined string
    accumulator that provably equals the greedy left-to-right merge
    pass (:mod:`owlfrontier.bpe`, `encode_fold_sql`); 16 levels chain
    with LINEAR expression growth (each level references its input
    once — the '' seed avoids the head/tail double reference). Zero
    shuffle, zero UDF: tokenization is scan-stage work. The Arrow-UDF
    twin (`bpe.encode`) is the readable production path; this pair
    pins its exact semantics cross-engine."""
    from owlfrontier.bpe import encode_fold_sql

    fold = encode_fold_sql("w", _BPE_FIXED_MERGES, "spark")
    stream = (
        "array_join(transform(filter(split(text, ' '), w -> w <> ''), "
        f"w -> {fold}), chr(30))"
    )
    n_tok = (
        "cast(CASE WHEN stream = '' THEN 0 ELSE "
        "(length(stream) - length(replace(stream, chr(31), ''))) + "
        "(length(stream) - length(replace(stream, chr(30), ''))) + 1 "
        "END as bigint)"
    )
    return (
        _spread(_docs(spark, sf_dir))
        .select("doc_id", F.expr(stream).alias("stream"))
        .select(
            "doc_id",
            F.expr(n_tok).alias("n_tokens"),
            F.md5("stream").alias("tokens_md5"),
        )
    )


def _bpe_encode_oracle() -> str:
    from owlfrontier.bpe import encode_fold_sql

    fold = encode_fold_sql("w", _BPE_FIXED_MERGES, "duck")
    return f"""
WITH s AS (
  SELECT doc_id,
         array_to_string(list_transform(
             list_filter(string_split(text, ' '), w -> w <> ''),
             w -> {fold}), chr(30)) AS stream
  FROM documents)
SELECT doc_id,
       (CASE WHEN stream = '' THEN 0 ELSE
         (length(stream) - length(replace(stream, chr(31), ''))) +
         (length(stream) - length(replace(stream, chr(30), ''))) + 1
        END)::BIGINT AS n_tokens,
       md5(stream) AS tokens_md5
FROM s
"""


SQL_BPE_ENCODE = _bpe_encode_oracle()


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "word_index": q_word_index,
    "index_stats": q_index_stats,
    "dedup_antijoin": q_dedup_antijoin,
    "politeness_topk": q_politeness_topk,
    "frontier_expansion": q_frontier_expansion,
    "crawl_order_topk": q_crawl_order_topk,
    "first_wins_dedup": q_first_wins_dedup,
    "exact_dedup": q_exact_dedup,
    "neardup_jaccard": q_neardup_jaccard,
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "dedup_clusters": q_dedup_clusters,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "ann_bruteforce_topk": q_ann_bruteforce_topk,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_pairs": q_ann_lsh_pairs,
    "ann_lsh_pairs_banded": q_ann_lsh_pairs_banded,
    "ann_ivf_assign": q_ann_ivf_assign,
    "ann_ivf_train": q_ann_ivf_train,
    "ann_ivf_train_ff": q_ann_ivf_train_ff,
    "ann_ivf_topk": q_ann_ivf_topk,
    "pagerank": q_pagerank,
    "order_seq": q_order_seq,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "token_count": q_token_count,
    "doc_fingerprint": q_doc_fingerprint,
    "gopher_repetition": q_gopher_repetition,
    "webtext_filters": q_webtext_filters,
    "vocab_topk": q_vocab_topk,
    "sample_stratified": q_sample_stratified,
    "corpus_select": q_corpus_select,
    "search_phrase": q_search_phrase,
    "search_highlights": q_search_highlights,
    "search_highlights_slop1": q_search_highlights_slop1,
    "multimodal_features": q_multimodal_features,  # rows-only (binary decode)
    "multimodal_manifest": q_multimodal_manifest,
    "audio_manifest": q_audio_manifest,
    "frame_sample": q_frame_sample,  # rows-only (video-analog frame extraction)
    "neardup_embedding": q_neardup_embedding,
    "stats_rollup": q_stats_rollup,
    "events_daily": q_events_daily,
    "props_json": q_props_json,
    "dup_ngram_frac": q_dup_ngram_frac,
    "decontaminate": q_decontaminate,
    "pii_scrub": q_pii_scrub,
    "bm25_topk": q_bm25_topk,
    "url_canonical_dedup": q_url_canonical_dedup,
    "pack_sequences": q_pack_sequences,
    "ann_dedup_clusters": q_ann_dedup_clusters,
    "sessionize": q_sessionize,
    "source_rollup": q_source_rollup,
    "bpe_merge_pairs": q_bpe_merge_pairs,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "paragraph_dedup": q_paragraph_dedup,
    "doc_chunks": q_doc_chunks,
    "domain_blocklist": q_domain_blocklist,
    "length_quantiles": q_length_quantiles,
    "bpe_encode": q_bpe_encode,
}

ORACLE = {
    "word_index": SQL_WORD_INDEX,
    "index_stats": SQL_INDEX_STATS,
    "dedup_antijoin": SQL_DEDUP_ANTIJOIN,
    "politeness_topk": SQL_POLITENESS_TOPK,
    "frontier_expansion": SQL_FRONTIER_EXPANSION,
    "crawl_order_topk": SQL_CRAWL_ORDER_TOPK,
    "first_wins_dedup": SQL_FIRST_WINS_DEDUP,
    "exact_dedup": SQL_EXACT_DEDUP,
    "neardup_jaccard": SQL_NEARDUP_JACCARD,
    "minhash_signatures": SQL_MINHASH_SIGNATURES,
    "minhash_lsh_pairs": SQL_MINHASH_LSH_PAIRS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "simhash": SQL_SIMHASH,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "ann_bruteforce_topk": SQL_ANN_BRUTEFORCE_TOPK,
    "ann_lsh_buckets": SQL_ANN_LSH_BUCKETS,
    "ann_lsh_pairs": SQL_ANN_LSH_PAIRS,
    "multimodal_manifest": SQL_MULTIMODAL_MANIFEST,
    "audio_manifest": SQL_AUDIO_MANIFEST,
    "ann_lsh_pairs_banded": SQL_ANN_LSH_PAIRS_BANDED,
    "ann_ivf_assign": SQL_ANN_IVF_ASSIGN,
    "ann_ivf_train": SQL_ANN_IVF_TRAIN,
    "ann_ivf_train_ff": SQL_ANN_IVF_TRAIN_FF,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "pagerank": SQL_PAGERANK,
    "order_seq": SQL_ORDER_SEQ,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "token_count": SQL_TOKEN_COUNT,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "gopher_repetition": SQL_GOPHER_REPETITION,
    "webtext_filters": SQL_WEBTEXT_FILTERS,
    "vocab_topk": SQL_VOCAB_TOPK,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "corpus_select": SQL_CORPUS_SELECT,
    "search_phrase": SQL_SEARCH_PHRASE,
    "search_highlights": SQL_SEARCH_HIGHLIGHTS,
    "search_highlights_slop1": SQL_SEARCH_HIGHLIGHTS_SLOP1,
    "neardup_embedding": SQL_NEARDUP_EMBEDDING,
    "stats_rollup": SQL_STATS_ROLLUP,
    "events_daily": SQL_EVENTS_DAILY,
    "props_json": SQL_PROPS_JSON,
    "dup_ngram_frac": SQL_DUP_NGRAM_FRAC,
    "decontaminate": SQL_DECONTAMINATE,
    "pii_scrub": SQL_PII_SCRUB,
    "bm25_topk": SQL_BM25_TOPK,
    "url_canonical_dedup": SQL_URL_CANONICAL_DEDUP,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "ann_dedup_clusters": SQL_ANN_DEDUP_CLUSTERS,
    "sessionize": SQL_SESSIONIZE,
    "source_rollup": SQL_SOURCE_ROLLUP,
    "bpe_merge_pairs": SQL_BPE_MERGE_PAIRS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "doc_chunks": SQL_DOC_CHUNKS,
    "domain_blocklist": SQL_DOMAIN_BLOCKLIST,
    "length_quantiles": SQL_LENGTH_QUANTILES,
    "bpe_encode": SQL_BPE_ENCODE,
}
