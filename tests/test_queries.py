"""Driver-contract tests: every queries() entry hash-matches its DuckDB
oracle at sf0.001 (the driver's own gate runs sf0.01), and entry() returns
rows with a stable schema."""

import pytest

from owlfrontier.oracle_check import compare
from owlfrontier.queries import ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.001"


# non-SQL-expressible ops: queries() entries with NO oracle — the driver
# records the weaker rows-only check for these (pandas-UDF string work /
# binary decode); their exact semantics are pinned by pytest goldens
ROWS_ONLY = {"multimodal_features", "frame_sample"}


def test_registry_complete():
    assert set(QUERIES) == set(ORACLE) | ROWS_ONLY
    assert not ROWS_ONLY & set(ORACLE)
    assert len(ORACLE) >= 18


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    r = compare(name, spark, SF_DIR)
    assert r["ok"], r


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["seq", "generation", "url", "doc_id", "text_json"]
    assert rows[0]["text_json"].startswith('{"title":"Doc 0"')


def test_sample_stratified_is_nested_and_stratified(spark):
    """The hash-gate sample must be a deterministic nested family: raising
    every rate yields a strict superset (the scaling-law property), and
    each stratum's keep-rate tracks its configured per-mille rate."""
    from owlfrontier import queries as Q

    base = {
        r["doc_id"]: r["lang"]
        for r in Q.q_sample_stratified(spark, SF_DIR).collect()
    }
    orig = Q._SAMPLE_RATES
    try:
        Q._SAMPLE_RATES = {k: min(1000, v * 2) for k, v in orig.items()}
        bigger = {
            r["doc_id"] for r in Q.q_sample_stratified(spark, SF_DIR).collect()
        }
    finally:
        Q._SAMPLE_RATES = orig
    assert set(base) <= bigger  # nested: same hash, higher rate ⇒ superset
    total = {
        r["doc_id"]: r["lang"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang").collect()
    }
    for lang, rate in orig.items():
        n_all = sum(1 for v in total.values() if v == lang)
        n_kept = sum(1 for v in base.values() if v == lang)
        if n_all >= 10:
            assert abs(n_kept / n_all - rate / 1000) < 0.35


def test_ivf_training_reduces_quantization_error(spark):
    """Lloyd iterations must not worsen the objective: total squared
    distance from each vector to its nearest centroid shrinks (or holds)
    as iterations increase; training beats both untrained inits; and the
    farthest-first seeding (the k-means‖-style distributed init) spreads
    the initial centers better than the first-K prefix while producing a
    DIFFERENT trained codebook (Lloyd is init-sensitive — both variants
    stay oracle-checkable)."""
    from owlfrontier import queries as Q

    def codebook(fn, iters):
        orig = Q._IVF_TRAIN_ITERS
        Q._IVF_TRAIN_ITERS = iters
        try:
            cents = {}
            for r in fn(spark, SF_DIR).collect():
                cents.setdefault(r["cid"], {})[r["pos"]] = r["value"]
            return {
                cid: [d[p] for p in sorted(d)] for cid, d in cents.items()
            }
        finally:
            Q._IVF_TRAIN_ITERS = orig

    import duckdb

    duckdb.sql(
        "CREATE OR REPLACE VIEW embeddings AS "
        f"SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    vecs = duckdb.sql(
        "SELECT [round(x::DOUBLE * 1e6)::BIGINT for x in embedding] "
        "AS xi FROM embeddings"
    ).fetchall()

    def objective(cents):
        return sum(
            min(
                sum((a - b) * (a - b) for a, b in zip(xi, c))
                for c in cents.values()
            )
            for (xi,) in vecs
        )

    o0, o1, o3 = (
        objective(codebook(Q.q_ann_ivf_train, i)) for i in (0, 1, 3)
    )
    assert o1 <= o0  # first update beats the raw first-K init
    assert o3 <= o1  # more iterations never worsen the objective
    assert o3 < o0  # and training overall strictly improved it

    ff0_cents = codebook(Q.q_ann_ivf_train_ff, 0)
    ff3_cents = codebook(Q.q_ann_ivf_train_ff, 3)
    f0, f3 = objective(ff0_cents), objective(ff3_cents)
    assert f3 <= f0  # monotone under the spread init too
    # init sensitivity: the spread init starts from a strictly better
    # quantization than the prefix init and trains to a different codebook
    assert f0 < o0
    assert ff3_cents != codebook(Q.q_ann_ivf_train, 3)


def test_emb_dim_uniform_ok_and_mixed_raises(spark):
    """_emb_dim asserts a uniform embedding dimension instead of silently
    filtering (ADVICE r4: a silent size filter diverged from the DuckDB
    oracles, which apply none — mixed-dim corpora must fail loudly on
    both paths)."""
    from owlfrontier.queries import _emb_dim

    uniform = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3]), (2, [0.4, 0.5, 0.6])],
        "vec_id bigint, embedding array<double>",
    )
    assert _emb_dim(uniform) == 3
    mixed = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3]), (2, [0.4, 0.5])],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="mixed embedding dims"):
        _emb_dim(mixed)
    empty = uniform.where("vec_id < 0")
    assert _emb_dim(empty) == 0


def test_decontaminate_excludes_eval_and_flags_true_overlaps(spark):
    """The eval set (doc_id % 97 == 0) never appears in the output, and
    the contaminated flag equals a brute-force Python recomputation of
    4-gram overlap with the eval set."""
    from owlfrontier import queries as Q

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    n = Q._DECON_N
    def grams(ws):
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}
    ev = set()
    for d, ws in docs.items():
        if d % Q._DECON_EVAL_MOD == 0:
            ev |= grams(ws)
    out = {r["doc_id"]: r["contaminated"]
           for r in Q.q_decontaminate(spark, SF_DIR).collect()}
    assert all(d % Q._DECON_EVAL_MOD != 0 for d in out)
    for d, ws in docs.items():
        if d % Q._DECON_EVAL_MOD != 0:
            assert out[d] == int(bool(grams(ws) & ev)), d
    assert 0 < sum(out.values()) < len(out)  # discriminative at this sf


def test_pii_scrub_redacts_everything(spark):
    """After scrubbing, the augmented text contains no email/IP/phone
    match (signature column is checked against a local re-scrub), and
    every row found at least one of each planted PII kind."""
    import hashlib
    import re

    from pyspark.sql import functions as F

    from owlfrontier import queries as Q

    rows = Q.q_pii_scrub(spark, SF_DIR).collect()
    assert all(r["n_emails"] >= 1 and r["n_ips"] >= 1 and r["n_phones"] >= 1
               for r in rows)
    aug = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.expr(Q._PII_AUG_SPARK).alias("aug"))
        .collect()
    )
    sig = {r["doc_id"]: r["scrub_sig"] for r in rows}
    for r in aug:
        s = re.sub(Q._PII_EMAIL, "<EMAIL>", r["aug"])
        s = re.sub(Q._PII_IP, "<IP>", s)
        s = re.sub(Q._PII_PHONE, "<PHONE>", s)
        assert not re.search(Q._PII_EMAIL, s)
        assert not re.search(Q._PII_IP, s.replace("<IP>", "x"))
        assert sig[r["doc_id"]] == hashlib.md5(s.encode()).hexdigest()


def test_url_canonicalization_is_idempotent_and_merges_variants(spark):
    """canon(canon(u)) == canon(u) (fixpoint), and the four deterministic
    variant branches of the same logical URL land on one canonical row
    with rep_id = the smallest contributing doc_id."""
    from pyspark.sql import functions as F

    from owlfrontier import queries as Q

    canon1 = Q._canon_steps(Q._URL_RAW_SPARK, "spark")
    canon2 = Q._canon_steps(f"({canon1})", "spark")
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(F.expr(canon1).alias("c1"), F.expr(canon2).alias("c2"))
    )
    assert d.where("c1 <> c2").count() == 0
    out = {r["canonical_url"]: (r["n_variants"], r["rep_id"])
           for r in Q.q_url_canonical_dedup(spark, SF_DIR).collect()}
    for u, (nv, rep) in out.items():
        assert u.startswith("http://src")  # lowercased, www/port stripped
        assert "#" not in u and "utm_" not in u and "ref=" not in u
        assert not u.endswith("/")
    # doc_id % 20 × doc_id % 50 → 100 logical URLs over 500 docs, each
    # seen via multiple raw variants
    assert len(out) == 100
    assert all(nv >= 2 for nv, _ in out.values())


def test_pack_sequences_partitions_token_stream(spark):
    """Offsets are an exact exclusive prefix sum in doc_id order, chunks
    tile the stream, and spans_boundary marks exactly the docs crossing
    a 2048-token edge."""
    from owlfrontier import queries as Q

    rows = sorted(
        Q.q_pack_sequences(spark, SF_DIR).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0
    for r in rows:
        assert r["tok_offset"] == acc
        assert r["chunk_id"] == acc // Q._PACK_CHUNK
        spans = (acc + r["n_tok"] - 1) // Q._PACK_CHUNK > acc // Q._PACK_CHUNK
        assert r["spans_boundary"] == int(spans)
        acc += r["n_tok"]
    assert acc == sum(r["n_tok"] for r in rows)
    assert rows[-1]["chunk_id"] > 0  # corpus spans multiple chunks


def test_bm25_score_is_tf_and_length_sensitive(spark):
    """The integer BM25 surrogate preserves the ranking axioms on this
    corpus: scores are positive, strictly ordered output, and the top
    doc has at least the median per-term tf of the bottom ranked doc
    (more matching mass ranks higher under equal-ish dl)."""
    from owlfrontier import queries as Q

    rows = Q.q_bm25_topk(spark, SF_DIR).collect()
    assert len(rows) == Q._BM25_K
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert scores[-1] > 0
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    def qmass(d):
        return sum(docs[d].count(t) for t in Q._BM25_TERMS)
    # every ranked doc actually contains query terms
    assert all(qmass(r["doc_id"]) > 0 for r in rows)


def test_sessionize_gap_invariants_and_single_exchange(spark):
    """Consecutive sessions of a user are separated by > the gap;
    events inside a session never straddle a gap; and the whole op
    plans ONE shuffle (window + running count + final agg all share the
    user_id partitioning)."""
    from owlfrontier import queries as Q

    rows = Q.q_sessionize(spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert sum(len(v) for v in by_user.values()) == len(rows)
    for sess in by_user.values():
        sess.sort(key=lambda r: r["sess_idx"])
        assert [r["sess_idx"] for r in sess] == list(range(len(sess)))
        for a, b in zip(sess, sess[1:]):
            gap = (b["sess_start"] - a["sess_end"]).total_seconds()
            assert gap > Q._SESSION_GAP_SEC
        for r in sess:
            assert r["sess_start"] <= r["sess_end"]
    plan = Q.q_sessionize(spark, SF_DIR)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_bpe_merge_pairs_matches_local_count(spark):
    """Top-K char-pair counts equal a local brute-force recount."""
    from collections import Counter

    from owlfrontier import queries as Q

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    ]
    c = Counter()
    for t in texts:
        for w in t.split(" "):
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:Q._BPE_TOPK]
    got = [(r["pair"], r["cnt"])
           for r in Q.q_bpe_merge_pairs(spark, SF_DIR).collect()]
    assert got == want


CANON_CASES = [
    # (input, expected) — incl. the round-5 review's confirmed failures
    ("http://example.com/path:80/foo", "http://example.com/path:80/foo"),
    ("http://h/score?a=1:80", "http://h/score?a=1:80"),
    ("https://example.com:80/x", "https://example.com:80/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://h/a&utm_b=c", "http://h/a&utm_b=c"),
    ("http://h/p?utm_source=x&page=2", "http://h/p?page=2"),
    ("http://h/p?page=2&utm_source=x&ref=rss", "http://h/p?page=2"),
    ("mailto:someone@x.com", "mailto:someone@x.com"),
    ("not-a-url", "not-a-url"),
    ("HTTP://WWW.A.Example:80/p1?utm_source=x", "http://a.example/p1"),
    ("http://a.example/p1#frag", "http://a.example/p1"),
    ("http://a.example/p1/", "http://a.example/p1"),
    ("http://a.example/p1//", "http://a.example/p1"),
    ("http://h", "http://h"),
    ("http://h/?utm_source=x", "http://h"),
    ("http://h/p?a=1&b=2", "http://h/p?a=1&b=2"),
    ("http://User@H.com/Path", "http://user@h.com/Path"),
    ("http://h?a=1", "http://h?a=1"),
]


def test_canonical_url_dialects_agree_on_adversarial_cases(spark):
    """Both dialects of canonical_url_sql produce the pinned canonical
    form on adversarial inputs: ':80' inside a path/query survives,
    https keeps :80 / drops :443, '&utm_' in a PATH survives, a leading
    utm param followed by a real param is removed, authority-less URLs
    pass through unchanged (never collapse to ''), repeated trailing
    slashes strip idempotently."""
    import duckdb

    from owlfrontier.urlutil import canonical_url_sql

    from pyspark.sql import functions as F

    sdf = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "i int, u string"
    )
    got_spark = {
        r["i"]: r["c"]
        for r in sdf.select(
            "i", F.expr(canonical_url_sql("u", "spark")).alias("c")
        ).collect()
    }
    con = duckdb.connect()
    dexpr = canonical_url_sql("u", "duck")
    for i, (inp, want) in enumerate(CANON_CASES):
        got_duck = con.execute(
            f"SELECT {dexpr} FROM (SELECT ? AS u)", [inp]
        ).fetchone()[0]
        assert got_spark[i] == want, (inp, got_spark[i], want)
        assert got_duck == want, (inp, got_duck, want)


def test_ngram_jaccard_prefix_filter_is_exact(spark):
    """The prefix-filtered candidate generation must lose NOTHING: the
    query's pair set equals a brute-force all-pairs Jaccard over the
    distinct-3-gram sets (the Bayardo/PPJoin completeness guarantee,
    plus the length filter's exactness)."""
    from owlfrontier import queries as Q

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    gsets = {
        d: {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}
        for d, ws in docs.items()
        if len(ws) >= 3
    }
    want = {}
    ids = sorted(gsets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(gsets[a] & gsets[b])
            union = len(gsets[a] | gsets[b])
            if Q._JACC_DEN * inter >= Q._JACC_NUM * union:
                want[(a, b)] = (inter, union)
    got = {
        (r["a_id"], r["b_id"]): (r["inter"], r["union_sz"])
        for r in Q.q_ngram_jaccard_pairs(spark, SF_DIR).collect()
    }
    assert got == want
    assert len(got) > 0  # the corpus must actually exercise the op


def test_paragraph_dedup_keeps_first_occurrence(spark):
    """Brute-force referee: scrubbed text = blocks whose FIRST global
    occurrence in (doc_id, idx) order is this one; md5 and counts must
    match the query for every doc."""
    import hashlib

    from owlfrontier import queries as Q

    pw = Q._PARA_WORDS
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    seen = set()
    want = {}
    for d in sorted(docs):
        ws = docs[d]
        blocks = [
            " ".join(ws[b * pw:(b + 1) * pw])
            for b in range((len(ws) - 1) // pw + 1)
        ]
        kept = [b for b in blocks if b not in seen and not seen.add(b)]
        want[d] = (
            len(blocks),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r["doc_id"]: (r["n_blocks"], r["kept_blocks"], r["clean_md5"])
        for r in Q.q_paragraph_dedup(spark, SF_DIR).collect()
    }
    assert got == want
    assert any(k < n for n, k, _ in want.values())  # dedup actually fired


def test_doc_chunks_cover_every_token_with_overlap(spark):
    """Every token index lands in >=1 chunk, consecutive chunks overlap
    by CHUNK-STRIDE tokens, and each chunk_md5 is the md5 of exactly
    the window's whitespace-joined slice."""
    import hashlib

    from owlfrontier import queries as Q

    ch, st = Q._CHUNK_TOK, Q._CHUNK_STRIDE
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    rows = Q.q_doc_chunks(spark, SF_DIR).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for d, ws in docs.items():
        chunks = sorted(by_doc[d], key=lambda r: r["chunk_idx"])
        covered = set()
        for r in chunks:
            start = r["chunk_idx"] * st
            window = ws[start:start + ch]
            assert r["n_tok"] == len(window)
            assert (
                r["chunk_md5"]
                == hashlib.md5(" ".join(window).encode()).hexdigest()
            )
            covered.update(range(start, start + len(window)))
        assert covered == set(range(len(ws)))
        # stride < chunk ⇒ adjacent windows overlap (when 2+ chunks)
        if len(chunks) > 1:
            assert st < ch


def test_domain_blocklist_suffix_semantics(spark):
    """blocked=1 iff the host equals a blocklist entry or ends with
    '.'+entry (parent-domain suffix match); subdomains of a listed
    registrable domain are blocked, siblings are not."""
    from owlfrontier import queries as Q

    rows = Q.q_domain_blocklist(spark, SF_DIR).collect()
    assert len(rows) > 0

    def ref_blocked(host):
        return int(
            any(
                host == e or host.endswith("." + e)
                for e in Q._BLOCKLIST
            )
        )

    for r in rows:
        assert r["blocked"] == ref_blocked(r["host"]), r
    # both outcomes occur in the corpus
    assert {r["blocked"] for r in rows} == {0, 1}


def test_length_quantiles_sketch_contract(spark):
    """The mergeable approx_percentile sketch (the 10^10-row scale path
    — bounded-memory, map-side combinable) must land within a rank-ε of
    the exact interpolated percentiles the oracle pins: with accuracy
    parameter A, approx rank error <= n/A, so the approx value must sit
    between the exact values at p±1/A (widened by one rank for the
    interpolation difference)."""
    from pyspark.sql import functions as F

    acc = 100  # rank error <= n_docs / 100
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("lang", F.expr("size(split(text, ' '))").alias("n"))
    )
    rows = d.groupBy("lang").agg(
        F.expr("sort_array(collect_list(n))").alias("vals"),
        F.expr(
            f"approx_percentile(n, array(0.5, 0.9, 0.99), {acc})"
        ).alias("approx"),
    ).collect()
    for r in rows:
        vals, m = r["vals"], len(r["vals"])
        for p, a in zip((0.5, 0.9, 0.99), r["approx"]):
            lo_rank = max(0, int(p * (m - 1)) - (m // acc) - 1)
            hi_rank = min(m - 1, int(p * (m - 1)) + (m // acc) + 2)
            assert vals[lo_rank] <= a <= vals[hi_rank], (
                r["lang"], p, a, vals[lo_rank], vals[hi_rank])


def test_canonical_url_combinatorial_grid(spark):
    """Exhaustive combinatorial sweep over the canonicalization chain's
    interacting dimensions (scheme × www × port × path shape × query ×
    fragment — 648 URLs): both dialects agree on every combination, and
    the chain is IDEMPOTENT (canon(canon(u)) == canon(u)) — one Spark
    job and one DuckDB scan, no per-case round trips."""
    import itertools

    import duckdb

    from pyspark.sql import functions as F

    from owlfrontier.urlutil import canonical_url_sql

    schemes = ["http://", "https://", ""]
    wwws = ["", "www.", "WWW."]
    hosts = ["Ex.COM"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a/b", "/a:80/b"]
    queries = [
        "", "?utm_source=x", "?a=1", "?utm_source=x&a=1",
        "?a=1&ref=rss", "?ref=rss&utm_b=2",
    ]
    frags = ["", "#f"]
    urls = [
        s + w + h + po + pa + q + f
        for s, w, h, po, pa, q, f in itertools.product(
            schemes, wwws, hosts, ports, paths, queries, frags
        )
    ]
    sdf = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "i int, u string"
    )
    c1 = F.expr(canonical_url_sql("u", "spark")).alias("c1")
    got = sdf.select("i", "u", c1).select(
        "i",
        "u",
        "c1",
        F.expr(canonical_url_sql("c1", "spark")).alias("c2"),
    ).collect()
    by_i = {r["i"]: r for r in got}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, u VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(urls)))
    dexpr = canonical_url_sql("u", "duck")
    duck = dict(con.execute(f"SELECT i, {dexpr} FROM t").fetchall())
    for i, u in enumerate(urls):
        r = by_i[i]
        assert r["c1"] == duck[i], (u, r["c1"], duck[i])
        assert r["c2"] == r["c1"], ("not idempotent", u, r["c1"], r["c2"])


def test_new_ops_plan_shapes(spark):
    """Plan-regression pins for the round-5 additions' scale claims:
    doc_chunks is a pure scan-stage projection — ZERO hash/range
    exchanges (r6: the `_spread` round-robin repartition is allowed; it
    spreads the unsplittable single-row-group sandbox scan across tasks
    and moves each raw row once with no key, no sort, no aggregation),
    domain_blocklist probes the blocklist via a BROADCAST join (the
    corpus is never shuffled on the host key), and paragraph_dedup's
    winner aggregation is a partial-aggregating hash agg (map-side
    combine before its one block-keyed exchange)."""
    from owlfrontier import queries as Q

    def plan_of(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple")
        )

    chunks = plan_of(Q.q_doc_chunks(spark, SF_DIR))
    assert "Exchange hashpartitioning" not in chunks
    assert "Exchange rangepartitioning" not in chunks
    # at most the keyless _spread round-robin; never a keyed shuffle
    assert chunks.count("Exchange") <= 1

    block = plan_of(Q.q_domain_blocklist(spark, SF_DIR))
    assert "BroadcastHashJoin" in block or "BroadcastNestedLoop" in block
    # the corpus side must not hash-exchange on the suffix key
    assert "Exchange hashpartitioning(suf" not in block

    para = plan_of(Q.q_paragraph_dedup(spark, SF_DIR))
    # two-phase agg: partial HashAggregate before the block exchange
    assert "Exchange hashpartitioning(block" in para
    assert para.count("HashAggregate(keys=[block") >= 2


def test_arrow_kernels_equal_jvm_fallback(spark, monkeypatch):
    """r6: the Arrow-vectorized exact kernels (banded-LSH dot product,
    n-gram intersection count) are gated on fits-in-a-broadcast sizes
    and fall back to the pure-Catalyst HOF plans beyond the gate. Both
    paths must be row-identical — force the fallback by zeroing the
    gates and compare against the Arrow path on the same inputs."""
    from owlfrontier import queries as Q

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    arrow_banded = rows(Q.q_ann_lsh_pairs_banded(spark, SF_DIR))
    arrow_ngram = rows(Q.q_ngram_jaccard_pairs(spark, SF_DIR))

    monkeypatch.setattr(Q, "_ARROW_DOT_MAX_VECS", -1)
    monkeypatch.setattr(Q, "_ARROW_INTERSECT_MAX_CELLS", -1)
    jvm_banded = rows(Q.q_ann_lsh_pairs_banded(spark, SF_DIR))
    jvm_ngram = rows(Q.q_ngram_jaccard_pairs(spark, SF_DIR))

    assert arrow_banded == jvm_banded and len(arrow_banded) > 0
    assert arrow_ngram == jvm_ngram and len(arrow_ngram) > 0
