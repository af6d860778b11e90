"""ANN recall contracts (round-4 verdict item 3): the ANN paths are
oracle-exact, but exactness says nothing about whether the APPROXIMATION
is any good — the first-class bar for ANN as a training-data operator.

These tests build a deterministic CLUSTERED synthetic embedding corpus
(near-duplicate groups — the regime embedding near-dup detection and IVF
search target) and measure:

* recall@5 of ``ann_ivf_topk`` against the ``ann_bruteforce_topk``
  exact-cosine truth, with an asserted >= 0.8 floor at the default
  nprobe, monotone non-decreasing recall in nprobe (the documented
  recall/cost knob), and EXACT equality at nprobe == K (probing every
  inverted list == brute force);
* pair collision recall of the LSH candidate generation against exact
  near-dup truth: the banded variant (OR-of-ANDs over 4 bands of 4
  planes) must clear a 0.95 floor where the single-bucket variant
  (all 8 planes must agree) structurally cannot.

Everything is seeded — the corpus, the pseudo-random hyperplanes (hash
of (plane, dim)), and the tie-breaks — so the measured recalls are
reproducible constants, not flaky statistics.
"""

import numpy as np
import pytest

N_GROUPS = 60
GROUP_SIZE = 8
DIM = 64
NOISE = 0.02  # member = normalize(center + NOISE * N(0,1)): cos ≈ 0.987
TRUTH_COS = 0.95  # exact near-dup truth threshold (in-group pairs only)


@pytest.fixture(scope="module")
def clustered_dir(spark, tmp_path_factory):
    """(vec_id, embedding float[64]) parquet of N_GROUPS near-dup groups,
    vec_ids shuffled so the first K vectors (the IVF codebook / the 5
    queries) are random draws, like real data."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_GROUPS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, GROUP_SIZE, axis=0)
    vecs = vecs + NOISE * rng.standard_normal(vecs.shape)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    groups = np.repeat(np.arange(N_GROUPS), GROUP_SIZE)
    perm = rng.permutation(len(vecs))
    vecs, groups = vecs[perm], groups[perm]

    path = tmp_path_factory.mktemp("ann-recall")
    rows = [
        (int(i), [float(x) for x in vecs[i].astype(np.float32)])
        for i in range(len(vecs))
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).repartition(4).write.mode("overwrite").parquet(
        str(path / "embeddings.parquet")
    )
    return str(path), vecs.astype(np.float32), groups


def _pairs(df):
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def _topk(df, k=5):
    out = {}
    for r in df.collect():
        if r["rnk"] <= k:
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_topk_recall_floor_and_nprobe_knob(spark, clustered_dir):
    from owlfrontier.queries import (
        _IVF_K,
        q_ann_bruteforce_topk,
        q_ann_ivf_topk,
    )

    path, _vecs, _groups = clustered_dir
    truth = _topk(q_ann_bruteforce_topk(spark, path), k=5)

    recalls = {}
    results = {}
    for nprobe in (1, 2, _IVF_K):
        got = _topk(q_ann_ivf_topk(spark, path, nprobe=nprobe), k=5)
        results[nprobe] = got
        per_q = [
            len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
        ]
        recalls[nprobe] = sum(per_q) / len(per_q)

    # the contract: >= 0.8 at the default nprobe=2 on a clustered corpus
    assert recalls[2] >= 0.8, recalls
    # nprobe is the recall/cost knob: monotone non-decreasing
    assert recalls[1] <= recalls[2] <= recalls[_IVF_K], recalls
    # probing every inverted list IS the brute-force answer, exactly —
    # not just the same recall, the same (query, neighbor) sets
    assert results[_IVF_K] == truth


def test_lsh_pair_collision_recall_banded_vs_single(spark, clustered_dir):
    from owlfrontier.queries import q_ann_lsh_pairs, q_ann_lsh_pairs_banded

    path, vecs, groups = clustered_dir
    # exact near-dup truth: in-group pairs with true cosine >= TRUTH_COS
    # (cross-group cosines are ~N(0, 1/sqrt(DIM)) — nowhere near it)
    v = vecs.astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    truth = set()
    for g in range(N_GROUPS):
        ids = np.where(groups == g)[0]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = int(ids[i]), int(ids[j])
                if float(v[a] @ v[b]) >= TRUTH_COS:
                    truth.add((min(a, b), max(a, b)))
    assert len(truth) > 1000  # the corpus really is near-dup-heavy

    single = _pairs(q_ann_lsh_pairs(spark, path))
    banded = _pairs(q_ann_lsh_pairs_banded(spark, path))

    recall_single = len(single & truth) / len(truth)
    recall_banded = len(banded & truth) / len(truth)

    # the banded (OR-of-ANDs) path is the production candidate generator:
    # hard floor, and strictly better than requiring all planes to agree
    assert recall_banded >= 0.95, (recall_banded, recall_single)
    assert recall_banded > recall_single, (recall_banded, recall_single)
    # the single-bucket variant's structural ceiling on this corpus is the
    # documented reason the banded variant exists (≈0.955^8 per pair);
    # record-assert it is genuinely lossy, not just marginally worse
    assert recall_single < 0.9, recall_single
    # no false "near-dups": every banded pair that claims cos >= 0.95
    # in quantized arithmetic is a true near-dup pair
    high = {
        (r["a_id"], r["b_id"])
        for r in q_ann_lsh_pairs_banded(spark, path)
        .where("cos_q >= 0.95").collect()
    }
    assert high <= truth
