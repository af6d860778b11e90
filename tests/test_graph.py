"""Connected-components tests: both modes vs a pure-Python union-find
oracle on random graphs, star-mode round bounds on an adversarial
long-chain graph (where label propagation would need diameter rounds),
and the dedup_clusters query equivalence across modes."""

import random

from pyspark.sql import functions as F

from owlfrontier.graph import connected_components


def _union_find(n_ids, edge_list):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component = min reachable id
    comp = {}
    for i in n_ids:
        comp[i] = find(i)
    # path compression above keeps roots minimal because we always hang
    # the larger root under the smaller one
    return comp


def _spark_cc(spark, n_ids, edge_list, mode):
    nodes = spark.createDataFrame([(i,) for i in n_ids], ["id"])
    edges = (
        spark.createDataFrame(edge_list or [(0, 0)], ["src", "dst"])
        if edge_list
        else spark.createDataFrame([], "src long, dst long")
    )
    out = connected_components(nodes, edges, mode=mode)
    return {r["id"]: r["component"] for r in out.collect()}


def test_both_modes_match_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        ids = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 80))
        ]
        expect = _union_find(ids, edges)
        for mode in ("label", "star"):
            got = _spark_cc(spark, ids, edges, mode)
            assert got == expect, (trial, mode)


def test_star_mode_bounds_rounds_on_long_chain(spark):
    """A 400-node chain has diameter 399: label propagation needs ~399
    rounds, large-star/small-star must collapse it in O(log² n) — assert
    a hard small bound and the exact labels."""
    n = 400
    nodes = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    labels, rounds = connected_components(
        nodes, edges, mode="star", max_rounds=30, return_rounds=True
    )
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 12, rounds


def test_isolated_nodes_self_label(spark):
    got = _spark_cc(spark, [5, 9, 11], [(9, 11)], "star")
    assert got == {5: 5, 9: 9, 11: 9}


def test_dedup_clusters_same_under_star_mode(spark):
    """The query's label-mode output must equal a star-mode run over the
    same LSH pair graph."""
    from owlfrontier import queries as Q

    sf = "/root/testdata/sf0.001"
    label_out = {
        (r["doc_id"], r["cluster_id"])
        for r in Q.q_dedup_clusters(spark, sf).collect()
    }
    pairs = Q.q_minhash_lsh_pairs(spark, sf)
    nodes = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select(F.col("doc_id").alias("id"))
    )
    edges = pairs.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    )
    star_out = {
        (r["id"], r["component"])
        for r in connected_components(nodes, edges, mode="star").collect()
    }
    assert label_out == star_out
