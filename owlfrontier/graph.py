"""Distributed connected components — the clustering step of the near-dup
dedup pipeline (``queries.q_dedup_clusters``) and a general building block.

Two algorithms behind one API, both pure DataFrame ops (joins + groupBy-min
— no collect_list, so a hot node never materializes its neighbor list):

* ``mode="label"`` — min-label propagation: every node adopts the minimum
  label among itself and its neighbors each round. One |E|-row shuffle per
  round; converges in graph-DIAMETER rounds. The right choice for near-dup
  graphs (clique/star-like components, diameter ≲ 3).

* ``mode="star"`` — alternating large-star/small-star contraction
  (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected
  Components in MapReduce and Beyond", SoCC 2014): large-star hangs every
  strictly-larger neighbor under the neighborhood minimum, small-star
  re-hangs the smaller neighbors; alternating the two converges in
  O(log² n) rounds REGARDLESS of diameter. The scale-safe choice when the
  graph shape is unknown (a 10^10-node web graph can hide arbitrarily long
  chains that would take label propagation arbitrarily many rounds).

Both truncate lineage per round with ``localCheckpoint`` (the same
constant-size-plan pattern as the crawl generation loop) and detect
convergence with scalar aggregates (no driver-side data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(edges: DataFrame) -> DataFrame:
    """(src, dst) → both directions, self-loops dropped.

    The one-directional edge list is localCheckpointed BEFORE the union:
    ``e`` appears in BOTH union branches, and Spark does not
    common-subexpression-eliminate identical subtrees across branches —
    without the checkpoint the whole upstream pair-generation pipeline
    (e.g. the banded-LSH candidate join + exact-cosine gate feeding
    ``q_ann_dedup_clusters``) executes twice in whatever job first
    materializes the symmetric edges (measured at sf1.0: a full second
    pairs pass, ~13 s). Checkpointing |E| once is strictly cheaper than
    materializing the 2|E| union, and the union above it stays lazy —
    downstream readers recompute it from the in-memory checkpoint."""
    e = edges.select("src", "dst").where(
        F.col("src") != F.col("dst")
    ).localCheckpoint(eager=True)
    return e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _labels_by_propagation(
    nodes: DataFrame, edges: DataFrame, max_rounds: int
) -> DataFrame:
    from pyspark.sql import Observation

    # r6 (guide §2.4): self-loops folded into the propagation edge set
    # ONCE, so each round is a single join + groupBy-min — min over
    # N(u) ∪ {u} in one aggregation — instead of the old
    # neighbor-join + groupBy + second left-join-with-least shape
    # (same per-round labels, ~half the exchanges per round).
    #
    # r6 contraction prepass: near-dup pair graphs are DENSE (the ann
    # pair graph at sf1.0 is ~4 M edges over 20 k nodes), and label
    # propagation pays one |E| pass PER ROUND. One exact min-neighbor
    # contraction — map every node u to m(u) = min(N(u) ∪ {u}), the
    # large-star hang of Kiveris et al. — then propagate on the
    # contracted supernode graph {(m(u), m(v)) : (u,v) ∈ E}, whose
    # edge set collapses map-side in the distinct's partial aggregate
    # (near-clique components contract to a handful of supernode
    # edges). Correctness: m(u) is in u's component; mapped paths stay
    # paths, consecutive mapped edges sharing m(u_i), so contracted
    # components are exactly the images of original components; the
    # original component min w has m(w) = w, so supernode-component
    # minima ARE the original minima, and label(u) = label'(m(u)).
    # _symmetric checkpoints the one-directional edge list; the union
    # itself stays lazy (recomputed from the checkpoint by each reader —
    # cheaper than materializing 2|E| a second time)
    sym = _symmetric(edges)
    mn = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    # the node count (broadcast gate) rides the checkpoint
    # materialization as an observed metric — no separate count job (r6)
    obs_m = Observation()
    m = nodes.join(mn, nodes["id"] == mn["src"], "left").select(
        "id",
        F.least(F.col("id"), F.coalesce("mn", F.col("id"))).alias("m"),
    ).observe(
        obs_m, F.count(F.lit(1)).alias("n")
    ).localCheckpoint(eager=True)
    n_nodes = obs_m.get["n"]
    # node-keyed maps are |V| rows of two bigints; when that fits an
    # executor hash relation, broadcasting makes the per-round (and
    # contraction) joins map-side — the only exchange left per round is
    # the partial-aggregated groupBy-min output. Beyond the threshold
    # (a 10^9-node web graph) the shuffled joins are the right plan.
    bcast = n_nodes <= 10_000_000
    mm = F.broadcast(m) if bcast else m
    e2 = (
        sym.join(
            mm.select(F.col("id").alias("src"), F.col("m").alias("ms")),
            "src",
        )
        .join(
            mm.select(F.col("id").alias("dst"), F.col("m").alias("md")),
            "dst",
        )
        .select(F.col("ms").alias("src"), F.col("md").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    supernodes = m.select(F.col("m").alias("id")).distinct()
    # e2 is already symmetric (sym carried both directions through the
    # mapping), so only the supernode self-loops are unioned in
    # the round-0 convergence checksum (identity labels: each supernode id
    # once) rides the prop checkpoint as an observed metric — the
    # supernode self-loop rows are exactly the src==dst rows of prop
    # (e2 excludes them), so the conditional sum counts each supernode
    # exactly once. No separate agg job (r6).
    obs_p = Observation()
    prop = e2.unionAll(
        supernodes.select(F.col("id").alias("src"), F.col("id").alias("dst"))
    ).observe(
        obs_p,
        F.sum(
            F.when(F.col("src") == F.col("dst"), F.col("src"))
            .cast("decimal(38,0)")
        ).alias("s0"),
    ).localCheckpoint(eager=True)
    # decimal sum: overflow-proof change detector (strictly decreases while
    # any label changes, so equal sums == fixpoint). Round 1 needs no
    # labels join at all — joining identity labels on dst reduces to
    # min(dst) over prop directly, so the init labels table is never
    # materialized (r6; two fewer fixed jobs per clustering query, same
    # label trajectory round-for-round).
    prev = obs_p.get["s0"]
    labels = None
    for _ in range(max_rounds):
        # the convergence checksum rides the checkpoint materialization as
        # an observed metric — one job per round, not two
        obs = Observation()
        if labels is None:
            nxt = prop.groupBy("src").agg(F.min("dst").alias("component"))
        else:
            lab = F.broadcast(labels) if bcast else labels
            nxt = (
                prop.join(lab, prop["dst"] == lab["id"])
                .groupBy("src")
                .agg(F.min("component").alias("component"))
            )
        labels = (
            nxt.select(F.col("src").alias("id"), "component")
            .observe(
                obs,
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        cur = obs.get["s"]
        if cur == prev:
            break
        prev = cur
    if labels is None:  # max_rounds == 0: supernode identity — every
        # node still maps through the contraction below, i.e. gets
        # label min(N(u) ∪ {u}), NOT label u (the contraction prepass
        # counts as one propagation hop; see the docstring)
        labels = supernodes.select("id", F.col("id").alias("component"))
    # map every original node through its supernode's final label
    lab = F.broadcast(labels) if bcast else labels
    return m.join(lab, m["m"] == lab["id"]).select(
        m["id"].alias("id"), "component"
    )


def _star_checksum(down: DataFrame):
    """(row count, order-independent hash-sum) — equal checksums on the
    canonical big→small edge set mean the round was a no-op."""
    row = down.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(F.col("src"), F.col("dst")).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _labels_by_star(
    nodes: DataFrame, edges: DataFrame, max_rounds: int
) -> tuple[DataFrame, int]:
    # canonical DOWN edges: src > dst, one row per undirected edge
    down = (
        _symmetric(edges)
        .where(F.col("src") > F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _star_checksum(down)
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        # -- large-star: hang every strictly-larger neighbor under the
        #    neighborhood min m(u) = min(N(u) ∪ {u})
        sym = down.unionAll(
            down.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        m = sym.groupBy("src").agg(F.min("dst").alias("mn")).select(
            "src", F.least(F.col("mn"), F.col("src")).alias("m")
        )
        down = (
            sym.where(F.col("dst") > F.col("src"))
            .join(m, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") > F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # -- small-star: re-hang the smaller neighbors (and u itself)
        #    under m(u) = min of u's smaller neighbors
        ms = down.groupBy("src").agg(F.min("dst").alias("m"))
        hang_children = (
            down.join(ms, "src")
            .where(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        hang_self = ms.select("src", F.col("m").alias("dst"))
        down = (
            hang_children.unionAll(hang_self)
            .where(F.col("src") > F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        cur = _star_checksum(down)
        if cur == prev:
            break
        prev = cur
    # fixpoint is a forest of stars: every non-root points at its
    # component min; isolated nodes label themselves
    labels = (
        nodes.select("id")
        .join(down, nodes["id"] == down["src"], "left")
        .select(
            "id", F.coalesce(F.col("dst"), F.col("id")).alias("component")
        )
    )
    return labels, rounds


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    mode: str = "label",
    max_rounds: int = 100,
    return_rounds: bool = False,
):
    """→ (id, component) with component = min node id in the component.

    ``nodes`` needs an ``id`` column (every vertex, including isolated
    ones); ``edges`` needs ``src``/``dst``, and every edge endpoint must
    be present in ``nodes`` (all in-repo callers derive edges from the
    node table, so this holds by construction; the label mode's
    contraction prepass would otherwise adopt a foreign endpoint id as
    a component label). ``mode="label"`` converges in diameter rounds
    (near-dup graphs; the min-neighbor contraction prepass counts as
    one hop, so ``max_rounds`` bounds the rounds AFTER it);
    ``mode="star"`` in O(log² n) rounds for ANY graph shape (the
    10^10-scale default)."""
    if mode == "label":
        labels = _labels_by_propagation(nodes, edges, max_rounds)
        return (labels, None) if return_rounds else labels
    if mode == "star":
        labels, rounds = _labels_by_star(nodes, edges, max_rounds)
        return (labels, rounds) if return_rounds else labels
    raise ValueError(f"unknown mode: {mode!r} (label | star)")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 5,
    damp_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """General PageRank over an arbitrary directed (src, dst) edge list
    — the crawl-priority signal, generalized from the fixed-outdegree
    variant the ``pagerank`` query pair pins (queries.q_pagerank; on
    that graph the two produce IDENTICAL ranks, pytest-asserted).

    INTEGER-EXACT like its sibling: ranks are bigints in units of
    1/scale, every contribution ``pr * damp_pct div (100 * outdeg)``
    is associative, so results are bit-identical at any parallelism.
    Scale shape: outdegrees are ONE groupBy over the edges (computed
    once, localCheckpointed); each iteration is one edges⋈ranks
    equi-join + groupBy-sum — |E| rows through one shuffle — with
    lineage truncated per round. Dangling nodes (no out-edges)
    contribute nothing (the crawl-frontier convention: an unexpanded
    page holds its rank mass).

    Returns (id, pr) — feed ``pr`` to ``CrawlEngine`` as
    ``priority_scores`` (highest drains first)."""
    n = nodes.count()
    base = scale // n
    base_hold = (100 - damp_pct) * base // 100
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = (
        edges.join(deg, "src")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )
    r = nodes.select(
        "id", F.lit(base).cast("bigint").alias("pr")
    )
    for _ in range(iters):
        # same rounding ORDER as q_pagerank (pr div outdeg summed, damped
        # after the sum) so the two are bit-identical where they overlap
        contrib = e.join(r, e["src"] == r["id"]).select(
            "dst", F.expr("pr div outdeg").alias("c")
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("sc"))
        r = (
            nodes.join(sums, nodes["id"] == sums["dst"], "left")
            .select(
                "id",
                (
                    F.lit(base_hold)
                    + F.expr(f"coalesce(sc, 0L) * {damp_pct} div 100")
                )
                .cast("bigint")
                .alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return r
