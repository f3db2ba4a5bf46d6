"""Connected components via label propagation — the GraphX-style analytics
layer over the engine's edge relation (BASELINE.json north star: "GraphX for
analytics queries", re-expressed as DataFrame rounds).

Each round every node takes the min label in its closed neighborhood; after
``rounds`` ≥ graph diameter the labels are exactly the per-component minimum
node id (classic synchronous label propagation — the Pregel loop GraphX
ships, as a join + aggregate per round).

Scale design: per round the work is ONE |E| join + one |V| aggregate — no
transitive closure is ever materialized, so hub nodes cause no row
explosion. (Each round does pay its own exchanges: a checkpointed label
relation exposes no partitioning for Catalyst to reuse — see the k_core
pin note.) With ``rounds=None`` the loop probes convergence instead of
trusting a diameter guess: each round's labels are checkpointed anyway, so
the changed-label count is one cheap job over in-memory blocks, and the
loop exits the first round nothing changes — exact components on any graph,
bounded by ``max_rounds`` as a runaway guard. Fixed ``rounds`` remains for
oracle replay (the DuckDB gate unrolls the same number of CTE rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def label_propagation_components(
    edges: DataFrame,
    *,
    rounds: int | None,
    directed: bool = False,
    max_rounds: int = 200,
    probe_from: int = 2,
    copartition: bool = True,
) -> DataFrame:
    """(node_id, component) labels from synchronous min-label propagation.

    ``rounds``: fixed iteration count — component = min node id reachable
    within that many hops, exact once ``rounds`` ≥ diameter (replayable by
    an oracle that unrolls the same rounds). ``rounds=None``: iterate until
    no label changes (exact components on any graph; stops after diameter+1
    rounds, capped at ``max_rounds``).

    ``edges``: (parent_id, child_id); treated as undirected unless
    ``directed`` (components of the underlying undirected graph is the
    standard CC semantics). With ``directed=True`` labels only flow
    edge-forward; nodes appearing solely as dst still get a label row.
    """
    fwd = edges.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    )
    und = fwd if directed else fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # ``copartition``: hash-partition on src before caching — the
    # InMemoryRelation keeps its outputPartitioning, so every round's
    # label join reuses the cached layout instead of re-shuffling |E|
    # per round (same co-location move as pagerank_rounds; A/B-measured
    # there). Callers feeding a provably-tiny relation (the union-find
    # contraction finisher) pass False: a 32-way exchange + 32 tasks per
    # round on a few hundred contracted edges is pure overhead
    # (interleaved A/B on dedup_clusters: ~0.3s slower with it).
    und = und.distinct()
    if copartition:
        parts = edges.sparkSession.sparkContext.defaultParallelism
        und = und.repartition(parts, "src")
    und = und.persist()
    node_ids = und.select(F.col("src").alias("node_id"))
    if directed:
        # sink nodes appear only as dst — they still need label rows
        node_ids = node_ids.unionByName(und.select(F.col("dst").alias("node_id")))
    labels = node_ids.distinct().withColumn("component", F.col("node_id"))
    probe = rounds is None
    n_rounds = max_rounds if probe else rounds
    for r in range(n_rounds):
        # labels flow src -> dst (edge-forward); for the symmetrized
        # undirected relation this is identical to the reverse orientation
        neigh = (
            und.join(
                labels.select(
                    F.col("node_id").alias("src"), F.col("component").alias("nl")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("nl").alias("nl"))
            .withColumnRenamed("dst", "node_id")
        )
        nxt = (
            labels.join(neigh, "node_id", "left")
            .select(
                "node_id",
                F.col("component").alias("prev"),
                F.least(
                    "component", F.coalesce("nl", F.col("component"))
                ).alias("component"),
            )
        )
        # labels virtually always change in the first rounds — skip those
        # probe aggregates (exactness unaffected: propagation past
        # convergence is the identity, the loop just exits at the next
        # probe). ``probe_from`` lets callers that feed an already-
        # contracted graph probe from round 0, where the first round
        # usually IS the fixed point. The probe RIDES the checkpoint
        # job via observe() (one job per round, not checkpoint + a
        # second changed-count scan); an over-count under task retries
        # only delays exit by a no-op round, an under-count cannot
        # happen, so convergence stays exact.
        do_probe = probe and r >= probe_from
        if do_probe:
            from pyspark.sql import Observation

            obs = Observation()
            nxt = nxt.observe(
                obs,
                F.sum(
                    (F.col("component") != F.col("prev")).cast("long")
                ).alias("changed"),
            )
        nxt = nxt.localCheckpoint(eager=True)  # one round computed once
        labels = nxt.select("node_id", "component")
        if do_probe and (obs.get["changed"] or 0) == 0:
            break
    und.unpersist()
    return labels


def pagerank_rounds(
    edges: DataFrame,
    *,
    rounds: int | None,
    scale: int = 1_000_000,
    damping_pct: int = 85,
    max_rounds: int = 200,
) -> DataFrame:
    """Fixed-point integer PageRank: synchronous iterations with ranks held
    as BIGINT multiples of 1/``scale`` and integer-division contributions —
    every engine computes bit-identical ranks (no float summation order),
    which is what makes the result oracle-comparable.

    ``rounds``: fixed iteration count (oracle-replayable). ``rounds=None``:
    iterate until the integer ranks reach their exact fixed point (no rank
    changes between rounds — integer arithmetic converges exactly, unlike
    float PageRank), capped at ``max_rounds``.

    Per round: one |E| join (contribution = rank div out-degree), one |V|
    aggregate — same shuffle shape as the Pregel PageRank GraphX ships.
    Dangling mass is dropped (nodes with no outgoing edges contribute
    nothing), the common simplification for bounded-round analytics.

    The edge cache is hash-partitioned on ``src`` BEFORE persisting:
    unlike a localCheckpoint, an InMemoryRelation keeps its
    outputPartitioning, so every round's contribution join and the
    out-degree aggregate reuse the cached layout instead of re-shuffling
    |E| per round — the standard co-location move for iterative graph
    jobs (interleaved A/B at sf0.1: ~1.4x faster, identical ranks; at
    corpus scale it removes rounds x |E| shuffle traffic).
    """
    parts = edges.sparkSession.sparkContext.defaultParallelism
    e = edges.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    ).distinct().repartition(parts, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    probe = rounds is None
    n_rounds = max_rounds if probe else rounds
    for _ in range(n_rounds):
        contrib = (
            e.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
            .withColumnRenamed("dst", "node_id")
        )
        nxt = (
            ranks.join(contrib, "node_id", "left")
            .select(
                "node_id",
                F.col("rank").alias("prev"),
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(in_sum, 0)) div 100")
                ).cast("long").alias("rank"),
            )
        )
        # the fixed-point probe rides the checkpoint job via observe()
        # (one job per round; see label_propagation_components)
        if probe:
            from pyspark.sql import Observation

            obs = Observation()
            nxt = nxt.observe(
                obs,
                F.sum((F.col("rank") != F.col("prev")).cast("long")).alias(
                    "changed"
                ),
            )
        nxt = nxt.localCheckpoint(eager=True)
        stable = probe and (obs.get["changed"] or 0) == 0
        ranks = nxt.select("node_id", "rank")
        if stable:
            break
    e.unpersist()
    return ranks


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts — the third canonical graph
    analytic next to components/PageRank (GraphX ``triangleCount``).

    Each triangle is enumerated exactly once as e(a,b) ⋈ e(b,c) ⋈
    e(a,c) over DEGREE-ORDERED oriented edges — two equi-joins, no
    wedge ever materialized twice. Every node of the input edge set
    gets a row (0 if triangle-free).

    Orientation (round 10): edges point from the lower to the higher
    endpoint under the total order (degree, id) — the classic
    degree-ordered orientation (Chiba–Nishizeki / Schank–Wagner): the
    wedge join's cost is Σ out-deg(v)² and orienting toward the
    higher-degree endpoint caps every out-degree by O(√m) (more
    precisely by the graph's arboricity-class bound), so hub nodes
    stop dominating — the previous id-ordered orientation left a hub's
    full degree on the out side and cost Σ deg(v)² (the sf1-class
    scaling leg measured that blow-up at 559s full compute;
    SCALING_R10.md holds the after numbers). The triangle SET is
    orientation-independent, so the result — and the oracle — are
    unchanged; the extra work is one degree aggregate + two joins to
    attach degrees before orienting, below the pinned edge relation.
    """
    und = edges.select(
        F.least("parent_id", "child_id").alias("u"),
        F.greatest("parent_id", "child_id").alias("v"),
    ).filter(F.col("u") != F.col("v")).distinct()
    # total order (degree, id): one symmetric-degree aggregate over the
    # deduped undirected edges, attached to both endpoints
    deg = (
        und.select(F.col("u").alias("n"))
        .unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    keyed = (
        und.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # eager localCheckpoint, NOT persist: the returned frame is lazy, and
    # the previous persist() was unpersisted before the caller's action
    # ever ran, so the cache never substituted and the edge pipeline
    # re-executed once per reference (4x — a latent round-9 bug this
    # round's plan pin now catches: the enumeration plan must carry NO
    # joins below the pinned edge relation)
    e = keyed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("u"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("v"),
    ).localCheckpoint(eager=True)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # one explode, not a 3-branch union: Catalyst does not share common
    # subtrees across union branches, so the union formulation executed
    # the two-join triangle enumeration THREE times (round-9 plan audit:
    # 3 copies of the join tree, noop-timed 8.1s -> 3.7s at sf0.1 with
    # identical output). explode(array(a,b,c)) feeds the same partial
    # aggregation from a single copy of the join.
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("u").alias("node_id"))
        .unionByName(e.select(F.col("v").alias("node_id")))
        .distinct()
    )
    return nodes.join(per_node, "node_id", "left").select(
        "node_id",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )


def star_components(
    edges: DataFrame,
    *,
    max_rounds: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14): converges in O(log^2 n) rounds REGARDLESS of diameter, where
    min-label propagation needs diameter rounds — a path graph of length
    10^6 takes ~20 star rounds vs 10^6 propagation rounds.

    - large-star: every node u links each strictly-larger neighbor to the
      minimum of its closed neighborhood m(u);
    - small-star: every node u re-links its ≤-neighbors (its parents in
      the forming forest) to m over that subset.

    Both are ONE groupBy + generate per round over the current edge set;
    the edge set only shrinks toward the final star forest (one hub = the
    component's min node). Output: (node_id, component), identical to
    :func:`label_propagation_components`'s converged labels.
    """
    # symmetrize, drop self-loops, orient as unordered pairs
    fwd = edges.select(
        F.col("parent_id").alias("u"), F.col("child_id").alias("v")
    )
    sym = fwd.unionByName(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    e = (
        sym.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # node universe comes from the PRE-self-loop-filter edge set: a node
    # whose only edges are self-loops still gets a (node, node) output row,
    # matching label_propagation_components' converged labels
    all_nodes = sym.select(F.col("u").alias("node_id")).distinct().localCheckpoint(
        eager=True
    )

    def _star(cur: DataFrame, large: bool) -> DataFrame:
        # group the symmetric neighbor lists once per round
        neigh = cur.groupBy("u").agg(
            F.min("v").alias("mn"), F.collect_set("v").alias("nbrs")
        )
        m = F.least("u", "mn")
        # large-star re-links the strictly-larger neighbors; small-star
        # re-links the ≤-neighbors AND u itself (dropping u here loses the
        # u—m edge and disconnects the forming star)
        side = (
            F.expr("filter(nbrs, x -> x > u)")
            if large
            else F.expr("array_union(filter(nbrs, x -> x <= u), array(u))")
        )
        out = (
            neigh.select(m.alias("m"), F.explode(side).alias("v"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # keep symmetry for the next grouping pass
        return (
            out.unionByName(
                out.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

    for _ in range(max_rounds):
        nxt = _star(_star(e, large=True), large=False)
        # fixed point: identical symmetric edge sets
        if (
            nxt.count() == e.count()
            and nxt.exceptAll(e).limit(1).count() == 0
        ):
            e = nxt
            break
        e = nxt

    # converged: each component is a star around its min node; a node's
    # component is its min neighbor (or itself if it IS the hub / isolated)
    comp = (
        e.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select(F.col("u").alias("node_id"), F.least("u", "mn").alias("component"))
    )
    return all_nodes.join(comp, "node_id", "left").select(
        "node_id", F.coalesce("component", "node_id").alias("component")
    )


def contraction_pass(rel: DataFrame) -> DataFrame:
    """One union-find contraction level: a (src, dst) edge relation in, a
    (src=root, dst=node) star relation out — ONE MapInPandas over the
    input's existing partitioning, no exchange (plan-pinned). The closure
    pickles by value, so no worker-side package import is needed."""
    from pyspark.sql.types import StructField, StructType

    node_type = rel.schema["src"].dataType
    star_schema = StructType(
        [StructField("src", node_type), StructField("dst", node_type)]
    )

    def _contract(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = parent.setdefault(x, x)
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for pdf in batches:
            for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        nodes = list(parent)
        # (root, node) stars; roots emit their (root, root) row too, so
        # the node universe survives every level intact
        yield pd.DataFrame(
            {"src": [find(n) for n in nodes], "dst": nodes}
        )

    return rel.mapInPandas(_contract, schema=star_schema)


def contracted_components(
    edges: DataFrame,
    *,
    contraction_levels: int = 3,
    fanin: int = 16,
    max_rounds: int = 200,
) -> DataFrame:
    """Connected components via partition-local union-find contraction —
    the "local sequential step" of large-scale CC systems (Kiveris et al.,
    SoCC'14 §4 use the same idea to cut rounds) — finished by
    convergence-probed min-label propagation on the contracted graph.

    Phase 1 (per level): ONE Arrow pass over the raw edge partitions —
    union-find needs neither symmetry nor dedup, so unlike the
    propagation loop the input is never shuffled first. Each partition
    union-finds the edges it holds (min-id roots, path-compressed) and
    emits its components as (root, node) stars. Replacing a partition's
    edges by a star over the same nodes
    preserves connectivity, so the union of stars across partitions has
    exactly the input's components — but every within-partition path is
    now ≤2 hops. Each level feeds its stars to the next with ``fanin``×
    fewer partitions (a shuffle-free ``coalesce``), so level 2 sees most
    of a component's stars in one task and collapses the cross-partition
    chains as well.

    Phase 2: :func:`label_propagation_components` with ``rounds=None,
    probe_from=0`` over the final star relation. On typical graphs the
    contraction has already converged and the loop exits at the first
    probe; on adversarial layouts (a chain whose every edge landed in a
    different partition) it simply runs the remaining rounds — exactness
    NEVER depends on the contraction having finished the job.

    Output: (node_id, component), component = global min node id —
    identical to :func:`label_propagation_components` (roots are
    per-partition minima; the finisher takes the global min). Undirected
    semantics only.

    Scale: union-find state is one dict entry per DISTINCT node in the
    task's input and never leaves the executor — no driver collect, no
    broadcast, no assumption the graph fits anywhere whole. Arrow
    batches stream through the pass; only the node dict is resident.
    ``fanin`` is therefore a memory knob, not just a round knob: a
    level-k task sees at most ``fanin`` level-(k-1) partitions' star
    rows, so its dict is bounded by ``fanin`` × nodes-per-partition
    (less when partitions share nodes, which is the whole point). Keep
    it modest on node-dense graphs and let the probed finisher absorb
    whatever the contraction didn't collapse — exactness never depends
    on the contraction converging. Where min-label propagation pays
    diameter rounds of |E| shuffle each, this pays 2 map-side passes +
    the few rounds the contracted graph still needs.
    """
    fwd = edges.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    )
    # Python's None is not orderable inside the union-find: a half-null
    # edge collapses to a self-loop so its real endpoint still gets its
    # singleton label row (matching the propagation loop, which keeps
    # such nodes in the universe; only the degenerate all-null row —
    # which propagation emits and contraction doesn't — differs)
    fwd = fwd.filter(
        F.col("src").isNotNull() | F.col("dst").isNotNull()
    ).select(
        F.coalesce("src", "dst").alias("src"),
        F.coalesce("dst", "src").alias("dst"),
    )
    # level 0 runs on the input's own partitioning; each further level
    # coalesces fanin× and re-contracts, STOPPING EARLY once the star
    # relation fits one partition (that task union-finds the whole
    # contracted graph, so the finisher exits at its first probe). The
    # early exit matters both ways: a single-partition input skips the
    # extra levels entirely, and a small graph arriving in many
    # partitions (e.g. pairs derived from a 32-way-parallelized build —
    # the round-8 dedup_clusters regression: 2.3 → 4-6s when the minhash
    # fold went 32-wide) collapses fully instead of leaving
    # cross-partition chains to diameter-priced finisher rounds. The
    # localCheckpoint makes getNumPartitions a metadata read, and
    # ``contraction_levels`` still caps the pass count at scale (a
    # 1000-partition corpus stops at 1000 → 63 → 4, each task's
    # union-find dict fanin-bounded exactly as before).
    cur = fwd
    if contraction_levels > 0:
        cur = contraction_pass(cur).localCheckpoint(eager=True)
        for _ in range(1, contraction_levels):
            n_parts = cur.rdd.getNumPartitions()
            if n_parts <= 1:
                break
            cur = contraction_pass(
                cur.coalesce(max(1, n_parts // fanin))
            ).localCheckpoint(eager=True)
        # Exactness shortcut: mapInPandas is partition-preserving, so the
        # checkpointed star relation has exactly its pass's input
        # partition count — if that is ONE, the last union-find task saw
        # every edge of the (contracted) graph and its per-task min-id
        # roots ARE the global components. The finisher would symmetrize,
        # persist and probe one propagation round just to confirm the
        # fixed point; skip it and emit the stars as labels directly
        # ((root, node) rows cover every node exactly once, roots
        # included). The condition is checked mechanically at runtime —
        # a multi-partition relation still takes the probed finisher, so
        # exactness never rests on the contraction having converged.
        # Assumption (ADVICE r9): node ids must order identically under
        # Python's `<` (the union-find's min-root choice) and Spark's
        # ordering (the finisher's F.min) for the two branches to agree —
        # true for the integral/string ids every caller feeds; a float
        # graph with NaN ids or mixed-type ids is outside the contract.
        if cur.rdd.getNumPartitions() == 1:
            return cur.select(
                F.col("dst").alias("node_id"), F.col("src").alias("component")
            )
    return label_propagation_components(
        cur.select(
            F.col("src").alias("parent_id"), F.col("dst").alias("child_id")
        ),
        rounds=None,
        max_rounds=max_rounds,
        probe_from=0,
        copartition=False,  # contracted relation is tiny by construction
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    rounds: int,
    scale: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Random-walk-with-restart scores relative to a seed set: identical
    loop to :func:`pagerank_rounds`, but the teleport mass lands ONLY on
    the seeds — the similarity ranking "which nodes does a walk from THESE
    nodes keep reaching" (recommendation / related-documents queries over
    the near-dup or citation graph).

    Integer fixed-point like the global variant (bit-identical on any
    engine); ``seeds`` is a (node_id) frame, broadcast into the base-term
    join. Fixed ``rounds`` for oracle replay. The edge cache is
    hash-partitioned on ``src`` before persisting so each round's
    contribution join reuses the cached layout (see
    :func:`pagerank_rounds`).
    """
    parts = edges.sparkSession.sparkContext.defaultParallelism
    e = edges.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    ).distinct().repartition(parts, "src").persist()
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    seed_flag = seeds.select(F.col("node_id")).distinct().withColumn(
        "__is_seed", F.lit(True)
    )
    nodes = nodes.join(F.broadcast(seed_flag), "node_id", "left").select(
        "node_id", F.coalesce("__is_seed", F.lit(False)).alias("is_seed")
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    base = (100 - damping_pct) * scale // 100
    base_col = F.when(F.col("is_seed"), F.lit(base)).otherwise(F.lit(0))
    ranks = nodes.withColumn(
        "rank", F.when(F.col("is_seed"), F.lit(scale)).otherwise(F.lit(0)).cast("long")
    )
    for _ in range(rounds):
        contrib = (
            e.join(ranks.withColumnRenamed("node_id", "src"), "src")
            .join(outdeg, "src")
            .select("dst", F.expr("rank div outdeg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
            .withColumnRenamed("dst", "node_id")
        )
        ranks = (
            ranks.drop("rank")
            .join(contrib, "node_id", "left")
            .select(
                "node_id", "is_seed",
                (
                    base_col
                    + F.expr(f"({damping_pct} * coalesce(in_sum, 0)) div 100")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks.select("node_id", "rank")


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    max_depth: int,
    broadcast_rows: int = 500_000,
) -> DataFrame:
    """Multi-source BFS: (node_id, depth) = fewest hops from ANY seed,
    following edges parent→child, for every node within ``max_depth``.

    The frontier loop is the traversal primitive behind reachability
    closures (reference `descendants`, assemblage_db/src/lib.rs:695-797)
    generalized to shortest-hop depth over a seed SET. Per round: one
    frontier⋈edges equi-join + an anti-join against the settled set
    (cycle-safe — a revisited node is never re-expanded, ``lib.rs:703-707``
    visited-set analogue), so round r costs |frontier_r ⋈ E|, never |V|².
    Seeds report depth 0; a node reachable at several depths reports the
    minimum (BFS invariant: first visit is shallowest).

    Join strategy is chosen from the loop's OWN runtime statistics: the
    settled union is counted every round anyway (the convergence probe),
    so the exact frontier and settled sizes are known before each join is
    planned. While they fit a broadcast (``broadcast_rows``, ~tens of MB
    of node ids), the frontier side of the expansion join and the settled
    side of the anti-join are broadcast — the edge relation is never
    shuffled for a small frontier. Past the bound the hints are simply
    not attached and both joins fall back to shuffles: the hub-explosion
    regime keeps the shuffle plan, a thin frontier (the common BFS tail)
    never pays it. Identical output either way — the hints move bytes,
    not semantics.
    """
    fwd = edges.select(
        F.col("parent_id").alias("src"), F.col("child_id").alias("dst")
    )
    from pyspark.sql import Observation

    # the settled-count probe rides each checkpoint job via observe()
    # (one job per round instead of checkpoint + count; see
    # label_propagation_components for the retry-safety argument)
    obs = Observation()
    settled = (
        seeds.select("node_id").distinct()
        .withColumn("depth", F.lit(0).cast("long"))
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_settled = obs.get["n"] or 0
    frontier_n = n_settled
    for d in range(1, max_depth + 1):
        # one checkpoint per round: the settled∪frontier union is pinned
        # and the next frontier is a cheap filter over its in-memory
        # blocks (depth == d-1), so neither the frontier nor the union is
        # ever recomputed from lineage
        frontier = settled.filter(F.col("depth") == d - 1).select(
            F.col("node_id").alias("src")
        )
        if frontier_n <= broadcast_rows:
            frontier = F.broadcast(frontier)
        anti = settled.select("node_id")
        if n_settled <= broadcast_rows:
            anti = F.broadcast(anti)
        nxt = (
            fwd.join(frontier, "src")
            .select(F.col("dst").alias("node_id"))
            .distinct()
            .join(anti, "node_id", "left_anti")
            .withColumn("depth", F.lit(d).cast("long"))
        )
        obs = Observation()
        merged = (
            settled.unionByName(nxt)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_new = obs.get["n"] or 0
        if n_new == n_settled:
            break
        frontier_n = n_new - n_settled
        n_settled = n_new
        settled = merged
    return settled


def _symmetrized(edges: DataFrame) -> DataFrame:
    """Both orientations of (parent_id, child_id) in ONE input scan —
    explode emits the forward and reverse row per edge, so the map side
    reads the edge relation once (a two-branch union scans it twice);
    self-loops dropped."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("parent_id").alias("u"),
                        F.col("child_id").alias("v"),
                    ),
                    F.struct(
                        F.col("child_id").alias("u"),
                        F.col("parent_id").alias("v"),
                    ),
                )
            ).alias("uv")
        )
        .select("uv.u", "uv.v")
        .filter(F.col("u") != F.col("v"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 100,
    assume_distinct: bool = False,
    broadcast_max_alive: int = 2_000_000,
) -> DataFrame:
    """The k-core of the undirected simple graph: iteratively peel every
    node whose current degree is below ``k`` (all at once per round) until
    the surviving subgraph is stable. Output: (node_id, degree) for core
    members, with degree counted INSIDE the core — the densest-region
    extractor used for community seeds and hub detection (the GraphX
    ``connectedComponents``-family analytic Spark itself never shipped).

    The per-round STATE is the alive-node set, not the edge set: the
    symmetrized edge relation is checkpointed ONCE and stays static; each
    round recomputes alive-restricted degrees with one semi-join + one
    aggregate over it and shrinks the (much smaller) alive set. Rewriting
    and re-pinning the full edge set every round — the naive formulation —
    costs an |E| materialization per round and was measured 2× slower at
    sf0.1. The loop convergence-probes (a round that drops nobody ends
    it), bounded by ``max_rounds``; the SQL oracle unrolls a fixed round
    count past measured convergence, which matches because peeling is
    monotone (once stable, further rounds are identity).

    ``assume_distinct``: the input rows are already distinct DIRECTED
    edges and no reverse duplicate exists (e.g. a typed hierarchy where
    parent and child id spaces are disjoint) — skips the symmetrized
    3-way distinct, which is otherwise the single most expensive shuffle
    of the whole job (measured ~half the sf0.1 wall time).

    ``broadcast_max_alive``: the alive set shrinks monotonically but
    starts near |V|; for small ``k`` it may never get small. Each round
    already counts the alive set exactly (the convergence probe), so the
    semi-joins broadcast only while ``n_alive <= broadcast_max_alive``
    (~2M longs ≈ tens of MB — safely under executor/driver broadcast
    limits) and otherwise fall back to a shuffle semi-join that reuses
    ``e``'s hash partitioning on ``u``. At 100 TB the early
    nearly-full-V rounds shuffle; the long tail of shrinking rounds
    broadcasts.
    """
    sym = _symmetrized(edges)
    if not assume_distinct:
        sym = sym.distinct()
    # compact into defaultParallelism balanced blocks before pinning.
    # What this buys (interleaved A/B at sf0.1): every round scans fewer,
    # even-sized in-memory blocks than the raw input layout (~15% total).
    # What it does NOT buy: Catalyst never reuses the hash partitioning —
    # a groupBy/join over repartition(key).localCheckpoint still plans an
    # Exchange (checkpointed blocks expose no partitioning; verified).
    # Keyed, not round-robin: repartition(n) without a key adds a
    # determinism sort to every map task, measured slower than the
    # hash-keyed write.
    parts = edges.sparkSession.sparkContext.defaultParallelism
    e = sym.repartition(parts, "u").localCheckpoint(eager=True)
    # round 0 runs on the full node set, so the plain degree aggregate IS
    # the alive-restricted degree — no semi-joins, and the node set never
    # needs its own distinct pass
    alive = (
        e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= k)
        .select(F.col("u").alias("node_id"))
        .localCheckpoint(eager=True)
    )
    n_alive = alive.count()

    def _alive_restrict(edge_rel: DataFrame, alive_rel: DataFrame,
                        n: int) -> DataFrame:
        # a dead endpoint cannot revive (its row is dropped by the
        # semi-join); broadcast only when the alive set is provably small
        # (n is the exact count from the convergence probe), else let the
        # planner run a shuffle semi-join
        small = n <= broadcast_max_alive
        v_side = alive_rel.select(F.col("node_id").alias("v"))
        u_side = alive_rel.select(F.col("node_id").alias("u"))
        if small:
            v_side, u_side = F.broadcast(v_side), F.broadcast(u_side)
        return (
            edge_rel.join(v_side, "v", "left_semi")
            .join(u_side, "u", "left_semi")
        )

    converged = False
    for _ in range(max_rounds - 1):
        # degree counting only edges whose far endpoint is still alive
        deg = (
            _alive_restrict(e, alive, n_alive)
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        nxt = (
            deg.filter(F.col("deg") >= k)
            .select(F.col("u").alias("node_id"))
            .localCheckpoint(eager=True)
        )
        m = nxt.count()
        if m == n_alive:
            converged = True
            break
        alive, n_alive = nxt, m
    if not converged and n_alive > 0:
        # an unconverged peel would silently return a superset of the
        # core (some returned degrees below k) — fail loudly instead
        raise RuntimeError(
            f"k_core: peeling did not stabilize within max_rounds="
            f"{max_rounds}; raise max_rounds (each round peels at least "
            "one node, so |V| rounds always suffice)"
        )
    return (
        _alive_restrict(e, alive, n_alive)
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .withColumnRenamed("u", "node_id")
    )


# rewrite-vs-tail pivot for k_core_delta: a rewrite round moves
# O(n_alive) rows through one shuffle+sort+pin, a tail round touches
# ≤ Σ edeg(frontier) candidate rows through broadcast joins (both pay
# the flat edge scan) — switch to tail rounds once the candidate
# fringe is this factor smaller than the alive table
_KCORE_TAIL_FACTOR = 8


def k_core_delta(
    edges: DataFrame,
    k: int,
    *,
    max_rounds: int = 100,
    assume_distinct: bool = False,
    broadcast_max_dead: int = 2_000_000,
) -> DataFrame:
    """Frontier-delta formulation of :func:`k_core` (parity-tested
    equivalent): instead of re-scanning the full alive-restricted edge
    set every round, maintain a degree table and propagate only the
    DELTAS — each round joins the edge set against the nodes that died
    LAST round and decrements their surviving neighbors' degrees.

    Cost shape per round: |dead_frontier ⋈ E| (frontier-bounded, like
    BFS) plus an O(|V_alive|) degree-table rewrite — vs the simultaneous
    peel's O(|E_alive|) rescan. On graphs where peeling runs many rounds
    and each round kills few nodes (the long-tail regime at corpus
    scale, where |E| >> |V|), the delta form does asymptotically less
    work; the gated query (`graph_kcore`) runs THIS formulation, with
    :func:`k_core` kept as the simpler reference both are parity-pinned
    against (the same coexistence as label-prop vs
    :func:`star_components`).

    A node dies exactly once (new deaths are computed among the alive
    set only), so each edge to a dead endpoint is decremented exactly
    once and the final degree equals the degree within the surviving
    core — identical output columns (node_id, degree).

    ``broadcast_max_dead``: the convergence probe counts each round's
    dead frontier exactly, so the frontier join broadcasts the dead
    side only while ``n_dead <= broadcast_max_dead`` (~2M ids ≈ tens of
    MB) and otherwise lets the planner shuffle — the same guarded
    pattern as :func:`k_core`'s ``broadcast_max_alive``. Without the
    hint the checkpointed edge blocks expose no partitioning, so the
    round-0 frontier join (the one big frontier: every initially-
    under-k node) re-shuffles the FULL edge relation; broadcasting the
    frontier keeps every round's scan exchange-free (interleaved A/B at
    sf0.1: ~8.6s → ~5.4s end to end, identical output).

    Round-10 restructure (measured round anatomy at sf0.1: the
    O(|V_alive|) shuffle+sort+re-pin of the degree table cost
    0.65–1.0 s/round even for a 40-node frontier, while the frontier
    work itself was milliseconds): the loop now runs two round shapes,
    chosen per round from its OWN runtime statistics. While the dying
    fringe is of the same order as the table (``Σ edeg(frontier) ·
    _KCORE_TAIL_FACTOR > n_alive``, e.g. the first peel of a
    leaf-heavy graph where half of V dies at once), a REWRITE round
    re-pins the alive degree table — the old shape, optimal when most
    rows change. Once the fringe is an order smaller (the long
    shrinking-frontier tail, the common peel profile), a TAIL round
    pins ONE candidate table — ``(u, deg, edeg, dec)`` for the ≤ Σ
    edeg(frontier) nodes adjacent to the frontier — built from
    broadcast joins over pinned blocks only: current degree =
    ``base.deg − Σ tail decs``, and decrements only lower it, so a
    node dead once stays dead with no dead-set bookkeeping. ``edeg``
    (each node's degree in the STATIC symmetrized edge relation) rides
    along through rewrites because ``Σ edeg(frontier)`` — returned by
    each round's single probe aggregate, together with the frontier
    count — is an EXACT upper bound on the next round's candidate
    count: every broadcast is gated on it BEFORE the round is planned
    (the same runtime-stats-guard pattern as :func:`bfs_depth`), and
    past ``broadcast_max_dead`` the loop simply consolidates with a
    rewrite round. Candidates already dead before a tail round are
    dropped from its pinned table: their accumulated decrements put
    them permanently under k at their death round, so the final ≥ k
    filter never resurrects them and no later round consults their
    cum. At 100 TB the tail — however long — pays O(|frontier
    neighborhood|) per round plus the flat edge scan, never
    rounds × |V|."""
    sym = _symmetrized(edges)
    if not assume_distinct:
        sym = sym.distinct()
    # balanced-block pin, keyed on v — same physical story as k_core's
    # pin (balanced blocks help every round's scan; Catalyst cannot
    # reuse the partitioning itself; keyed beats round-robin's
    # determinism sort — all three A/B-measured at sf0.1)
    parts = edges.sparkSession.sparkContext.defaultParallelism

    def _pin_e() -> DataFrame:
        return sym.repartition(parts, "v").localCheckpoint(eager=True)

    from pyspark.sql import Observation

    dead0 = F.col("deg") < k

    def _probe_aggs():
        # frontier count, Σ edeg over it (the broadcast-safety bound for
        # the next candidate set), and the alive count (the rewrite-vs-
        # tail pivot). Rides the pin job via observe() — no separate
        # probe scan; retry over-counts only push the guards toward the
        # conservative (shuffle / rewrite) branch
        return (
            F.sum(dead0.cast("long")).alias("n_front"),
            F.sum(F.when(dead0, F.col("edeg"))).alias("bound"),
            F.sum((~dead0).cast("long")).alias("n_alive"),
        )

    def _pin_base(src: DataFrame) -> tuple[DataFrame, "Observation"]:
        # base carries (deg = current degree, edeg = degree in the
        # static edge relation e). Initially equal; rewrites update deg.
        obs = Observation()
        pinned = (
            src.groupBy("u")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .withColumn("edeg", F.col("deg"))
            .observe(obs, *_probe_aggs())
            .localCheckpoint(eager=True)
        )
        return pinned, obs

    if assume_distinct:
        # the two setup pins are independent jobs over the same input —
        # overlap them (guide §2.6) instead of serializing two full
        # passes; with a distinct() in sym they would each re-run the
        # dedup shuffle, so that case derives base from the pinned e
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_e = pool.submit(_pin_e)
            f_base = pool.submit(_pin_base, sym)
            e, (base, obs0) = f_e.result(), f_base.result()
    else:
        e = _pin_e()
        base, obs0 = _pin_base(e)
    st = obs0.get
    n_front = st["n_front"] or 0
    bound = st["bound"] or 0
    n_alive = st["n_alive"] or 0
    # frontier = nodes that died exactly this round (round 0: initial
    # degree below k) — always a lazy filter over pinned blocks
    frontier = base.filter(dead0).select("u")
    # pinned (u, dec) relations of the tail rounds since the last
    # rewrite; base.deg minus their sum is the current degree
    decs: list[DataFrame] = []
    dec_rows = 0
    rounds_left = max_rounds

    def _cum(rels: list[DataFrame], rows: int):
        cur = rels[0]
        for d in rels[1:]:
            cur = cur.unionByName(d)
        cum = cur.groupBy("u").agg(F.sum("dec").cast("long").alias("cum"))
        # total decrement rows were exactly counted, so the full-table
        # join can stream the pinned base blocks against a broadcast —
        # no |V| shuffle
        return F.broadcast(cum) if rows <= broadcast_max_dead else cum

    def _degrees():
        if not decs:
            return base
        return base.join(_cum(decs, dec_rows), "u", "left").select(
            "u",
            (F.col("deg") - F.coalesce("cum", F.lit(0))).alias("deg"),
            "edeg",
        )

    while n_front > 0 and rounds_left > 0:
        rounds_left -= 1
        if bound <= broadcast_max_dead and bound * _KCORE_TAIL_FACTOR <= n_alive:
            # TAIL round: the candidate table (nodes adjacent to the
            # frontier, ≤ bound rows by the probe's exact Σ edeg) is
            # built with broadcast joins only and pinned in ONE job —
            # the decrement kernel is ONE reused broadcast (ReuseExchange
            # dedupes the second reference), so the edge relation is
            # scanned once and nothing |V|-sized is shuffled or re-pinned
            dec = F.broadcast(
                e.join(
                    F.broadcast(frontier.select(F.col("u").alias("v"))),
                    "v",
                )
                .groupBy("u")
                .agg(F.count(F.lit(1)).cast("long").alias("dec"))
            )
            cand = base.join(dec, "u")
            if decs:
                prior = decs[0]
                for d in decs[1:]:
                    prior = prior.unionByName(d)
                # restrict the prior-decrement sum to this round's
                # candidates through the SAME broadcast (so the
                # aggregate is candidate-sized), and let the left join
                # ride the pin job's exchanges — both sides are
                # candidate-sized, and a broadcast build here would be
                # one more driver-side job per round for no byte saving
                prev_c = (
                    prior.select("u", F.col("dec").alias("pdec"))
                    .join(dec, "u")
                    .groupBy("u")
                    .agg(F.sum("pdec").cast("long").alias("cum"))
                )
                cand = cand.join(prev_c, "u", "left")
            else:
                cand = cand.withColumn("cum", F.lit(None).cast("long"))
            # a candidate dies now iff this round's decrements push it
            # under k (pre ≥ k is already guaranteed by the row filter);
            # the probe rides the pin job via observe()
            died = F.col("pre") - F.col("dec") < k
            robs = Observation()
            roundtbl = (
                cand.select(
                    "u",
                    "deg",
                    "edeg",
                    "dec",
                    (F.col("deg") - F.coalesce("cum", F.lit(0))).alias(
                        "pre"
                    ),
                )
                # candidates already dead before this round carry no
                # information (see docstring) — drop them so every
                # later prior-scan and the final cum join stay
                # alive-candidate-sized
                .filter(F.col("pre") >= k)
                .observe(
                    robs,
                    F.count(F.lit(1)).alias("m"),
                    F.sum(died.cast("long")).alias("n_new"),
                    F.sum(F.when(died, F.col("edeg"))).alias("bound"),
                )
                .localCheckpoint(eager=True)
            )
            st = robs.get
            m, n_new, bound = st["m"] or 0, st["n_new"] or 0, st["bound"] or 0
            n_alive -= n_new
            n_front = n_new
            frontier = roundtbl.filter(died).select("u")
            decs.append(roundtbl.select("u", "dec"))
            dec_rows += m
            if len(decs) > 16:
                # compact: one pinned (u, Σdec) relation keeps the
                # per-round union (and its plan) bounded on long peels
                prior = decs[0]
                for d in decs[1:]:
                    prior = prior.unionByName(d)
                cobs = Observation()
                compacted = (
                    prior.groupBy("u")
                    .agg(F.sum("dec").cast("long").alias("dec"))
                    .observe(cobs, F.count(F.lit(1)).alias("n"))
                    .localCheckpoint(eager=True)
                )
                dec_rows = cobs.get["n"] or 0
                decs = [compacted]
        else:
            # REWRITE round: most of the table is changing (or the
            # candidate set may not fit a broadcast) — consolidate any
            # accumulated decs and re-pin the alive degree table with
            # one O(|V_alive|) shuffle round, the optimal shape when
            # the fringe is of the table's order
            front_v = frontier.select(F.col("u").alias("v"))
            if n_front <= broadcast_max_dead:
                front_v = F.broadcast(front_v)
            dec = (
                e.join(front_v, "v")
                .groupBy("u")
                .agg(F.count(F.lit(1)).cast("long").alias("dec"))
            )
            alive = _degrees().filter(F.col("deg") >= k)
            robs = Observation()
            base = (
                alive.join(dec, "u", "left")
                .select(
                    "u",
                    (F.col("deg") - F.coalesce(F.col("dec"), F.lit(0)))
                    .alias("deg"),
                    "edeg",
                )
                .observe(robs, *_probe_aggs())
                .localCheckpoint(eager=True)
            )
            decs, dec_rows = [], 0
            st = robs.get
            n_front = st["n_front"] or 0
            bound = st["bound"] or 0
            n_alive = st["n_alive"] or 0
            frontier = base.filter(dead0).select("u")
    if n_front > 0:
        # a pending dead frontier means surviving degrees were never
        # decremented for those deaths — returning would be silently
        # wrong AND diverge from k_core; fail loudly (same contract)
        raise RuntimeError(
            f"k_core_delta: peeling did not stabilize within max_rounds="
            f"{max_rounds}; raise max_rounds (each round peels at least "
            "one node, so |V| rounds always suffice)"
        )
    return (
        _degrees()
        .filter(F.col("deg") >= k)
        .select(F.col("u").alias("node_id"), F.col("deg").alias("degree"))
    )
