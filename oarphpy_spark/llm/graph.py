"""Distributed connected components for dedup clustering.

MinHash/SimHash candidate generation emits near-dup *pairs*; curation
needs *clusters* ("keep one representative per group of mutual
near-dups"), and pairs only become clusters through transitive closure
— a graph connectivity problem.

``connected_components`` implements the alternating large-star /
small-star algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SOCC 2014): every round is two shuffle-bounded
DataFrame passes (a groupBy-min and an equi-join, both keyed on node
id), and the edge set converges to one star per component centered at
the component's minimum node id in O(log^2 n) rounds — 2-3 rounds for
the shallow clusters near-dup graphs produce.  This is the shape that
survives 100 TB: no adjacency lists in driver memory, no per-node
message loops, just a handful of hash-partitioned self-joins over an
edge table that *shrinks* as stars collapse.

Per-round driver work is one tiny action (a 1-row convergence
checksum); lineage is truncated every round via
``util/checkpoints.truncate_lineage`` so round k's plan does not
replay rounds 1..k-1. Every iterative operator here takes a
``reliable`` parameter: None (auto) uses a RELIABLE ``checkpoint()``
whenever ``sc.setCheckpointDir`` is configured — the production mode,
where a lost executor cannot orphan the truncated blocks — and falls
back to ``localCheckpoint`` otherwise; True requires the checkpoint
dir (raises if missing); False forces the fast local form.

The reference has no graph operator; this extends its dedup surface
(reference `oarphpy/spark.py` has only row-level utilities) the way
its `union_dfs`/`df_histogram` extend relational basics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oarphpy_spark.util.checkpoints import truncate_lineage


def _check_canonical(e: DataFrame, who: str) -> DataFrame:
    """Debug-tier guard for ``input_canonical=True`` (ADVICE r15): the
    contract (src < dst on every row, distinct) is normally enforced
    only by the call-site comments — a caller passing a non-canonical
    relation gets silently WRONG triangle/k-core/k-truss counts
    (duplicate or reversed edges inflate wedge closure). Setting
    ``OARPHPY_SPARK_VALIDATE_CANONICAL=1`` turns misuse into a loud
    ValueError at the cost of one extra pass over the edges — debug /
    test tier only, never in the measured path."""
    import os

    if os.environ.get("OARPHPY_SPARK_VALIDATE_CANONICAL") != "1":
        return e
    row = e.select(
        F.sum((F.col("lo") >= F.col("hi")).cast("long")).alias("bad"),
        F.count("*").alias("n"),
    ).collect()[0]
    n_distinct = e.distinct().count()
    if (row["bad"] or 0) > 0 or n_distinct != row["n"]:
        raise ValueError(
            f"{who}(input_canonical=True) requires src < dst on every "
            f"row and no duplicates; got {row['bad'] or 0} non-ordered "
            f"row(s) and {row['n'] - n_distinct} duplicate(s)"
        )
    return e


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Best-effort release of the executor blocks behind an eager
    ``localCheckpoint`` (same mechanism as
    ``queries.graph_queries._release_checkpoint``): the checkpointed
    Dataset wraps a ``LogicalRDD`` whose backing RDD holds the blocks;
    unpersisting it frees them deterministically instead of waiting on
    driver GC + ContextCleaner. No-op (swallowed) for reliable
    checkpoints and already-released frames. The DataFrame is unusable
    afterwards — callers only release frames that nothing references."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort teardown
        pass

_SRC, _DST = "__cc_src", "__cc_dst"


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = edges.union(
        edges.select(F.col(_DST).alias(_SRC), F.col(_SRC).alias(_DST))
    )
    mins = sym.groupBy(_SRC).agg(
        F.least(F.min(_DST), F.col(_SRC)).alias("__m")
    )
    return (
        sym.join(mins, _SRC)
        .filter(F.col(_DST) > F.col(_SRC))
        .select(F.col(_DST).alias(_SRC), F.col("__m").alias(_DST))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward smaller ids, then connect every
    smaller-or-equal neighbor of u (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest(_SRC, _DST).alias(_SRC), F.least(_SRC, _DST).alias(_DST)
    ).filter(F.col(_SRC) != F.col(_DST))
    mins = oriented.groupBy(_SRC).agg(F.min(_DST).alias("__m"))
    relink = (
        oriented.join(mins, _SRC)
        .select(F.col(_DST).alias(_SRC), F.col("__m").alias(_DST))
    )
    center = mins.select(F.col(_SRC), F.col("__m").alias(_DST))
    return (
        relink.union(center)
        .filter(F.col(_SRC) != F.col(_DST))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 12,
    reliable: bool | None = None,
) -> DataFrame:
    """Transitive closure of an undirected edge list.

    Returns ``(node, component)`` — one row per non-isolated,
    NON-REPRESENTATIVE node, where ``component`` is the minimum node
    id in its connected component (the canonical cluster
    representative). The representative itself is NOT in the output
    (its row would be the self-loop ``(min, min)``), and neither are
    isolated nodes; callers restore both with a left-join +
    ``coalesce(component, node)``, which keeps this operator pure
    edge-in / star-out. ``tests/test_graph.py`` pins this contract.

    ``max_iter`` is a safety bound; the algorithm provably converges
    and near-dup graphs settle in 2-4 rounds. Raises if the bound is
    hit without convergence (silently-partial clusters would corrupt
    a dedup pass).
    """
    e = (
        edges.select(F.col(src).alias(_SRC), F.col(dst).alias(_DST))
        .filter(F.col(_SRC) != F.col(_DST))
        .distinct()
    )
    e = truncate_lineage(e, reliable=reliable)
    prev = None
    for _ in range(max_iter):
        e_next = truncate_lineage(
            _small_star(_large_star(e)), reliable=reliable
        )
        # One 1-row action per round: (edge count, order-independent
        # content checksum). Equal rounds => the star set is a fixpoint.
        row = e_next.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64(_SRC, _DST).cast("decimal(38,0)")), F.lit(0)
            ).alias("chk"),
        ).collect()[0]
        state = (row["n"], row["chk"])
        e = e_next
        if state == prev:
            break
        prev = state
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return e.select(F.col(_SRC).alias("node"), F.col(_DST).alias("component"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    seed_indicator=None,
    reliable: bool | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank as repeated join+aggregate — the
    Pregel message-passing shape expressed declaratively.

    Per iteration: contribution = rank(src)/outdeg(src) flows along
    each edge; rank'(node) = (1-d) + d * sum(incoming contributions)
    (the un-normalized 'every node holds at least 1-d' formulation, so
    dangling mass needs no global redistribution step and the result
    is oracle-checkable by unrolling the same recurrence in SQL).

    Scale shape: the outdeg join is LOOP-INVARIANT, so it is folded
    into the edge table ONCE before the loop — removing one join per
    iteration — and the weighted edge table is hash-repartitioned on
    ``src`` and persisted, so the BIG side of the per-iteration join
    never re-exchanges: only the small ranks relation (one row per
    node) shuffles to meet it. ``nodes`` is likewise persisted
    hash-partitioned on ``node``, and the contribution groupBy keyed
    on dst(=node) emits that same partitioning, so the rank-update
    left join needs no extra exchange. Lineage is truncated every
    iteration (without it, iteration k replans and recomputes 1..k-1,
    which is quadratic); ``reliable`` selects executor-loss-safe
    ``checkpoint()`` vs fast ``localCheckpoint`` — see
    ``util/checkpoints`` (auto-detects a configured checkpoint dir by
    default). The final result is
    checkpointed eagerly so the persisted loop inputs can be released
    deterministically before returning. Nodes with no inbound edges
    settle at 1-d; nodes absent from ``edges`` do not appear.

    ``seed_indicator`` turns this into PERSONALIZED PageRank
    (random walk with restart): a callable mapping the node column to
    a 0/1 Column; restart mass (1-d) flows only to seed nodes and the
    initial rank is the seed indicator — non-seed nodes score by
    proximity to the seed set (the similarity/recommendation walk of
    Jeh & Widom 2003). Plan shape is unchanged: the seed indicator is
    a column EXPRESSION on the persisted nodes table, not a join.

    Output: (node, rank) — rank unrounded; round at the call site.
    """
    out_edges = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        out_edges.select(F.col("src").alias("node"))
        .unionByName(out_edges.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    outdeg = out_edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # rank/outdeg (not a precomputed 1/outdeg weight) keeps the edge
    # arithmetic bit-identical to the unrolled-SQL oracle recurrence.
    edges_w = (
        out_edges.join(outdeg, "src")
        .select("src", "dst", "outdeg")
        .repartition("src")
        .persist()
    )
    if seed_indicator is None:
        base = F.lit(1.0 - damping)
        r0 = F.lit(1.0)
    else:
        seed = seed_indicator(F.col("node")).cast("double")
        base = F.lit(1.0 - damping) * seed
        r0 = seed
    ranks = nodes.withColumn("rank", r0)
    for _ in range(iterations):
        ranks = truncate_lineage(
            _pagerank_step(nodes, edges_w, ranks, damping, base),
            eager=False,
            reliable=reliable,
        )
    ranks = truncate_lineage(ranks, eager=True, reliable=reliable)
    nodes.unpersist()
    edges_w.unpersist()
    return ranks


def _pagerank_step(
    nodes: DataFrame,
    edges_w: DataFrame,
    ranks: DataFrame,
    damping: float,
    base=None,
) -> DataFrame:
    """One PageRank round. With ``edges_w`` persisted partitioned on
    src and ``nodes`` persisted partitioned on node, the plan carries
    exactly two exchanges: ranks→src to meet the edges, and the
    contribution re-key dst→node for the aggregate (the update join
    then reuses the aggregate's partitioning) — pinned by a plan test
    so a regression can't silently re-shuffle the big edge side every
    iteration."""
    contribs = (
        edges_w.join(ranks, edges_w.src == ranks.node)
        .select(
            F.col("dst").alias("node"),
            (F.col("rank") / F.col("outdeg")).alias("contrib"),
        )
        .groupBy("node")
        .agg(F.sum("contrib").alias("inflow"))
    )
    if base is None:
        base = F.lit(1.0 - damping)
    return nodes.join(contribs, "node", "left").select(
        "node",
        (
            base + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
        ).alias("rank"),
    )


def sssp(
    edges: DataFrame,
    source,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    rounds: int = 4,
    reliable: bool | None = None,
) -> DataFrame:
    """Bounded-hop single-source shortest paths: distributed
    Bellman-Ford over an undirected weighted edge list, a FIXED number
    of relaxation rounds (so the result — min path cost using at most
    ``rounds`` edges — is exactly restatable as an unrolled SQL
    recurrence; full convergence is just rounds >= graph diameter,
    and relaxations past the fixpoint are no-ops by monotonicity).

    FRONTIER-ONLY relaxation (the delta-stepping insight): only
    nodes whose distance IMPROVED last round relax their edges this
    round — a node with an unchanged distance already propagated its
    contributions, so re-relaxing it is provably a no-op. Per-round
    result is bit-identical to textbook Bellman-Ford (what the SQL
    oracle unrolls), but the expensive frontier x edges join shrinks
    with the frontier instead of staying at |reached| x |edges| —
    on a converging graph later rounds approach free, and the loop
    exits early once the frontier empties (sound: further rounds are
    no-ops). The symmetrized edge table is built ONCE,
    hash-repartitioned on its join key and persisted, so only the
    small frontier relation shuffles each round; lineage is truncated
    per round (``reliable`` selects durable vs local truncation, see
    ``util/checkpoints``).

    ``source`` is a literal node id. Returns (node, dist) for nodes
    reachable within ``rounds`` hops; dist is LONG when weights are
    integral (exact — no float accumulation along paths). Duplicate
    input edges are tolerated without a dedup pass (MIN-relaxation is
    idempotent), and the seed frontier is a literal single row — the
    loop never scans the node universe.
    """
    # No dedup pass: duplicate edges cannot change a MIN-relaxation,
    # so the symmetric union ships straight into the partitioned cache
    # (one less full shuffle than a distinct would cost). The input
    # projection is persisted FIRST so the two arms of the symmetric
    # union evaluate the (possibly expensive) upstream edge plan once,
    # not twice.
    base = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d"), F.col(weight)
    ).persist()
    sym = (
        base.unionByName(
            base.select(
                F.col("d").alias("s"), F.col("s").alias("d"), F.col(weight)
            )
        )
        .repartition("s")
        .persist()
    )
    # Seed is ONE literal row — no node-universe scan to filter it out
    # of (the frontier only ever holds reached nodes anyway). The
    # seed's types derive from the INPUT columns (id type from src,
    # dist type from the weight), so string/other non-integral node
    # ids work exactly as they do in connected_components.
    id_type = base.schema["s"].dataType
    w_type = base.schema[weight].dataType
    dist = (
        edges.sparkSession.range(1)
        .select(
            F.lit(source).cast(id_type).alias("node"),
            F.lit(0).cast(w_type).alias("dist"),
        )
    )
    frontier = dist
    for _ in range(rounds):
        relaxed = (
            sym.join(frontier, sym.s == frontier.node)
            .select(
                F.col("d").alias("node"),
                (F.col("dist") + F.col(weight)).alias("nd"),
            )
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        improved = truncate_lineage(
            relaxed.join(dist, "node", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("node", F.col("nd").alias("dist")),
            eager=True,
            reliable=reliable,
        )
        if improved.isEmpty():
            break  # fixpoint: every further round is a no-op
        dist = truncate_lineage(
            dist.unionByName(improved)
            .groupBy("node")
            .agg(F.min("dist").alias("dist")),
            eager=False,
            reliable=reliable,
        )
        frontier = improved
    dist = truncate_lineage(dist, eager=True, reliable=reliable)
    sym.unpersist()
    base.unpersist()
    return dist


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    input_canonical: bool = False,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Distributed triangle counting via degree-ordered orientation
    (the MapReduce-classic of Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW 2011).

    Every triangle is counted exactly once at its apex — the vertex
    that precedes both others in the (degree, node-id) total order:

    1. canonicalize to undirected edges (lo, hi), distinct;
    2. orient each edge from the (deg, id)-smaller endpoint to the
       larger — a hub of degree d contributes wedges only through its
       LOWER-ranked neighbors, so per-vertex wedge work is bounded by
       O(m^1.5) total instead of d^2 at the hub (the "last reducer"
       fix — a power-law hub never explodes);
    3. wedges = self-join of the oriented edges on the apex;
    4. close each wedge against the canonical undirected edge set
       with one equi-join on (least, greatest).

    Three shuffles total (degree agg, wedge self-join, closure join);
    no adjacency list ever materializes on one task.

    The canonical edge set and the oriented edges are PERSISTED: und
    feeds four plan branches (degree agg, orientation, closure join,
    edge count) and oriented feeds both wedge sides — without the
    cache the upstream edge derivation re-executes per branch (the
    static plan held 48 scans of the underlying fact table; exchange
    reuse doesn't collapse them because each branch re-derives with
    fresh expression ids). Measured at sf1.0: 12.7 s -> 10.1 s
    best-of-2. The caches ride on the result as ``_oarphpy_persisted``
    — release with ``llm.dedup.release_cached`` after materializing.
    This is NOT optional hygiene: SQL-persisted plans are held by the
    session's CacheManager until an explicit ``unpersist()``, so
    driver GC of the DataFrame does NOT reclaim them (ContextCleaner
    only collects RDD-level caches, not SQL cache entries).

    Returns a 1-row DataFrame: (n_triangles, n_edges).

    ``input_canonical=True`` asserts the input is ALREADY canonical
    (src < dst on every row, distinct, materialized — e.g. the
    session-shared checkpointed edge relation): the canonicalize +
    distinct shuffle and its persist are skipped, since re-deduping a
    checkpoint only re-shuffles rows that cannot change.
    ``degrees`` optionally supplies a precomputed (node, deg) degree
    table over the SAME canonical edge set, so a caller that needs
    degrees anyway (q_graph_profile) doesn't pay the aggregation
    twice; when absent it is computed here and persisted (it feeds
    BOTH orientation joins — unpersisted, each join branch re-runs
    the 2|E|-row union+aggregate).
    """
    if input_canonical:
        und = _check_canonical(
            edges.select(F.col(src).alias("lo"), F.col(dst).alias("hi")),
            "triangle_count",
        )
        persisted: list[DataFrame] = []
    else:
        und = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("lo"),
                F.greatest(F.col(src), F.col(dst)).alias("hi"),
            )
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
            .persist()
        )
        persisted = [und]
    if degrees is None:
        deg = (
            und.select(F.col("lo").alias("node"))
            .unionByName(und.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
            .persist()
        )
        persisted.append(deg)
    else:
        deg = degrees.select("node", "deg")
    ranked = (
        und.join(deg.withColumnRenamed("node", "lo"), "lo")
        .withColumnRenamed("deg", "deg_lo")
        .join(
            deg.withColumnRenamed("node", "hi").withColumnRenamed(
                "deg", "deg_hi"
            ),
            "hi",
        )
    )
    lo_first = (F.col("deg_lo") < F.col("deg_hi")) | (
        (F.col("deg_lo") == F.col("deg_hi")) & (F.col("lo") < F.col("hi"))
    )
    # NOTE (r16): an r15 edit repartition+sorted the oriented relation
    # on the apex before persisting, claiming the wedge self-join arms
    # would then read the cache with no Exchange/Sort. The claim was
    # FALSE — AQE wraps cached plans (AdaptiveSparkPlan under
    # InMemoryRelation) and hides their output partitioning, so both
    # consumer-side Exchange+Sort stayed (r15's own after-plan, lines
    # 11-14: Sort+Exchange above InMemoryTableScan — the same negative
    # result the link-prediction experiment recorded and reverted that
    # round). The edit only ADDED a build-side shuffle; reverted here
    # and re-A/B'd (AB_TRIANGLE_r16.json).
    oriented = ranked.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("a"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("b"),
    ).persist()
    persisted.append(oriented)
    w1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    w2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = w1.join(w2, "a").filter(F.col("x") < F.col("y"))
    # SHUFFLE_HASH on the |E|-row edge side: a sort-merge closure join
    # would SORT the wedge relation — orders of magnitude larger than
    # the edge set — where a shuffled-hash join only streams it.
    closed = wedges.join(
        und.hint("SHUFFLE_HASH"),
        (F.least("x", "y") == F.col("lo"))
        & (F.greatest("x", "y") == F.col("hi")),
    )
    out = closed.agg(
        F.count("*").alias("n_triangles")
    ).crossJoin(und.agg(F.count("*").alias("n_edges")))
    out._oarphpy_persisted = persisted
    return out


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 12,
    reliable: bool | None = None,
    *,
    input_canonical: bool = False,
) -> DataFrame:
    """k-core decomposition by iterative peeling (Batagelj-Zaversnik
    made distributed): repeatedly drop nodes of degree < k and the
    edges touching them until a fixpoint — the maximal subgraph where
    every node keeps >= k neighbors (dense-community extraction,
    spam/bot-ring mining, graph sparsification preprocessing).

    Each round is one degree aggregation + two semi-joins keyed on
    node id — hash-partitioned, no adjacency lists, and the edge set
    only SHRINKS, so rounds get cheaper as peeling cascades.
    Per-round driver work is a 1-row edge count (the convergence
    check); lineage is truncated per round as in the other iterative
    operators (``reliable`` selects durable vs local truncation, see
    ``util/checkpoints``). Raises if ``max_iter`` rounds don't reach
    the fixpoint — callers (and the unrolled SQL oracle, whose round
    count must be >= the real one; extra unrolled rounds are no-ops
    at the fixpoint because peeling is monotone) rely on convergence
    being VERIFIED, not assumed.

    Returns (node, core_deg): surviving nodes with their in-core
    degree (>= k by construction); empty when no k-core exists.

    ``input_canonical=True`` asserts the input is already canonical
    (src < dst, distinct, materialized) and skips the canonicalize +
    distinct shuffle — see ``triangle_count``.
    """
    if input_canonical:
        e = _check_canonical(
            edges.select(F.col(src).alias("lo"), F.col(dst).alias("hi")),
            "kcore",
        )
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("lo"),
                F.greatest(F.col(src), F.col(dst)).alias("hi"),
            )
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )
        e = truncate_lineage(e, reliable=reliable)
    n_prev = e.count()
    for _ in range(max_iter):
        sym = e.select(F.col("lo").alias("v")).unionByName(
            e.select(F.col("hi").alias("v"))
        )
        keep = (
            sym.groupBy("v")
            .agg(F.count("*").alias("__d"))
            .filter(F.col("__d") >= k)
            .select("v")
        )
        e_next = truncate_lineage(
            e.join(keep.withColumnRenamed("v", "lo"), "lo", "left_semi")
            .join(keep.withColumnRenamed("v", "hi"), "hi", "left_semi"),
            reliable=reliable,
        )
        n = e_next.count()
        e = e_next
        if n == n_prev:
            break
        n_prev = n
    else:
        raise RuntimeError(f"kcore did not converge in {max_iter} rounds")
    sym = e.select(F.col("lo").alias("node")).unionByName(
        e.select(F.col("hi").alias("node"))
    )
    return sym.groupBy("node").agg(F.count("*").alias("core_deg"))


# Max degree up to which ktruss computes per-edge support via
# adjacency-array intersection (one array per row: 64Ki ints = 512 KB);
# above it the O(1)-per-task wedge enumeration takes over. Module-level
# so tests can force either path on the same graph.
_KTRUSS_INTERSECT_MAX_DEGREE = 65536


def _ktruss_wedge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support by full wedge enumeration (one
    wedge self-join + one closure join + a 3-role re-key);
    domain = edges in >=1 triangle. Never materializes an
    adjacency list, so per-task memory is O(1) in the max degree —
    the unbounded-skew fallback."""
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e1.lo") == F.col("e2.lo"))
            & (F.col("e1.hi") < F.col("e2.hi")),
        )
        .join(
            e3,
            (F.col("e3.lo") == F.col("e1.hi"))
            & (F.col("e3.hi") == F.col("e2.hi")),
        )
        .select(
            F.col("e1.lo").alias("a"),
            F.col("e1.hi").alias("b"),
            F.col("e2.hi").alias("c"),
        )
    )
    roles = (
        tri.select(F.col("a").alias("lo"), F.col("b").alias("hi"))
        .unionByName(
            tri.select(F.col("a").alias("lo"), F.col("c").alias("hi"))
        )
        .unionByName(
            tri.select(F.col("b").alias("lo"), F.col("c").alias("hi"))
        )
    )
    return roles.groupBy("lo", "hi").agg(F.count("*").alias("support"))

def _ktruss_intersect_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support as |N(lo) ∩ N(hi)| over adjacency
    arrays (the set-intersection family of Latapy, TCS 2008 —
    'compact-forward'): support(lo,hi) counts the common neighbors
    of the edge's endpoints, which is exactly the number of
    triangles through the edge. One adjacency aggregation + two
    equi-joins; the intersection runs as the JVM array_intersect
    intrinsic at ~ns per element, where the wedge self-join paid a
    full codegen join-row production per wedge (~µs) — measured
    r16 at sf0.1: the round-0 support stage dropped from 265-395 s
    task time to single-digit seconds on identical 49M-element
    comparison volume. Domain = ALL current edges (support 0 rows
    included; the caller's `support > 0` filter normalizes the
    difference vs the enumeration form). Requires bounded degree:
    one row holds one adjacency array."""
    sym = e.select(
        F.col("lo").alias("n"), F.col("hi").alias("w")
    ).unionByName(
        e.select(F.col("hi").alias("n"), F.col("lo").alias("w"))
    )
    adj = sym.groupBy("n").agg(F.collect_list("w").alias("nb"))
    return (
        e.join(
            adj.select(F.col("n").alias("lo"), F.col("nb").alias("nlo")),
            "lo",
        )
        .join(
            adj.select(F.col("n").alias("hi"), F.col("nb").alias("nhi")),
            "hi",
        )
        .select(
            "lo",
            "hi",
            F.size(F.array_intersect("nlo", "nhi"))
            .cast("long")
            .alias("support"),
        )
    )



def ktruss(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    reliable: bool | None = None,
    *,
    input_canonical: bool = False,
) -> DataFrame:
    """k-truss decomposition (Cohen 2008): the maximal subgraph where
    every EDGE participates in >= k-2 triangles — a stricter cohesion
    mining primitive than k-core (every edge is embedded in triangles,
    not just every node in edges). Iterative support peeling: count
    per-edge triangle support, drop edges below k-2, repeat until the
    fixpoint; convergence is verified per round with a 1-row edge
    count and the operator raises past ``max_iter`` (so an unrolled
    SQL oracle with >= the real round count is sound — peeling is
    monotone, extra rounds are no-ops).

    Per round the support table is recomputed one of three ways,
    chosen adaptively (r16):

    * **adjacency intersection** (bounded-degree graphs, the measured
      default): support(lo,hi) = |N(lo) ∩ N(hi)| via one adjacency
      aggregation + two equi-joins + the JVM ``array_intersect``
      intrinsic — the same comparison volume as wedge enumeration at
      ~1000x less per-element cost (sf0.1: the round-0 support stage
      fell from 265-395 s task time to single digits; q_ktruss wall
      12.7 -> ~5 s). Gated on max input degree
      (``_KTRUSS_INTERSECT_MAX_DEGREE``) because one row carries one
      adjacency array;
    * **wedge enumeration** (unbounded skew): one wedge self-join on
      the canonical lower endpoint + one closure equi-join enumerates
      each triangle once (a < b < c), a union re-keys each triangle to
      its three edges, one aggregate yields supports — O(1) per-task
      memory in the max degree;
    * **incremental decrement** (sparse-deletion rounds, <= 25% of
      edges deleted): every destroyed triangle contains a deleted
      edge, so the update enumerates only triangles touching the
      deletions (work proportional to the deleted edges' degrees) and
      subtracts them from the survivors' supports — guide §2.4. At
      sf0.1/k=12 this never fires (the peel deletes 97.6% then 66.6%);
      it exists for the many-small-rounds regime of real peels.

    The per-round support table is CHECKPOINTED (it is |E|-bounded):
    the post-convergence support join then re-reads it instead of
    replaying the final round's full enumeration, which the r14 form
    paid twice; superseded rounds' checkpoint blocks are released
    two rounds behind (ADVICE r15). (An enumerate-once variant that
    materializes the triangle list and semi-join-filters it per round
    was measured SLOWER at sf0.1 — 13.2 s first rep vs 12.5 s — and
    its per-round localCheckpoints accumulated storage blocks until
    reps degraded 13 → 37 s; reverted, r15. A (k-1)-core prefilter
    was also measured useless here — the sf0.1 co-purchase graph IS
    its own 11-core.)

    ``input_canonical=True`` asserts the input is already canonical
    (src < dst, distinct, materialized) and skips the canonicalize +
    distinct shuffle — see ``triangle_count``.

    Returns surviving canonical edges with support:
    (lo, hi, support), support >= k-2.
    """
    if input_canonical:
        e = _check_canonical(
            edges.select(F.col(src).alias("lo"), F.col(dst).alias("hi")),
            "ktruss",
        )
    else:
        e = (
            edges.select(
                F.least(F.col(src), F.col(dst)).alias("lo"),
                F.greatest(F.col(src), F.col(dst)).alias("hi"),
            )
            .filter(F.col("lo") != F.col("hi"))
            .distinct()
        )
        e = truncate_lineage(e, reliable=reliable)

    # Scale-adaptive support-operator selection (one cheap degree
    # aggregation on the INPUT graph — an upper bound for every peel
    # round, since edges only shrink): adjacency-intersection support
    # needs one adjacency array per row, so it is gated on the max
    # degree (512 KB of ints per row at the 65536 threshold); past the
    # threshold the O(1)-per-task wedge enumeration takes over.
    max_deg = (
        e.select(F.col("lo").alias("n"))
        .unionByName(e.select(F.col("hi").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("dg"))
        .agg(F.max("dg"))
        .collect()[0][0]
        or 0
    )
    full_support = (
        _ktruss_intersect_support
        if max_deg <= _KTRUSS_INTERSECT_MAX_DEGREE
        else _ktruss_wedge_support
    )

    def decremented_support(
        keeps: DataFrame, deleted: DataFrame, e_old: DataFrame
    ) -> DataFrame:
        """Incremental support maintenance (r16, guide §2.4): recompute
        only around deletions. Every triangle destroyed this round
        contains >=1 deleted edge, so enumerate the DISTINCT triangles
        of ``e_old`` touching ``deleted`` (adjacency walk from each
        deleted edge's lo endpoint + one closure semi-join — work
        proportional to the deleted edges' degrees, not to |E|), then
        subtract one from each surviving edge per destroyed triangle.
        A triangle with 2-3 deleted edges is deduped on its sorted
        vertex triple, so survivors are decremented exactly once."""
        sym = e_old.select(
            F.col("lo").alias("p"), F.col("hi").alias("w")
        ).unionByName(
            e_old.select(F.col("hi").alias("p"), F.col("lo").alias("w"))
        )
        cand = (
            deleted.select("lo", "hi")
            .join(sym, F.col("lo") == F.col("p"))
            .filter(F.col("w") != F.col("hi"))
            .select("lo", "hi", "w")
        )
        closed = cand.join(
            e_old.select(
                F.col("lo").alias("clo"), F.col("hi").alias("chi")
            ).hint("SHUFFLE_HASH"),
            (F.least("hi", "w") == F.col("clo"))
            & (F.greatest("hi", "w") == F.col("chi")),
            "left_semi",
        )
        tri = closed.select(
            F.array_sort(F.array("lo", "hi", "w")).alias("t")
        ).distinct()
        tri = tri.select(
            F.col("t")[0].alias("a"),
            F.col("t")[1].alias("b"),
            F.col("t")[2].alias("c"),
        )
        edges3 = (
            tri.select(F.col("a").alias("lo"), F.col("b").alias("hi"))
            .unionByName(
                tri.select(F.col("a").alias("lo"), F.col("c").alias("hi"))
            )
            .unionByName(
                tri.select(F.col("b").alias("lo"), F.col("c").alias("hi"))
            )
        )
        dec = (
            edges3.join(deleted.select("lo", "hi"), ["lo", "hi"], "left_anti")
            .groupBy("lo", "hi")
            .agg(F.count("*").alias("__dec"))
        )
        return keeps.join(dec, ["lo", "hi"], "left").select(
            "lo",
            "hi",
            (
                F.col("support") - F.coalesce(F.col("__dec"), F.lit(0))
            ).alias("support"),
        )

    n_prev = e.count()
    sup = None
    # pending = (keeps, deleted, e_old): inputs for the next round's
    # incremental update; None forces a full enumeration.
    pending = None
    prev_ckpts: list[DataFrame] = []  # created last round
    old_ckpts: list[DataFrame] = []  # created two rounds back
    for _ in range(max_iter):
        if pending is None:
            sup = truncate_lineage(full_support(e), reliable=reliable)
        else:
            sup = truncate_lineage(
                decremented_support(*pending), reliable=reliable
            )
        # keeps' domain is exactly the surviving edge set: a full
        # enumeration omits triangle-less edges (support 0 < k-2 for
        # k >= 3; the support > 0 clause keeps k = 2 consistent with
        # the enumeration's inner-join semantics), and the incremental
        # path carries every current edge with its updated support.
        keeps = sup.filter(
            (F.col("support") >= k - 2) & (F.col("support") > 0)
        )
        e_next = truncate_lineage(keeps.select("lo", "hi"), reliable=reliable)
        n = e_next.count()
        n_deleted = n_prev - n
        made = [sup, e_next]
        if n_deleted == 0:
            # Converged. Release every superseded per-round checkpoint
            # (ADVICE r15): only the final sup/e pair stays alive for
            # the return join.
            for df in old_ckpts + prev_ckpts:
                _unpersist_checkpoint(df)
            e = e_next
            break
        # Incremental maintenance pays work proportional to the
        # deleted edges' adjacency; past ~25% deletions a fresh
        # enumeration over the (now smaller) survivor set is cheaper.
        # NOTE: `e` still names the PRE-deletion edge set here — the
        # adjacency/closure side of the update must see the old graph
        # (a destroyed triangle's other edges may themselves be
        # deleted this round).
        if n > 0 and n_deleted <= 0.25 * n_prev:
            deleted = truncate_lineage(
                e.join(e_next, ["lo", "hi"], "left_anti"),
                reliable=reliable,
            )
            made.append(deleted)
            pending = (keeps, deleted, e)
        else:
            pending = None
        # Checkpoints from two rounds back are unreferenced once this
        # round's sup/e_next are materialized (eager truncation above);
        # free their blocks instead of waiting on GC + ContextCleaner
        # (ADVICE r15 — the reverted enumerate-once experiment measured
        # reps degrading 13 -> 37 s from exactly this accumulation).
        for df in old_ckpts:
            _unpersist_checkpoint(df)
        old_ckpts = prev_ckpts
        prev_ckpts = made
        e = e_next
        n_prev = n
    else:
        raise RuntimeError(f"ktruss did not converge in {max_iter} rounds")
    if n_prev == 0:
        return e.withColumn("support", F.lit(0).cast("long"))
    return e.join(sup, ["lo", "hi"])


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    reliable: bool | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), made DETERMINISTIC: every node starts labeled with
    its own id; each round it adopts the most frequent label among
    its neighbors, ties broken by the SMALLEST label; a FIXED round
    count (no convergence race — synchronous LPA can oscillate, and a
    fixed unroll is what an SQL oracle can restate exactly).

    Per round: one equi-join edges x labels on the neighbor end, one
    (node, label) count aggregate, one per-node argmax via max_by
    keyed on (count desc, label asc) — all partial-aggregable,
    hash-partitioned on node id, lineage truncated per round. The
    symmetric edge table is built once, repartitioned on src and
    persisted, so the per-round join never re-exchanges the big side
    (the pagerank loop's discipline).

    Returns (node, label); isolated nodes keep their own id only if
    they appear in ``edges`` (self-loops count as neighbors).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .repartition("a")
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(rounds):
        labels = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("n"), "label")
            .agg(F.count("*").alias("cnt"))
            .groupBy(F.col("n").alias("node"))
            .agg(
                F.min_by(
                    "label", F.struct(-F.col("cnt"), F.col("label"))
                ).alias("label")
            )
        )
        labels = truncate_lineage(labels, eager=False, reliable=reliable)
    labels = truncate_lineage(labels, eager=True, reliable=reliable)
    sym.unpersist()
    return labels


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 16,
    max_inner: int = 64,
    reliable: bool | None = None,
) -> DataFrame:
    """SCCs of a DIRECTED edge list via trim + Orzan coloring — the
    label-propagation SCC used by Pregel-style systems (Orzan 2004;
    Salihoglu & Widom, VLDB 2014 §6.3), here as shuffle-bounded
    DataFrame passes. Returns ``(node, scc_id)`` for every
    non-isolated node, ``scc_id`` = MAX node id in the SCC.

    Per outer round, on the still-unassigned subgraph:

    1. TRIM — nodes with no in-edges or no out-edges are singleton
       SCCs by definition; peel them (two semi/anti joins). This is
       what kills the long DAG tail real graphs have.
    2. COLOR — propagate ``color = max(reachable-ancestor id)``
       forward to fixpoint (join + groupBy-max per step; the
       1-row convergence action exploits that SUM(color) is
       strictly monotone until the fixpoint).
    3. PEEL — every color root (``color == node``) can reach its
       whole color class FORWARD; the root's SCC is the subset that
       reaches it BACK. Backward-propagate membership from the
       roots along color-respecting edges to fixpoint (COUNT is
       monotone), assign, subtract, repeat.

    Every relation that loops is lineage-truncated per step
    (``reliable`` as elsewhere); the active-subgraph edge table is
    rebuilt per outer round but the node set only shrinks. Worst
    case (adversarial id order on a path) is O(V) outer rounds —
    bounded by ``max_outer`` with a convergence raise, same
    contract as ``connected_components``.
    """
    spark = edges.sparkSession
    e0 = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    e0 = truncate_lineage(e0, eager=True, reliable=reliable)
    nodes = truncate_lineage(
        e0.select(F.col("s").alias("node"))
        .union(e0.select("d"))
        .distinct(),
        eager=True,
        reliable=reliable,
    )
    # The empty seed's schema derives from the input edge id type
    # (scc_id = MAX node id, same type), so string/other non-integral
    # node ids work exactly as they do in connected_components.
    from pyspark.sql.types import StructField, StructType

    id_type = e0.schema["s"].dataType
    assigned = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("node", id_type),
                StructField("scc_id", id_type),
            ]
        ),
    )

    for _outer in range(max_outer):
        if nodes.isEmpty():
            return assigned
        # 1. TRIM to FIXPOINT: no in-edge or no out-edge => singleton
        # SCC. Iterated within the round so a DAG chain/tail of any
        # length peels here in O(depth) cheap passes instead of
        # consuming one full color+peel round per level.
        ae = None
        for _ in range(max_inner):
            if ae is not None:
                ae.unpersist()
            ae = (
                e0.join(nodes, e0.s == nodes.node, "left_semi")
                .join(nodes, F.col("d") == nodes.node, "left_semi")
                .persist()
            )
            has_in = ae.select(F.col("d").alias("node")).distinct()
            has_out = ae.select(F.col("s").alias("node")).distinct()
            trimmed = truncate_lineage(
                nodes.join(has_in, "node", "left_anti")
                .union(nodes.join(has_out, "node", "left_anti"))
                .distinct()
                .select("node", F.col("node").alias("scc_id")),
                eager=True,
                reliable=reliable,
            )
            if trimmed.isEmpty():
                break
            assigned = truncate_lineage(
                assigned.unionByName(trimmed), eager=True, reliable=reliable
            )
            nodes = truncate_lineage(
                nodes.join(trimmed, "node", "left_anti"),
                eager=True,
                reliable=reliable,
            )
        else:
            raise RuntimeError(
                f"scc trim did not reach a fixpoint in {max_inner} passes"
            )
        if nodes.isEmpty():
            ae.unpersist()
            return assigned

        # 2. COLOR: forward max-id propagation to fixpoint. Numeric
        # ids get the 1-row monotone SUM(color) convergence action;
        # non-numeric ids (where a decimal cast would NULL out and
        # falsely report convergence) pay one small node-sized
        # anti-check join per step instead — exact for any id type.
        from pyspark.sql.types import NumericType

        numeric_ids = isinstance(id_type, NumericType)
        color = nodes.select("node", F.col("node").alias("color"))
        prev_sum = None
        for _ in range(max_inner):
            msgs = ae.join(color, ae.s == color.node).select(
                F.col("d").alias("node"), "color"
            )
            new_color = truncate_lineage(
                color.unionByName(msgs)
                .groupBy("node")
                .agg(F.max("color").alias("color")),
                eager=False,
                reliable=reliable,
            )
            if numeric_ids:
                s = new_color.agg(
                    F.sum(F.col("color").cast("decimal(38,0)")).alias("s")
                ).collect()[0]["s"]
                converged = s == prev_sum
                prev_sum = s
            else:
                converged = (
                    new_color.join(
                        color.withColumnRenamed("color", "pc"), "node"
                    )
                    .filter(F.col("color") != F.col("pc"))
                    .limit(1)
                    .isEmpty()
                )
            color = new_color
            if converged:
                break
        else:
            raise RuntimeError(
                f"scc coloring did not converge in {max_inner} steps"
            )

        # 3. PEEL: backward membership from the color roots.
        ce = (
            ae.join(
                color.select(
                    F.col("node").alias("s"), F.col("color").alias("cs")
                ),
                "s",
            )
            .join(
                color.select(
                    F.col("node").alias("d"), F.col("color").alias("cd")
                ),
                "d",
            )
            .filter(F.col("cs") == F.col("cd"))
            .select("s", "d")
            .persist()
        )
        marked = truncate_lineage(
            color.filter(F.col("node") == F.col("color")).select(
                "node", F.col("color").alias("scc_id")
            ),
            eager=True,
            reliable=reliable,
        )
        prev_n = None
        for _ in range(max_inner):
            msgs = ce.join(marked, ce.d == marked.node).select(
                F.col("s").alias("node"), "scc_id"
            )
            marked = truncate_lineage(
                marked.unionByName(msgs).distinct(),
                eager=False,
                reliable=reliable,
            )
            n = marked.count()
            if n == prev_n:
                break
            prev_n = n
        else:
            raise RuntimeError(
                f"scc backward peel did not converge in {max_inner} steps"
            )
        assigned = truncate_lineage(
            assigned.unionByName(marked), eager=True, reliable=reliable
        )
        nodes = truncate_lineage(
            nodes.join(marked, "node", "left_anti"),
            eager=True,
            reliable=reliable,
        )
        ce.unpersist()
        ae.unpersist()

    if not nodes.isEmpty():
        raise RuntimeError(
            f"strongly_connected_components did not finish in "
            f"{max_outer} outer rounds"
        )
    return assigned
