"""Connected-components clustering over near-dup pairs.

Pair generators (minhash/simhash/ngram/embedding near-dup) emit edges;
an actual dedup pipeline needs the transitive closure of those edges —
"doc A ~ B and B ~ C" must collapse to ONE cluster so exactly one
survivor is kept per group. This module turns an edge list into
(id, component) labels with component = min id in the component, the
standard canonical-survivor convention.

Algorithm: iterative min-label propagation. Every round each node takes
the min of its own label and its neighbors' labels; converged when no
label changes. Rounds needed = graph diameter, and near-dup graphs are
dense clumps with tiny diameter (a dup cluster is near-clique shaped),
so 2-4 rounds is typical regardless of corpus size.

Scale shape (per round): one equi-join of labels against the symmetric
edge list keyed on node id, one min-aggregate — both shuffle on node
id, both benefit from map-side partial aggregation. Nothing is
collected to the driver; convergence is detected with a 1-row
aggregate. `localCheckpoint` after every round truncates lineage so
the plan stays O(1) deep instead of growing per iteration (an
un-checkpointed iterative join would hand Catalyst an exponentially
nested plan). For adversarial graphs with large diameter (long chains,
not dup-shaped), `connected_components_star` implements the published
alternating large-star/small-star construction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which
converges in O(log^2 n) rounds regardless of diameter — same
interface, same (id, min-id component) output, equality test-pinned.
Near-dup clustering keeps the simpler propagation as the default (a
dup cluster is near-clique shaped; 2-4 rounds beat the star rewrite's
per-round constant), switching when diameter is the risk.

Reference parity note: the reference engine (ChapterhouseDB) has no
clustering operator — this is part of the beyond-reference
training-data surface (SURVEY.md §7.3.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    component_col: str = "component",
    max_iters: int | None = None,
    algorithm: str = "label",
) -> DataFrame:
    """(id, component) labels; component = min node id in the component.

    edges: undirected pairs (any orientation, duplicates fine).
    nodes: optional 1-column frame of ALL node ids — pass it to also
    label isolated nodes (singleton components), e.g. every document in
    a corpus, not only those appearing in some pair.

    algorithm: "label" (default — min-label propagation, diameter
    rounds, the cheap choice for near-clique dedup graphs) or "star"
    (delegates to connected_components_star: O(log^2 n) rounds for
    chain-shaped graphs). Identical output either way (test-pinned),
    so callers switch solvers without changing call sites.

    max_iters: None (default) resolves per-algorithm — 30 propagation
    rounds for "label", 50 alternating rounds for "star" (ADVICE r10:
    forwarding the label default silently tightened the star solver's
    documented budget for callers switching via the kwarg).

    Monotone convergence: labels only ever decrease, so the global
    label sum strictly decreases every non-converged round — one cheap
    1-row aggregate per round detects the fixpoint without a join.
    """
    if algorithm == "star":
        return connected_components_star(
            edges,
            src,
            dst,
            nodes,
            id_col,
            component_col,
            50 if max_iters is None else max_iters,
        )
    if algorithm != "label":
        raise ValueError(
            f"algorithm must be 'label' or 'star', got {algorithm!r}"
        )
    if max_iters is None:
        max_iters = 30
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    # symmetrize in ONE pass over the edge source (union of e with its
    # flip would consume the upstream plan twice — expensive when edges
    # come straight out of a near-dup pair join)
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("s"), F.col("d")),
                F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
            )
        ).alias("x")
    ).select("x.s", "x.d")
    # pre-partition on the join key and persist THAT: every round's
    # labels-edges join then reuses the cached distribution (Exchange
    # only on the small label side), instead of re-shuffling the edge
    # list once per round
    sym = sym.repartition("d").persist(StorageLevel.MEMORY_AND_DISK)

    if nodes is None:
        node_ids = sym.select(F.col("s").alias("id")).distinct()
    else:
        node_ids = nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))

    # LAZY localCheckpoint: the convergence aggregate right below is the
    # round's ONLY action — it computes every partition (a global sum),
    # which materializes the checkpoint in the SAME job, so each round
    # costs one Spark job instead of two (eager checkpoint + separate
    # agg). Lineage truncation and cached-partition reuse are identical
    # to the eager form once that first action has run.
    labels = node_ids.select("id", F.col("id").alias("comp")).localCheckpoint(
        eager=False
    )
    # decimal sum: immune to long overflow even at 1e9 nodes with 64-bit ids
    sum_expr = F.sum(F.col("comp").cast("decimal(38,0)"))
    prev_sum = labels.agg(sum_expr).first()[0]

    for _ in range(max_iters):
        neighbor = labels.join(sym, labels["id"] == sym["d"]).select(
            F.col("s").alias("id"), "comp"
        )
        new_labels = (
            labels.union(neighbor).groupBy("id").agg(F.min("comp").alias("comp"))
        ).localCheckpoint(eager=False)
        new_sum = new_labels.agg(sum_expr).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters — raise it, or use "
            "connected_components_star for chain-shaped graphs)"
        )

    sym.unpersist()
    return labels.select(
        F.col("id").alias(id_col), F.col("comp").alias(component_col)
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    component_col: str = "component",
    max_iters: int = 50,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., SoCC'14) — the documented escape hatch for CHAIN-shaped
    graphs (VERDICT r9 #7): same interface and same (id, component =
    min member id) output as `connected_components`, but convergence
    is O(log^2 n) ROUNDS regardless of graph diameter, where min-label
    propagation needs diameter rounds (a 512-node path: 10 alternating
    rounds vs 511 propagation rounds — test-pinned).

    Per round (both stars are one groupBy + one join keyed on node id,
    map-side-combinable, nothing collected):
    - large-star: around each node u, every LARGER neighbor re-hangs
      onto m = min(neighbors + self) — long tails fold toward minima
      without densifying small nodes;
    - small-star: edges orient larger -> smaller, and around each u
      every smaller neighbor (and u itself) hangs onto its min.
    Edges only ever re-point DOWNWARD, so the edge multiset hash is a
    monotone convergence witness: the loop stops when a full
    large+small round leaves the (count, hash-sum) signature unchanged
    — at that fixpoint the edge set IS the star labeling (u -> root).
    localCheckpoint truncates the iterative lineage per round, same as
    the propagation loop.

    Trade-off vs min-label: ~2x the shuffles per round and a distinct
    per star, so on near-clique dedup graphs (diameter 2-4) the
    default wins; on adversarial components (linked lists of
    paraphrase chains, web-graph tails) this is the difference between
    10 rounds and thousands."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
    )
    if nodes is None:
        node_ids = (
            e.select(F.col("u").alias("id"))
            .union(e.select(F.col("v").alias("id")))
            .distinct()
        )
    else:
        node_ids = (
            nodes.select(F.col(nodes.columns[0]).cast("long").alias("id"))
            .distinct()
        )

    # lazy checkpoint: _sig's count+hash aggregate computes every
    # partition, materializing the checkpoint in the same job (one job
    # per round instead of checkpoint + sig — see the label loop)
    E = e.distinct().localCheckpoint(eager=False)

    def _sig(frame: DataFrame) -> tuple:
        row = frame.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum of a 64-bit hash: an order-independent set
            # signature immune to long overflow
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = _sig(E)
    for _ in range(max_iters):
        # ---- large-star
        sym = E.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("x")
        ).select("x.u", "x.v")
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        # NO mid-round distinct (r16, guide §2.4): the small-star
        # distinct below collapses any duplicate large-star edges
        # identically (min over a multiset == min over a set, and the
        # join/union rows dedup at the round-end distinct), so the
        # round-end E is bit-identical with or without it — dropping it
        # removes one full (u, v) exchange + two hash aggregates per
        # round. Volume stays bounded: the large-star output is at most
        # one row per sym edge either way, and the round-end partial
        # aggregation still dedups map-side before its exchange.
        E = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # ---- small-star (edges now orient larger -> smaller)
        ori = E.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        smins = ori.groupBy("u").agg(F.min("v").alias("m"))
        E = (
            ori.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select(F.col("u"), F.col("m").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        cur = _sig(E)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iters} "
            "alternating rounds — pathological only beyond ~2^sqrt("
            f"{max_iters}) nodes; raise max_iters"
        )

    # fixpoint edges are (member -> root); roots and isolated nodes
    # label themselves
    member_labels = E.select(F.col("u").alias("id"), F.col("v").alias("comp"))
    singletons = node_ids.join(
        member_labels.select("id"), "id", "left_anti"
    ).select("id", F.col("id").alias("comp"))
    return member_labels.unionByName(singletons).select(
        F.col("id").alias(id_col), F.col("comp").alias(component_col)
    )


def components_update(
    labels: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame | None = None,
    id_col: str = "id",
    component_col: str = "component",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Incrementally fold a batch of new edges (and optional new nodes)
    into existing component labels WITHOUT recomputing components from
    scratch — the maintenance step the cross-corpus ingest gates
    (dedup.minhash/simhash `_cross`, similarity cross embedding
    near-dup) feed: each admitted crawl batch yields batch><corpus +
    batch self pairs, and the corpus' cluster labels must absorb them.

    Invariant: the result equals `connected_components` run on the
    full union graph (old membership + new edges + new nodes) — the
    unit tests assert exact equality.

    Why it's cheap: a component whose members touch NO new-edge
    endpoint cannot change (new edges are the only new connectivity),
    so only the TOUCHED components re-solve. Existing membership of a
    touched component is encoded as star edges (member -> label); the
    label is itself the component's min member id, so the star is a
    faithful, diameter-2 stand-in for the original edge set. The
    subgraph solve then runs over |touched members| + |batch| rows —
    independent of corpus size.

    At 100 TB: one semi-join finds touched components (shuffle keyed
    on id), one join keyed on component pulls their members, and the
    propagation loop runs on the small slice; the untouched label mass
    is a single anti-join pass-through with no propagation rounds.
    Labels only ever DECREASE (new mins can only merge components), so
    repeated batch folds converge exactly like the batch solver.
    """
    lab = labels.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(component_col).cast("long").alias("comp"),
    )
    e = new_edges.select(
        F.col(src).cast("long").alias("id_a"),
        F.col(dst).cast("long").alias("id_b"),
    )
    endpoints = (
        e.select(F.col("id_a").alias("id"))
        .union(e.select(F.col("id_b").alias("id")))
        .distinct()
    )
    touched_comps = (
        lab.join(endpoints, "id", "left_semi").select("comp").distinct()
    )
    touched = lab.join(touched_comps, "comp")
    # star edges reconstruct touched-component membership; the label
    # node (min id) is itself a member, so connectivity is preserved
    star = touched.select(
        F.col("id").alias("id_a"), F.col("comp").alias("id_b")
    )
    sub_nodes = endpoints.union(touched.select("id"))
    if new_nodes is not None:
        sub_nodes = sub_nodes.union(
            new_nodes.select(
                F.col(new_nodes.columns[0]).cast("long").alias("id")
            )
        )
    sub_labels = connected_components(
        star.union(e),
        src="id_a",
        dst="id_b",
        nodes=sub_nodes.distinct(),
        id_col="id",
        component_col="comp",
    )
    # a pre-labeled node re-solved in the subgraph must NOT also keep
    # its old row: untouched = everything whose component was not
    # touched. New-node singletons exist only in sub_labels.
    untouched = lab.join(touched_comps, "comp", "left_anti")
    return untouched.unionByName(sub_labels).select(
        F.col("id").alias(id_col), F.col("comp").alias(component_col)
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """One row per cluster: the canonical survivor (min id) + cluster size.

    The end state of a dedup pipeline: pairs -> components -> keep-list.
    Singleton documents (no near-dup) survive as their own cluster of 1.
    """
    comps = connected_components(
        pairs, src=src, dst=dst, nodes=docs.select(id_col), id_col=id_col
    )
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .select(F.col("component").alias(id_col), "cluster_size")
    )
