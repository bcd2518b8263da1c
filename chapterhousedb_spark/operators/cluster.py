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
not dup-shaped), the published alternating large-star/small-star
construction (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) converges in O(log^2 n) rounds; near-dup clustering
does not need it, so we keep the simpler propagation and document the
switch point.

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
    max_iters: int = 30,
) -> DataFrame:
    """(id, component) labels; component = min node id in the component.

    edges: undirected pairs (any orientation, duplicates fine).
    nodes: optional 1-column frame of ALL node ids — pass it to also
    label isolated nodes (singleton components), e.g. every document in
    a corpus, not only those appearing in some pair.

    Monotone convergence: labels only ever decrease, so the global
    label sum strictly decreases every non-converged round — one cheap
    1-row aggregate per round detects the fixpoint without a join.
    """
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

    labels = node_ids.select("id", F.col("id").alias("comp")).localCheckpoint()
    # decimal sum: immune to long overflow even at 1e9 nodes with 64-bit ids
    sum_expr = F.sum(F.col("comp").cast("decimal(38,0)"))
    prev_sum = labels.agg(sum_expr).first()[0]

    for _ in range(max_iters):
        neighbor = labels.join(sym, labels["id"] == sym["d"]).select(
            F.col("s").alias("id"), "comp"
        )
        new_labels = (
            labels.union(neighbor).groupBy("id").agg(F.min("comp").alias("comp"))
        ).localCheckpoint()
        new_sum = new_labels.agg(sum_expr).first()[0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds max_iters — raise it, or use a "
            "large-star/small-star implementation for chain-shaped graphs)"
        )

    sym.unpersist()
    return labels.select(
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
