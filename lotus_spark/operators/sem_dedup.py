"""sem_dedup — semantic near-duplicate removal.

Reference semantics (``lotus/sem_ops/sem_dedup.py:32-91``): self sim-join,
keep pairs with ``_scores > threshold``, build the duplicate graph, connected
components, drop all but one representative (minimum id) per component.

Spark design: exact-collapse → embeddings → pair generation → connected
components. The collapse (r10, hot-group guard): for threshold < 1,
identical inputs are duplicates of their min-id representative by
construction, so each exact group collapses BEFORE embedding — the RM
embeds each distinct value once and no pair block goes quadratic in a
hot value's multiplicity (zero-norm groups excluded; see sem_dedup).
Pair generation never emits a cartesian/BroadcastNestedLoop stage:

- ``strategy="exact"`` — chunk-pair blocking (``functions.dedup.scored_pairs``):
  rows hash into memory-bounded chunks, every chunk-pair is one
  ``applyInPandas`` task scoring its block with numpy (dim-ordered fold,
  value-identical to ``pair_cosine``). Exact at any N; Σ work is still
  O(n²) so it is the ≲10⁶-row tier.
- ``strategy="lsh"`` — multi-table random-hyperplane LSH candidate
  generation (``functions.dedup.lsh_candidate_pairs``) + exact within-bucket
  verify. Approximate recall (documented there), the 100 TB tier.
- ``strategy="auto"`` (default) — bounded count picks exact below
  ``exact_max`` rows, LSH above.

Components are computed by driver union-find when the edge set is small
(duplicate edges are sparse by construction), else by iterative min-label
propagation over DataFrames (each round is one join + groupBy; loops until a
fixpoint — the standard large-scale CC algorithm without GraphFrames).
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lotus_spark.functions.dedup import lsh_candidate_pairs, scored_pairs
from lotus_spark.operators.sem_index import _resolve_rm, with_embeddings

_DRIVER_CC_MAX_EDGES = 1_000_000


def connected_components_edges(edges: DataFrame, max_driver_edges: int = _DRIVER_CC_MAX_EDGES) -> DataFrame:
    """(src, dst) edge df → (id, component) df, component = min reachable id.

    The edge subtree is the expensive stage (pair scoring), so it is
    persisted before the size-probe ``count()`` — the follow-up
    ``collect()`` (or the propagation loop's repeated joins) read the
    cache instead of re-scoring every pair."""
    edges = edges.persist()
    # ONE job decides the tier AND fetches the driver path's rows (r14,
    # was a count job followed by a collect job): limit(max+1) bounds
    # the driver transfer at ~max edges (two longs each — tens of MB at
    # the 1M default) whether or not the edge set is huge; when the cap
    # is exceeded the distributed path recomputes from the persisted
    # edges exactly as before.
    rows = edges.limit(max_driver_edges + 1).collect()
    if not rows:
        edges.unpersist(False)
        return edges.sparkSession.createDataFrame([], "id long, component long")
    if len(rows) <= max_driver_edges:
        edges.unpersist(False)
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in rows:
            a, b = find(r["src"]), find(r["dst"])
            if a != b:
                parent[max(a, b)] = min(a, b)
        data = [(x, find(x)) for x in list(parent)]
        return edges.sparkSession.createDataFrame(data, "id long, component long")

    # distributed min-label propagation
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        und.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    spark = edges.sparkSession
    for _ in range(50):  # diameter bound; duplicates cluster tightly
        nbr = (
            und.join(labels, und.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint()
        changed = (
            labels.alias("a")
            .join(new_labels.alias("b"), "id")
            .filter(F.col("a.component") != F.col("b.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist(False)  # labels' lineage is truncated by localCheckpoint
    return labels


def sem_dedup(
    df: DataFrame,
    col: str,
    threshold: float,
    rm: Any = None,
    id_col: Optional[str] = None,
    emb_col: Optional[str] = None,
    strategy: str = "auto",
    exact_max: int = 200_000,
    max_block_rows: int = 2048,
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Remove semantic near-duplicates of ``col`` at cosine > ``threshold``.

    Keeps the minimum-id representative of each duplicate component.
    ``id_col`` should be a stable unique long column; if absent one is
    derived (and the df persisted so ids stay consistent across the plan).
    ``strategy``: "auto" | "exact" (chunk-pair blocked, exact) | "lsh"
    (multi-table LSH candidates, approximate recall at scale).
    """
    work = df
    own_id = id_col is None
    if own_id:
        id_col = "__dedup_id"
        work = work.withColumn(id_col, F.monotonically_increasing_id())
        work = work.localCheckpoint()  # freeze ids across the self-join
    full = work  # pre-collapse frame: the anti-join target at the end

    # EXACT-COLLAPSE PREFIX (r10 — the hot-group guard, same shape as
    # minhash_lsh_dedup's): identical inputs embed identically, so for
    # threshold < 1 every copy is a duplicate of its group's min-id
    # representative BY CONSTRUCTION (cosine of a nonzero vector with
    # itself is 1). Collapsing first — one aggregate + AQE-splittable
    # null-safe join, never a value-partitioned window — means the RM
    # embeds each distinct value ONCE (m copies of one boilerplate page
    # previously cost m embeddings) and the pair stage's blocks are
    # bounded by distinct-value multiplicity instead of going quadratic
    # inside the hot LSH bucket / chunk every copy lands in. The
    # zero-norm corner is excluded below (scored_pairs gives a zero
    # embedding cosine 0 with itself, not 1, so those groups must NOT
    # collapse); at thresholds within float-fold ulps of 1.0 the
    # collapse uses the mathematical cosine(e,e)=1 rather than the
    # fold's rounding. emb_col-supplied rows collapse on the EMBEDDING
    # (caller-provided vectors need not be determined by ``col``).
    exact_rm = None
    if threshold < 1.0:
        key = emb_col if emb_col is not None else col
        grp = work.groupBy(key).agg(F.min(id_col).alias("__keep"))
        tagged = work.join(
            grp.withColumnRenamed(key, "__gkey"),
            F.col(key).eqNullSafe(F.col("__gkey")),
        ).drop("__gkey")
        work = tagged.filter(F.col(id_col) == F.col("__keep")) \
                     .drop("__keep")
        exact_rm = (
            tagged.filter(F.col(id_col) != F.col("__keep"))
            .select(F.col(id_col), F.col("__keep"))
        )

    ecol = emb_col
    if ecol is None:
        work = with_embeddings(work, col, _resolve_rm(rm), "__emb")
        ecol = "__emb"

    if exact_rm is not None:
        # groups whose representative embeds to the ZERO vector keep all
        # their members: the uncollapsed pipeline scores cosine(0,0)=0,
        # never > threshold
        sumsq = F.aggregate(
            F.col(ecol).cast("array<double>"), F.lit(0.0),
            lambda acc, x: acc + x * x)
        zero_reps = work.filter(sumsq == 0.0) \
                        .select(F.col(id_col).alias("__zk"))
        exact_rm = (
            exact_rm.join(zero_reps,
                          exact_rm["__keep"] == zero_reps["__zk"],
                          "left_anti")
            .select(id_col)
        )

    if strategy == "auto":
        # bounded count: scans at most exact_max+1 rows, never the full table
        n_bounded = work.select(id_col).limit(exact_max + 1).count()
        strategy = "exact" if n_bounded <= exact_max else "lsh"
    if strategy == "exact":
        pairs = scored_pairs(
            work, id_col, ecol, threshold,
            max_block_rows=max_block_rows, strict=True,
        )
    elif strategy == "lsh":
        pairs = lsh_candidate_pairs(
            work, id_col, ecol, threshold,
            n_planes=n_planes, n_tables=n_tables, seed=seed,
            max_block_rows=max_block_rows, strict=True,
        )
    else:
        raise ValueError(f"unknown sem_dedup strategy: {strategy!r}")
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    comps = connected_components_edges(edges)
    # representative = min id per component; drop every other member
    removal = (
        comps.groupBy("component")
        .agg(F.min("id").alias("keep"))
        .join(comps, "component")
        .filter(F.col("id") != F.col("keep"))
        .select(F.col("id").alias(id_col))
    )
    if exact_rm is not None:
        removal = removal.unionByName(exact_rm)
    # anti-join the PRE-collapse frame: survivors keep their original
    # columns (the derived __emb only ever existed on the rep subset)
    out = full.join(removal, id_col, "left_anti")
    return out.drop(id_col) if own_id else out
