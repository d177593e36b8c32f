"""Large-scale deduplication operators (exact, MinHash-LSH, SimHash, Jaccard).

These extend the reference's ``sem_dedup`` (embedding near-dup) with the
standard pretraining-corpus dedup family. Everything is pure Spark SQL
higher-order expressions — hashes are explicit polynomial folds (mod 1e9+7),
not engine hash builtins, so every stage has an exact DuckDB SQL oracle and
is reproducible across engines.

Scale design: exact dedup is one hash-aggregate; MinHash-LSH is
shingle→signature (map-side, no shuffle) → band-key explode → groupBy band
(one shuffle bounded by band count) → candidate pairs only within buckets →
union-find. No O(n²) stage anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lotus_spark.functions.text import MOD, shingle_hash, word_shingles

# deterministic affine hash family h_j(x) = (a_j * x + b_j) mod MOD
_A_MULT = 2_654_435_761  # Knuth multiplicative constant
_B_MULT = 40_503


def _hash_params(j: int) -> tuple[int, int]:
    a = (_A_MULT * (j + 1) + 1) % MOD
    b = (_B_MULT * (j + 1) + 7) % MOD
    return a, b


from lotus_spark.partitioning import ensure_parallelism  # noqa: F401  (re-export)


def exact_dedup(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per exact value of ``col`` (hash-aggregate dedup).

    Shape (r10): aggregate + semi-join, NOT a window over ``col`` — a
    window partitioned on the text puts every copy of a hot value
    (boilerplate repeated millions of times in a real crawl) into ONE
    task, which AQE cannot split. The aggregate computes min-id per
    value with map-side combine (hot keys reduce before the shuffle);
    the semi-join keys on the UNIQUE id, so no stage carries a skewed
    partition. Requires ``id_col`` to be unique (the dedup contract
    everywhere in this module)."""
    keep = (
        df.select(col, id_col)
        .groupBy(col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "semi")


def minhash_expr(col: Column, n_hashes: int = 16,
                 shingle_n: int = 3) -> Column:
    """The MinHash signature (``array<long>``) as a pure Column
    expression — usable on batch AND streaming DataFrames (the same
    batch/stream split as ``simhash_expr``): shingle → polynomial hash →
    per-hash-function min, all inside the scan projection."""
    hashes = F.transform(word_shingles(col, shingle_n), shingle_hash)

    # r14: bind the hashed-shingle array to a lambda variable so the
    # shingle → polynomial-hash subtree evaluates ONCE per row. Catalyst
    # expressions are trees, not DAGs: referencing ``hashes`` in each of
    # the n_hashes min-branches duplicated the whole (string-heavy,
    # interpreted — higher-order functions never reach codegen or its
    # subexpression elimination) shingle pipeline 16x per row. Measured
    # 7.07s → 0.71s for the signature pass over sf0.1 documents
    # (noop sink), output bit-identical.
    def _sig(H: Column) -> Column:
        sigs = []
        for j in range(n_hashes):
            a, b = _hash_params(j)
            sigs.append(
                F.array_min(
                    F.transform(
                        H, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MOD))
                )
            )
        return F.array(*sigs)

    return F.element_at(F.transform(F.array(hashes), _sig), 1)


def minhash_band_keys(sig: Column, n_hashes: int, bands: int) -> list[Column]:
    """The ``bands`` LSH band-key expressions over a signature column —
    shared by ``minhash_lsh_dedup`` and ``streaming_neardup_minhash`` so
    the batch and streaming tiers bucket identically."""
    rows_per_band = n_hashes // bands
    return [
        F.concat_ws(
            "_",
            F.lit(i),
            *[sig[i * rows_per_band + j] for j in range(rows_per_band)],
        )
        for i in range(bands)
    ]


def minhash_signature(df: DataFrame, col: str, n_hashes: int = 16,
                      shingle_n: int = 3, out_col: str = "minhash") -> DataFrame:
    """Append ``array<long>`` MinHash signature of word-``shingle_n``-gram sets.

    Map-side only: shingle → polynomial hash → per-hash-function min. At
    100 TB this runs inside the scan projection with zero shuffle.
    """
    df = ensure_parallelism(df)
    return df.withColumn(out_col, minhash_expr(F.col(col), n_hashes, shingle_n))


def _rep_components(
    reps: DataFrame,
    col: str,
    id_col: str,
    n_hashes: int,
    bands: int,
    shingle_n: int,
    jaccard_threshold: float,
) -> DataFrame:
    """Banded LSH candidate generation + exact-Jaccard verify + connected
    components over exact-group REPRESENTATIVES → ``(id, component)``
    where ``component`` is the min member id of each multi-member
    component (singletons are absent — callers coalesce to the rep id).

    This is the shared core of :func:`minhash_lsh_dedup` and
    :func:`minhash_clusters`; it assumes the hot-bucket exact-collapse
    already happened (``reps`` holds one row per distinct text)."""
    from lotus_spark.operators.sem_dedup import connected_components_edges

    edges, sigd = _rep_edges(
        reps, col, id_col, n_hashes, bands, shingle_n, jaccard_threshold)
    comps = connected_components_edges(edges)
    # CC materialized (persisted or collected) the edge rows, so the
    # signature cache has served all three consumers
    sigd.unpersist(False)
    return comps


def _rep_edges(
    reps: DataFrame,
    col: str,
    id_col: str,
    n_hashes: int,
    bands: int,
    shingle_n: int,
    jaccard_threshold: float,
) -> tuple[DataFrame, DataFrame]:
    """The (lazy) verified-edge subtree of :func:`_rep_components`:
    returns ``(edges, sigd)`` where ``edges`` is the distinct
    ``(src, dst)`` set of threshold-passing rep pairs and ``sigd`` the
    persisted per-rep signature cache the caller must unpersist once
    the edges are materialized. Factored out so the plan-shape test can
    pin the narrow-exchange claims below without executing CC."""
    from pyspark import StorageLevel

    # ONE pinned row per rep (id, minhash, shingles): the band explosion
    # and both shingle fetches below re-read this cache map-side, so the
    # expensive signature + shingle map stage runs once — and, unlike
    # the pre-r14 shape (persist AFTER the band explosion, shingles on
    # both sides of the band join), the cache holds each row once
    # instead of bands× and NO exchange in the plan ever carries a
    # shingle array or a signature. Same narrow-candidate discipline as
    # ``neardup_join_index`` (tests/test_plan_shapes.py pins both).
    sigd = (
        minhash_signature(reps, col, n_hashes, shingle_n)
        .withColumn("__shingles", word_shingles(F.col(col), shingle_n))
        .select(F.col(id_col).alias("__rid"), "minhash", "__shingles")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    band_keys = minhash_band_keys(F.col("minhash"), n_hashes, bands)
    banded = sigd.select(
        "__rid", F.explode(F.array(*band_keys)).alias("__band"))

    # candidate generation joins (band, id) rows only — two longs and a
    # band string per row — and the pair dedup exchange is two longs
    cand = (
        banded.select("__band", F.col("__rid").alias("src"))
        .join(banded.select("__band", F.col("__rid").alias("dst")),
              "__band")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # exact-Jaccard verify fetches shingles BY ID, candidate-bounded:
    # the deduped pair set is usually small, so AQE broadcasts it and
    # the cached shingle rows stream map-side — shingle arrays cross
    # zero exchanges on that path (and at most one copy per side on the
    # sort-merge fallback, versus bands× through the old band join)
    sa = sigd.select(F.col("__rid").alias("src"),
                     F.col("__shingles").alias("__sa"))
    sb = sigd.select(F.col("__rid").alias("dst"),
                     F.col("__shingles").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    union = F.size(F.array_union(F.col("__sa"), F.col("__sb")))
    edges = (
        cand.join(sa, "src").join(sb, "dst")
        .withColumn("__j", inter.cast("double") / union.cast("double"))
        .filter(F.col("__j") >= jaccard_threshold)
        .select("src", "dst")
    )
    return edges, sigd


def minhash_lsh_dedup(
    df: DataFrame,
    col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    keep_by: str | None = None,
    keep_ascending: bool = False,
) -> DataFrame:
    """MinHash + LSH near-duplicate removal; keeps min-id per duplicate group.

    exact-collapse → signature → ``bands`` band-keys → explode → groupBy
    band bucket → candidate pairs inside buckets → exact Jaccard verify
    on shingle sets → connected components → anti-join removals.

    HOT-BUCKET GUARD (r10, the exact-collapse prefix): a group of m
    IDENTICAL texts shares every band bucket, so the banded self-join
    alone would emit m²/2 candidate pairs — the classic LSH pathology on
    real crawls, where one boilerplate page repeats millions of times
    and would turn the candidate stage quadratic. Identical texts are
    J=1 duplicates of their group minimum by definition, so each exact
    group first collapses to its min-id representative (one linear
    aggregate + skew-splittable join — no text-partitioned window), the
    banded pipeline runs over representatives only, and non-
    representatives join the removal set directly. The result is
    IDENTICAL to running the full pipeline: a component's keep id =
    min over members = min over its representatives, and even the
    degenerate groups (identical NULL or sub-shingle texts, which the
    banded stage dedups through their identical constant signatures)
    collapse to the same min-id survivor. Pinned by
    ``test_minhash_lsh_dedup_exact_collapse_semantics`` and the
    unchanged oracle row.

    KEEP POLICY (r11): ``keep_by`` names a score column — the survivor
    of each near-dup cluster is then the member maximizing that column
    (minimizing with ``keep_ascending=True``), ties broken by min id —
    the canonical-document selection real curation pipelines use ("keep
    the longest / highest-quality copy"), instead of an arbitrary id.
    NULL scores lose to any non-NULL score; an all-NULL cluster falls
    back to min id. Cluster membership is IDENTICAL to the default
    path (same signature/band/verify algebra); only survivor choice
    differs, so row counts match the min-id policy exactly.
    """
    if keep_by is not None:
        clustered = minhash_clusters(
            df, col, id_col, n_hashes, bands, shingle_n,
            jaccard_threshold, cluster_col="__cluster",
        )
        agg = F.min if keep_ascending else F.max
        best = clustered.groupBy("__cluster").agg(
            agg(F.col(keep_by)).alias("__best")
        )
        # eqNullSafe: an all-NULL-score cluster still elects its min-id
        # member (NULL == NULL), never silently vanishing
        keep = (
            clustered.join(best, "__cluster")
            .filter(F.col(keep_by).eqNullSafe(F.col("__best")))
            .groupBy("__cluster")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        return df.join(keep, id_col, "semi")

    grp = df.groupBy(col).agg(F.min(id_col).alias("__keep"))
    # null-safe equality so NULL texts collapse as one exact group too —
    # the same outcome the banded stage always gave them (identical
    # constant signatures verify as duplicates); hot exact-groups are an
    # AQE-splittable join here, never a text-partitioned window
    tagged = df.join(
        grp.withColumnRenamed(col, "__gcol"),
        F.col(col).eqNullSafe(F.col("__gcol")),
    ).drop("__gcol")
    reps = tagged.filter(F.col(id_col) == F.col("__keep")).drop("__keep")
    exact_rm = (
        tagged.filter(F.col(id_col) != F.col("__keep"))
        .select(F.col(id_col))
    )

    comps = _rep_components(
        reps, col, id_col, n_hashes, bands, shingle_n, jaccard_threshold
    )
    removal = (
        comps.groupBy("component")
        .agg(F.min("id").alias("keep"))
        .join(comps, "component")
        .filter(F.col("id") != F.col("keep"))
        .select(F.col("id").alias(id_col))
        .unionByName(exact_rm)  # collapsed exact duplicates
    )
    return df.join(removal, id_col, "left_anti")


def minhash_clusters(
    df: DataFrame,
    col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Assign every row its near-duplicate CLUSTER id (the min member id
    of its MinHash-LSH connected component; a row with no near-dups is
    its own singleton cluster) instead of dropping duplicates.

    Same algebra as :func:`minhash_lsh_dedup` — exact-collapse prefix
    (hot-bucket guard), banded signature over representatives, exact
    Jaccard verify, connected components — so ``df.filter(id ==
    cluster_id)`` is NOT quite the dedup (survivor choice there is min
    id per component over ALL members, which this equals: each rep is
    already the min of its exact group, and the component id is the min
    over reps). Exposing the mapping enables cluster-aware policies:
    keep-best survivor selection (``minhash_lsh_dedup(keep_by=...)``),
    leakage-safe splits (:func:`leakage_safe_split`), per-cluster
    diagnostics.

    Scale: identical to the dedup plan plus ONE extra join expanding
    rep components back to members — keyed on the rep id (unique per
    exact group), so hot boilerplate groups stay AQE-splittable.
    """
    from pyspark import StorageLevel

    grp = df.groupBy(col).agg(F.min(id_col).alias("__rep"))
    # consumed twice (rep extraction + final expansion join): persist so
    # the text-keyed tag join — the widest shuffle here — runs once
    tagged = df.join(
        grp.withColumnRenamed(col, "__gcol"),
        F.col(col).eqNullSafe(F.col("__gcol")),
    ).drop("__gcol").persist(StorageLevel.MEMORY_AND_DISK)
    reps = tagged.filter(F.col(id_col) == F.col("__rep")).drop("__rep")
    comps = _rep_components(
        reps, col, id_col, n_hashes, bands, shingle_n, jaccard_threshold
    )
    repmap = comps.select(F.col("id").alias("__rep"), F.col("component"))
    return (
        tagged.join(repmap, "__rep", "left")
        .withColumn(cluster_col, F.coalesce(F.col("component"), F.col("__rep")))
        .drop("__rep", "component")
    )


def leakage_safe_split(
    df: DataFrame,
    col: str,
    id_col: str,
    weights: dict[str, float],
    seed: int = 0,
    split_col: str = "split",
    cluster_col: str = "cluster_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Train/val/test assignment where near-duplicate documents NEVER
    straddle a split boundary: rows are clustered by MinHash-LSH
    (:func:`minhash_clusters`), then the whole CLUSTER is hash-assigned
    to one split (``hash_split`` on the cluster id). A plain per-row
    hash split leaks — a near-copy of a training document lands in the
    eval split ~(1-w_train) of the time and inflates eval scores; here
    the copy shares its twin's cluster id and therefore its split.

    Returns ``df`` + ``cluster_col`` + ``split_col``. Split proportions
    hold over CLUSTERS (and approximately over rows when duplication is
    not pathologically concentrated — exactly the regime after dedup).
    """
    from lotus_spark.functions.sampling import hash_split

    clustered = minhash_clusters(
        df, col, id_col, n_hashes, bands, shingle_n,
        jaccard_threshold, cluster_col=cluster_col,
    )
    return hash_split(clustered, cluster_col, weights, seed=seed,
                      split_col=split_col)


def dedup_and_split(
    df: DataFrame,
    col: str,
    id_col: str,
    weights: dict[str, float],
    keep_by: str | None = None,
    keep_ascending: bool = False,
    seed: int = 0,
    split_col: str = "split",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-dup dedup AND leakage-safe split from ONE clustering pass.

    Calling ``minhash_lsh_dedup`` then ``leakage_safe_split`` separately
    runs the banded LSH pipeline twice — and the second run is useless,
    because post-dedup survivors are all singletons and the "leakage-
    safe" split degenerates to a plain per-row hash split. This fuses
    them on the single :func:`minhash_clusters` pass: the cluster id
    drives BOTH the survivor election (min id, or ``keep_by`` argmax)
    and the split label (``hash_split`` on the cluster id) — so the
    surviving canonical document carries the split its whole duplicate
    cluster was assigned, and any near-dup that later leaks past the
    dedup (or arrives in a future increment and dedups against this
    corpus) hashes to the SAME split. Returns the survivors of ``df``
    plus ``split_col``.
    """
    from lotus_spark.functions.sampling import hash_split

    clustered = minhash_clusters(
        df, col, id_col, n_hashes, bands, shingle_n,
        jaccard_threshold, cluster_col="__cluster",
    )
    if keep_by is None:
        keep = clustered.groupBy("__cluster").agg(
            F.min(id_col).alias(id_col)
        )
    else:
        agg = F.min if keep_ascending else F.max
        best = clustered.groupBy("__cluster").agg(
            agg(F.col(keep_by)).alias("__best")
        )
        keep = (
            clustered.join(best, "__cluster")
            .filter(F.col(keep_by).eqNullSafe(F.col("__best")))
            .groupBy("__cluster")
            .agg(F.min(id_col).alias(id_col))
        )
    labeled = hash_split(keep, "__cluster", weights, seed=seed,
                         split_col=split_col)
    return df.join(
        labeled.select(id_col, split_col), id_col, "inner"
    )


def simhash_expr(col: Column, n_bits: int = 32) -> Column:
    """The SimHash fingerprint as a pure Column expression — usable on
    batch AND streaming DataFrames (no ensure_parallelism, which needs
    ``df.rdd`` and is illegal on a stream); ``simhash`` wraps it for the
    batch path."""
    from lotus_spark.functions.text import tokens

    tok_hashes = F.transform(tokens(col), shingle_hash)
    zero = F.array_repeat(F.lit(0).cast("long"), n_bits)
    bitvec = lambda h: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda b: (F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2) * 2 - 1,
    )
    sums = F.aggregate(
        tok_hashes, zero, lambda acc, h: F.zip_with(acc, bitvec(h), lambda x, y: x + y)
    )
    return F.aggregate(
        F.zip_with(
            sums,
            F.sequence(F.lit(0), F.lit(n_bits - 1)).cast("array<long>"),
            lambda s, b: F.when(s > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def simhash(df: DataFrame, col: str, n_bits: int = 32,
            out_col: str = "simhash") -> DataFrame:
    """Append a ``n_bits``-bit SimHash of the whitespace token multiset.

    bit b of the fingerprint = sign of Σ_tokens (2·bit_b(hash(token)) − 1).
    Pure column expressions; identical in DuckDB via list_reduce.
    """
    df = ensure_parallelism(df)
    return df.withColumn(out_col, simhash_expr(F.col(col), n_bits))


def _hash_strings_np(strs, np):
    """Vectorized polynomial string hash: fold (acc*31 + codepoint) % MOD
    over a padded codepoint matrix — identical values to ``shingle_hash``
    (F.ascii returns the codepoint; utf-32-le decode gives the same), but
    ~len(str) vectorized numpy steps instead of per-char interpreted
    Catalyst lambda evals. No int64 overflow: acc < 1e9+7, so
    acc*31 + code < 3.2e10 « 2^63."""
    n = len(strs)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    bufs = [s.encode("utf-32-le") for s in strs]
    lens = np.fromiter((len(b) // 4 for b in bufs), dtype=np.int64, count=n)
    max_len = int(lens.max())
    codes = np.zeros((n, max(max_len, 1)), dtype=np.int64)
    for i, b in enumerate(bufs):
        if b:
            codes[i, : len(b) // 4] = np.frombuffer(b, dtype=np.uint32).astype(np.int64)
    out = np.zeros(n, dtype=np.int64)
    for j in range(max_len):
        active = j < lens
        out = np.where(active, (out * 31 + codes[:, j]) % MOD, out)
    return out


def _shingle_postings_pandas(df, col, id_col, shingle_n, block_col):
    """Exploded posting relation (id, [__blk], sh) via mapInPandas.

    Value-identical to
    ``explode(array_distinct(transform(word_shingles(col, n), shingle_hash)))``
    but built in vectorized numpy — the Catalyst higher-order-function
    evaluators are interpreted (never codegen'd) and their throughput
    degrades badly once a long-lived session has run many distinct lambda
    shapes (megamorphic call sites), which made this map stage the dominant,
    high-variance cost. Tokenization mirrors Spark's SQL semantics
    exactly: ``trim`` strips ONLY ASCII spaces (0x20 — NOT Java
    String.trim's <= U+0020; a leading tab survives and yields a leading
    empty token, same as the expression path and the DuckDB oracle);
    split on Java ``\\s`` = ASCII [ \\t\\n\\x0b\\f\\r] only (Python
    ``\\s`` would also eat unicode spaces).
    """
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    fields = [StructField("id", df.schema[id_col].dataType)]
    if block_col:
        fields.append(StructField("__blk", df.schema[block_col].dataType))
    fields.append(StructField("sh", LongType()))
    schema = StructType(fields)
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def gen(batches):
        for pdf in batches:
            ids, blks, doc_counts, shingles = [], [], [], []
            texts = pdf[col]
            id_vals = pdf[id_col]
            blk_vals = pdf[block_col] if block_col else None
            for i in range(len(pdf)):
                text = texts.iat[i]
                if text is None:
                    continue  # expr path: transform(null) -> explode drops it
                toks = ws.split(text.strip(" ").lower())
                if len(toks) <= shingle_n:
                    doc_sh = [" ".join(toks)]
                else:
                    doc_sh = list(
                        dict.fromkeys(
                            " ".join(toks[j : j + shingle_n])
                            for j in range(len(toks) - shingle_n + 1)
                        )
                    )
                shingles.extend(doc_sh)
                doc_counts.append(len(doc_sh))
                ids.append(id_vals.iat[i])
                if block_col:
                    blks.append(blk_vals.iat[i])
            hashes = _hash_strings_np(shingles, np)
            # per-doc distinct over HASH values (matches array_distinct on
            # the hashed array: distinct strings could still collide)
            out_id, out_blk, out_sh = [], [], []
            pos = 0
            for k, cnt in enumerate(doc_counts):
                uniq = np.unique(hashes[pos : pos + cnt])
                pos += cnt
                out_sh.append(uniq)
                out_id.extend([ids[k]] * len(uniq))
                if block_col:
                    out_blk.extend([blks[k]] * len(uniq))
            data = {"id": out_id}
            if block_col:
                data["__blk"] = out_blk
            data["sh"] = np.concatenate(out_sh) if out_sh else np.empty(0, np.int64)
            yield pd.DataFrame(data)

    return df.mapInPandas(gen, schema)


def _cooccurrence_counts(l_docs, l_sh, r_docs, r_sh, n_l, n_r):
    """Dense (n_l × n_r) matrix of common-shingle counts from two posting
    lists (doc index, shingle group id) — sparse path: expand only actual
    co-occurrences (Σ f_l·f_r pair emissions) and bincount them, instead of
    a dense doc×shingle matmul that multiplies ~99.9% zeros. Falls back to
    the BLAS matmul when the posting density makes the dense product
    competitive (co-occurrences ≳ cells). Exact either way: counts are
    integers ≤ 2^53 in float64.
    """
    import numpy as np

    ol = np.argsort(l_sh, kind="stable")
    l_sh_s, l_docs_s = l_sh[ol], l_docs[ol]
    orr = np.argsort(r_sh, kind="stable")
    r_sh_s, r_docs_s = r_sh[orr], r_docs[orr]
    ul, l_start = np.unique(l_sh_s, return_index=True)
    cl = np.diff(np.append(l_start, len(l_sh_s)))
    ur, r_start = np.unique(r_sh_s, return_index=True)
    cr = np.diff(np.append(r_start, len(r_sh_s)))
    _, ia, ib = np.intersect1d(ul, ur, assume_unique=True, return_indices=True)
    C = np.zeros((n_l, n_r))
    if not len(ia):
        return C
    cl_c, cls = cl[ia], l_start[ia]
    cr_c, crs = cr[ib], r_start[ib]
    T = int((cl_c * cr_c).sum())
    n_sh = max(len(ul), len(ur))
    if T > n_l * n_r * max(n_sh, 1) // 8:  # dense matmul cheaper
        ML = np.zeros((n_l, n_sh + 1))
        ML[l_docs, np.searchsorted(ul, l_sh)] = 1.0
        MR = np.zeros((n_r, n_sh + 1))
        rpos = np.searchsorted(ul, r_sh)
        in_l = (rpos < len(ul)) & (ul[np.minimum(rpos, len(ul) - 1)] == r_sh)
        MR[r_docs[in_l], rpos[in_l]] = 1.0
        return ML @ MR.T

    def ranges(counts):
        total = int(counts.sum())
        starts = np.cumsum(counts) - counts
        return np.arange(total) - np.repeat(starts, counts)

    # one row per L posting of a common shingle, paired with every R posting
    # of the same shingle (grouped-arange expansion, fully vectorized)
    lpos = np.repeat(cls, cl_c) + ranges(cl_c)
    lgrp = np.repeat(np.arange(len(ia)), cl_c)
    reps = cr_c[lgrp]
    l_pair = np.repeat(l_docs_s[lpos], reps)
    r_pair = r_docs_s[np.repeat(crs[lgrp], reps) + ranges(reps)]
    codes = l_pair.astype(np.int64) * n_r + r_pair
    return np.bincount(codes, minlength=n_l * n_r).astype(np.float64).reshape(
        n_l, n_r
    )


def jaccard_sim_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    algorithm: str = "auto",
    chunks: int | str = "auto",
) -> DataFrame:
    """All pairs (a, b), a<b, with shingle-set Jaccard ≥ threshold. Exact.

    ``algorithm="auto"`` (default) sizes the plan from one cheap
    aggregation: bounded blocks → ``"block"`` (no pair-row shuffle),
    unbounded → ``"count"``.

    Physical strategies, same result:
    - ``algorithm="count"``: posting-list join on *hashed* shingles
      (long keys — cheap shuffles) → groupBy(a,b) count → join sizes. Rows
      stay narrow (2-3 longs) through every shuffle. Only pairs sharing ≥1
      shingle are materialized — no cross product. Best general choice.
    - ``algorithm="prefix"``: AllPairs/PPJoin prefix filter — each doc's
      shingles ordered rarest-first (global doc-frequency), only the first
      ``len - ceil(t·len) + 1`` generate candidates (no true pair lost),
      then candidates verify with an array-intersect join. Wins when the
      threshold is high (≥~0.7) so prefixes collapse; loses at low
      thresholds where it degrades to the count plan plus verify overhead.
    - ``algorithm="block"``: block-local dense counting — one
      ``applyInPandas`` per ``block_col`` group builds the doc×shingle 0/1
      matrix and computes ALL pairwise common-shingle counts as one BLAS
      matmul (exact: counts ≤ 2^53 in float64). No pair rows ever shuffle;
      each block's postings cross the wire once. Requires every block to
      fit one task's memory — the right tier when blocks are bounded
      (language, LSH bucket, cluster id); use ``"count"`` when a block can
      be unboundedly large.
    ``block_col`` (e.g. language) bounds the pair space for all three.

    Growth caveat (measured, ``tools/scale_probe.py``): exact pair mining
    is Σ|block|² COMPUTE by definition, so a FIXED-cardinality block key
    (language) makes per-block work grow quadratically with the corpus —
    the 1x→10x probe measured ~5x wall on 32 fixed cores and the curve
    steepens from there. At 100 TB use a data-scaled block key (LSH
    bucket, cluster id — block sizes stay bounded as the corpus grows) or
    the linear ``minhash_lsh_dedup`` path; exact-within-language is for
    bounded corpora and verification passes.
    """
    if algorithm not in ("count", "prefix", "block", "auto"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}; pick 'count', 'prefix', "
            "'block' or 'auto'"
        )
    max_block: int | None = None
    n_blocks = 1
    if algorithm == "auto" or (chunks == "auto" and algorithm == "block"):
        # one column-pruned aggregation (map-side-combined count per block)
        # sizes the plan: bounded blocks → block-local counting (no pair-row
        # shuffle); unbounded → posting join. The same pass yields the block
        # count that sizes the chunk fan-out below.
        if block_col is None:
            max_block = df.count()
        else:
            g = (
                df.groupBy(block_col).count()
                .agg(F.max("count").alias("m"), F.count("*").alias("b"))
                .first()
            )
            max_block = g["m"] or 0
            n_blocks = max(g["b"] or 1, 1)
    if algorithm == "auto":
        algorithm = "block" if max_block <= 200_000 else "count"
    if chunks == "auto":
        # Two constraints, take the max: (a) enough chunk-pair groups that
        # the counting stage saturates the cluster even with few blocks
        # (n_blocks · s(s+1)/2 ≳ 3·cores — measured: parallelism beats the
        # ∝s posting-replication cost until s is large); (b) the dense
        # chunk-pair count matrix stays ~0.5 GB (chunk ≤ 8192 docs, so a
        # 200k-doc hot block splits into 25 chunks / 325 bounded tasks).
        import math

        cores = df.sparkSession.sparkContext.defaultParallelism
        want_groups = max(1, (3 * cores) // n_blocks)
        s_par = math.ceil((math.sqrt(8 * want_groups + 1) - 1) / 2)
        s_mem = -(-int(max_block or 0) // 8192)
        chunks = max(s_par, s_mem, 1)
    if algorithm == "block":
        import numpy as np
        import pandas as pd

        df = ensure_parallelism(df)  # shingle hashing must not run on one core

        # Chunked all-pairs matmul: docs hash into `s` chunks per block; each
        # unordered chunk-pair (ci <= cj) is one applyInPandas task that
        # counts common shingles for its docs with a single BLAS matmul.
        # Every unordered doc pair lives in exactly one chunk-pair group, so
        # pairs are emitted exactly once. This (a) splits a hot block's n^2
        # work across s(s+1)/2 tasks, and (b) bounds task memory by chunk
        # size, not block size. Replication cost: each posting row is
        # shipped to ~s/2 groups — linear in s, versus the f^2 pair-row
        # shuffle it replaces. `chunks` trades shuffle volume (∝ s) against
        # task-level parallelism (s(s+1)/2 tasks/block) and task memory
        # (chunk = block/s): raise it for huge blocks, lower it when blocks
        # are small and the posting replication dominates.
        s = max(1, chunks)
        post = _shingle_postings_pandas(df, col, id_col, shingle_n, block_col)
        if block_col is None:
            post = post.withColumn("__blk", F.lit(1))
        base = post.withColumn("__c", F.pmod(F.hash("id"), F.lit(s)))
        # Both sides emitted from ONE explode: row with chunk c joins group
        # (min(c,j), max(c,j)) for every j, as L when j >= c (its own row /
        # right neighbors) else R. A two-branch union here would reference
        # the posting subtree twice and Catalyst plans are trees, not DAGs —
        # the corpus-wide shingle-hash pass would execute once per branch.
        sides = base.select(
            "__blk", "__c", "id", "sh",
            F.explode(F.sequence(F.lit(0), F.lit(s - 1))).alias("__j"),
        ).select(
            "__blk",
            F.least("__c", "__j").alias("__ci"),
            F.greatest("__c", "__j").alias("__cj"),
            F.when(F.col("__j") >= F.col("__c"), F.lit("L"))
            .otherwise(F.lit("R")).alias("__side"),
            "id", "sh",
        )

        def _count_chunk_pair(key, pdf: pd.DataFrame) -> pd.DataFrame:
            _, ci, cj = key
            empty = pd.DataFrame({"a": [], "b": [], "jaccard": []}).astype(
                {"a": "int64", "b": "int64", "jaccard": "float64"}
            )
            _, inv_sh = np.unique(pdf["sh"].to_numpy(), return_inverse=True)
            is_l = (pdf["__side"] == "L").to_numpy()
            lids, linv = np.unique(pdf["id"].to_numpy()[is_l], return_inverse=True)
            szl = np.bincount(linv, minlength=len(lids)).astype(np.float64)
            if ci == cj:  # diagonal group: self pairs among L
                if len(lids) < 2:
                    return empty
                C = _cooccurrence_counts(
                    linv, inv_sh[is_l], linv, inv_sh[is_l], len(lids), len(lids)
                )
                ia, ib = np.triu_indices(len(lids), k=1)
                common = C[ia, ib]
                jac = np.divide(
                    common, szl[ia] + szl[ib] - common,
                    out=np.zeros_like(common, dtype=np.float64),
                    where=common > 0,
                )
                keep = (jac >= threshold) & (common > 0)
                return pd.DataFrame(
                    {"a": lids[ia[keep]], "b": lids[ib[keep]], "jaccard": jac[keep]}
                )
            rids, rinv = np.unique(pdf["id"].to_numpy()[~is_l], return_inverse=True)
            if len(lids) == 0 or len(rids) == 0:
                return empty
            szr = np.bincount(rinv, minlength=len(rids)).astype(np.float64)
            C = _cooccurrence_counts(
                linv, inv_sh[is_l], rinv, inv_sh[~is_l], len(lids), len(rids)
            )
            il, ir = np.nonzero(C > 0)
            common = C[il, ir]
            jac = common / (szl[il] + szr[ir] - common)
            keep = jac >= threshold
            aa, bb = lids[il[keep]], rids[ir[keep]]
            return pd.DataFrame(
                {"a": np.minimum(aa, bb), "b": np.maximum(aa, bb), "jaccard": jac[keep]}
            )

        return (
            sides
            .groupBy("__blk", "__ci", "__cj")
            .applyInPandas(_count_chunk_pair, "a long, b long, jaccard double")
            .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        )
    df = ensure_parallelism(df)  # shingle hashing must not run on one core
    hashes = F.array_distinct(
        F.transform(word_shingles(F.col(col), shingle_n), shingle_hash)
    )
    blk = [F.col(block_col).alias("__blk")] if block_col else []
    sides = ["sh"] + (["__blk"] if block_col else [])

    if algorithm == "prefix":
        base = df.select(F.col(id_col).alias("id"), *blk, hashes.alias("hs"))
        base = base.withColumn("sz", F.size("hs"))
        post = base.select("id", F.explode("hs").alias("sh"))
        dfreq = post.groupBy("sh").agg(F.count("*").alias("df"))
        ordered = (
            post.join(dfreq, "sh")
            .groupBy("id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("df", "sh"))),
                    lambda s: s["sh"],
                ).alias("ordered_hs")
            )
        )
        prefix_len = (
            F.col("sz") - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1
        )
        pref = base.join(ordered, "id").select(
            "id",
            *([F.col("__blk")] if block_col else []),
            F.slice("ordered_hs", F.lit(1), prefix_len.cast("int")).alias("pref"),
        )
        # candidates stay narrow: (a, b) only; arrays join back after dedup
        pa = pref.select(
            F.explode("pref").alias("sh"),
            *([F.col("__blk")] if block_col else []),
            F.col("id").alias("a"),
        )
        pb = pref.select(
            F.explode("pref").alias("sh"),
            *([F.col("__blk")] if block_col else []),
            F.col("id").alias("b"),
        )
        cand = pa.join(pb, sides).filter(F.col("a") < F.col("b")).select("a", "b").dropDuplicates()
        sets = base.select("id", "hs", "sz")
        cand = (
            cand.join(sets.select(F.col("id").alias("a"), F.col("hs").alias("hsa"),
                                  F.col("sz").alias("sza")), "a")
            .join(sets.select(F.col("id").alias("b"), F.col("hs").alias("hsb"),
                              F.col("sz").alias("szb")), "b")
        )
        common = F.size(F.array_intersect(F.col("hsa"), F.col("hsb")))
        return (
            cand.withColumn("__c", common)
            .withColumn(
                "jaccard",
                F.col("__c").cast("double")
                / (F.col("sza") + F.col("szb") - F.col("__c")).cast("double"),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
        )

    # The narrow posting relation (id, [blk], sh) is consumed three times
    # (both join sides + sizes). Spark does NOT reuse the exchange across
    # these branches (plans differ above the scan), so without a persist
    # the shingle hashing — the single most expensive map stage — runs 3x.
    # Persist it: O(postings) longs, proportional to input size, the
    # standard move for multi-consumer narrow intermediates. The postings
    # are built by the vectorized numpy stage, not the column expression —
    # see _shingle_postings_pandas for why.
    from pyspark import StorageLevel

    sh = _shingle_postings_pandas(df, col, id_col, shingle_n, block_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    # Salt the self-join: a hot shingle with posting frequency f generates
    # f^2 pair rows in ONE reduce task (all rows of a join key co-locate).
    # Giving the a-side a deterministic salt in [0, S) and replicating the
    # b-side S times splits each hot key into S tasks; every (a, b) pair
    # still joins exactly once (at a's salt). b-side blowup is S * postings
    # narrow rows — cheap next to the f^2 pair skew it removes.
    S = 8
    a = sh.select(
        *[F.col(c) for c in sides],
        F.col("id").alias("a"),
        F.pmod(F.hash("id"), F.lit(S)).alias("__slt"),
    )
    b = sh.select(*[F.col(c) for c in sides], F.col("id").alias("b")).withColumn(
        "__slt", F.explode(F.sequence(F.lit(0), F.lit(S - 1)))
    )
    common = (
        a.join(b, sides + ["__slt"])
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sza") + F.col("szb") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def contamination_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    col: str,
    id_col: str,
    shingle_n: int = 8,
    out_col: str = "contamination",
) -> DataFrame:
    """Benchmark-contamination check (GPT-3/Llama-style): for each eval
    document, the fraction of its word ``shingle_n``-grams that appear
    anywhere in the training corpus.

    Plan: distinct hashed postings on both sides → distinct train-shingle
    relation → left semi join of eval postings → per-doc match count /
    size. Shuffles carry only (id, hash) longs; the train side partially
    aggregates to distinct hashes before the join. At 100 TB the eval set
    is typically tiny — its postings broadcast, so the train scan is one
    map-side pass with no train-side shuffle at all (Catalyst picks this
    when the eval side is under the broadcast threshold).
    """
    t_post = (
        ensure_parallelism(train)
        .select(
            F.explode(
                F.array_distinct(
                    F.transform(word_shingles(F.col(col), shingle_n), shingle_hash)
                )
            ).alias("sh")
        )
        .distinct()
    )
    e_post = ensure_parallelism(eval_df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.transform(word_shingles(F.col(col), shingle_n), shingle_hash)
            )
        ).alias("sh"),
    )
    sizes = e_post.groupBy("id").agg(F.count("*").alias("sz"))
    hits = (
        e_post.join(t_post, "sh", "left_semi")
        .groupBy("id").agg(F.count("*").alias("hit"))
    )
    return (
        sizes.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.round(
                F.coalesce(F.col("hit"), F.lit(0)).cast("double")
                / F.col("sz").cast("double"),
                6,
            ).alias(out_col),
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    emb_col: str,
    id_col: str,
    threshold: float = 0.9,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, score) with a < b and
    cosine >= threshold.

    Extends the reference's ``sem_dedup`` (which collapses duplicates) with
    the pair-listing primitive a curation pipeline audits.

    Scale design: with ``block_col`` (a cluster id, LSH bucket, language,
    shard key...) the pair space is block-local: one shuffle on the block
    key, candidate set Σ|block|², never a global cross product. The blocked
    path runs as ``applyInPandas`` — each block's vectors cross the wire
    ONCE (n rows, not n² pair rows) and the pairwise scores are a
    vectorized numpy loop *over dimensions in order*, which reproduces the
    sequential fold ``acc + u_a[d]*u_b[d]`` bit-for-bit (same ops, same
    order as the SQL list_reduce oracle) while doing the n² work in C
    instead of ~|pairs|·d interpreted lambda evals. A block must fit one
    task's memory — the same constraint block-locality already implies.
    Without ``block_col``, a full cross join with a column-expression dot
    is used (exact; only for small/calibration tables).

    Growth caveat (measured, ``tools/scale_probe.py``): Σ|block|² is
    quadratic in block size, so a fixed-cardinality block key (label,
    language) means per-block work — and, at a loose threshold, OUTPUT
    pairs — grow quadratically with the corpus (1x→10x probe: ~15x wall,
    107x pairs at threshold 0.35). At scale, block on something whose
    cardinality grows with the data (kmeans cell via ``sem_cluster_by``,
    LSH bucket via ``knn_lsh``'s hasher) so block sizes stay bounded.
    """
    import numpy as np
    import pandas as pd

    from lotus_spark.functions.vectors import dot, l2_norm

    if block_col is not None:
        src = df.select(
            F.col(id_col).alias("id"),
            F.col(block_col).alias("blk"),
            F.col(emb_col).cast("array<double>").alias("v"),
        )

        def _score_block(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("id")
            n = len(pdf)
            if n < 2:
                return pd.DataFrame({"a": [], "b": [], "score": []}).astype(
                    {"a": "int64", "b": "int64", "score": "float64"}
                )
            V = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            d = V.shape[1]
            # norm via sequential accumulate over dims (== fold order)
            acc = np.zeros(n)
            for j in range(d):
                acc = acc + V[:, j] * V[:, j]
            norms = np.sqrt(acc)
            safe = np.where(norms == 0.0, 1.0, norms)
            U = V / safe[:, None]
            U[norms == 0.0] = V[norms == 0.0]
            # pairwise dot, accumulated dim-by-dim (== fold order per pair)
            S = np.zeros((n, n))
            for j in range(d):
                S = S + np.outer(U[:, j], U[:, j])
            ia, ib = np.triu_indices(n, k=1)
            keep = S[ia, ib] >= threshold
            ids = pdf["id"].to_numpy()
            return pd.DataFrame(
                {"a": ids[ia[keep]], "b": ids[ib[keep]], "score": S[ia, ib][keep]}
            )

        return (
            src.groupBy("blk")
            .applyInPandas(_score_block, "a long, b long, score double")
            .select("a", "b", F.round("score", 6).alias("score"))
        )

    # normalize per ROW (once), so the per-PAIR work is a single dot fold —
    # 3x less fold arithmetic than cosine-per-pair; score is identical
    # (dot of unit vectors == cosine) and the oracle SQL normalizes the
    # same way so the fold order still matches bit-for-bit
    norm = l2_norm(F.col(emb_col))
    unit = F.when(norm == 0.0, F.col(emb_col).cast("array<double>")).otherwise(
        F.transform(F.col(emb_col).cast("array<double>"), lambda x: x / norm)
    )
    src = df.withColumn("__unit", unit)
    keep = {id_col: id_col, "__unit": "__unit"}
    a = src.select(*[F.col(c).alias(f"__a_{c}") for c in keep])
    b = src.select(*[F.col(c).alias(f"__b_{c}") for c in keep])
    joined = a.crossJoin(b)
    return (
        joined.filter(F.col(f"__a_{id_col}") < F.col(f"__b_{id_col}"))
        .withColumn("score", dot(F.col("__a___unit"), F.col("__b___unit")))
        .filter(F.col("score") >= threshold)
        .select(
            F.col(f"__a_{id_col}").alias("a"),
            F.col(f"__b_{id_col}").alias("b"),
            F.round("score", 6).alias("score"),
        )
    )


def scored_pairs(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    threshold: float,
    group_col: str | None = None,
    max_block_rows: int = 2048,
    strict: bool = False,
) -> DataFrame:
    """All-pairs cosine-scored pairs ``(a, b, score)`` with ``a < b`` and
    ``score >/>= threshold`` — WITHOUT a cartesian/BroadcastNestedLoop stage.

    The pair space is covered by *chunk-pair tasks*: rows hash into C chunks
    per group (C sized so a chunk fits one task's memory), each row is
    fanned out to the C chunk-pairs that involve its chunk, and an
    ``applyInPandas`` kernel scores each chunk-pair block with numpy. Every
    pair (i, j) lands in exactly one task, so the result is EXACT; the plan
    is explode → one shuffle on (group, chunk-pair) → vectorized kernel —
    n·C rows cross the wire, never n² pair rows.

    With ``group_col`` the pair space is additionally restricted to
    within-group pairs (LSH bucket, cluster id, language...), which is the
    approximate 100 TB tier: Σ|group|² work instead of n².

    Scores reproduce ``functions.vectors.pair_cosine`` bit-for-bit
    (dim-ordered fold accumulation, divide-at-end dot/(na·nb), zero-norm →
    0.0) so oracle SQL written against the fold hash-matches.

    Mirrors reference ``lotus/sem_ops/sem_dedup.py:32-91`` pair generation,
    re-expressed as a bounded-memory distributed plan.
    """
    import math

    import numpy as np
    import pandas as pd

    g = F.col(group_col) if group_col is not None else F.lit(0)
    src = ensure_parallelism(df).select(
        g.cast("long").alias("g"),
        F.col(id_col).cast("long").alias("id"),
        F.col(emb_col).cast("array<double>").alias("v"),
    )
    sizes = src.groupBy("g").agg(F.count("*").alias("__n"))
    nchunks = F.greatest(
        F.lit(1), F.ceil(F.col("__n") / F.lit(max_block_rows))
    ).cast("int")
    # NB: chunk-count and chunk-id columns must not collide under Spark's
    # default case-insensitive resolution — use distinct names, not c/C
    src = src.join(F.broadcast(sizes.select("g", nchunks.alias("__nck"))), "g")
    src = src.withColumn(
        "ck", F.pmod(F.xxhash64("id"), F.col("__nck")).cast("int")
    )
    tasks = (
        src.withColumn(
            "pp",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__nck") - 1),
                    lambda k: F.struct(
                        F.least(F.col("ck"), k).alias("i"),
                        F.greatest(F.col("ck"), k).alias("j"),
                    ),
                )
            ),
        )
        .select(
            "g", "id", "v", "ck",
            F.col("pp.i").alias("pi"), F.col("pp.j").alias("pj"),
        )
    )

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": [], "b": [], "score": []}).astype(
            {"a": "int64", "b": "int64", "score": "float64"}
        )
        if len(pdf) < 2:
            return empty
        pi, pj = int(pdf["pi"].iat[0]), int(pdf["pj"].iat[0])

        def mat(sub: pd.DataFrame):
            V = np.stack(sub["v"].to_numpy()).astype(np.float64)
            acc = np.zeros(len(sub))
            for j in range(V.shape[1]):
                acc = acc + V[:, j] * V[:, j]
            return V, np.sqrt(acc), sub["id"].to_numpy()

        if pi == pj:
            V, nr, ids = mat(pdf)
            n, d = V.shape
            S = np.zeros((n, n))
            for j in range(d):
                S = S + np.outer(V[:, j], V[:, j])
            denom = np.outer(nr, nr)
            ia, ib = np.triu_indices(n, k=1)
            num, den = S[ia, ib], denom[ia, ib]
            sc = np.where(den == 0.0, 0.0, num / np.where(den == 0.0, 1.0, den))
            aa, bb = ids[ia], ids[ib]
        else:
            L = pdf[pdf["ck"] == pi]
            R = pdf[pdf["ck"] == pj]
            if len(L) == 0 or len(R) == 0:
                return empty
            VL, nL, idL = mat(L)
            VR, nR, idR = mat(R)
            S = np.zeros((len(L), len(R)))
            for j in range(VL.shape[1]):
                S = S + np.outer(VL[:, j], VR[:, j])
            denom = np.outer(nL, nR)
            sc = np.where(
                denom == 0.0, 0.0, S / np.where(denom == 0.0, 1.0, denom)
            ).ravel()
            aa = np.repeat(idL, len(R))
            bb = np.tile(idR, len(L))
        keep = (sc > threshold) if strict else (sc >= threshold)
        lo, hi = np.minimum(aa, bb), np.maximum(aa, bb)
        return pd.DataFrame(
            {"a": lo[keep], "b": hi[keep], "score": sc[keep]}
        ).astype({"a": "int64", "b": "int64", "score": "float64"})

    return tasks.groupBy("g", "pi", "pj").applyInPandas(
        _score, "a long, b long, score double"
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    threshold: float,
    n_planes: int | str = 8,
    n_tables: int = 8,
    seed: int = 42,
    max_block_rows: int = 2048,
    strict: bool = False,
) -> DataFrame:
    """Approximate near-dup pairs via multi-table random-hyperplane LSH:
    ``n_tables`` independent sign-bit bucketings (2^n_planes buckets each),
    exact cosine verify *within* buckets, union across tables.

    Recall for a pair at cosine s: with p = 1 - acos(s)/π per plane,
    P[collide in one table] = p^n_planes, overall 1 - (1 - p^8)^8 — ≈0.96
    at s = 0.95, ≈0.87 at s = 0.9 with the defaults. The per-plane dot is
    dim-ordered (``functions.ann.lsh_bucket``) so buckets are deterministic;
    oversized buckets are sub-chunked by ``scored_pairs`` so no task ever
    exceeds ``max_block_rows`` rows.

    ``n_planes="auto"`` sizes the bucket count to the DATA — planes =
    ceil(log2(n / 256)), clamped to [4, 20] — so mean bucket size stays
    ~constant as the corpus grows and total within-bucket verify work
    stays ~LINEAR in n. A fixed ``n_planes`` means buckets (and their
    quadratic verify cost) grow linearly with the corpus — fine at one
    scale, wrong across scales; auto is how the 100 TB deployment should
    run. Recall at a given cosine is a function of n_planes, so auto
    trades recall for scale as n grows — raise ``n_tables`` to buy it
    back (recall = 1 - (1 - p^planes)^tables). Growth measured in
    ``tools/scale_probe.py``.
    """
    from lotus_spark.functions.ann import hyperplanes, lsh_bucket

    if n_planes == "auto":
        n = df.select(id_col).count()  # column-pruned scan
        n_planes = min(20, max(4, math.ceil(math.log2(max(n, 2) / 256))))
    first = df.select(F.size(F.col(emb_col)).alias("d")).first()
    dim = int(first["d"]) if first else 0
    bands = []
    for t in range(n_tables):
        planes = hyperplanes(n_planes, dim, seed=seed + 7919 * t)
        bucket = lsh_bucket(F.col(emb_col), planes)
        bands.append(
            F.struct(F.lit(t).alias("t"), bucket.alias("b"))
        )
    exploded = (
        ensure_parallelism(df)
        .select(F.col(id_col), F.col(emb_col), F.explode(F.array(*bands)).alias("tb"))
        .select(
            F.col(id_col),
            F.col(emb_col),
            (F.col("tb.t").cast("long") * (1 << n_planes) + F.col("tb.b")).alias("__g"),
        )
    )
    return scored_pairs(
        exploded, id_col, emb_col, threshold,
        group_col="__g", max_block_rows=max_block_rows, strict=strict,
    ).dropDuplicates(["a", "b"])


def paragraph_dedup(
    df: DataFrame,
    col: str,
    id_col: str,
    sep: str = "\n\n",
    min_chars: int = 1,
    out_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Cross-document paragraph-level dedup (CCNet-style): split ``col``
    on ``sep``, keep each distinct (trimmed) paragraph only at its first
    occurrence — smallest ``(id_col, position)`` — and reassemble the
    survivors in original order.

    Plan (narrow dedup shuffle): explode to ``(did, pos,
    xxhash64(para))`` — paragraph TEXT is projected away before any
    shuffle — then ONE hash *aggregate* ``min(struct(did, pos))`` per
    paragraph key (map-side partial combine; a window would shuffle
    every row un-combined), collapse winners to a per-doc kept-position
    set, and join that tiny ``(did, array<pos>)`` relation back to the
    original rows. Reassembly re-splits each doc locally from its own
    text (filter on kept positions + ``array_join``) — so document text
    crosses exactly ONE shuffle (the join on ``did``), and the dedup
    shuffle itself carries three fixed-width columns regardless of
    paragraph length. No pair joins anywhere; scales like exact_dedup.

    ``exact=False`` (default) keys paragraphs by ``xxhash64`` — a 64-bit
    collision (≈ n²·2⁻⁶⁵) could merge two distinct paragraphs, the
    standard corpus-dedup trade (CCNet/C4 key on hashes too).
    ``exact=True`` keys on the full trimmed text: collision-free, at the
    cost of shuffling paragraph text through the winner aggregate.
    """
    out_col = out_col or col
    # \Q..\E: literal separator (F.split's pattern is a Java regex)
    sep_pat = "\\Q" + sep + "\\E"
    key = (F.col("__para") if exact
           else F.xxhash64("__para").alias("__para_key"))
    paras = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("__did"),
            F.posexplode(F.split(F.col(col), sep_pat, -1))
            .alias("__pos", "__para"),
        )
        .withColumn("__para", F.trim(F.col("__para")))
        .filter(F.length("__para") >= min_chars)
        .select("__did", "__pos", key.alias("__k"))
    )
    winners = paras.groupBy("__k").agg(
        F.min(F.struct("__did", "__pos")).alias("__w")
    )
    keep_pos = (
        winners.select(
            F.col("__w.__did").alias("__did"),
            F.col("__w.__pos").alias("__pos"),
        )
        .groupBy("__did")
        .agg(F.collect_set("__pos").alias("__keep"))
    )
    # left join + coalesce: a document whose every paragraph was
    # deduplicated away (or filtered by min_chars) survives with empty
    # text — reassembly must never silently drop rows
    joined = df.join(
        keep_pos, df[id_col] == keep_pos["__did"], "left"
    ).drop("__did")
    keep_arr = F.coalesce(
        F.col("__keep"), F.array().cast("array<int>")
    )
    kept_parts = F.filter(
        F.transform(
            F.split(F.col(col), sep_pat, -1),
            lambda x, i: F.struct(
                F.trim(x).alias("p"), i.cast("int").alias("i")
            ),
        ),
        lambda s: (F.length(s["p"]) >= min_chars)
        & F.array_contains(keep_arr, s["i"]),
    )
    rebuilt_expr = F.coalesce(
        F.array_join(F.transform(kept_parts, lambda s: s["p"]), sep),
        F.lit(""),
    )
    joined = joined.withColumn(out_col + "__rebuilt", rebuilt_expr).drop(
        "__keep"
    )
    if out_col == col:
        joined = joined.drop(col)
    return joined.withColumnRenamed(out_col + "__rebuilt", out_col)


def ngram_stats(
    df: DataFrame,
    col: str,
    n: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-level top-K word n-grams with document frequency — the
    standard corpus-inspection primitive (vocabulary/boilerplate audit).

    Plan: ONE corpus scan — an Arrow-batched ``mapInPandas`` emits each
    document's (distinct ngram, in-doc count) pairs (a per-doc Counter:
    doc identity collapses map-side, so no (doc, ngram) shuffle ever
    exists) → one hash aggregate on ngram (sum = occurrences, row count
    = doc freq) → ``orderBy().limit(top_k)`` (TakeOrderedAndProject:
    only K rows per partition cross the final shuffle). Never a global
    sort of the vocabulary, never a second pass over the corpus.

    The gram stage is pandas, not ``F.transform``: Catalyst higher-order
    functions are interpreted and degrade badly in long sessions
    (megamorphic evaluator call sites — see ``_shingle_postings_pandas``,
    same measured pathology: 14.6s vs 0.9s steady-state at sf0.1).
    Tokenization mirrors Spark's SQL semantics exactly (ASCII-only
    ``\\s`` for the split; SQL ``trim`` strips only ASCII space 0x20,
    NOT all codepoints <= U+0020) so the DuckDB oracle still
    hash-matches.
    """
    import re

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    schema = StructType([
        StructField("ngram", StringType()),
        StructField("__cnt", LongType()),
    ])

    def gen(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            grams, cnts = [], []
            for text in pdf[col]:
                if text is None:
                    continue  # expr path: explode(transform(null)) drops
                toks = ws.split(str(text).strip(" ").lower())
                if len(toks) < n:
                    doc = Counter([" ".join(toks)])
                else:
                    doc = Counter(
                        " ".join(toks[j:j + n])
                        for j in range(len(toks) - n + 1)
                    )
                grams.extend(doc.keys())
                cnts.extend(doc.values())
            yield pd.DataFrame({"ngram": grams, "__cnt": cnts})

    per_doc = ensure_parallelism(df).select(col).mapInPandas(gen, schema)
    return (
        per_doc.groupBy("ngram")
        .agg(
            F.sum("__cnt").alias("n_occurrences"),
            F.count("*").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("ngram"))
        .limit(top_k)
    )



def _rebuild_without_positions(df, rm, col, id_col, out_col, units, sep):
    """Shared reassembly tail of ``span_dedup`` / ``strip_boilerplate``:
    left-join the per-doc removed-position set ``rm`` (``__did``,
    ``__rm array<int>``), drop removed unit indices from a local
    re-split of the document's own text, and join survivors with
    ``sep``. Untouched docs (no removal row) keep their text VERBATIM;
    document text crosses only this one join shuffle. ``units`` is the
    Column re-splitting ``col`` into the same units the caller indexed
    when building ``rm``."""
    joined = df.join(rm, df[id_col] == rm["__did"], "left").drop("__did")
    rm_arr = F.col("__rm")
    kept = F.filter(
        F.transform(
            units,
            lambda x, i: F.struct(x.alias("u"), i.cast("int").alias("i")),
        ),
        lambda s: ~F.array_contains(rm_arr, s["i"]),
    )
    rebuilt = F.when(rm_arr.isNull(), F.col(col)).otherwise(
        F.array_join(F.transform(kept, lambda s: s["u"]), sep)
    )
    joined = joined.withColumn(out_col + "__rebuilt", rebuilt).drop("__rm")
    if out_col == col:
        joined = joined.drop(col)
    return joined.withColumnRenamed(out_col + "__rebuilt", out_col)


def span_dedup(
    df: DataFrame,
    col: str,
    id_col: str,
    k: int = 8,
    out_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Cross-document duplicated token-SPAN removal — the exact-substring
    dedup of Lee et al. 2022 ("Deduplicating Training Data Makes Language
    Models Better"), re-expressed over word k-grams instead of a suffix
    array (which does not distribute): any token covered by a k-gram
    occurrence that is NOT that gram's first occurrence in the corpus is
    removed; first occurrence = smallest ``(id_col, position)``. A span
    of m >= k copied tokens is covered by its m-k+1 duplicated grams, so
    whole copied spans vanish while the original document keeps them.
    Within-doc repeats of a gram count as duplicates too (the second
    occurrence loses). Documents with fewer than ``k`` tokens, and
    documents where nothing was removed, pass through with their text
    UNCHANGED; edited documents are reassembled as the kept tokens
    joined by single spaces (whitespace-normalized — the same trade the
    reference tooling makes when rebuilding from token ids).

    Complements the granularity ladder: ``dedupe_doc_units`` (within-doc
    units) < ``paragraph_dedup`` (cross-doc paragraphs) < ``span_dedup``
    (cross-doc arbitrary spans) < ``minhash_lsh_dedup`` (whole near-dup
    docs).

    Plan (scales like paragraph_dedup): tokenize (``\\s+`` on trimmed
    text, case preserved) → gram-start posexplode to ``(did, pos, key)``
    where key is ``xxhash64(gram)`` (gram TEXT projected away before the
    shuffle; ``exact=True`` keys on the string, collision-free but
    wide) → min-aggregate ``min(struct(did, pos))`` per gram (map-side
    combine collapses even the hottest gram to one row per map task) →
    co-partitioned join back on the gram key to mark non-first
    occurrences → explode each dup to its k covered positions → per-doc
    ``collect_set`` of removed positions (bounded by doc length) → ONE
    join of that narrow ``(did, array<pos>)`` relation to the original
    rows; document text crosses exactly one shuffle. No pair join, no
    suffix array, no driver state.

    Why aggregate+join and not a whole-partition window min (which
    would save one corpus scan and measured ~35% faster at sf0.1): a
    boilerplate gram shared by millions of documents sends ALL its
    posting rows to ONE window partition = one task — window partitions
    cannot be AQE-skew-split — so the stage's wall-clock becomes the
    hottest gram's corpus-wide occurrence count. The join probe side
    has the same skewed rows but AQE skew-join splits that partition
    across tasks (duplicating the one-row build side). At 100 TB the
    straggler dominates the saved scan; small-corpus callers who want
    the faster plan can pre-filter obvious boilerplate with
    ``strip_boilerplate`` first.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    out_col = out_col or col

    def _toks(c: Column) -> Column:
        return F.split(F.trim(c), r"\s+")

    gram_starts = F.sequence(F.lit(0), F.size(F.col("__toks")) - k)
    gram = F.transform(
        gram_starts,
        lambda i: F.concat_ws(
            " ", *[F.get(F.col("__toks"), i + j) for j in range(k)]
        ),
    )
    occ = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("__did"), _toks(F.col(col)).alias("__toks"))
        .filter(F.size("__toks") >= k)
        .select("__did", F.posexplode(gram).alias("__pos", "__gram"))
    )
    key = F.col("__gram") if exact else F.xxhash64("__gram")
    occ = occ.select("__did", "__pos", key.alias("__k"))
    first = occ.groupBy("__k").agg(
        F.min(F.struct("__did", "__pos")).alias("__w")
    )
    dup = occ.join(first, "__k").filter(
        (F.col("__did") != F.col("__w.__did"))
        | (F.col("__pos") != F.col("__w.__pos"))
    )
    rm = (
        dup.select(
            "__did",
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + F.lit(k - 1))
            ).alias("__rp"),
        )
        .groupBy("__did")
        .agg(F.collect_set(F.col("__rp").cast("int")).alias("__rm"))
    )
    return _rebuild_without_positions(
        df, rm, col, id_col, out_col, _toks(F.col(col)), " "
    )


def strip_boilerplate(
    df: DataFrame,
    col: str,
    id_col: str,
    group_col: str,
    sep: str = "\n",
    min_frac: float = 0.5,
    min_docs: int = 2,
    min_chars: int = 1,
    out_col: str | None = None,
    exact: bool = False,
) -> DataFrame:
    """Per-source boilerplate removal (RefinedWeb/CCNet line filtering):
    a unit (line by default) that appears in at least ``min_frac`` of a
    ``group_col`` group's documents (and at least ``min_docs`` of them)
    is boilerplate — site headers, footers, cookie banners, nav text —
    and is removed from EVERY document of that group. Units are trimmed
    before matching; units shorter than ``min_chars`` are never removed.
    Unlike ``paragraph_dedup`` (keep-first global dedup) this is a
    frequency test scoped to the group: rare duplicated lines survive,
    ubiquitous ones vanish everywhere including their first occurrence.

    Plan: explode to ``(group, did, pos, key)`` with unit text projected
    away (``xxhash64``; ``exact=True`` keys on the trimmed string) →
    per-(group, key) DISTINCT-doc count aggregate → join per-group doc
    totals (tiny, broadcast) → the boilerplate key set → join back to
    occurrences → per-doc removed-position set → ONE join to the
    original rows with local re-split reassembly (document text crosses
    exactly one shuffle, the same contract as paragraph_dedup /
    span_dedup). Unlike span_dedup (where every occurrence must be
    compared against its gram's canonical, so a window over one full
    shuffle wins), here the aggregate BUYS reduction: the frequency
    test passes only a small boilerplate key set, AQE broadcasts it at
    runtime, and the occurrence relation is never shuffled for the
    removal join — at 100 TB that beats pushing every token occurrence
    through a sorted window exchange (measured 2x faster at sf0.1 too).
    Group sizes are bounded by the source cardinality, not corpus size;
    no stage materializes per-key doc lists.
    """
    if not (0.0 < min_frac <= 1.0):
        raise ValueError("min_frac must be in (0, 1]")
    out_col = out_col or col
    sep_pat = "\\Q" + sep + "\\E"

    units = (
        ensure_parallelism(df)
        .select(
            F.col(group_col).alias("__grp"),
            F.col(id_col).alias("__did"),
            F.posexplode(F.split(F.col(col), sep_pat, -1))
            .alias("__pos", "__u"),
        )
        .withColumn("__u", F.trim(F.col("__u")))
        .filter(F.length("__u") >= min_chars)
        .select(
            "__grp", "__did", "__pos",
            (F.col("__u") if exact else F.xxhash64("__u")).alias("__k"),
        )
    )
    group_sizes = df.groupBy(F.col(group_col).alias("__grp")).agg(
        F.count("*").alias("__gn")
    )
    boiler = (
        units.groupBy("__grp", "__k")
        .agg(F.count_distinct("__did").alias("__df"))
        .join(F.broadcast(group_sizes), "__grp")
        .filter(
            (F.col("__df") >= F.lit(min_docs))
            & (F.col("__df") >= F.col("__gn") * F.lit(min_frac))
        )
        .select("__grp", "__k")
    )
    rm = (
        units.join(boiler, ["__grp", "__k"])
        .groupBy("__did")
        .agg(F.collect_set(F.col("__pos").cast("int")).alias("__rm"))
    )
    return _rebuild_without_positions(
        df, rm, col, id_col, out_col, F.split(F.col(col), sep_pat, -1), sep
    )
