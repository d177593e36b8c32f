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

from pyspark.sql import DataFrame, Window
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
    """Keep the min-id row per exact value of ``col`` (hash-aggregate dedup)."""
    w = Window.partitionBy(col).orderBy(F.asc(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signature(df: DataFrame, col: str, n_hashes: int = 16,
                      shingle_n: int = 3, out_col: str = "minhash") -> DataFrame:
    """Append ``array<long>`` MinHash signature of word-``shingle_n``-gram sets.

    Map-side only: shingle → polynomial hash → per-hash-function min. At
    100 TB this runs inside the scan projection with zero shuffle.
    """
    df = ensure_parallelism(df)
    hashes = F.transform(word_shingles(F.col(col), shingle_n), shingle_hash)
    sigs = []
    for j in range(n_hashes):
        a, b = _hash_params(j)
        sigs.append(
            F.array_min(
                F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MOD))
            )
        )
    return df.withColumn(out_col, F.array(*sigs))


def minhash_lsh_dedup(
    df: DataFrame,
    col: str,
    id_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """MinHash + LSH near-duplicate removal; keeps min-id per duplicate group.

    signature → ``bands`` band-keys → explode → groupBy band bucket →
    candidate pairs inside buckets → exact Jaccard verify on shingle sets →
    connected components → anti-join removals.
    """
    from lotus_spark.operators.sem_dedup import connected_components_edges

    rows_per_band = n_hashes // bands
    sigd = minhash_signature(df, col, n_hashes, shingle_n)
    sigd = sigd.withColumn("__shingles", word_shingles(F.col(col), shingle_n))

    band_keys = [
        F.concat_ws(
            "_",
            F.lit(i),
            *[F.col("minhash")[i * rows_per_band + j] for j in range(rows_per_band)],
        )
        for i in range(bands)
    ]
    # both join sides consume `banded`; persist so signature + shingle
    # computation (the expensive map stage) runs once, not twice
    from pyspark import StorageLevel

    banded = sigd.withColumn("__band", F.explode(F.array(*band_keys))).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    left = banded.select(
        F.col("__band"),
        F.col(id_col).alias("src"),
        F.col("__shingles").alias("__sa"),
    )
    right = banded.select(
        F.col("__band"),
        F.col(id_col).alias("dst"),
        F.col("__shingles").alias("__sb"),
    )
    cand = (
        left.join(right, "__band")
        .filter(F.col("src") < F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    union = F.size(F.array_union(F.col("__sa"), F.col("__sb")))
    edges = (
        cand.withColumn("__j", inter.cast("double") / union.cast("double"))
        .filter(F.col("__j") >= jaccard_threshold)
        .select("src", "dst")
    )
    comps = connected_components_edges(edges)
    removal = (
        comps.groupBy("component")
        .agg(F.min("id").alias("keep"))
        .join(comps, "component")
        .filter(F.col("id") != F.col("keep"))
        .select(F.col("id").alias(id_col))
    )
    return df.join(removal, id_col, "left_anti")


def simhash(df: DataFrame, col: str, n_bits: int = 32,
            out_col: str = "simhash") -> DataFrame:
    """Append a ``n_bits``-bit SimHash of the whitespace token multiset.

    bit b of the fingerprint = sign of Σ_tokens (2·bit_b(hash(token)) − 1).
    Pure column expressions; identical in DuckDB via list_reduce.
    """
    from lotus_spark.functions.text import tokens

    df = ensure_parallelism(df)
    tok_hashes = F.transform(tokens(F.col(col)), shingle_hash)
    zero = F.array_repeat(F.lit(0).cast("long"), n_bits)
    # ±1 per bit: bit_b(h) = floor(h / 2^b) mod 2 (exact in double for h < 2^52)
    bitvec = lambda h: F.transform(  # noqa: E731
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda b: (F.floor(h / F.pow(F.lit(2.0), b.cast("double"))).cast("long") % 2) * 2 - 1,
    )
    sums = F.aggregate(
        tok_hashes, zero, lambda acc, h: F.zip_with(acc, bitvec(h), lambda x, y: x + y)
    )
    fp = F.aggregate(
        F.zip_with(
            sums,
            F.sequence(F.lit(0), F.lit(n_bits - 1)).cast("array<long>"),
            lambda s, b: F.when(s > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out_col, fp)


def jaccard_sim_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    block_col: str | None = None,
    algorithm: str = "count",
) -> DataFrame:
    """All pairs (a, b), a<b, with shingle-set Jaccard ≥ threshold. Exact.

    Two physical strategies, same result:
    - ``algorithm="count"`` (default): posting-list join on *hashed* shingles
      (long keys — cheap shuffles) → groupBy(a,b) count → join sizes. Rows
      stay narrow (2-3 longs) through every shuffle. Only pairs sharing ≥1
      shingle are materialized — no cross product. Best general choice.
    - ``algorithm="prefix"``: AllPairs/PPJoin prefix filter — each doc's
      shingles ordered rarest-first (global doc-frequency), only the first
      ``len - ceil(t·len) + 1`` generate candidates (no true pair lost),
      then candidates verify with an array-intersect join. Wins when the
      threshold is high (≥~0.7) so prefixes collapse; loses at low
      thresholds where it degrades to the count plan plus verify overhead.
    ``block_col`` (e.g. language) bounds the pair space for both.
    """
    if algorithm not in ("count", "prefix"):
        raise ValueError(f"unknown algorithm {algorithm!r}; pick 'count' or 'prefix'")
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
    # the shingle-hash projection — the single most expensive map stage —
    # runs 3x. Persist it: O(postings) longs, proportional to input size,
    # the standard move for multi-consumer narrow intermediates.
    from pyspark import StorageLevel

    sh = df.select(
        F.col(id_col).alias("id"), *blk, F.explode(hashes).alias("sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
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
    shard key...) the self-join is block-local — one shuffle on the block
    key, candidate set Σ|block|², never a global cross product. Without it,
    a full cross join is used (exact; only for small/calibration tables).
    """
    from lotus_spark.functions.vectors import dot, l2_norm

    # normalize per ROW (once), so the per-PAIR work is a single dot fold —
    # 3x less fold arithmetic than cosine-per-pair; score is identical
    # (dot of unit vectors == cosine) and the oracle SQL normalizes the
    # same way so the fold order still matches bit-for-bit
    norm = l2_norm(F.col(emb_col))
    unit = F.when(norm == 0.0, F.col(emb_col).cast("array<double>")).otherwise(
        F.transform(F.col(emb_col).cast("array<double>"), lambda x: x / norm)
    )
    src = df.withColumn("__unit", unit)
    keep = {id_col: id_col, "__unit": "__unit", **({block_col: block_col} if block_col else {})}
    a = src.select(*[F.col(c).alias(f"__a_{c}") for c in keep])
    b = src.select(*[F.col(c).alias(f"__b_{c}") for c in keep])
    if block_col:
        joined = a.join(
            b, F.col(f"__a_{block_col}") == F.col(f"__b_{block_col}")
        )
    else:
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
