import pytest
from pyspark.sql import functions as F

from lotus_spark.functions.dedup import (
    exact_dedup,
    jaccard_sim_pairs,
    minhash_lsh_dedup,
    minhash_signature,
    simhash,
)
from lotus_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)


def _one(df, col):
    return df.collect()[0][col]


def test_token_count(spark):
    df = spark.createDataFrame([("a b c",), ("  x  ",), ("",)], ["t"])
    got = [r["n"] for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 1, 0]


def test_fingerprint_known_value(spark):
    df = spark.createDataFrame([("ab",), ("",), ("ab",)], ["t"])
    got = [r["f"] for r in df.select(fingerprint(F.col("t")).alias("f")).collect()]
    # 'a'=97, 'b'=98 → 97*31+98 = 3105
    assert got == [3105, 0, 3105]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog",), ("el gato y la casa",), ("xyzzy qwerty",)], ["t"]
    )
    got = [r["l"] for r in df.select(lang_id(F.col("t")).alias("l")).collect()]
    assert got == ["en", "es", "und"]


def test_quality_score_range(spark):
    df = spark.createDataFrame([("the quick brown fox and the dog",), ("!!!! ??",)], ["t"])
    got = [r["q"] for r in df.select(quality_score(F.col("t")).alias("q")).collect()]
    assert 0.0 <= got[1] < got[0] <= 1.0


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["t"])
    got = [r["s"] for r in df.select(word_shingles(F.col("t"), 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # fewer tokens than n → single shingle


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], ["id", "t"]
    )
    out = exact_dedup(df, "t", "id")
    assert {(r["id"], r["t"]) for r in out.collect()} == {(1, "x"), (2, "y")}


def test_minhash_signature_similar_docs_share_values(spark):
    a = "the quick brown fox jumps over the lazy dog today"
    b = "the quick brown fox jumps over the lazy dog tonight"
    c = "completely unrelated text about cooking pasta dishes"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], ["id", "t"])
    out = minhash_signature(df, "t", n_hashes=32, shingle_n=2)
    sigs = {r["id"]: r["minhash"] for r in out.collect()}
    sim_ab = sum(x == y for x, y in zip(sigs[0], sigs[1])) / 32
    sim_ac = sum(x == y for x, y in zip(sigs[0], sigs[2])) / 32
    assert sim_ab > 0.5 > sim_ac


def test_minhash_and_simhash_exprs_match_batch_wrappers(spark):
    """minhash_expr / simhash_expr are the shared batch+stream fingerprint
    expressions; the batch wrappers (minhash_signature / simhash) must be
    exactly these exprs — the streaming near-dup oracle rows recompute
    fingerprints on survivors via the raw exprs and rely on this parity."""
    from lotus_spark.functions.dedup import minhash_expr, simhash_expr

    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (1, "pack my box with jugs"),
         (2, "")],
        ["id", "t"],
    )
    viaw = minhash_signature(df, "t", n_hashes=8, shingle_n=3)
    viae = df.withColumn("minhash", minhash_expr(F.col("t"), 8, 3))
    assert [r.asDict() for r in viaw.orderBy("id").collect()] == \
        [r.asDict() for r in viae.orderBy("id").collect()]
    simw = simhash(df, "t", n_bits=24)
    sime = df.withColumn("simhash", simhash_expr(F.col("t"), 24))
    assert [r.asDict() for r in simw.orderBy("id").collect()] == \
        [r.asDict() for r in sime.orderBy("id").collect()]


def test_minhash_lsh_dedup_removes_near_dup(spark):
    a = "the quick brown fox jumps over the lazy dog every single day"
    b = "the quick brown fox jumps over the lazy dog every single night"
    c = "completely unrelated text about cooking pasta dishes at home"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], ["id", "t"])
    out = minhash_lsh_dedup(df, "t", "id", n_hashes=16, bands=8, shingle_n=2,
                            jaccard_threshold=0.5)
    kept = sorted(r["id"] for r in out.collect())
    assert kept == [0, 2]


def test_simhash_similarity_property(spark):
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox jumps over the lazy cat"
    c = "astronomy telescopes observe distant galaxies nightly"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], ["id", "t"])
    out = simhash(df, "t", n_bits=32)
    h = {r["id"]: r["simhash"] for r in out.collect()}

    def hamming(x, y):
        return bin(x ^ y).count("1")

    assert hamming(h[0], h[1]) < hamming(h[0], h[2])


def test_jaccard_pairs_exact_value(spark):
    # unigram shingles: {a,b,c} vs {a,b,d} → jaccard 2/4 = 0.5
    df = spark.createDataFrame([(0, "a b c"), (1, "a b d")], ["id", "t"])
    out = jaccard_sim_pairs(df, "t", "id", shingle_n=1, threshold=0.4)
    r = out.collect()
    assert len(r) == 1 and r[0]["jaccard"] == 0.5


def test_jaccard_pairs_algorithms_agree(spark):
    """count (posting join), prefix (PPJoin) and block (BLAS per block)
    must produce identical pair sets and scores."""
    texts = [
        (0, "the quick brown fox jumps", "en"),
        (1, "the quick brown fox leaps", "en"),
        (2, "a very different document entirely", "en"),
        (3, "the quick brown fox jumps", "de"),
        (4, "the quick brown fox jumps high", "de"),
    ]
    df = spark.createDataFrame(texts, ["id", "t", "lang"])
    results = {}
    for alg in ("count", "prefix", "block"):
        rows = (
            jaccard_sim_pairs(df, "t", "id", shingle_n=2, threshold=0.2,
                              block_col="lang", algorithm=alg)
            .orderBy("a", "b").collect()
        )
        results[alg] = [(r["a"], r["b"], r["jaccard"]) for r in rows]
    assert results["count"] == results["prefix"] == results["block"]
    assert len(results["count"]) > 0
    # auto plan + auto chunk sizing (stats-driven) picks one of the above
    auto = (
        jaccard_sim_pairs(df, "t", "id", shingle_n=2, threshold=0.2,
                          block_col="lang", algorithm="auto", chunks="auto")
        .orderBy("a", "b").collect()
    )
    assert [(r["a"], r["b"], r["jaccard"]) for r in auto] == results["count"]


def test_embedding_neardup_pairs(spark):
    import lotus_spark.functions as fn

    rows = [
        (1, [1.0, 0.0], "x"), (2, [1.0, 0.01], "x"),   # near-dups, same block
        (3, [0.0, 1.0], "x"),                           # same block, far
        (4, [1.0, 0.0], "y"),                           # dup of 1 but other block
    ]
    df = spark.createDataFrame(rows, ["id", "emb", "blk"])
    out = fn.embedding_neardup_pairs(df, "emb", "id", threshold=0.99,
                                     block_col="blk").collect()
    assert [(r["a"], r["b"]) for r in out] == [(1, 2)]
    assert out[0]["score"] > 0.999

    # unblocked: exact cross product finds the cross-block dup too
    out2 = fn.embedding_neardup_pairs(df, "emb", "id", threshold=0.99)
    pairs = sorted((r["a"], r["b"]) for r in out2.collect())
    assert pairs == [(1, 2), (1, 4), (2, 4)]


def test_quality_signals_functions(spark):
    from pyspark.sql import functions as F

    from lotus_spark.functions.text import (
        dup_line_ratio,
        dup_ngram_ratio,
        gopher_keep,
        pii_count,
        pii_redact,
    )

    rows = [
        (0, "the cat sat on the mat and the cat sat again"),
        (1, "go go go go go"),                     # all bigrams identical
        (2, "line one\nline two\nline one"),       # 1 of 3 lines duplicate
        (3, "mail me at bob@example.com or 10.0.0.1 or 555-123-4567"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    out = {r["id"]: r for r in df.select(
        "id",
        dup_ngram_ratio(F.col("t"), 2).alias("dup2"),
        dup_line_ratio(F.col("t")).alias("dupl"),
        pii_count(F.col("t"), "emails").alias("em"),
        pii_count(F.col("t"), "ipv4s").alias("ip"),
        pii_count(F.col("t"), "phones").alias("ph"),
        pii_redact(F.col("t")).alias("red"),
    ).collect()}
    # "go go go go go": 4 bigrams, 1 distinct -> 0.75
    assert out[1]["dup2"] == 0.75
    assert out[0]["dup2"] > 0
    assert out[2]["dupl"] == round(1 - 2 / 3, 6)
    assert (out[3]["em"], out[3]["ip"], out[3]["ph"]) == (1, 1, 1)
    assert "bob@example.com" not in out[3]["red"]
    assert "[PII]" in out[3]["red"]
    assert out[4]["dup2"] == 0.0 and out[4]["dupl"] == 0.0

    # gopher gate: a sane long doc passes; a tiny or repetitive one fails
    good = " ".join(
        f"the w{i}abc of x{i}abc and y{i}abc is z{i}abc in q{i}abc"
        for i in range(8)
    )
    gdf = spark.createDataFrame(
        [(0, good), (1, "go go go go go"), (2, "short text")], ["id", "t"])
    keep = {r["id"]: r["k"] for r in gdf.select(
        "id", gopher_keep(F.col("t"), min_words=20).alias("k")).collect()}
    assert keep[0] is True
    assert keep[1] is False and keep[2] is False


def test_contamination_and_bpe_tokens(spark):
    from pyspark.sql import functions as F

    from lotus_spark.functions.dedup import contamination_overlap
    from lotus_spark.functions.text import token_count_bpe

    train = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["id", "t"])
    evals = spark.createDataFrame(
        [(0, "the quick brown fox jumps somewhere else now"),  # partial overlap
         (1, "completely novel content with zero matching spans here")],
        ["id", "t"])
    out = {r["id"]: r["contamination"]
           for r in contamination_overlap(train, evals, "t", "id",
                                          shingle_n=3).collect()}
    # eval 0: 6 trigrams, 3 appear in train ("the quick brown",
    # "quick brown fox", "brown fox jumps") -> 0.5
    assert out[0] == 0.5
    assert out[1] == 0.0

    bpe = spark.createDataFrame(
        [(0, "it's a test-case with 42 tokens!"), (1, "")], ["id", "t"])
    got = {r["id"]: r["n"] for r in bpe.select(
        "id", token_count_bpe(F.col("t")).alias("n")).collect()}
    # it|'s| a| test|-|case| with| 42| tokens|! -> 10
    assert got[0] == 10
    assert got[1] == 0


# ------------------------------------------------------- paragraph_dedup

def test_paragraph_dedup_keeps_min_doc_and_order(spark):
    from lotus_spark.functions.dedup import paragraph_dedup

    rows = [
        (1, "alpha\n\nbeta\n\ngamma"),
        (2, "beta\n\ndelta"),        # beta deduped (doc 1 wins)
        (3, "alpha\n\nbeta"),        # fully deduplicated away
        (4, ""),                     # empty doc (min_chars filter)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"]
           for r in paragraph_dedup(df, "text", "doc_id").collect()}
    assert out[1] == "alpha\n\nbeta\n\ngamma"   # untouched, order kept
    assert out[2] == "delta"
    # fully-deduped and empty docs survive as empty strings (no row loss)
    assert out[3] == "" and out[4] == ""
    assert len(out) == 4


def test_paragraph_dedup_within_doc_repeats(spark):
    from lotus_spark.functions.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(7, "x\n\nx\n\ny")], ["doc_id", "text"])
    out = paragraph_dedup(df, "text", "doc_id").collect()[0]["text"]
    assert out == "x\n\ny"   # repeat within one doc collapses to first pos


def test_paragraph_dedup_exact_matches_hashed(spark):
    """exact=True (text-keyed winner agg) and the default hashed narrow
    path must agree on collision-free inputs."""
    from lotus_spark.functions.dedup import paragraph_dedup

    rows = [(i, "\n\n".join(f"p{(i * 3 + j) % 7}" for j in range(4)))
            for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    hashed = {r["doc_id"]: r["text"]
              for r in paragraph_dedup(df, "text", "doc_id").collect()}
    exact = {r["doc_id"]: r["text"]
             for r in paragraph_dedup(df, "text", "doc_id",
                                      exact=True).collect()}
    assert hashed == exact and len(hashed) == 20


# ----------------------------------------------------------- ngram_stats

def test_ngram_stats_counts_and_docfreq(spark):
    from lotus_spark.functions.dedup import ngram_stats

    rows = [(1, "a b a b"), (2, "a b c"), (3, "z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["ngram"]: (r["n_occurrences"], r["doc_freq"])
           for r in ngram_stats(df, "text", n=2, top_k=10).collect()}
    # doc1 grams: "a b","b a","a b"; doc2: "a b","b c"; doc3 (<n tokens): "z"
    assert out["a b"] == (3, 2)
    assert out["b a"] == (1, 1)
    assert out["b c"] == (1, 1)
    assert out["z"] == (1, 1)       # short doc yields one gram of all tokens
    top = ngram_stats(df, "text", n=2, top_k=1).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in top] == [("a b", 3)]


def test_dedupe_doc_units_keeps_first_in_order(spark):
    from lotus_spark.functions.text import dedupe_doc_units

    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "x"), (3, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r["t"]
           for r in df.select("doc_id",
                              dedupe_doc_units(F.col("text")).alias("t")
                              ).collect()}
    assert out[1] == "a\nb\nc"
    assert out[2] == "x" and out[3] == ""

    word = df.select(
        dedupe_doc_units(F.lit("w w v w"), sep=" ").alias("t")).first()["t"]
    assert word == "w v"


# ------------------------------------------------------------ span_dedup

def _span_dedup_ref(docs: dict[int, str], k: int) -> dict[int, str]:
    """Brute-force reference: first occurrence of each k-gram (by (doc,
    pos), docs in id order) survives; every other occurrence's k covered
    positions are removed; untouched docs keep their original text."""
    toked = {d: docs[d].strip().split() if docs[d].strip() else [""]
             for d in sorted(docs)}
    first: dict[tuple, tuple] = {}
    for d in sorted(toked):
        ts = toked[d]
        for p in range(len(ts) - k + 1):
            first.setdefault(tuple(ts[p:p + k]), (d, p))
    out = {}
    for d in sorted(toked):
        ts = toked[d]
        rm = set()
        for p in range(len(ts) - k + 1):
            if first[tuple(ts[p:p + k])] != (d, p):
                rm.update(range(p, p + k))
        out[d] = (docs[d] if not rm
                  else " ".join(t for i, t in enumerate(ts) if i not in rm))
    return out


def test_span_dedup_removes_copied_span_keeps_original(spark):
    from lotus_spark.functions.dedup import span_dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "intro words then the quick brown fox jumps over the lazy "
            "dog today and more"),
        (3, "unrelated text with no shared spans at all here ok"),
        (4, "short doc"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["text"]
           for r in span_dedup(df, "text", "doc_id", k=4).collect()}
    assert out[1] == rows[0][1]                 # canonical doc untouched
    assert out[2] == "intro words then and more"  # whole copied span gone
    assert out[3] == rows[2][1]
    assert out[4] == "short doc" and out[5] == ""  # < k tokens: unchanged


def test_span_dedup_within_doc_repeat_loses_second(spark):
    from lotus_spark.functions.dedup import span_dedup

    df = spark.createDataFrame(
        [(7, "a b c x y a b c")], ["doc_id", "text"])
    out = span_dedup(df, "text", "doc_id", k=3).collect()[0]["text"]
    assert out == "a b c x y"


def test_span_dedup_exact_matches_hashed_and_brute_force(spark):
    import random

    from lotus_spark.functions.dedup import span_dedup

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for d in range(20):
        n = rng.randint(0, 25)
        docs[d] = " ".join(rng.choice(vocab) for _ in range(n))
    # plant a shared span so removal definitely triggers
    span = "alpha beta gamma delta epsilon zeta"
    docs[3] = docs[3] + " " + span
    docs[11] = span + " " + docs[11]
    docs[17] = docs[17] + " " + span + " tail"
    for k in (2, 5):
        ref = _span_dedup_ref(docs, k)
        df = spark.createDataFrame(sorted(docs.items()), ["doc_id", "text"])
        got_h = {r["doc_id"]: r["text"]
                 for r in span_dedup(df, "text", "doc_id", k=k).collect()}
        got_e = {r["doc_id"]: r["text"]
                 for r in span_dedup(df, "text", "doc_id", k=k,
                                     exact=True).collect()}
        assert got_h == ref, f"hash-keyed mismatch at k={k}"
        assert got_e == ref, f"exact-keyed mismatch at k={k}"


def test_span_dedup_out_col_and_validation(spark):
    import pytest

    from lotus_spark.functions.dedup import span_dedup

    df = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    out = span_dedup(df, "text", "doc_id", k=2, out_col="clean").first()
    assert out["text"] == "a b a b" and out["clean"] == "a b"
    with pytest.raises(ValueError):
        span_dedup(df, "text", "doc_id", k=0)


# ------------------------------------------------------ strip_boilerplate

def test_strip_boilerplate_removes_frequent_lines_per_group(spark):
    from lotus_spark.functions.dedup import strip_boilerplate

    hdr, foot = "SITE A HEADER", "copyright a"
    rows = [
        (1, "sa", f"{hdr}\nunique one\n{foot}"),
        (2, "sa", f"{hdr}\nunique two\n{foot}"),
        (3, "sa", f"{hdr}\nunique three"),
        (4, "sb", f"{hdr}\nother site keeps it"),   # below min_docs in sb
        (5, "sb", "plain text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r["text"]
           for r in strip_boilerplate(
               df, "text", "doc_id", "source", min_frac=0.6).collect()}
    assert out[1] == "unique one"           # header AND footer stripped
    assert out[2] == "unique two"           # footer in 2/3 = .66 >= .6
    assert out[3] == "unique three"
    assert out[4] == rows[3][2]             # 1/2 docs < min_docs=2: kept
    assert out[5] == "plain text"


def test_strip_boilerplate_min_docs_guard_and_exact_parity(spark):
    from lotus_spark.functions.dedup import strip_boilerplate

    # a "group" of one doc: min_frac=1.0 is trivially met by every line,
    # but min_docs=2 must protect singleton groups from self-erasure
    df = spark.createDataFrame(
        [(1, "solo", "only doc\nin this group")],
        ["doc_id", "source", "text"])
    out = strip_boilerplate(
        df, "text", "doc_id", "source", min_frac=0.5).collect()[0]["text"]
    assert out == "only doc\nin this group"

    rows = [(i, "s", f"COMMON\nbody {i}") for i in range(6)]
    df2 = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    hashed = {r["doc_id"]: r["text"] for r in strip_boilerplate(
        df2, "text", "doc_id", "source").collect()}
    exact = {r["doc_id"]: r["text"] for r in strip_boilerplate(
        df2, "text", "doc_id", "source", exact=True).collect()}
    assert hashed == exact
    assert all(v == f"body {i}" for i, v in hashed.items())


def test_strip_boilerplate_trim_matching_preserves_layout(spark):
    from lotus_spark.functions.dedup import strip_boilerplate

    # "  NAV  " and "NAV" are the same unit after trim; removal drops the
    # whole original line; untouched docs keep their text verbatim
    rows = [(1, "s", "  NAV  \nreal content"),
            (2, "s", "NAV\nmore content"),
            (3, "t", "  spaced   layout  kept  ")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r["text"] for r in strip_boilerplate(
        df, "text", "doc_id", "source", min_frac=0.9).collect()}
    assert out[1] == "real content"
    assert out[2] == "more content"
    assert out[3] == "  spaced   layout  kept  "   # untouched → verbatim


def test_strip_boilerplate_validation(spark):
    import pytest

    from lotus_spark.functions.dedup import strip_boilerplate

    df = spark.createDataFrame([(1, "s", "x")], ["doc_id", "source", "text"])
    with pytest.raises(ValueError):
        strip_boilerplate(df, "text", "doc_id", "source", min_frac=0.0)
    with pytest.raises(ValueError):
        strip_boilerplate(df, "text", "doc_id", "source", min_frac=1.5)


def test_minhash_lsh_dedup_exact_collapse_semantics(spark):
    """r10 hot-bucket guard: identical texts collapse to their min-id
    representative BEFORE banding (a group of m exact copies would
    otherwise emit m^2/2 candidate pairs through the band self-join).
    Results must equal the uncollapsed pipeline: min id survives per
    duplicate group, near-dups still merge ACROSS an exact group via
    its representative, and NULL / sub-shingle identical texts dedup as
    one exact group — the same outcome the banded stage always gave
    them (identical constant signatures verify as duplicates)."""
    from lotus_spark.functions.dedup import minhash_lsh_dedup

    base = ("the quick brown fox jumps over the lazy dog near the "
            "river bank every single morning")
    near = base.replace("morning", "evening")
    rows = (
        [(i, base) for i in range(10, 20)]       # exact group, min id 10
        + [(5, near)]                             # near-dup, smaller id
        + [(30, "completely different content about cooking pasta")]
        + [(40, None), (41, None)]                # nulls: never dedup
        + [(50, "xy"), (51, "xy")]                # sub-shingle identical
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in minhash_lsh_dedup(
        df, "text", "doc_id", n_hashes=16, bands=4, shingle_n=3,
        jaccard_threshold=0.5).collect()}
    # 5 is the component min (near-dup of the exact group's rep 10);
    # the other 9 exact copies and rep 10 itself are removals; the null
    # pair and the sub-shingle pair each keep their min id
    assert kept == {5, 30, 40, 50}


def test_exact_dedup_aggregate_shape_and_nulls(spark):
    """r10: exact_dedup is an aggregate + id semi-join, not a window
    over the text (a hot value's copies would all land in one task).
    Semantics pinned: min id per value, nulls form one group, every
    column of the kept row survives."""
    from lotus_spark.functions.dedup import exact_dedup

    rows = [(3, "a", "p3"), (1, "a", "p1"), (2, "b", "p2"),
            (9, None, "p9"), (7, None, "p7")]
    df = spark.createDataFrame(rows, "doc_id long, text string, payload string")
    got = {(r["doc_id"], r["payload"]) for r in
           exact_dedup(df, "text", "doc_id").collect()}
    assert got == {(1, "p1"), (2, "p2"), (7, "p7")}
    plan = exact_dedup(df, "text", "doc_id")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


def test_minhash_lsh_dedup_collapse_equals_uncollapsed_randomized(spark):
    """Randomized equivalence pin for the r10 exact-collapse prefix:
    on corpora mixing exact-duplicate groups, near-duplicates, and
    unique rows (3 fixed seeds), the collapsed pipeline's survivor set
    equals an inline replica of the PRE-collapse pipeline (the exact
    code shape shipped through r9) at several thresholds."""
    import random

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from lotus_spark.functions.dedup import (
        minhash_band_keys, minhash_lsh_dedup, minhash_signature,
    )
    from lotus_spark.functions.text import word_shingles
    from lotus_spark.operators.sem_dedup import connected_components_edges

    def uncollapsed(df, col, id_col, n_hashes, bands, shingle_n, tau):
        sigd = minhash_signature(df, col, n_hashes, shingle_n)
        sigd = sigd.withColumn(
            "__shingles", word_shingles(F.col(col), shingle_n))
        bk = minhash_band_keys(F.col("minhash"), n_hashes, bands)
        banded = sigd.withColumn(
            "__band", F.explode(F.array(*bk))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        left = banded.select("__band", F.col(id_col).alias("src"),
                             F.col("__shingles").alias("__sa"))
        right = banded.select("__band", F.col(id_col).alias("dst"),
                              F.col("__shingles").alias("__sb"))
        cand = (left.join(right, "__band")
                .filter(F.col("src") < F.col("dst"))
                .dropDuplicates(["src", "dst"]))
        inter = F.size(F.array_intersect("__sa", "__sb"))
        union = F.size(F.array_union("__sa", "__sb"))
        edges = (cand.withColumn(
            "__j", inter.cast("double") / union.cast("double"))
            .filter(F.col("__j") >= tau).select("src", "dst"))
        comps = connected_components_edges(edges)
        removal = (comps.groupBy("component")
                   .agg(F.min("id").alias("keep"))
                   .join(comps, "component")
                   .filter(F.col("id") != F.col("keep"))
                   .select(F.col("id").alias(id_col)))
        return df.join(removal, id_col, "left_anti")

    vocab = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    for seed in (11, 23, 47):
        rng = random.Random(seed)
        rows, next_id = [], 0
        for g in range(6):
            base_words = [rng.choice(vocab) for _ in range(12)]
            copies = rng.choice((1, 1, 2, 8))      # some hot groups
            text = " ".join(base_words)
            for _ in range(copies):
                rows.append((next_id, text)); next_id += 1
            if rng.random() < 0.5:                  # a near-dup variant
                v = list(base_words); v[-1] = rng.choice(vocab)
                rows.append((next_id, " ".join(v))); next_id += 1
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for tau in (0.4, 0.7):
            a = {r["doc_id"] for r in minhash_lsh_dedup(
                df, "text", "doc_id", 16, 4, 3, tau).collect()}
            b = {r["doc_id"] for r in uncollapsed(
                df, "text", "doc_id", 16, 4, 3, tau).collect()}
            assert a == b, (seed, tau, a ^ b)


def test_minhash_lsh_dedup_keep_by_picks_best(spark):
    # a~b near-dups (b longer → survives under keep_by), c unrelated
    a = "the quick brown fox jumps over the lazy dog every single day"
    b = "the quick brown fox jumps over the lazy dog every single day indeed"
    c = "completely unrelated text about cooking pasta dishes at home"
    df = spark.createDataFrame(
        [(0, a, len(a)), (1, b, len(b)), (2, c, len(c))], ["id", "t", "n"]
    )
    out = minhash_lsh_dedup(df, "t", "id", n_hashes=16, bands=8, shingle_n=2,
                            jaccard_threshold=0.5, keep_by="n")
    assert sorted(r["id"] for r in out.collect()) == [1, 2]
    # keep_ascending flips the policy (shortest survives)
    out2 = minhash_lsh_dedup(df, "t", "id", n_hashes=16, bands=8, shingle_n=2,
                             jaccard_threshold=0.5, keep_by="n",
                             keep_ascending=True)
    assert sorted(r["id"] for r in out2.collect()) == [0, 2]


def test_minhash_lsh_dedup_keep_by_ties_and_nulls(spark):
    # exact copies tie on score → min id; NULL score loses to non-NULL;
    # an all-NULL cluster still elects its min-id member
    t = "the quick brown fox jumps over the lazy dog every single day"
    u = "completely unrelated text about cooking pasta dishes at home"
    df = spark.createDataFrame(
        [(0, t, 5), (1, t, 5), (2, t, None), (3, u, None), (4, u, None)],
        "id long, t string, n int",
    )
    out = minhash_lsh_dedup(df, "t", "id", n_hashes=16, bands=8, shingle_n=2,
                            jaccard_threshold=0.5, keep_by="n")
    assert sorted(r["id"] for r in out.collect()) == [0, 3]


def test_minhash_keep_by_same_cardinality_as_default(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(n_hashes=16, bands=4, shingle_n=2, jaccard_threshold=0.5)
    base = minhash_lsh_dedup(docs, "text", "doc_id", **kw).count()
    best = minhash_lsh_dedup(docs, "text", "doc_id", keep_by="n_chars",
                             **kw).count()
    assert base == best  # same clusters, different survivor choice


def test_minhash_clusters_min_member_id_and_singletons(spark):
    from lotus_spark.functions.dedup import minhash_clusters

    a = "the quick brown fox jumps over the lazy dog every single day"
    b = "the quick brown fox jumps over the lazy dog every single night"
    c = "completely unrelated text about cooking pasta dishes at home"
    # 3=exact copy of a (exact-collapse path), 2=singleton
    df = spark.createDataFrame([(0, a), (1, b), (2, c), (3, a)], ["id", "t"])
    out = minhash_clusters(df, "t", "id", n_hashes=16, bands=8, shingle_n=2,
                           jaccard_threshold=0.5, cluster_col="cid")
    got = {r["id"]: r["cid"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 3: 0, 2: 2}
    # schema: input columns preserved + cluster col appended
    assert out.columns == ["id", "t", "cid"]


def test_leakage_safe_split_clusters_never_straddle(spark):
    from lotus_spark.functions.dedup import leakage_safe_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = leakage_safe_split(
        docs, "text", "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=7, shingle_n=2, jaccard_threshold=0.5,
    )
    straddle = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert straddle == 0
    # all rows labeled, all three labels present at this size
    labels = {r["split"] for r in out.select("split").distinct().collect()}
    assert labels == {"train", "val", "test"}
    assert out.filter(F.col("split").isNull()).count() == 0


def test_dedup_and_split_fuses_one_clustering_pass(spark):
    from lotus_spark.functions.dedup import (
        dedup_and_split,
        leakage_safe_split,
        minhash_lsh_dedup,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kw = dict(n_hashes=16, bands=4, shingle_n=2, jaccard_threshold=0.5)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = dedup_and_split(docs, "text", "doc_id", w, keep_by="n_chars",
                          seed=7, **kw)
    # survivors == the keep_by dedup
    surv = minhash_lsh_dedup(docs, "text", "doc_id", keep_by="n_chars", **kw)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in surv.collect())
    # split of each survivor == the label its whole cluster got from
    # leakage_safe_split (same seed → same hash of the same cluster id)
    lss = leakage_safe_split(docs, "text", "doc_id", w, seed=7, **kw)
    j = (
        out.select("doc_id", "split")
        .join(lss.select("doc_id", F.col("split").alias("s2")), "doc_id")
        .filter(F.col("split") != F.col("s2"))
    )
    assert j.count() == 0
    assert "split" in out.columns and "text" in out.columns
