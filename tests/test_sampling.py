import pytest
from pyspark.sql import functions as F

from lotus_spark.functions.sampling import pack_sequences, stratified_sample


def test_stratified_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(2000)], ["id", "lang"]
    )
    picked = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, "id")
    by_lang = {r["lang"]: r["n"] for r in
               picked.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 400 <= by_lang["en"] <= 600          # ~500 of 1000
    assert 50 <= by_lang.get("de", 0) <= 160    # ~100 of 1000

    # determinism: same ids survive regardless of partitioning
    a = {r["id"] for r in picked.collect()}
    b = {r["id"] for r in
         stratified_sample(df.repartition(17), "lang",
                           {"en": 0.5, "de": 0.1}, "id").collect()}
    assert a == b

    # monotone: raising a rate only ADDS rows (nested samples)
    bigger = {r["id"] for r in
              stratified_sample(df, "lang", {"en": 0.8, "de": 0.1},
                                "id").collect()}
    assert a <= bigger

    # default rate applies to unlisted strata; None drops them
    assert stratified_sample(df, "lang", {"en": 0.5}, "id").filter(
        F.col("lang") == "de").count() == 0
    assert stratified_sample(df, "lang", {}, "id", default=1.0).count() == 2000

    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(df, "lang", {"en": 1.5}, "id")


def test_pack_sequences_concat_and_chunk(spark):
    rows = [(i, f"d{i}", t) for i, t in
            enumerate([30, 80, 100, 5, 0, 60])]  # tape length 275
    df = spark.createDataFrame(rows, ["ord", "doc", "toks"])
    out = {r["doc"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
           for r in pack_sequences(df, "toks", 100, "ord").collect()}
    assert out["d0"] == (0, 0, 1)     # tokens [0,30)
    assert out["d1"] == (0, 30, 2)    # [30,110) straddles the cut at 100
    assert out["d2"] == (1, 10, 2)    # [110,210)
    assert out["d3"] == (2, 10, 1)    # [210,215)
    assert out["d4"] == (2, 15, 1)    # zero tokens: position only
    assert out["d5"] == (2, 15, 1)    # [215,275)

    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(df, "toks", 0, "ord")


def test_pack_sequences_distributed_scan_matches_single_partition(spark):
    # the range-partitioned scan must equal the trivially-correct 1-partition
    # run on the same data, for any partition count
    df = spark.createDataFrame(
        [(i, (i * 37) % 90 + 1) for i in range(500)], ["ord", "toks"]
    )
    ref = {r["ord"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
           for r in pack_sequences(df, "toks", 128, "ord",
                                   partitions=1).collect()}
    for n in (3, 8, 32):
        got = {r["ord"]: (r["seq_id"], r["seq_offset"], r["n_seqs"])
               for r in pack_sequences(df, "toks", 128, "ord",
                                       partitions=n).collect()}
        assert got == ref, n
