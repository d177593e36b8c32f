"""Runnable walkthrough: the semantic (LLM-powered) operator surface.

The reference-parity operators — sem_filter / sem_map / sem_join /
sem_topk / sem_agg — each take a natural-language instruction with
``{column}`` placeholders and an LM. Here they run with the repo's
DETERMINISTIC fake LMs (keyword / regex scorers), so the script works
offline and reproducibly; swap ``lm=`` for a real client
(``lotus_spark.models.lm.LM``, litellm-backed) to run against an actual
model — prompts, batching, caching, rate limits, and cost accounting
all live behind the same interface.

    python examples/semantic_queries.py [sf_dir]   # default sf0.001
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from lotus_spark import sem_filter, sem_join, sem_map, sem_topk
    from lotus_spark.models.fake_lm import KeywordBoolLM, RegexMapLM
    from lotus_spark.models.demo_lms import PairKeywordJoinLM, TokenCountJudgeLM
    from lotus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "text"))

    # sem_filter: NL predicate over a column; executor-side batched LM
    # calls through an Arrow UDF, prompts built per the reference's
    # formatter semantics.
    kept = sem_filter(docs, "{text} is about distributed computing",
                      lm=KeywordBoolLM("spark"))
    print("sem_filter kept:", kept.count(), "docs")

    # sem_map: NL transform; the postprocessor parses the LM's answer
    # out of its completion.
    mapped = sem_map(docs.limit(5), "state the language {lang} in uppercase",
                     lm=RegexMapLM(r"\[lang\]: «(\w+)»", "upper"))
    mapped.select("doc_id", "lang", "_map").show(5, truncate=False)

    # sem_join: NL predicate over PAIRS (left row, right row); the
    # nested-loop tier — see sem_sim_join / join cascades for the
    # scale paths.
    kws = spark.createDataFrame(
        [("spark",), ("vector",), ("merge",)], ["kw"])
    joined = sem_join(docs.limit(50), kws,
                      "{text} mentions the concept {kw}",
                      lm=PairKeywordJoinLM("text", "kw"))
    print("sem_join matches:", joined.count())

    # sem_topk: comparator-based ranking — quickselect with batched
    # pivot comparisons (one LM round trip per round, not per pair).
    top = sem_topk(docs.limit(50), "which {text} is longer?", K=3,
                   lm=TokenCountJudgeLM())
    top.select("doc_id").show(3)


if __name__ == "__main__":
    main()
