"""Benchmark decontamination (operators/decontam.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from argostats_spark.operators.decontam import ngram_contamination


@pytest.fixture(scope="module")
def tables(spark):
    corpus = spark.createDataFrame(
        [
            # shares the full benchmark 3-gram "the quick brown" + more
            (1, "the quick brown fox jumps over the lazy dog"),
            # clean: no 3-gram in common with the benchmark
            (2, "completely unrelated text about spark physical plans"),
            # short doc (< 3 tokens): zero n-grams, never contaminated
            (3, "two tokens"),
            # one overlapping 3-gram exactly ("pack my box")
            (4, "please pack my box tonight"),
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [
            (100, "the quick brown fox"),
            (101, "pack my box with five dozen jugs"),
        ],
        "doc_id long, text string",
    )
    return corpus, benchmark


def test_planted_contamination_flags(spark, tables):
    corpus, benchmark = tables
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(corpus, benchmark, n=3).collect()
    }
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] >= 2
    assert out[2]["contaminated"] == 0 and out[2]["n_hits"] == 0
    # short doc: empty n-gram set, ratio 0, not contaminated
    assert out[3]["n_grams"] == 0 and out[3]["contaminated"] == 0
    assert out[3]["hit_ratio"] == 0.0
    assert out[4]["contaminated"] == 1 and out[4]["n_hits"] == 1


def test_every_corpus_doc_reported_once(spark, tables):
    corpus, benchmark = tables
    out = ngram_contamination(corpus, benchmark, n=3)
    assert out.count() == corpus.count()
    assert out.select("doc_id").distinct().count() == corpus.count()


def test_min_hits_threshold(spark, tables):
    corpus, benchmark = tables
    out = {
        r["doc_id"]: r["contaminated"]
        for r in ngram_contamination(corpus, benchmark, n=3, min_hits=2).collect()
    }
    # doc 4 has exactly one colliding 3-gram -> clean under min_hits=2
    assert out[4] == 0
    assert out[1] == 1


def test_benchmark_side_is_broadcast(spark, tables):
    from argostats_spark.plans.explain import physical_plan

    corpus, benchmark = tables
    plan = physical_plan(ngram_contamination(corpus, benchmark, n=3))
    assert "BroadcastHashJoin" in plan
    # the corpus n-gram stream must not sort-merge against the benchmark
    assert "SortMergeJoin" not in plan.split("n_hits")[0]
