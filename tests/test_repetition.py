"""operators/repetition: within-document repetition signals + benchmark
n-gram decontamination — hand-computed expectations on crafted docs."""

from pyspark.sql import Row

from orientdb_neo4j_importer_plugin_spark.operators.repetition import (
    decontaminate,
    repetition_signals,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repetition_signals_hand_computed(spark):
    out = _by_id(
        repetition_signals(
            _docs(
                spark,
                [
                    "a a a a a a",  # pure repetition
                    "a b c d e f",  # no repetition
                    "x y x y x y",  # alternating pair
                ],
            )
        )
    )
    pure = out[0]
    # 6 tokens, 1 distinct -> 1666 bp; every 2/3-gram identical -> 10000
    assert pure["n_tokens"] == 6
    assert pure["uniq_token_bp"] == 1666
    assert pure["top2_bp"] == 10000
    assert pure["top3_bp"] == 10000
    # 2 five-grams, 1 distinct -> dup share 5000
    assert pure["dup5_bp"] == 5000

    uniq = out[1]
    assert uniq["uniq_token_bp"] == 10000
    # 5 distinct bigrams of 5 -> top share 2000; no dup 5-grams
    assert uniq["top2_bp"] == 2000
    assert uniq["dup5_bp"] == 0

    alt = out[2]
    # bigrams: x-y x3, y-x x2 -> top 3/5 = 6000
    assert alt["top2_bp"] == 6000
    assert alt["uniq_token_bp"] == 3333


def test_repetition_signals_short_doc_null_dup5(spark):
    out = _by_id(repetition_signals(_docs(spark, ["a b c"])))
    assert out[0]["n_tokens"] == 3
    assert out[0]["top2_bp"] == 5000  # 2 distinct bigrams of 2
    assert out[0]["dup5_bp"] is None  # < 5 tokens: no 5-grams


def test_decontaminate_flags_only_overlapping_docs(spark):
    bench = _docs(spark, ["q w e r t y u i o p"])
    corpus = spark.createDataFrame(
        [
            # shares two distinct 8-grams (positions 1-8 and 2-9 of bench)
            Row(doc_id=10, text="q w e r t y u i o"),
            # same tokens, different order: no shared 8-gram
            Row(doc_id=11, text="p o i u y t r e w q"),
            Row(doc_id=12, text="totally unrelated text here with words"),
        ]
    )
    got = _by_id(decontaminate(corpus, bench, n=8))
    assert set(got) == {10}
    assert got[10]["n_hits"] == 2


def test_decontaminate_plan_broadcasts_benchmark(spark):
    bench = _docs(spark, ["a b c d e f g h i"])
    corpus = _docs(spark, ["a b c d e f g h i j k"])
    plan = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_vocab_topk_deterministic_tiebreak(spark):
    from orientdb_neo4j_importer_plugin_spark.operators.repetition import (
        vocab_topk,
    )

    docs = _docs(spark, ["b a", "a b", "c c", "z"])
    # counts: a=2(2 docs), b=2(2), c=2(1), z=1(1) -> ties broken token-asc
    got = [tuple(r) for r in vocab_topk(docs, k=3).collect()]
    assert got == [("a", 2, 2), ("b", 2, 2), ("c", 2, 1)]
