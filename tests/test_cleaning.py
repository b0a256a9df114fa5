"""PMI collocation tests (hand-math replicas)."""

from __future__ import annotations

def test_pmi_collocations_matches_hand_math(spark):
    import math

    from vectordb_migrator_spark.operators.cleaning import pmi_collocations

    # 'new york' always collocates; 'the the' co-occurs by chance
    docs = [(i, "new york is big and the weather in new york is nice")
            for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, min_count=5, top_k=50).collect()
    }
    # corpus: 5 copies of a 12-token doc -> 60 tokens, 55 bigrams
    n_uni, n_bi = 60.0, 55.0
    r = got[("new", "york")]
    assert (r["n_pair"], r["n_w1"], r["n_w2"]) == (10, 10, 10)
    want = round(
        math.log2((10 / n_bi) / ((10 / n_uni) * (10 / n_uni))), 6
    )
    assert abs(r["pmi"] - want) < 1e-9
    # every surviving pair respects the floor
    assert all(v["n_pair"] >= 5 for v in got.values())
    # 'york is' (10 of 10 york, 10 of 10 is... is appears 10) exists
    assert ("york", "is") in got
