

def test_containment_pairs_directed_hand_truth(spark):
    """C(A->B) = |A∩B|/|A| is DIRECTED: the small doc contained in the
    big one passes at t=0.8 while the reverse direction fails."""
    from arrow_spark.llm.dedup import containment_pairs

    rows = [
        ("small", "alpha beta"),
        ("big", "alpha beta gamma delta epsilon"),
        ("other", "zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    assert got == {("small", "big"): 1.0}


def test_containment_stopgram_cap_recall_knob(spark):
    """stopgram_df_cap is an EXPLICIT recall trade (r13): prefix tokens
    above the document-frequency cap generate no candidates, so a doc
    whose every prefix token is a stopgram loses its containers, while
    pairs reachable through any rare prefix token survive. Output is
    always a SUBSET of the uncapped relation (no false positives — the
    verify stage is unchanged)."""
    from arrow_spark.llm.dedup import containment_pairs

    # 'tpl1 tpl2' appear in ALL docs (df=5, the template); 'rare*' are
    # one-doc tokens. 'boiler' is pure template — contained in every
    # other doc but only discoverable through stopgram prefixes.
    rows = [
        ("boiler", "tpl1 tpl2"),
        ("a", "tpl1 tpl2 rare1 rare2"),
        ("a2", "tpl1 tpl2 rare1 rare2 rare9"),
        ("b", "tpl1 tpl2 rare3 rare4"),
        ("c", "tpl1 tpl2 rare5 rare6"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    uncapped = {
        (r["id_a"], r["id_b"]) for r in containment_pairs(df, threshold=0.8).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df, threshold=0.8, stopgram_df_cap=3).collect()
    }
    # subset, never superset
    assert capped <= uncapped
    # the boilerplate doc's containers are the recall price...
    assert ("boiler", "a") in uncapped and ("boiler", "a") not in capped
    # ...while the rare-token-reachable pair survives the cap
    assert ("a", "a2") in uncapped and ("a", "a2") in capped


def test_containment_stopgram_cap_default_off(spark):
    """Default (None) must leave the relation bit-identical to the
    pre-knob plan — the oracle-checked registered queries pass no cap."""
    from arrow_spark.llm.dedup import containment_pairs

    rows = [
        ("small", "alpha beta"),
        ("big", "alpha beta gamma delta epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    a = sorted(map(tuple, containment_pairs(df, threshold=0.8).collect()))
    b = sorted(
        map(tuple, containment_pairs(df, threshold=0.8, stopgram_df_cap=None).collect())
    )
    assert a == b == [("small", "big", 1.0)]
