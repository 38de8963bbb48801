

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
