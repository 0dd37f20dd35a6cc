"""Quality-classifier distillation flow: exact rank-sum AUC and
batch-GD logistic regression over hashed-TF features."""

from pyspark.sql import functions as F

from gluestick_ts_spark.operators.ml import (
    binary_auc,
    logreg_score_expr,
    train_logreg,
)


def test_binary_auc_exact_cases(spark):
    perfect = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.3, 0), (0.1, 0)], "s double, y int")
    assert binary_auc(perfect, "s", "y").first().auc == 1.0
    inverted = spark.createDataFrame(
        [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)], "s double, y int")
    assert binary_auc(inverted, "s", "y").first().auc == 0.0
    tied = spark.createDataFrame(
        [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)], "s double, y int")
    assert binary_auc(tied, "s", "y").first().auc == 0.5
    # hand-computed midrank case: scores .1(0) .2(1) .2(0) .3(1)
    # ranks: 1, then tie group {.2} midrank 2.5, then 4
    # rp = 2.5 + 4 = 6.5; auc = (6.5 - 3) / 4 = 0.875
    mixed = spark.createDataFrame(
        [(0.1, 0), (0.2, 1), (0.2, 0), (0.3, 1)], "s double, y int")
    assert binary_auc(mixed, "s", "y").first().auc == 0.875
    # partition-stability: midrank sums are exact k/2 values
    big = spark.createDataFrame(
        [(float(i % 17) / 17, 1 if i % 3 == 0 else 0) for i in range(500)],
        "s double, y int")
    a1 = binary_auc(big, "s", "y").first().auc
    a2 = binary_auc(big.repartition(13), "s", "y").first().auc
    assert a1 == a2


def test_binary_auc_stratified_matches_per_stratum_global(spark):
    """group_cols partitions the rank window: each stratum's row must
    equal the global AUC computed on that stratum alone (and the rank
    window must actually be partitioned — the 100 TB mitigation)."""
    rows = []
    for i in range(300):
        dom = "web" if i % 2 == 0 else "code"
        # different signal strength per stratum so the AUCs differ
        y = 1 if (i * 7) % 10 < (3 if dom == "web" else 7) else 0
        s = (y * (0.6 if dom == "web" else 0.2)) + float((i * 13) % 50) / 100
        rows.append((dom, s, y))
    df = spark.createDataFrame(rows, "dom string, s double, y int")
    strat = {
        r.dom: (r.auc, r.n_pos, r.n_neg)
        for r in binary_auc(df, "s", "y", group_cols=["dom"]).collect()
    }
    assert set(strat) == {"web", "code"}
    for dom in ("web", "code"):
        g = binary_auc(df.where(F.col("dom") == dom), "s", "y").first()
        assert strat[dom] == (g.auc, g.n_pos, g.n_neg)
    assert strat["web"][0] != strat["code"][0]
    # plan check: no unpartitioned (global) sort-rank window remains
    plan = binary_auc(df, "s", "y", group_cols=["dom"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SinglePartition" not in plan


def test_train_logreg_learns_separable_data(spark):
    rows = []
    for i in range(200):
        pos = i % 2 == 0
        base = 1.0 if pos else -1.0
        rows.append((
            [base + (i % 7) * 0.01, -base + (i % 5) * 0.01, 0.5],
            1 if pos else 0,
        ))
    df = spark.createDataFrame(rows, "x array<double>, y int")
    w, b = train_logreg(df, "x", "y", lr=0.5, iters=30)
    scored = df.select(logreg_score_expr("x", w, b).alias("s"), "y")
    auc = binary_auc(scored, "s", "y").first().auc
    assert auc >= 0.99, (auc, w, b)


def test_distillation_recipe_beats_chance_on_corpus(spark, sf_dir):
    """The LLaMA-style distillation loop end to end: Gopher-rule labels
    -> distill_quality_classifier (hashed-TF + log1p damping, the
    oscillation-proof recipe) -> map-only distilled_score_expr, whose
    held-in AUC clears 0.9 at every test scale (measured 0.956-0.961).
    The rules are learnable from the bag of hashed tokens alone."""
    from gluestick_ts_spark.functions.text import gopher_quality_flags
    from gluestick_ts_spark.operators.ml import (
        distill_quality_classifier,
        distilled_score_expr,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "text",
        gopher_quality_flags("text").getField("passes").cast("int").alias("y"),
    ).localCheckpoint(eager=True)
    w, b = distill_quality_classifier(d, "text", "y", dim=32)
    scored = d.select(distilled_score_expr("text", w, b).alias("s"), "y")
    auc = binary_auc(scored, "s", "y").first().auc
    assert auc >= 0.9, auc
