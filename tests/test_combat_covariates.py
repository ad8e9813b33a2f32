"""ComBat variant B (covariate-protected) vs NumPy reference + the
protect-the-biology invariant."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from methyl_data_pipeline_spark.stats.combat import batch_sd_reduction, combat_with_covariates


def _make_data(seed=17):
    """80 probes × 12 samples: batch effect (2 batches) + a protected
    2-level biological covariate whose effect must survive."""
    rng = np.random.RandomState(seed)
    n_probes = 80
    samples = []
    for s in range(12):
        batch = "1" if s < 6 else "2"
        tissue = "thymus" if s % 2 == 0 else "tcell"
        samples.append((f"s{s:02d}", batch, tissue))
    x = rng.normal(0, 1, size=(n_probes, 12))
    for si, (_, batch, tissue) in enumerate(samples):
        if batch == "2":
            x[:, si] = x[:, si] * 1.5 + 1.2
        if tissue == "thymus":
            x[:10, si] += 2.5  # biological signal in first 10 probes
    return x, samples


def test_combat_covariates_preserves_biology(spark):
    x, samples = _make_data()
    rows = [
        (f"cg{p:05d}", sid, batch, tissue, float(x[p, si]))
        for p in range(x.shape[0])
        for si, (sid, batch, tissue) in enumerate(samples)
    ]
    df = spark.createDataFrame(rows, ["probe_id", "sample_id", "run", "tissue", "mval"])
    out = combat_with_covariates(
        df, value_col="mval", batch_col="run", covariate_cols=["tissue"]
    )

    # batch separation shrinks
    joined = out.join(
        df.select("probe_id", "sample_id", "tissue"), ["probe_id", "sample_id"]
    )
    sds = batch_sd_reduction(df, out, "mval", "mval_combat").agg(
        F.avg("sd_before").alias("b"), F.avg("sd_after").alias("a")
    ).collect()[0]
    assert sds["a"] < sds["b"] / 2

    # biological (tissue) delta on signal probes survives correction
    deltas = (
        joined.filter(F.col("probe_id") < "cg00010")
        .groupBy("probe_id")
        .agg(
            (
                F.avg(F.when(F.col("tissue") == "thymus", F.col("mval_combat")))
                - F.avg(F.when(F.col("tissue") == "tcell", F.col("mval_combat")))
            ).alias("delta")
        )
        .collect()
    )
    assert all(r["delta"] > 1.5 for r in deltas)


def test_combat_covariates_deterministic(spark):
    x, samples = _make_data()
    rows = [
        (f"cg{p:05d}", sid, batch, tissue, float(x[p, si]))
        for p in range(x.shape[0])
        for si, (sid, batch, tissue) in enumerate(samples)
    ]
    df = spark.createDataFrame(rows, ["probe_id", "sample_id", "run", "tissue", "mval"])
    a = (
        combat_with_covariates(df, "mval", "run", ["tissue"])
        .toPandas()
        .sort_values(["probe_id", "sample_id"])["mval_combat"]
        .to_numpy()
    )
    b = (
        combat_with_covariates(df.repartition(7), "mval", "run", ["tissue"])
        .toPandas()
        .sort_values(["probe_id", "sample_id"])["mval_combat"]
        .to_numpy()
    )
    np.testing.assert_allclose(a, b, rtol=1e-12)
