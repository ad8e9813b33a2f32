"""Multi-contrast limma (shared pooled variance) vs a NumPy oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from methyl_data_pipeline_spark.stats.limma import moderated_t_contrasts


def test_contrasts_shared_variance_vs_numpy(spark):
    rng = np.random.RandomState(21)
    groups = ["A", "B", "C"]
    n_per = 4
    rows = []
    for pi in range(40):
        for gi, g in enumerate(groups):
            shift = 5.0 if (pi < 5 and g == "B") else 0.0
            for si in range(n_per):
                rows.append(
                    (f"cg{pi:04d}", f"{g}{si}", g, float(rng.normal(shift, 1)))
                )
    df = spark.createDataFrame(rows, ["probe_id", "sample_id", "grp", "mval"])
    out = moderated_t_contrasts(
        df, "grp", [("A", "B"), ("A", "C")], value_col="mval"
    ).toPandas()
    assert set(out["contrast"]) == {"A_vs_B", "A_vs_C"}
    assert len(out) == 80

    pdf = pd.DataFrame(rows, columns=["probe_id", "sample_id", "grp", "mval"])
    g = pdf.groupby(["probe_id", "grp"])["mval"].agg(["count", "mean", "var"])
    stats = g.unstack()
    n = stats["count"]
    s2 = ((n - 1) * stats["var"]).sum(axis=1) / (n.sum(axis=1) - len(groups))
    s0 = s2.mean()
    d0 = 2 * s0**2 / s2.var(ddof=1)
    df_ = n.sum(axis=1) - len(groups)
    s2p = (d0 * s0 + df_ * s2) / (d0 + df_)
    for a, b in [("A", "B"), ("A", "C")]:
        t = (stats["mean"][a] - stats["mean"][b]) / np.sqrt(
            s2p * (1 / n[a] + 1 / n[b])
        )
        got = (
            out[out.contrast == f"{a}_vs_{b}"]
            .set_index("probe_id")["t_mod"]
            .sort_index()
        )
        np.testing.assert_allclose(got.values, t.sort_index().values, rtol=1e-9)
    # the planted B-shift probes dominate A_vs_B
    ab = out[out.contrast == "A_vs_B"]
    top = ab.reindex(ab["t_mod"].abs().sort_values(ascending=False).index).head(5)
    assert all(int(p[2:]) < 5 for p in top["probe_id"])
