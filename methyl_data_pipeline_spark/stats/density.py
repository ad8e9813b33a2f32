"""Kernel density estimation over the long fact table.

Reference A12 (SURVEY §2.4): R ``density(beta.v)`` drives the QC
density plots (`Mouse_Microarray_General_Workflow.R:46`) and BMIQ's
mode estimation (`bmiq/BMIQ_1.4.R:99-106`). R evaluates a
Gaussian-kernel sum on a fixed grid (via FFT for speed); the Spark
formulation evaluates the same estimator definitionally:

    f(x) = (1/(n·h)) Σ_i φ((x - v_i)/h)

Physical shape: the evaluation grid (g ≈ 10² points) broadcasts, each
data partition computes partial kernel sums per grid point (map-side
combine), and the shuffle carries only g rows per partition — O(n·g)
flops fully inside whole-stage codegen, no UDF, no driver collect of
the data. Scales to any n; g stays tiny by construction.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def kde_density(
    df: DataFrame,
    value_col: str = "beta",
    bandwidth: float = 0.05,
    grid_min: float = 0.0,
    grid_max: float = 1.0,
    grid_points: int = 101,
    group_col: str | None = None,
) -> DataFrame:
    """Gaussian KDE evaluated on an evenly spaced grid.

    Returns (``group_col``?, x, density). ``group_col`` gives per-group
    curves (e.g. per-sample QC densities) from one pass — the grid
    crossJoin is per-row, the groupBy key just widens.
    """
    spark = df.sparkSession
    step = (grid_max - grid_min) / (grid_points - 1)
    grid = spark.range(grid_points).select(
        (F.lit(float(grid_min)) + F.col("id") * F.lit(float(step))).alias("x")
    )
    src = df.filter(F.col(value_col).isNotNull())
    joined = src.crossJoin(F.broadcast(grid))
    z = (F.col("x") - F.col(value_col)) / F.lit(float(bandwidth))
    kernel = F.exp(-0.5 * z * z)
    norm = float(bandwidth) * math.sqrt(2.0 * math.pi)
    keys = ([group_col] if group_col else []) + ["x"]
    return (
        joined.groupBy(*[F.col(k) for k in keys])
        .agg((F.avg(kernel) / F.lit(norm)).alias("density"))
        .orderBy(*keys)
    )
