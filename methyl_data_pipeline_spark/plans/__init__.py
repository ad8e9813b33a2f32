"""Pipeline assembly (SURVEY §3.2's workflow.R as one lazy program)."""

from methyl_data_pipeline_spark.plans.pipeline import run_methylation_pipeline  # noqa: F401
