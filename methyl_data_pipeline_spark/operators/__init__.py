"""Relational + QC operators (SURVEY §2.2, §2.3, §2.6, §2.7).

All pure ``DataFrame -> DataFrame`` functions; every predicate is a
Catalyst expression so pushdown / pruning apply.
"""

from methyl_data_pipeline_spark.operators.qc import (  # noqa: F401
    drop_incomplete_probes,
    drop_all_missing_probes,
    filter_cg_probes,
    drop_sex_chromosomes,
    filter_samples_by_detp,
    filter_probes_by_detp,
    dedup_samples,
    audit_membership,
)
from methyl_data_pipeline_spark.operators.joins import (  # noqa: F401
    combine_runs_wide,
    combine_runs_long,
    enrich_with_samples,
    rename_samples_by_lookup,
)
from methyl_data_pipeline_spark.operators.topk import (  # noqa: F401
    top_k_by,
    top_k_per_group,
)
