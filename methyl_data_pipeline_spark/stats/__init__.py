"""Statistical operators (SURVEY §2.4, §2.10): BH-FDR, variance top-k,
limma-style moderated t, ComBat, BMIQ, PCA."""

from methyl_data_pipeline_spark.stats.bh import bh_adjust  # noqa: F401
from methyl_data_pipeline_spark.stats.feature_selection import (  # noqa: F401
    per_probe_variance,
    top_k_variable_probes,
)
from methyl_data_pipeline_spark.stats.limma import (  # noqa: F401
    group_mean_deltas,
    moderated_t_two_group,
)
from methyl_data_pipeline_spark.stats.combat import combat  # noqa: F401
from methyl_data_pipeline_spark.stats.bmiq import bmiq_normalize  # noqa: F401
from methyl_data_pipeline_spark.stats.pca import pca_scores  # noqa: F401
