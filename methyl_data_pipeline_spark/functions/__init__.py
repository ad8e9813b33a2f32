"""Scalar expression helpers (reference F1-F16, SURVEY §2.9)."""

from methyl_data_pipeline_spark.functions.scalar import (  # noqa: F401
    run_from_index,
    sentrix_key,
    parse_tb_sample,
    strip_r_prefix,
    normalize_label,
    normalize_ws,
    sanitize_filename,
    neg_log10,
    significance_flag,
)
