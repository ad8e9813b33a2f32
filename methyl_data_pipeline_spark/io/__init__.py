"""Sources & sinks (reference S1-S11, SURVEY §2.1)."""

from methyl_data_pipeline_spark.io.readers import (  # noqa: F401
    read_any,
    read_beta_csv,
    read_final_report,
    read_sample_tables,
    read_idat_dir,
)
from methyl_data_pipeline_spark.io.writers import (  # noqa: F401
    write_parquet_by_run,
    write_csv,
    write_excel,
)
