"""Canonical data model: the long-form methylation fact table.

The reference's central structure is a *wide* beta matrix — rows keyed
by probe, one column per sample (``main.py:240-241``: 285,143 probes x
135 cols). Wide-with-dynamic-columns does not scale past ~10k columns
and turns every operation into a schema mutation, so the engine's
canonical form is the tidy long table::

    meth(probe_id STRING, sample_id STRING, run STRING,
         beta DOUBLE, det_p DOUBLE)

with broadcastable dimensions::

    samples(sample_id, run, experiment, genotype, tissue, ...)
    probes(probe_id, targetid, design_type INT, chr)

Key semantic decision (SURVEY §7.3): the wide matrix encodes "probe
absent in that run" as a NaN cell of an outer join (``filter.py:45-50``);
the long form encodes it as *row absence*. Completeness predicates must
therefore compare per-probe observation counts against the expected
sample count, never just scan for nulls — see ``operators.qc``.

Wide form exists only at the edges (ingest of vendor exports, export for
fixture parity) via :func:`melt` / :func:`pivot_wide`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

# --------------------------------------------------------------------------
# Schemas
# --------------------------------------------------------------------------

METH_SCHEMA = T.StructType(
    [
        T.StructField("probe_id", T.StringType(), False),
        T.StructField("sample_id", T.StringType(), False),
        T.StructField("run", T.StringType(), True),
        T.StructField("beta", T.DoubleType(), True),
        T.StructField("det_p", T.DoubleType(), True),
    ]
)

SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.StringType(), False),
        T.StructField("run", T.StringType(), True),
        T.StructField("sentrix_barcode", T.StringType(), True),
        T.StructField("sample_section", T.StringType(), True),
        T.StructField("experiment", T.IntegerType(), True),
        T.StructField("genotype", T.StringType(), True),
        T.StructField("tissue", T.StringType(), True),
    ]
)

PROBES_SCHEMA = T.StructType(
    [
        T.StructField("probe_id", T.StringType(), False),
        T.StructField("targetid", T.StringType(), True),
        # design type: 1 = Infinium Type I, 2 = Type II (last-2-chars
        # "11"/"21" codes of the reference, bmiq/DoBMIQ.R:53-54)
        T.StructField("design_type", T.IntegerType(), True),
        T.StructField("chr", T.StringType(), True),
    ]
)


# --------------------------------------------------------------------------
# Wide ⇄ long (reference ops R1-R3, SURVEY §2.8)
# --------------------------------------------------------------------------

def melt(
    wide: DataFrame,
    id_col: str = "TargetID",
    value_cols: list[str] | None = None,
    var_name: str = "sample_id",
    value_name: str = "beta",
) -> DataFrame:
    """Wide matrix -> long (probe_id, sample_id, value). Reference R2.

    Uses the built-in ``unpivot`` (Spark >= 3.4) so the transform stays
    JVM-side and columnar; no Python row handling.
    """
    if value_cols is None:
        value_cols = [c for c in wide.columns if c != id_col]
    # vendor sample columns contain dots (`TB1_1.AVG_Beta`) — backtick-
    # quote so they resolve as whole names, not struct paths
    def bq(c: str) -> Column:
        return F.col("`" + c.replace("`", "``") + "`")

    out = wide.unpivot(
        ids=[bq(id_col)],
        values=[bq(c) for c in value_cols],
        variableColumnName=var_name,
        valueColumnName=value_name,
    )
    return out.withColumnRenamed(id_col, "probe_id")


def pivot_wide(
    long_df: DataFrame,
    sample_ids: list[str] | None = None,
    value_col: str = "beta",
) -> DataFrame:
    """Long -> wide matrix (probe rows, one column per sample). R3.

    Only for export / fixture parity at bounded column counts — the
    engine never computes on the wide form. Passing ``sample_ids``
    explicitly avoids the extra distinct-collect pass Spark otherwise
    runs to discover pivot values.
    """
    p = long_df.groupBy("probe_id")
    if sample_ids is not None:
        piv = p.pivot("sample_id", sample_ids)
    else:
        piv = p.pivot("sample_id")
    return piv.agg(F.first(value_col))


def mvalue(beta: Column | str, clamp: bool = True, eps: float = 0.001) -> Column:
    """Beta -> M-value: log2(beta / (1 - beta)). Reference F9 + P13.

    ``workflow.R:135``; clamping to [eps, 1-eps] (``volcano.R:86``)
    keeps M finite, which is the reference's own guard against ±Inf
    (``workflow.R:136-137``).
    """
    b = F.col(beta) if isinstance(beta, str) else beta
    if clamp:
        b = F.least(F.greatest(b, F.lit(eps)), F.lit(1.0 - eps))
    return F.log2(b / (1.0 - b))


def inv_mvalue(m: Column | str) -> Column:
    """M-value -> beta: 2^m / (1 + 2^m). Reference F10 (workflow.R:147)."""
    mm = F.col(m) if isinstance(m, str) else m
    return F.pow(F.lit(2.0), mm) / (F.lit(1.0) + F.pow(F.lit(2.0), mm))


def clamp(col: Column | str, lo: float = 0.0, hi: float = 1.0) -> Column:
    """Clip values into [lo, hi]. Reference P13 (workflow.R:148-149)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
