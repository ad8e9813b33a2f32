"""Scalar string/math expressions (reference F1-F16, SURVEY §2.9).

All Catalyst built-ins — JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def run_from_index(col: Column | str) -> Column:
    """run = Index.split('_')[0] (reference F1: main.py:140)."""
    return F.split(_c(col), "_")[0]


def sentrix_key(barcode: Column | str, section: Column | str) -> Column:
    """`{SentrixBarcode}_{Section}` sample key (reference F2:
    main.py:141, workflow.R:29-31)."""
    return F.concat_ws("_", _c(barcode), _c(section))


def parse_tb_sample(col: Column | str) -> tuple[Column, Column]:
    """`TB{sid}_{experiment}` -> (sid INT, experiment INT) (reference
    F3: dataset.py:33-36)."""
    c = _c(col)
    return (
        F.regexp_extract(c, r"TB(\d+)_(\d+)", 1).cast("int"),
        F.regexp_extract(c, r"TB(\d+)_(\d+)", 2).cast("int"),
    )


def strip_r_prefix(col: Column | str) -> Column:
    """Undo R's `X`-prefix mangling of numeric column names and the
    `.AVG_Beta` suffix (reference F4: analysis/pca_analysis.py:25-26,
    workflow.R:112)."""
    # only strip the X that R's make.names PREPENDS (names starting
    # with a digit/dot) — a legitimate X-initial id like 'X27_plate1'
    # was never mangled and must survive
    return F.regexp_replace(
        F.regexp_replace(_c(col), r"^X(?=[0-9.])", ""), r"\.AVG_Beta$", ""
    )


def normalize_label(col: Column | str) -> Column:
    """Lowercase + trim + squeeze internal whitespace — the genotype
    normalization of plots.R:22-28 / dataset.py:25."""
    return F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")


def normalize_ws(col: Column | str) -> Column:
    """Trim + squeeze internal whitespace, CASE-PRESERVING — the body
    normalization for operators whose output text feeds training
    (segment dedup, chunking): casing is signal the model learns from,
    so only whitespace is canonicalized. ``normalize_label``'s
    lowercasing is for join/dedup KEYS and label matching."""
    return F.regexp_replace(F.trim(_c(col)), r"\s+", " ")


def sanitize_filename(col: Column | str) -> Column:
    """Replace non-word chars with `_` (reference dataset.py:48)."""
    return F.regexp_replace(_c(col), r"[^\w\-]", "_")


def neg_log10(col: Column | str) -> Column:
    """-log10(p) for volcano prep (reference F11: volcano.R:166).
    p is floored at 1e-300: Spark's log10 yields NULL for non-positive
    input, which would silently drop the STRONGEST hits (p underflowed
    to 0) from the volcano instead of plotting them at the top."""
    return -F.log10(F.greatest(_c(col), F.lit(1e-300)))


def significance_flag(
    p_col: Column | str, lfc_col: Column | str,
    p_thresh: float = 0.05, lfc_thresh: float = 0.5849625007211562,  # log2(1.5)
) -> Column:
    """3-way significance label (reference P14: plots.R:165:
    FDR<0.05 & |logFC|>log2(1.5))."""
    p, lfc = _c(p_col), _c(lfc_col)
    return (
        F.when((p < p_thresh) & (lfc > lfc_thresh), F.lit("up"))
        .when((p < p_thresh) & (lfc < -lfc_thresh), F.lit("down"))
        .otherwise(F.lit("ns"))
    )
