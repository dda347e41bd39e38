"""Row validation with error-array annotation, and valid/invalid splitting.

Re-expresses the reference's DataFrameValidator pattern
(``/root/reference/src/cdm_data_loader_utils/validation/dataframe_validator.py:
71-73`` and the null-constraint validator ``validation/df_nullable_fields.py:
33-61``): each validator appends error strings into an ``errors_in_record``
array column via pure column expressions + the higher-order ``filter``
function — no Python UDF, fully pushed into whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import ROW_ERRORS_COL, VALID_OPS


def annotate_errors(df: DataFrame, checks: dict[str, F.Column]) -> DataFrame:
    """Add ``errors_in_record``: names of failed checks (check passes ⇒ ok).

    ``checks`` maps error-message → boolean Column that is True when VALID.
    Null check results count as failures (three-valued logic pinned down, cf.
    df_nullable_fields.py:20-22 nullability caveat)."""
    entries = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(msg)).otherwise(F.lit(None))
        for msg, cond in checks.items()
    ]
    arr = F.array(*entries)
    return df.withColumn(
        ROW_ERRORS_COL, F.filter(arr, lambda x: x.isNotNull())
    )


def change_event_checks() -> dict[str, F.Column]:
    """Standard checks for the change-event envelope (FIXTURES.md §4 adverse
    rows: null conv_id/turn_idx/ts, negative turn_idx, op outside {i,u,d})."""
    return {
        "missing_required: conv_id": F.col("conv_id").isNotNull(),
        "missing_required: turn_idx": F.col("turn_idx").isNotNull(),
        "invalid_value: turn_idx < 0": F.col("turn_idx") >= 0,
        "missing_required: lsn": F.col("lsn").isNotNull(),
        "missing_required: ts": F.col("ts").isNotNull(),
        f"invalid_value: op not in {VALID_OPS}": F.col("op").isin(*VALID_OPS),
        "missing_required: text (op=i/u)": (
            (F.col("op") == "d") | F.col("text").isNotNull()
        ),
    }


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid) split on empty error array — cf. the reference's
    ``size(ROW_ERRORS)==0`` split in the idmapping pipeline
    (``parsers/uniprot/idmapping.py``)."""
    annotated = df if ROW_ERRORS_COL in df.columns else annotate_errors(
        df, change_event_checks()
    )
    valid = annotated.filter(F.size(ROW_ERRORS_COL) == 0).drop(ROW_ERRORS_COL)
    invalid = annotated.filter(F.size(ROW_ERRORS_COL) > 0)
    return valid, invalid
