"""Z-order (Morton) clustering key for multi-column file pruning.

``compact(sort_by=["ts"])`` gives tight per-file ranges on ONE column; a
predicate on any other column still scans every file. Z-ordering interleaves
the bits of several columns' bin indexes so files are simultaneously
range-local in EVERY participating dimension — per-file min/max stats then
prune on each of them (Delta's ``OPTIMIZE ZORDER BY``, the reference's
clustering lever at ``core/spark_delta.py:144-150``).

Mechanics, chosen for the 100 TB shape:

* each column is quantile-binned (``approxQuantile`` at compact time, one
  tiny driver list per column) rather than min/max-scaled — skewed
  distributions still spread across bins;
* the bin bounds persist as table properties, so subsequent APPENDS reuse
  the same key (no re-sampling per micro-batch) and stay consistently
  clustered until the next compact refreshes the bounds;
* the z-value is a pure JVM-side column expression (comparisons + bit
  shifts, whole-stage codegen) used ONLY as a sort key — it is never
  stored, and layout quality affects pruning EFFICIENCY, never correctness
  (file stats are computed from the actual column values afterwards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# bits per column; ncols * bits must stay < 64 (z fits a signed long)
ZORDER_BITS = 8


def _numeric_expr(col: str, dtype: T.DataType) -> F.Column:
    """Monotone numeric projection of a column for binning. Session-tz
    subtleties (NTZ casts) can only perturb LAYOUT, not correctness, so the
    simple cast is acceptable here — unlike in the stats encoder."""
    c = F.col(col)
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(c).cast("double")
    if isinstance(dtype, T.TimestampNTZType):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if isinstance(dtype, T.DateType):
        return F.unix_date(c).cast("double")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                          T.FloatType, T.DoubleType, T.BooleanType)):
        return c.cast("double")
    raise ValueError(
        f"zorder_by column {col!r} has unsupported type "
        f"{dtype.simpleString()}; z-ordering needs a range-comparable "
        f"numeric/temporal column (strings have no meaningful range "
        f"locality — use bucketing or blooms for those)"
    )


def compute_bounds(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS,
    relative_error: float = 0.01,
) -> dict[str, list[float]]:
    """Per-column quantile bin bounds (2^bits - 1 cut points, driver-side,
    one approxQuantile pass over a numeric projection)."""
    types = {f.name: f.dataType for f in df.schema.fields}
    proj = df.select(*[
        _numeric_expr(c, types[c]).alias(f"__z{i}") for i, c in enumerate(cols)
    ])
    n_cuts = (1 << bits) - 1
    probs = [k / (1 << bits) for k in range(1, n_cuts + 1)]
    # ONE multi-column approxQuantile job — a per-column loop would scan
    # the projection once per z-order column
    all_qs = proj.approxQuantile(
        [f"__z{i}" for i in range(len(cols))], probs, relative_error
    )
    out: dict[str, list[float]] = {}
    for i, c in enumerate(cols):
        qs = all_qs[i]
        # strictly increasing bounds (duplicates collapse bins, harmless,
        # but a sorted unique list keeps the bin expression minimal)
        uniq: list[float] = []
        for q in qs:
            if q is not None and (not uniq or q > uniq[-1]):
                uniq.append(float(q))
        out[c] = uniq
    return out


def zorder_expr(
    schema: T.StructType, bounds: dict[str, list[float]],
    bits: int = ZORDER_BITS,
) -> F.Column:
    """Interleaved-bit z-value column from persisted bounds. NULLs in any
    participating column yield a NULL z (those rows cluster together at the
    sort boundary, which is exactly what you want for stats)."""
    cols = list(bounds)
    if len(cols) * bits >= 64:
        raise ValueError(
            f"{len(cols)} columns x {bits} bits exceeds the 63-bit z budget"
        )
    types = {f.name: f.dataType for f in schema.fields}
    bins = []
    for c in cols:
        x = _numeric_expr(c, types[c])
        arr = F.array(*[F.lit(b) for b in bounds[c]])
        # bin index = number of bounds <= x (0 .. 2^bits-1), one JVM-side
        # fold over the (tiny) literal bounds array
        bins.append(
            F.aggregate(
                F.transform(arr, lambda b: (x >= b).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        )
    ncols = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bins):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * ncols + j))
    return z
