"""Z-order (Morton) multi-dimensional layout (K/rel extension).

A 100 TB table queried by MORE THAN ONE dimension (user AND day,
part AND date) cannot be range-partitioned to serve both: sorting by
one key scatters the other. Interleaving the quantized dimensions'
bits into one Morton code and range-partitioning ON THE CODE gives
every file a narrow envelope in EVERY dimension simultaneously, so
min/max footer stats prune scans for either predicate — the layout
trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is integer div/mod arithmetic — identical semantics
in Spark SQL and DuckDB (no engine-specific bit operators), fully
inside whole-stage codegen, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantize_expr(col: str, scale: float, bits: int) -> str:
    """Quantize ``col`` onto the 0..2^bits-1 grid: floor-divide by the
    fixed ``scale`` (cell width in the column's units) and clamp.
    Fixed scales keep the code a PURE function of the row — stable
    under retries, appends, and engine replay (a data-dependent
    min/max normalization would re-shuffle history on every append)."""
    top = (1 << bits) - 1
    return (
        f"least(greatest(cast(floor(({col}) / {scale}) as bigint), 0), {top})"
    )


def morton_code_expr(cols: list[str], bits: int) -> str:
    """Interleave the bits of ``cols`` (each already on the
    0..2^bits-1 grid): bit j of dimension k lands at position
    ``j * len(cols) + k``. Emitted as a sum of disjoint powers of two
    (``(c div 2^j) % 2 * 2^pos``), so the expression is plain integer
    arithmetic every engine evaluates identically. Requires
    ``bits * len(cols) <= 62`` (the code stays a positive BIGINT)."""
    d = len(cols)
    if d < 2:
        raise ValueError("morton code needs at least 2 dimensions")
    if bits * d > 62:
        raise ValueError(f"bits * dims = {bits * d} exceeds 62")
    terms = []
    for j in range(bits):
        for k, c in enumerate(cols):
            # floor(x / 2^j) instead of an integer-div operator: the
            # identical expression text evaluates in Spark SQL AND
            # DuckDB (declared queries reuse it verbatim for the
            # oracle), exact for nonnegative values below 2^52.
            terms.append(
                f"(cast(floor(({c}) / {1 << j}) as bigint) % 2)"
                f" * {1 << (j * d + k)}"
            )
    return " + ".join(terms)


def zorder_code(
    df: DataFrame,
    specs: list[tuple[str, float]],
    bits: int = 16,
    out_col: str = "zcode",
) -> DataFrame:
    """Add the Morton code column for ``specs`` = [(col, cell_scale),
    ...]. Quantized grid cells materialize as temp columns first so
    each dimension's quantization is evaluated once, not once per
    interleaved bit. One narrow projection; composes with any
    downstream op."""
    tmp_cols = []
    for idx, (c, s) in enumerate(specs):
        name = f"__z{idx}"
        df = df.withColumn(name, F.expr(quantize_expr(c, s, bits)))
        tmp_cols.append(name)
    return df.withColumn(
        out_col, F.expr(morton_code_expr(tmp_cols, bits))
    ).drop(*tmp_cols)


def zorder_layout(
    df: DataFrame,
    specs: list[tuple[str, float]],
    num_partitions: int,
    bits: int = 16,
    out_col: str = "zcode",
) -> DataFrame:
    """The write layout: range-partition AND sort within partitions on
    the Morton code. ``repartitionByRange`` samples the code
    distribution (a distributed sort, no single-partition stage), so
    each output file covers one contiguous code range = one narrow
    hyper-rectangle in every clustered dimension. Write the result
    with any sink; parquet min/max footers then prune on every
    dimension."""
    coded = zorder_code(df, specs, bits, out_col)
    return coded.repartitionByRange(
        num_partitions, F.col(out_col)
    ).sortWithinPartitions(out_col)
