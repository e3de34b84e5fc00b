"""Driver-canonicalization hazard gate.

The driver's correctness gate canonicalizes both result sets with pandas
(`sort_values` over every column, which `factorize`s the values).  A
column whose Python representation is unhashable — ArrayType, MapType,
StructType — blows that up with `TypeError: unhashable type: 'list'`
even when the values agree (round-5 driver red on `misc_scalar_funcs`).

This gate builds every oracle-checked op's plan (lazy — no execution
beyond the few ops that materialize bounded codebooks) and asserts its
output schema contains only canonicalizer-safe top-level types.  Ops
without an oracle get a weaker rows-only driver check that never
canonicalizes, so complex types there are fine.
"""

from __future__ import annotations

from pyspark.sql import types as T

from my_polars_ai_spark.operators import all_ops

_UNHASHABLE = (T.ArrayType, T.MapType, T.StructType)


def test_no_oracle_checked_op_emits_unhashable_columns(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, op_ in all_ops().items():
        if op_.oracle is None:
            continue
        df = op_.fn(spark, sf_dir)
        bad = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _UNHASHABLE)
        ]
        if bad:
            offenders[name] = bad
        spark.catalog.clearCache()
    assert not offenders, (
        "oracle-checked ops emit list/map/struct columns the driver's "
        f"pandas canonicalizer cannot hash — array_join them: {offenders}"
    )


def test_no_oracle_emits_hugeint_or_decimal_columns(sf_dir):
    """Oracle-side dtype gate (round-6 verdict item 1c).

    The driver materializes the DuckDB oracle via pandas, where a
    HUGEINT (the type of sum(BIGINT)) becomes float64 and DECIMAL
    becomes object, while the Spark twin emits int64/double — so the
    dtype-sensitive value-hash mismatches even when every number agrees
    (round-5 tpch_q20, round-6 tpch_q18). fetchall()-based local checks
    cannot see this (HUGEINT arrives as plain int), but DESCRIBE reports
    the declared output type before any flattening. Every oracle must
    CAST such columns in its outermost SELECT."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    hazards = ("HUGEINT", "UHUGEINT", "DECIMAL")
    offenders: dict[str, list[str]] = {}
    for name, op_ in all_ops().items():
        if op_.oracle is None:
            continue
        desc = con.execute(f"DESCRIBE {op_.oracle}").fetchall()
        bad = [f"{col}:{typ}" for col, typ, *_ in desc
               if any(h in typ.upper() for h in hazards)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emit HUGEINT/DECIMAL output columns that pandas "
        f"materializes differently from Spark — CAST them: {offenders}"
    )
