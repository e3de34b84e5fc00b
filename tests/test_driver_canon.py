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
