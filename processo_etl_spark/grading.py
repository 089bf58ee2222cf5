"""Grading-contract definitions shared by the local harness, the test
suite, and the registry.

The correctness driver canonicalizes each query's Spark and DuckDB
results with pandas (``sort_values`` over every column) and hashes the
values.  Two output-schema rules follow, enforced in three places
(tools/check_oracles.py, tests/test_scale.py's plan audit, and the
registry conventions) — this module is the ONE definition all of them
import, so widening a ban or adding a canary is a single edit:

- **No DecimalType outputs** (r2 lesson: the driver hashes Spark vs
  DuckDB decimals differently regardless of value).  The two
  ``canary_decimal_*`` probes are the deliberate exception — they exist
  to document that driver behavior and are never placed in a graded
  window slot.
- **No array/map/struct outputs** (r5 lesson: pandas ``sort_values``
  throws ``unhashable type: 'list'``, so any non-scalar column is an
  automatic driver ERR even when the values match).  Flatten with
  ``posexplode`` ⇔ ``unnest(generate_series)``.
"""

from __future__ import annotations

# The driver-normalization probes: the ONLY queries allowed DecimalType
# outputs, and permanently excluded from graded window slots.
DECIMAL_CANARIES = frozenset({"canary_decimal_12_2", "canary_decimal_20_6"})


def decimal_output_cols(schema) -> list[str]:
    """Names of output columns whose type contains a DecimalType
    (recursing into arrays/maps/structs)."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    def has_dec(dt) -> bool:
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, ArrayType):
            return has_dec(dt.elementType)
        if isinstance(dt, MapType):
            return has_dec(dt.keyType) or has_dec(dt.valueType)
        if isinstance(dt, StructType):
            return any(has_dec(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in schema.fields if has_dec(f.dataType)]


def nonscalar_output_cols(schema) -> list[str]:
    """Names of output columns with an unhashable (non-scalar) type —
    ArrayType/MapType/StructType at the top level."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
