"""PyArrow ↔ Spark schema bridge.

Reproduces the reference's type-mapping surface (its PyArrow→Trino DDL
map, ``_tenant_factory.py:35-57``) against Spark's type system — used
for Arrow-based fixtures and for validating extracted schemas. Same
coverage and the same documented fallbacks:

- TIME has no Spark type → STRING (reference falls back the same way
  for Trino at ``:55-56``, SURVEY.md §1.2);
- unrecognized/nested types → STRING (reference fallback ``:57``;
  nested data is *supported* natively by Spark — pass
  ``strict_reference_parity=False`` to map list/struct/map through).

The inverse map serves schema declaration for Arrow-produced fixtures.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T


def arrow_field_to_spark(field: pa.Field, strict_reference_parity: bool = True) -> T.StructField:
    return T.StructField(
        field.name,
        arrow_type_to_spark(field.type, strict_reference_parity),
        nullable=field.nullable,
    )


def arrow_type_to_spark(t: pa.DataType, strict_reference_parity: bool = True) -> T.DataType:
    if pa.types.is_boolean(t):
        return T.BooleanType()
    if pa.types.is_int8(t) or pa.types.is_int16(t):
        return T.ShortType()  # reference: int8/16 -> SMALLINT
    if pa.types.is_int32(t):
        return T.IntegerType()
    if pa.types.is_int64(t):
        return T.LongType()
    if pa.types.is_float32(t):
        return T.FloatType()
    if pa.types.is_float64(t):
        return T.DoubleType()
    if pa.types.is_decimal(t):
        return T.DecimalType(t.precision, t.scale)
    if pa.types.is_date(t):
        return T.DateType()
    if pa.types.is_timestamp(t):
        # Trino TIMESTAMP is wall-clock; NTZ matches (SURVEY.md §7.4)
        return T.TimestampNTZType() if t.tz is None else T.TimestampType()
    if pa.types.is_time(t):
        return T.StringType()  # no Spark TIME type (documented fallback)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return T.BinaryType()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return T.StringType()
    if not strict_reference_parity:
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return T.ArrayType(arrow_type_to_spark(t.value_type, False))
        if pa.types.is_struct(t):
            return T.StructType([arrow_field_to_spark(t.field(i), False) for i in range(t.num_fields)])
        if pa.types.is_map(t):
            return T.MapType(
                arrow_type_to_spark(t.key_type, False), arrow_type_to_spark(t.item_type, False)
            )
    return T.StringType()  # reference fallback: everything else -> VARCHAR


def arrow_schema_to_spark(schema: pa.Schema, strict_reference_parity: bool = True) -> T.StructType:
    return T.StructType(
        [arrow_field_to_spark(f, strict_reference_parity) for f in schema]
    )


_SPARK_TO_ARROW = {
    T.BooleanType: pa.bool_,
    T.ShortType: pa.int16,
    T.IntegerType: pa.int32,
    T.LongType: pa.int64,
    T.FloatType: pa.float32,
    T.DoubleType: pa.float64,
    T.DateType: pa.date32,
    T.BinaryType: pa.binary,
    T.StringType: pa.string,
}


def spark_type_to_arrow(t: T.DataType) -> pa.DataType:
    if isinstance(t, T.DecimalType):
        return pa.decimal128(t.precision, t.scale)
    if isinstance(t, T.TimestampNTZType):
        return pa.timestamp("us")
    if isinstance(t, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(t, T.ArrayType):
        return pa.list_(spark_type_to_arrow(t.elementType))
    if isinstance(t, T.StructType):
        return pa.struct([pa.field(f.name, spark_type_to_arrow(f.dataType)) for f in t.fields])
    if isinstance(t, T.MapType):
        return pa.map_(spark_type_to_arrow(t.keyType), spark_type_to_arrow(t.valueType))
    maker = _SPARK_TO_ARROW.get(type(t))
    if maker is None:
        raise ValueError(f"no Arrow mapping for Spark type {t}")
    return maker()
