"""Arrow ↔ Spark type mapping (SURVEY.md §1.2).

The reference supports the Arrow scalar types enumerated in
``_python_type_map`` (/root/reference/fletcher/base.py:48-74).  This
module records the canonical Spark equivalent for each, including the
widenings Spark forces (unsigned ints, float16) and the collapses it
performs (dictionary → value type; timestamps → µs precision).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# Arrow type id → constructor of the Spark equivalent.
_SIMPLE = {
    pa.null(): T.NullType(),
    pa.bool_(): T.BooleanType(),
    pa.int8(): T.ByteType(),
    pa.int16(): T.ShortType(),
    pa.int32(): T.IntegerType(),
    pa.int64(): T.LongType(),
    # Unsigned types widen so every value remains representable.
    pa.uint8(): T.ShortType(),
    pa.uint16(): T.IntegerType(),
    pa.uint32(): T.LongType(),
    pa.uint64(): T.DecimalType(20, 0),
    pa.float16(): T.FloatType(),  # widened
    pa.float32(): T.FloatType(),
    pa.float64(): T.DoubleType(),
    pa.date32(): T.DateType(),
    pa.date64(): T.DateType(),
    pa.binary(): T.BinaryType(),
    pa.large_binary(): T.BinaryType(),
    pa.string(): T.StringType(),
    pa.large_string(): T.StringType(),
}


def arrow_to_spark_type(at: pa.DataType) -> T.DataType:
    """Map an Arrow type to its Spark equivalent (recursive for lists)."""
    if at in _SIMPLE:
        return _SIMPLE[at]
    if pa.types.is_timestamp(at):
        return T.TimestampType()  # Spark is µs-precision, tz from session
    if pa.types.is_duration(at):
        return T.DayTimeIntervalType()
    if pa.types.is_decimal(at):
        return T.DecimalType(at.precision, at.scale)
    if pa.types.is_dictionary(at):
        # Dictionary encoding is an execution/storage concern in Spark
        # (Parquet dict pages); semantically it is the value type.
        return arrow_to_spark_type(at.value_type)
    if pa.types.is_list(at) or pa.types.is_large_list(at) or pa.types.is_fixed_size_list(at):
        return T.ArrayType(arrow_to_spark_type(at.value_type))
    if pa.types.is_map(at):
        return T.MapType(arrow_to_spark_type(at.key_type), arrow_to_spark_type(at.item_type))
    if pa.types.is_struct(at):
        return T.StructType(
            [T.StructField(f.name, arrow_to_spark_type(f.type), f.nullable) for f in at]
        )
    raise TypeError(f"no Spark mapping for Arrow type {at!r}")


def arrow_schema_to_spark(schema: pa.Schema) -> T.StructType:
    """Convert a full Arrow schema to a Spark ``StructType``."""
    return T.StructType(
        [T.StructField(f.name, arrow_to_spark_type(f.type), f.nullable) for f in schema]
    )


def spark_to_arrow_type(st: T.DataType) -> pa.DataType:
    """Inverse mapping (canonical choices) for interchange tests."""
    inv = {
        T.NullType(): pa.null(),
        T.BooleanType(): pa.bool_(),
        T.ByteType(): pa.int8(),
        T.ShortType(): pa.int16(),
        T.IntegerType(): pa.int32(),
        T.LongType(): pa.int64(),
        T.FloatType(): pa.float32(),
        T.DoubleType(): pa.float64(),
        T.DateType(): pa.date32(),
        T.BinaryType(): pa.binary(),
        T.StringType(): pa.string(),
    }
    if st in inv:
        return inv[st]
    if isinstance(st, T.TimestampType):
        return pa.timestamp("us", tz="UTC")
    if isinstance(st, T.DecimalType):
        return pa.decimal128(st.precision, st.scale)
    if isinstance(st, T.ArrayType):
        return pa.list_(spark_to_arrow_type(st.elementType))
    if isinstance(st, T.MapType):
        return pa.map_(spark_to_arrow_type(st.keyType), spark_to_arrow_type(st.valueType))
    if isinstance(st, T.StructType):
        return pa.struct(
            [pa.field(f.name, spark_to_arrow_type(f.dataType), f.nullable) for f in st.fields]
        )
    raise TypeError(f"no Arrow mapping for Spark type {st!r}")
