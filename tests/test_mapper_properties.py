"""Property-based tests: the schema-mapping pipeline is total over the
space of valid source schemas (errors only on defined cases), its output
always renders valid DDL, and its Spark cast types always parse."""

from hypothesis import given, settings, strategies as st

from db_migrator_spark.common.mssql_types import MssqlType
from db_migrator_spark.common.schema import ColumnSchema
from db_migrator_spark.migrate.schema_mapper import (
    SchemaMappingError,
    map_schema,
    spark_cast_type,
)
from db_migrator_spark.migrate.type_registry import TypeRegistry

mssql_types = st.sampled_from(list(MssqlType))
lengths = st.one_of(st.none(), st.just(-1), st.integers(min_value=1, max_value=100_000))
precisions = st.one_of(st.none(), st.integers(min_value=1, max_value=38))
scales = st.one_of(st.none(), st.integers(min_value=-5, max_value=400))
names = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F),
    min_size=1,
    max_size=24,
)

columns = st.builds(
    ColumnSchema,
    column_name=names,
    data_type=mssql_types,
    character_maximum_length=lengths,
    numeric_precision=precisions,
    numeric_scale=scales,
    is_nullable=st.booleans(),
)


@given(col=columns, fmt=st.booleans())
@settings(max_examples=300, deadline=None)
def test_map_schema_total_and_renderable(col, fmt):
    registry = TypeRegistry.with_defaults()
    try:
        out = map_schema(registry, "T", [col], fmt)
    except SchemaMappingError as e:
        # only the two defined error families may occur
        assert "MAX length" in str(e) or "exceeds MySQL" in str(e)
        return
    (tc,) = out
    ddl = tc.data_type.to_sql()
    assert ddl and ddl[0].isalpha()
    # length-carrying types never exceed their cap in rendered DDL
    cap = tc.data_type.base_type.max_length()
    if cap is not None and tc.data_type.length is not None:
        assert tc.data_type.length <= cap
    # scale always fits u8 after mapping (reference's safe conversion)
    if tc.data_type.scale is not None:
        assert 0 <= tc.data_type.scale <= 255
    # name formatting is idempotent
    from db_migrator_spark.common.naming import format_snake_case

    if fmt:
        assert format_snake_case(tc.column_name) == tc.column_name


@given(col=columns)
@settings(max_examples=200, deadline=None)
def test_spark_cast_type_always_parses(spark, col):
    from pyspark.sql.types import _parse_datatype_string

    registry = TypeRegistry.with_defaults()
    try:
        (tc,) = map_schema(registry, "T", [col], False)
    except SchemaMappingError:
        return
    # must be a valid Spark SQL type string
    _parse_datatype_string(spark_cast_type(tc.data_type))
