"""Property-based tests (hypothesis) for the schema-evolution operator
family — the algebraic laws the ingest pipeline relies on."""

from __future__ import annotations

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings
from pyspark.sql import types as T

from spark_iceberg_schema_evolution_spark.operators import evolve
from spark_iceberg_schema_evolution_spark.types_map import (
    datatype_to_str,
    str_to_datatype,
)

_SCALARS = [
    T.StringType(),
    T.IntegerType(),
    T.LongType(),
    T.DoubleType(),
    T.BooleanType(),
    T.DateType(),
    T.TimestampType(),
    T.DecimalType(12, 2),
]

names = st.text(
    alphabet=st.sampled_from("abcdefghij_"), min_size=1, max_size=8
)


@st.composite
def datatypes(draw, depth=2):
    if depth == 0:
        return draw(st.sampled_from(_SCALARS))
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return draw(st.sampled_from(_SCALARS))
    if kind == 1:
        return T.ArrayType(draw(datatypes(depth=depth - 1)))
    if kind == 2:
        return T.MapType(
            draw(st.sampled_from(_SCALARS)), draw(datatypes(depth=depth - 1))
        )
    fields = draw(
        st.lists(
            st.tuples(names, datatypes(depth=depth - 1)),
            min_size=1,
            max_size=3,
            unique_by=lambda t: t[0],
        )
    )
    return T.StructType([T.StructField(n, d) for n, d in fields])


@st.composite
def schemas(draw):
    fields = draw(
        st.lists(
            st.tuples(names, datatypes()),
            min_size=1,
            max_size=6,
            unique_by=lambda t: t[0],
        )
    )
    return T.StructType([T.StructField(n, d) for n, d in fields])


@given(dt=datatypes())
@settings(max_examples=200, deadline=None)
def test_type_string_round_trip(dt):
    assert str_to_datatype(datatype_to_str(dt)) == dt


@given(a=schemas(), b=schemas())
@settings(max_examples=100, deadline=None)
def test_compare_schemas_laws(a, b):
    d = evolve.compare_schemas(a, b)
    rev = evolve.compare_schemas(b, a)
    # antisymmetry of the missing sets
    assert d.missing_in_left == rev.missing_in_right
    assert d.missing_in_right == rev.missing_in_left
    # conflicts are symmetric (same keys, swapped pairs)
    assert set(d.type_conflicts) == set(rev.type_conflicts)
    # self-diff is empty
    assert evolve.compare_schemas(a, a).identical


@given(target=schemas())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_align_schema_projects_exactly(spark, target):
    """Aligning an empty single-column DF onto any target yields exactly
    the target's columns + the extra, with the target's types."""
    df = spark.createDataFrame(
        [], T.StructType([T.StructField("zzz_extra", T.StringType())])
    )
    out = evolve.align_schema(df, target, keep_extras=True)
    want = [f.name for f in target.fields]
    if "zzz_extra" not in want:
        want += ["zzz_extra"]
    assert out.columns == want
    for f in target.fields:
        assert out.schema[f.name].dataType == f.dataType
    # idempotence: aligning again changes nothing
    again = evolve.align_schema(out, target, keep_extras=True)
    assert again.schema == out.schema
