"""XML source gates: file scan (attributes, nesting, explode),
explicit-schema types, malformed-payload PERMISSIVE behavior, and the
evolving-append sink composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_iceberg_schema_evolution_spark.sources.xml import (
    parse_xml_col,
    read_xml,
)

DOC = """<orders>
  <order id="1" status="open">
    <total>10.50</total>
    <item><sku>A</sku><qty>2</qty></item>
    <item><sku>B</sku><qty>1</qty></item>
  </order>
  <order id="2" status="closed">
    <total>3.25</total>
    <item><sku>C</sku><qty>5</qty></item>
  </order>
</orders>
"""


def _write_fixture(tmp_path) -> str:
    p = tmp_path / "orders.xml"
    p.write_text(DOC)
    return str(p)


def test_read_xml_attributes_nesting_explode(spark, tmp_path):
    path = _write_fixture(tmp_path)
    df = read_xml(
        spark,
        path,
        "order",
        schema=(
            "_id BIGINT, _status STRING, total DOUBLE, "
            "item ARRAY<STRUCT<sku: STRING, qty: BIGINT>>"
        ),
    )
    rows = (
        df.select(
            F.col("_id").alias("oid"),
            "_status",
            "total",
            F.explode("item").alias("it"),
        )
        .select("oid", "_status", "total", "it.sku", "it.qty")
        .orderBy("oid", "sku")
        .collect()
    )
    assert [tuple(r) for r in rows] == [
        (1, "open", 10.5, "A", 2),
        (1, "open", 10.5, "B", 1),
        (2, "closed", 3.25, "C", 5),
    ]


def test_read_xml_inference_matches_explicit(spark, tmp_path):
    path = _write_fixture(tmp_path)
    inferred = read_xml(spark, path, "order")
    assert inferred.count() == 2
    assert {"_id", "_status", "total", "item"} <= set(inferred.columns)


def test_parse_xml_col_and_malformed(spark):
    df = spark.createDataFrame(
        [
            (1, "<r><a>5</a><b>x&amp;y</b></r>"),
            (2, "<r><a>not-an-int</a><b>ok</b></r>"),
            (3, "this is not xml at all <<<"),
        ],
        "id long, payload string",
    )
    out = parse_xml_col(df, "payload", "a INT, b STRING").select(
        "id", "xml.a", "xml.b"
    )
    got = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert got[1] == (5, "x&y")
    # PERMISSIVE from_xml nulls the whole record on any malformed
    # field (coarser than from_json's per-field recovery) — reject leg
    # is "every parsed field NULL"
    assert got[2] == (None, None)
    assert got[3] == (None, None)


def test_xml_feeds_evolving_append(spark, tmp_path):
    """The XML scan composes with the lakehouse sink exactly like the
    CSV/JSONL sources: scan -> select -> write_evolving -> read back."""
    from spark_iceberg_schema_evolution_spark.tables import (
        LakehouseCatalog,
    )

    path = _write_fixture(tmp_path)
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    df = read_xml(
        spark, path, "order",
        schema="_id BIGINT, _status STRING, total DOUBLE",
    ).select(
        F.col("_id").alias("order_id"),
        F.col("_status").alias("status"),
        "total",
    )
    cat.write_evolving(df, "db", "from_xml")
    back = cat.table("db", "from_xml").read()
    assert back.count() == 2
    assert back.where("status = 'open'").first()["total"] == 10.5
