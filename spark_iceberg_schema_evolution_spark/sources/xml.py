"""XML ingestion — Spark 4's built-in XML data source, engine-faced.

Two shapes production feeds actually arrive in:

* **Files of XML documents** (:func:`read_xml`): the native ``xml``
  format (spark-xml, merged into Spark 4) splits files and parses
  records JVM-side — distributed like any other scan; pass an explicit
  schema in production (inference is an extra pass, same caveat as the
  CSV source, `csv_evolving.py`).
* **XML payloads in a column** (:func:`parse_xml_col`): sensor/props
  strings inside an existing table — ``F.from_xml`` against an
  explicit schema, map-only, no UDF; malformed payloads become NULL
  structs under PERMISSIVE mode instead of failing the scan.

Reference parity: the reference ingests CSV only
(`src/jobs/job.py:40-51`); XML is §2.B source-format extension
surface, wired into the same evolving-append sink path as CSV/JSONL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: str | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Scan XML files, one row per ``row_tag`` element. Attributes
    surface as ``_attrname`` columns, nested elements as structs
    (explode arrays downstream). ``schema=None`` infers (extra pass —
    dev only); pass the DDL string in production."""
    reader = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def parse_xml_col(
    df: DataFrame,
    col: str | Column,
    schema: str,
    out_col: str = "xml",
) -> DataFrame:
    """Parse an XML-string column against an explicit struct schema —
    map-only ``from_xml``. PERMISSIVE semantics are coarser than
    ``from_json``'s: ANY malformed field nulls the WHOLE record's
    parsed fields (pinned in tests), so the reject leg is
    "every parsed field IS NULL" rather than a corrupt-record
    column."""
    c = F.col(col) if isinstance(col, str) else col
    return df.withColumn(out_col, F.from_xml(c, schema))
