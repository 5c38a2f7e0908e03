"""Smoke test for the runnable ingest job (reference job.py parity)."""

from __future__ import annotations

from spark_iceberg_schema_evolution_spark.jobs.ingest_csv import main


def test_ingest_csv_cli_end_to_end(spark, tmp_path, capsys):
    rc = main(
        [
            "--input",
            str(tmp_path / "raw"),
            "--warehouse",
            str(tmp_path / "wh"),
            "--table",
            "customers",
            "--generate-demo-input",
            "3",
            "--ingest-ts",
            "2024-06-01T12:00:00",
            "--persist-inputs",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "committed snapshot v1" in out
    assert "30 rows" in out
    # reference-exact normalization: "Customer Id" -> customer_id
    assert "customer_id" in out
