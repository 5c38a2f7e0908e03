"""Batch sources: schema-evolving CSV family, fixture generation."""
