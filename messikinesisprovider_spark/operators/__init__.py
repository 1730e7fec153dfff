"""Operator packages: relational surface + LLM-data-pipeline extensions."""
