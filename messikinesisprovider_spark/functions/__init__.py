"""Reusable column-expression helpers (JVM-side; no Python UDFs)."""
