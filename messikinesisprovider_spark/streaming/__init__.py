"""Structured-Streaming layer: consume/window/dedup helpers and the retrying sink."""
