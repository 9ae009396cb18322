"""Structured Streaming variants of the batch operators (SURVEY
§2.10 — beyond the reference's strictly-batch surface)."""
