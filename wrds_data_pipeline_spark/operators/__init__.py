"""Engine operators: interval/as-of joins, resampling, windows,
correlation, dedup, similarity search — each a composition of
DataFrame built-ins (SURVEY.md §2 mapping), Pandas-UDF only where
built-ins genuinely cannot express the semantics."""
