"""End-to-end pipeline plans re-expressing the reference's four
pipelines (SURVEY.md §3) as single declarative Spark plans."""
