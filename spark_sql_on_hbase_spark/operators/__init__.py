"""LLM-data-pipeline operators: deduplication, similarity search, text
analysis, multimodal columns — the beyond-reference surface SURVEY.md §7
step 10 calls for, each designed for 100 TB (no driver materialization,
shuffle-bounded, broadcast-aware)."""
