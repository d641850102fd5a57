"""Scalar / column-level function library (SURVEY.md §2.10 plus the
training-data-pipeline functions: hashing, text stats, dedup
signatures, vector similarity, multimodal plumbing)."""
