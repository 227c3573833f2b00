"""Streaming surface (SURVEY.md §2.H): incremental micro-batch parity with
the reference, plus Structured Streaming windowed aggregation."""
