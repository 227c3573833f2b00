"""Operator library — each module maps a section of SURVEY.md §2 onto
idiomatic Spark DataFrame primitives."""
