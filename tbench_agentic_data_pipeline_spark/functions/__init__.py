"""Scalar function layer (SURVEY.md §2.8 F-family) and UDF surface (§2.9)."""
