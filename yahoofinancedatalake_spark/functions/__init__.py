"""Scalar function layer (SURVEY.md §2.8) and the sentiment UDF (§2.9 X1)."""
