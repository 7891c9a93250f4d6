"""Operator library: windows, top-k, dedup, similarity, text analysis.

Each module implements one SURVEY.md §2 operator family as composable
DataFrame transforms. Everything stays JVM-side (built-in functions,
whole-stage codegen) unless the semantics genuinely require Python —
then it's an Arrow-batched Pandas UDF.
"""
