"""Pure-Python deterministic kernels (no Spark imports).

Everything byte-sensitive lives here so the Arrow UDFs and the unit tests
share one implementation (SURVEY.md §4.2 "byte-identical parity").
"""
