"""Column-expression helpers and vectorized UDFs.

Everything SQL-expressible lives in :mod:`columns` as pure Column
functions (JVM-side, whole-stage-codegen friendly); only the
HTML-extraction core crosses into Python, via the Arrow-batched
struct-returning pandas UDF in :mod:`udfs`.
"""
