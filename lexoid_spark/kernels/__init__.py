"""Pure-Python extraction kernels.

Each kernel is a plain function ``bytes|str -> str|list`` with no Spark
dependency, so it unit-tests byte-identically without a session and is
wrapped once by a pandas UDF in ``lexoid_spark.functions.udfs``.
"""
