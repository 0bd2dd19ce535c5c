"""Column expressions (native, JVM-side) and pandas/Arrow UDF kernels."""
