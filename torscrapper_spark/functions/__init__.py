"""Pure kernels + vectorized pandas UDF wrappers."""
