"""Column-level function library (JVM-side expressions + vectorized
pandas helpers). Everything here is either a pyspark.sql.functions
composition or an Arrow-batched pandas UDF — never per-row Python."""
