"""Column-expression libraries (pure ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen friendly; no Python UDFs on the hot
path)."""
