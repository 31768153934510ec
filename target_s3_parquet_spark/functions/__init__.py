"""Scalar / UDF function families (string, date, math, array, map, JSON,
text analysis). Built-in ``pyspark.sql.functions`` everywhere possible —
JVM-side, whole-stage-codegen'd; Pandas UDFs only where semantics demand
Python, never row-at-a-time UDFs in a hot path."""
