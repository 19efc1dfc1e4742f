"""Training-data pipeline functions (dedup, similarity search, text
analysis, multimodal plumbing) — the operations a 100 TB image+caption
corpus needs beyond the reference's raster operators.

Everything here is expressed with built-in pyspark.sql functions
(JVM-side, whole-stage codegen) wherever possible; Python appears only
in Arrow-batched UDFs for genuinely non-relational math.
"""
