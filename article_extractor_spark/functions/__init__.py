"""Scalar / table-level functions for large-scale training-data pipelines.

Everything here is expressed with built-in ``pyspark.sql.functions``
(JVM-side, whole-stage codegen) wherever semantics allow; Python touches
data only in the clearly-marked ``multimodal`` stubs (Arrow-batched
``mapInPandas``) — never row-at-a-time.
"""
