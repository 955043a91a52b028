"""simplemapreduceframework_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first rebuild of the query and data-processing
capabilities of the reference MapReduce framework
(Ariel96cs/SimpleMapReduceFramework): the classic
split -> map -> combine -> shuffle-by-key -> reduce -> collect pipeline
(reference: tasktracker.py:122-296, jobtracker.py:384-390), generalized to
the full relational surface (DataFrame/Spark SQL) plus the
large-scale-training-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) and a Structured Streaming tier.

Design stance (SURVEY.md section 7): DataFrame/Spark SQL is the engine;
Catalyst does the optimizing. The only imperative surface is the
MapReduce compatibility layer (`compat.mapreduce`), which lowers
reference-style mapper/combiner/reducer jobs onto the RDD API.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
