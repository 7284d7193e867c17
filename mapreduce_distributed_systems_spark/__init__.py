"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference MapReduce engine
(simonsimme/Mapreduce_Distributed_systems, surveyed in SURVEY.md).

Spark-first design: every operator is declared through the DataFrame /
Spark SQL API so Catalyst + Tungsten pick the physical strategy;
Pandas-UDF / mapInPandas only where built-ins can't express the
semantics (see operators/multimodal.py, streaming/).
"""

__version__ = "0.1.0"

from mapreduce_distributed_systems_spark.session import get_spark  # noqa: F401
