"""loong_spark — a brand-new PySpark-native URL-frontier + fetch-scheduler
engine with the query/data-processing capabilities of niumang/loong,
re-expressed Spark-first (DataFrame/SQL + vectorized pandas/Arrow UDFs).

See SURVEY.md for the operator inventory and build plan.
"""

__version__ = "0.1.0"
