"""Large-scale data-pipeline operators (beyond the reference's surface).

These are the operations a 100 TB training-data pipeline needs, built
Spark-first: JVM-side expressions where possible, Arrow-batched pandas UDFs
where vectorized Python is genuinely required, and never row-at-a-time Python.
"""
