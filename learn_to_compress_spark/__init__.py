"""learn_to_compress_spark — a PySpark-native per-column lightweight-compression
engine with the capabilities of yhliu918/Learn-to-Compress (LeCo, SIGMOD'24),
re-expressed Spark-first: DataFrame jobs + vectorized Arrow/pandas kernels.
"""

__version__ = "0.1.0"
