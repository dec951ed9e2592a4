"""Spark-layer operators: vectorized extraction UDFs, relational
chunk/classify/search decomposition, corpus analytics."""
