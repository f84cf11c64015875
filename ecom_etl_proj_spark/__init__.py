"""PySpark-native e-commerce analytics engine.

Re-expresses the query & data-processing surface of the reference
e-commerce ETL platform (batch warehouse layers, dashboard analytics,
streaming metrics) as declarative Spark DataFrame plans, plus the
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.
"""

__version__ = "0.1.0"
