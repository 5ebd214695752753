from .suite import SUITE, spark_queries, oracle_queries

__all__ = ["SUITE", "spark_queries", "oracle_queries"]
