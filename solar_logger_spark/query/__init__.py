from solar_logger_spark.query.builder import QueryBuilder

__all__ = ["QueryBuilder"]
