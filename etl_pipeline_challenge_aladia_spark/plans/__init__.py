from etl_pipeline_challenge_aladia_spark.plans.queries import CATALOG, QuerySpec

__all__ = ["CATALOG", "QuerySpec"]
