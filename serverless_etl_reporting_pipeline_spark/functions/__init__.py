from serverless_etl_reporting_pipeline_spark.functions.money import cents, money_avg, money_sum, pct_of, round2

__all__ = ["cents", "money_sum", "money_avg", "pct_of", "round2"]
