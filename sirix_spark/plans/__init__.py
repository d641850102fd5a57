from sirix_spark.plans.explain import explain_str, plan_expectations

__all__ = ["explain_str", "plan_expectations"]
