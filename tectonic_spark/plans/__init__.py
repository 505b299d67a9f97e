from tectonic_spark.plans.explain import explain_str, physical_plan

__all__ = ["explain_str", "physical_plan"]
