from arrow_spark.plans.declaration import Declaration, compile_plan  # noqa: F401
