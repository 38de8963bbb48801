from arrow_spark.functions.registry import (  # noqa: F401
    ARROW_FUNCTIONS,
    FunctionSpec,
    call,
    coverage,
    list_functions,
)
