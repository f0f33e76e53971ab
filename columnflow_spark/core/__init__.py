from columnflow_spark.core.routes import (  # noqa: F401
    EMPTY_FLOAT,
    EMPTY_INT,
    Route,
    brace_expand,
    get_routes,
)
from columnflow_spark.core.registry import (  # noqa: F401
    ArrayFunction,
    array_function,
)
