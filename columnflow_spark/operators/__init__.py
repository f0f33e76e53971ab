from columnflow_spark.operators.base import (  # noqa: F401
    Calibrator,
    Categorizer,
    HistProducer,
    Producer,
    Reducer,
    Selector,
    calibrator,
    categorizer,
    hist_producer,
    producer,
    reducer,
    selector,
)
from columnflow_spark.operators.selection import SelectionResult  # noqa: F401
