from columnflow_spark.plans.stage import StageChain, prune_columns  # noqa: F401
from columnflow_spark.plans.shifts import Shift, apply_shift_aliases  # noqa: F401
