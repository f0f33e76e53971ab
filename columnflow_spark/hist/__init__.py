from columnflow_spark.hist.axes import Variable, bin_expr  # noqa: F401
from columnflow_spark.hist.fill import fill_hist, merge_hists  # noqa: F401
