from columnflow_spark.hist.axes import Variable, bin_expr  # noqa: F401
from columnflow_spark.hist.fill import (  # noqa: F401
    ensure_bins,
    fill_hist,
    fold_flow_bins,
    insert_axis_values,
    merge_hists,
    rebin_axis,
    select_category_bins,
)
