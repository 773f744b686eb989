from .pushdown import (
    count_rows,
    filter_eq_string_table,
    filter_gt_string_table,
    filter_gt_table,
    filter_prefix_string_table,
    filter_mod_band_table,
    select_bitmap_table,
    lookup_eq_table,
    sum_column,
    sum_column_kernel,
)

__all__ = [
    "sum_column",
    "sum_column_kernel",
    "filter_eq_string_table",
    "filter_gt_string_table",
    "filter_gt_table",
    "filter_prefix_string_table",
    "filter_mod_band_table",
    "select_bitmap_table",
    "lookup_eq_table",
    "count_rows",
]
