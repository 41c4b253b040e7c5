from .numeric import dec_sum, dec_avg, safe_long, safe_double
from .arrays import collect_sorted_list, flatten_distinct
from .hindex import h_index_from_counts

__all__ = [
    "dec_sum",
    "dec_avg",
    "safe_long",
    "safe_double",
    "collect_sorted_list",
    "flatten_distinct",
    "h_index_from_counts",
]
