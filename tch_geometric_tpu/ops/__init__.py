from .segment import (
    csc_edge_cumsum,
    csc_sort_edges,
    csr_row_ids,
    segment_max,
    segment_mean,
    segment_softmax,
    segment_sum,
)
from .spmm import sddmm, spmm
