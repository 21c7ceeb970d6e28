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
from .spmm_blocked import (
    BlockedCsr,
    SegmentedBlockedCsr,
    build_blocked,
    build_blocked_segmented,
    edge_attr_to_blocked,
    spmm_blocked,
)
from .spmm_pallas import (
    spmm_blocked_auto,
    spmm_blocked_pallas,
    spmm_blocked_segmented,
)
from .attention_blocked import (
    attend_blocked,
    attend_blocked_fused,
    edge_softmax_blocked,
    edge_softmax_blocked_multihead,
    gat_attend_blocked,
    gat_attend_blocked_packed,
    gat_edge_logits_blocked,
    sddmm_blocked_pallas,
    spmm_blocked_multiweighted_pallas,
    spmm_blocked_weighted_pallas,
)
