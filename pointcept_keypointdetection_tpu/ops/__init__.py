from .codes import Code64, code_from_u64, code_to_u64, code_shr, code_lexsort, code_equal, CODE_MAX
from .serialization import (
    z_order_encode_np,
    z_order_decode_np,
    hilbert_encode_np,
    hilbert_decode_np,
    encode_np,
    z_order_encode,
    hilbert_encode,
    encode,
)
from .segment import segment_sum, segment_mean, segment_max, segment_min, segment_reduce
from .voxelize import unique_with_capacity, slotted_unique, SlottedUniqueResult
from .sparse import build_kernel_map, sparse_conv, SparseConvSpec
from .knn import knn, knn_bucketed, ball_query, three_nn_interpolate
from .sampling import farthest_point_sampling
from .cluster import connected_components
