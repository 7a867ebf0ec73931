from .coarse import RedundantCoarse, redundant_projector
from .dist import (
    make_mesh, replicate_projector, shard_extension, shard_extension_sparse,
    shard_qp, shard_qp_sparse,
)
from .overlap import (
    LeafOverlapPlan, OverlappedLeafOperator, feti_dual_apply_hier,
    leaf_apply_overlapped, make_mesh2, shard_qp2,
)
