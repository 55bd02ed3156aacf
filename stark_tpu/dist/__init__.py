from stark_tpu.dist.mesh import SHARD_AXIS, make_mesh, sharded, replicated, shard_spec
from stark_tpu.dist.ntt import dist_ntt, dist_intt, dist_coset_evaluate
from stark_tpu.dist.merkle import dist_merkle_tree
from stark_tpu.dist.multihost import initialize as distributed_initialize, global_mesh, multihost_prove, process_info

__all__ = [
    "SHARD_AXIS", "make_mesh", "sharded", "replicated", "shard_spec",
    "dist_ntt", "dist_intt", "dist_coset_evaluate", "dist_merkle_tree",
    "distributed_initialize", "global_mesh", "multihost_prove", "process_info",
]
