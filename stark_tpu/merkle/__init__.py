from stark_tpu.merkle.tree import MerkleTree, merkle_root_host

__all__ = ["MerkleTree", "merkle_root_host"]
