from stark_tpu.hash.sha256_jax import (
    sha256_u64_leaves,
    sha256_pairs,
    jit_leaves,
    jit_pairs,
    digest_to_bytes,
)

__all__ = ["sha256_u64_leaves", "sha256_pairs", "jit_leaves", "jit_pairs", "digest_to_bytes"]
