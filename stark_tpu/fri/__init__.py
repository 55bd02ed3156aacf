from stark_tpu.fri.commit import FRIProof, fri_commit, decommit_fri, decommit_fri_layers
from stark_tpu.fri.verify import verify_fri, FRIVerificationError
from stark_tpu.fri.coset import CosetFri

__all__ = [
    "FRIProof", "fri_commit", "decommit_fri", "decommit_fri_layers",
    "verify_fri", "FRIVerificationError", "CosetFri",
]
