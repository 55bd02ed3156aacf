from stark_tpu.stark.trace import fibonacci_square_trace, trace_polynomial
from stark_tpu.stark.composition import CompositionContext, get_context
from stark_tpu.stark.prover import StarkProof, prove
from stark_tpu.stark.verifier import StarkVerificationError, verify

__all__ = [
    "fibonacci_square_trace", "trace_polynomial",
    "CompositionContext", "get_context",
    "StarkProof", "prove", "verify", "StarkVerificationError",
]
