from stark_tpu.ntt.ntt import (
    NTTPlan,
    get_plan,
    ntt,
    intt,
    lde,
    coset_evaluate,
    coset_interpolate,
)
from stark_tpu.ntt.reference_ntt import (
    ntt_host,
    ntt_available,
    root_of_unity,
    naive_dft,
)

__all__ = [
    "NTTPlan", "get_plan", "ntt", "intt", "lde",
    "coset_evaluate", "coset_interpolate",
    "ntt_host", "ntt_available", "root_of_unity", "naive_dft",
]
