"""Coset domain generator — API-parity port of the reference's CosetFri
(reference: src/fri/coset_fri.rs:9-50, disabled code).

``generate_coset_domain`` there computes {offset * omega^i} by one scalar
``pow`` per point, O(n log n) (coset_fri.rs:32-36); here it is one fused
device op (log-depth doubling).  ``next_coset_domain``: the reference
squares every element *keeping the full length* (with a comment admitting
most FRIs halve; coset_fri.rs:40-50, and it calls a nonexistent
``FieldElement::square``).  Since that code never compiled, the halving
semantics FRI actually needs (fri_commit.rs:18-24: first half, squared)
is what we implement; ``next_coset_domain_full`` preserves the reference's
written (non-halving) behavior for completeness.
"""

from __future__ import annotations

import jax

from stark_tpu.fields.fp import Fp


class CosetFri:
    def __init__(self, p: int, offset: int, omega: int, domain_size: int):
        self.fp = Fp.get(p)
        self.offset = int(offset) % p
        self.omega = int(omega) % p
        self.domain_size = int(domain_size)

    def generate_coset_domain(self) -> jax.Array:
        return self.fp.jit_coset_domain(self.offset, self.omega, self.domain_size)

    def next_coset_domain(self, domain) -> jax.Array:
        """Standard FRI fold domain: first half, squared
        (fri_commit.rs:18-24)."""
        half = domain[: domain.shape[0] // 2]
        return self.fp.jit_mul(half, half)

    def next_coset_domain_full(self, domain) -> jax.Array:
        """The reference's as-written variant: square every element, keep
        length (coset_fri.rs:40-50)."""
        return self.fp.jit_mul(domain, domain)
