"""Segmented unanimous-vote role calling (device).

Replicates the ``apply`` voting loop (ApplyKmerProcessor.java:122-147,
SURVEY.md §2c Q9) as an order-free reduction.  The Java loop walks kmers
sequentially and aborts at the first conflicting hit; the outcome only
depends on order-free facts:

* a peg is *bad* iff two hits disagree anywhere  ⇔  min(hit roles) != max
* the called role is the unanimous role
* the hit count (when unanimous) is the total number of hits

so the whole batch reduces with two masked min/max reductions and a sum —
no scan, no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INT32_MAX = 2**31 - 1  # plain int: no device work at import time


@jax.jit
def unanimous_vote(roles: jnp.ndarray, valid: jnp.ndarray,
                   min_hits: jnp.ndarray):
    """Vote per sequence.

    roles: (B, L) int32 — probed role index per kmer position, -1 = miss
    valid: (B, L) bool — kmer validity mask
    min_hits: int32 scalar — minimum hit count to call a role

    returns (called_role (B,) int32 (-1 = not called), hits (B,) int32)
    where hits is the unanimous hit count (0 when ambiguous/uncalled).
    """
    hit = valid & (roles >= 0)
    n_hits = jnp.sum(hit, axis=-1).astype(jnp.int32)
    rmin = jnp.min(jnp.where(hit, roles, _INT32_MAX), axis=-1)
    rmax = jnp.max(jnp.where(hit, roles, -1), axis=-1)
    unanimous = (n_hits > 0) & (rmin == rmax)
    called = unanimous & (n_hits >= min_hits)
    role = jnp.where(called, rmax, -1)
    count = jnp.where(unanimous, n_hits, 0)
    return role, count
