"""32-bit hash mixing of the two kmer key words (device + host-identical).

TPUs are 32-bit machines; the table hash is a murmur3-style finalizer over
the (lo, hi) uint32 pair.  The same arithmetic runs under NumPy (host) and
jax.numpy (device) so slot assignments agree everywhere — required for the
sharded-table ``hash % num_shards`` routing (SURVEY.md §2d, §5.8).
"""

from __future__ import annotations

GOLDEN = 0x9E3779B9
_M1 = 0x85EBCA6B
_M2 = 0xC2B2AE35


def fmix32(x, xp):
    """Murmur3 finalizer; ``xp`` is the array namespace (numpy or
    jax.numpy).  Operates on uint32 with wrap-around arithmetic."""
    u32 = xp.uint32
    x = x ^ (x >> u32(16))
    x = x * u32(_M1)
    x = x ^ (x >> u32(13))
    x = x * u32(_M2)
    x = x ^ (x >> u32(16))
    return x


def mix_kmer(lo, hi, xp):
    """Hash of a packed kmer key pair → uint32."""
    u32 = xp.uint32
    return fmix32(lo ^ fmix32(hi ^ u32(GOLDEN), xp), xp)
