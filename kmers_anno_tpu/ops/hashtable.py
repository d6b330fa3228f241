"""Flat open-addressing hash table on device (build + probe).

This replaces the reference's ``HashMap<String, String>`` kmer database
(ApplyKmerProcessor.java:101-110) with the structure the BASELINE north star
prescribes: a flat, power-of-two, linear-probing array of packed rows

    table[slot] = [key_lo, key_hi, value, unused]   (uint32 × 4)

so one probe step is one 16-byte row gather from HBM — the memory-bandwidth
speed-of-light shape for this workload.  An empty slot has key_lo ==
0xFFFFFFFF, which no packed kmer can produce (every 5-bit field of a real
key is ≤ 27 < 31).

* ``build_table`` inserts N unique keys entirely on device using
  scatter-claim rounds: each pending key tries its current slot; a
  scatter-min over key indices picks one winner per free slot; losers and
  keys whose slot is occupied advance to the next slot.  The number of
  rounds equals the longest probe chain, which is returned and used as the
  probe loop bound.
* ``probe_table`` looks up a batch of keys with a bounded
  ``lax.while_loop`` of row gathers; misses return -1.

Both are pure jnp/XLA (they run identically on CPU for tests); a Pallas
double-buffered variant of the probe can be slotted in behind the same
signature.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .hashing import mix_kmer

EMPTY = np.uint32(0xFFFFFFFF)


def table_size_for(n_keys: int, load_factor: float = 0.5) -> int:
    """Power-of-two slot count targeting the given load factor."""
    want = max(16, int(n_keys / load_factor))
    return 1 << (want - 1).bit_length()


@partial(jax.jit, static_argnames=("n_slots",), donate_argnums=())
def _build(key_lo, key_hi, values, n_slots):
    n = key_lo.shape[0]
    mask = jnp.uint32(n_slots - 1)
    table = jnp.zeros((n_slots, 4), jnp.uint32).at[:, 0].set(EMPTY)
    idx = (mix_kmer(key_lo, key_hi, jnp) & mask).astype(jnp.int32)
    pending = jnp.ones((n,), jnp.bool_)
    key_order = jnp.arange(n, dtype=jnp.int32)
    rows = jnp.stack(
        [key_lo, key_hi, values.astype(jnp.uint32),
         jnp.zeros((n,), jnp.uint32)], axis=-1)

    def cond(state):
        _, _, pending, _ = state
        return jnp.any(pending)

    def body(state):
        table, idx, pending, rounds = state
        occupied = table[idx, 0] != EMPTY
        cand = pending & ~occupied
        claim_slot = jnp.where(cand, idx, n_slots)
        claim = jnp.full((n_slots,), n, jnp.int32).at[claim_slot].min(
            key_order, mode="drop")
        won = cand & (claim[idx % n_slots] == key_order) & (claim_slot < n_slots)
        slot = jnp.where(won, idx, n_slots)
        table = table.at[slot].set(rows, mode="drop")
        pending = pending & ~won
        idx = jnp.where(
            pending, ((idx.astype(jnp.uint32) + 1) & mask).astype(jnp.int32),
            idx)
        return table, idx, pending, rounds + 1

    table, _, _, rounds = jax.lax.while_loop(
        cond, body, (table, idx, pending, jnp.int32(0)))
    return table, rounds


def build_table(key_lo, key_hi, values, n_slots: int | None = None,
                load_factor: float = 0.5):
    """Build an open-addressing table from unique keys.

    key_lo/key_hi: (N,) uint32 packed kmer keys (must be deduplicated)
    values:        (N,) int32 payloads (role indices; must be >= 0)
    returns (table (n_slots, 4) uint32, max_probes int)
    """
    n = int(key_lo.shape[0])
    if n_slots is None:
        n_slots = table_size_for(n, load_factor)
    if n >= n_slots:
        raise ValueError(f"{n} keys do not fit {n_slots} slots")
    table, rounds = _build(jnp.asarray(key_lo), jnp.asarray(key_hi),
                           jnp.asarray(values), n_slots)
    return table, int(rounds)


@partial(jax.jit, static_argnames=("max_probes",))
def probe_table(table, key_lo, key_hi, valid, max_probes: int):
    """Look up a batch of keys.

    table:   (n_slots, 4) uint32
    key_lo/key_hi: (...,) uint32 query keys
    valid:   (...,) bool — invalid queries return -1 without probing
    returns  (...,) int32 — stored value, or -1 on miss/invalid
    """
    n_slots = table.shape[0]
    mask = jnp.uint32(n_slots - 1)
    shape = key_lo.shape
    lo = key_lo.reshape(-1)
    hi = key_hi.reshape(-1)
    idx = (mix_kmer(lo, hi, jnp) & mask).astype(jnp.int32)
    out = jnp.full(lo.shape, -1, jnp.int32)
    active = valid.reshape(-1)

    def cond(state):
        _, _, active, step = state
        return jnp.any(active) & (step < max_probes)

    def body(state):
        out, idx, active, step = state
        row = table[idx]
        hit = active & (row[:, 0] == lo) & (row[:, 1] == hi)
        empty = row[:, 0] == EMPTY
        out = jnp.where(hit, row[:, 2].astype(jnp.int32), out)
        active = active & ~hit & ~empty
        idx = jnp.where(
            active, ((idx.astype(jnp.uint32) + 1) & mask).astype(jnp.int32),
            idx)
        return out, idx, active, step + 1

    out, _, _, _ = jax.lax.while_loop(
        cond, body, (out, idx, active, jnp.int32(0)))
    return out.reshape(shape)
