"""Device-mesh sharding of the apply pipeline.

Three table layouts (SURVEY.md §5.8):

* **Replicated table** — one copy per chip; the probe is a local gather and
  the only collective is metric reduction.  Right up to ~100M entries
  (~1.3 GB of bucket rows at 0.5 load factor fits HBM comfortably).
* **Broadcast-sharded table** (``sharded_apply_step``) — keys are
  partitioned host-side by ``mix_kmer(key) % n_shards`` into per-shard
  bucketed open-addressing tables of identical bucket count B, stacked
  (n_shards, B, 24) uint32 and laid out along the ``table`` mesh axis.
  Each shard probes the (replicated-over-table) token batch against its
  local sub-table; because exactly one shard owns any key, a
  ``jax.lax.pmax`` over the table axis merges per-position role hits
  (miss = -1 loses the max).  The segmented unanimous vote then runs on
  the merged roles.  Table memory ÷ n_shards, probe compute replicated.
* **all_to_all-routed sharded table** (``routed_apply_step``) — the token
  stream is *also* split over the table axis (with a k−1 halo per chunk so
  every kmer window is produced exactly once, §5.7).  Each device packs its
  chunk's kmers, buckets them by owner shard ``hash % n_shards``, and a
  single ``jax.lax.all_to_all`` over the ``table`` axis delivers every key
  (+ its segment id) to the shard that owns it.  The owner probes its local
  sub-table and reduces *partial votes* per protein segment; because
  unanimity voting is order-free (min/max/sum), the global vote is just
  ``psum``/``pmin``/``pmax`` of the per-segment tallies over the ``table``
  axis — no reverse all_to_all of per-token hits is ever needed.  This
  divides both table memory AND probe compute by n_shards; the wire cost is
  one 12-byte (lo, hi, seg) record per kmer riding ICI.

Both steps are built with ``jax.shard_map`` over an explicit Mesh so the
driver can compile them on a virtual CPU mesh (tests) and on real chips
unchanged.  Multi-host initialization lives in ``parallel.distributed``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.hashing import mix_kmer
from ..ops.hashtable import EMPTY, build_table, probe_table, table_size_for
from ..ops.kmers import pack_kmer_windows

_INT32_MAX = 2**31 - 1


def make_mesh(n_data: int, n_table: int = 1,
              devices: list | None = None) -> Mesh:
    """A (data, table) mesh over the first n_data*n_table devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_table
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_table)
    return Mesh(grid, ("data", "table"))


# ---------------------------------------------------------------------------
# table sharding (host side)
# ---------------------------------------------------------------------------

def shard_signature_table(key_lo: np.ndarray, key_hi: np.ndarray,
                          values: np.ndarray, n_shards: int,
                          load_factor: float = 0.5):
    """Partition keys by hash and build one bucketed table per shard.

    returns (tables (n_shards, B, 24) uint32 np array, max_probes int)
    All shard tables share the bucket count of the largest shard so the
    stack is rectangular (required for a sharded device array).
    """
    h = mix_kmer(key_lo.astype(np.uint32), key_hi.astype(np.uint32), np)
    owner = (h % np.uint32(n_shards)).astype(np.int64)
    counts = np.bincount(owner, minlength=n_shards)
    n_buckets = table_size_for(int(counts.max()), load_factor)
    tables = np.zeros((n_shards,), object)
    max_probes = 1
    for s in range(n_shards):
        mask = owner == s
        tbl, probes = build_table(key_lo[mask], key_hi[mask],
                                  values[mask].astype(np.uint32),
                                  n_buckets=n_buckets)
        tables[s] = tbl
        max_probes = max(max_probes, probes)
    return np.stack(list(tables)), max_probes


# ---------------------------------------------------------------------------
# device steps
# ---------------------------------------------------------------------------

def _vote(roles, valid, seg_ids, min_hits, n_seqs):
    hit = valid & (roles >= 0)
    seg = jnp.where(hit, seg_ids, n_seqs)
    n_hits = jax.ops.segment_sum(
        hit.astype(jnp.int32), seg, num_segments=n_seqs + 1)[:-1]
    rmin = jax.ops.segment_min(
        jnp.where(hit, roles, _INT32_MAX), seg, num_segments=n_seqs + 1)[:-1]
    rmax = jax.ops.segment_max(
        jnp.where(hit, roles, -1), seg, num_segments=n_seqs + 1)[:-1]
    unanimous = (n_hits > 0) & (rmin == rmax)
    called = unanimous & (n_hits >= min_hits)
    return jnp.where(called, rmax, -1), jnp.where(called, n_hits, 0)


def replicated_apply_step(mesh: Mesh, *, k: int, max_probes: int,
                          n_seqs: int):
    """Jitted apply step: table replicated, token batch sharded on ``data``.

    Returned fn signature: (table (B, 24), codes (D, T), seg_ids (D, T),
    valid (D, T), min_hits) → (roles (D, n_seqs), hits (D, n_seqs)) where D
    is the data-axis size (one flat token stream per data shard).
    """
    def step(table, codes, seg_ids, valid, min_hits):
        lo, hi = pack_kmer_windows(codes, k)
        roles = probe_table(table, lo, hi, valid, max_probes)
        return _vote(roles, valid, seg_ids, min_hits, n_seqs)

    sharded = jax.shard_map(
        jax.vmap(step, in_axes=(None, 0, 0, 0, None)),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P()),
        out_specs=(P("data"), P("data")),
        check_vma=False)
    return jax.jit(sharded)


def sharded_apply_step(mesh: Mesh, *, k: int, max_probes: int, n_seqs: int):
    """Jitted apply step with the table sharded over the ``table`` axis.

    Returned fn signature: (tables (n_shards, B, 24), codes (D, T),
    seg_ids (D, T), valid (D, T), min_hits) → (roles (D, n_seqs),
    hits (D, n_seqs)).  Probe hits merge across shards with pmax; the vote
    runs on the merged roles (replicated over the table axis).
    """
    def step(tables, codes, seg_ids, valid, min_hits):
        # local shapes: tables (1, B, 24); codes/seg/valid (D/data, T)
        table = tables[0]
        def one(codes1, seg1, valid1):
            lo, hi = pack_kmer_windows(codes1, k)
            local = probe_table(table, lo, hi, valid1, max_probes)
            merged = jax.lax.pmax(local, "table")
            return _vote(merged, valid1, seg1, min_hits, n_seqs)
        return jax.vmap(one)(codes, seg_ids, valid)

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("table"), P("data"), P("data"), P("data"), P()),
        out_specs=(P("data"), P("data")),
        check_vma=False)
    return jax.jit(sharded)


# ---------------------------------------------------------------------------
# all_to_all-routed sharded probe (§5.8 large-table mode)
# ---------------------------------------------------------------------------

def split_tokens_for_table_axis(codes: np.ndarray, seg_ids: np.ndarray,
                                valid: np.ndarray, n_table: int, k: int,
                                n_seqs: int, pad_code: int):
    """Split one flat token stream into n_table chunks with k−1 halos.

    Chunk c covers core token positions [c·Tc, (c+1)·Tc) plus a k−1 halo so
    every kmer window starting in the core is packable locally; ``valid`` is
    True only at core starts, so each window is routed exactly once.

    returns (codes (n_table, Tc+k−1) uint8, seg_ids (…) int32,
             valid (…) bool) — stackable along a leading data axis.
    """
    t = len(codes)
    tc = -(-t // n_table)
    width = tc + k - 1
    total = n_table * tc + k - 1
    pc = np.full(total, pad_code, codes.dtype)
    ps = np.full(total, n_seqs, np.int32)
    pv = np.zeros(total, bool)
    pc[:t] = codes
    ps[:t] = seg_ids
    pv[:t] = valid
    out_c = np.empty((n_table, width), codes.dtype)
    out_s = np.empty((n_table, width), np.int32)
    out_v = np.zeros((n_table, width), bool)
    for c in range(n_table):
        lo = c * tc
        out_c[c] = pc[lo: lo + width]
        out_s[c] = ps[lo: lo + width]
        out_v[c, :tc] = pv[lo: lo + tc]   # halo starts stay invalid
    return out_c, out_s, out_v


def routed_apply_step(mesh: Mesh, *, k: int, max_probes: int, n_seqs: int,
                      capacity: int | None = None):
    """Jitted apply step routing kmers to their owner shard via all_to_all.

    Input layout (see ``split_tokens_for_table_axis``): the token stream of
    each data row is split over the ``table`` axis too, so every device owns
    a (row, chunk) tile.  fn signature:

        (tables (n_shards, B, 24), codes (D, n_shards, Tc), seg_ids (…),
         valid (…), min_hits)
      → (roles (D, n_seqs) int32, hits (D, n_seqs) int32,
         overflow () int32 — 1 if any routing bucket overflowed
         ``capacity`` (results then undercount; re-run with a larger
         capacity).  Default capacity Tc is provably overflow-free.)
    """
    n_table = mesh.shape["table"]

    def step(tables, codes, seg_ids, valid, min_hits):
        # local: tables (1, B, 24); codes/seg/valid (Dl, 1, Tc)
        table = tables[0]
        codes, seg_ids, valid = codes[:, 0], seg_ids[:, 0], valid[:, 0]
        tc = codes.shape[1]
        cap = tc if capacity is None else capacity
        shard_ids = jnp.arange(n_table, dtype=jnp.int32)

        def pack_one(codes1, seg1, valid1):
            lo, hi = pack_kmer_windows(codes1, k)
            h = mix_kmer(lo, hi, jnp)
            owner = jnp.where(valid1,
                              (h % jnp.uint32(n_table)).astype(jnp.int32),
                              n_table)
            # rank of each key within its owner bucket (stable, no sort)
            onehot = owner[:, None] == shard_ids[None, :]     # (Tc, n_t)
            csum = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
            rank = jnp.take_along_axis(
                csum, jnp.clip(owner, 0, n_table - 1)[:, None], 1)[:, 0] - 1
            ok = (owner < n_table) & (rank < cap)
            slot = jnp.where(ok, owner * cap + rank, n_table * cap)
            blo = jnp.full(n_table * cap, EMPTY, jnp.uint32
                           ).at[slot].set(lo, mode="drop")
            bhi = jnp.full(n_table * cap, EMPTY, jnp.uint32
                           ).at[slot].set(hi, mode="drop")
            bseg = jnp.full(n_table * cap, n_seqs, jnp.int32
                            ).at[slot].set(seg1, mode="drop")
            ovf = jnp.any((owner < n_table) & (rank >= cap))
            return (blo.reshape(n_table, cap), bhi.reshape(n_table, cap),
                    bseg.reshape(n_table, cap), ovf)

        blo, bhi, bseg, ovf = jax.vmap(pack_one)(codes, seg_ids, valid)
        # one exchange: row s of each device's buffer → shard s
        rlo = jax.lax.all_to_all(blo, "table", split_axis=1, concat_axis=1)
        rhi = jax.lax.all_to_all(bhi, "table", split_axis=1, concat_axis=1)
        rseg = jax.lax.all_to_all(bseg, "table", split_axis=1, concat_axis=1)

        rvalid = rlo != EMPTY   # no packed key has the top 2 bits set
        roles = probe_table(table, rlo, rhi, rvalid, max_probes)
        hit = rvalid & (roles >= 0)
        d_local = roles.shape[0]
        seg = jnp.where(hit, rseg, n_seqs).reshape(d_local, -1)
        rflat = roles.reshape(d_local, -1)
        hflat = hit.reshape(d_local, -1)

        def tally_one(h1, r1, s1):
            n_hits = jax.ops.segment_sum(
                h1.astype(jnp.int32), s1, num_segments=n_seqs + 1)[:-1]
            rmin = jax.ops.segment_min(
                jnp.where(h1, r1, _INT32_MAX), s1,
                num_segments=n_seqs + 1)[:-1]
            rmax = jax.ops.segment_max(
                jnp.where(h1, r1, -1), s1, num_segments=n_seqs + 1)[:-1]
            return n_hits, rmin, rmax

        n_hits, rmin, rmax = jax.vmap(tally_one)(hflat, rflat, seg)
        # the vote is order-free (Q9): merge partial tallies collectively
        n_hits = jax.lax.psum(n_hits, "table")
        rmin = jax.lax.pmin(rmin, "table")
        rmax = jax.lax.pmax(rmax, "table")
        unanimous = (n_hits > 0) & (rmin == rmax)
        called = unanimous & (n_hits >= min_hits)
        out_roles = jnp.where(called, rmax, -1)
        out_hits = jnp.where(called, n_hits, 0)
        overflow = jax.lax.pmax(
            jnp.any(ovf).astype(jnp.int32), ("data", "table"))
        return out_roles, out_hits, overflow

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P("table"), P("data", "table"), P("data", "table"),
                  P("data", "table"), P()),
        out_specs=(P("data"), P("data"), P()),
        check_vma=False)
    return jax.jit(sharded)
