"""Multi-chip scaling: mesh construction + sharded annotation steps.

The reference is single-process/single-host (SURVEY.md §2d); this package is
the TPU-native replacement: a 2-axis ``jax.sharding.Mesh`` ``(data, table)``
with XLA collectives.

* data axis — genome/protein batches shard across chips (DP).
* table axis — the signature table either replicates (lookups are pure
  local gathers) or shards by ``hash % n_shards`` with probes merged by a
  ``pmax`` over the table axis (only the owner shard can hit).
"""

from .mesh import (make_mesh, replicated_apply_step, shard_signature_table,
                   sharded_apply_step)

__all__ = ["make_mesh", "replicated_apply_step", "shard_signature_table",
           "sharded_apply_step"]
