"""Scale-out: single-host multi-chip (Mesh/shard_map) and multi-host
(jax.distributed node-range shards)."""

from .sharded import ShardedGraphDecoder, make_mesh
from .multihost import MultihostGraphDecoder, init_distributed

__all__ = ["ShardedGraphDecoder", "make_mesh", "MultihostGraphDecoder",
           "init_distributed"]
