"""Multi-host input dispatch (SURVEY.md §5.8: "DCN only for multi-host
input dispatch").

Each host entropy-decodes its own shard of the input files and places
its slice of the global batch; `jax.make_array_from_process_local_data`
assembles the global array without cross-host pixel traffic — only the
model's collectives ride the interconnect. Single-process meshes pass
through unchanged, so the same code runs in tests and on pods.
"""
from __future__ import annotations

from typing import Sequence


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bootstrap.

    Initialises when a coordinator/num_processes is given, or when the
    standard coordination env (JAX_COORDINATOR_ADDRESS /
    COORDINATOR_ADDRESS) is present (auto-detection); no-op otherwise
    (single-process runs, tests)."""
    import os

    import jax

    if num_processes is not None and num_processes <= 1:
        return
    env_coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                 or os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator is None and num_processes is None and env_coord is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def local_shard(items: Sequence, process_index: int | None = None,
                process_count: int | None = None) -> list:
    """This host's slice of `items` — always ceil(n/pc) long (short
    tails wrap around to the front), so every host contributes equally
    sized local batches and `global_batch` sees one consistent global
    shape on every process."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(items)
    if n == 0:
        return []
    per = -(-n // pc)
    out = [items[(pi * per + k) % n] for k in range(per)]
    return out


def global_batch(local_arr, mesh, axis: str = "dp"):
    """Assemble a globally-sharded batch from per-host local data.

    local_arr: this host's (local_batch, ...) array. Returns a global
    jax.Array sharded over `axis` of `mesh`."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.device_put(local_arr, sharding)
    global_shape = (local_arr.shape[0] * jax.process_count(),) + tuple(
        local_arr.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local_arr,
                                                  global_shape)
