"""Multi-host initialization (SURVEY §5 distributed-backend slot).

The reference has no networking at all. Here multi-host runs use
``jax.distributed.initialize`` — after it, ``jax.devices()`` spans every
host's chips, ``make_engine_mesh()`` builds a global mesh, and the engine's
``all_to_all``/``psum`` collectives compile over ICI within a slice and DCN
across hosts, with no operator code changes (operators only see the mesh).

CI-testable without a pod via multi-process CPU JAX: each process forces the
CPU platform and joins the same coordinator (tests/test_multihost.py spawns
worker subprocesses running :func:`worker_demo`, which drives the engine's
actual shuffle primitive — hash repartition with all_to_all — across the
process boundary and psum-checks the result).

Note: host materialization of a cross-process result (``ShardedBatch.
to_batch``) currently assumes all shards are addressable — single-host
multi-chip. Cross-process gathers go through replicated scalars/psum here;
full multi-process result collection uses ``multihost_utils`` (future work).
"""

from __future__ import annotations

import jax


def init_multihost(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """Join a multi-process JAX cluster. Call once, before any jax use."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def worker_demo(coordinator: str, num_processes: int, process_id: int) -> str:
    """Drive the engine's shuffle across a real process boundary.

    Each process contributes one CPU device to a global mesh; rows are hash-
    repartitioned with the engine's ``repartition_by_key`` (one all_to_all),
    and two invariants are psum-verified: no rows lost, and every key's rows
    co-located on one shard. Returns "OK <total>" (checked by the test).
    """
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from harkdb_tpu.config import EngineConfig
    from harkdb_tpu.parallel.mesh import make_engine_mesh
    from harkdb_tpu.parallel.shuffle import hash_to_bucket, repartition_by_key

    init_multihost(coordinator, num_processes, process_id)
    cfg = EngineConfig()
    mesh = make_engine_mesh(config=cfg)
    D = mesh.devices.size
    axis = cfg.mesh_axis

    C = 256                                       # rows per shard
    rng = np.random.default_rng(0)                # same data everywhere
    keys_global = rng.integers(0, 40, D * C).astype(np.int32)
    vals_global = rng.integers(0, 1000, D * C).astype(np.int32)
    sharding = NamedSharding(mesh, P(axis))
    keys = jax.device_put(keys_global, sharding)
    vals = jax.device_put(vals_global, sharding)

    @jax.jit
    def run(k, v):
        def body(kl, vl):
            cols, n_out, overflow = repartition_by_key(
                {"k": kl, "v": vl}, "k", jnp.int32(C), axis, D, C * D
            )
            # invariant 1: total rows preserved
            total = jax.lax.psum(n_out, axis)
            # invariant 2: my rows' keys all hash to me
            i = jax.lax.axis_index(axis).astype(jnp.int32)
            live = jnp.arange(cols["k"].shape[0], dtype=jnp.int32) < n_out
            owned = hash_to_bucket(cols["k"], D) == i
            misrouted = jax.lax.psum(
                jnp.sum(live & jnp.logical_not(owned)).astype(jnp.int32), axis
            )
            ok = jnp.logical_and(total == D * C, misrouted == 0)
            return (ok.astype(jnp.int32).reshape(1),
                    total.reshape(1), overflow.reshape(1))

        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
        )(k, v)

    ok, total, overflow = run(keys, vals)
    # each process reads its own (addressable) shard of the replicated-ish
    # per-shard flags
    ok_local = int(np.asarray(ok.addressable_shards[0].data)[0])
    total_local = int(np.asarray(total.addressable_shards[0].data)[0])
    of_local = int(np.asarray(overflow.addressable_shards[0].data)[0])
    assert ok_local == 1 and of_local == 0, (ok_local, of_local)
    return f"OK {total_local}"
