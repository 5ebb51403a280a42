"""Multi-host runtime glue (SURVEY.md §5: failure-detection / init-barrier
obligations; the reference is single-process).

``initialize`` wraps ``jax.distributed.initialize`` with an explicit
all-device psum barrier so a mis-wired host fails loudly at startup rather
than deadlocking in the first collective of a long run.  ``checksum``
verifies cross-host replica agreement (determinism check for replicated
params — the "race detection" analog for SPMD: replicas silently diverging
is the failure mode).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["initialize", "barrier", "checksum", "assert_replicas_agree"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the multi-host runtime and run a startup barrier.

    No-args form relies on TPU pod metadata (the normal pod-slice path);
    explicit args support manual rigs.  Single-process callers may skip
    this entirely.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    barrier()


def barrier() -> None:
    """All-device psum acting as a startup/liveness barrier."""
    n = jax.device_count()
    out = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        jnp.ones((jax.local_device_count(),)))
    got = int(np.asarray(out)[0])
    if got != n:
        raise RuntimeError(
            f"barrier psum saw {got} devices, expected {n}: "
            "a host is missing or mis-wired")


def checksum(tree) -> float:
    """Order-independent scalar digest of a pytree of arrays."""
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        a = np.asarray(leaf, dtype=np.float64)
        total += float(np.nansum(a)) + 1e-9 * float(np.nansum(np.abs(a)))
    return total


def assert_replicas_agree(tree, atol: float = 0.0) -> None:
    """Verify every host computes the same digest for replicated state.

    Call sparingly (e.g. every k-th checkpoint) — it synchronizes hosts.
    """
    local = jnp.asarray(checksum(tree))
    n = jax.process_count()
    if n == 1:
        return
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(local)
    ref = np.asarray(gathered)[0]
    if not np.allclose(np.asarray(gathered), ref, atol=atol):
        raise RuntimeError(
            f"replicated state diverged across hosts: digests {gathered}")
