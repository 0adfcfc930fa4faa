"""Multi-host (pod-slice) initialization helpers.

The BER harness scales across hosts the same way it scales across chips:
the codeword batch shards over one global mesh axis, H stays replicated,
and the per-step counter reduction is the only cross-host communication —
eleven scalars riding ICI within a slice and DCN across slices, once per
batch (SURVEY.md §5's distributed-backend note).

Usage on each host of a pod slice::

    from ldpc_toolbox_tpu.parallel.multihost import initialize, global_mesh
    initialize()                     # jax.distributed auto-bootstrap
    mesh = global_mesh()             # 1-D "batch" mesh over ALL devices
    BerTestBuilder(..., mesh=mesh, batch_size=global_batch).build().run()

Every host runs the identical program; `jax.random` keys are derived from
the (seed, point, step) triple, so the Monte-Carlo stream is a pure
function of the parameters regardless of topology.
"""

from __future__ import annotations

import jax

from .mesh import default_mesh

__all__ = ["initialize", "global_mesh"]


def initialize(**kwargs) -> None:
    """Initialize jax.distributed (no-op on a single process).

    On Cloud TPU pods the coordinator address and process ids are
    auto-detected; kwargs pass through to ``jax.distributed.initialize``.
    Explicit kwargs (coordinator_address, num_processes, process_id) run
    multi-process over plain TCP, e.g. CPU hosts in tests.
    """
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and state.client is not None:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        if kwargs:
            raise  # an explicit multi-process setup failing is an error
        # single-process environment (tests, one host): nothing to do


def global_mesh():
    """A 1-D ``batch`` mesh over every device of every process."""
    return default_mesh(jax.devices())
