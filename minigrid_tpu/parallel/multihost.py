"""Multi-host scale-out: pod-slice meshes and distributed initialization.

The reference has no distribution story whatsoever (SURVEY.md §2.6).  Here
multi-host runs are the same SPMD program as single-chip runs: every host
executes the identical jitted training step over a global
``jax.sharding.Mesh``; XLA compiles the env batch's ``dp`` axis onto ICI
within a slice and DCN across slices, and the only cross-host traffic is
the learner's gradient psum (the env loop itself is collective-free —
levels regenerate on-device from per-env PRNG streams).

Typical pod usage (same script on every host):

    from minigrid_tpu.parallel.multihost import initialize, pod_mesh
    initialize()                       # env-var/TPU-metadata autodetect
    mesh = pod_mesh(tp=1)              # dp = all global devices
    trainer = PPO(env, params, cfg, mesh=mesh)
    runner = trainer.init(key)         # same key on every host!
    runner, metrics = trainer.update(runner)

Without a pod this degrades gracefully: ``initialize`` no-ops when JAX is
already single-process, and ``pod_mesh`` builds the mesh over local devices
(the CPU ``--xla_force_host_platform_device_count`` farm in tests).
"""

from __future__ import annotations

import warnings

import numpy as np

import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-process run.

    Returns True if distributed mode was (or already is) active.  On TPU
    pods with no explicit arguments, JAX autodetects topology from the TPU
    metadata server; on CPU/GPU clusters pass the coordinator explicitly.
    No-ops (returns False) when the run is single-process and no
    coordinator is given.
    """
    # Probe the distributed runtime WITHOUT touching the XLA backend:
    # jax.process_count() / jax.default_backend() would initialize the
    # backend, after which jax.distributed.initialize() refuses to run.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()  # TPU-pod/SLURM/etc. autodetect
        except ValueError:
            # No coordinator given and no cluster environment detected: a
            # plain single-process run.  The only benign failure.
            return False
        except RuntimeError as e:
            msg = str(e).lower()
            if (("already" in msg or "only be called once" in msg)
                    and "before" not in msg):
                # double-initialize race past the is_initialized() guard;
                # JAX 0.9 phrases it "should only be called once."
                return jax.process_count() > 1
            if "before any jax calls" in msg:
                # The XLA backend was touched before initialize(); topology
                # autodetect is no longer possible.  Warn loudly (instead of
                # silently degrading a pod to N identical single-process
                # replicas with the same PRNG key) and continue
                # single-process — call initialize() first on real pods.
                warnings.warn(
                    "multihost.initialize(): called after the XLA backend "
                    f"was initialized; running single-process. ({e})",
                    RuntimeWarning,
                    stacklevel=2,
                )
                return False
            # Anything else (transient pod coordinator failure, ...) must
            # fail loudly.
            raise
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def pod_mesh(tp: int = 1, axis_names: tuple[str, str] = ("dp", "tp"),
             devices=None) -> Mesh:
    """(dp, tp) mesh over all *global* devices of the run.

    ``dp`` shards the env batch / gradients; ``tp`` shards parameter
    feature dims (see :func:`minigrid_tpu.rl.ppo.tp_param_sharding`).
    ``tp`` should divide the per-slice device count so tensor collectives
    stay on ICI; the default tp=1 is pure data parallelism.
    """
    if devices is None:
        devices = jax.devices()  # global across processes
    n = len(devices)
    assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
    return Mesh(np.asarray(devices).reshape(n // tp, tp), axis_names)


def process_local_slice(num_global: int) -> tuple[int, int]:
    """(start, size) of this host's shard of a globally sharded batch axis.

    With batch sharded over ``dp`` and dp spanning processes in device
    order, each host owns a contiguous range — useful for host-side data
    feeding (demo corpora, eval episode assignment)."""
    per = num_global // jax.process_count()
    return jax.process_index() * per, per
