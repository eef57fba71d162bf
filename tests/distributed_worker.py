"""Worker for the real 2-process jax.distributed tests.

Launched by tests/test_sharding.py as two subprocesses that form one JAX
distributed run over a local coordinator (the JAX-idiomatic way to test a
multi-host pod without a pod: each process brings 4 virtual CPU devices,
the global mesh has 8).  Exercises:

* ``multihost.initialize`` with an explicit coordinator (the CPU-cluster
  path of SURVEY.md §2.6's communication-backend row),
* non-fully-addressable global arrays over a 2-process mesh,
* shard-local checkpoint save/load (``checkpoint.save_process_shards`` /
  ``load_process_shards``) including the cross-host barrier.

Prints DIST-OK <proc_id> on success; any assertion kills the process and
fails the parent test.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    path = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minigrid_tpu.parallel.multihost import (
        initialize,
        pod_mesh,
        process_local_slice,
    )
    from minigrid_tpu.utils.checkpoint import load, save

    assert initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=proc_id,
    )
    assert jax.process_count() == 2
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    mesh = pod_mesh(tp=1)
    assert mesh.shape == {"dp": 8, "tp": 1}
    start, size = process_local_slice(16)
    assert (start, size) == (proc_id * 8, 8)

    # A dp-sharded global array: each process only addresses its half.
    full = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    sharding = NamedSharding(mesh, P("dp"))
    arr = jax.make_array_from_callback(
        full.shape, sharding, lambda idx: full[idx]
    )
    assert not arr.is_fully_addressable
    tree = {"w": arr, "step": np.int32(7)}

    save(path, tree)  # multi-process: writes path.proc{0,1} + barrier
    assert os.path.exists(f"{path}.proc{proc_id}")
    assert not os.path.exists(path)

    template = {
        "w": jax.make_array_from_callback(
            full.shape, sharding, lambda idx: np.zeros_like(full[idx])
        ),
        "step": np.int32(0),
    }
    restored = load(path, template)
    assert restored["w"].sharding == sharding
    for s in restored["w"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), full[s.index])
    assert int(restored["step"]) == 7

    # A replicated global array round-trips too (replica_id dedup path).
    rep = jax.make_array_from_callback(
        (5,), NamedSharding(mesh, P()), lambda idx: full.ravel()[:5][idx]
    )
    save(path + ".rep", {"r": rep})
    back = load(path + ".rep", {"r": rep})
    for s in back["r"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), full.ravel()[:5])

    print(f"DIST-OK {proc_id}", flush=True)


if __name__ == "__main__":
    main()
