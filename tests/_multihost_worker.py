"""Worker for the 2-process simulated multi-host smoke test.

Launched by tests/test_parallel.py::test_two_process_multihost_smoke with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID in the
environment — exactly the variables `initialize_distributed` documents for
non-TPU clusters — and 2 virtual CPU devices per process (4 global).
Exercises the real multi-host code path (VERDICT r4 task 6): jax.distributed
wiring, the DCN-outer global mesh, a cross-process psum, and the
frame-sharded STFT against its single-device reference.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P


def main() -> int:
    import numpy as np

    from sot_tpu.parallel.launch import global_mesh, initialize_distributed
    from sot_tpu.parallel.sharded_ops import stft_magnitude_frame_sharded

    assert initialize_distributed() is True, "env-based init did not trigger"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4 and jax.local_device_count() == 2

    mesh = global_mesh(freq=2)
    assert dict(mesh.shape) == {"data": 2, "freq": 2}
    # 'data' must be the cross-host (DCN) axis: each data row = one process
    procs_per_row = [len({d.process_index for d in row})
                     for row in np.asarray(mesh.devices)]
    assert procs_per_row == [1, 1], procs_per_row

    # cross-process psum over 'data'
    f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, "data"),
                              mesh=mesh, in_specs=P("data"),
                              out_specs=P()))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), np.ones((2, 8), np.float32))
    out = np.asarray(f(arr))
    assert (out == 2.0).all(), out

    # frame-sharded STFT on a replicated input == the local single-device STFT
    import jax.numpy as jnp

    from sot_tpu.ops.stft import stft_magnitude as stft_ref

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((2, 1024)).astype(np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), x_np)
    spec = stft_magnitude_frame_sharded(x, mesh, size=512, hop_length=128)
    ref = stft_ref(jnp.asarray(x_np), size=512, overlap=1 - 128 / 512)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(spec)), np.asarray(ref), atol=1e-5)

    print(f"MULTIHOST OK proc={jax.process_index()}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
