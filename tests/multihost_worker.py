"""Worker for the multi-host test: one of N processes, 4 local CPU
devices each. Validates the pod-slice recipe end-to-end: distributed
init -> global mesh -> host-sharded input loading -> cross-process
collective math (the DCN path on real pods)."""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
repo = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, repo)

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pix2pose_tpu.parallel import (host_local_to_global, init_distributed,
                                   make_mesh, process_slice)

pi, pc = init_distributed(f"127.0.0.1:{port}", nproc, pid)
assert (pi, pc) == (pid, nproc), (pi, pc)
assert len(jax.devices()) == 4 * nproc  # global view
assert len(jax.local_devices()) == 4

# dp-only mesh over the global device set (the GAN data-parallel shape)
mesh = make_mesh((1, 4 * nproc))

# each process materializes ONLY its slice of the logical batch
B = 16
full = np.arange(B * 3, dtype=np.float32).reshape(B, 3)
local = full[process_slice(B)]
assert local.shape[0] == B // nproc
g = host_local_to_global(mesh, local, spec=P("dp"))
assert g.shape == (B, 3)

# cross-process reduction: every device needs every other host's shard
out = jax.jit(lambda x: jnp.sum(x * 2.0),
              out_shardings=NamedSharding(mesh, P()))(g)
expect = float(full.sum() * 2.0)
got = float(out)
assert abs(got - expect) < 1e-3, (got, expect)

# per-shard compute + global mean (gradient-all-reduce shape)
out2 = jax.jit(lambda x: jnp.mean(jnp.square(x), axis=0),
               out_shardings=NamedSharding(mesh, P()))(g)
np.testing.assert_allclose(np.asarray(out2),
                           np.mean(np.square(full), axis=0), rtol=1e-5)

print(f"MULTIHOST_OK {pid}/{nproc} sum={got}", flush=True)
