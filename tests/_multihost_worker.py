"""Worker process for the 2-process multi-host test (test_multihost_2proc).

Each worker owns 4 virtual CPU devices; jax.distributed joins them into one
8-device cluster.  The worker runs one REAL fused train step on a global
batch assembled from per-host shards (parallel/multihost.py), then
process 0 writes a checkpoint — the multi-process replacement for the
reference's single-node DDP spawn (utils/commons/trainer.py:497-507).

Invoked as: python tests/_multihost_worker.py <rank> <port> <work_dir>
(environment must NOT have pre-imported jax; this file sets backend flags).
"""

import os
import sys

rank, port, work_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # keep the axon TPU plugin off
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2,
                           process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 4 and len(jax.devices()) == 8

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from visinger_tpu.models.factory import (  # noqa: E402
    build_models,
    init_state,
    tiny_batch,
    tiny_config,
)
from visinger_tpu.parallel import make_mesh  # noqa: E402
from visinger_tpu.parallel.multihost import (  # noqa: E402
    global_batch_from_local,
    host_batch_slice,
    is_primary,
)
from visinger_tpu.training.checkpoint import save_checkpoint  # noqa: E402
from visinger_tpu.training.train_step import make_train_step  # noqa: E402

cfg = tiny_config()
mesh = make_mesh()  # global mesh over all 8 devices, both processes

# both hosts derive the same global batch deterministically, then each
# contributes only its contiguous slice — the interesting branch of
# host_batch_slice that single-process tests can never exercise
host_np = {k: np.asarray(v) for k, v in tiny_batch(cfg, batch_size=8).items()}
sl = host_batch_slice(8)
assert (sl.start, sl.stop) == (rank * 4, rank * 4 + 4), sl
local = {k: v[sl] for k, v in host_np.items()}
batch = global_batch_from_local(local, mesh)
assert next(iter(batch.values())).shape[0] == 8  # global batch axis

model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
state = init_state(cfg, model, disc, batch)
train_step = make_train_step(cfg, model, disc)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

repl = NamedSharding(mesh, P())
data = NamedSharding(mesh, P("data"))
step_fn = jax.jit(train_step, in_shardings=(repl, data),
                  out_shardings=(repl, repl))
state, metrics = step_fn(state, batch)
metrics = {k: float(jax.device_get(v)) for k, v in metrics.items()}
for k, v in metrics.items():
    assert np.isfinite(v), (k, v)

# process-0 checkpointing (save_checkpoint gates internally); barrier so
# rank 1 can assert the file really exists before exiting
path = save_checkpoint(work_dir, state, num_keep=2)
assert (path is not None) == is_primary()
multihost_utils.sync_global_devices("ckpt_written")
import glob  # noqa: E402

assert glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.msgpack")), \
    "checkpoint missing on disk"

print(f"MULTIHOST_OK rank={rank} total_g={metrics['total_g']:.6f}")
