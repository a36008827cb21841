"""Worker for the full-driver 2-process distributed training test.

Runs the REAL ``scripts/train.py`` entry with ``--distributed`` — dataset
build, per-process loader shards, global-batch assembly, the sharded jitted
step, metric logging, and rank-0-only checkpoint/artifact writes — on two
OS processes over a Gloo coordinator (4 virtual CPU devices each).
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out_root = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# initialize BEFORE importing the driver: module-level jnp constants in the
# package would otherwise touch the XLA backend first
from bridgeqa_tpu.parallel import initialize_distributed  # noqa: E402

initialize_distributed(os.environ["JAX_COORDINATOR_ADDRESS"], num_processes=nproc, process_id=pid)

# establish the Gloo collective context while the ranks are still in
# lockstep (the first collective otherwise lands after each rank's
# independent ~60 s XLA compile, tripping the 30 s context-init timeout)
from jax.experimental import multihost_utils  # noqa: E402

multihost_utils.sync_global_devices("mh_driver_start")

from scripts import train as train_script  # noqa: E402

solver = train_script.main([
    "--synthetic", "--tiny", "--distributed", "--epochs", "1",
    "--tag", "mh_driver", "--output_root", out_root,
    "--batch_size", "4", "--max_iters_per_epoch", "2", "--val_step", "0",
    "--verbose", "1", "--k_test", "4",
])
print(json.dumps({"pid": pid, "process_count": jax.process_count(),
                  "best": float(solver.best_criterion)}), flush=True)
# align exits: rank 0 writes checkpoints after training, so unsynchronized
# process teardown trips the coordination-service shutdown barrier
multihost_utils.sync_global_devices("mh_driver_done")
