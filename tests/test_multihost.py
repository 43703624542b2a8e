"""Multi-process data parallelism over jax.distributed (BASELINE config 5).

Spawns TWO real OS processes, each owning 4 virtual CPU devices, joined
through ``jax.distributed`` exactly like two TPU hosts over DCN: the
coordinator handshake, a global 8-device ('data',) mesh built by
``windtpu.parallel.distributed.global_data_mesh``, per-process local batch
shards assembled into one global array, and ONE jitted WGAN-GP train step
whose gradient psums cross the process boundary.

Pass criteria: both processes converge to the SAME post-step parameters
(grad sync actually happened), and those parameters match a single-process
8-device run of the identical step (multi-host == single-host semantics).

The reference has nothing distributed at all (SURVEY.md §2); this is the
driver-runnable substitute for multi-host hardware.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from windtpu.utils.hostcpu import free_tcp_port

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
from windtpu.parallel.distributed import global_data_mesh
from windtpu.train.state import create_train_state
from windtpu.train.wgan_gp import make_train_step

assert jax.process_count() == 2
assert jax.local_device_count() == 4
assert jax.device_count() == 8

cfg = GANConfig(
    model=ModelConfig(image_size=8, in_channels=3, noise_channels=2,
                      out_channels=2, sequence_length=1,
                      generator_features=8, discriminator_features=4),
    train=TrainConfig(batch_size=8, n_critic=1, compute_metrics=False),
)
m = cfg.model
mesh = global_data_mesh()
assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"data": 8}

# Replicated state: device_put of non-addressable global shardings is
# disallowed in multiprocess mode; assemble from identical local copies.
rep = NamedSharding(mesh, P())
state = jax.tree_util.tree_map(
    lambda a: jax.make_array_from_process_local_data(
        rep, np.asarray(a)), create_train_state(cfg))
step_fn = make_train_step(cfg)

rng = np.random.RandomState(0)   # same global batch on both processes
lr_g = rng.standard_normal((8, 1, 8, 8, 3)).astype(np.float32)
hr_g = rng.standard_normal((8, 1, 8, 8, 2)).astype(np.float32)
sh = NamedSharding(mesh, P("data"))
lr = jax.make_array_from_process_local_data(sh, lr_g[pid * 4:(pid + 1) * 4])
hr = jax.make_array_from_process_local_data(sh, hr_g[pid * 4:(pid + 1) * 4])


@jax.jit
def run(state, lr, hr):
    # PRNG key built inside the jitted program: key-dtype arrays can't be
    # assembled from process-local data.
    return step_fn(state, lr, hr, jax.random.key(0))


state, metrics = run(state, lr, hr)
gsum = float(sum(jnp.sum(jnp.abs(l)).item()
                 for l in jax.tree_util.tree_leaves(state.g_params)))
dsum = float(sum(jnp.sum(jnp.abs(l)).item()
                 for l in jax.tree_util.tree_leaves(state.d_params)))
print(f"RESULT pid={pid} g={gsum:.10e} d={dsum:.10e}", flush=True)
jax.distributed.shutdown()
"""


def test_two_process_dp_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = free_tcp_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        match = re.search(
            r"RESULT pid=(\d) g=([\d.e+-]+) d=([\d.e+-]+)", out)
        assert match, out[-3000:]
        results[int(match.group(1))] = (float(match.group(2)),
                                        float(match.group(3)))
    assert set(results) == {0, 1}
    # Grad sync: both processes hold identical post-step parameters.
    np.testing.assert_allclose(results[0], results[1], rtol=0)

    # Multi-host == single-host: repeat the step on THIS process' 8
    # devices and compare the same checksums.
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
    from windtpu.core.mesh import make_mesh
    from windtpu.train.state import create_train_state
    from windtpu.train.wgan_gp import make_train_step

    cfg = GANConfig(
        model=ModelConfig(image_size=8, in_channels=3, noise_channels=2,
                          out_channels=2, sequence_length=1,
                          generator_features=8, discriminator_features=4),
        train=TrainConfig(batch_size=8, n_critic=1, compute_metrics=False),
    )
    mesh = make_mesh({"data": 8})
    state = jax.device_put(create_train_state(cfg), NamedSharding(mesh, P()))
    step_fn = make_train_step(cfg)
    rng = np.random.RandomState(0)
    lr = jax.device_put(rng.standard_normal((8, 1, 8, 8, 3)).astype(
        np.float32), NamedSharding(mesh, P("data")))
    hr = jax.device_put(rng.standard_normal((8, 1, 8, 8, 2)).astype(
        np.float32), NamedSharding(mesh, P("data")))
    key = jax.device_put(jax.random.key(0), NamedSharding(mesh, P()))
    state, _ = step_fn(state, lr, hr, key)
    gsum = float(sum(jnp.sum(jnp.abs(l)).item()
                     for l in jax.tree_util.tree_leaves(state.g_params)))
    dsum = float(sum(jnp.sum(jnp.abs(l)).item()
                     for l in jax.tree_util.tree_leaves(state.d_params)))
    np.testing.assert_allclose(results[0], (gsum, dsum), rtol=1e-6)


# ---------------------------------------------------------------------------
# The PRODUCT entry point, multi-host: two real processes each invoke
# cli.train_main itself (not a hand-rolled step) with coordinator flags; the
# pass criterion is identical post-training parameters across processes and
# vs a single-process run of the same command (VERDICT r1 item 2).
# ---------------------------------------------------------------------------

CLI_WORKER = r"""
import sys
pid, port, ckdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from windtpu import cli

state = cli.train_main([
    "--inputs", "x", "--outputs", "y", "--synthetic",
    "--checkpoint-dir", ckdir, "--steps", "2", "--batch-size", "8",
    "--patch-size", "24", "--sequence-length", "2",
    "--g-lr", "2e-4", "--n-critic", "1",
    "--coordinator-address", f"localhost:{port}",
    "--num-processes", "2", "--process-id", str(pid),
])
assert jax.process_count() == 2
assert jax.device_count() == 8
gsum = float(sum(jnp.sum(jnp.abs(l)).item()
                 for l in jax.tree_util.tree_leaves(state.g_params)))
dsum = float(sum(jnp.sum(jnp.abs(l)).item()
                 for l in jax.tree_util.tree_leaves(state.d_params)))
print(f"RESULT pid={pid} g={gsum:.10e} d={dsum:.10e}", flush=True)
jax.distributed.shutdown()
"""


def test_train_cli_two_process_matches_single(tmp_path):
    worker = tmp_path / "cli_worker.py"
    worker.write_text(CLI_WORKER)
    port = free_tcp_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    ckdir = tmp_path / "ck_multi"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), str(port), str(ckdir)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO, env=env) for pid in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"train_main worker failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        match = re.search(
            r"RESULT pid=(\d) g=([\d.e+-]+) d=([\d.e+-]+)", out)
        assert match, out[-3000:]
        results[int(match.group(1))] = (float(match.group(2)),
                                        float(match.group(3)))
    assert set(results) == {0, 1}
    # Grad sync through the CLI: identical post-training parameters.
    np.testing.assert_allclose(results[0], results[1], rtol=0)
    # Only the lead process wrote checkpoints.
    assert any(d.startswith("step_") for d in os.listdir(ckdir))

    # Single-process run of the SAME command on this process' 8 devices.
    import jax
    import jax.numpy as jnp

    from windtpu import cli

    state = cli.train_main([
        "--inputs", "x", "--outputs", "y", "--synthetic",
        "--checkpoint-dir", str(tmp_path / "ck_single"), "--steps", "2",
        "--batch-size", "8", "--patch-size", "24",
        "--sequence-length", "2", "--g-lr", "2e-4", "--n-critic", "1",
    ])
    gsum = float(sum(jnp.sum(jnp.abs(l)).item()
                     for l in jax.tree_util.tree_leaves(state.g_params)))
    dsum = float(sum(jnp.sum(jnp.abs(l)).item()
                     for l in jax.tree_util.tree_leaves(state.d_params)))
    # rtol: the cross-process psum (Gloo all-reduce) and the
    # single-process XLA reduction use different summation orders;
    # over 2 Adam steps of the 24px model that rounding accumulates
    # to ~1e-4 relative on these |param|-sum checksums.  Equality
    # WITHIN the multi-process run is asserted exactly above.
    np.testing.assert_allclose(results[0], (gsum, dsum), rtol=5e-4)
