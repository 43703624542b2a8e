"""Bitwise reproducibility: identical seeds/keys -> identical training and
inference results (the reference's stateful TF RNG cannot promise this)."""

import jax
import numpy as np

from windtpu.core.config import GANConfig, ModelConfig, TrainConfig
from windtpu.train.state import create_train_state
from windtpu.train.wgan_gp import make_train_step

CFG = GANConfig(
    model=ModelConfig(image_size=12, in_channels=3, noise_channels=2,
                      out_channels=2, sequence_length=2,
                      generator_features=8, discriminator_features=4),
    train=TrainConfig(batch_size=2, n_critic=1, compute_metrics=False),
)


def test_train_step_bitwise_deterministic():
    rng = np.random.RandomState(0)
    m = CFG.model
    lr = rng.standard_normal((2, 2, 12, 12, 3)).astype(np.float32)
    hr = rng.standard_normal((2, 2, 12, 12, 2)).astype(np.float32)
    step = make_train_step(CFG)

    def run():
        state = create_train_state(CFG)
        for _ in range(2):
            state, metrics = step(state, lr, hr, jax.random.key(7))
        return state, metrics

    s1, m1 = run()
    s2, m2 = run()
    for k in m1:
        np.testing.assert_array_equal(np.asarray(m1[k]), np.asarray(m2[k]))
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_inference_deterministic_per_key():
    from windtpu.core.config import InferenceConfig
    from windtpu.infer.engine import downscale_field
    from windtpu.models.generator import init_generator

    m = CFG.model
    g_vars = init_generator(m, jax.random.key(0))
    field = np.random.RandomState(1).standard_normal(
        (2, 14, 14, 3)).astype(np.float32)
    icfg = InferenceConfig(sequence_length=2, image_size=12,
                           noise_channels=2, group_size=2,
                           overlap_factor=0.1)
    p1, _ = downscale_field(g_vars, jax.numpy.asarray(field), m, icfg,
                            key=jax.random.key(3))
    p2, _ = downscale_field(g_vars, jax.numpy.asarray(field), m, icfg,
                            key=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


def test_keystream_fork_is_process_stable():
    """fork(name) must not depend on Python's randomized str hash: the
    same seed + name must give the same key in every interpreter
    (PYTHONHASHSEED), or named streams desynchronize across hosts."""
    import subprocess
    import sys

    code = ("import jax, numpy as np; jax.config.update('jax_platforms','cpu'); "
            "from windtpu.core.prng import KeyStream; "
            "k = KeyStream(0).fork('noise').next(); "
            "print(np.asarray(jax.random.key_data(k)).tolist())")
    outs = set()
    for seed in ("0", "12345"):
        env = {**__import__('os').environ, "PYTHONHASHSEED": seed,
               "JAX_PLATFORMS": "cpu"}
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, check=True)
        outs.add(r.stdout.strip().splitlines()[-1])
    assert len(outs) == 1, f"fork() key differs across hash seeds: {outs}"
