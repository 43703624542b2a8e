"""windtpu — TPU-native wind-field downscaling framework.

A ground-up JAX/Flax/Pallas re-design of the capabilities of
``OpheliaMiralles/wind-downscaling-gan`` (reference: a TF2/Keras recurrent
WGAN-GP that statistically downscales ERA5 10-m winds from ~25 km to ~1 km
over complex terrain).

Everything here is built TPU-first:

* models are Flax modules whose time-distributed convolutions fold the time
  axis into the batch axis so the MXU sees large batched convs;
* the ConvLSTM recurrence is a ``jax.lax.scan`` with a fused gate conv;
* the WGAN-GP optimization step (3 critic updates + generator update +
  metrics) compiles to ONE jitted program, data-parallel over a
  ``jax.sharding.Mesh``;
* inference tiles the domain into patch cubes, generates stochastic ensemble
  members with split PRNG keys (one per core), and blends overlaps with an
  on-device scatter-add — no host pandas stitching.

Public API mirrors the reference (`downscale`, `predict`,
`build_high_res_template_from_era5`, `process_era5`, `process_topo`,
`get_network`) — see reference src/downscaling/api.py:31-160.
"""

__version__ = "0.1.0"

_API_EXPORTS = (
    "build_high_res_template_from_era5",
    "downscale",
    "get_network",
    "predict",
    "process_era5",
    "process_topo",
)


def __getattr__(name):
    # Lazy to keep `import windtpu.models` cheap and cycle-free.
    if name in _API_EXPORTS:
        import windtpu.api as _api

        return getattr(_api, name)
    raise AttributeError(f"module 'windtpu' has no attribute {name!r}")

