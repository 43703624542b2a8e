"""Sweep InferenceConfig.group_size on the real device.

The reference predicts in groups of 16 patches (api.py:132 BATCH_SIZE*2)
— a CPU-memory choice.  On TPU the group size sets the generator's
effective batch (group x seq frames per forward) and the scan length of
the stitch loop; this sweep measures the bench's inference headline
(downscaled km^2/s at 1 km, flagship 24 h x 546 x 756 domain) across
group sizes to pick the TPU default with evidence.

Run one size per process for a quiet chip:
    for g in 8 16 32 64; do python tools/sweep_infer_group.py $g; done
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax

from windtpu.utils.compilecache import enable_persistent_cache
enable_persistent_cache()

from windtpu.api import flagship_config
from windtpu.core.config import InferenceConfig
from windtpu.infer.engine import make_tiled_predictor
from windtpu.infer.tiling import plan_tiling
from windtpu.models.generator import init_generator

group = int(sys.argv[1]) if len(sys.argv) > 1 else 16

mcfg = flagship_config().model
icfg = InferenceConfig(overlap_factor=0.05, group_size=group)
t, h, w = 24, 546, 756
plan = plan_tiling(h, w, t, icfg.image_size, icfg.sequence_length,
                   icfg.overlap_factor)
predictor = make_tiled_predictor(mcfg, icfg, plan)
g_vars = init_generator(mcfg, jax.random.key(0))
field = jax.device_put(np.random.RandomState(0).standard_normal(
    (t, h, w, 3)).astype(np.float32))

pred, _ = predictor(g_vars, field, jax.random.key(1))   # compile + run
float(jax.device_get(pred[0, h // 2, w // 2, 0]))        # real sync
best = None
for i in range(4):
    t0 = time.perf_counter()
    pred, _ = predictor(g_vars, field, jax.random.key(2 + i))
    float(jax.device_get(pred[0, h // 2, w // 2, 0]))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(f"group={group}: {best*1000:.1f} ms "
      f"({h * w / best / 1e6:.2f} Mkm^2/s, "
      f"{plan.num_patches} patches in {-(-plan.num_patches // group)} "
      f"groups)", flush=True)
