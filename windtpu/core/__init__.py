from windtpu.core.config import (  # noqa: F401
    DataConfig,
    GANConfig,
    InferenceConfig,
    ModelConfig,
    TrainConfig,
)
from windtpu.core.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
