from windtpu.models.generator import Generator  # noqa: F401
from windtpu.models.discriminator import Discriminator  # noqa: F401
from windtpu.models.autoencoder import AutoEncoder, Encoder  # noqa: F401
