from windtpu.train.losses import (  # noqa: F401
    discriminator_loss,
    generator_adversarial_loss,
    gradient_penalty,
    reconstruction_loss,
)
from windtpu.train.optim import discriminator_optimizer, generator_optimizer  # noqa: F401
from windtpu.train.state import GANTrainState, create_train_state  # noqa: F401
from windtpu.train.wgan_gp import make_eval_step, make_train_step  # noqa: F401
