"""Model zoo: Pix2Pose autoencoder generators (paper + resnet50 backbones),
DCGAN discriminator, and the symmetry-aware reconstruction loss."""

from pix2pose_tpu.models.ae import (  # noqa: F401
    AutoEncoder,
    build_generator,
)
from pix2pose_tpu.models.discriminator import Discriminator  # noqa: F401
from pix2pose_tpu.models.losses import (  # noqa: F401
    transformer_loss,
    bce_logits,
)
