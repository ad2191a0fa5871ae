from .autoencoder import (
    AutoencoderConfig,
    Decoder,
    DiagonalGaussian,
    Encoder,
    KLVAE,
    kl_vae_loss,
)
from .unet import Unet
from .dit import DiT, DiTBlock, dit_pipeline_forward
from .unet_cfg import CFGUnet
from .vq_vae import VectorQuantizer, VQVAE
