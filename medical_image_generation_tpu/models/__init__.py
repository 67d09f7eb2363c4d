from medical_image_generation_tpu.models.autoencoder_kl import AutoencoderKL
from medical_image_generation_tpu.models.diffusion_unet import DiffusionUNet
from medical_image_generation_tpu.models.discriminator import PatchDiscriminator
from medical_image_generation_tpu.models.vqvae import VQVAE

__all__ = ["AutoencoderKL", "DiffusionUNet", "PatchDiscriminator", "VQVAE"]
