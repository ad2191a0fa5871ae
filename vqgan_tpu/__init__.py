"""vqgan_tpu — a TPU-native (JAX / XLA / Pallas / pjit) two-stage latent
generative framework.

Re-designed from scratch with the capabilities of the reference
``heimaoqqq/vq-gan`` stack (see SURVEY.md):

- stage-1 image autoencoders: a Stable-Diffusion-style KL-VAE and a VQ-GAN
  trained with LPIPS perceptual + PatchGAN adversarial losses under a single
  jitted two-optimizer GAN step,
- stage-2 class-conditional latent diffusion: CFG U-Net + DDPM/DDIM samplers
  compiled with ``lax.scan``, plus the broader diffusion-variant library
  (elucidated/Karras EDM, RePaint, classifier guidance, continuous-time,
  learned-variance, 1D, UViT),
- fused Pallas kernels for the hot ops (vector-quantization lookup, flash
  attention),
- data tooling (GMM stratified splits, bulk latent preprocessing) and
  evaluation (FID, PSNR/SSIM, downstream classifier harness).

Layout is NHWC everywhere (TPU-native); parameters live in fp32, compute in
bf16 where numerically safe.
"""

__version__ = "0.1.0"
