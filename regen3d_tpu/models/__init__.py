"""JAX model zoo (flax.linen) — from-scratch architectures for the model
families the reference drives through torch/HF (SURVEY §2.2):

  dit       — flow-matching shape DiT + sampler (Hunyuan3D-2 family, phase 3)
  shapevae  — latent-set → SDF cross-attention decoder + grid decode
  vit       — ViT backbone (SAM-H image encoder family, DINO-style cond encoder)
  sam       — SAM prompt encoder + mask decoder (phase 1)
  vggt      — alternating frame/global-attention geometry transformer (phase 4)
  unet      — diffusion UNet family (upscaler / inpainting / intrinsics)
  lpips     — perceptual metric (phase 9)
  weights   — torch→JAX checkpoint conversion utilities

No pretrained weights ship in this environment (zero egress); every model
is architecture-complete, checkpoint-loadable via orbax, and tested at tiny
configurations on CPU.
"""
