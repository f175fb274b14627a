"""fmvfi_tpu — TPU-native video frame interpolation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
stefan01/Fusion-Method-for-Video-Frame-Interpolation (PhaseNet + AdaCoF +
FusionNet fusion interpolation), designed TPU-first:

- `ops`      — pure-function compute core: complex steerable pyramid (jnp.fft),
               on-device CIELAB color transforms, AdaCoF deformable warping
               (jnp gather + Pallas kernel), separable/rank filters, resizing.
- `models`   — flax.linen models: PhaseNet, KernelEstimation U-Net + AdaCoF
               wrapper, FusionNet.
- `pipeline` — end-to-end jitted interpolation graphs (phase-only, adacof-only,
               full fusion) with static-shape resolution buckets.
- `train`    — optax training loops (phase / adacof / fusion regimes), losses,
               Vimeo90k data pipeline, orbax checkpointing.
- `parallel` — jax.sharding mesh helpers, data-parallel train/eval steps.
- `eval`     — metrics (PSNR/SSIM/SSD/...), dataset sweep harness,
               visualizations.
- `utils`    — torch-checkpoint converters, config, padding rules.

The reference is a PyTorch/CUDA/CuPy research codebase; nothing here is a
translation — control flow is functional, shapes are static, the hot ops are
XLA/Pallas.
"""

__version__ = "0.1.0"
