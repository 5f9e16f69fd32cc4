"""domain_transfer_gan_tpu: a TPU-native (JAX/XLA/Pallas) framework for
many-to-many unpaired domain transfer (Augmented CycleGAN family).

Built from scratch against the behavioral spec of the reference
implementation (adrianalbert/domain-transfer-GAN); see SURVEY.md at the repo
root for the layer map and the file:line citations used throughout the
docstrings here.

Layout
------
- ``ops``       low-level numerics (reparametrization, log-probs, losses) and
                TPU conv geometry helpers matching the reference's PyTorch
                shapes; ``ops.pallas`` holds fused TPU kernels.
- ``nn``        flax.linen modules: instance/conditional-instance norms,
                residual blocks, the seven network architectures.
- ``models``    the three trainable variants (cycle_gan, stoch_cycle_gan,
                aug_cycle_gan) as jit-compiled two-phase train steps over a
                TrainState pytree, plus the generation/inference API.
- ``data``      npz bundle loader, aligned/unaligned iterators, per-file
                dataset, edges2shoes + climate loaders, device feed.
- ``eval``      MSE / variational-UBO (BPP) / noise-sensitivity metrics and
                image-grid visualization.
- ``parallel``  mesh + sharding wiring for data-parallel training over ICI.
- ``utils``     artifacts (results.txt/json, histories), checkpointing, PRNG.
- ``cli``       train/test drivers preserving the reference flag surface.
"""

__version__ = "0.1.0"
