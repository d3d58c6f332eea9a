"""triplegan_tpu — a TPU-native (JAX/XLA/Pallas) Triple-GAN framework.

A from-scratch rebuild of the capabilities of the reference TensorFlow
Triple-GAN implementation (Wenyuan-Vincent-Li/Tensorflow-Implementation-of-
Triple-GAN), designed TPU-first:

  * the three players (Generator / Discriminator / Classifier) are pure
    functional networks over pytree parameters (``triplegan_tpu.nn``),
  * the three-player alternating Adam update compiles to ONE jitted train
    step with sequential sub-updates (``triplegan_tpu.train.step``),
  * data parallelism is expressed with ``jax.sharding.Mesh`` + ``shard_map``
    and XLA collectives over ICI (``triplegan_tpu.parallel``),
  * input transforms (rescale, ZCA whitening, random translate-crop,
    horizontal flip, label one-hot / embedding-concat) run on device inside
    the compiled step (``triplegan_tpu.data``),
  * hot elementwise epilogues have fused Pallas TPU kernels
    (``triplegan_tpu.ops``).

Reference provenance: the reference mount was empty at build time (see
SURVEY.md §0); behavior is built to SURVEY.md (BASELINE.json + the
Triple-GAN paper, arXiv:1703.02291).
"""

__version__ = "0.1.0"
