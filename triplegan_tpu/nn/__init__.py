"""Functional neural-net layers and the three Triple-GAN networks.

Rebuilds the reference's layer-helper base (SURVEY.md §2.1 #4,
``Model/model_base.py``: conv2d / deconv / dense / batch-norm / weight-norm /
gaussian-noise / dropout / leaky-relu) as pure functions over pytree params,
plus the Generator / Discriminator / Classifier (SURVEY.md §2.1 #5–7).
"""

from triplegan_tpu.nn import layers
from triplegan_tpu.nn import networks
from triplegan_tpu.nn.networks import Generator, Discriminator, Classifier

__all__ = ["layers", "networks", "Generator", "Discriminator", "Classifier"]
