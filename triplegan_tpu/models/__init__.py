"""Model families — alias namespace.

The canonical implementations live in :mod:`triplegan_tpu.nn` (functional
layer helpers + network specs); this package re-exports them under the
conventional ``models`` name.
"""

from triplegan_tpu.nn.networks import Classifier, Discriminator, Generator
from triplegan_tpu.configs.base import make_networks

__all__ = ["Generator", "Discriminator", "Classifier", "make_networks"]
