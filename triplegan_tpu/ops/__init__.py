"""Pallas TPU kernels for the hot elementwise epilogues (SURVEY.md §2.2).

The reference leaned on cuDNN's fused conv+batchnorm kernels inside the TF
runtime; here the convolutions ride XLA's MXU path and the epilogues —
batch-norm affine + activation, and the weight-norm output scaling of the
generator's final deconv — are fused Pallas VPU kernels
(``scale_bias_act``). Because a convolution is linear in its kernel,
``deconv(x, v·g/‖v‖)`` ≡ ``deconv(x, v) · (g/‖v‖)`` per output channel, so
weight normalization becomes a per-channel epilogue scale instead of a
materialized scaled kernel — that is the "fused transposed-conv +
weight-norm" of the north star [B].
"""

from triplegan_tpu.ops.pallas_fused import scale_bias_act

__all__ = ["scale_bias_act"]
