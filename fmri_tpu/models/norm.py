"""BatchNorm with an optional Pallas fused backward.

Subclasses ``flax.linen.BatchNorm`` (keeping the class name ``BatchNorm`` so
Flax auto-naming produces the identical ``BatchNorm_N`` parameter paths —
checkpoint and torch-interop layouts are unchanged).  With ``pallas=False``
(default) this IS flax BatchNorm.  With ``pallas=True`` the train-mode
normalization runs through ``fmri_tpu.ops.pallas_bn.batch_norm_train``,
whose custom VJP computes the backward in two Pallas passes (one fused dual
reduction + one elementwise apply) instead of XLA's reduce fusions —
targeting the 16.6%-of-step ``convert_reduce_fusion`` cost in the flagship
profile (docs/design.md §8).

Scope guards (both asserted by usage, not silently wrong):
  * train-mode with batch statistics only — eval mode (running averages)
    takes the stock flax path regardless of the flag;
  * the Pallas path is single-device: under a sharded ``jit`` GSPMD may
    force the kernel operands to replicate.  Keep ``pallas_bn`` off in
    multi-chip configs (the presets do).

Reference BN usage being accelerated: ``models/vae_gan.py:22,55`` —
``nn.BatchNorm2d`` after every conv/deconv of every net.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from fmri_tpu.ops import pallas_bn


class BatchNorm(nn.BatchNorm):
    """``flax.linen.BatchNorm`` + optional Pallas-backed train-mode path."""

    pallas: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        if not self.pallas or use_ra:
            # forward the *call-time* arg (may be None): the parent merges it
            # with the constructor field itself and rejects doubled passing.
            return super().__call__(x, use_running_average=use_running_average)

        if (not self.use_scale or not self.use_bias or self.axis != -1
                or self.axis_name is not None):
            raise ValueError(
                "BatchNorm(pallas=True) supports only the flax defaults "
                "use_scale=use_bias=True, axis=-1, axis_name=None — got "
                f"use_scale={self.use_scale} use_bias={self.use_bias} "
                f"axis={self.axis} axis_name={self.axis_name}. Silently "
                "ignoring these would diverge from the pallas=False path.")
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,),
                           self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        y, mu, var = pallas_bn.batch_norm_train(x, scale, bias,
                                                float(self.epsilon))
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mu
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y
