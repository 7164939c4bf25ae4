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

import jax
import jax.numpy as jnp
from flax import linen as nn

from fmri_tpu.ops import pallas_bn


class BatchNorm(nn.BatchNorm):
    """``flax.linen.BatchNorm`` + optional Pallas-backed train-mode path.

    Running-variance semantics follow **torch**, not stock flax: torch's
    ``nn.BatchNorm*`` normalizes with the biased batch variance but updates
    ``running_var`` with the UNBIASED one (ddof=1, factor ``n/(n-1)`` over
    the ``n`` reduced elements) — flax uses the biased variance for both.
    The reference trains every BN this way (``models/vae_gan.py:22,55``), so
    eval-mode forwards of a checkpoint trained here must apply the same
    correction or they diverge from a reference-trained checkpoint's
    (caught by ``tests/test_update_parity.py::
    test_vgan1_encoder_decoder_bn_stats_match``)."""

    pallas: bool = False
    # Virtual sequential sub-batches along axis 0 (train mode only): with
    # ``vsplit=k`` the leading dimension is treated as k back-to-back batches
    # — statistics are computed PER sub-batch, each sub-batch is normalized
    # with its own stats, and the running averages tick k times in order.
    # This makes one fused k*B forward mathematically identical to k
    # sequential B forwards (the reference decodes x_tilde then x_p through
    # the same decoder, ``vae_gan.py:281-283`` — two BN ticks), so the fused
    # decoder batch (``ModelConfig.fused_decoder_batch``) is
    # gradient-equivalent, not a semantics trade.
    vsplit: int = 1

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        if use_ra:
            # forward the *call-time* arg (may be None): the parent merges it
            # with the constructor field itself and rejects doubled passing.
            return super().__call__(x, use_running_average=use_running_average)
        if self.axis != -1:
            raise ValueError(
                "BatchNorm train mode implements the torch unbiased "
                "running-var update for axis=-1 only (the repo-wide layout); "
                f"got axis={self.axis}.")
        if self.axis_name is not None:
            # Under pmap/shard_map the parent syncs mean/var across the
            # named axis, but `x.size` here counts only the LOCAL shard —
            # the n/(n-1) correction would be silently wrong.  The repo is
            # jit/GSPMD-only (global shapes), where x.size IS the global
            # count; reject the one configuration that breaks the contract.
            raise ValueError(
                "BatchNorm train mode does not support axis_name: the "
                "unbiased running-var correction needs the global element "
                "count, and this trace sees only the local shard. Use "
                "jit/GSPMD sharding (parallel/mesh.py) instead of pmap.")
        c = x.shape[-1]
        n = x.size // c  # reduced elements per channel (global under GSPMD)
        if self.vsplit > 1:
            if self.pallas:
                raise ValueError("BatchNorm: vsplit>1 + pallas is unsupported")
            return self._vsplit_train(x)
        if not self.pallas:
            # read/write around the parent without re-declaring the variable
            # (compact modules allow each declaration once per call)
            had = self.has_variable("batch_stats", "var")
            old_var = self.get_variable("batch_stats", "var") if had else None
            y = super().__call__(x, use_running_average=use_running_average)
            if not self.is_initializing() and n > 1 and had:
                # parent wrote m*old + (1-m)*var_biased; rewrite the tick
                # with var_biased * n/(n-1) (exact algebra, not a re-reduce).
                m = self.momentum
                new = self.get_variable("batch_stats", "var")
                var_b = (new - m * old_var) / (1.0 - m)
                self.put_variable(
                    "batch_stats", "var",
                    m * old_var + (1.0 - m) * var_b * (n / (n - 1.0)))
            return y

        if (not self.use_scale or not self.use_bias
                or self.axis_name is not None):
            raise ValueError(
                "BatchNorm(pallas=True) supports only the flax defaults "
                "use_scale=use_bias=True, axis_name=None — got "
                f"use_scale={self.use_scale} use_bias={self.use_bias} "
                f"axis_name={self.axis_name}. Silently ignoring these would "
                "diverge from the pallas=False path.")
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
            unbias = n / (n - 1.0) if n > 1 else 1.0
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mu
            ra_var.value = m * ra_var.value + (1.0 - m) * var * unbias
        return y

    def _vsplit_train(self, x):
        """Train-mode normalization with per-sub-batch statistics.

        Replicates flax's fast-variance stats math (``mean``,
        ``max(0, mean(x^2) - mean^2)``) and normalize order per sub-batch,
        plus the torch unbiased running-var tick of the stock path, so a
        ``vsplit=k`` call over ``k*B`` rows equals ``k`` sequential calls
        over ``B`` rows (asserted by ``tests/test_steps.py``)."""
        k = self.vsplit
        if (not self.use_scale or not self.use_bias):
            raise ValueError(
                "BatchNorm(vsplit>1) supports only use_scale=use_bias=True")
        if x.shape[0] % k:
            raise ValueError(
                f"BatchNorm(vsplit={k}): leading dim {x.shape[0]} not divisible")
        c = x.shape[-1]
        xr = x.reshape((k, x.shape[0] // k) + x.shape[1:]).astype(jnp.float32)
        red = tuple(range(1, xr.ndim - 1))
        mu = xr.mean(red)                                        # (k, C)
        var = jnp.maximum(0.0, (xr * xr).mean(red) - mu * mu)    # biased
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (c,))
        bshape = (k,) + (1,) * (xr.ndim - 2) + (c,)
        mul = jax.lax.rsqrt(var.reshape(bshape) + self.epsilon) * scale
        y = (xr - mu.reshape(bshape)) * mul + bias
        if not self.is_initializing():
            m = self.momentum
            n = x.size // (k * c)  # reduced elements per sub-batch
            unbias = n / (n - 1.0) if n > 1 else 1.0
            new_mean, new_var = ra_mean.value, ra_var.value
            for i in range(k):  # sequential EMA ticks, reference order
                new_mean = m * new_mean + (1.0 - m) * mu[i]
                new_var = m * new_var + (1.0 - m) * var[i] * unbias
            ra_mean.value, ra_var.value = new_mean, new_var
        return y.reshape(x.shape).astype(x.dtype)
