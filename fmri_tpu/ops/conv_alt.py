"""Alternative XLA formulations for the two conv-backward ops that XLA's
stock lowering leaves far from roofline on v5e (measured per-op in
``benchmarks/conv_breakdown.py``; see docs/design.md §8b):

* ``conv2d_dw_patches`` — weight grad of a stride-1 conv with *few output
  channels* (the reference's final ``decoder.conv5`` 64->3 image head,
  ``models/vae_gan.py:58-60``).  XLA's conv-weight-grad lowering contracts
  over (batch, spatial) at <5% of peak here: the 3-channel output starves the
  MXU lanes.  Instead we materialize the 25 kernel-tap shifts of the *small*
  operand (the cotangent, 25x3 = 75 channels) and issue ONE tall matmul
  ``[B*Hp*Wp, Ci]^T @ [B*Hp*Wp, k*k*Co]`` whose output tile (64 x 75) the MXU
  can actually fill.  The tap-shift tensor costs one extra HBM pass over the
  cotangent (the small side) — the big operand (x) is read exactly once.

* ``conv2d_dx_phases`` — input grad of a stride-2 conv.  XLA emits a
  kernel-reversed lhs-dilated conv (dilation zeros + a ``reverse`` op);
  measured at 45% of peak on the discriminator shapes.  The subpixel
  decomposition splits the cotangent pullback into 4 output-parity phases,
  each a dense stride-1 conv with a 2x2-strided sub-kernel (3x3/3x2/2x3/2x2
  taps — 25 total, identical FLOPs, no dilation), then interleaves the
  phases.  (The same decomposition measured *slower* for the forward deconv,
  where XLA was already >90% of peak — here the bar is 45%.)

Both are algebraic rewrites of the same contractions, so gradients are
bit-compatible up to float addition order; equivalence vs the stock XLA
backward is asserted in ``tests/test_conv_alt.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d_dw_patches(x: jax.Array, dy: jax.Array, padding: int,
                      k: int = 5) -> jax.Array:
    """Weight grad of ``conv2d(x, w, stride=1, padding)`` as one tall matmul.

    x: [B, H, W, Ci]; dy: [B, OH, OW, Co] with OH = H + 2*padding - k + 1.
    Returns [k, k, Ci, Co] in fp32 (MXU accumulates fp32 regardless of the
    operand dtype — pass bf16 operands for the fast path).

    Derivation: dW[kh,kw,ci,co] = sum_{n,y,x} X[n, y+kh-p, x+kw-p, ci]
    * dy[n,y,x,co].  Reindex onto the padded grid a = y + kh (xp[a] =
    X[a-p]): dy[y] = dyp[a - kh + (k-1)] with dyp = dy padded by k-1 — so
    tap (kh, kw) is the static slice of dyp starting at (k-1-kh, k-1-kw),
    and stacking the 25 slices on the channel axis turns the whole weight
    grad into a single rank-(B*Hp*Wp) contraction.
    """
    b, h, w, ci = x.shape
    _, oh, ow, co = dy.shape
    hp, wp = h + 2 * padding, w + 2 * padding
    assert oh == hp - k + 1 and ow == wp - k + 1, (x.shape, dy.shape)
    xp = jnp.pad(x, ((0, 0), (padding,) * 2, (padding,) * 2, (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (k - 1,) * 2, (k - 1,) * 2, (0, 0)))
    taps = [
        dyp[:, k - 1 - kh:k - 1 - kh + hp, k - 1 - kw:k - 1 - kw + wp, :]
        for kh in range(k) for kw in range(k)
    ]
    dyt = jnp.concatenate(taps, axis=-1)          # [B, Hp, Wp, k*k*Co]
    a = xp.reshape(b * hp * wp, ci)
    d = dyt.reshape(b * hp * wp, k * k * co)
    out = lax.dot_general(a, d, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [Ci, k*k*Co]
    return out.reshape(ci, k, k, co).transpose(1, 2, 0, 3)


def conv2d_dx_phases(dy: jax.Array, kernel: jax.Array, x_hw: tuple[int, int],
                     padding: int = 2) -> jax.Array:
    """Input grad of ``conv2d(x, kernel, stride=2, padding)`` via subpixel
    phases.

    dy: [B, OH, OW, Co]; kernel: [k, k, Ci, Co]; x_hw: the (H, W) of the
    input being pulled back to.  Returns [B, H, W, Ci] in fp32.

    Phase (py, px) of dX (rows 2u+py, cols 2v+px) receives only kernel taps
    with kh = py (mod 2) — for p=2, k=5: phase 0 gets taps {0,2,4}, phase 1
    gets {1,3} — giving dXp[n,u,v] = sum_{i,j} dy[n, u+1-i, v+1-j]
    * W[py+2i, px+2j], a stride-1 *convolution* (flipped sub-kernel) with
    per-edge padding (nh-2, 1).
    """
    assert padding == 2 and kernel.shape[0] == 5, (padding, kernel.shape)
    h, w = x_hw
    b, oh, ow, co = dy.shape
    ci = kernel.shape[2]
    phases = []
    for py in range(2):
        row = []
        for px in range(2):
            sub = kernel[py::2, px::2]            # [nh, nw, Ci, Co]
            nh, nw = sub.shape[:2]
            sub = sub[::-1, ::-1]                 # conv = flipped correlation
            # pull back: contract Co, emit Ci  ->  treat sub as [nh,nw,Co,Ci]
            sub = sub.transpose(0, 1, 3, 2)
            out = lax.conv_general_dilated(
                dy, sub, (1, 1),
                [(nh - 2, 1), (nw - 2, 1)],
                dimension_numbers=DIMSPEC)
            row.append(out)                       # [B, H/2, W/2, Ci]
        phases.append(row)
    # interleave: dX[n, 2u+py, 2v+px, ci] = phases[py][px][n, u, v, ci]
    stacked = jnp.stack([jnp.stack(r, axis=0) for r in phases], axis=0)
    # [2, 2, B, H/2, W/2, Ci] -> [B, H/2, 2, W/2, 2, Ci] -> [B, H, W, Ci]
    out = stacked.transpose(2, 3, 0, 4, 1, 5).reshape(b, h, w, ci)
    return out.astype(jnp.float32)
