"""Probe: why is the 3-channel output conv (decoder image head, reference
``models/vae_gan.py:58-60``) so far from roofline, and what fixes it?

The round-2 sweep (``results_convsweep_r2.json``) measured the stock XLA
lowering at 9.0% of peak forward / 4.7% weight-grad, both HBM-bound ops in
principle (sol 0.36 / 0.34 ms).  Hypotheses probed here, all pure-XLA:

  A. *Layout tax*: does merely copying a [B,64,64,3] tensor cost like its
     128-lane-padded size?  (copy3 vs copy3flat vs copy64)
  B. *Channel padding*: is the slowness specific to Co=3 — i.e. does the same
     conv with Co=8/16 dead-padded run at full rate?  If yes, a [5,5,64,8]
     weight with 5 dead channels + an output slice fixes fwd and dW at 2.67x
     FLOPs but full MXU utilization.
  C. *Patches route*: dW as one tall matmul against
     ``lax.conv_general_dilated_patches`` of the cotangent (the concat-built
     variant measured 41 ms — XLA's 3-lane concat copies; the patches
     primitive lowers to an identity-kernel conv with 75 output lanes).

Run on the TPU: ``python benchmarks/outconv_probe.py [--iters 20]``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
from jax import lax

from conv_breakdown import DIM, conv_flops, sol_ms, timed

B, H, W, CI, CO, K, P = 512, 64, 64, 64, 3, 5, 2


def fwd(x, w):
    out = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        [(P, P)] * 2, dimension_numbers=DIM)
    return out.astype(jnp.float32)


def fwd_pad(x, w, co_pad):
    """Same conv with the weight dead-padded to co_pad output channels and
    the result sliced back to CO."""
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, co_pad - CO)))
    out = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), wp.astype(jnp.bfloat16), (1, 1),
        [(P, P)] * 2, dimension_numbers=DIM)
    return out[..., :CO].astype(jnp.float32)


def dw_stock(x, dy):
    _, vjp = jax.vjp(lambda w: fwd(x, w), jnp.zeros((K, K, CI, CO)))
    return vjp(dy)[0]


def dw_pad(x, dy, co_pad):
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (0, 0), (0, co_pad - CO)))
    _, vjp = jax.vjp(
        lambda w: lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
            [(P, P)] * 2, dimension_numbers=DIM).astype(jnp.float32),
        jnp.zeros((K, K, CI, co_pad)))
    return vjp(dyp)[0][..., :CO]


def dw_patches_prim(x, dy):
    """dW via the patches primitive: one identity-kernel conv (75 output
    lanes) + one tall matmul, avoiding the 3-lane concat copies."""
    xb = x.astype(jnp.bfloat16)
    dyb = dy.astype(jnp.bfloat16)
    xp = jnp.pad(xb, ((0, 0), (P, P), (P, P), (0, 0)))
    pat = lax.conv_general_dilated_patches(
        dyb, (K, K), (1, 1), [(K - 1, K - 1)] * 2,
        dimension_numbers=DIM)                     # [B, Hp, Wp, Co*K*K]
    hp, wp = H + 2 * P, W + 2 * P
    a = xp.reshape(B * hp * wp, CI)
    d = pat.reshape(B * hp * wp, CO * K * K)
    out = lax.dot_general(a, d, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    # patches channel order is (ci=co, kh, kw) -> [Ci, Co, K, K]
    return out.reshape(CI, CO, K, K).transpose(2, 3, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    key = jax.random.key(0)
    x = jax.random.normal(key, (B, H, W, CI), jnp.float32)
    w = jax.random.normal(key, (K, K, CI, CO), jnp.float32) * 0.05
    dy = jax.random.normal(key, (B, H, W, CO), jnp.float32)
    y3 = jax.random.normal(key, (B, H, W, CO), jnp.float32)
    y3f = y3.reshape(B, H, W * CO)
    y64 = x

    fl = conv_flops(B, H, W, K, CI, CO)
    xbytes = B * H * W * CI * 2          # bf16 big-operand pass
    rows = []

    def row(name, fn, *a, flops=None, nbytes=None):
        ms = timed(fn, jnp.float32(0), *a, iters=args.iters) * 1e3
        extra = ""
        if flops:
            pct = flops / (ms * 1e9) / 197.0 * 100
            extra = f"{flops / ms / 1e9:8.1f} TF/s ({pct:5.1f}% peak)"
        if nbytes:
            extra += f"  sol {sol_ms(flops or 0, nbytes):6.3f} ms"
        print(f"{name:34s} {ms:8.3f} ms  {extra}")
        rows.append((name, ms))

    # A: layout tax on 3-channel tensors
    row("copy3 [512,64,64,3]", lambda _, t: t * 1.0001, y3,
        nbytes=2 * y3.size * 4)
    row("copy3flat [512,64,192]", lambda _, t: t * 1.0001, y3f,
        nbytes=2 * y3.size * 4)
    row("copy64 [512,64,64,64]", lambda _, t: t * 1.0001, y64,
        nbytes=2 * y64.size * 4)

    # B: channel padding
    row("fwd co=3 stock", lambda _, xx, ww: fwd(xx, ww), x, w,
        flops=fl, nbytes=xbytes)
    for cp in (8, 16, 32):
        row(f"fwd co={cp} padded", lambda _, xx, ww, c=cp: fwd_pad(xx, ww, c),
            x, w, flops=fl * cp / CO, nbytes=xbytes)
    row("dW co=3 stock", lambda _, xx, d: dw_stock(xx, d), x, dy,
        flops=fl, nbytes=xbytes)
    for cp in (8, 16, 32):
        row(f"dW co={cp} padded", lambda _, xx, d, c=cp: dw_pad(xx, d, c),
            x, dy, flops=fl * cp / CO, nbytes=xbytes)

    # C: patches-primitive dW
    row("dW patches-prim", lambda _, xx, d: dw_patches_prim(xx, d), x, dy,
        flops=fl, nbytes=xbytes)

    # D: traffic hypothesis — the ~1.5 ms wall-time floor tracks HBM bytes
    # (fp32 source + materialized bf16 cast copy), not MXU rate.  Vary the
    # residency/cast story with the co-pad trick on top.
    def fwd_f32(xx, ww):
        return lax.conv_general_dilated(xx, ww, (1, 1), [(P, P)] * 2,
                                        dimension_numbers=DIM)

    row("fwd fp32 nocast", lambda _, xx, ww: fwd_f32(xx, ww), x, w,
        flops=fl, nbytes=x.size * 4)
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    dyb = dy.astype(jnp.bfloat16)
    row("fwd bf16-resident", lambda _, xx, ww: fwd_f32(xx, ww), xb, wb,
        flops=fl, nbytes=x.size * 2)

    def fwd_res_pad(xx, ww, co_pad):
        wp = jnp.pad(ww, ((0, 0),) * 3 + ((0, co_pad - CO),))
        return fwd_f32(xx, wp)[..., :CO]

    for cp in (8, 32):
        row(f"fwd bf16-res co={cp}",
            lambda _, xx, ww, c=cp: fwd_res_pad(xx, ww, c), xb, wb,
            flops=fl * cp / CO, nbytes=x.size * 2)

    def dw_res(xx, d, co_pad):
        dp = jnp.pad(d, ((0, 0),) * 3 + ((0, co_pad - CO),)) if co_pad else d
        co = co_pad or CO
        _, vjp = jax.vjp(
            lambda ww: fwd_f32(xx, ww), jnp.zeros((K, K, CI, co), xx.dtype))
        out = vjp(dp)[0]
        return out[..., :CO] if co_pad else out

    row("dW bf16-resident", lambda _, xx, d: dw_res(xx, d, 0), xb, dyb,
        flops=fl, nbytes=x.size * 2)
    for cp in (8, 16, 32):
        row(f"dW bf16-res co={cp}",
            lambda _, xx, d, c=cp: dw_res(xx, d, c), xb, dyb,
            flops=fl * cp / CO, nbytes=x.size * 2)


if __name__ == "__main__":
    main()
