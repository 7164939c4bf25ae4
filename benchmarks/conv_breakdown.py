"""Per-op conv/BN timing on the real TPU: where does the backward go?

Measures fwd / input-grad (dX) / weight-grad (dW) for every hot conv shape of
the res64-bf16 flagship step (encoder B=256, discriminator 3-way batch B=768,
decoder fused 2B=512), plus the train-mode BatchNorm fwd/bwd at the big
activation shapes.  Prints achieved TFLOP/s against the v5e bf16 peak (~197).

Timing rule for this environment (CLAUDE.md): sync by pulling a scalar to
host; each op runs ITERS times inside one jitted lax.scan with a scalar
carry folded into the *weights* (cheap) so the compiler can't hoist the op.

Usage:  python benchmarks/conv_breakdown.py [--iters 10] [--json out.json]
        --pallas additionally times the ``fmri_tpu.ops.pallas_dw`` tap-matmul
        weight-grad kernels (bf16 operands, fp32 accumulation) next to each
        XLA dW row.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0     # v5e HBM bandwidth
DIM = ("NHWC", "HWIO", "NHWC")


def sol_ms(flops: float, nbytes: float) -> float:
    """Speed-of-light: an op can go no faster than both its FLOP time at MXU
    peak and its HBM time at full bandwidth."""
    return max(flops / (PEAK_TFLOPS * 1e12), nbytes / (HBM_GBPS * 1e9)) * 1e3


def conv_fwd(x, w, stride, padding):
    """Same cast pattern as ``fmri_tpu.ops.conv.conv2d`` with
    compute_dtype='bfloat16': bf16 MXU operands, fp32 op boundary."""
    out = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (stride, stride),
        [(padding, padding)] * 2, dimension_numbers=DIM)
    return out.astype(jnp.float32)


def deconv_fwd(x, w, stride=2, padding=2, output_padding=1):
    k = w.shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    out = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        [(lo, hi)] * 2, lhs_dilation=(stride, stride),
        dimension_numbers=DIM)
    return out.astype(jnp.float32)


def timed(fn, *args, iters):
    """Differential timing, robust to the tunnel's large variable dispatch
    latency: run the op N and 2N times inside jitted lax.scans (scalar carry
    perturbs the weights arg to defeat CSE/hoisting) and report
    (T(2N) - T(N)) / N, min over 3 repetitions."""

    def make(n):
        @jax.jit
        def run(salt, *a):
            def body(acc, _):
                pert = (a[1] + acc.astype(a[1].dtype),) + a[2:]
                y = fn(a[0], *pert)
                return jnp.sum(y).astype(jnp.float32) * jnp.float32(1e-20), None

            # salt makes every dispatch unique: the tunneled platform serves
            # repeated identical executions from a cache, which voids timing.
            acc, _ = lax.scan(body, salt * jnp.float32(1e-20), None, length=n)
            return acc

        return run

    run_n, run_2n = make(iters), make(2 * iters)
    salt = iter(range(1, 100))
    float(run_n(jnp.float32(next(salt)), *args))   # compile + warm
    float(run_2n(jnp.float32(next(salt)), *args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_n(jnp.float32(next(salt)), *args))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_2n(jnp.float32(next(salt)), *args))
        t_2n = time.perf_counter() - t0
        best = min(best, max(t_2n - t_n, 1e-9))
    return best / iters


def conv_flops(b, oh, ow, k, cin, cout, zero_skip=1.0):
    return 2.0 * b * oh * ow * k * k * cin * cout * zero_skip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--json", default=None)
    ap.add_argument("--pallas", action="store_true",
                    help="also time fmri_tpu.ops.pallas_dw kernels")
    ap.add_argument("--alt", action="store_true",
                    help="also time fmri_tpu.ops.conv_alt reformulations "
                         "(patches dW for small-Co s1 convs, phases dX for "
                         "s2 convs)")
    ap.add_argument("--fp8", action="store_true",
                    help="also time the discriminator convs with "
                         "float8_e4m3fn operands (the TODO.md fp8-disc "
                         "experiment; v5e has no fp8 MXU so XLA is expected "
                         "to upconvert — measure either way)")
    ap.add_argument("--only", default=None,
                    help="comma-separated tag filter (e.g. disc2,dec1)")
    args = ap.parse_args()

    if args.pallas or args.alt:
        import sys
        from pathlib import Path
        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    if args.pallas:
        from fmri_tpu.ops import pallas_dw
    if args.alt:
        from fmri_tpu.ops import conv_alt

    results = []

    def report(name, t, flops, nbytes=None):
        tf = flops / t / 1e12
        row = {"op": name, "ms": round(t * 1e3, 3), "tflops": round(tf, 1),
               "pct_peak": round(100 * tf / PEAK_TFLOPS, 1)}
        sol = ""
        if nbytes is not None:
            row["sol_ms"] = round(sol_ms(flops, nbytes), 3)
            sol = f"  sol {row['sol_ms']:6.3f} ms ({t*1e3/row['sol_ms']:4.1f}x)"
        results.append(row)
        print(f"{name:34s} {row['ms']:8.3f} ms  {row['tflops']:6.1f} TF/s "
              f"({row['pct_peak']:4.1f}% peak){sol}")

    key = jax.random.key(0)

    # (tag, B, H, W, Cin, Cout, stride)  -- k=5, p=2 everywhere
    convs = [
        ("enc1", 256, 64, 64, 3, 64, 2),
        ("enc2", 256, 32, 32, 64, 128, 2),
        ("enc3", 256, 16, 16, 128, 256, 2),
        ("disc1", 768, 64, 64, 3, 32, 1),
        ("disc2", 768, 64, 64, 32, 128, 2),
        ("disc3", 768, 32, 32, 128, 256, 2),
        ("disc4", 768, 16, 16, 256, 256, 2),
        ("outconv", 512, 64, 64, 64, 3, 1),
    ]
    only = set(args.only.split(",")) if args.only else None
    for tag, b, h, w_, cin, cout, s in convs:
        if only and tag not in only:
            continue
        oh = h // s
        k1, k2, k3, key = jax.random.split(key, 4)
        x = jax.random.normal(k1, (b, h, w_, cin), jnp.float32)
        w = jax.random.normal(k2, (5, 5, cin, cout), jnp.float32) * 0.05
        cot = jax.random.normal(k3, (b, oh, oh, cout), jnp.float32)
        fl = conv_flops(b, oh, oh, 5, cin, cout)
        bx, bw, by = x.size, w.size, cot.size  # element counts

        t = timed(lambda x_, w_2: conv_fwd(x_, w_2, s, 2), x, w,
                  iters=args.iters)
        report(f"{tag} fwd [{b},{h},{w_},{cin}->{cout}]/{s}", t, fl,
               (bx + bw) * 2 + by * 4)

        # dX: cotangent pulled back to the input (weights perturbed by carry)
        def dx_fn(cot_, w_2, x_=x, s_=s):
            f = lambda xx: jnp.vdot(conv_fwd(xx, w_2, s_, 2), cot_)
            return jax.grad(f)(x_)

        t = timed(dx_fn, cot, w, iters=args.iters)
        report(f"{tag} dX", t, fl, (by + bw) * 2 + bx * 4)

        # dW: forward value is dead code (XLA prunes it)
        def dw_fn(x_, cot_, w_2=w, s_=s):
            f = lambda ww: jnp.vdot(conv_fwd(x_, ww, s_, 2), cot_)
            return jax.grad(f)(w_2 + cot_.ravel()[0] * 0)

        t = timed(lambda x_, cot_: dw_fn(x_, cot_), x, cot, iters=args.iters)
        report(f"{tag} dW", t, fl, (bx + by) * 2 + bw * 4)

        if args.pallas:
            def pdw_fn(x_, cot_, s_=s):
                return pallas_dw.conv2d_dw(x_, cot_, stride=s_, padding=2)

            t = timed(pdw_fn, x.astype(jnp.bfloat16),
                      cot.astype(jnp.bfloat16), iters=args.iters)
            report(f"{tag} dW pallas", t, fl)

        if args.alt and s == 2:
            def adx_fn(cot_, w_2, hw=(h, w_)):
                return conv_alt.conv2d_dx_phases(
                    cot_.astype(jnp.bfloat16), w_2.astype(jnp.bfloat16), hw)

            t = timed(adx_fn, cot, w, iters=args.iters)
            report(f"{tag} dX phases", t, fl, (by + bw) * 2 + bx * 4)

        if args.fp8 and tag.startswith("disc"):
            def f8_fn(x_, w_2, s_=s):
                f8 = jnp.float8_e4m3fn
                out = lax.conv_general_dilated(
                    x_.astype(f8), w_2.astype(f8), (s_, s_), [(2, 2)] * 2,
                    dimension_numbers=DIM,
                    preferred_element_type=jnp.float32)
                return out

            try:
                t = timed(f8_fn, x, w, iters=args.iters)
                report(f"{tag} fwd fp8", t, fl)
            except Exception as e:  # pragma: no cover - hw dependent
                print(f"{tag} fwd fp8: unsupported ({type(e).__name__}: "
                      f"{str(e)[:120]})")
                results.append({"op": f"{tag} fwd fp8", "error": str(e)[:200]})

        if args.alt and s == 1 and cout <= 16:
            def adw_fn(x_, cot_):
                return conv_alt.conv2d_dw_patches(
                    x_.astype(jnp.bfloat16), cot_.astype(jnp.bfloat16),
                    padding=2)

            t = timed(adw_fn, x, cot, iters=args.iters)
            report(f"{tag} dW patches", t, fl, (bx + by) * 2 + bw * 4)

    # deconvs (decoder blocks, fused 2B batch)
    deconvs = [
        ("dec1", 512, 8, 8, 256, 256),
        ("dec2", 512, 16, 16, 256, 128),
        ("dec3", 512, 32, 32, 128, 64),
    ]
    for tag, b, h, w_, cin, cout in deconvs:
        if only and tag not in only:
            continue
        oh = h * 2
        k1, k2, k3, key = jax.random.split(key, 4)
        x = jax.random.normal(k1, (b, h, w_, cin), jnp.float32)
        w = jax.random.normal(k2, (5, 5, cin, cout), jnp.float32) * 0.05
        cot = jax.random.normal(k3, (b, oh, oh, cout), jnp.float32)
        fl = conv_flops(b, oh, oh, 5, cin, cout, zero_skip=0.25)
        bx, bw, by = x.size, w.size, cot.size

        t = timed(lambda x_, w_2: deconv_fwd(x_, w_2), x, w, iters=args.iters)
        report(f"{tag} deconv fwd [{b},{h}->{oh},{cin}->{cout}]", t, fl,
               (bx + bw) * 2 + by * 4)

        def ddx_fn(cot_, w_2, x_=x):
            f = lambda xx: jnp.vdot(deconv_fwd(xx, w_2), cot_)
            return jax.grad(f)(x_)

        t = timed(ddx_fn, cot, w, iters=args.iters)
        report(f"{tag} deconv dX", t, fl, (by + bw) * 2 + bx * 4)

        def ddw_fn(x_, cot_, w_2=w):
            f = lambda ww: jnp.vdot(deconv_fwd(x_, ww), cot_)
            return jax.grad(f)(w_2 + cot_.ravel()[0] * 0)

        t = timed(lambda x_, cot_: ddw_fn(x_, cot_), x, cot, iters=args.iters)
        report(f"{tag} deconv dW", t, fl, (bx + by) * 2 + bw * 4)

        if args.pallas:
            def pddw_fn(x_, cot_):
                return pallas_dw.conv2d_transpose_dw(x_, cot_, output_padding=1)

            t = timed(pddw_fn, x.astype(jnp.bfloat16),
                      cot.astype(jnp.bfloat16), iters=args.iters)
            report(f"{tag} deconv dW pallas", t, fl)

    # BatchNorm train fwd+bwd at the big activation shapes (bandwidth-bound:
    # report GB/s moved instead of TF/s)
    bns = [("bn_disc2", 768, 32, 32, 128), ("bn_disc3", 768, 16, 16, 256),
           ("bn_dec3", 512, 64, 64, 64), ("bn_dec2", 512, 32, 32, 128)]
    for tag, b, h, w_, c in bns:
        if only and tag not in only:
            continue
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (b, h, w_, c), jnp.float32)
        cot = jax.random.normal(k2, (b, h, w_, c), jnp.float32)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        nbytes = x.size * 4

        def bn_fwd(x_, gamma_):
            mu = jnp.mean(x_, axis=(0, 1, 2))
            var = jnp.var(x_, axis=(0, 1, 2))
            return jax.nn.relu((x_ - mu) * gamma_ * lax.rsqrt(var + 1e-5) + beta)

        t = timed(bn_fwd, x, gamma, iters=args.iters)
        row_tf = 3 * nbytes / t / 1e9
        results.append({"op": f"{tag} fwd", "ms": round(t * 1e3, 3),
                        "gbps": round(row_tf, 1)})
        print(f"{tag+' fwd':34s} {t*1e3:8.3f} ms  {row_tf:6.1f} GB/s eff")

        def bn_bwd(cot_, gamma_, x_=x):
            f = lambda xx, g: jnp.vdot(bn_fwd(xx, g), cot_)
            return jax.grad(f, argnums=(0, 1))(x_, gamma_)

        t = timed(bn_bwd, cot, gamma, iters=args.iters)
        row_tf = 3 * nbytes / t / 1e9
        results.append({"op": f"{tag} bwd", "ms": round(t * 1e3, 3),
                        "gbps": round(row_tf, 1)})
        print(f"{tag+' bwd':34s} {t*1e3:8.3f} ms  {row_tf:6.1f} GB/s eff")

        if args.pallas:
            from fmri_tpu.ops import pallas_bn

            def pbn_bwd(cot_, gamma_, x_=x):
                # same BN+ReLU composite as the XLA row, BN bwd via Pallas
                f = lambda xx, g: jnp.vdot(jax.nn.relu(
                    pallas_bn.batch_norm_train(xx, g, beta, 1e-5)[0]), cot_)
                return jax.grad(f, argnums=(0, 1))(x_, gamma_)

            t = timed(pbn_bwd, cot, gamma, iters=args.iters)
            row_tf = 3 * nbytes / t / 1e9
            results.append({"op": f"{tag} bwd pallas", "ms": round(t * 1e3, 3),
                            "gbps": round(row_tf, 1)})
            print(f"{tag+' bwd pallas':34s} {t*1e3:8.3f} ms  "
                  f"{row_tf:6.1f} GB/s eff")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
