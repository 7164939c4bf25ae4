"""Torch-side oracle utilities for UPDATE-level reference parity.

Shared by ``tests/test_update_parity.py`` (and available to future oracle
tests): import the reference package read-only, build its composites, seed
``torch.optim`` moment buffers, and compare converted parameter trees.

Why "historical semantics" for the VAE/GAN families: the reference's literal
per-batch schedule — three ``loss.backward(retain_graph=True)`` passes
interleaved with per-head ``optimizer.step()`` calls
(``train_vgan_stage1.py:406-432``) — cannot execute on torch >= 2.x: a modern
``optimizer.step()`` mutates parameters in place (bumping their autograd
version counters), so the *next* retained-graph backward that traverses those
parameters raises ``RuntimeError: ... modified by an inplace operation``
(pinned by ``test_update_parity.py::test_literal_reference_schedule_rejected
_by_modern_torch``).  The reference ran on the torch-0.4-era API where
``optimizer.step()`` wrote through ``param.data`` — which bypasses version
counters — so each retained backward silently proceeded.  Its gradient VALUES
were nevertheless those at the original weights: a head loss's gradient
w.r.t. its own group never routes through another group's *parameters*
(encoder params sit upstream of the decoder/discriminator segments; saved
activations, not live weights, carry the forward values).  ``group_grads``
reproduces exactly that: per-group gradients at the original weights via
``torch.autograd.grad`` scoped to the group's leaves.

The WAE families' schedules (fresh forward per phase, ``frozen_params`` /
``free_params`` toggles, ``train_wae_stage1.py:269-311``) never reuse a graph
across an optimizer step, so those oracles run the reference's literal
schedule unchanged on modern torch.
"""

from __future__ import annotations

import sys
import types
import warnings

import numpy as np

REF = "/root/reference"

_cache = {}


def stub_torchvision() -> None:
    """Satisfy the reference's torchvision imports (absent here): only dead
    code (ResNetEncoder) and unexercised helpers reach them."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.resnet152 = None
    tvm.inception_v3 = None
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: None
    tvu.save_image = lambda *a, **k: None
    tv.models, tv.utils = tvm, tvu
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.utils"] = tvu


def import_reference():
    """Import the reference's models package (with a torchvision stub).
    Returns ``(ref_models, ref_cfg)``; cached per process."""
    if "ref" in _cache:
        return _cache["ref"]
    stub_torchvision()
    sys.path.insert(0, REF)
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import configs.models_config as ref_cfg
            from models import vae_gan as ref_models
    finally:
        sys.path.remove(REF)
    _cache["ref"] = (ref_models, ref_cfg)
    return _cache["ref"]


# ------------------------ optimizer state seeding ------------------------
#
# Cold-start RMSprop/Adam map every gradient element to +-lr/sqrt(1-decay)
# regardless of magnitude (sq_avg starts at 0), so elements whose true
# gradient is below cross-framework fp32 noise become pure sign bits —
# meaningless to compare.  Seeding the second moments to 1.0 (identically on
# the torch and JAX sides) makes one update ~linear in the gradient while
# still exercising the full optimizer formula, so post-step parameters
# compare like gradients.


def warm_rmsprop(optimizer) -> None:
    import torch

    for group in optimizer.param_groups:
        for p in group["params"]:
            optimizer.state[p] = {"step": torch.tensor(0.0),
                                  "square_avg": torch.ones_like(p)}


def warm_adam(optimizer) -> None:
    import torch

    for group in optimizer.param_groups:
        for p in group["params"]:
            optimizer.state[p] = {"step": torch.tensor(0.0),
                                  "exp_avg": torch.zeros_like(p),
                                  "exp_avg_sq": torch.ones_like(p)}


def warm_jax_opt_state(opt_state):
    """Seed second moments to ones in a {group: RmsState|AdamState} dict."""
    import jax
    import jax.numpy as jnp

    from fmri_tpu.train.optim import AdamState, RmsState

    ones = lambda tree: jax.tree_util.tree_map(jnp.ones_like, tree)
    out = {}
    for k, s in opt_state.items():
        if isinstance(s, RmsState):
            out[k] = RmsState(ones(s.sq_avg))
        elif isinstance(s, AdamState):
            out[k] = AdamState(s.mu, ones(s.nu), s.count)
        else:  # pragma: no cover - future optimizers
            raise TypeError(type(s))
    return out


# ------------------------ schedules and comparison ------------------------


def group_grads(loss, module, retain_graph=True):
    """Per-group gradients at the original weights (historical semantics of
    the reference's retained-graph backward; see module docstring)."""
    import torch

    params = list(module.parameters())
    return params, torch.autograd.grad(loss, params, retain_graph=retain_graph)


def apply_grads(optimizer, params, grads, clamp=None) -> None:
    """Assign grads (optionally clamped elementwise, the reference's
    ``p.grad.data.clamp_(-1, 1)``, ``train_vgan_stage2.py:391,406``) and step."""
    for p, g in zip(params, grads):
        p.grad = g.clamp(-clamp, clamp) if clamp is not None else g
    optimizer.step()


def leafdict(tree):
    """Flatten a pytree to {keystr: np.float64 array}."""
    import jax

    return {jax.tree_util.keystr(k): np.asarray(v, np.float64)
            for k, v in jax.tree_util.tree_leaves_with_path(tree)}


def assert_updates_match(origin_groups, jax_params, after32, after64, lr,
                         group_names, ratio=5.0, floor=5e-4, rel=0.0,
                         key="params"):
    """Three-way self-calibrating update comparison.

    For every leaf, the JAX step's parameter delta (in units of ``lr``) must
    sit within ``ratio`` x the torch-fp32 oracle's own distance from the
    torch-fp64 oracle (same schedule, double precision) plus ``floor``.  The
    fp32 torch run certifies the precision *achievable* at fp32 — any
    structural mismatch (wrong term, sign, clamp, lr, gate) shows up as
    orders-of-magnitude violations.

    ``rel``: optional alternative bound as a fraction of the leaf's largest
    fp64 update.  Needed when the network inputs are themselves COMPUTED
    through deep stacks (e.g. stage-2's discriminator sees decoded images):
    the two torch runs share bit-identical forward composition, so their
    mutual distance misses the legitimate cross-framework forward noise
    (~1e-4 on activations) that a high-curvature adversarial gradient
    amplifies to a few percent.  Structural errors are O(0.3-2) relative,
    far above any sensible ``rel``.

    ``lr`` may be a float or a {group: float} dict.

    ``key`` selects which converted sub-tree to compare: ``"params"``
    (default) or ``"batch_stats"`` (with ``lr=1`` the same machinery
    bounds running-stat trajectories — the delta from origin is the
    "update").
    """
    for grp in group_names:
        glr = lr[grp] if isinstance(lr, dict) else lr
        o = leafdict(origin_groups[grp][key])
        j = leafdict(jax_params[grp])
        t32 = leafdict(after32[grp][key])
        t64 = leafdict(after64[grp][key])
        assert set(j) == set(t32) == set(t64) == set(o), grp
        for ks in j:
            dj = (j[ks] - o[ks]) / glr
            d32 = (t32[ks] - o[ks]) / glr
            d64 = (t64[ks] - o[ks]) / glr
            err_j = float(np.abs(dj - d64).max())
            err_t = float(np.abs(d32 - d64).max())
            bound = ratio * err_t + floor
            if rel:
                bound = max(bound, rel * float(np.abs(d64).max()))
            assert err_j <= bound, (
                f"{grp}{ks}: jax update err {err_j:.3e} vs torch-fp32 "
                f"conditioning {err_t:.3e} (ratio {err_j/(err_t+1e-12):.1f}, "
                f"leaf max |d64| {float(np.abs(d64).max()):.3e})")


class DataRmsProp:
    """RMSprop with torch-0.4-era write semantics: parameter updates land in
    the parameters' MEMORY without bumping their autograd version counters,
    so a later retained-graph backward that traverses them proceeds — and
    sees the UPDATED weight values, exactly as the reference's 2021 runs
    did.  Modern ``optimizer.step()`` (and even ``p.data.add_()``, which
    shares the TensorImpl's counter now) is rejected by the version check
    (pinned by ``test_literal_reference_schedule_rejected_by_modern_torch``);
    writing through a SHADOW tensor aliasing the same storage
    (``set_(untyped_storage(), ...)``) keeps its own counter, reproducing
    the historical behavior on modern torch.

    This lets an oracle execute a reference schedule LITERALLY — including
    ``exp_dcgan_stage1.py``'s quirks: the discriminator update lands before
    ``loss_decoder.backward()`` re-traverses it (stale-graph backward sees
    the UPDATED weights), and the decoder's grads accumulate across both
    backwards because only ``model.discriminator.zero_grad()`` runs between
    them (``:313-327``).

    Second moments are seeded to 1.0 (same contract as ``warm_rmsprop``).
    Matches ``torch.optim.RMSprop(alpha, eps, weight_decay=0, momentum=0,
    centered=False)``: ``sq = a*sq + (1-a)*g^2; p -= lr*g/(sqrt(sq)+eps)``.
    """

    def __init__(self, params, lr, alpha=0.9, eps=1e-8):
        import torch

        self.params = list(params)
        self.lr, self.alpha, self.eps = lr, alpha, eps
        self.sq = [torch.ones_like(p) for p in self.params]

    def step(self) -> None:
        """Consume ``p.grad`` (already clamped by the caller where the
        reference clamps) and update the parameter memory in place."""
        import torch

        with torch.no_grad():
            for i, p in enumerate(self.params):
                g = p.grad
                self.sq[i] = self.alpha * self.sq[i] + (1 - self.alpha) * g * g
                shadow = torch.empty(0, dtype=p.dtype)
                shadow.set_(p.untyped_storage(), p.storage_offset(),
                            p.size(), p.stride())
                shadow.add_(-self.lr * g / (self.sq[i].sqrt() + self.eps))


def nchw(x: np.ndarray):
    import torch

    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def to_dtype_sd(module):
    """state_dict with fp32 leaves (fp64 oracles are cast down for the
    shared converter; the quantization is ~6e-8*|param|, far below the
    comparison floor)."""
    return {k: v.float() for k, v in module.state_dict().items()}
