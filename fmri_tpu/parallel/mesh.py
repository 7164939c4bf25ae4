"""Device-mesh and sharding layer — the framework's distributed backend.

The reference has **no** parallelism or communication backend (single CUDA
device chosen by a config string, ``configs/gan_config.py:11-13``; the
``device2``/``device3`` entries are declared but never used for compute,
``train_vgan_stage1.py:118-119``).  This module is the TPU-native first-class
replacement (SURVEY.md §2.8/§5.8):

  * a ``jax.sharding.Mesh`` over the slice with a ``data`` axis (batch/SPMD)
    and an optional ``model`` axis (voxel-dimension tensor parallelism for the
    CognitiveEncoder's [num_voxels, hidden] matmul — the natural shard axis if
    future configs use full-brain voxel counts, SURVEY.md §5.7);
  * sharding constructors for batches (data-parallel), replicated params, and
    voxel-sharded cognitive params;
  * the train steps themselves are ordinary jitted functions — placing the
    inputs with these shardings makes XLA's SPMD partitioner emit the gradient
    all-reduces and BatchNorm cross-replica reductions over ICI automatically
    ("computation follows data"), with no hand-written collectives;
  * multi-host entry via ``jax.distributed.initialize`` (DCN between hosts).

Tested on an 8-virtual-device CPU mesh (tests/test_mesh.py); the driver's
``dryrun_multichip`` exercises the same path.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bring-up over DCN; no-op for single-process runs."""
    if coordinator is not None:  # pragma: no cover - needs multi-host env
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=None`` uses every device not consumed by the model axis.  Axis
    layout puts ``model`` innermost so model-parallel collectives ride
    nearest-neighbour ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, shard_features: bool = False):
    """Batch axis over ``data``; optionally the trailing (feature/voxel) axis
    over ``model`` (for voxel-TP inputs)."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    if shard_features and ndim >= 2:
        spec[-1] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, voxel_tp: bool = False) -> Any:
    """Place a host batch (array or {'fmri','image'} dict) onto the mesh,
    batch-dim over ``data``; with ``voxel_tp`` the fMRI voxel axis additionally
    shards over ``model``."""

    def place(path, x):
        is_fmri = any(getattr(k, "key", None) == "fmri" for k in path)
        return jax.device_put(
            x, batch_sharding(mesh, np.ndim(x), shard_features=voxel_tp and is_fmri))

    return jax.tree_util.tree_map_with_path(place, batch)


def shard_batch_multihost(batch: Any, mesh: Mesh, voxel_tp: bool = False) -> Any:
    """Multi-host batch placement: each process contributes its local shard of
    the global batch (``jax.make_array_from_process_local_data``), so the host
    data loading is sharded per process (SURVEY.md §5.8 item 4).  Single-process
    meshes fall back to :func:`shard_batch`."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, voxel_tp=voxel_tp)

    def place(path, x):  # pragma: no cover - needs multi-host env
        is_fmri = any(getattr(k, "key", None) == "fmri" for k in path)
        sharding = batch_sharding(mesh, np.ndim(x),
                                  shard_features=voxel_tp and is_fmri)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map_with_path(place, batch)


def _tp_kernel_match(layer: str):
    """Predicate for 'the 2-D ``kernel`` leaf under module ``layer``' —
    the ONE matching rule both the spec side and the placement side use
    (params and optimizer moments mirror the same tree structure, so the
    same match covers both; the ndim guard skips scalar bookkeeping
    leaves)."""

    def match(path, leaf=None) -> bool:
        keys = [getattr(k, "key", getattr(k, "name", None)) for k in path]
        return (layer in keys and bool(keys) and keys[-1] == "kernel"
                and (leaf is None or np.ndim(leaf) == 2))

    return match


def _tp_specs(params: Any, layer: str) -> Any:
    match = _tp_kernel_match(layer)

    def spec(path, leaf):
        return P(MODEL_AXIS, None) if match(path, leaf) else P()

    return jax.tree_util.tree_map_with_path(spec, params)


def _tp_place(tree: Any, mesh: Mesh, layer: str) -> Any:
    """Leaf placement derived from the same match as :func:`_tp_specs`."""
    match = _tp_kernel_match(layer)

    def place(path, leaf):
        if match(path, leaf):
            return jax.device_put(leaf, NamedSharding(mesh, P(MODEL_AXIS, None)))
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree_util.tree_map_with_path(place, tree)


def cognitive_param_specs(params: Any) -> Any:
    """PartitionSpecs for a cognitive-encoder group: ``fc1`` kernel sharded
    [voxels -> model, hidden] (1-D tensor parallelism over the voxel axis:
    each model-shard computes a partial matmul, XLA inserts the psum); all
    other leaves replicated."""
    return _tp_specs(params, "fc1")


def shard_params(params: Any, mesh: Mesh, specs: Any = None) -> Any:
    """Place parameters on the mesh; replicated by default, or per-leaf specs."""
    if specs is None:
        return jax.device_put(params, replicated(mesh))
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def _voxel_tp_place(tree: Any, mesh: Mesh) -> Any:
    """Placement mirroring :func:`cognitive_param_specs` (params AND
    optimizer moments)."""
    return _tp_place(tree, mesh, "fc1")


def decoder_param_specs(params: Any) -> Any:
    """PartitionSpecs for the shared ``Decoder`` group: its projection
    ``Dense_0`` kernel (latent -> fc_input^2 * C, the largest dense layer at
    res100/latent-512 and SURVEY §2.8's second model-axis target) sharded
    row-parallel [latent -> model, features]; every other leaf replicated.

    Row (input-dim) parallelism — the same layout as the cognitive fc1 — is
    deliberate: each model-shard computes a partial matmul and XLA inserts
    one psum, leaving the activation REPLICATED before the NHWC reshape.
    The column-parallel alternative (features -> model) propagates the
    sharding through the reshape onto a small spatial axis, sending the
    first DecoderBlock into GSPMD's spatially-partitioned *lhs-dilated*
    conv path — measured numerically divergent weight grads on the 2-way
    CPU mesh (wrong, not just slow), see tests/test_mesh.py."""
    return _tp_specs(params, "Dense_0")


def _decoder_tp_place(tree: Any, mesh: Mesh) -> Any:
    """Leaf placement mirroring :func:`decoder_param_specs` (params AND
    optimizer moments, which share the tree structure)."""
    return _tp_place(tree, mesh, "Dense_0")


def shard_state(state: Any, mesh: Mesh, voxel_tp: bool = False,
                decoder_tp: bool = False) -> Any:
    """Place a full TrainState: params/opt-state/batch-stats replicated,
    except

      * with ``voxel_tp``: the cognitive encoder's fc1 kernel (and optimizer
        moments) shard [voxels -> model, hidden] (row/input parallel, psum);
      * with ``decoder_tp``: the shared Decoder's projection kernel (and
        moments) shard [latent -> model, features] (row/input parallel,
        psum — see :func:`decoder_param_specs` for why not column).

    Both compose with data parallelism on the ``data`` axis and with each
    other (stage-2/3 cognitive runs can shard fc1 AND the decoder fc)."""
    special = {"encoder": _voxel_tp_place if voxel_tp else None,
               "decoder": _decoder_tp_place if decoder_tp else None}
    if not any(special.values()):
        return jax.device_put(state, replicated(mesh))
    params = dict(state.params)
    opt = dict(state.opt_state)
    for k in params:
        fn = special.get(k)
        params[k] = (fn(params[k], mesh) if fn
                     else jax.device_put(params[k], replicated(mesh)))
    for k in opt:
        fn = special.get(k)
        opt[k] = (fn(opt[k], mesh) if fn
                  else jax.device_put(opt[k], replicated(mesh)))
    return state.replace(
        params=params,
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_state=opt,
        step=jax.device_put(state.step, replicated(mesh)))
