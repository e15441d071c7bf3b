"""ICI-mesh data parallelism.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(reference train.py:497,145-152): replicate the module, scatter the batch
over CUDA streams, gather outputs, reduce grads onto device 0, with
per-replica (unsynced) BatchNorm stats (SURVEY.md section 5.8).

The TPU-native equivalent here:

* one ``jax.sharding.Mesh`` over the chips, axes ('data',) by default, or
  ('dcn', 'data') for multi-host (slice the DCN axis across hosts, batch
  within a host over ICI);
* params/optimizer state replicated, the batch sharded on 'data';
* gradient all-reduce is inserted by XLA SPMD (replacing DataParallel's
  gather-to-device-0 with a ``psum`` riding the ICI torus);
* two BatchNorm modes:
    - sync_bn=True (default): global-jit semantics -- BN statistics are
      computed over the GLOBAL batch. Mathematically the "correct" sync-BN.
    - sync_bn=False: reference-faithful per-replica stats via ``shard_map``
      (each shard normalizes with its local batch; gradients are averaged
      with ``lax.pmean``, matching DataParallel's mean-reduced grads).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.optim import set_learning_rate
from ..train.state import TrainState

DATA_AXIS = "data"
DCN_AXIS = "dcn"
SPATIAL_AXIS = "spatial"


def create_mesh(num_devices: Optional[int] = None,
                devices: Optional[Sequence] = None,
                axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def create_mesh_multihost(dcn_size: Optional[int] = None,
                          devices: Optional[Sequence] = None,
                          axis_names: Tuple[str, str] = (DCN_AXIS, DATA_AXIS)
                          ) -> Mesh:
    """Two-level ('dcn', 'data') mesh for multi-host data parallelism.

    The slow DCN (inter-host network) axis is the OUTER mesh dim and the
    fast ICI axis the inner one, so XLA's gradient all-reduce decomposes
    into reduce-scatter/all-gather riding ICI within a host plus a single
    small cross-host exchange per host group — collectives ride ICI, not
    DCN (SURVEY.md section 5.8). On a real multi-host slice, dcn_size
    defaults to ``jax.process_count()``; on a single host pass it
    explicitly to shape the hierarchy (e.g. tests fake 2 hosts x 4 chips).
    """
    if devices is None:
        devices = jax.devices()
    if dcn_size is None:
        dcn_size = max(jax.process_count(), 1)
    n = len(devices)
    if n % dcn_size:
        raise ValueError(f"{n} devices not divisible by dcn={dcn_size}")
    grid = np.asarray(devices).reshape(dcn_size, n // dcn_size)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Batch sharded over every mesh axis (data, or (dcn, data))."""
    if SPATIAL_AXIS in mesh.axis_names:
        return spatial_batch_sharding(mesh)
    if len(mesh.axis_names) > 1:
        return NamedSharding(mesh, P(tuple(mesh.axis_names)))
    return NamedSharding(mesh, P(axis_name))


def check_spatial_height(height: int, spatial_size: int,
                         n_downsamples: int = 5) -> None:
    """Refuse image heights whose downsampled stages go off the spatial
    grid.

    Every stage of a k3-s2-p1 conv chain (H -> ceil(H/2), n_downsamples
    times for STDC's stride-32 pyramid) must keep whole shard-aligned
    rows: once any stage's height is not divisible by the spatial axis,
    XLA SPMD falls into "involuntary full rematerialization" resharding
    (upstream Shardy bug b/433785288) and the BACKWARD pass returns
    numerically divergent gradients (measured ~60x the gradient scale;
    fp-exact when shard-aligned -- tests/test_parallel.py::
    test_spatial_mesh_da_step_matches_unsharded). Called by the CLI's
    build_mesh; library users of create_mesh_spatial should call it with
    their model's downsample count.
    """
    rows = height
    for i in range(n_downsamples + 1):
        if rows % spatial_size:
            raise ValueError(
                f"image height {height} is not spatially shardable over "
                f"{spatial_size} devices: the stride-{2 ** i} stage has "
                f"{rows} rows (not divisible by {spatial_size}); "
                "sub-shard stages give wrong gradients under XLA SPMD "
                "(involuntary-remat resharding)")
        rows = -(-rows // 2)


def create_mesh_spatial(data_size: int, spatial_size: int,
                        devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'spatial') mesh: batch x image-height decomposition.

    The CNN analogue of sequence parallelism (SURVEY.md section 2.3): the
    H dimension of NHWC activations is sharded over the 'spatial' axis
    and XLA SPMD inserts the conv halo exchanges automatically. Lets a
    single large image (or a batch smaller than the chip count) scale
    past one chip's HBM/compute.
    """
    if devices is None:
        devices = jax.devices()
    n = data_size * spatial_size
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data_size, spatial_size)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharded on 'data', H sharded on 'spatial'."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """device_put host arrays with the batch dim split over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state, mesh: Mesh):
    """Replicate a train state (or any pytree) across the mesh.

    Goes through a jitted identity rather than ``device_put`` so the
    result owns FRESH buffers: ``device_put`` aliases the source buffer
    for the shard living on the origin device, and a later
    ``donate_argnums`` train step would then delete the caller's
    original arrays out from under it.
    """
    sh = replicated_sharding(mesh)
    shardings = jax.tree.map(lambda _: sh, state)
    return jax.jit(lambda x: x, out_shardings=shardings)(state)


def make_sharded_train_step(model, optimizer, mesh: Mesh, *,
                            sync_bn: bool = True,
                            ohem=None,
                            ignore_index: int = 255,
                            axis_name: str = DATA_AXIS):
    """Data-parallel supervised train step over the mesh.

    sync_bn=True  -> jit + shardings; XLA SPMD computes global-batch BN
                     stats and inserts the gradient psum.
    sync_bn=False -> shard_map per-replica step (DataParallel-faithful BN),
                     grads pmean'd across 'data'.

    The loss is the shared supervised composition
    (train.supervised.make_supervised_loss): same OHEM option and the
    same fused upsample+CE TPU path as the single-device step. In
    per-replica mode OHEM's top-k runs per shard -- the
    DataParallel-faithful reading, since torch would compute the loss
    per replica too.
    """
    from ..train.supervised import make_supervised_loss

    loss_and_stats = make_supervised_loss(model, ohem=ohem,
                                          ignore_index=ignore_index)

    def apply_updates(state, grads, loss, new_stats, lr):
        opt_state = set_learning_rate(state.opt_state, lr)
        updates, new_opt_state = optimizer.update(grads, opt_state,
                                                  state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return TrainState(params=new_params, batch_stats=new_stats,
                          opt_state=new_opt_state,
                          step=state.step + 1), loss

    if sync_bn:
        def step(state, images, labels, lr):
            (loss, new_stats), grads = jax.value_and_grad(
                loss_and_stats, has_aux=True)(
                    state.params, state.batch_stats, images, labels)
            return apply_updates(state, grads, loss, new_stats, lr)

        batch_sh = batch_sharding(mesh, axis_name)
        repl = replicated_sharding(mesh)
        return jax.jit(
            step,
            in_shardings=(repl, batch_sh, batch_sh, None),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    # ---- per-replica BN mode (reference-faithful) -----------------------
    # batch_stats carry a leading per-device axis (see tile_batch_stats);
    # each shard normalizes with its own running stats, exactly like the
    # reference's unsynced DataParallel BN. Gradients are pmean'd (torch
    # DataParallel reduces grads across replicas). Export takes shard 0,
    # matching torch saving device 0's module.
    def local_step(params, tiled_stats, opt_state, step_counter,
                   images, labels, lr):
        local_stats = jax.tree.map(lambda x: x[0], tiled_stats)
        (loss, new_stats), grads = jax.value_and_grad(
            loss_and_stats, has_aux=True)(params, local_stats, images,
                                          labels)
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        opt_state = set_learning_rate(opt_state, lr)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p + u, params, updates)
        new_tiled = jax.tree.map(lambda x: x[None], new_stats)
        return new_params, new_tiled, new_opt_state, step_counter + 1, loss

    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P(), P(axis_name), P(axis_name),
                  P()),
        out_specs=(P(), P(axis_name), P(), P(), P()),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, labels, lr):
        new_params, new_tiled, new_opt, new_step, loss = smapped(
            state.params, state.batch_stats, state.opt_state, state.step,
            images, labels, lr)
        return TrainState(params=new_params, batch_stats=new_tiled,
                          opt_state=new_opt, step=new_step), loss

    return step


def make_sharded_da_step(g_model, d_model, g_optimizer, d_optimizer,
                         mesh: Mesh, *, lambda_adv: float,
                         ignore_index: int = 255, d_head: int = 0,
                         sync_bn: bool = True,
                         axis_name: str = DATA_AXIS,
                         step_mode: str = "interleaved"):
    """Data-parallel adversarial-DA 4-phase step over the mesh.

    sync_bn=True  -> the plain jitted step (train.adversarial.make_da_step)
                     with replicated states + sharded batches: XLA SPMD
                     computes global-batch BN and inserts the grad psums.
    sync_bn=False -> DataParallel-faithful per-replica BN via shard_map:
                     G and D running stats carry a leading device axis
                     (per_replica_state), every phase normalizes with its
                     LOCAL shard stats, and each phase's gradients are
                     pmean'd -- the reference's nn.DataParallel semantics
                     (train.py:145-152) where BN never syncs but grads
                     reduce. Export/eval take shard 0 (untile), matching
                     torch saving device 0's module.
    """
    from ..train.adversarial import make_da_step

    if sync_bn:
        # replicated states + mesh-sharded batches: the plain jitted step
        # is already the right program -- XLA SPMD propagates the batch
        # sharding and inserts the gradient psums (what cli.main runs
        # today for multi-device DA)
        return make_da_step(g_model, d_model, g_optimizer, d_optimizer,
                            lambda_adv=lambda_adv,
                            ignore_index=ignore_index, d_head=d_head,
                            step_mode=step_mode)

    raw = make_da_step(g_model, d_model, g_optimizer, d_optimizer,
                       lambda_adv=lambda_adv, ignore_index=ignore_index,
                       d_head=d_head, pmean_axis=axis_name, jit=False,
                       step_mode=step_mode)

    def local_step(g_state, d_state, src_i, src_l, tgt_i, lr_g, lr_d):
        untile = functools.partial(jax.tree.map, lambda x: x[0])
        g_local = g_state.replace(batch_stats=untile(g_state.batch_stats))
        d_local = d_state.replace(batch_stats=untile(d_state.batch_stats))
        new_g, new_d, metrics = raw(g_local, d_local, src_i, src_l, tgt_i,
                                    lr_g, lr_d)
        retile = functools.partial(jax.tree.map, lambda x: x[None])
        return (new_g.replace(batch_stats=retile(new_g.batch_stats)),
                new_d.replace(batch_stats=retile(new_d.batch_stats)),
                metrics)

    state_spec = TrainState(params=P(), batch_stats=P(axis_name),
                            opt_state=P(), step=P())
    smapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, state_spec, P(axis_name), P(axis_name),
                  P(axis_name), P(), P()),
        out_specs=(state_spec, state_spec, P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=(0, 1))


def tile_batch_stats(batch_stats, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Per-replica BN mode: give every replica its own copy of the running
    stats by tiling a leading device axis and sharding it."""
    n = mesh.shape[axis_name]
    sh = NamedSharding(mesh, P(axis_name))
    tile = jax.jit(
        lambda t: jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n,) + x.shape), t),
        out_shardings=jax.tree.map(lambda _: sh, batch_stats))
    return tile(batch_stats)


def untile_state(state):
    """Shard-0 view of a per-replica-BN train state -- the convention for
    eval/checkpoint export (torch DataParallel saves device 0's module)."""
    return state.replace(batch_stats=jax.tree.map(lambda x: x[0],
                                                  state.batch_stats))


def check_per_replica_batch(batch_size: int, data_div: int) -> None:
    """shard_map shards the batch: refuse ragged per-shard batches."""
    if batch_size % data_div:
        raise SystemExit(
            f"--sync_bn False needs --batch_size {batch_size} divisible "
            f"by the data-mesh size {data_div} (shard_map shards the "
            "batch)")


def per_replica_state(state, mesh: Mesh, axis_name: str = DATA_AXIS):
    """State for the per-replica-BN (``sync_bn=False``) step: params and
    opt_state replicated, batch_stats tiled with a leading device axis.

    Goes through ``replicate_state`` so every buffer is FRESH — building
    this with raw ``device_put`` aliases the origin-device shard onto the
    caller's arrays, and the step's ``donate_argnums`` would delete them
    out from under the caller (the ``replicate_state`` footgun).
    """
    tiled = tile_batch_stats(state.batch_stats, mesh, axis_name)
    state = replicate_state(state.replace(batch_stats={}), mesh)
    return state.replace(batch_stats=tiled)
