"""CLI entry point -- the reference train.py's three run modes on TPU.

Mode dispatch (reference train.py:511-519):
  --domain_shift True      -> load checkpoint, evaluate on Cityscapes val
  --domain_adaptation True -> adversarial GTA5->Cityscapes training
  otherwise                -> supervised training

Run:  python -m dasemanticsegmentationaml_tpu.cli --dataset GTAV ...
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from .data import (CityScapes, GtaV, Loader, prepare_batch, train_val_split)
from .data.datasets import Subset
from .models import BiSeNet, build_discriminator
from .models.bisenet import init_bisenet_variables, unused_param_mask
from .parallel import (create_mesh, batch_sharding, replicate_state,
                       shard_batch)
from .train import create_train_state, evaluate, train, train_da
from .train.optim import make_optimizer
from .utils import torch_io
from .utils.config import parse_args
from .utils.logging_util import JsonlLogger, Profiler, make_writer
from .utils import orbax_io


def _dtype(args):
    return jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32


def build_model(args):
    return BiSeNet(n_classes=args.num_classes,
                   backbone_name=args.backbone
                   if args.backbone not in ("CatmodelSmall",)
                   else "STDCNet813",
                   use_conv_last=args.use_conv_last,
                   dtype=_dtype(args))


def load_pretrain(variables, pretrain_path: str):
    """Reference checkpoint dispatch: backbone ``.tar`` iff 'STDCNet' in the
    path (stdcnet.py:141-144, keys live under the raw backbone namespace and
    must be prefixed into cp.backbone); full net iff '.pth' in the path
    (model_stages.py:224-227)."""
    if not pretrain_path:
        return variables
    # FULL-path 'STDCNet' match like the reference (stdcnet.py:141) — a
    # basename-only match silently loaded NOTHING for paths like
    # .../STDCNet813/model.tar. A path matching BOTH rules (e.g.
    # STDCNet813_best.pth) routes to the full-net loader: the reference
    # would attempt both and crash in the backbone branch (no
    # 'state_dict' key in a full .pth).
    if "STDCNet" in pretrain_path and ".pth" not in pretrain_path:
        obj = torch_io.read_torch_checkpoint(pretrain_path)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        prefixed = {f"cp.backbone.{torch_io.strip_module_prefix(k)}": v
                    for k, v in obj.items()}
        new_vars, report = torch_io.load_into_variables(variables, prefixed)
        print(f"i'm using pre-trained: {pretrain_path} "
              f"({len(report['loaded'])} tensors)")
        if not report["loaded"]:
            raise SystemExit(
                f"--pretrain_path {pretrain_path}: ZERO tensors matched "
                f"the backbone namespace — wrong checkpoint kind?")
        return new_vars
    if ".pth" in pretrain_path:
        new_vars, report = torch_io.load_pretrained(variables, pretrain_path)
        print(f"i'm using pre-trained net: {pretrain_path} "
              f"({len(report['loaded'])} tensors)")
        if not report["loaded"]:
            raise SystemExit(
                f"--pretrain_path {pretrain_path}: ZERO tensors matched "
                f"the model — wrong checkpoint kind?")
        return new_vars
    print(f"--pretrain_path {pretrain_path}: matches neither the "
          f"'STDCNet' backbone rule nor '.pth' — NOT loaded (the "
          f"reference would random-init too, stdcnet.py:141-144)")
    return variables


def make_checkpoint_fn(args):
    """Persist reference-compatible .pth + orbax full state.

    Besides the per-name orbax save, a stable alias ('latest' for the main
    model, 'latest_D1' for the discriminator) plus an EPOCH marker is
    written so --resume can restore without knowing the reference's
    DA naming scheme (GTA5_<step>[_D1]).
    """
    save_dir = args.save_model_path or "./checkpoints"
    orbax_dir = os.path.join(save_dir, "orbax")

    def checkpoint_fn(state, name, dataparallel_prefix=False, model=None,
                      epoch=None):
        # Multi-process: the plain-file writes (.pth, EPOCH marker) are
        # process-0-only, but EVERY rank must enter the orbax saves —
        # orbax synchronizes processes internally (a rank-0-only call
        # deadlocks/mismatches its sync_global_processes barrier) and
        # writes replicated arrays from the primary only. save_dir must
        # therefore be the same (shared) path on every rank.
        primary = jax.process_index() == 0
        if primary:
            os.makedirs(save_dir, exist_ok=True)
            variables = {"params": jax.device_get(state.params),
                         "batch_stats": jax.device_get(state.batch_stats)}
            torch_state = torch_io.variables_to_torch_state(variables)
            if dataparallel_prefix:  # train.py:282-283 saves module.*
                torch_state = {f"module.{k}": v
                               for k, v in torch_state.items()}
            torch_io.write_torch_checkpoint(
                os.path.join(save_dir, f"{name}.pth"), torch_state)
        host_state = jax.device_get(state)
        orbax_io.save_train_state(orbax_dir, name, host_state)
        alias = "latest_D1" if model == "discriminator" else "latest"
        if name != alias:
            orbax_io.save_train_state(orbax_dir, alias, host_state)
        if epoch is not None and primary:
            orbax_io.write_epoch_marker(orbax_dir, epoch)

    return checkpoint_fn


def maybe_resume(args, state, alias="latest"):
    """--resume <orbax dir>: restore full train state + epoch counter.

    Returns (state, epoch_start_i). True resume is a capability the
    reference lacks entirely (SURVEY.md section 5.4: it saves model-only
    state dicts and its --epoch_start_i flag is dead).
    """
    if not args.resume:
        return state, args.epoch_start_i
    if not os.path.isdir(os.path.join(args.resume, alias)):
        have = sorted(d for d in os.listdir(args.resume)
                      if os.path.isdir(os.path.join(args.resume, d))) \
            if os.path.isdir(args.resume) else []
        raise SystemExit(
            f"--resume: no '{alias}' state under {args.resume} "
            f"(found: {have or 'nothing'}); the run died before its "
            f"first checkpoint epoch")
    restored = orbax_io.restore_train_state(args.resume, alias,
                                            template=jax.device_get(state))
    epoch = orbax_io.latest_epoch_marker(args.resume)
    start = (epoch + 1) if epoch is not None else args.epoch_start_i
    print(f"resumed from {args.resume}/{alias} at epoch {start}")
    return restored, start


def actual_hw(args):
    """The (H, W) of the tensors the pipeline actually produces.

    With --faithful_resize True (default) the reference's transposed
    PIL.resize call is reproduced (transforms_host.pil_size_for), so the
    tensor height is args.crop_width and vice versa."""
    if args.faithful_resize:
        return args.crop_width, args.crop_height
    return args.crop_height, args.crop_width


def build_mesh(args):
    """Mesh from the CLI flags: plain data mesh, or ('data','spatial')
    when --spatial_devices shards image height (XLA SPMD inserts the conv
    halo exchanges — lets a batch smaller than the chip count, or a
    single huge image, scale past one chip; SURVEY.md section 2.3)."""
    if jax.process_count() > 1:
        # multi-process: ('dcn','data') with one dcn row per process, so
        # the gradient all-reduce rides ICI within a host and crosses the
        # inter-host network once (parallel/mesh.create_mesh_multihost)
        if args.spatial_devices > 1:
            raise SystemExit("--spatial_devices is single-process only")
        if args.num_devices not in (None, len(jax.devices())):
            raise SystemExit("--num_devices cannot subset a multi-process "
                             "mesh (every process's devices participate)")
        if not args.sync_bn:
            raise SystemExit("--sync_bn False (per-replica BN shard_map) "
                             "is single-process only; multi-process runs "
                             "use global-batch sync BN")
        from .parallel import create_mesh_multihost

        return create_mesh_multihost()
    if args.spatial_devices <= 1:
        return create_mesh(args.num_devices)
    from .parallel import create_mesh_spatial

    total = args.num_devices or len(jax.devices())
    if total % args.spatial_devices:
        raise SystemExit(f"--spatial_devices {args.spatial_devices} "
                         f"must divide the device count {total}")
    from .parallel.mesh import check_spatial_height

    try:
        # EVERY stage of the stride-32 pyramid must keep shard-aligned
        # rows, else XLA SPMD returns wrong gradients (see the helper).
        # Validate the height the tensors will actually have: under
        # --faithful_resize (default) that is crop_width, not crop_height.
        check_spatial_height(actual_hw(args)[0], args.spatial_devices)
    except ValueError as e:
        raise SystemExit(str(e))
    if not args.sync_bn:
        raise SystemExit("--sync_bn False (per-replica BN) is not "
                         "supported with --spatial_devices")
    return create_mesh_spatial(total // args.spatial_devices,
                               args.spatial_devices)


def resolve_host_augment(aug_type, host_augment, backend,
                         fast_geometry=False, host_cores=None):
    """Where does --aug_type run? Returns (host: bool, note: str|None).

    The reference augments on the host in DataLoader workers (reference
    dataset/GTAV.py:32-59, train.py:465-470); our default is device
    kernels. The two GEOMETRIC menus are gather-latency-bound on the
    TPU's serial gather engine — measured 11.9 ms/img (H-RP) / 8.5
    (B-GS-R) vs a 1.53 ms/img DA train step (tools/probe_warp.py,
    tools/bench_aug.py) — so 'auto' (--host_augment unset) routes them
    to the host path (data/host_augment.py, bit-exact Pillow/native-C++
    math) on TPU backends, EXCEPT when:
      * --fast_device_geometry already covers it (B-GS-R's 3-shear,
        1.07 ms/img — the explicitly-requested device path wins), or
      * the host is too small to beat the device warp (native costs
        ~29-39 ms/img/core p=0.5, tools/bench_host_aug.py, so <4 cores
        would CAP the loader below the device path it replaced).
    An EXPLICIT device request still gets the measured-cost warning
    instead of a silent 6-8x slowdown."""
    if aug_type is None:
        return False, None
    geometric = aug_type in ("H-RP", "B-GS-R")
    if not (geometric and backend == "tpu"):
        return bool(host_augment), None
    if fast_geometry and aug_type == "B-GS-R":
        # the 3-shear device rotation was explicitly requested and is
        # cheap (1.07 ms/img) — auto never overrides it to host
        if host_augment:
            return True, ("--host_augment True overrides "
                          "--fast_device_geometry for B-GS-R (the menu "
                          "runs on the host; the device flag is inert)")
        return False, None
    if host_augment is None:  # auto
        # callers pass the EFFECTIVE worker parallelism (min of cores
        # and --num_workers — HostAugment runs inside the Loader's
        # decode workers, so --num_workers is the real ceiling)
        cores = host_cores if host_cores is not None \
            else (os.cpu_count() or 1)
        if cores >= 4:
            return True, (
                f"--aug_type {aug_type}: geometric menus are gather-"
                f"latency-bound on TPU (8.5-11.9 ms/img measured, "
                f"tools/probe_warp.py) — augmenting on the HOST "
                f"({cores} effective aug workers; --host_augment False "
                f"forces the device kernels)")
        # few-worker host: the host path would cap the loader BELOW the
        # device warp (~29-39 ms/img/core vs 8.5-11.9 ms on device)
        extra = (" or --fast_device_geometry True (3-shear, 1.07 "
                 "ms/img, ±1 px envelope)" if aug_type == "B-GS-R"
                 else "")
        return False, (
            f"--aug_type {aug_type}: staying on DEVICE — only {cores} "
            f"effective aug worker(s) (min of host cores and "
            f"--num_workers), too few to beat the device warp "
            f"(~29-39 ms/img/core on host vs 8.5-11.9 ms on device); "
            f"with more cores/workers use --host_augment True{extra}")
    if not host_augment:
        if aug_type == "B-GS-R":
            return False, (
                "WARNING: --aug_type B-GS-R on device: the rotation "
                "gather costs ~8.5 ms/img on TPU (vs a 1.53 ms/img DA "
                "step) — consider --host_augment True, or "
                "--fast_device_geometry True (3-shear, 1.07 ms/img, "
                "±1 px envelope)")
        return False, (
            "WARNING: --aug_type H-RP on device: the perspective warp "
            "gather costs ~11.9 ms/img on TPU (vs a 1.53 ms/img DA "
            "step, tools/probe_warp.py) — consider --host_augment True")
    return True, None


def main(argv=None, report_fn=None):
    """report_fn(epoch, miou): optional per-validation-epoch hook, used by
    hpo.trial to forward intermediate results to the tuner (reference
    train_nni.py:194)."""
    args = parse_args(argv)
    dtype = _dtype(args)
    n_classes = args.num_classes

    # multi-process wiring must precede any other device use (the
    # reference's DataParallel, train.py:497, scaled past one host)
    from .parallel.distributed import initialize as _dist_init
    from .parallel.distributed import local_batch_size

    _dist_init(args.coordinator_address, args.num_processes,
               args.process_id)
    proc_id, proc_n = jax.process_index(), jax.process_count()
    if proc_n > 1:
        local_batch_size(args.batch_size)  # divisibility guard
        print(f"multi-process: rank {proc_id}/{proc_n}, "
              f"{jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    mesh = build_mesh(args)
    n_dev = mesh.devices.size
    if proc_n > 1 and args.batch_size % n_dev:
        raise SystemExit(
            f"multi-process: --batch_size {args.batch_size} (the GLOBAL "
            f"batch) must be divisible by the {n_dev}-device mesh")
    data_div = mesh.shape.get("data", n_dev)
    batch_sh = batch_sharding(mesh) if n_dev > 1 else None

    # ---- datasets (reference train.py:444-491) ---------------------------
    # Eval-only mode needs no train split (the reference builds one anyway
    # and so requires images/train to exist even for --domain_shift; we
    # don't inherit that requirement).
    def maybe_cache(ds):
        """Wrap a scan dataset in the packed decoded-sample cache
        (--data_cache; data/cache.py) — decode once, memmap thereafter."""
        if ds is None or not args.data_cache:
            return ds
        from .data.cache import open_or_build
        # ranks > 0 wait up to an hour for rank 0's publish on a shared
        # FS (falling back to building their own copy if it never lands)
        return open_or_build(ds, args.data_cache,
                             num_workers=args.num_workers,
                             process_id=proc_id,
                             wait_for_publish=3600.0 if proc_n > 1 else 0.0)

    # effective host-aug parallelism: the Loader's worker count, capped
    # by the machine (single-process). Multi-process runs use the FLAG
    # value alone: it is identical on every rank, so all ranks resolve
    # the same routing and trace the same program — a per-rank
    # os.cpu_count() could diverge on heterogeneous hosts and hang the
    # multi-controller collectives (round-5 review finding).
    _workers = max(1, args.num_workers)
    host_aug_cores = _workers if proc_n > 1 \
        else min(os.cpu_count() or 1, _workers)
    host_aug, host_aug_note = resolve_host_augment(
        args.aug_type, args.host_augment, jax.default_backend(),
        fast_geometry=args.fast_device_geometry,
        host_cores=host_aug_cores)
    if host_aug_note and proc_id == 0:
        print(host_aug_note)

    def maybe_host_augment(ds):
        """--host_augment routing: wrap a TRAIN dataset so the menu runs
        in the Loader's decode workers (post-cache: decode once,
        re-augment every epoch)."""
        if ds is None or not host_aug:
            return ds
        from .data.host_augment import HostAugment
        return HostAugment(ds, args.aug_type, seed=args.seed,
                           augment_labels=args.augment_labels)

    if args.dataset == "GTAV":
        dataset = maybe_cache(
            GtaV(args.root, args.aug_type, args.crop_height,
                 args.crop_width, faithful_resize=args.faithful_resize))
        train_idx, val_idx = train_val_split(len(dataset))
        train_ds = maybe_host_augment(Subset(dataset, train_idx))
        val_ds = Subset(dataset, val_idx)
        remap_train = remap_val = True
        aug_train = None if host_aug else args.aug_type
    else:
        # neither eval-only mode nor DA (which trains on --root_source/
        # --root_target) uses a train split from --root
        train_ds = None if (args.domain_shift or args.domain_adaptation) \
            else maybe_cache(CityScapes(
                "train", args.root, args.crop_height, args.crop_width,
                faithful_resize=args.faithful_resize))
        val_ds = maybe_cache(
            CityScapes("val", args.root, args.crop_height, args.crop_width,
                       faithful_resize=args.faithful_resize))
        remap_train = remap_val = False
        aug_train = None

    # train loaders are process-sharded (each rank loads its contiguous
    # slice of the global batch). loader_val stays FULL on every rank
    # (int8 calibration and export verification must see identical data
    # everywhere); eval itself uses loader_val_eval — by default a
    # strided per-rank shard of the val set whose integer confusion
    # counts are summed across processes (evaluate cross_process_sum:
    # bit-identical mIoU at 1/process_count the eval wall-clock).
    loader_train = None if train_ds is None else Loader(
        train_ds, args.batch_size, shuffle=True, seed=args.seed,
        num_workers=args.num_workers, process_id=proc_id,
        process_count=proc_n, worker_timeout=args.worker_timeout)
    loader_val = Loader(val_ds, args.eval_batch_size, shuffle=False,
                        drop_last=False, num_workers=args.num_workers,
                        worker_timeout=args.worker_timeout)
    eval_sharded = proc_n > 1 and args.eval_process_shard
    loader_val_eval = Loader(
        Subset(val_ds, list(range(proc_id, len(val_ds), proc_n))),
        args.eval_batch_size, shuffle=False, drop_last=False,
        num_workers=args.num_workers,
        worker_timeout=args.worker_timeout) if eval_sharded else loader_val

    # ---- model ------------------------------------------------------------
    model = build_model(args)
    h_act, w_act = actual_hw(args)
    variables = init_bisenet_variables(
        model, jax.random.PRNGKey(args.seed), (1, h_act, w_act, 3))
    variables = load_pretrain(variables, args.pretrain_path)

    # ---- prepare fns -------------------------------------------------------
    rng = jax.random.PRNGKey(args.seed)

    def make_prepare(aug_type, remap, sharded=True):
        def prepare(batch, epoch=0, it=0):
            images, labels = batch
            if sharded and proc_n > 1:
                # multi-process: each rank holds its local slice; build
                # the global batch array (no cross-host data movement —
                # rank r's rows are rank r's shards)
                from .parallel.distributed import global_batch_arrays

                images, labels = global_batch_arrays(batch_sh, images,
                                                     labels)
            # shard only batches that divide the mesh's data axis (e.g.
            # the val loader's drop_last=False tail / eval_batch_size=1
            # stay single-device)
            elif sharded and batch_sh is not None \
                    and images.shape[0] % data_div == 0:
                images, labels = shard_batch((images, labels), mesh)
            key = jax.random.fold_in(jax.random.fold_in(rng, epoch), it) \
                if aug_type else None
            return prepare_batch(jnp.asarray(images), jnp.asarray(labels),
                                 key=key, aug_type=aug_type,
                                 augment_labels=args.augment_labels,
                                 remap=remap, dtype=dtype,
                                 fast_geometry=args.fast_device_geometry)
        return prepare

    prepare_train = make_prepare(aug_train, remap_train)
    prepare_val = make_prepare(None, remap_val, sharded=(proc_n == 1))

    def evaluate_fn_of(state):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if proc_n > 1:
            # eval runs process-LOCALLY (each rank over its val shard, or
            # the full set redundantly with --eval_process_shard False):
            # pull the globally replicated params to host so the eval jit
            # doesn't mix global-mesh arrays with local batches
            variables = jax.device_get(variables)
        result = evaluate(
            model, variables,
            loader_val_eval, n_classes,
            prepare=lambda b: prepare_val(b),
            use_fused_kernel=(args.use_fused_eval
                              and jax.default_backend() == "tpu"),
            scan_window=args.eval_scan_window,
            cross_process_sum=eval_sharded,
            fetch_timeout=args.fetch_timeout)
        if proc_n > 1:
            # the best-mIoU checkpoint decision must not diverge: sharded
            # eval sums exact integer counts (identical by construction),
            # redundant eval sees identical data with identical params
            from .parallel.distributed import assert_same_across_processes

            assert_same_across_processes(result[1], "val mIoU")
        return result

    # rank-0-only like the .pth/EPOCH writes: every rank creating a
    # writer on one host appends interleaved duplicate events into the
    # same (second-resolution-named) events file
    writer = make_writer(args.tensorboard) if proc_id == 0 else None
    logger = JsonlLogger(args.jsonl_log)
    profiler = Profiler(args.profile_dir) if args.profile_dir else None
    checkpoint_fn = make_checkpoint_fn(args)

    if args.domain_shift:
        # eval-only mode (reference train.py:511,519)
        eval_model = model
        eval_vars = {"params": variables["params"],
                     "batch_stats": variables.get("batch_stats", {})}
        if args.quantize_int8:
            # opt-in int8 PTQ (ops/quantize.py): calibrate activation
            # scales on the first --calib_batches val batches (eval mode),
            # fold BN, and run the s8xs8->s32 inference path.
            import itertools

            from .ops.quantize import PRESET_FILTERS, quantize_model
            calib = [prepare_val(b)[0] for b in
                     itertools.islice(iter(loader_val), args.calib_batches)]
            eval_model, eval_vars = quantize_model(
                eval_model, eval_vars, calib,
                filter_fn=PRESET_FILTERS[args.quantize_filter],
                clip=args.quantize_clip)
        if args.export_model:
            # serving artifact: frozen weights + eval forward, symbolic
            # batch (utils/export.py). With the fused eval kernel active
            # the artifact embeds it (tpu-only, the measured-best path);
            # otherwise it lowers portably for cpu+tpu.
            from .utils.export import (export_inference,
                                       export_inference_sharded)
            fused = (args.use_fused_eval
                     and jax.default_backend() == "tpu")
            # export at the orientation the pipeline actually produces
            # (under --faithful_resize the tensors are crop_width tall),
            # so the artifact serves exactly what the printed mIoU
            # certified
            if args.export_batches and getattr(args, "export_spatial",
                                               False):
                # the bundle route only builds batch-sharded ('data')
                # programs; silently shipping the wrong (throughput)
                # sharding when the user asked for the height-sharded
                # latency artifact would be a trap
                raise SystemExit(
                    "--export_batches and --export_spatial cannot be "
                    "combined: the bundle route has no spatial-sharded "
                    "program variant. Export them as two artifacts.")
            if args.export_batches:
                # multi-batch bundle: one concrete-batch program per
                # requested size in one zip (serve.py picks the best fit
                # per chunk) — lifts the fused/pod routes' single-batch
                # pin (utils/export.py::export_inference_bundle)
                import numpy as np

                from jax.sharding import Mesh

                from .utils.export import export_inference_bundle
                batches = [int(x) for x in
                           args.export_batches.split(",") if x]
                # export_mesh, NOT `mesh`: the training/eval mesh local
                # is still read by the prepare closures for the post-
                # export certifying eval — rebinding it here sharded (or
                # crashed) that eval
                export_mesh = None
                if args.export_devices > 1:
                    devs = jax.devices()
                    if len(devs) < args.export_devices:
                        raise SystemExit(
                            f"--export_devices {args.export_devices} but "
                            f"only {len(devs)} devices visible")
                    export_mesh = Mesh(
                        np.asarray(devs[:args.export_devices]), ("data",))
                progs = export_inference_bundle(
                    eval_model, eval_vars, h_act, w_act, batches,
                    mesh=export_mesh, use_fused_kernel=fused,
                    platforms=None if fused else ("cpu", "tpu"),
                    path=args.export_model)
                exported = progs[max(progs)]
            elif args.export_devices > 1:
                # pod-serving artifact over the first N local devices
                # (the serving host must match the count): batch-sharded
                # throughput artifact, or with --export_spatial the
                # height-sharded LATENCY artifact (any batch, incl. 1)
                import numpy as np

                from jax.sharding import Mesh
                devs = jax.devices()
                if len(devs) < args.export_devices:
                    raise SystemExit(
                        f"--export_devices {args.export_devices} but only "
                        f"{len(devs)} devices visible")
                if args.export_spatial:
                    from .utils.export import export_inference_spatial
                    export_mesh = Mesh(
                        np.asarray(devs[:args.export_devices]),
                        ("spatial",))
                    exported = export_inference_spatial(
                        eval_model, eval_vars, h_act, w_act, export_mesh,
                        platforms=("cpu", "tpu"),
                        path=args.export_model)
                else:
                    export_mesh = Mesh(
                        np.asarray(devs[:args.export_devices]), ("data",))
                    exported = export_inference_sharded(
                        eval_model, eval_vars, h_act, w_act, export_mesh,
                        use_fused_kernel=fused,
                        # the shard_map (fused) route needs a concrete
                        # batch
                        batch=(args.eval_batch_size * args.export_devices
                               if fused else None),
                        platforms=None if fused else ("cpu", "tpu"),
                        path=args.export_model)
            else:
                exported = export_inference(
                    eval_model, eval_vars,
                    h_act, w_act,
                    use_fused_kernel=fused,
                    platforms=None if fused else ("cpu", "tpu"),
                    path=args.export_model)
            # export_inference falls back to the portable program when
            # the kernel can't serve the shape; .platforms is the truth
            kind = ("tpu-only fused" if exported.platforms == ("tpu",)
                    else "cpu+tpu")
            print(f"exported serving artifact: {args.export_model} "
                  f"({os.path.getsize(args.export_model)} bytes, {kind})")
        precision, miou = evaluate(
            eval_model, eval_vars, loader_val_eval, n_classes,
            prepare=lambda b: prepare_val(b),
            use_fused_kernel=(args.use_fused_eval
                              and jax.default_backend() == "tpu"),
            scan_window=args.eval_scan_window,
            cross_process_sum=eval_sharded,
            fetch_timeout=args.fetch_timeout)
        return {"precision": precision, "miou": miou}

    if args.domain_adaptation:
        # reference train_DA (train.py:134-299)
        if args.iter_size > 1:
            # accumulation cannot be grafted onto the 4-phase step: the
            # phase-1 G update must APPLY before phase 2 reuses the
            # activations (train.py:192-262's autograd graph); MultiSteps
            # would defer it and silently change the algorithm
            raise SystemExit("--iter_size > 1 is supervised-only: the "
                             "4-phase DA step applies the phase-1 update "
                             "before phase 2, which gradient accumulation "
                             "would defer")
        source_ds = maybe_host_augment(maybe_cache(
            GtaV(args.root_source, args.aug_type, args.crop_height,
                 args.crop_width, faithful_resize=args.faithful_resize)))
        target_ds = maybe_cache(
            CityScapes("train", args.root_target, args.crop_height,
                       args.crop_width,
                       faithful_resize=args.faithful_resize))
        loader_source = Loader(source_ds, args.batch_size, shuffle=True,
                               seed=args.seed, num_workers=args.num_workers,
                               process_id=proc_id, process_count=proc_n,
                               worker_timeout=args.worker_timeout)
        loader_target = Loader(target_ds, args.batch_size, shuffle=True,
                               seed=args.seed + 1,
                               num_workers=args.num_workers,
                               process_id=proc_id, process_count=proc_n,
                               worker_timeout=args.worker_timeout)

        d_model = build_discriminator(n_classes, args.depthwise,
                                      args.batch_norm, dtype=dtype)
        if args.depthwise:
            print("You are using depthwise separable convolution for the "
                  "discrminator "
                  + ("with" if args.batch_norm else "without")
                  + " batch normalization...")
        d_vars = d_model.init(
            jax.random.PRNGKey(args.seed + 2),
            jnp.zeros((1, h_act, w_act, n_classes)))
        if args.d_pretrain_path:
            from .utils.torch_io import (load_into_variables,
                                         read_torch_checkpoint)
            d_vars, d_report = load_into_variables(
                d_vars, read_torch_checkpoint(args.d_pretrain_path))
            if d_report["not_in_model"] or d_report["shape_mismatch"]:
                raise SystemExit(
                    f"--d_pretrain_path {args.d_pretrain_path}: keys not "
                    f"in this discriminator {d_report['not_in_model']} / "
                    f"shape mismatches {d_report['shape_mismatch']} — "
                    "check --depthwise/--batch_norm match the checkpoint")

        g_opt = make_optimizer("sgd", args.learning_rate,
                               momentum=args.momentum,
                               weight_decay=args.weight_decay,
                               mask=unused_param_mask(
                                   variables["params"],
                                   args.use_conv_last))  # train.py:170-171
        d_opt = make_optimizer("adam", args.learning_rate_D,
                               betas=(0.9, 0.99))  # train.py:172
        g_state = create_train_state(variables, g_opt)
        d_state = create_train_state(d_vars, d_opt)
        g_state, args.epoch_start_i = maybe_resume(args, g_state)
        if args.resume:
            d_state, _ = maybe_resume(args, d_state, alias="latest_D1")
        custom_da_step = None
        untile_da = lambda s: s  # noqa: E731

        if n_dev > 1:
            if args.sync_bn:
                g_state = replicate_state(g_state, mesh)
                d_state = replicate_state(d_state, mesh)
            else:
                # Reference-faithful per-replica BN for BOTH G and D
                # (the reference wraps both in DataParallel,
                # train.py:145-152): local BN stats per shard, grads
                # pmean'd each phase. Export/eval take shard 0.
                from .parallel.mesh import (check_per_replica_batch,
                                            make_sharded_da_step,
                                            per_replica_state,
                                            untile_state)

                check_per_replica_batch(args.batch_size, data_div)
                g_state = per_replica_state(g_state, mesh)
                d_state = per_replica_state(d_state, mesh)
                custom_da_step = make_sharded_da_step(
                    model, d_model, g_opt, d_opt, mesh,
                    lambda_adv=args.lambda_adv_target1,
                    d_head=args.d_head, sync_bn=False,
                    step_mode=args.da_step_mode)
                untile_da = untile_state

        g_state, d_state, max_miou = train_da(
            args, model, d_model, g_state, d_state, g_opt, d_opt,
            loader_source, loader_target,
            prepare_source=make_prepare(None if host_aug else args.aug_type,
                                        True),
            prepare_target=make_prepare(None, False),
            evaluate_fn=lambda s: evaluate_fn_of(untile_da(s)),
            writer=writer, logger=logger,
            checkpoint_fn=(None if checkpoint_fn is None else
                           lambda s, name, **kw: checkpoint_fn(
                               untile_da(s), name, **kw)),
            d_head=args.d_head,
            profiler=profiler, report_fn=report_fn,
            da_step=custom_da_step, step_mode=args.da_step_mode,
            lr_mode=("nni_faithful" if args.nni_faithful_lr
                     else "reference"))
        if profiler is not None:
            profiler.close()
        precision, miou = evaluate_fn_of(untile_da(g_state))
        return {"precision": precision, "miou": miou,
                "max_miou": max_miou}

    # ---- supervised (reference train.py:63-120) ---------------------------
    wd = {"sgd": 1e-4}.get(args.optimizer, 0.0)  # train.py:504 hardcodes 1e-4
    opt = make_optimizer(args.optimizer, args.learning_rate, momentum=0.9,
                         weight_decay=wd,
                         mask=unused_param_mask(variables["params"],
                                                args.use_conv_last))
    if args.iter_size > 1:
        import optax

        opt = optax.MultiSteps(opt, every_k_schedule=args.iter_size)
    state = create_train_state(variables, opt)
    state, args.epoch_start_i = maybe_resume(args, state)
    custom_step = None

    def untile_state(s):
        return s

    if n_dev > 1:
        if args.sync_bn:
            state = replicate_state(state, mesh)
        else:
            # Reference-faithful per-replica BN (DataParallel semantics,
            # reference train.py:497): every replica keeps its own running
            # stats (leading device axis, parallel.per_replica_state)
            # and the shard_map step pmean's the grads. Export/eval take
            # shard 0, matching torch saving device 0's module.
            from .parallel.mesh import (check_per_replica_batch,
                                        make_sharded_train_step,
                                        per_replica_state)
            from .parallel.mesh import untile_state as untile_state_fn

            check_per_replica_batch(args.batch_size, data_div)
            state = per_replica_state(state, mesh)
            custom_step = make_sharded_train_step(model, opt, mesh,
                                                  sync_bn=False,
                                                  ohem=args.ohem)
            untile_state = untile_state_fn

    state, max_miou = train(
        args, model, state, opt, loader_train, loader_val,
        prepare=prepare_train,
        evaluate_fn=lambda s: evaluate_fn_of(untile_state(s)),
        writer=writer, logger=logger,
        checkpoint_fn=(None if checkpoint_fn is None else
                       lambda s, name, **kw: checkpoint_fn(
                           untile_state(s), name, **kw)),
        profiler=profiler, train_step=custom_step, report_fn=report_fn)
    if profiler is not None:
        profiler.close()
    precision, miou = evaluate_fn_of(untile_state(state))
    return {"precision": precision, "miou": miou, "max_miou": max_miou}


def console_main() -> int:
    """Entry point for the ``dseg-train`` console script (pyproject.toml):
    ``main`` returns a metrics dict for programmatic callers, which
    setuptools would misread as a nonzero exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
