"""Serialized serving artifacts for the inference path (jax.export).

The reference "serves" by keeping the torch module code importable and
unpickling state dicts into it (reference model_stages.py:252-258,
train.py:511-519). TPU-native production serving wants an ahead-of-time
artifact instead: ``export_inference`` freezes the trained weights into a
versioned StableHLO module (``jax.export``) that any matching JAX runtime
replays WITHOUT this package's model code on the serving host, and with a
symbolic batch dimension so one artifact serves any batch size.

The exported computation is the eval hot path (reference train.py:36-38):
optional uint8 -> ImageNet-normalize preprocessing, model forward,
bilinear align_corners upsample to input resolution, argmax -> int32
label map. The upsample is the tap-matrix matmul formulation
(ops/resize.py) -- pure XLA, no gathers, no Pallas custom calls -- so the
artifact lowers for both 'tpu' and 'cpu' and stays free of
platform-pinned custom calls. It composes with the opt-in int8 PTQ path
(ops/quantize.py, also pure XLA): export the model returned by
``quantize_model`` and the s8xs8->s32 convs bake into the artifact.

Workflow::

    exported = export_inference(model, variables, 512, 1024,
                                path="bisenet.shlo")   # train host
    serve = load_exported("bisenet.shlo")              # serving host
    labels = serve(images_u8)                          # any batch size
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ..data.pipeline import IMAGENET_MEAN, IMAGENET_STD


def make_serving_fn(model, variables, preprocess: bool = True,
                    use_fused_kernel: bool = False):
    """Closure ``images -> int32 label map`` over frozen variables.

    preprocess=True: input is raw uint8 NHWC (the decoded, resized frames
    the host loader produces); /255 + ImageNet normalization runs inside
    the artifact (mirrors data/pipeline.py::prepare_batch's eval path).
    preprocess=False: input is already-normalized images in the model's
    compute dtype (the tensors ``evaluate`` consumes).

    use_fused_kernel=True routes the upsample+argmax through the Pallas
    kernel (ops/pallas/upsample_argmax.py) -- the measured-best TPU eval
    path -- which pins the artifact to the 'tpu' platform.
    """

    def serve(images: jax.Array) -> jax.Array:
        if preprocess:
            x = images.astype(jnp.float32) / 255.0
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            x = x.astype(model.dtype)
        else:
            x = images
        if use_fused_kernel:
            from ..ops.pallas import upsample_argmax

            feat, _f16, _f32 = model.apply(variables, x, train=False,
                                           method=type(model).features)
            # force='pallas' so the kernel lowers even when the EXPORTING
            # host is CPU (the artifact targets 'tpu' regardless)
            return upsample_argmax(feat, x.shape[1:3], force="pallas")
        out, _out16, _out32 = model.apply(variables, x, train=False)
        return jnp.argmax(out, axis=-1).astype(jnp.int32)

    return serve


def export_inference(model, variables, height: int, width: int,
                     batch: Optional[int] = None,
                     preprocess: bool = True,
                     use_fused_kernel: bool = False,
                     platforms: Optional[Sequence[str]] = None,
                     path: Optional[str] = None) -> jax_export.Exported:
    """Export the serving forward as a serialized StableHLO artifact.

    batch=None exports a symbolic batch dimension ("b"): the single
    artifact then serves any batch size (the spatial dims stay static --
    TPU-friendly shapes, reference crop semantics). ``platforms`` defaults
    to the current backend; pass ("cpu", "tpu") for a portable artifact.
    use_fused_kernel=True embeds the Pallas upsample+argmax kernel (the
    measured-best TPU eval path) and forces platforms=("tpu",).
    Returns the ``jax.export.Exported``; also writes the serialized bytes
    to ``path`` when given.
    """
    if use_fused_kernel:
        if platforms is not None and tuple(platforms) != ("tpu",):
            raise ValueError("use_fused_kernel artifacts are tpu-only "
                             f"(Mosaic custom call); got {platforms}")
        platforms = ("tpu",)
    serve = make_serving_fn(model, variables, preprocess=preprocess,
                            use_fused_kernel=use_fused_kernel)
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
    else:
        b = batch
    in_dtype = jnp.uint8 if preprocess else model.dtype
    spec = jax.ShapeDtypeStruct((b, height, width, 3), in_dtype)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(serve), **kwargs)(spec)
    if use_fused_kernel and "tpu_custom_call" not in exported.mlir_module():
        # upsample_argmax quietly takes its XLA fallback for shapes the
        # kernel can't serve (row-block granule / VMEM budget) -- don't
        # pin a fully-portable program to 'tpu'; re-export portable so
        # callers can tell from .platforms what they actually got
        return export_inference(model, variables, height, width,
                                batch=batch, preprocess=preprocess,
                                use_fused_kernel=False,
                                platforms=("cpu", "tpu"), path=path)
    if path is not None:
        with open(path, "wb") as f:
            f.write(exported.serialize())
    return exported


def export_inference_sharded(model, variables, height: int, width: int,
                             mesh, batch: Optional[int] = None,
                             preprocess: bool = True,
                             use_fused_kernel: bool = False,
                             platforms: Optional[Sequence[str]] = None,
                             path: Optional[str] = None
                             ) -> jax_export.Exported:
    """Pod-serving artifact: the eval forward batch-sharded over ``mesh``.

    Batch-parallel inference is embarrassingly parallel (eval-mode BN
    uses running stats, so no cross-device collectives). Two lowering
    routes, chosen by ``use_fused_kernel``:

    * pure-XLA (default): ``jit`` with batch in/out shardings — GSPMD
      partitions every op over the mesh's first axis. The batch stays
      the symbolic ``mesh.size * b`` (unless a concrete ``batch`` is
      given), so one artifact serves any multiple of the mesh size.
    * ``use_fused_kernel=True``: the Pallas upsample+argmax custom call
      is opaque to GSPMD, so the serving fn is wrapped in ``shard_map``
      — each device runs the whole model, kernel included, on its local
      shard. shard_map bodies cannot be shape-refined symbolically at
      call time (measured here: the refiner rejects the module), so
      this route REQUIRES a concrete ``batch`` divisible by the mesh
      size.

    The exported module records the device count and shardings
    (``exported.nr_devices == mesh.size``). The serving host rebuilds a
    same-size 1-axis mesh and feeds an array sharded on dim 0::

        exp = read_exported("pod.shlo")
        mesh = Mesh(np.array(jax.devices())[:exp.nr_devices], ("data",))
        sh = NamedSharding(mesh, PartitionSpec("data"))
        labels = exp.call(jax.device_put(images_u8, sh))

    The single-chip ``export_inference`` remains the right artifact for
    one device; this is the ICI-scale variant (reference analogue:
    nn.DataParallel wrapping the eval model, train.py:145-152,511).
    """
    import inspect

    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    n = int(mesh.devices.size)
    if batch is not None and batch % n:
        raise ValueError(f"batch {batch} not divisible by the "
                         f"{n}-device mesh")
    serve = make_serving_fn(model, variables, preprocess=preprocess,
                            use_fused_kernel=use_fused_kernel)
    sh = NamedSharding(mesh, PartitionSpec(axis))
    if use_fused_kernel:
        if platforms is not None and tuple(platforms) != ("tpu",):
            raise ValueError("use_fused_kernel artifacts are tpu-only "
                             f"(Mosaic custom call); got {platforms}")
        if batch is None:
            raise ValueError("use_fused_kernel + mesh needs a concrete "
                             "batch (shard_map modules cannot be "
                             "shape-refined symbolically)")
        platforms = ("tpu",)
        try:  # jax>=0.4.35 moved shard_map out of experimental
            from jax import shard_map
        except ImportError:  # pragma: no cover
            from jax.experimental.shard_map import shard_map
        # the replication-check kwarg was renamed check_rep->check_vma;
        # either way it must be off (the serving fn closes over the
        # frozen weights, which the checker flags as captures)
        check_kw = ("check_vma" if "check_vma"
                    in inspect.signature(shard_map).parameters
                    else "check_rep")
        fn = shard_map(serve, mesh=mesh, in_specs=(PartitionSpec(axis),),
                       out_specs=PartitionSpec(axis), **{check_kw: False})
    else:
        fn = serve  # GSPMD partitions the plain fn via the shardings
    jf = jax.jit(fn, in_shardings=(sh,), out_shardings=sh)
    if batch is None:
        (b,) = jax_export.symbolic_shape(f"{n}*b")
    else:
        b = batch
    in_dtype = jnp.uint8 if preprocess else model.dtype
    spec = jax.ShapeDtypeStruct((b, height, width, 3), in_dtype,
                                sharding=sh)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jf, **kwargs)(spec)
    if use_fused_kernel and "tpu_custom_call" not in exported.mlir_module():
        # same honesty rule as export_inference: if the kernel quietly
        # took its XLA fallback, don't ship a 'tpu'-pinned program
        return export_inference_sharded(model, variables, height, width,
                                        mesh, batch=batch,
                                        preprocess=preprocess,
                                        use_fused_kernel=False,
                                        platforms=("cpu", "tpu"),
                                        path=path)
    if path is not None:
        with open(path, "wb") as f:
            f.write(exported.serialize())
    return exported


def export_inference_spatial(model, variables, height: int, width: int,
                             mesh, preprocess: bool = True,
                             platforms: Optional[Sequence[str]] = None,
                             path: Optional[str] = None
                             ) -> jax_export.Exported:
    """LATENCY-oriented pod artifact: the eval forward with the image
    HEIGHT sharded over ``mesh`` (GSPMD inserts the conv halo exchanges),
    batch left symbolic — including batch 1, which batch sharding
    (``export_inference_sharded``) cannot accelerate at all. The CNN
    analogue of sequence-parallel serving (SURVEY.md section 2.3).

    GSPMD route only: the Pallas upsample+argmax kernel is opaque to the
    partitioner, and a height-sharded shard_map would need hand-built
    halos for every conv — so this lowers the pure-XLA eval path (the
    same trade as training's ``--spatial_devices``, parallel/mesh.py).
    Heights must keep every downsampled stage on whole rows per shard
    (check_spatial_height; stride-32 divisibility), which also keeps the
    forward fp-exact vs single-device — asserted in test_export.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    from ..parallel.mesh import check_spatial_height

    axis = mesh.axis_names[0]
    n = int(mesh.devices.size)
    check_spatial_height(height, n)
    serve = make_serving_fn(model, variables, preprocess=preprocess,
                            use_fused_kernel=False)
    sh = NamedSharding(mesh, PartitionSpec(None, axis))
    jf = jax.jit(serve, in_shardings=(sh,), out_shardings=sh)
    (b,) = jax_export.symbolic_shape("b")
    in_dtype = jnp.uint8 if preprocess else model.dtype
    spec = jax.ShapeDtypeStruct((b, height, width, 3), in_dtype,
                                sharding=sh)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jf, **kwargs)(spec)
    if path is not None:
        with open(path, "wb") as f:
            f.write(exported.serialize())
    return exported


def artifact_shard_dim(exported: jax_export.Exported) -> int:
    """Which input dim a multi-device artifact shards: 0 for the batch-
    sharded pod artifacts, 1 for the height-sharded (spatial) ones.
    Parsed from the recorded HLO sharding's tile assignment (e.g.
    ``{devices=[1,8,1,1]<=[8]}`` -> dim 1)."""
    import re

    if exported.nr_devices <= 1:
        return 0
    hs = str(exported.in_shardings_hlo[0])
    m = re.search(r"devices=\[([0-9,]+)\]", hs)
    if not m:
        return 0
    ndim = len(exported.in_avals[0].shape)
    dims = [int(x) for x in m.group(1).split(",")][:ndim]
    for i, d in enumerate(dims):
        if d > 1:
            return i
    return 0


def read_exported(path: str) -> jax_export.Exported:
    """Deserialize an ``export_inference`` artifact (shape/dtype metadata
    in ``.in_avals``, execution via ``.call``)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def load_exported(path: str):
    """Deserialize an ``export_inference`` artifact into a callable.

    The serving host needs jax (any backend the artifact was lowered
    for) -- not this package's model code or the checkpoint."""
    return read_exported(path).call


def export_inference_bundle(model, variables, height: int, width: int,
                            batches: Sequence[int], mesh=None,
                            preprocess: bool = True,
                            use_fused_kernel: bool = False,
                            platforms: Optional[Sequence[str]] = None,
                            path: Optional[str] = None):
    """Multi-batch-size artifact bundle (one zip, one program per batch).

    The tpu-fused routes compile to a CONCRETE batch (the Pallas custom
    call's shard_map module cannot be shape-refined symbolically — see
    export_inference_sharded), which pinned a fused pod artifact to a
    single serving batch. A bundle bakes SEVERAL concrete batch sizes
    into one deployable file: serve.py picks the best-fitting program per
    chunk (e.g. the big batch for the steady state, a small one for the
    ragged tail), so fused serving no longer dictates the client's batch.

    Layout: a zip with ``b<batch>.shlo`` entries + ``META.json``
    ({"batches": [...], "nr_devices": N}). Returns {batch: Exported}.
    """
    import json as _json
    import zipfile

    batches = sorted(set(int(b) for b in batches))
    if not batches:
        raise ValueError("need at least one batch size")
    out = {}
    for b in batches:
        if mesh is not None and int(mesh.devices.size) > 1:
            out[b] = export_inference_sharded(
                model, variables, height, width, mesh, batch=b,
                preprocess=preprocess, use_fused_kernel=use_fused_kernel,
                platforms=platforms)
        else:
            out[b] = export_inference(
                model, variables, height, width, batch=b,
                preprocess=preprocess, use_fused_kernel=use_fused_kernel,
                platforms=platforms)
    if path is not None:
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("META.json", _json.dumps({
                "batches": batches,
                "nr_devices": max(e.nr_devices for e in out.values()),
            }))
            for b, e in out.items():
                zf.writestr(f"b{b}.shlo", e.serialize())
    return out


def read_exported_bundle(path: str):
    """Load an ``export_inference_bundle`` zip -> {batch: Exported}."""
    import json as _json
    import zipfile

    with zipfile.ZipFile(path) as zf:
        meta = _json.loads(zf.read("META.json"))
        return {int(b): jax_export.deserialize(zf.read(f"b{b}.shlo"))
                for b in meta["batches"]}


def is_bundle(path: str) -> bool:
    import zipfile

    return zipfile.is_zipfile(path)
