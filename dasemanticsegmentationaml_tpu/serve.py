"""Serving runner: replay an exported artifact over a directory of images.

Completes the deployment story (utils/export.py): the serving host runs

    python -m dasemanticsegmentationaml_tpu.serve model.shlo \
        --images <dir> --output <dir> [--batch_size 8] [--color]

with only the artifact -- no checkpoint, no model code on the hot path.
Images decode + resize through the native C++ loader
(data/transforms_host.py), batch, and run through the artifact; each
image writes ``<stem>_trainIds.png`` (the reference's trainId encoding,
cityscapes gtFine convention) and, with ``--color``, ``<stem>_color.png``
using the Cityscapes train-id palette (data/labels.py).
"""

from __future__ import annotations

import argparse
import concurrent.futures as futures
import os
import time
from typing import List

import numpy as np

from .data.transforms_host import load_image
from .utils.export import is_bundle, read_exported, read_exported_bundle

_EXTS = (".png", ".jpg", ".jpeg")


def list_images(root: str) -> List[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in files
                   if f.lower().endswith(_EXTS))
    return sorted(out)


def run(artifact: str, images_dir: str, output_dir: str,
        batch_size: int = 8, color: bool = False,
        faithful_resize: bool = False) -> dict:
    if is_bundle(artifact):
        # multi-batch bundle (utils/export.py::export_inference_bundle):
        # one concrete-batch program per size; the steady state uses the
        # largest size <= --batch_size and the ragged tail the smallest
        # program that fits, minimizing padding for fused (concrete-
        # batch-only) artifacts
        bundle = read_exported_bundle(artifact)
        fitting = [bb for bb in bundle if bb <= batch_size]
        batch_size = max(fitting) if fitting else min(bundle)
        exported = bundle[batch_size]
    else:
        bundle = {}
        exported = read_exported(artifact)
    b, h, w, c = exported.in_avals[0].shape
    if c != 3 or exported.in_avals[0].dtype != np.uint8:
        raise SystemExit(
            "artifact must take uint8 NHWC images (export_inference "
            f"preprocess=True); got {exported.in_avals[0]}")
    if isinstance(b, int):  # static-batch artifact dictates the batch
        batch_size = b

    call = exported.call
    if exported.nr_devices > 1:
        # pod artifact: batch-sharded on dim 0
        # (utils/export.py::export_inference_sharded) or height-sharded
        # on dim 1 (::export_inference_spatial, the latency variant);
        # rebuild a 1-axis mesh of the recorded size and feed arrays
        # sharded on the recorded dim
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        from .utils.export import artifact_shard_dim

        devs = jax.devices()
        if len(devs) < exported.nr_devices:
            raise SystemExit(
                f"pod artifact needs {exported.nr_devices} devices, this "
                f"host presents {len(devs)}")
        mesh = Mesh(np.asarray(devs[:exported.nr_devices]), ("data",))
        dim = artifact_shard_dim(exported)
        spec = PartitionSpec(*([None] * dim + ["data"]))
        sh = NamedSharding(mesh, spec)
        if dim == 0 and not isinstance(b, int):
            # symbolic N*b batch: concrete batches must divide evenly
            # (height-sharded artifacts take ANY batch, incl. 1)
            n = exported.nr_devices
            batch_size = -(-batch_size // n) * n
        call = lambda frames: exported.call(jax.device_put(frames, sh))

    def call_for(n_frames):
        """Best program for a chunk: the main one, or (bundles) the
        smallest baked batch that fits a ragged tail."""
        if not bundle or n_frames == batch_size:
            return batch_size, call
        fit = min((bb for bb in bundle if bb >= n_frames),
                  default=batch_size)
        exp = bundle[fit]
        if exp.nr_devices > 1:
            import jax
            from jax.sharding import Mesh, NamedSharding, PartitionSpec

            mesh = Mesh(np.asarray(jax.devices()[:exp.nr_devices]),
                        ("data",))
            sh2 = NamedSharding(mesh, PartitionSpec("data"))
            return fit, lambda fr: exp.call(jax.device_put(fr, sh2))
        return fit, exp.call

    paths = list_images(images_dir)
    if not paths:
        raise SystemExit(f"no images under {images_dir}")
    os.makedirs(output_dir, exist_ok=True)

    from PIL import Image

    palette = None
    if color:
        from .data.labels import train_id_colors

        # index 19 = the palette's void/black entry; predictions are
        # always in [0, 19) so only train-id colors are ever used
        palette = train_id_colors()

    def decode_chunk(chunk):
        frames = np.stack([load_image(p, (h, w), faithful_resize)
                           for p in chunk])
        target, chunk_call = call_for(len(chunk))
        if len(chunk) < target:
            # pad EVERY ragged tail (not just static-batch artifacts):
            # a symbolic-batch artifact compiles per concrete batch size,
            # and a fresh full-model compile to serve the tail is minutes
            # on a remote-compile TPU stack. With a bundle the pad goes
            # to the smallest baked batch that fits instead.
            pad = np.zeros((target - len(chunk), h, w, 3), np.uint8)
            frames = np.concatenate([frames, pad])
        return frames, chunk_call

    # same-stem inputs differing only by extension (photo.jpg + photo.png)
    # would collide after the extension strip; keep the extension in the
    # output name for exactly those
    stem_count: dict = {}
    for p in paths:
        s = os.path.splitext(os.path.relpath(p, images_dir))[0]
        stem_count[s] = stem_count.get(s, 0) + 1

    def out_name(path, suffix):
        # preserve the subdirectory structure: basename-only stems would
        # silently overwrite same-named files from different directories
        rel = os.path.relpath(path, images_dir)
        stem, ext = os.path.splitext(rel)
        if stem_count.get(stem, 0) > 1:
            stem = f"{stem}.{ext.lstrip('.')}"
        full = os.path.join(output_dir, f"{stem}{suffix}.png")
        os.makedirs(os.path.dirname(full), exist_ok=True)
        return full

    chunks = [paths[s:s + batch_size]
              for s in range(0, len(paths), batch_size)]
    n_done, t0, t_first = 0, time.perf_counter(), 0.0
    with futures.ThreadPoolExecutor(max_workers=1) as pool:
        # one-chunk decode lookahead: the host decodes chunk k+1 while
        # the device runs chunk k (the data Loader's overlap pattern)
        pending = pool.submit(decode_chunk, chunks[0])
        for i, chunk in enumerate(chunks):
            frames, chunk_call = pending.result()
            if i + 1 < len(chunks):
                pending = pool.submit(decode_chunk, chunks[i + 1])
            preds = np.asarray(chunk_call(frames))[:len(chunk)]
            if i == 0:
                t_first = time.perf_counter() - t0
            for path, pred in zip(chunk, preds):
                Image.fromarray(pred.astype(np.uint8), mode="L").save(
                    out_name(path, "_trainIds"))
                if palette is not None:
                    Image.fromarray(palette[pred]).save(
                        out_name(path, "_color"))
            n_done += len(chunk)
    dt = time.perf_counter() - t0
    # the first batch absorbs the artifact's one-time compile (minutes on
    # a remote-compile TPU stack), so report it separately from the
    # steady-state rate the remaining batches ran at
    steady = n_done - len(chunks[0])
    rate = (f", then {steady / (dt - t_first):.1f} img/s steady-state"
            if steady and dt > t_first else "")
    print(f"served {n_done} images in {dt:.2f}s "
          f"(first batch {t_first:.2f}s incl. one-time compile{rate})")
    return {"images": n_done, "seconds": dt}


def main(argv=None):
    p = argparse.ArgumentParser(
        description="run an exported serving artifact over a directory")
    p.add_argument("artifact", help="path from --export_model / "
                                    "utils.export.export_inference")
    p.add_argument("--images", required=True, help="directory of images")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--color", action="store_true",
                   help="also write palette-colorized predictions")
    p.add_argument("--faithful_resize", action="store_true",
                   help="reproduce the reference's transposed PIL resize "
                        "(cityscapes.py:22; only valid for square inputs "
                        "at serving time)")
    args = p.parse_args(argv)
    return run(args.artifact, args.images, args.output,
               batch_size=args.batch_size, color=args.color,
               faithful_resize=args.faithful_resize)


def console_main() -> int:
    """``dseg-serve`` console entry point (pyproject.toml): ``main``
    returns a stats dict, which setuptools would misread as a nonzero
    exit status."""
    main()
    return 0


if __name__ == "__main__":
    main()
