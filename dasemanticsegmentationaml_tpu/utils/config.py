"""CLI flag surface -- reference-compatible plus TPU-native extensions.

The full argparse surface of reference train.py:309-439 is reproduced
(SURVEY.md section 5.6), with the reference's ``type=bool`` footgun fixed:
there, ``--domain_shift False`` evaluated truthy (train.py:408-437) because
any non-empty string is truthy; here every boolean flag uses ``str2bool``
(the reference defines it at train.py:301-307 but only uses it for
--use_conv_last).

Dead reference flags are implemented honestly:
* --epoch_start_i: resumes the epoch counter (parsed-but-unused at
  train.py:344-347);
* --iter_size: gradient accumulation (parsed-but-unused at train.py:404);
* --loss: 'crossentropy' or 'ohem' (parsed-but-unused at train.py:400).
"""

from __future__ import annotations

import argparse


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Unsupported value encountered.")


def str2bool_auto(v):
    """Tri-state: True/False like str2bool, or 'auto' -> None."""
    if v is None or (isinstance(v, str) and v.lower() == "auto"):
        return None
    return str2bool(v)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native semantic segmentation + domain adaptation "
                    "(capability parity with the reference train.py)")
    # ---- reference flag surface (train.py:309-439) ----------------------
    p.add_argument("--root", type=str, default="../Datasets/Cityscapes")
    p.add_argument("--root_source", type=str, default="../Datasets/GTA5")
    p.add_argument("--root_target", type=str, default="../Datasets/Cityscapes")
    p.add_argument("--dataset", type=str, default="Cityspaces",
                   help="Select Dataset between GTAV and Cityspaces")
    p.add_argument("--backbone", type=str, default="STDCNet813")
    p.add_argument("--pretrain_path", type=str, default="")
    p.add_argument("--use_conv_last", type=str2bool, default=False)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--epoch_start_i", type=int, default=0)
    p.add_argument("--checkpoint_step", type=int, default=10)
    p.add_argument("--validation_step", type=int, default=1)
    p.add_argument("--crop_height", type=int, default=512)
    p.add_argument("--crop_width", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--eval_batch_size", type=int, default=1,
                   help="validation batch size (reference val() uses 1, "
                        "train.py:486-491; larger is faster on TPU and "
                        "metric-identical: the confusion matrix is a sum)")
    p.add_argument("--learning_rate", type=float, default=0.01)
    p.add_argument("--learning_rate_D", type=float, default=1e-3)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--worker_timeout", type=float, default=120.0,
                   help="input-pipeline watchdog: seconds a decode worker "
                        "may spend on ONE sample before the epoch aborts "
                        "with a named PipelineStallError (<=0 disables; "
                        "raise on slow cold NFS mounts)")
    p.add_argument("--fetch_timeout", type=float, default=900.0,
                   help="prefetch watchdog: seconds one batch fetch "
                        "(decode + prepare jit dispatch + H2D) may take "
                        "before aborting with a named PipelineStallError "
                        "(<=0 disables; default covers slow fresh "
                        "compiles — a wedged device claim hangs forever)")
    p.add_argument("--num_classes", type=int, default=19)
    p.add_argument("--cuda", type=str, default="0",
                   help="accepted for CLI compat; ignored on TPU")
    p.add_argument("--use_gpu", type=str2bool, default=True,
                   help="accepted for CLI compat; ignored on TPU")
    p.add_argument("--save_model_path", type=str, default=None)
    p.add_argument("--optimizer", type=str, default="sgd",
                   help="rmsprop, sgd, adam (reference train.py:501-509)")
    p.add_argument("--loss", type=str, default="crossentropy",
                   help="crossentropy | ohem")
    p.add_argument("--iter_size", type=int, default=1,
                   help="gradient accumulation steps (honored here; "
                        "supervised mode only -- the 4-phase DA step "
                        "applies mid-step updates accumulation would "
                        "defer)")
    p.add_argument("--domain_shift", type=str2bool, default=False)
    p.add_argument("--domain_adaptation", type=str2bool, default=False)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--lambda_adv_target1", type=float, default=0.001)
    p.add_argument("--aug_type", type=str, default=None,
                   help="CS-HF | H-RP | B-GS-R")
    p.add_argument("--depthwise", type=str2bool, default=False)
    p.add_argument("--batch_norm", type=str2bool, default=False)

    # ---- TPU-native extensions ------------------------------------------
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="compute dtype (bf16 = TPU AMP analogue)")
    p.add_argument("--faithful_resize", type=str2bool, default=True,
                   help="reproduce the reference's PIL (h,w) transposition "
                        "(reference cityscapes.py:22,65)")
    p.add_argument("--augment_labels", type=str2bool, default=False,
                   help="corrected mode: apply geometric augs to labels too")
    p.add_argument("--fast_device_geometry", type=str2bool, default=False,
                   help="device B-GS-R rotation via the Paeth 3-shear "
                        "decomposition (~200x fewer gather rows on the "
                        "per-row-latency-bound TPU gather engine; source "
                        "indices within +-1 px of PIL's map). Training "
                        "only — the pil-exact replay paths keep the "
                        "exact gather.")
    p.add_argument("--host_augment", type=str2bool_auto, default=None,
                   help="run --aug_type on the HOST inside the Loader's "
                        "decode workers (bit-exact Pillow math, the "
                        "reference's deployment shape) instead of on "
                        "device. Default auto: host for the geometric "
                        "menus (H-RP/B-GS-R) on TPU, whose device warps "
                        "are gather-latency-bound (8.5-11.9 ms/img "
                        "measured, tools/probe_warp.py); device "
                        "otherwise. True/False forces.")
    p.add_argument("--sync_bn", type=str2bool, default=True,
                   help="global-batch BN (False = per-replica, "
                        "DataParallel-faithful)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="devices in the data mesh (default: all)")
    p.add_argument("--spatial_devices", type=int, default=1,
                   help="shard image height over this many devices "
                        "(('data','spatial') mesh, XLA SPMD conv halo "
                        "exchange -- the CNN sequence-parallel analogue); "
                        "num_devices/spatial_devices stay data-parallel")
    p.add_argument("--d_pretrain_path", type=str, default="",
                   help="DA mode: warm-start the discriminator from a "
                        ".pth state dict (e.g. the reference's shipped "
                        "GTA5_model/GTA5_10_D1.pth, module.-prefixed or "
                        "not) instead of random init. The reference has "
                        "no such flag — its D always starts random "
                        "(train.py:144-152) — but it SHIPS a trained D "
                        "checkpoint, which is only usable with this")
    p.add_argument("--d_head", type=int, default=0, choices=[0, 2],
                   help="discriminator input head: 0=main (train.py:230), "
                        "2=out32 (train_nni.py:135)")
    p.add_argument("--da_step_mode", type=str, default="interleaved",
                   choices=["interleaved", "combined"],
                   help="DA update ordering: 'interleaved' = train.py's "
                        "4-phase step with per-phase optimizer steps "
                        "(train.py:192-262); 'combined' = the NNI trial's "
                        "single-zero-grad accumulate-then-step ordering "
                        "(train_nni.py:105-163, what hpo.trial runs)")
    p.add_argument("--nni_faithful_lr", type=str2bool, default=False,
                   help="DA mode: reproduce the NNI trial's ACTUAL LR "
                        "dataflow bug (train_nni.py:97-98 decays "
                        "`optimizer` twice, so G follows lr_D's "
                        "compounded poly and D's LR never decays) — for "
                        "trajectory-parity oracles; default False = "
                        "correct per-optimizer schedules")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ohem_threshold", type=float, default=0.7)
    p.add_argument("--ohem_keep_num", type=int, default=65536)
    p.add_argument("--use_fused_eval", type=str2bool, default=True,
                   help="Pallas fused upsample+argmax eval kernel on TPU")
    p.add_argument("--eval_scan_window", type=int, default=0,
                   help="batches per device-side lax.scan eval dispatch "
                        "(0/1 = one dispatch per batch); cuts tunnel "
                        "round trips on TPU")
    p.add_argument("--quantize_int8", type=str2bool, default=False,
                   help="int8 PTQ for --domain_shift eval (TPU-native "
                        "extension, ops/quantize.py): fold BN, per-channel "
                        "int8 weights, activation scales calibrated on "
                        "--calib_batches val batches")
    p.add_argument("--calib_batches", type=int, default=4,
                   help="val batches used to calibrate --quantize_int8 "
                        "activation scales")
    from ..ops.quantize import PRESET_FILTERS
    p.add_argument("--quantize_filter", type=str, default="head_ch",
                   choices=sorted(PRESET_FILTERS),
                   help="which layers --quantize_int8 quantizes "
                        "(ops/quantize.py PRESET_FILTERS; 'head_ch' "
                        "measured fastest on v5e, the rest run bf16)")
    p.add_argument("--quantize_clip", type=str, default="absmax",
                   choices=["absmax", "p999"],
                   help="activation-scale calibration for --quantize_int8: "
                        "exact range, or the 99.9th percentile "
                        "(outlier-robust; spikes saturate instead of "
                        "stretching the scale)")
    p.add_argument("--export_model", type=str, default=None,
                   help="with --domain_shift: also export the eval forward "
                        "(incl. --quantize_int8 if set) as a serialized "
                        "StableHLO serving artifact at this path "
                        "(utils/export.py; symbolic batch dim, "
                        "uint8-in/int32-labels-out, cpu+tpu)")
    p.add_argument("--export_batches", type=str, default=None,
                   help="comma-separated batch sizes: write --export_model "
                        "as a multi-batch BUNDLE (one concrete-batch "
                        "program per size in one zip; serve.py picks the "
                        "best fit per chunk) — lifts the fused/pod "
                        "artifacts' one-concrete-batch pin")
    p.add_argument("--export_spatial", type=str2bool, default=False,
                   help="with --export_devices N: shard the image HEIGHT "
                        "over the N devices instead of the batch — the "
                        "latency-oriented pod artifact (serves ANY batch "
                        "size incl. 1; GSPMD conv halo exchange; pure-XLA "
                        "eval path; height must keep every stride-32 "
                        "stage divisible by N)")
    p.add_argument("--export_devices", type=int, default=1,
                   help="batch-shard the --export_model artifact over the "
                        "first N local devices (pod serving, "
                        "utils/export.py::export_inference_sharded; the "
                        "serving host must present the same device count)")
    p.add_argument("--resume", type=str, default=None,
                   help="orbax checkpoint dir to resume full train state")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="multi-process: jax.distributed coordinator "
                        "host:port (or env JAX_COORDINATOR_ADDRESS); the "
                        "mesh becomes ('dcn','data') with one dcn row per "
                        "process (parallel/distributed.py)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="multi-process: total process count (or env "
                        "JAX_NUM_PROCESSES; auto-detected on managed TPU "
                        "pods)")
    p.add_argument("--process_id", type=int, default=None,
                   help="multi-process: this process's rank (or env "
                        "JAX_PROCESS_ID)")
    p.add_argument("--eval_process_shard", type=str2bool, default=True,
                   help="multi-process: shard the val set across processes "
                        "and sum the confusion counts (bit-identical "
                        "mIoU/precision to the full redundant eval, "
                        "1/process_count the wall-clock); False = every "
                        "rank redundantly evaluates the full set")
    p.add_argument("--data_cache", type=str, default=None,
                   help="directory for the packed decoded-sample cache "
                        "(data/cache.py): every dataset in the run is "
                        "decoded+resized ONCE into uint8 memmaps keyed by "
                        "content fingerprint, and later epochs/runs read "
                        "samples at memory bandwidth instead of re-decoding "
                        "PNGs (the reference re-decodes every epoch, "
                        "train.py:465-491). Safe across config changes: a "
                        "different resize/dataset gets a different cache "
                        "entry; stale entries are never reused")
    p.add_argument("--jsonl_log", type=str, default=None,
                   help="structured JSONL metrics path")
    p.add_argument("--tensorboard", type=str2bool, default=True)
    p.add_argument("--profile_dir", type=str, default=None,
                   help="jax.profiler trace output dir")
    p.add_argument("--max_steps_per_epoch", type=int, default=None,
                   help="cap steps per epoch (smoke tests)")
    return p


def parse_args(argv=None) -> argparse.Namespace:
    args = build_parser().parse_args(argv)
    if args.loss == "ohem":
        args.ohem = {"threshold": args.ohem_threshold,
                     "keep_num": args.ohem_keep_num}
    else:
        args.ohem = None
    return args
