"""End-to-end int8-PTQ inference throughput vs the bf16 bench number.

Quantizes BiSeNet-STDC813 (ops/quantize.py: folded BN, per-channel int8
weights, calibrated per-tensor activation scales) and times the eval hot
path (features -> fused upsample+argmax) with bench.py's chained-scan
protocol. Compare against the recorded bf16 number (2659.7 img/s at
batch 128, BENCH JSON) rather than re-measuring bf16 in-process — one
TPU program at a time keeps the compile-service load down.

Variants (2nd arg) select which layers quantize via the selective
filter_fn (the rest run the bf16 path):
  all       every conv+BN+ReLU block (35)
  head      conv_out's 3x3 256->256 only (the single biggest FLOP block)
  head_ch   head + cp.conv_head16/32 (the only other single-live-consumer
            convs on the eval path)
  head_ffm  head + the FFM blocks
  head_stem head + the stem ConvX pair (features_0/1)
  heads_cp  all heads + context-path convs (no backbone)
  backbone  backbone only
  deep      everything except the high-res stem/stage8 (features_0..3) --
            the post-128 HBM cliff lives there, where the extra int8
            boundary materializations hurt most

Measured (v5e, bs=128; bf16 reference 2659.7 img/s):
  all 2396.4 (-10%)   head 2745.1/2760.9   head_ch 2796.2/2799.9
  (+5.1%, best -- reproduced twice, incl. a back-to-back A/B vs head)
  heads_cp 2722.2   head_ffm 2680.8   head_stem 2660.8   deep 2480.7
  Only single-consumer boundaries win; concat/skip fan-outs materialize
  bf16+int8 copies in the HBM-bound stages, and stem int8 does NOT
  relieve the post-128 cliff.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
    python tools/bench_int8.py [bs] [variant]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dasemanticsegmentationaml_tpu.ops.quantize import (
    PRESET_FILTERS as VARIANTS,
)

CHAIN, REPS = 32, 3


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    variant = sys.argv[2] if len(sys.argv) > 2 else "all"
    filter_fn = VARIANTS[variant]
    h, w = 512, 1024
    from dasemanticsegmentationaml_tpu.models import BiSeNet
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables,
    )
    from dasemanticsegmentationaml_tpu.ops.pallas import upsample_argmax
    from dasemanticsegmentationaml_tpu.ops.quantize import quantize_model

    model = BiSeNet(n_classes=19, dtype=jnp.bfloat16)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, h, w, 3))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.standard_normal((8, h, w, 3)), jnp.bfloat16)
    t0 = time.time()
    qmodel, qvars = quantize_model(model, variables, [calib],
                                   filter_fn=filter_fn)
    print(f"calibration+build ({variant}): {time.time() - t0:.1f}s",
          flush=True)

    @jax.jit
    def chained(qvars, images):
        def body(carry, _):
            feat, _f16, _f32 = qmodel.apply(qvars, carry, train=False,
                                            method=type(qmodel).features)
            pred = upsample_argmax(feat, (h, w))
            s = jnp.sum(pred).astype(jnp.float32) * jnp.float32(1e-30)
            return carry + s.astype(carry.dtype), jnp.sum(pred)
        _, sums = jax.lax.scan(body, images, None, length=CHAIN)
        return sums

    images = jnp.asarray(rng.standard_normal((bs, h, w, 3)), jnp.bfloat16)
    t0 = time.time()
    np.asarray(chained(qvars, images))
    print(f"compile+warm: {time.time() - t0:.1f}s", flush=True)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chained(qvars, images))
        best = min(best, time.perf_counter() - t0)
    print(f"int8[{variant}] bs={bs}: {bs * CHAIN / best:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
