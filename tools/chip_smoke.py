"""One-command Pallas kernel-parity smoke on the REAL chip.

The CPU test suite runs the kernels only in interpret mode (Mosaic
lowering is TPU-only), so after a libtpu/compiler bump this is the
fastest way to re-validate every shipped kernel against its XLA
reference ON HARDWARE. Production shapes (stride-8 19-class head ->
1024x512), small batch so each program compiles in seconds.

Stages (each its own jit program, bench_serve-style staging so a flaky
compile-service window still yields partial results):

  gate      fresh tiny matmul — fails fast if the compile service is down
  up_exact  fp32 upsample_argmax 'pallas' kernel vs XLA: must be EXACT
  up_split  bf16 SPLIT kernel (the wired eval path) vs fp32 XLA oracle:
            expect ~1e-5..1e-6 mismatch (16-bit-exact taps, noise ties)
  up_fast   opt-in DEFAULT kernel: expect ~2.6e-3 mismatch (8-bit taps)
  ce_fwd    fused upsample+CE value vs XLA on the SAME bf16 logits:
            expect rel err ~1e-3 (bf16 tap quantization)
  ce_bwd    fused custom-VJP gradient vs XLA grad: rel l2 ~1e-2

Exit code 0 iff every stage ran and up_exact was exact.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 900 \
    python tools/chip_smoke.py [stage,stage,...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T0 = time.time()


def say(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", flush=True)


def main():
    stages = set((sys.argv[1] if len(sys.argv) > 1
                  else "up_exact,up_split,up_fast,ce_fwd,ce_bwd")
                 .split(","))
    ok = True

    m = 131 + (int(_T0) % 97)
    np.asarray(jax.jit(lambda a: (a @ a.T).sum())(
        jnp.ones((m, 257), jnp.bfloat16)))
    say(f"gate ok (fresh {m}x257 matmul compiled) — service healthy")

    from dasemanticsegmentationaml_tpu.ops.pallas import upsample_argmax
    from dasemanticsegmentationaml_tpu.ops.pallas.fused_ce import (
        _xla_reference as ce_xla, cross_entropy_upsampled)

    h, w, c, out_hw = 64, 128, 19, (512, 1024)
    rng = np.random.default_rng(0)
    feat32 = jnp.asarray(rng.standard_normal((4, h, w, c)), jnp.float32)
    feat16 = feat32.astype(jnp.bfloat16)
    if "up_exact" in stages:
        want = np.asarray(jax.jit(
            lambda x: upsample_argmax(x, out_hw, force="xla"))(feat32))
        got = np.asarray(jax.jit(
            lambda x: upsample_argmax(x, out_hw, force="pallas"))(feat32))
        exact = bool((got == want).all())
        ok &= exact
        say(f"RESULT up_exact (fp32 kernel vs XLA): exact={exact}")

    want16 = None
    if stages & {"up_split", "up_fast"}:
        # same bf16 inputs for kernel and oracle: the mismatch then
        # isolates the kernel's tap quantization, not input rounding
        want16 = np.asarray(jax.jit(
            lambda x: upsample_argmax(x, out_hw, force="xla"))(feat16))

    if "up_split" in stages:
        got = np.asarray(jax.jit(
            lambda x: upsample_argmax(x, out_hw, force="split"))(feat16))
        say(f"RESULT up_split (bf16 eval path): mismatch "
            f"{float((got != want16).mean()):.2e} (expect ~1e-5, "
            "near-ties on noise)")

    if "up_fast" in stages:
        got = np.asarray(jax.jit(
            lambda x: upsample_argmax(x, out_hw, force="fast"))(feat16))
        say(f"RESULT up_fast (8-bit-tap kernel): mismatch "
            f"{float((got != want16).mean()):.2e} (expect ~2.6e-3)")

    if stages & {"ce_fwd", "ce_bwd"}:
        labels = rng.integers(0, c, (4,) + out_hw).astype(np.int32)
        labels[:, ::7, ::11] = 255  # exercise the ignore mask
        labels = jnp.asarray(labels)

        def loss_pallas(x):
            return cross_entropy_upsampled(x, labels, out_hw,
                                           force="pallas")

        def loss_xla(x):
            # same bf16 quantization the kernel applies, so the delta
            # isolates the kernel body rather than the input dtype
            return ce_xla(x.astype(jnp.bfloat16), labels, out_hw, 255)

        if "ce_fwd" in stages:
            a = float(jax.jit(loss_pallas)(feat16))
            b = float(jax.jit(loss_xla)(feat16))
            rel = abs(a - b) / abs(b)
            say(f"RESULT ce_fwd: pallas {a:.6f} vs xla {b:.6f}, "
                f"rel {rel:.2e} (expect ~1e-3)")
        if "ce_bwd" in stages:
            ga = np.asarray(jax.jit(jax.grad(loss_pallas))(feat16),
                            np.float32)
            gb = np.asarray(jax.jit(jax.grad(loss_xla))(feat16),
                            np.float32)
            rel = float(np.linalg.norm(ga - gb) / np.linalg.norm(gb))
            say(f"RESULT ce_bwd: grad rel l2 {rel:.2e} (expect ~1e-2)")

    say("PASS" if ok else "FAIL (up_exact mismatch)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
