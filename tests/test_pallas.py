"""Pallas kernel tests (interpret mode on the CPU test platform)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dasemanticsegmentationaml_tpu.ops.pallas import upsample_argmax
from dasemanticsegmentationaml_tpu.ops.pallas.upsample_argmax import (
    _xla_reference,
    _tap_matrix,
    _row_block,
)
from dasemanticsegmentationaml_tpu.ops.resize import bilinear_gather_plan


def test_tap_matrix_is_interpolation():
    m = _tap_matrix(8, 32, transpose=False)
    # columns sum to 1 (affine interpolation), two taps per column
    np.testing.assert_allclose(m.sum(axis=0), np.ones(32), rtol=1e-6)
    assert ((m > 0).sum(axis=0) <= 2).all()
    np.testing.assert_array_equal(_tap_matrix(8, 32, transpose=True), m.T)


def test_row_block_divides():
    assert _row_block(512) == 64
    assert _row_block(32) == 32
    assert _row_block(24) == 24
    assert _row_block(12) == 0  # not a multiple of 8 -> XLA fallback


def test_upsample_argmax_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 19)).astype(np.float32))
    ref = np.asarray(_xla_reference(x, (32, 64)))
    got = np.asarray(upsample_argmax(x, (32, 64), force="interpret"))
    assert ref.shape == got.shape == (2, 32, 64)
    # exact up to fp32 argmax ties
    assert (ref != got).mean() < 1e-3


def test_upsample_argmax_exact_on_separated_logits():
    """With decisive margins the kernel must match exactly."""
    rng = np.random.default_rng(1)
    x = np.round(rng.standard_normal((1, 8, 16, 19)) * 4).astype(np.float32)
    xj = jnp.asarray(x)
    ref = np.asarray(_xla_reference(xj, (32, 64)))
    got = np.asarray(upsample_argmax(xj, (32, 64), force="interpret"))
    np.testing.assert_array_equal(ref, got)


def test_upsample_argmax_split_matches_xla():
    """bf16 logits route to the SPLIT kernel (~16-bit-exact taps);
    mismatches vs the fp32 reference only on near-ties."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 19)) * 4, jnp.bfloat16)
    ref = np.asarray(_xla_reference(x.astype(jnp.float32), (32, 64)))
    got = np.asarray(upsample_argmax(x, (32, 64), force="interpret"))
    assert (ref != got).mean() < 1e-3


def test_upsample_argmax_split_near_exact_on_separated_logits():
    """SPLIT is ~16-bit-exact: on integer logits only exact-tie pixels
    may flip (the fp32 HIGHEST path preserves ties bitwise; the bf16
    hi+lo taps perturb them by ~2^-17)."""
    rng = np.random.default_rng(4)
    x = np.round(rng.standard_normal((1, 8, 16, 19)) * 4).astype(np.float32)
    xj = jnp.asarray(x)  # fp32 values, all bf16-exact (small integers)
    ref = np.asarray(_xla_reference(xj, (32, 64)))
    got = np.asarray(upsample_argmax(xj, (32, 64), force="split"))
    assert (ref != got).mean() < 1e-3


def test_upsample_argmax_dtype_policy():
    """'auto'/'pallas'/'interpret' route bf16 logits to the SPLIT kernel
    and keep fp32 logits on the exact HIGHEST kernel."""
    import importlib

    # the package __init__ shadows the submodule name with the function
    ua = importlib.import_module(
        "dasemanticsegmentationaml_tpu.ops.pallas.upsample_argmax")
    calls = []
    orig = ua._pallas_call

    def spy(logits_t, out_hw, interpret=False, precision=None, split=False):
        calls.append(split)
        return orig(logits_t, out_hw, interpret=True, split=split) \
            if split or interpret else orig(
                logits_t, out_hw, interpret=True)

    ua._pallas_call, saved = spy, orig
    try:
        xb = jnp.zeros((1, 8, 16, 19), jnp.bfloat16)
        xf = jnp.zeros((1, 8, 16, 19), jnp.float32)
        ua.upsample_argmax(xb, (32, 64), force="interpret")
        ua.upsample_argmax(xf, (32, 64), force="interpret")
        ua.upsample_argmax(xf, (32, 64), force="split")
    finally:
        ua._pallas_call = saved
    assert calls == [True, False, True]


def test_upsample_argmax_fp32_keeps_exact_path():
    """fp32 logits must stay on the exact HIGHEST kernel under 'auto'
    policy semantics (here: interpret mode picks split only for bf16)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 19)).astype(np.float32))
    ref = np.asarray(_xla_reference(x, (32, 64)))
    got = np.asarray(upsample_argmax(x, (32, 64), force="interpret"))
    assert (ref != got).mean() < 1e-3


def test_upsample_argmax_fast_mode():
    """force='fast' (1-pass DEFAULT kernel) stays within the documented
    mismatch envelope vs the fp32 reference."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 19)) * 4, jnp.bfloat16)
    ref = np.asarray(_xla_reference(x.astype(jnp.float32), (32, 64)))
    got = np.asarray(upsample_argmax(x, (32, 64), force="fast"))
    assert (ref != got).mean() < 2e-2


def test_upsample_argmax_vmem_guard():
    """Shapes whose per-step VMEM exceeds the budget must fall back to
    XLA (a compile-side scoped-vmem OOM wedges the compile service)."""
    import importlib

    ua = importlib.import_module(
        "dasemanticsegmentationaml_tpu.ops.pallas.upsample_argmax")
    # production eval shape stays comfortably under budget
    assert ua._vmem_estimate(64, 128, 19, 512, 1024, 64) < ua.VMEM_BUDGET
    # the observed-OOM config (row_blk 512, 19.6 MB measured) is over
    assert ua._vmem_estimate(64, 128, 19, 512, 1024, 512) > 16 * 2**20
    # a pathologically wide class count routes to XLA without error
    # (on CPU the un-guarded pallas path would raise "Only interpret
    # mode is supported", so reaching XLA proves the guard fired)
    assert ua._vmem_estimate(8, 128, 1024, 32, 64,
                             ua._row_block(32)) > ua.VMEM_BUDGET
    x = jnp.zeros((1, 8, 128, 1024), jnp.float32)
    out = ua.upsample_argmax(x, (32, 64), force="pallas")
    assert out.shape == (1, 32, 64)


def test_upsample_argmax_identity_size():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 19)).astype(np.float32))
    ref = np.asarray(jnp.argmax(x, axis=-1))
    got = np.asarray(upsample_argmax(x, (8, 16), force="interpret"))
    np.testing.assert_array_equal(ref, got)


def test_upsample_argmax_xla_fallback_on_cpu():
    x = jnp.zeros((1, 4, 4, 19))
    out = upsample_argmax(x, (8, 8), force="auto")  # cpu -> xla path
    assert out.shape == (1, 8, 8)
