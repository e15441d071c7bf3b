"""Multi-process data-parallel worker (driven by tests/test_distributed.py).

One OS process of an N-process jax.distributed group, 4 virtual CPU
devices each: runs K supervised train steps on the ('dcn','data') global
mesh with its process-local slice of each global batch, then dumps
per-step losses + parameter digests for parity checking against the
single-process 8-device run (VERDICT round-2 item #2: prove the
multi-host story without hardware).

Usage: python mp_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dasemanticsegmentationaml_tpu.data.datasets import (
        SyntheticSegDataset)
    from dasemanticsegmentationaml_tpu.data.pipeline import Loader
    from dasemanticsegmentationaml_tpu.models import BiSeNet
    from dasemanticsegmentationaml_tpu.models.bisenet import (
        init_bisenet_variables, unused_param_mask)
    from dasemanticsegmentationaml_tpu.parallel import (batch_sharding,
                                                        create_mesh_multihost,
                                                        make_sharded_train_step,
                                                        replicate_state)
    from dasemanticsegmentationaml_tpu.parallel.distributed import (
        global_batch_arrays, initialize)
    from dasemanticsegmentationaml_tpu.train import create_train_state
    from dasemanticsegmentationaml_tpu.train.optim import make_optimizer

    initialize(coordinator_address=f"localhost:{port}",
               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    mesh = create_mesh_multihost()  # (nproc, local_devices)

    model = BiSeNet(n_classes=19, dtype=jnp.float32)
    variables = init_bisenet_variables(model, jax.random.PRNGKey(0),
                                       (1, 32, 64, 3))
    opt = make_optimizer("sgd", 0.01, momentum=0.9, weight_decay=1e-4,
                         mask=unused_param_mask(variables["params"]))
    state = replicate_state(create_train_state(variables, opt), mesh)
    step = make_sharded_train_step(model, opt, mesh, sync_bn=True)

    ds = SyntheticSegDataset(length=16, height=32, width=64)
    loader = Loader(ds, batch_size=8, shuffle=True, seed=0, num_workers=1,
                    process_id=pid, process_count=nproc)
    batch_sh = batch_sharding(mesh)

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
            x, y = global_batch_arrays(
                batch_sh, images.astype(np.float32) / 255.0,
                labels.astype(np.int32))
            state, loss = step(state, x, y, 0.01)
            losses.append(float(loss))
            if step1 is None:
                step1 = digests(state.params)

    leaf_l2, leaf_sum = digests(state.params)
    np.savez(out,
             losses=np.asarray(losses),
             step1_l2=step1[0], step1_sum=step1[1],
             leaf_l2=leaf_l2, leaf_sum=leaf_sum)
    print(f"worker {pid}: done, {len(losses)} steps", flush=True)


if __name__ == "__main__":
    main()
