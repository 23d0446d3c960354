"""Worker for tests/test_multiprocess_train.py: one of two REAL
jax.distributed CPU processes running the SAME sharded train step over a
2-device ('data') mesh. Each process holds only its LOCAL half of the
global batch; parallel/mesh.py:shard_batch assembles the global array via
jax.make_array_from_process_local_data and replicate() places the state —
the exact multi-host code path train.py uses. The parent test asserts the
result equals a single-process run on the full global batch.

Reference analogue: DDP multi-node training (apis/train.py:308-312 +
dist_train.sh).

Usage: python tests/_train_worker.py <coord_addr> <process_id> <out_npz>
"""
import sys


def main():
    coord, pid, out_npz = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax

    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2

    import numpy as np
    from jax.experimental import multihost_utils

    # Establish the Gloo clique in lockstep (see tests/_gather_worker.py:
    # context init has a hard 30s deadline; compile-time drift on a 1-core
    # box would blow it).
    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    from multimodal_sam_adapter_tpu.engine.train import (
        init_train_state, make_train_step,
    )
    from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
    from multimodal_sam_adapter_tpu.parallel.mesh import (
        make_mesh, replicate, shard_batch,
    )
    from tests.test_model_forward import TINY_BACKBONE

    model = EncoderDecoder(num_classes=5, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    state = init_train_state(
        model, (1, 64, 64, 6), jax.random.PRNGKey(0),
        optimizer_kwargs=dict(steps_per_epoch=4, max_epochs=3,
                              warmup_epochs=1, grad_accum_steps=1),
    )
    step = make_train_step(model, ohem_min_kept=128, donate=False)

    mesh = make_mesh(("data",))  # 2 global devices, 1 per process
    state = replicate(state, mesh)

    # deterministic GLOBAL batch; this process contributes rows [pid]
    rng_np = np.random.default_rng(4)
    img = rng_np.normal(size=(2, 64, 64, 6)).astype(np.float32)
    gt = rng_np.integers(0, 5, size=(2, 64, 64)).astype(np.int32)
    local = {"img": img[pid : pid + 1], "gt": gt[pid : pid + 1]}
    batch = shard_batch(local, mesh)
    for leaf in jax.tree.leaves(batch):
        assert leaf.shape[0] == 2, "global batch shape must be assembled"

    rng = jax.random.PRNGKey(3)
    losses = []
    for _ in range(2):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))

    leaves = jax.tree_util.tree_leaves(state.params)
    flat = {f"p{i}": np.asarray(x.addressable_data(0))
            for i, x in enumerate(leaves)}
    flat["losses"] = np.asarray(losses, np.float64)
    np.savez(out_npz, **flat)
    print(f"rank {pid} done", flush=True)
    multihost_utils.sync_global_devices("train_worker_done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
