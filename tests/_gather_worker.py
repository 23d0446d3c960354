"""Worker for tests/test_multiprocess_gather.py: one of two REAL
jax.distributed processes running a sharded Evaluator.run() whose results
are merged through parallel/mesh.py:gather_results (process_allgather) —
the analogue of the reference's collect_results_cpu/gpu rank-0 gather
(apis/test_bs.py:363-722).

Usage: python tests/_gather_worker.py <coord_addr> <process_id> <out_json>
"""
import json
import sys


def main():
    coord, pid, out_json = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax

    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2

    import numpy as np
    from jax.experimental import multihost_utils

    # Establish the Gloo clique NOW, while both ranks are in lockstep right
    # after the initialize() rendezvous: context *initialization* has a hard
    # 30s deadline, and on this 1-core box the ranks can drift minutes apart
    # during the model compile below (e.g. when one rank hits a compilation
    # cache the other just wrote). The real gather later reuses the context.
    multihost_utils.process_allgather(np.zeros((1,), np.float32))

    import jax.numpy as jnp

    from multimodal_sam_adapter_tpu.engine.evaluator import Evaluator
    from multimodal_sam_adapter_tpu.engine.inference import InferenceEngine
    from multimodal_sam_adapter_tpu.models.segmentor import EncoderDecoder
    from tests.test_evaluator_sharding import FakeDataset, K
    from tests.test_model_forward import TINY_BACKBONE

    model = EncoderDecoder(num_classes=K, head_channels=16,
                           backbone_cfg=TINY_BACKBONE)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 64, 64, 6)),
                           train=False)
    engine = InferenceEngine(model, variables, dict(mode="whole"))
    ev = Evaluator(engine, FakeDataset(), K, case_aware=True)
    # default shard = (process_index, process_count); with process_count==2
    # this executes the real _gather_shards -> process_allgather branch
    res = ev.run()
    payload = {
        "rank": pid,
        "flat": res["payload"]["flat"].tolist(),
        "nested": res["payload"]["nested"].tolist(),
        "mIoU": res["summary"]["mIoU"],
    }
    with open(out_json, "w") as f:
        json.dump(payload, f)
    print(f"rank {pid} done", flush=True)
    # explicit sync before exit: on a 1-core box the ranks' post-gather
    # work serializes, and >30s of drift blows the implicit shutdown
    # barrier (DEADLINE_EXCEEDED) even though the gather itself passed
    multihost_utils.sync_global_devices("gather_worker_done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
