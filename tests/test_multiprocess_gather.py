"""REAL cross-process eval gather: two jax.distributed.initialize'd CPU
processes each run their Evaluator.run() shard; the merged (allgathered)
histograms must equal the single-process full run on every rank.

This executes the actual collective path — parallel/mesh.py:gather_results
(multihost_utils.process_allgather over the 2-process 'cluster'), guarded
by jax.process_count() > 1 in evaluator.py — which no single-process test
can reach. Reference analogue: multi_gpu_test's collect_results_cpu/gpu
(apis/test_bs.py:363-722).
"""
import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_gather_equals_single_process(tmp_path):
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    coord = f"localhost:{_free_port()}"
    def env(rank):
        # per-rank compile caches: with a SHARED cache on this 1-core box,
        # the rank that compiles second hits entries the first just wrote
        # and races minutes ahead — past Gloo's 30s context-init deadline.
        # Separate (persistent) caches keep the cold-cache compile cost
        # symmetric, and the worker's post-initialize warmup collective
        # establishes the Gloo context before any drift can accumulate.
        return dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            JAX_COMPILATION_CACHE_DIR=f"/tmp/jax_test_cache_rank{rank}",
            PYTHONPATH=repo,
        )

    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, osp.join(repo, "tests", "_gather_worker.py"),
             coord, str(i), outs[i]],
            cwd=repo, env=env(i), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    # single-process oracle (same model init seed, same dataset)
    import jax
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
    full = Evaluator(engine, FakeDataset(), K, case_aware=True).run(
        shard=(0, 1))

    for out in outs:
        got = json.load(open(out))
        np.testing.assert_allclose(np.asarray(got["flat"]),
                                   full["payload"]["flat"])
        np.testing.assert_allclose(np.asarray(got["nested"]),
                                   full["payload"]["nested"])
        np.testing.assert_allclose(got["mIoU"], full["summary"]["mIoU"],
                                   atol=1e-9)
