"""2-process multi-host integration test (VERDICT r2 missing-3).

`core.distributed.initialize_multihost` had never been EXECUTED — this
spawns two real OS processes that form a jax.distributed cluster over the
CPU backend (the DCN stand-in), build one global mesh (2 devices per
process -> 4), and run three data-parallel train steps on per-host data
shards. Both processes must see the same global topology and compute
IDENTICAL global losses — which can only happen if the cross-host
gradient/loss collectives actually ran.
"""
import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_step(tmp_path):
    import cv2
    import numpy as np

    # shared on-disk dataset for the host-sharded loader phase: 12 images,
    # 2 classes — each worker decodes a disjoint half
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        d = tmp_path / "train" / name
        os.makedirs(d)
        for i in range(6):
            cv2.imwrite(str(d / f"{i}.jpg"),
                        rng.integers(0, 255, (8, 8, 3), np.uint8))

    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PYTHONPATH"] = repo
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for i, o in enumerate(outs):
        assert o["info"]["process_count"] == 2
        assert o["info"]["local_device_count"] == 2
        assert o["info"]["global_device_count"] == 4
        assert o["info"]["process_index"] == i
    # the global loss is identical on both hosts ONLY if the cross-host
    # collective ran (each host holds different data shards)
    assert outs[0]["losses"] == outs[1]["losses"]
    assert outs[0]["losses"][0] != outs[0]["losses"][-1]  # it actually trained
    # hybrid dp(hosts) x tp(intra-host devices) — the pod layout: params
    # model-sharded inside each host, batch sharded across hosts
    assert outs[0]["losses_dp_tp"] == outs[1]["losses_dp_tp"]
    assert outs[0]["losses_dp_tp"][0] != outs[0]["losses_dp_tp"][-1]
    # host-sharded input pipeline: each host loaded a DISJOINT half of the
    # epoch (local bs 2 x 2 hosts -> global batches of 4), yet both see
    # identical GLOBAL batch means — the global array assembly + cross-host
    # collective actually ran over per-host data
    for o in outs:
        assert o["shard_shapes"] == [[4, 8, 8, 3]] * 3
    assert outs[0]["shard_means"] == outs[1]["shard_means"]
    h0, h1 = (set(o["local_order"]) for o in outs)
    assert len(h0) == len(h1) == 6 and not (h0 & h1)
    assert h0 | h1 == set(range(12))
    # evaluator over the unsharded val loader: identical metric on every
    # host (replicate_eval_outputs makes the fetch possible at all)
    assert outs[0]["eval_accuracy"] == outs[1]["eval_accuracy"]
    assert 0.0 <= outs[0]["eval_accuracy"] <= 1.0
    # cross-process-sharded (FSDP) checkpoint round-trips on both hosts
    assert outs[0]["ckpt_roundtrip"] and outs[1]["ckpt_roundtrip"]
