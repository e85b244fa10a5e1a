"""Multi-host training: 2 jax.distributed CPU processes drive the REAL
train CLI over a shared coordinator with UNEVEN per-host data.

This is the TPU-native analogue of the reference's torchrun elastic +
monitored-barrier join (reference: speech/train.py:165-321,
utils/train_utils.py:285-304), exercised the way SURVEY §4 prescribes:
a fake-backend multi-process test (CPU gloo collectives, 4 virtual
devices per process -> a global dp=4 x tp=2 mesh).

Covered: utils/distributed.initialize + uneven_join_batches, the
static-shape multi-host data path (fixed batch/pads), global batch
assembly via make_array_from_process_local_data, orbax multi-host
checkpointing, and the replicate-then-export npz path.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_train_cli import make_corpus

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(model_kind, corpus_list, model_dir, port, pid, export=None):
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""   # no TPU tunnel in workers
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO)
    argv = [
        sys.executable, "-m", "minimax_speech_tpu.cli.train",
        "--model", model_kind, "--config", str(REPO / "configs/tiny.yaml"),
        "--train_data", str(corpus_list), "--model_dir", str(model_dir),
        "--max_epoch", "2", "--tp", "2",
        "--platform", "cpu",
        "--distributed", "--coordinator", f"127.0.0.1:{port}",
        "--num_processes", "2", "--process_id", str(pid),
        "--override", "train.batch_size=2",
        "--override", "train.pad_seq=128",
        "--override", "train.pad_tokens=64",
        "--override", "train.pad_ref=224",
        "--override", "train.save_per_step=100",
        "--override", "train.log_interval=1",
        "--override", "train.lr=0.0001",
    ]
    if export:
        argv += ["--export_npz", str(export)]
    return subprocess.Popen(argv, env=env, cwd=str(REPO),
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


@pytest.mark.slow
@pytest.mark.parametrize("model_kind", ["llm", "flow"])
def test_two_process_train(tmp_path, rng, model_kind):
    # 11 utterances -> host0 gets 6, host1 gets 5 (rank::world modulo);
    # with batch_size=2 drop_last that is 3 vs 2 local batches, so the
    # uneven join must stop BOTH hosts after 2 agreed steps per epoch.
    lst = make_corpus(tmp_path, rng, n=11)
    model_dir = tmp_path / f"dist_{model_kind}"
    port = _free_port()
    export = tmp_path / f"{model_kind}.npz" if model_kind == "llm" else None
    procs = [_spawn(model_kind, lst, model_dir, port, pid, export)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {pid} failed:\n{out[-4000:]}"

    rows = [json.loads(l) for l in
            (model_dir / f"{model_kind}_metrics.jsonl")
            .read_text().splitlines()]
    losses = [r["loss"] for r in rows if "loss" in r]
    # 2 agreed steps per epoch x 2 epochs
    assert len(losses) == 4, rows
    assert all(np.isfinite(l) for l in losses)

    if export is not None:
        from minimax_speech_tpu.utils.params_io import load_params
        params = load_params(export)
        assert "params" in params
        # tp-sharded leaves were re-assembled to full shapes
        leaves = [l for l in
                  __import__("jax").tree_util.tree_leaves(params)]
        assert all(np.all(np.isfinite(l)) for l in leaves)
