"""Two-process multi-host test: jax.distributed over a local coordinator
(CPU-simulated DCN) exercising parallel/multihost.py — the layer that replaces
the reference's torchrun/accelerate NCCL process group (SURVEY.md §2.5)."""

import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    rank = int(sys.argv[1])
    jax.distributed.initialize({addr!r}, num_processes=2, process_id=rank,
                               local_device_ids=[0, 1])
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tspo_tpu.parallel.multihost import (barrier, gather_host_objects,
                                             process_shard)
    assert jax.process_count() == 2
    assert process_shard() == (rank, 2)
    out = gather_host_objects({{"rank": rank, "metrics": {{"acc": rank * 0.5}}}})
    if rank == 0:
        assert out is not None and [o["rank"] for o in out] == [0, 1]
        print("GATHER_OK")
    else:
        assert out is None
    barrier("t")
    mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
    x = jax.device_put(jnp.ones(4), NamedSharding(mesh, P("data")))
    total = jax.jit(lambda v: v.sum(), out_shardings=NamedSharding(mesh, P()))(x)
    assert float(total) == 4.0
    print(f"RANK{{rank}}_DONE")
""")


def test_two_process_multihost(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import socket
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, addr=f"localhost:{port}"))
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(script), str(r)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True) for r in range(2)]
    outs = [p.communicate(timeout=110)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert "GATHER_OK" in outs[0]
    assert "RANK0_DONE" in outs[0] and "RANK1_DONE" in outs[1]


def test_two_process_distributed_precompute(tmp_path):
    """Two precompute CLI processes under one coordinator auto-shard the
    question list and produce complementary supp.pkl shards."""
    import numpy as np
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cv2 = pytest.importorskip("cv2")
    # fixtures
    (tmp_path / "videos").mkdir()
    for i in range(4):
        w = cv2.VideoWriter(str(tmp_path / "videos" / f"v{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
        for j in range(80):
            w.write(np.full((48, 48, 3), (j * 3 + i * 20) % 255, np.uint8))
        w.release()
    with open(tmp_path / "B.tsv", "w") as f:
        f.write("index\ttask_name\tvideo_name\tquestion_id\tquestion\t"
                "answer_number\tcandidates\tanswer\n")
        for i in range(4):
            f.write(f"{i}\tB\tv{i}.mp4\tq{i}\tWhat {i}?\t0\t['x','y']\tA\n")

    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for r in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tspo_tpu.cli.precompute",
             "--data", "B", "--tsv", str(tmp_path / "B.tsv"),
             "--video-root", str(tmp_path / "videos"), "--tiny",
             "--sample-num", "8", "--max-frames", "128",
             "--work-dir", str(tmp_path / f"w{r}"),
             "--cache-root", str(tmp_path / f"c{r}"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo, text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    import pickle
    # per-rank files since round 3 (multi-rank clobber fix): each world=2
    # shard writes TSPO_B_supp_rank{r}of2.pkl
    shards = [pickle.load(open(
        tmp_path / f"w{r}" / f"TSPO_B_supp_rank{r}of2.pkl", "rb"))
        for r in range(2)]
    all_q = set(shards[0]) | set(shards[1])
    assert all_q == {"q0", "q1", "q2", "q3"}
    assert set(shards[0]).isdisjoint(shards[1])  # actually sharded


def test_two_process_distributed_eval(tmp_path):
    """Two evaluate CLI processes under one coordinator auto-shard the doc
    list; rank 0 gathers and merges shards (harness.merge_shards — the NCCL
    gather_object of evaluator.py:602-626) and writes metrics IDENTICAL to a
    single-process run (round-3 VERDICT next-step #9)."""
    import json
    import numpy as np
    cv2 = pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    (tmp_path / "videos").mkdir()
    for i in range(4):
        w = cv2.VideoWriter(str(tmp_path / "videos" / f"v{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
        for j in range(40):
            w.write(np.full((48, 48, 3), (j * 3 + i * 20) % 255, np.uint8))
        w.release()
    docs = [{"question_id": f"q{i}", "question": f"What {i}?",
             "options": ["A. x", "B. y"], "answer": "A" if i % 2 else "B",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": f"v{i}.mp4",
             "frame_idx": list(range(8))} for i in range(4)]
    with open(tmp_path / "fidx.json", "w") as f:
        json.dump(docs, f)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    base = [sys.executable, "-m", "tspo_tpu.cli.evaluate",
            "--task", "VideoMME", "--frame-idx-json", str(tmp_path / "fidx.json"),
            "--video-root", str(tmp_path / "videos"), "--backbone", "stub",
            "--max-frames-num", "8"]

    # single-process reference run
    p = subprocess.run(base + ["--output", str(tmp_path / "single")],
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       env=env, cwd=repo, text=True, timeout=300)
    assert p.returncode == 0, p.stdout
    single = json.load(open(next((tmp_path / "single").glob("*.json"))))
    assert single["n"] == 4

    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        base + ["--output", str(tmp_path / "multi"),
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(r)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=repo, text=True) for r in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs

    merged_files = list((tmp_path / "multi").glob("VideoMME_rank0_*.json"))
    assert len(merged_files) == 1, outs  # rank 1 must NOT write output
    merged = json.load(open(merged_files[0]))
    assert merged["n"] == 4              # both shards present after merge
    assert merged["metrics"] == single["metrics"], outs


def test_two_process_distributed_training(tmp_path):
    """Two train CLI processes under one coordinator run batched DP steps
    with a globally-averaged gradient (train_deepspeed.sh multi-rank layout,
    VERDICT r1 next-step #5)."""
    import json
    import numpy as np
    cv2 = pytest.importorskip("cv2")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    w = cv2.VideoWriter(str(tmp_path / "v.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 1.0, (32, 32))
    for i in range(48):
        w.write(np.full((32, 32, 3), (i * 5) % 255, np.uint8))
    w.release()
    with open(tmp_path / "data.jsonl", "w") as f:
        for t in ("general", "general", "specific", "general"):
            f.write(json.dumps({
                "video": "v.mp4",
                "original_question": "<image>\nQ?\nA. x\nB. y",
                "solution": "<answer>a</answer>", "type": t}) + "\n")

    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for r in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "tspo_tpu.cli.train",
             "--jsonl-path", str(tmp_path / "data.jsonl"),
             "--video-folder", str(tmp_path), "--backbone", "stub", "--tiny",
             "--batch-size", "1", "--max-steps", "2",
             "--num-generations", "2", "--training-sample-len", "8",
             "--window-size", "4", "--output-dir", str(tmp_path / "out"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(r)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=repo, text=True))
    outs = [p.communicate(timeout=300)[0] for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert all("trained 2 steps" in o for o in outs), outs
    with open(tmp_path / "out" / "metrics.jsonl") as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 2
    assert all(np.isfinite(l["loss"]) for l in lines)
