"""CLI smoke tests — the L7 shell layer end-to-end with stub backbones."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from tspo_tpu.cli import demo as demo_cli
from tspo_tpu.cli import evaluate as evaluate_cli
from tspo_tpu.cli import precompute as precompute_cli
from tspo_tpu.cli import train as train_cli


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    (root / "videos").mkdir()
    for i in range(2):
        w = cv2.VideoWriter(str(root / "videos" / f"v{i}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
        for j in range(120):
            w.write(np.full((48, 48, 3), (j * 2 + i * 40) % 255, np.uint8))
        w.release()
    # toy training jsonl (C15 schema)
    with open(root / "toy.jsonl", "w") as f:
        for i in range(2):
            f.write(json.dumps({
                "video": f"videos/v{i}.mp4",
                "original_question": "<image>\nWhat?\nA. x\nB. y Please respond "
                                     "with only the letter of the correct answer.",
                "problem": "What?",
                "solution": "<answer>a</answer>",
                "complete_answer": "A. x",
                "type": "general"}) + "\n")
    # phase-1 TSV
    with open(root / "Bench.tsv", "w") as f:
        f.write("index\ttask_name\tvideo_name\tquestion_id\tquestion\t"
                "answer_number\tcandidates\tanswer\n")
        for i in range(2):
            f.write(f"{i}\tBench\tv{i}.mp4\tq{i}\tWhat {i}?\t0\t"
                    f"['x', 'y']\tA\n")
    # phase-2 annotations
    with open(root / "anno.json", "w") as f:
        json.dump([{"question_id": f"q{i}", "question": f"What {i}?",
                    "options": ["A. x", "B. y"], "answer": "A",
                    "duration": "short", "domain": "d", "sub_category": "s",
                    "task_type": "t", "videoID": f"v{i}.mp4"}
                   for i in range(2)], f)
    return root


def test_train_cli_toy(workspace, capsys):
    out = workspace / "train_out"
    train_cli.main([
        "--toy-jsonl-path", str(workspace / "toy.jsonl"),
        "--video-folder", str(workspace),
        "--backbone", "stub", "--max-steps", "2", "--tiny",
        "--num-generations", "2", "--training-sample-len", "4",
        "--window-size", "4",
        "--output-dir", str(out),
        "--export-merged", str(out / "merged"),
    ])
    assert os.path.exists(out / "metrics.jsonl")
    assert os.path.exists(out / "merged" / "tspo_params.npz")
    assert "trained 2 steps" in capsys.readouterr().out


def test_train_cli_batched_honors_epochs(workspace, capsys):
    """--num-train-epochs with --batch-size: the batched loop must derive
    its length from epochs x ceil(N/BW) (HF Trainer semantics), not run the
    default --max-steps (the round-3 review found it trained 500x too long
    on short datasets)."""
    out = workspace / "train_out_epochs"
    train_cli.main([
        "--toy-jsonl-path", str(workspace / "toy.jsonl"),
        "--video-folder", str(workspace),
        "--backbone", "stub", "--tiny", "--batch-size", "2",
        "--num-train-epochs", "1",
        "--num-generations", "2", "--training-sample-len", "4",
        "--window-size", "4",
        "--output-dir", str(out),
    ])
    # 2-row dataset, batch 2, world 1 -> 1 step per epoch
    assert "trained 1 steps" in capsys.readouterr().out


def test_precompute_and_evaluate_cli(workspace, capsys):
    out_json = str(workspace / "Bench_frameIdx.json")
    precompute_cli.main([
        "--data", "Bench", "--tsv", str(workspace / "Bench.tsv"),
        "--video-root", str(workspace / "videos"),
        "--work-dir", str(workspace / "work"),
        "--cache-root", str(workspace / "cache"),
        "--sample-num", "8", "--max-frames", "512", "--tiny",
        "--anno-json", str(workspace / "anno.json"),
        "--out-json", out_json,
    ])
    txt = capsys.readouterr().out
    assert "2 questions scored" in txt
    docs = json.load(open(out_json))
    assert all("frame_idx" in d for d in docs)

    evaluate_cli.main([
        "--task", "VideoMME", "--frame-idx-json", out_json,
        "--video-root", str(workspace / "videos"),
        "--backbone", "stub", "--max-frames-num", "8",
        "--output", str(workspace / "results"),
    ])
    txt = capsys.readouterr().out
    assert "overall" in txt and "| VideoMME" in txt
    results = [f for f in os.listdir(workspace / "results") if f.endswith(".json")]
    assert results


def test_demo_cli(workspace, capsys):
    sheet = str(workspace / "sheet.jpg")
    demo_cli.main([
        "--video", str(workspace / "videos" / "v0.mp4"),
        "--question", "What happens?",
        "--sample-num", "8", "--window-size", "4", "--tiny",
        "--contact-sheet", sheet,
        "--backbone", "stub",
    ])
    txt = capsys.readouterr().out
    assert "selected 8 frames" in txt
    assert "answer: A" in txt
    assert os.path.exists(sheet)


def test_load_scorer_from_torch_merged_dir(tmp_path):
    """Reference-format merged checkpoint directory (safetensors) loads with
    config inferred from tensor shapes (no config.json needed)."""
    torch = pytest.importorskip("torch")
    safetensors = pytest.importorskip("safetensors.torch")
    import transformers
    from tspo_tpu.cli.common import load_scorer
    from tspo_tpu.models.clip import clip_config_from_state_dict

    # "real-geometry-mini" CLIP: 64-dim heads so the inference rule holds
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(vocab_size=512, hidden_size=128, intermediate_size=512,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=16, projection_dim=96,
                         eos_token_id=511, hidden_act="quick_gelu"),
        vision_config=dict(hidden_size=128, intermediate_size=512,
                           num_hidden_layers=2, num_attention_heads=2,
                           patch_size=8, image_size=32, projection_dim=96,
                           hidden_act="quick_gelu"),
        projection_dim=96)
    torch.manual_seed(0)
    clip = transformers.CLIPModel(hf_cfg)
    sd = dict(clip.state_dict())
    for name in ("temporal.Self_q", "temporal.Self_k", "temporal.Self_v",
                 "temporal.ffn_o", "mlp.0", "mlp.2"):
        sd[f"selector.{name}.weight"] = torch.randn(96, 96) * 0.02
        sd[f"selector.{name}.bias"] = torch.zeros(96)
    ckpt = tmp_path / "TSPO-mini"
    ckpt.mkdir()
    safetensors.save_file({k: v.contiguous() for k, v in sd.items()},
                          str(ckpt / "model.safetensors"))
    from tspo_tpu.utils.mini_tokenizer import write_mini_clip_tokenizer
    write_mini_clip_tokenizer(str(ckpt))

    inferred = clip_config_from_state_dict(
        {k: v.numpy() for k, v in sd.items() if not k.startswith("selector.")})
    assert inferred.text.width == 128 and inferred.vision.layers == 2
    assert inferred.vision.image_size == 32 and inferred.text.eos_token_id == 511

    import jax.numpy as jnp
    scorer = load_scorer(str(ckpt), dtype=jnp.float32, batch_frames=16)
    frames = np.random.default_rng(0).integers(0, 256, (20, 32, 32, 3),
                                               dtype=np.uint8)
    idx, logits = scorer(frames, "what?", sample_num=8)
    assert len(idx) == 8 and np.all(np.isfinite(logits))


def test_missing_tokenizer_raises_loudly(tmp_path):
    """A real --model-path whose dir has weights but NO tokenizer files must
    raise with a runbook message, never fall back to the char-hash stub
    (round-3 VERDICT weak #2: silent degradation would phase-1-score every
    benchmark with garbage text features).  The reference fails loudly here
    too (CLIPProcessor.from_pretrained raises)."""
    from tspo_tpu.cli.common import make_clip_tokenizer
    bad = tmp_path / "ckpt-no-tok"
    bad.mkdir()
    (bad / "model.safetensors").write_bytes(b"")
    with pytest.raises(RuntimeError, match="no usable tokenizer"):
        make_clip_tokenizer(str(bad))


def test_stub_tokenizer_reserved_for_no_model_path():
    """bench/smoke paths (model_path=None / tiny) still run on the stub."""
    from tspo_tpu.cli.common import load_scorer
    scorer = load_scorer(None, tiny=True)
    frames = np.zeros((6, 32, 32, 3), np.uint8)
    idx, logits = scorer(frames, "what?", sample_num=4)
    assert len(idx) == 4 and np.all(np.isfinite(logits))


def test_evaluate_config_yaml_multi_run(workspace, tmp_path, capsys):
    """--config yaml drives multiple sequential runs (reference lmms-eval
    --config, __main__.py:86-108)."""
    import yaml
    # build a frame-idx json the runs can share
    docs = [{"question_id": "q0", "question": "What?",
             "options": ["A. x", "B. y"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": "v0.mp4",
             "frame_idx": [0, 3, 6]}]
    fij = tmp_path / "docs.json"
    fij.write_text(json.dumps(docs))
    cfg = [{"task": "VideoMME", "output": str(tmp_path / "r1")},
           {"task": "VideoMME", "output": str(tmp_path / "r2"),
            "uniform": True}]
    cfg_path = tmp_path / "runs.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    evaluate_cli.main([
        "--config", str(cfg_path),
        "--frame-idx-json", str(fij),
        "--video-root", str(workspace / "videos"),
        "--backbone", "stub", "--max-frames-num", "4",
    ])
    assert list((tmp_path / "r1").glob("VideoMME_*.json"))
    assert list((tmp_path / "r2").glob("VideoMME_*.json"))


def test_evaluate_config_equals_form_and_false_override(workspace, tmp_path):
    """--config=path works, a false boolean in an entry overrides a CLI
    store_true flag, and a failing run doesn't kill the sweep (code-review
    r2 batch-5 findings)."""
    import yaml
    docs = [{"question_id": "q0", "question": "What?",
             "options": ["A. x", "B. y"], "answer": "A",
             "duration": "short", "domain": "d", "sub_category": "s",
             "task_type": "t", "videoID": "v0.mp4",
             "frame_idx": [0, 3, 6]}]
    fij = tmp_path / "docs.json"
    fij.write_text(json.dumps(docs))
    cfg = [{"task": "NoSuchTask", "output": str(tmp_path / "bad")},
           {"task": "VideoMME", "uniform": False,
            "output": str(tmp_path / "good")}]
    cfg_path = tmp_path / "runs.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    evaluate_cli.main([
        f"--config={cfg_path}",
        "--frame-idx-json", str(fij),
        "--video-root", str(workspace / "videos"),
        "--backbone", "stub", "--max-frames-num", "4", "--uniform",
    ])
    # run 1 failed (unknown task) but run 2 still produced results
    out = list((tmp_path / "good").glob("VideoMME_*.json"))
    assert out
    cfgdump = json.load(open(out[0]))["config"]
    assert cfgdump["uniform"] is False   # entry overrode the CLI flag
