"""Ground the bench.py baseline denominator with measurements + roofline.

The reference (Hui-design/TSPO) publishes no throughput numbers (BASELINE.md),
so the "reference GPU frames-scored/sec" denominator must be derived.  Its
scoring pipeline per frame (mp_tools/vlmeval/vlm/gen_id_tspo.py:68-73 +
model/temporal_agent.py:151-169) is:

  decord 1-fps decode -> PIL Image.fromarray -> CLIPProcessor (PIL bicubic
  resize + center crop + normalize, one frame at a time on the host CPU) ->
  torch CLIPModel.get_image_features (GPU) -> selector (negligible).

This script MEASURES the two components the reference would run on any host:
  1. the per-frame PIL/CLIPProcessor preprocessing loop (host CPU work that a
     GPU cannot accelerate — the reference keeps it on the dataloader thread);
  2. torch CLIP-ViT-L/14 fp32 forward on this host's CPU (anchor only).

and DERIVES the GPU-side ceiling from first principles:
  CLIP-ViT-L/14 forward ~= 2 * 304e6 params * 257 tokens ~= 156 GFLOP/frame.
  A100 bf16 peak 312 TFLOP/s at a generous 50% MFU -> ~1000 frames/s compute.
  The reference pipeline is singled-threaded through PIL preprocessing
  (extract_feature's python loop, temporal_agent.py:157-164), so its
  end-to-end rate is min(preprocess_rate, gpu_compute_rate).

Run:  python scripts/measure_reference_baseline.py [--frames 96]
Prints one JSON line with the measured rates and the derived baseline.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_preprocess(n_frames: int, h: int = 480, w: int = 640) -> float:
    """Frames/s of the reference's host preprocessing: PIL wrap + HF
    CLIPImageProcessor (resize/crop/rescale/normalize), exactly the
    per-frame loop of temporal_agent.py:157-164."""
    from PIL import Image
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor()  # openai/clip-vit-large-patch14 defaults
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
    # warm
    proc(images=[Image.fromarray(frames[0])], return_tensors="np")
    t0 = time.perf_counter()
    imgs = [Image.fromarray(f) for f in frames]
    proc(images=imgs, return_tensors="np")
    dt = time.perf_counter() - t0
    return n_frames / dt


def measure_torch_cpu_forward(n_frames: int = 8) -> float:
    """Frames/s of torch CLIPModel.get_image_features on this host's CPU
    (fp32, random weights — throughput does not depend on values)."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    cfg = CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                           num_hidden_layers=24, num_attention_heads=16,
                           image_size=224, patch_size=14, projection_dim=768)
    with torch.no_grad():
        model = CLIPVisionModelWithProjection(cfg).eval()
        pixels = torch.randn(n_frames, 3, 224, 224)
        model(pixel_values=pixels[:1])  # warm
        t0 = time.perf_counter()
        model(pixel_values=pixels)
        dt = time.perf_counter() - t0
    return n_frames / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--cpu-fwd-frames", type=int, default=8)
    ap.add_argument("--skip-cpu-forward", action="store_true")
    args = ap.parse_args()

    prep_fps = measure_preprocess(args.frames)
    cpu_fwd_fps = None if args.skip_cpu_forward else \
        measure_torch_cpu_forward(args.cpu_fwd_frames)

    GFLOP_PER_FRAME = 156.0          # 2 * 304M params * 257 tokens
    A100_BF16_TFLOPS = 312.0
    GENEROUS_MFU = 0.5
    gpu_compute_fps = A100_BF16_TFLOPS * 1e3 * GENEROUS_MFU / GFLOP_PER_FRAME

    derived = min(prep_fps, gpu_compute_fps)
    print(json.dumps({
        "preprocess_fps_measured": round(prep_fps, 1),
        "torch_cpu_forward_fps_measured": (
            None if cpu_fwd_fps is None else round(cpu_fwd_fps, 2)),
        "gpu_compute_fps_derived": round(gpu_compute_fps, 1),
        "gflop_per_frame": GFLOP_PER_FRAME,
        "reference_pipeline_fps_derived": round(derived, 1),
        "note": "reference end-to-end = min(host preprocess, GPU compute); "
                "see module docstring for the derivation",
    }))


if __name__ == "__main__":
    main()
