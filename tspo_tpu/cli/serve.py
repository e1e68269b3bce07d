"""Serving CLI: hold the TSPO scorer (and optionally a backbone) hot and
answer scoring/QA requests over HTTP.

  python -m tspo_tpu.cli.serve --model-path ckpt/TSPO-0.4B --port 8000 \
      [--backbone llava_video --backbone-path ckpt/LLaVA-Video-7B-Qwen2]
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="TSPO scoring service")
    p.add_argument("--model-path", default=None)
    p.add_argument("--backbone", default=None,
                   choices=[None, "stub", "llava_video", "qwen2_5_vl"])
    p.add_argument("--backbone-path", default=None)
    p.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative decoding for /v1/answer "
                        "B=1 requests (exact greedy, fewer weight passes)")
    p.add_argument("--quantize", action="store_true",
                   help="int8 vision tower")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-candidates", type=int, default=50000)
    p.add_argument("--batch-window", type=float, default=0.0,
                   help="micro-batching window (s) for /v1/answer: requests "
                        "arriving together decode as one ragged batch "
                        "(needs a backbone with generate_batch_multi)")
    p.add_argument("--max-batch", type=int, default=4,
                   help="max requests per micro-batch (HBM-bound; B=4 at "
                        "64-frame prompts exceeds one v5e)")
    p.add_argument("--continuous", type=int, default=0, metavar="SLOTS",
                   help="continuous batching for /v1/answer and chat "
                        "completions: SLOTS concurrent decode rows; requests "
                        "join/leave the running batch at chunk boundaries "
                        "(serve/continuous.py; supersedes --batch-window)")
    p.add_argument("--continuous-chunk", type=int, default=8,
                   help="decode steps per engine dispatch (retirement/"
                        "admission latency quantum)")
    p.add_argument("--continuous-max-prompt", type=int, default=13312,
                   help="engine prompt-region size in tokens; longer prompts "
                        "fall back to solo decode (64-frame LLaVA prompts "
                        "are ~12.2k)")
    p.add_argument("--continuous-decode-slots", type=int, default=512,
                   help="engine decode-region size = max tokens one request "
                        "may generate")
    p.add_argument("--continuous-prefill-chunk", type=int, default=0,
                   help="chunked admission: solo prompts arriving while "
                        "rows decode prefill in pieces of this many tokens "
                        "between decode chunks (0 = whole-prompt prefill); "
                        "e.g. 2048")
    p.add_argument("--tp", type=int, default=0, metavar="N",
                   help="tensor-parallel serving over N devices: shards the "
                        "backbone (Megatron specs) and the continuous "
                        "engine's KV cache over a 'model' mesh axis; "
                        "token-identical to single-device "
                        "(remaining devices form the 'data' axis)")
    p.add_argument("--prefix-cache", type=int, default=0, metavar="VIDEOS",
                   help="cross-request video prefix-KV cache (vLLM APC "
                        "analog): keep the system+video prompt KV for the "
                        "last N (video, frames) keys so independent warm "
                        "same-video questions prefill only their own text "
                        "(~0.9 GB KV per video at 7B/64-frame).  With "
                        "--continuous the pool lives inside the engine: "
                        "warm admissions skip the video prefill while "
                        "other tenants keep decoding")
    p.add_argument("--max-sessions", type=int, default=4,
                   help="LRU cap on /v1/answer chat sessions (session_id "
                        "conversations; each holds one prefix-KV cache, "
                        "~0.9 GB at the 7B/64-frame geometry)")
    p.add_argument("--video-feature-cache", type=int, default=2,
                   help="per-video image-feature LRU size in videos (~150 MB "
                        "host RAM per 50k-frame video); 0 = always run the "
                        "fused single-dispatch video program")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the compile warmup before serving")
    p.add_argument("--tiny", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    from ..serve.server import ScoringService, create_server
    from .common import load_backbone, load_scorer

    scorer = load_scorer(args.model_path, tiny=args.tiny)
    if args.quantize:
        scorer.quantize()
    backbone = (load_backbone(args.backbone, args.backbone_path,
                               speculative=args.speculative)
                if args.backbone else None)
    mesh = None
    if args.tp > 1:
        import jax
        n = len(jax.devices())
        if n % args.tp:
            raise SystemExit(f"--tp {args.tp} does not divide the "
                             f"{n} visible devices")
        from ..parallel import create_mesh
        mesh = create_mesh(data=n // args.tp, model=args.tp)
        if backbone is not None and hasattr(backbone, "params"):
            from ..models.llava_video import llava_video_param_shardings
            from ..models.qwen25vl import qwen25vl_param_shardings
            shard_fn = (qwen25vl_param_shardings
                        if "visual" in backbone.params
                        else llava_video_param_shardings)
            backbone.params = jax.device_put(
                backbone.params, shard_fn(backbone.params, mesh))
        if hasattr(scorer, "clip_params"):
            from ..parallel.mesh import clip_param_shardings
            scorer.clip_params = jax.device_put(
                scorer.clip_params,
                clip_param_shardings(scorer.clip_params, mesh))
        print(f"tensor-parallel: model={args.tp}, data={n // args.tp}")
    if args.continuous and args.speculative:
        print("note: --continuous routes answers through the batched "
              "engine, which does not speculate; --speculative still "
              "applies to prompts that overflow the engine and fall back "
              "to solo decode")
    service = ScoringService(scorer=scorer, backbone=backbone,
                             max_candidates=args.max_candidates,
                             batch_window_s=args.batch_window,
                             max_batch=args.max_batch,
                             video_feature_cache=args.video_feature_cache,
                             max_sessions=args.max_sessions,
                             continuous_slots=args.continuous,
                             continuous_chunk=args.continuous_chunk,
                             continuous_max_prompt=args.continuous_max_prompt,
                             continuous_decode_slots=args.continuous_decode_slots,
                             continuous_prefill_chunk=args.continuous_prefill_chunk,
                             prefix_cache=args.prefix_cache,
                             mesh=mesh)
    if not args.no_warmup:
        print("warming up (compiling scoring programs)...")
        service.warmup()
    server = create_server(service, args.host, args.port)
    print(f"tspo scoring service on {args.host}:{args.port} "
          f"(backbone: {args.backbone or 'none'})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
