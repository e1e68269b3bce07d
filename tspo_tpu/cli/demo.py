"""Demo CLI — replaces demo/llava_video_tspo.py / demo/qwen25vl_tspo.py:
score a long video with TSPO, select keyframes, optionally answer with a
backbone, and save the sampled-frame contact sheet.

  python -m tspo_tpu.cli.demo --video path.mp4 --question "What happens?" \
      --model-path /ckpt/TSPO-0.4B [--backbone llava_video --backbone-path ..]
"""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="TSPO demo")
    p.add_argument("--video", required=True)
    p.add_argument("--question", required=True)
    p.add_argument("--model-path", default=None)
    p.add_argument("--backbone", default=None,
                   choices=[None, "stub", "llava_video", "qwen2_5_vl"])
    p.add_argument("--backbone-path", default=None)
    p.add_argument("--conv-template", default=None,
                   help="conversation template (qwen_1_5, vicuna_v1, "
                        "chatml_direct, ... — models/conversation.py)")
    p.add_argument("--sample-num", type=int, default=64)
    p.add_argument("--window-size", type=int, default=12)
    p.add_argument("--method", default="topk",
                   choices=["topk", "bin-max", "aks"])
    p.add_argument("--max-candidates", type=int, default=50000)
    p.add_argument("--tiny", action="store_true",
                   help="tiny test config (CPU smoke runs)")
    p.add_argument("--contact-sheet", default="sampled_frames_TSPO.jpg")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()
    import numpy as np
    from ..video.reader import load_video
    from .common import load_backbone, load_scorer

    scorer = load_scorer(args.model_path, tiny=args.tiny)
    frames, _, video_time = load_video(args.video,
                                       max_frames_num=args.max_candidates,
                                       fps=1, min_frames_num=0)
    print(f"{len(frames)} candidate frames ({video_time:.0f}s video)")
    # demo cap: >600 candidates -> select 64 (demo/llava_video_tspo.py:34-36)
    sample_num = args.sample_num if len(frames) <= 600 else min(args.sample_num, 64)
    idx, scores = scorer(frames, args.question, sample_num=sample_num,
                         window_size=args.window_size, method=args.method)
    print(f"selected {len(idx)} frames: {list(map(int, idx))}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        sel = frames[np.asarray(idx)]
        n = len(sel)
        ncols = int(np.ceil(np.sqrt(n)))
        nrows = int(np.ceil(n / ncols))
        fig, axes = plt.subplots(nrows, ncols, figsize=(ncols * 2, nrows * 1.5))
        for j, ax in enumerate(np.atleast_2d(axes).flat):
            ax.axis("off")
            if j < n:
                ax.imshow(sel[j])
                ax.set_title(str(int(idx[j])), fontsize=9, color="red")
        fig.savefig(args.contact_sheet, dpi=120, bbox_inches="tight")
        print(f"contact sheet -> {args.contact_sheet}")
    except Exception as e:
        print(f"(no contact sheet: {e})")

    if args.backbone:
        backbone = load_backbone(args.backbone, args.backbone_path,
                                 conv_template=args.conv_template,
                                 max_frames_num=args.sample_num)
        answer = backbone.generate(frames[np.asarray(idx)], args.question)
        print(f"answer: {answer}")


if __name__ == "__main__":
    main()
