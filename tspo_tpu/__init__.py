"""tspo_tpu — TPU-native temporal sampling policy optimization framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Hui-design/TSPO:
question-conditioned keyframe selection for long-video QA, trained with a
GRPO-style policy-gradient loop against a frozen 7B Video-MLLM backbone.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  ops/       pure-jax selection ops (topk / bin-max / AKS / gumbel-ST), banded
             window attention, positional encodings
  models/    CLIP-L/14 towers, MultiModalAlign selector, TSPO merged model,
             Qwen2 decoder, SigLIP tower, LLaVA-Video + Qwen2.5-VL backbones
  parallel/  device mesh, sharding rules, collectives
  video/     host-side decode (native C++ ffmpeg + cv2 fallback), feature cache,
             needle-in-haystack augmentation
  train/     GRPO trainer, rewards, optimizer
  eval/      two-phase evaluation: frame-index precompute + benchmark harness
"""

__version__ = "0.1.0"
