"""tspo-finetune — SFT / DPO finetuning of the backbone LM.

CLI over train/finetune.py (the reference's `llava/train/train.py` /
`train_dpo.py` entry points, minus HF/DeepSpeed ceremony).  Data formats:

  SFT jsonl (llava conversations): {"conversations": [{"from": "human",
      "value": "..."}, {"from": "gpt", "value": "..."}]}
  DPO jsonl (train_dpo.py DPODataset schema): {"prompt": "...",
      "chosen": "...", "rejected": "..."}

Tokenization: --tokenizer-path loads an HF tokenizer when available;
the default byte-level encoder keeps the CLI runnable with zero assets
(toy/smoke runs — the loss masking and update paths are identical).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("tspo-finetune")
    p.add_argument("--data-jsonl", required=True)
    p.add_argument("--mode", choices=("sft", "dpo"), default="sft")
    p.add_argument("--tiny", action="store_true",
                   help="tiny qwen2 config (CPU smoke); default is 7B")
    p.add_argument("--tokenizer-path", default=None,
                   help="HF tokenizer dir; default byte-level encoder")
    p.add_argument("--backbone-path", default=None,
                   help="torch checkpoint to finetune from (random init "
                        "otherwise)")
    p.add_argument("--max-steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--beta", type=float, default=0.1,
                   help="DPO beta (reference train_dpo.py:165)")
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--lora-rank", type=int, default=0,
                   help=">0 enables LoRA: train only rank-r adapters on the "
                        "per-layer GEMMs (reference lora_enable/peft path)")
    p.add_argument("--lora-alpha", type=float, default=32.0)
    p.add_argument("--merge-lora", action="store_true",
                   help="fold adapters into base kernels before saving")
    p.add_argument("--output-dir", default="finetune_out")
    p.add_argument("--seed", type=int, default=0)
    return p


def _byte_encode(text: str) -> list:
    return [2 + b for b in text.encode("utf-8")]


BYTE_SPECIALS = dict(im_start=260, im_end=261, newline=2 + ord("\n"))


def _load_tokenizer(path):
    from ..train.finetune import ChatMLSpecials
    if path is None:
        return _byte_encode, ChatMLSpecials(**BYTE_SPECIALS)
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(path)
    # look the chatml markers up BY STRING — additional_special_tokens
    # ordering is tokenizer-specific and may not even contain them
    im_start, im_end = tok.convert_tokens_to_ids(["<|im_start|>",
                                                  "<|im_end|>"])
    unk = getattr(tok, "unk_token_id", None)
    if im_start is None or im_end is None or im_start == unk or im_end == unk:
        raise ValueError(
            f"tokenizer at {path} has no <|im_start|>/<|im_end|> tokens — "
            "chatml finetuning needs a chatml-trained tokenizer (qwen2)")
    return (lambda t: tok(t, add_special_tokens=False).input_ids,
            ChatMLSpecials(im_start=im_start, im_end=im_end))


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .common import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from ..models.qwen2 import (Qwen2Config, init_qwen2_params,
                                qwen2_params_from_torch)
    from ..train.finetune import (make_dpo_step_ids, make_sft_step_ids,
                                  pad_to_length_bucket, preprocess_chatml)

    from .common import load_jsonl

    cfg = Qwen2Config.tiny() if args.tiny else Qwen2Config.llava_video_7b()
    encode, specials = _load_tokenizer(args.tokenizer_path)
    rows = load_jsonl(args.data_jsonl)   # blank-line tolerant, shared impl

    if args.backbone_path:
        import torch
        sd = torch.load(args.backbone_path, map_location="cpu",
                        weights_only=True)
        params = qwen2_params_from_torch(sd, cfg, jnp.float32, prefix="model.")
    else:
        params = init_qwen2_params(jax.random.PRNGKey(args.seed), cfg,
                                   jnp.float32)

    def pack(ids, labels):
        # length-bucketed so jit compiles once per bucket; ids (not embeds)
        # feed the step so the embedding table trains
        ids, labels, valid = pad_to_length_bucket(ids, labels, args.max_len)
        return (jnp.asarray(ids)[None], jnp.asarray(labels)[None],
                jnp.asarray(valid)[None])

    if args.lora_rank > 0:
        from ..models.qwen2 import add_lora
        from ..train.finetune import lora_optimizer
        params = add_lora(params, jax.random.PRNGKey(args.seed + 1),
                          rank=args.lora_rank, alpha=args.lora_alpha)
        optimizer = lora_optimizer(args.lr, params)
    else:
        optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(params)
    os.makedirs(args.output_dir, exist_ok=True)
    metrics_path = os.path.join(args.output_dir, "metrics.jsonl")
    mlog = open(metrics_path, "a")

    if args.mode == "sft":
        step_fn = make_sft_step_ids(optimizer, cfg)
        batches = []
        for r in rows:
            ids, labels = preprocess_chatml(r["conversations"], encode,
                                            specials)
            batches.append(pack(ids, labels))
        for step in range(args.max_steps):
            emb, lab, val = batches[step % len(batches)]
            params, opt_state, loss = step_fn(params, opt_state, emb, lab,
                                              val)
            mlog.write(json.dumps({"step": step, "loss": float(loss)}) + "\n")
            if step % 10 == 0:
                print(f"step {step}: loss {float(loss):.4f}")
    else:
        step_fn = make_dpo_step_ids(optimizer, cfg, beta=args.beta)
        ref_params = params

        def enc_pair(prompt, completion):
            convs = [{"from": "human", "value": prompt},
                     {"from": "gpt", "value": completion}]
            return pack(*preprocess_chatml(convs, encode, specials))

        pairs = [(enc_pair(r["prompt"], r["chosen"]),
                  enc_pair(r["prompt"], r["rejected"])) for r in rows]
        for step in range(args.max_steps):
            chosen, rejected = pairs[step % len(pairs)]
            params, opt_state, loss, m = step_fn(params, ref_params,
                                                 opt_state, chosen, rejected)
            rec = {"step": step, "loss": float(loss),
                   **{k: float(v) for k, v in m.items()}}
            mlog.write(json.dumps(rec) + "\n")
            if step % 10 == 0:
                print(f"step {step}: loss {float(loss):.4f} "
                      f"acc {rec['reward_accuracy']:.2f}")
    mlog.close()

    if args.lora_rank > 0 and args.merge_lora:
        from ..models.qwen2 import merge_lora
        params = merge_lora(params)
    out = os.path.join(args.output_dir, "params.npz")
    flat = {"/".join(map(str, [getattr(k, 'key', k) for k in path])):
            np.asarray(leaf) for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez(out, **flat)
    print(f"finetuned {args.max_steps} steps ({args.mode}); params -> {out}")


if __name__ == "__main__":
    main()
