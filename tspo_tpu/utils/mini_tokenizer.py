"""Write a minimal, fully valid CLIP BPE tokenizer directory.

Used by rehearsal/synthetic-artifact paths (scripts/validate_real_weights.py
dry runs, tokenizer-failure tests, spec-decode acceptance benches) in the
zero-egress container where the real openai/clip-vit-large-patch14 tokenizer
files cannot be downloaded.  The files load through the SAME
``CLIPTokenizerFast.from_pretrained`` path a real merged TSPO-0.4B dir uses
(cli/common.py::make_clip_tokenizer), so the load machinery under rehearsal
is the production machinery — only the vocab is small.

Character inventory mirrors CLIP's byte-level lowercasing: ascii letters,
digits, and common punctuation, each in mid-word and end-of-word (``</w>``)
form, with ``<|startoftext|>``/``<|endoftext|>`` specials at the reference
ids' roles (bos=0 here; the real CLIP uses 49406/49407 — models under test
read eos from their config, not from this vocab).
"""

from __future__ import annotations

import json
import os
import string

_CHARS = string.ascii_lowercase + string.digits + string.punctuation + " "


def write_mini_clip_tokenizer(path: str, *, model_max_length: int = 77) -> str:
    """Create ``vocab.json`` + ``merges.txt`` + ``tokenizer_config.json`` +
    ``special_tokens_map.json`` in ``path`` and return ``path``."""
    os.makedirs(path, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    i = 2
    for ch in _CHARS:
        if ch == " ":
            continue
        vocab[ch] = i
        i += 1
        vocab[ch + "</w>"] = i
        i += 1
    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(path, "tokenizer_config.json"), "w",
              encoding="utf-8") as f:
        json.dump({"tokenizer_class": "CLIPTokenizer",
                   "model_max_length": model_max_length,
                   "bos_token": "<|startoftext|>",
                   "eos_token": "<|endoftext|>",
                   "pad_token": "<|endoftext|>",
                   "unk_token": "<|endoftext|>"}, f)
    with open(os.path.join(path, "special_tokens_map.json"), "w",
              encoding="utf-8") as f:
        json.dump({"bos_token": "<|startoftext|>",
                   "eos_token": "<|endoftext|>",
                   "pad_token": "<|endoftext|>",
                   "unk_token": "<|endoftext|>"}, f)
    return path


def _bytes_to_unicode() -> dict:
    """GPT-2/Qwen2 byte->unicode table: printable bytes map to themselves,
    the rest shift past 255 — the standard byte-level BPE alphabet, so a
    vocab of all 256 symbols encodes ANY text with zero merges."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


def write_mini_qwen2_tokenizer(path: str) -> int:
    """Create a minimal valid Qwen2 (byte-level BPE) tokenizer dir in
    ``path`` and return its total vocab size (including specials).

    Loads through the production ``AutoTokenizer.from_pretrained`` path that
    ``load_backbone('llava_video', dir)`` uses (cli/common.py), so runbook
    rehearsals drive the real tokenizer machinery.  The 256-symbol byte
    alphabet + empty merges tokenizes arbitrary text byte-by-byte; the
    chat-template specials sit at the END like real Qwen2 checkpoints."""
    os.makedirs(path, exist_ok=True)
    vocab = {ch: i for i, ch in enumerate(_bytes_to_unicode().values())}
    for sp in ("<|endoftext|>", "<|im_start|>", "<|im_end|>"):
        vocab[sp] = len(vocab)
    with open(os.path.join(path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(path, "tokenizer_config.json"), "w",
              encoding="utf-8") as f:
        json.dump({"tokenizer_class": "Qwen2Tokenizer",
                   "model_max_length": 32768,
                   "eos_token": "<|im_end|>",
                   "pad_token": "<|endoftext|>",
                   "unk_token": None, "bos_token": None}, f)
    with open(os.path.join(path, "special_tokens_map.json"), "w",
              encoding="utf-8") as f:
        json.dump({"eos_token": "<|im_end|>",
                   "pad_token": "<|endoftext|>",
                   "additional_special_tokens": ["<|im_start|>",
                                                 "<|im_end|>"]}, f)
    return len(vocab)
