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
