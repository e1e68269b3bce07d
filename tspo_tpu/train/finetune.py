"""Backbone finetuning: SFT (masked-CE) and DPO for the LLaVA-Video stack.

TPU-native equivalent of the reference's vendored LLaVA trainers
(`llava/train/train.py:1449` SFT via HF Trainer + `train_dpo.py:1741`
LLaVADPOTrainer(trl.DPOTrainer), beta=0.1 `train_dpo.py:165`) — the part of
C44 with actual training logic.  The reference's 3.5k LoC is mostly HF/
DeepSpeed ceremony around three ideas, which are what this module builds:

  1. chatml conversation preprocessing with loss masking
     (`train.py:567-632 preprocess_qwen`): every turn rendered as
     ``<|im_start|>role\ncontent<|im_end|>\n``; system/user tokens get
     IGNORE_INDEX labels, assistant tokens are supervised, and the reference
     *always* unmasks im_start/im_end/"\n" (id 198) even inside user turns —
     that quirk is preserved because it changes the loss;
  2. masked next-token cross-entropy over the spliced video+text embedding
     sequence (SFT);
  3. the DPO sigmoid objective on summed completion log-probs against a
     frozen reference policy.

Design differences: losses are pure jittable functions over the qwen2 stack
(models/qwen2.py) usable under any mesh (the DP/TP shardings of parallel/);
the update loop is optax; ZeRO is unnecessary at these trainable sizes
(docs/PARITY.md §2.1 C16).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..models.llava_video import IMAGE_TOKEN_INDEX
from ..models.qwen2 import (KVCache, Qwen2Config, embed_tokens, lm_logits,
                            qwen2_forward)

IGNORE_INDEX = -100
NEWLINE_ID = 198          # reference unmask_tokens_idx (train.py:574)


@dataclass(frozen=True)
class ChatMLSpecials:
    """Token ids the preprocessing needs from the tokenizer."""

    im_start: int
    im_end: int
    newline: int = NEWLINE_ID


DEFAULT_SYSTEM = "You are a helpful assistant."

_ROLES = {"human": "user", "gpt": "assistant"}


def preprocess_chatml(conversations: Sequence[dict], encode: Callable,
                      specials: ChatMLSpecials,
                      system_message: str = DEFAULT_SYSTEM,
                      image_token_id: int | None = None):
    """Conversations -> (input_ids, labels) with reference masking semantics
    (train.py:567-632).  ``conversations`` entries carry from/value (llava
    jsonl) or role/content.  ``encode`` is plain text->ids (no specials).
    ``image_token_id``: the tokenizer's <image> id, rewritten to
    IMAGE_TOKEN_INDEX in input_ids for downstream splicing."""

    def turn_ids(role: str, content: str) -> list:
        return ([specials.im_start] + list(encode(f"{role}\n{content}"))
                + [specials.im_end, specials.newline])

    convs = list(conversations)
    if convs and _ROLES.get(convs[0].get("from", convs[0].get("role")),
                            convs[0].get("role")) != "user":
        convs = convs[1:]

    input_ids: List[int] = turn_ids("system", system_message)
    labels: List[int] = [IGNORE_INDEX] * len(input_ids)
    for conv in convs:
        role = conv.get("role", _ROLES.get(conv.get("from")))
        content = conv.get("content", conv.get("value"))
        ids = turn_ids(role, content)
        input_ids.extend(ids)
        if role in ("user", "system"):
            labels.extend([IGNORE_INDEX] * len(ids))
        else:
            labels.extend(ids)

    unmask = (specials.newline, specials.im_start, specials.im_end)
    for i, tok in enumerate(input_ids):
        if tok in unmask:
            labels[i] = tok
        if image_token_id is not None and tok == image_token_id:
            input_ids[i] = IMAGE_TOKEN_INDEX
    return input_ids, labels


# ---------------------------------------------------------------------------
# SFT
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def sft_loss(params, embeds: jnp.ndarray, labels: jnp.ndarray,
             valid: jnp.ndarray, cfg: Qwen2Config) -> jnp.ndarray:
    """Masked next-token CE: position i's hidden state predicts labels[i+1];
    IGNORE_INDEX positions contribute nothing (HF Trainer semantics).

    embeds [B, S, D] (video tokens already spliced), labels [B, S] int32
    (IGNORE_INDEX at video/user positions), valid [B, S] padding mask."""
    B, S, D = embeds.shape
    cache = KVCache.create(cfg, B, S, embeds.dtype)
    hidden, _ = qwen2_forward(params, embeds, cache, jnp.arange(S), valid,
                              cfg, flash_impl="jax")
    logits = lm_logits(params, hidden[:, :-1], cfg)         # [B, S-1, V]
    targets = labels[:, 1:]
    mask = (targets != IGNORE_INDEX) & valid[:, 1:]
    safe = jnp.where(mask, targets, 0)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    return -jnp.sum(tok_lp * mask) / jnp.maximum(jnp.sum(mask), 1)


# ---------------------------------------------------------------------------
# DPO
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def completion_logprob(params, embeds: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray, cfg: Qwen2Config) -> jnp.ndarray:
    """Summed log-prob of supervised positions per row [B] — trl's
    ``get_batch_logps`` with average_log_prob=False."""
    B, S, D = embeds.shape
    cache = KVCache.create(cfg, B, S, embeds.dtype)
    hidden, _ = qwen2_forward(params, embeds, cache, jnp.arange(S), valid,
                              cfg, flash_impl="jax")
    logits = lm_logits(params, hidden[:, :-1], cfg)
    targets = labels[:, 1:]
    mask = (targets != IGNORE_INDEX) & valid[:, 1:]
    safe = jnp.where(mask, targets, 0)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tok_lp = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask, axis=-1)


def dpo_loss(policy_params, ref_params, chosen, rejected,
             cfg: Qwen2Config, beta: float = 0.1):
    """DPO sigmoid loss (trl default, reference beta train_dpo.py:165).

    chosen/rejected: (embeds, labels, valid) tuples.  Returns (loss,
    metrics) with chosen/rejected implicit rewards and accuracy."""
    pol_c = completion_logprob(policy_params, *chosen, cfg)
    pol_r = completion_logprob(policy_params, *rejected, cfg)
    ref_c = completion_logprob(ref_params, *chosen, cfg)
    ref_r = completion_logprob(ref_params, *rejected, cfg)
    logits = beta * ((pol_c - ref_c) - (pol_r - ref_r))
    loss = -jnp.mean(jax.nn.log_sigmoid(logits))
    metrics = {
        "rewards_chosen": jnp.mean(beta * (pol_c - ref_c)),
        "rewards_rejected": jnp.mean(beta * (pol_r - ref_r)),
        "reward_accuracy": jnp.mean((pol_c - ref_c) > (pol_r - ref_r)),
    }
    return loss, metrics


# ---------------------------------------------------------------------------
# Update steps
# ---------------------------------------------------------------------------

LENGTH_BUCKETS = (64, 128, 256, 512, 1024, 2048, 4096)


def pad_to_length_bucket(ids, labels, max_len: int):
    """Pad token/label rows to the next length bucket so jitted steps
    compile once per bucket, not once per raw sequence length (the GRPO
    trainer does the same for frame counts via ops/masking.bucket_for)."""
    ids = list(ids)[:max_len]
    labels = list(labels)[:max_len]
    bucket = next((b for b in LENGTH_BUCKETS if b >= len(ids)),
                  LENGTH_BUCKETS[-1])
    bucket = min(bucket, max_len)
    pad = bucket - len(ids)
    valid = [True] * len(ids) + [False] * pad
    return (np.asarray(ids + [0] * pad, np.int32),
            np.asarray(labels + [IGNORE_INDEX] * pad, np.int32),
            np.asarray(valid, bool))


@partial(jax.jit, static_argnames=("cfg",))
def sft_loss_from_ids(params, ids: jnp.ndarray, labels: jnp.ndarray,
                      valid: jnp.ndarray, cfg: Qwen2Config) -> jnp.ndarray:
    """Text-only SFT loss over token ids: embedding lookup happens INSIDE the
    loss so the embedding table receives gradients (and tied lm_head configs
    stay consistent).  The embeds variant below exists for video splicing,
    where the caller must assemble the input sequence itself."""
    return sft_loss(params, embed_tokens(params, ids), labels, valid, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def completion_logprob_from_ids(params, ids, labels, valid,
                                cfg: Qwen2Config) -> jnp.ndarray:
    return completion_logprob(params, embed_tokens(params, ids), labels,
                              valid, cfg)


def lora_optimizer(learning_rate: float, params):
    """Optimizer that trains ONLY LoRA adapter leaves (models/qwen2.py
    add_lora) and hard-freezes everything else.  Note optax.masked alone is
    wrong here: masked-out updates pass through unchanged (raw gradients
    would be applied to the frozen base weights)."""
    import optax

    from ..models.qwen2 import lora_param_mask
    labels = jax.tree.map(lambda m: "train" if m else "freeze",
                          lora_param_mask(params))
    return optax.multi_transform(
        {"train": optax.adamw(learning_rate), "freeze": optax.set_to_zero()},
        labels)


def dpo_loss_from_ids(policy_params, ref_params, chosen, rejected,
                      cfg: Qwen2Config, beta: float = 0.1):
    """DPO over (ids, labels, valid) tuples — policy embeddings are looked up
    inside the loss (trained); the frozen reference uses its own table."""
    pol_c = completion_logprob_from_ids(policy_params, *chosen, cfg)
    pol_r = completion_logprob_from_ids(policy_params, *rejected, cfg)
    ref_c = completion_logprob_from_ids(ref_params, *chosen, cfg)
    ref_r = completion_logprob_from_ids(ref_params, *rejected, cfg)
    logits = beta * ((pol_c - ref_c) - (pol_r - ref_r))
    loss = -jnp.mean(jax.nn.log_sigmoid(logits))
    metrics = {
        "rewards_chosen": jnp.mean(beta * (pol_c - ref_c)),
        "rewards_rejected": jnp.mean(beta * (pol_r - ref_r)),
        "reward_accuracy": jnp.mean((pol_c - ref_c) > (pol_r - ref_r)),
    }
    return loss, metrics


def make_sft_step_ids(optimizer, cfg: Qwen2Config):
    @jax.jit
    def step(params, opt_state, ids, labels, valid):
        loss, grads = jax.value_and_grad(sft_loss_from_ids)(
            params, ids, labels, valid, cfg)
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_dpo_step_ids(optimizer, cfg: Qwen2Config, beta: float = 0.1):
    @jax.jit
    def step(params, ref_params, opt_state, chosen, rejected):
        def loss_fn(p):
            return dpo_loss_from_ids(p, ref_params, chosen, rejected, cfg,
                                     beta)
        (loss, metrics), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(params)
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    return step


def make_sft_step(optimizer, cfg: Qwen2Config):
    """jitted (params, opt_state, batch) -> (params, opt_state, loss); with a
    mesh active, replicated params + data-sharded batch make the gradient
    mean an XLA all-reduce (same DP layout as train/grpo.py)."""

    @jax.jit
    def step(params, opt_state, embeds, labels, valid):
        loss, grads = jax.value_and_grad(sft_loss)(params, embeds, labels,
                                                   valid, cfg)
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def make_dpo_step(optimizer, cfg: Qwen2Config, beta: float = 0.1):
    @jax.jit
    def step(params, ref_params, opt_state, chosen, rejected):
        def loss_fn(p):
            return dpo_loss(p, ref_params, chosen, rejected, cfg, beta)
        (loss, metrics), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(params)
        import optax
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    return step


def splice_video_labels(prompt_labels: list, n_video_tokens: int,
                        img_pos: int) -> np.ndarray:
    """Labels for a spliced sequence: the IMAGE_TOKEN_INDEX slot expands to
    n_video_tokens IGNORE_INDEX labels (video embeddings are never
    supervised)."""
    out = (prompt_labels[:img_pos] + [IGNORE_INDEX] * n_video_tokens
           + prompt_labels[img_pos + 1:])
    return np.asarray(out, np.int32)
