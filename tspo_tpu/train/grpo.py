"""GRPO-style policy-gradient training of the selector head.

The reference algorithm (tspo_trainer.py:434-640, see SURVEY.md §3.1): per
sample, draw G Gumbel-top-k frame subsets, let the frozen backbone answer once
per subset, convert answers to rewards, group-normalize into advantages, and
apply the REINFORCE surrogate ``-mean(exp(lp - sg(lp))) * adv`` to the
selector's noise-free log-probs at the selected indices.  Only the ~3.5M-param
selector trains; everything else is frozen.

This module holds the *device-side* pure functions: the per-batch loss and the
jittable update step.  They are backbone-agnostic — rewards arrive as arrays,
produced either by the real MLLM rollout (train/trainer.py) or by test stubs.
Data parallelism = shard the batch axis over the mesh 'data' axis; XLA derives
the gradient all-reduce from the replicated-params output sharding.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..configs import SelectorConfig, TrainConfig
from ..models.selector import score_frames
from ..ops.selection import gumbel_topk


class TrainBatch(NamedTuple):
    """One device batch of training samples (padded frame buckets).

    frame_feat:  [B, T, D]  CLIP image features
    text_feat:   [B, 1, D]  CLIP text features
    clip_scores: [B, T]
    valid:       [B, T]     bool frame-validity mask
    """

    frame_feat: jnp.ndarray
    text_feat: jnp.ndarray
    clip_scores: jnp.ndarray
    valid: jnp.ndarray


class SampledSubsets(NamedTuple):
    """G sampled frame subsets per batch element: indices [B, G, K].

    ``k_len`` [B] (optional): per-sample subset size for mixed-type batches —
    "general" samples select training_sample_len//2 frames while "specific"
    select training_sample_len (tspo_trainer.py:456-480); rows with
    k_len[b] < K carry 0-padding past k_len[b]."""

    indices: jnp.ndarray
    k_len: jnp.ndarray | None = None


def anneal_tau(step, max_steps, tau0: float, tau_final: float):
    """Linear temperature anneal (tspo_trainer.py:496).  frac clamps to 1:
    a driver stepping past the planned horizon (e.g. an external batched
    loop) must plateau at tau_final — unclamped, tau crosses zero around
    step ~1.7x horizon and NEGATIVE tau inverts every selector logit."""
    frac = jnp.asarray(step, jnp.float32) / jnp.maximum(max_steps, 1)
    return tau0 - (tau0 - tau_final) * jnp.minimum(frac, 1.0)


@partial(jax.jit, static_argnames=("sel_cfg", "num_generations", "sample_len",
                                   "window_size"))
def sample_subsets(params, batch: TrainBatch, rng, tau, *,
                   sel_cfg: SelectorConfig, num_generations: int,
                   sample_len: int, window_size: int,
                   k_len: jnp.ndarray | None = None) -> SampledSubsets:
    """Rollout phase: per sample, G stochastic Gumbel-top-k frame subsets.

    Mirrors the no-grad G-loop of the reference (tspo_trainer.py:508-537) but
    vmapped over batch and generations on device.  ``k_len`` [B] enables
    mixed-type batches (per-sample subset size <= sample_len).
    """
    B = batch.frame_feat.shape[0]

    def per_sample(feat, text, csc, valid, key, kl):
        logits, _ = score_frames(params, feat, text, csc, cfg=sel_cfg,
                                 window_size=window_size, score_tau=tau,
                                 valid=valid)
        keys = jax.random.split(key, num_generations)

        def per_gen(k):
            idx, _, _ = gumbel_topk(k, logits, sample_len, valid, k_len=kl)
            return idx

        return jax.vmap(per_gen)(keys)                       # [G, K]

    keys = jax.random.split(rng, B)
    kl = (jnp.full((B,), sample_len, jnp.int32) if k_len is None
          else k_len.astype(jnp.int32))
    idx = jax.vmap(per_sample)(batch.frame_feat, batch.text_feat,
                               batch.clip_scores, batch.valid, keys, kl)
    return SampledSubsets(indices=idx, k_len=kl)


def grpo_surrogate_loss(params, batch: TrainBatch, subsets: SampledSubsets,
                        rewards: jnp.ndarray, tau, *, sel_cfg: SelectorConfig,
                        window_size: int, adv_eps: float = 1e-4):
    """REINFORCE surrogate with group-normalized advantages.

    rewards: [B, G].  Loss per generation: -mean_K(exp(lp - sg(lp))) * adv
    (tspo_trainer.py:586-607); value of exp(...) is 1, its gradient is
    d(lp)/dθ — plain REINFORCE with a group baseline.
    """

    K = subsets.indices.shape[-1]
    B = batch.frame_feat.shape[0]
    k_len = (jnp.full((B,), K, jnp.int32) if subsets.k_len is None
             else subsets.k_len)

    def per_sample(feat, text, csc, valid, idx_g, rew_g, kl):
        logits, _ = score_frames(params, feat, text, csc, cfg=sel_cfg,
                                 window_size=window_size, score_tau=tau,
                                 valid=valid)
        neg = jnp.asarray(-1e30, logits.dtype)
        lp = jax.nn.log_softmax(jnp.where(valid, logits, neg))

        mean = jnp.mean(rew_g)
        std = jnp.std(rew_g, ddof=1)                       # torch .std default
        adv = (rew_g - mean) / (std + adv_eps)             # [G]

        lps = lp[idx_g]                                    # [G, K]
        keep = (jnp.arange(K) < kl)[None, :]               # mask k_len padding
        ratio = jnp.exp(lps - jax.lax.stop_gradient(lps))
        ratio = jnp.where(keep, ratio, 0.0).sum(axis=-1) / kl
        return -(ratio * adv).mean()

    losses = jax.vmap(per_sample)(batch.frame_feat, batch.text_feat,
                                  batch.clip_scores, batch.valid,
                                  subsets.indices, rewards, k_len)
    return losses.mean()


def make_optimizer(cfg: TrainConfig):
    """AdamW; ``grad_accum > 1`` wraps in MultiSteps — the per-rank
    gradient-accumulation of the reference (train_deepspeed.sh
    --gradient_accumulation_steps 2)."""
    opt = optax.adamw(cfg.learning_rate, b1=0.9, b2=0.999, weight_decay=0.0)
    if cfg.grad_accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum)
    return opt


@partial(jax.jit, static_argnames=("sel_cfg", "train_cfg", "optimizer",
                                   "window_size"), donate_argnames=("params", "opt_state"))
def selector_update_step(params, opt_state, batch: TrainBatch,
                         subsets: SampledSubsets, rewards, tau, *,
                         sel_cfg: SelectorConfig, train_cfg: TrainConfig,
                         optimizer, window_size: int):
    """One optimizer step over a (possibly data-sharded) batch.

    Returns (params, opt_state, metrics).  Under jit with ``batch`` sharded on
    the mesh 'data' axis and params replicated, the gradient mean over B is an
    XLA all-reduce over ICI — the TPU equivalent of the reference's
    DeepSpeed/NCCL backward (SURVEY.md §2.5).
    """
    loss, grads = jax.value_and_grad(grpo_surrogate_loss)(
        params, batch, subsets, rewards, tau, sel_cfg=sel_cfg,
        window_size=window_size, adv_eps=train_cfg.adv_eps)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    gnorm = optax.global_norm(grads)
    metrics = {
        "loss": loss,
        "grad_norm": gnorm,
        "reward_mean": rewards.mean(),
        "reward_std": rewards.std(),
    }
    return params, opt_state, metrics
