"""Measure prompt-lookup speculative decoding at the phase-2 answer shape.

Single-row decode is weight-read-bound (docs/KERNELS.md: B=1 int8 decode at
95% of the HBM roofline) — speculation is the only remaining lever: ONE
weight pass verifies draft_len+1 positions, so tokens/pass scales with the
acceptance rate.  Acceptance depends on the real checkpoint's behavior
(multiple-choice answers largely restate option text from the prompt), which
this zero-egress container can't measure, so the bench brackets the win:

  floor   — adversarial lookup (acceptance ~0): measures pure overhead of
            the (d+1)-position verify pass vs the 1-token step;
  ceiling — oracle lookup (the speculative path's own emission appended to
            the lookup corpus): acceptance ~1, the d+1-tokens-per-pass limit.

Round-4 addition (VERDICT next-step #7): ``--acceptance`` measures WHERE in
the floor..ceiling bracket a realistic workload lands, without real weights.
Acceptance is a property of (tokenizer, answer corpus, lookup rule), not of
the weights: assuming the model greedily emits a given answer string, the
number of verify passes the kernel takes is exactly computable host-side
(simulate_acceptance mirrors greedy_decode_speculative's 2-gram draft rule;
pinned EXACT against the device kernel by tests/test_spec_acceptance_sim.py).
The corpus is synthetic multiple-choice answers through an ACTUAL HF
fast tokenizer (byte-level BPE with merges trained in-image — real
tokenizers-library machinery, word-level merge behavior like a production
vocab), mixing letter-only, letter+restate, verbatim-restate and paraphrase
answer styles.

Run detached: nohup python scripts/bench_spec_decode.py [--acceptance] &
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def simulate_acceptance(lookup: list, target: list, draft_len: int,
                        max_new_tokens: int | None = None,
                        eos: int = -7) -> tuple:
    """Exact host-side replay of greedy_decode_speculative's accounting,
    ASSUMING the model greedily emits ``target``: returns
    (tokens_emitted, n_forward_passes).

    Mirrors models/qwen2.py::greedy_decode_speculative: drafts come from the
    most recent (prev, tok) 2-gram match in [lookup ++ emitted]; one verify
    pass emits the agreeing draft prefix plus one model token.  ``eos``
    must be a token id that terminates ``target`` (or absent: runs to
    max_new_tokens)."""
    N = max_new_tokens if max_new_tokens is not None else len(target)
    out: list = []
    i = 0
    nf = 0
    tok = target[0]
    prev0 = lookup[-1] if lookup else -1
    while i < N and tok != eos:
        nf += 1
        hist = lookup + out
        prev = out[-1] if out else prev0
        # most recent 2-gram (prev, tok) match; drafts = following d tokens
        p_best = -1
        for p in range(len(hist) - 1):
            if hist[p] == prev and hist[p + 1] == tok:
                p_best = p
        drafts = (hist[p_best + 2: p_best + 2 + draft_len]
                  if p_best >= 0 else [])
        drafts += [eos] * (draft_len - len(drafts))
        # longest agreeing prefix vs what the model would emit next
        a = 0
        while a < draft_len and i + 1 + a < len(target) \
                and drafts[a] == target[i + 1 + a] and drafts[a] != eos:
            a += 1
        out.append(tok)
        out.extend(drafts[:a])
        i += 1 + a
        tok = target[i] if i < len(target) else eos
    return min(i, N), nf


# ---------------------------------------------------------------------------
# Synthetic multiple-choice corpus + in-image trained HF tokenizer
# ---------------------------------------------------------------------------

_SUBJ = ["the man in the red shirt", "a young woman", "the chef",
         "the soccer player", "an elderly couple", "the dog",
         "the presenter on stage", "a group of students"]
_VERB = ["walks away from", "picks up", "points at", "carefully examines",
         "throws", "hands over", "ignores", "assembles"]
_OBJ = ["the wooden table", "a blue umbrella", "the mixing bowl",
        "the microphone", "a stack of books", "the finish line",
        "the whiteboard", "a small box"]
_TAIL = ["near the window", "in the kitchen", "during the interview",
         "at the end of the video", "before the crowd arrives",
         "while music plays", "in slow motion", "under bright lights"]


def _option_sentence(rng) -> str:
    return (f"{rng.choice(_SUBJ)} {rng.choice(_VERB)} {rng.choice(_OBJ)} "
            f"{rng.choice(_TAIL)}")


def make_mc_corpus(n_docs: int = 200, seed: int = 0) -> list:
    """(prompt_text, answer_text, style) triples shaped like VideoMME
    phase-2 traffic.  Styles mirror how MC answers actually restate option
    text — the claim the acceptance number tests."""
    rng = np.random.default_rng(seed)

    class _R:
        def choice(self, xs):
            return xs[int(rng.integers(len(xs)))]
    r = _R()
    docs = []
    for _ in range(n_docs):
        opts = [_option_sentence(r) for _ in range(4)]
        ans_i = int(rng.integers(4))
        letter = "ABCD"[ans_i]
        q = (f"What does {r.choice(_SUBJ)} do {r.choice(_TAIL)}?")
        prompt = ("Select the best answer to the following multiple-choice "
                  "question based on the video. Respond with only the "
                  f"letter of the correct option.\n{q}\n"
                  + "\n".join(f"{c}. {o}"
                              for c, o in zip("ABCD", opts))
                  + "\nThe best answer is:")
        style = ["letter", "letter_restate", "restate", "paraphrase"][
            int(rng.choice([0, 0, 0, 1, 1, 1, 2, 2, 3]))]
        if style == "letter":
            answer = letter + "."
        elif style == "letter_restate":
            answer = f"{letter}. {opts[ans_i].capitalize()}."
        elif style == "restate":
            answer = (f"The best answer is {letter}: {opts[ans_i]}, "
                      "as shown in the video.")
        else:   # paraphrase: restate with word substitutions (partial match)
            words = opts[ans_i].split()
            k = max(1, len(words) // 6)
            for _ in range(k):
                words[int(rng.integers(len(words)))] = r.choice(
                    ["quickly", "suddenly", "then", "calmly", "finally"])
            answer = f"{letter}. {' '.join(words)}."
        docs.append((prompt, answer, style))
    return docs


def train_hf_tokenizer(texts: list, vocab_size: int = 2048):
    """Byte-level BPE trained in-image via the tokenizers library, wrapped
    as a transformers PreTrainedTokenizerFast — real HF machinery with
    realistic word-level merges (no downloads)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, \
        trainers
    from transformers import PreTrainedTokenizerFast
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(texts, trainer)
    return PreTrainedTokenizerFast(tokenizer_object=tok,
                                   eos_token="<|endoftext|>")


def measure_acceptance(draft_lens=(4, 8, 16), n_docs=200, seed=0) -> dict:
    """Acceptance statistics of the prompt-lookup rule over the synthetic
    MC corpus: tokens per verify pass at each draft_len, split by answer
    style."""
    docs = make_mc_corpus(n_docs, seed)
    hf_tok = train_hf_tokenizer([p + " " + a for p, a, _ in docs])
    out = {"tokenizer_vocab": int(hf_tok.vocab_size), "n_docs": n_docs}
    for d in draft_lens:
        per_style: dict = {}
        toks = passes = 0
        for prompt, answer, style in docs:
            lookup = hf_tok(prompt)["input_ids"]
            target = hf_tok(" " + answer)["input_ids"]
            t, nf = simulate_acceptance(lookup, target, d)
            toks += t
            passes += nf
            s = per_style.setdefault(style, [0, 0])
            s[0] += t
            s[1] += nf
        out[f"d{d}"] = {
            "tokens_per_pass": round(toks / max(passes, 1), 3),
            "per_style": {k: round(v[0] / max(v[1], 1), 3)
                          for k, v in per_style.items()},
        }
    return out


import jax
import jax.numpy as jnp


def main():
    acc = None
    if "--acceptance" in sys.argv:
        acc = measure_acceptance()
        print(json.dumps({"acceptance": acc}), flush=True)
        if jax.default_backend() != "tpu":
            return   # host-side acceptance only; the bracket needs the chip

    from bench_decode_batched import init_qwen2_int8_on_device  # noqa: E402
    from tspo_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    from tspo_tpu.models.qwen2 import (KVCache, Qwen2Config, greedy_decode,
                                       greedy_decode_speculative)

    cfg = Qwen2Config.llava_video_7b()
    params = init_qwen2_int8_on_device(cfg)
    jax.block_until_ready(params)

    P, NEW, D = 3200, 64, 8
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(1, P, cfg.hidden_size)) * 0.02,
                      jnp.bfloat16)
    valid = jnp.ones((1, P), bool)
    T = P + NEW + D + 4

    def run_plain():
        cache = KVCache.create(cfg, 1, T, jnp.bfloat16)
        out, n = greedy_decode(params, emb, valid, cache, cfg,
                               max_new_tokens=NEW, eos_token_id=-1)
        return np.asarray(out), int(n)

    def run_spec(lookup, lvalid):
        cache = KVCache.create(cfg, 1, T, jnp.bfloat16)
        out, n, nf = greedy_decode_speculative(
            params, emb, valid, cache, cfg, NEW,
            lookup, lvalid, eos_token_id=-1, draft_len=D)
        return np.asarray(out), int(n), int(nf)

    def timeit(fn, iters=3):
        fn()                                   # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        return (time.perf_counter() - t0) / iters

    plain_out, _ = run_plain()
    t_plain = timeit(run_plain)

    def diverge_at(out):
        """First index where speculative output differs from plain decode.

        Exact greedy parity holds when argmaxes agree, and the CPU f32
        parity tests pin that (tests/test_qwen2.py).  On chip with RANDOM
        bf16 weights, the verify pass computes logits in a (d+1)-position
        matmul while plain decode uses a 1-position one — different
        reduction shapes can flip near-tied argmaxes, which real trained
        logits don't exhibit.  Record the divergence point instead of
        dying so the timing bracket still lands."""
        a, b = list(out), list(plain_out)
        return next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), -1)

    # floor: drafts from an unrelated corpus -> ~0 acceptance
    bad_lookup = jnp.asarray(rng.integers(0, cfg.vocab_size, 512), jnp.int32)
    bad_valid = jnp.ones(512, bool)
    out_f, n_f, nf_f = run_spec(bad_lookup, bad_valid)
    floor_div = diverge_at(out_f)
    t_floor = timeit(lambda: run_spec(bad_lookup, bad_valid))

    # ceiling: the answer itself sits in the lookup corpus.  Seed it with
    # the FLOOR run's emission, not plain decode's: the ceiling run verifies
    # through the same (d+1)-position matmul as the floor run, so any
    # random-bf16 near-tie resolves identically and acceptance stays ~full —
    # seeding with plain decode's tokens would derail the lookup at the
    # first tie flip and quietly measure floor behavior instead.
    oracle = jnp.asarray(
        np.concatenate([np.asarray(bad_lookup[:256]), out_f]), jnp.int32)
    ov = jnp.ones(oracle.shape[0], bool)
    out_c, n_c, nf_c = run_spec(oracle, ov)
    ceil_div = diverge_at(out_c)
    t_ceil = timeit(lambda: run_spec(oracle, ov))

    record = {
        "prompt": P, "new_tokens": NEW, "draft_len": D,
        "plain_s": round(t_plain, 3),
        "spec_floor_s": round(t_floor, 3),
        "spec_floor_overhead_x": round(t_floor / t_plain, 3),
        "spec_floor_fwd_passes": nf_f,
        "spec_ceiling_s": round(t_ceil, 3),
        "spec_ceiling_speedup_x": round(t_plain / t_ceil, 2),
        "spec_ceiling_fwd_passes": nf_c,
        # -1 = token-exact vs plain decode; >=0 = first index where a
        # random-bf16-weight near-tie flipped (see diverge_at docstring)
        "floor_diverge_at": floor_div,
        "ceiling_diverge_at": ceil_div,
    }
    if acc is not None:
        # predicted LIVE point inside the bracket: per-pass cost from the
        # floor run (the verify pass is weight-read bound, so its cost is
        # ~independent of how many drafts get accepted), pass count from the
        # corpus acceptance at this draft_len
        def run_prefill():
            cache = KVCache.create(cfg, 1, T, jnp.bfloat16)
            out, n = greedy_decode(params, emb, valid, cache, cfg,
                                   max_new_tokens=1, eos_token_id=-1)
            return np.asarray(out)
        t_pre = timeit(run_prefill)
        t_pass = (t_floor - t_pre) / max(nf_f, 1)
        tpp = acc[f"d{D}"]["tokens_per_pass"]
        t_live = t_pre + (NEW / tpp) * t_pass
        record["acceptance_tokens_per_pass"] = tpp
        record["predicted_live_s"] = round(t_live, 3)
        record["predicted_live_speedup_x"] = round(t_plain / t_live, 2)
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()
