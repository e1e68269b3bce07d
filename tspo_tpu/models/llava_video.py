"""LLaVA-Video-7B-Qwen2 backbone: SigLIP tower + projector + Qwen2 decoder.

Rebuilds the reference's vendored LLaVA-NeXT video path (SURVEY.md C38-C43):

  frames -> SigLIP (729 patches) -> mlp2x_gelu projector -> 2dPool stride 2
  (27x27 -> 13x13 = 169 tokens/frame, llava_arch.py:171-190) -> grid newline
  tokens (add_token_per_grid, llava_arch.py:222-243: 13 rows x (13 cols +
  image_newline) = 182 tokens/frame) -> spliced into the qwen_1_5 chat prompt
  at the IMAGE_TOKEN position (mm_utils.py:341-361) -> greedy Qwen2 decode.

NOTE the operation order difference from naive reading: the reference encodes
images through tower+projector first and pools *afterwards*
(prepare_inputs_labels_for_multimodal: encode_images -> get_2dPool on the
projected features, llava_arch.py:279-289).  We match that order exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.hf_port import state_dict_of
from .qwen2 import (KVCache, Qwen2Config, embed_tokens, greedy_decode,
                    init_qwen2_params, qwen2_params_from_torch,
                    qwen2_param_shardings)
from .siglip import (SigLIPConfig, init_siglip_params, siglip_encode,
                     siglip_params_from_torch, siglip_preprocess)

IMAGE_TOKEN_INDEX = -200
DEFAULT_IMAGE_TOKEN = "<image>"
# audio modality (beyond the reference's video-only path): sentinel for
# AudioTower features spliced like video tokens — see generate(audio=...)
AUDIO_TOKEN_INDEX = -201
DEFAULT_AUDIO_TOKEN = "<audio>"

QWEN15_SYSTEM = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"


@dataclass(frozen=True)
class LLaVAVideoConfig:
    lm: Qwen2Config = field(default_factory=Qwen2Config.llava_video_7b)
    vision: SigLIPConfig = field(default_factory=SigLIPConfig)
    pool_stride: int = 2
    mm_newline_position: str = "grid"
    max_context: int = 16384

    @property
    def pooled_side(self) -> int:
        return self.vision.grid // self.pool_stride

    @property
    def tokens_per_frame(self) -> int:
        s = self.pooled_side
        return s * (s + 1) if self.mm_newline_position == "grid" else s * s

    @classmethod
    def tiny(cls) -> "LLaVAVideoConfig":
        return cls(lm=Qwen2Config.tiny(), vision=SigLIPConfig.tiny(),
                   max_context=512)

    @staticmethod
    def _linear_rope_factor(rope_scaling) -> float:
        """Factor from an HF ``rope_scaling`` dict, accepting only the
        "linear" scheme (``type``/``rope_type``, either key); yarn/llama3/
        dynamic would need different rotation math than a position divisor."""
        if not rope_scaling:
            return 1.0
        kind = str(rope_scaling.get("type",
                                    rope_scaling.get("rope_type",
                                                     "linear"))).lower()
        if kind != "linear":
            raise ValueError(
                f"rope_scaling type {kind!r} is not supported (only HF "
                "'linear' scaling is implemented); refusing to misapply "
                f"factor={rope_scaling.get('factor')} as linear")
        return float(rope_scaling.get("factor", 1.0))

    @classmethod
    def from_hf_config(cls, hf: dict) -> "LLaVAVideoConfig":
        """Build from a LLaVA config.json — LlavaQwen (model_type
        llava_qwen) or the llama/vicuna/mistral family (llava, llava_llama,
        llava_mistral): LM fields at top level plus mm_* fields.  Family
        decides the defaults HF configs omit: qkv biases (qwen yes, llama
        no), eos (151645 vs 2), rope theta (1e6 vs 1e4).  The SigLIP tower
        geometry is fixed by the checkpoint family — so400m-384 with the
        final layer dropped."""
        family = str(hf.get("model_type", "")).lower() + " " + \
            " ".join(hf.get("architectures", []) or []).lower()
        is_qwen = "qwen" in family or not family.strip()
        lm = Qwen2Config(
            vocab_size=hf["vocab_size"], hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads",
                                hf["num_attention_heads"]),
            head_dim=hf.get("head_dim",
                            hf["hidden_size"] // hf["num_attention_heads"]),
            rope_theta=hf.get("rope_theta",
                              1_000_000.0 if is_qwen else 10_000.0),
            rms_eps=hf.get("rms_norm_eps", 1e-6 if is_qwen else 1e-5),
            max_position_embeddings=hf.get("max_position_embeddings",
                                           32768 if is_qwen else 4096),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            qkv_bias=hf.get("attention_bias", is_qwen),
            eos_token_id=hf.get("eos_token_id", 151645 if is_qwen else 2),
            sliding_window=hf.get("sliding_window")
            if "mistral" in family else None,
            # long-context vicuna checkpoints carry HF "linear" rope scaling
            # (llava_vid_tspo.py:159-174 overwrite_config); only linear is
            # implemented (qwen2._rope divides positions by the factor), so
            # fail loudly on yarn/llama3/dynamic configs rather than
            # misapplying their factor as a position divisor
            rope_scaling_factor=cls._linear_rope_factor(
                hf.get("rope_scaling")))
        # real LLaVA-Video checkpoints fix the tower at so400m-384; synthetic
        # rehearsal checkpoints (scripts/make_synthetic_assets.py) carry an
        # explicit "mm_vision_config" dict so the runbook can drive the FULL
        # production load path at tiny geometry in the zero-egress container
        vision = (SigLIPConfig(**hf["mm_vision_config"])
                  if "mm_vision_config" in hf else SigLIPConfig())
        return cls(lm=lm, vision=vision,
                   pool_stride=hf.get("mm_spatial_pool_stride", 2),
                   mm_newline_position=hf.get("mm_newline_position", "grid"))


def build_qwen15_prompt(question: str,
                        trailer: str = "\nPlease answer with the option's "
                                       "letter from the given choices directly.") -> str:
    """chatml prompt of the reference trainer/demo (tspo_trainer.py:486-492):
    system + user(<image>\\n + question + trailer) + assistant stub."""
    q = DEFAULT_IMAGE_TOKEN + "\n" + question + trailer
    return (QWEN15_SYSTEM + f"<|im_start|>user\n{q}<|im_end|>\n"
            "<|im_start|>assistant\n")


def tokenize_with_image(prompt: str, encode: Callable, bos_token_id=None) -> list:
    """Split on <image> and insert IMAGE_TOKEN_INDEX (mm_utils.py:341-361).

    BOS handling mirrors the reference's separator trick exactly: with a
    BOS-emitting tokenizer (vicuna/llama) every chunk starts with BOS and is
    stripped via ``chunk[offset:]``; the separator is built as
    ``[img]*(offset+1)`` and ALSO sliced ``[offset:]`` — so exactly ONE
    image token lands per <image> either way."""
    def encode_with_audio(text):
        """Encode one <image>-free chunk, splicing AUDIO_TOKEN_INDEX at
        <audio> sentinels (audio extension; no-op without the sentinel).
        BOS-emitting tokenizers prepend BOS to EVERY encode() call — strip
        it from sub-chunks after the first so no stray BOS lands mid-stream
        after an audio sentinel."""
        if DEFAULT_AUDIO_TOKEN not in text:
            return encode(text)
        out = []
        for j, sub in enumerate(text.split(DEFAULT_AUDIO_TOKEN)):
            if j > 0:
                out.append(AUDIO_TOKEN_INDEX)
            toks = encode(sub)
            if j > 0 and bos_token_id is not None and toks \
                    and toks[0] == bos_token_id:
                toks = toks[1:]
            out.extend(toks)
        return out

    chunks = [encode_with_audio(chunk)
              for chunk in prompt.split(DEFAULT_IMAGE_TOKEN)]
    input_ids = []
    offset = 0
    if chunks and chunks[0] and bos_token_id is not None and chunks[0][0] == bos_token_id:
        offset = 1
        input_ids.append(chunks[0][0])
    for i, chunk in enumerate(chunks):
        if i > 0:
            input_ids.append(IMAGE_TOKEN_INDEX)
        input_ids.extend(chunk[offset:])
    return input_ids


# ---------------------------------------------------------------------------
# Vision pipeline (jitted per frame-chunk)
# ---------------------------------------------------------------------------

def pool_2d_average(feat: jnp.ndarray, grid: int, stride: int) -> jnp.ndarray:
    """[F, grid^2, D] -> [F, (grid//stride)^2, D] average pooling; odd edges
    dropped like torch avg_pool2d (27 -> 13)."""
    F, _, D = feat.shape
    s = grid // stride
    x = feat.reshape(F, grid, grid, D)[:, : s * stride, : s * stride]
    x = x.reshape(F, s, stride, s, stride, D)
    return x.mean(axis=(2, 4)).reshape(F, s * s, D)


def add_token_per_grid(feat: jnp.ndarray, newline: jnp.ndarray,
                       side: int) -> jnp.ndarray:
    """[F, side^2, D] -> [F*side*(side+1), D]: image_newline after each row
    (llava_arch.py:222-243 ordering: frame-major, row-major)."""
    F, _, D = feat.shape
    x = feat.reshape(F, side, side, D)
    nl = jnp.broadcast_to(newline.astype(feat.dtype), (F, side, 1, D))
    return jnp.concatenate([x, nl], axis=2).reshape(F * side * (side + 1), D)


def add_token_per_frame(feat: jnp.ndarray, newline: jnp.ndarray) -> jnp.ndarray:
    """[F, N, D] -> [F*(N+1), D]: one newline per frame (llava_arch.py:245-249)."""
    F, N, D = feat.shape
    nl = jnp.broadcast_to(newline.astype(feat.dtype), (F, 1, D))
    return jnp.concatenate([feat, nl], axis=1).reshape(F * (N + 1), D)


@partial(jax.jit, static_argnames=("cfg",))
def encode_video_chunk(params: Mapping, frames_u8: jnp.ndarray,
                       cfg: LLaVAVideoConfig) -> jnp.ndarray:
    """[F, H, W, 3] uint8 -> [F, pooled_side^2, hidden] projected features.

    Matches reference order: tower -> projector -> 2dPool
    (llava_arch.py:279-289)."""
    pixels = siglip_preprocess(frames_u8, cfg.vision.image_size)
    feat = siglip_encode(params["vision"], pixels, cfg.vision)    # [F, 729, W]
    p = params["projector"]
    feat = jax.nn.gelu(feat @ p["fc1"]["kernel"] + p["fc1"]["bias"],
                       approximate=False)
    feat = feat @ p["fc2"]["kernel"] + p["fc2"]["bias"]           # [F, 729, D]
    return pool_2d_average(feat, cfg.vision.grid, cfg.pool_stride)


@partial(jax.jit, static_argnames=("cfg", "chunk"))
def encode_video_fused(params: Mapping, frames_u8: jnp.ndarray,
                       cfg: LLaVAVideoConfig, chunk: int) -> jnp.ndarray:
    """Whole-video vision encode as ONE dispatch: lax.map over frame chunks
    (same trick as tspo_model.fused_score_program).  Per-call dispatch is
    ~25 ms on remote/tunneled backends — a 64-frame encode at chunk 16 paid
    4 of them.  frames_u8 [T, H, W, 3] with T % chunk == 0 (caller pads and
    slices)."""
    T = frames_u8.shape[0]

    def enc(chunk_frames):
        pixels = siglip_preprocess(chunk_frames, cfg.vision.image_size)
        feat = siglip_encode(params["vision"], pixels, cfg.vision)
        p = params["projector"]
        feat = jax.nn.gelu(feat @ p["fc1"]["kernel"] + p["fc1"]["bias"],
                           approximate=False)
        feat = feat @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        return pool_2d_average(feat, cfg.vision.grid, cfg.pool_stride)

    out = jax.lax.map(enc, frames_u8.reshape(T // chunk, chunk,
                                             *frames_u8.shape[1:]))
    return out.reshape(T, *out.shape[2:])


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

def _sampling_seed(seed: int | None) -> int:
    """OpenAI/HF do_sample semantics: no seed means a fresh draw per call
    (repeat-sampling — judge self-consistency, best-of-n — must differ);
    explicit seeds stay deterministic.  Shared by generate and
    generate_stream so the two surfaces can't diverge."""
    if seed is None:
        import os
        return int.from_bytes(os.urandom(4), "little")
    return int(seed)


@dataclass
class LLaVAVideoModel:
    """Host orchestrator: vision encode (chunked), prompt splice, greedy
    decode.  ``encode``/``decode`` are tokenizer callables (HF tokenizer for
    real checkpoints; stubs in tests)."""

    params: dict
    cfg: LLaVAVideoConfig = field(default_factory=LLaVAVideoConfig)
    encode: Callable | None = None
    decode: Callable | None = None
    # 16, not 32: the SigLIP lane-attention kernel at [chunk, 729, 1152]
    # compiles at chunk 16 but exceeds the 16 MB scoped-VMEM limit at 32 on
    # this AOT stack (measured; chunk count does not change throughput —
    # 0.327 vs 0.330 s per 64-frame encode)
    batch_frames: int = 16
    max_new_tokens: int = 256
    # conversation template for prompt wrapping (llava_vid_tspo.py:94 —
    # adapter default vicuna_v1; the TSPO Qwen2 checkpoints use qwen_1_5);
    # see models/conversation.py for the table
    conv_template: str = "qwen_1_5"
    # BOS id for tokenize_with_image's offset handling (vicuna/llama
    # tokenizers emit a leading BOS; qwen's does not — mm_utils.py:341-361)
    bos_token_id: int | None = None
    # optional audio path (beyond the reference's video-only surface): an
    # AudioTower (models/audio.py) whose features project into the LM
    # embedding space via params["audio_projector"] (mlp2x_gelu layout like
    # mm_projector) and splice at <audio> sentinels.  Enables the
    # audio-visual benchmarks' audio tracks once an audio-LLM checkpoint is
    # available (docs/STATUS.md)
    audio_tower: object | None = None
    # time-axis average pooling before the audio projector (Qwen2-Audio's
    # avg_pooler: 1500 Whisper frames -> 750 tokens per 30 s)
    audio_pool_stride: int = 2
    # prompt-lookup speculative decoding for the single-question generate
    # path (qwen2.greedy_decode_speculative): exact same greedy tokens,
    # fewer weight passes — single-row decode is weight-read-bound at 95%
    # of the HBM roofline (docs/KERNELS.md), so drafting from the prompt
    # text (answers restate option text) is the remaining lever
    speculative: bool = False
    draft_len: int = 8

    def _prompt(self, question: str) -> str:
        """Eval-adapter prompt: <image> + question wrapped in the conv
        template, NO trailer (llava_vid_tspo.py:520-527 — task prompts carry
        their own instructions; the trainer adds its letter-answer trailer
        itself, tspo_trainer.py:487)."""
        from .conversation import build_prompt
        return build_prompt(question, self.conv_template)

    def generate_multi_round(self, frames: np.ndarray, turns,
                             max_new_tokens: int | None = None,
                             state: "ConversationState | None" = None,
                             temperature: float = 0.0, top_p: float = 1.0,
                             seed: int | None = None) -> str:
        """Multi-round chat over one video: ``turns`` is
        [(question, answer), ..., (question, None)] — earlier QA pairs ride
        the conversation template as context, the video splices once at the
        first turn's <image> slot.  Implements the lmms ABC's
        generate_until_multi_round surface (lmms-eval api/model.py:82-103),
        which the reference's own LLaVA adapter leaves NotImplementedError
        (models/simple/llava.py:432-433).

        With ``state`` (new_conversation_state()), rounds reuse the cached
        prefix KV: round i+1's rendered prompt extends round i's prompt +
        answer, so only the new turn's tokens are prefilled and the video
        encodes once per conversation — vs a full ~12k-token re-prefill +
        re-encode per round.  Token-exact vs the stateless path
        (tests/test_llava_video.py)."""
        from .conversation import build_prompt_multi
        prompt = build_prompt_multi(turns, self.conv_template)
        if temperature and temperature > 0:
            if state is not None:
                # the prefix-KV continue decode has no sampling variant;
                # loud, never silently greedy (codebase rule)
                raise ValueError("sampled conversation rounds don't ride "
                                 "prefix-KV state: pass state=None (full "
                                 "re-prefill) or temperature=0")
            return self.generate(frames, question="", prompt=prompt,
                                 max_new_tokens=max_new_tokens,
                                 temperature=temperature, top_p=top_p,
                                 seed=seed)
        if state is None:
            return self.generate(frames, question="", prompt=prompt,
                                 max_new_tokens=max_new_tokens)
        return self._multi_round_stateful(frames, prompt, max_new_tokens,
                                          state)

    def new_conversation_state(self, headroom: int = 2048
                               ) -> "ConversationState":
        """Fresh per-conversation prefix-KV state for generate_multi_round.
        ``headroom``: extra cache slots allocated beyond the first round's
        need, bounding how many follow-up turns fit before a full
        re-prefill into a larger cache."""
        return ConversationState(headroom)

    def _multi_round_stateful(self, frames, prompt: str, max_new_tokens,
                              state: "ConversationState") -> str:
        """Incremental prefill against the conversation cache: longest
        common token prefix with the covered ids is reused; the suffix
        prefills in dense <=256-token chunks (prefill_extend), decode
        continues in place (greedy_decode_continue), and the answer's own
        decode KV stays covered for the next round.  Falls back to a full
        (flash) prefill on first use, prefix divergence at 0, or capacity
        overflow."""
        from .qwen2 import greedy_decode_continue
        ids, total_e, first_tok, cache, CH, max_new = \
            self._multi_round_prefill(frames, prompt, max_new_tokens, state)
        toks, cache = greedy_decode_continue(self.params["lm"], first_tok,
                                             cache, self.cfg.lm, max_new,
                                             chunk=CH)
        self._commit_conversation(state, ids, total_e, toks, cache)
        return self.decode([int(t) for t in toks])

    def generate_multi_round_stream(self, frames, turns,
                                    max_new_tokens: int | None = None,
                                    state: "ConversationState | None" = None,
                                    chunk: int = 8,
                                    temperature: float = 0.0,
                                    top_p: float = 1.0,
                                    seed: int | None = None):
        """Streaming :meth:`generate_multi_round`: yields TEXT DELTAS whose
        concatenation equals the non-stream call token-for-token (same
        prefix detokenization as generate_stream).  With ``state`` the
        round rides the conversation prefix-KV exactly like
        generate_multi_round(state=...) — and the state commits only once
        the stream is FULLY consumed, so an abandoned stream (client
        disconnect mid-answer) leaves it checked-out/reset for a clean
        full re-prefill next round, never holding a half-written cache."""
        from .conversation import build_prompt_multi
        prompt = build_prompt_multi(turns, self.conv_template)
        if temperature and temperature > 0:
            if state is not None:
                raise ValueError("sampled conversation rounds don't ride "
                                 "prefix-KV state: pass state=None (full "
                                 "re-prefill) or temperature=0")
            yield from self.generate_stream(frames, question="",
                                            prompt=prompt,
                                            max_new_tokens=max_new_tokens,
                                            chunk=chunk,
                                            temperature=temperature,
                                            top_p=top_p, seed=seed)
            return
        if state is None:
            yield from self.generate_stream(frames, question="",
                                            prompt=prompt,
                                            max_new_tokens=max_new_tokens,
                                            chunk=chunk)
            return
        from .qwen2 import greedy_decode_continue_stream, stream_detokenize
        ids, total_e, first_tok, cache, CH, max_new = \
            self._multi_round_prefill(frames, prompt, max_new_tokens, state,
                                      chunk=chunk)
        final: dict = {}
        blocks = greedy_decode_continue_stream(
            self.params["lm"], first_tok, cache, self.cfg.lm, max_new,
            chunk=CH, final=final)
        yield from stream_detokenize(blocks, self.decode,
                                     self.cfg.lm.eos_token_id)
        for _ in blocks:    # stream_detokenize stops AT the all-eos block;
            pass            # drain so ``final`` fills (the decode loop is
                            # already done — no device work runs here)
        self._commit_conversation(state, ids, total_e, final["tokens"],
                                  final["cache"])

    def _commit_conversation(self, state: "ConversationState", ids,
                             total_e: int, toks, cache) -> None:
        """Write a completed round back into the state: the answer's own
        decode KV stays covered for the next round."""
        state.cache = KVCache(cache.k, cache.v,
                              jnp.int32(total_e + len(toks)))
        state.ids = list(ids) + [int(t) for t in toks]
        state.covered = total_e + len(toks)

    def _multi_round_prefill(self, frames, prompt: str, max_new_tokens,
                             state: "ConversationState", chunk: int = 32):
        """Shared front half of the stateful multi-round paths: prefix
        match + incremental prefill.  Returns (ids, total_e, first_tok,
        cache, CH, max_new) with the cache checked OUT of the state (an
        exception or abandoned stream before the commit leaves the state
        holding None — clean full re-prefill next round).  ``chunk`` is
        the decode-chunk size the capacity budget is computed for."""
        from .qwen2 import decode_prefill, prefill_extend
        if self.encode is None or self.decode is None:
            raise ValueError("needs encode/decode tokenizer callables")
        max_new = self.max_new_tokens if max_new_tokens is None \
            else max_new_tokens
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        lm, cfg = self.params["lm"], self.cfg.lm
        dtype = lm["embedding"].dtype
        ids = tokenize_with_image(prompt, self.encode, self.bos_token_id)
        if state.video_tokens is None:
            state.video_tokens = (
                self.encode_video(frames) if frames is not None
                and len(frames) else jnp.zeros((0, cfg.hidden_size), dtype))
        n_vid = int(state.video_tokens.shape[0])
        sent = ids.index(IMAGE_TOKEN_INDEX) \
            if IMAGE_TOKEN_INDEX in ids else None

        def expand(i):            # id-index -> embed-index
            return i + (n_vid - 1) if sent is not None and sent < i else i

        total_e = expand(len(ids))
        # generation-budget clamp mirrors the stateless path
        # (_prepare_generate): truncate max_new to the remaining context,
        # refuse only a FULL prompt — not a merely-tight one
        headroom = self.cfg.max_context - total_e
        if headroom < 1:
            raise ValueError(
                f"conversation is {total_e} tokens but max_context="
                f"{self.cfg.max_context}: no cache slot left to generate "
                "into (fewer frames/rounds, or raise max_context)")
        max_new = min(max_new, headroom)
        CH = chunk                                 # decode chunk
        if (-(-max_new // CH)) * CH > headroom:
            CH = max_new       # near-full context: one exact-size chunk
        # slack past total_e that device writes may touch: the decode
        # chunks, AND the last extension chunk's pad overhang (chunks pad
        # to EXT_PAD; writes past capacity would be silently CLAMPED by
        # dynamic_update_slice onto valid prefix KV — corruption, not error)
        EXT_PAD = 256
        n_dec = (-(-max_new // CH)) * CH
        need = total_e + max(n_dec, EXT_PAD)
        if state.cache is not None and need > state.cache.k.shape[2]:
            state.reset()         # conversation outgrew the cache
        c = 0
        for a, b in zip(ids, state.ids):
            if a != b:
                break
            c += 1
        c = min(c, len(ids) - 1)   # always prefill >= 1 new token
        if state.cache is None:
            c = 0
        L = expand(c)
        vid = state.video_tokens if (sent is not None and sent >= c) \
            else jnp.zeros((0, cfg.hidden_size), dtype)
        sfx = self.splice_embeddings(ids[c:], vid).astype(dtype)
        S_sfx = int(sfx.shape[1])
        if state.cache is None:
            cap = min(self.cfg.max_context, need + state.headroom)
            cache = KVCache.create(cfg, 1, cap, dtype)
            Sb = min(cap, -(-S_sfx // 256) * 256)
            emb = jnp.pad(sfx, ((0, 0), (0, Sb - S_sfx), (0, 0)))
            valid = jnp.zeros((1, Sb), bool).at[:, :S_sfx].set(True)
            first_tok, cache, _ = decode_prefill(lm, emb, valid, cache, cfg)
        else:
            # check the cache OUT of the state before any donating call: an
            # exception mid-round must leave the state holding None (clean
            # full re-prefill next round), never donated-away buffers
            cache = KVCache(state.cache.k, state.cache.v, jnp.int32(L))
            state.cache = None
            state.ids, state.covered = [], 0
            first_tok = None
            off = 0
            while off < S_sfx:
                n = min(256, S_sfx - off)
                nb = 64 if n <= 64 else 256        # two chunk programs only
                chunk = jnp.pad(sfx[:, off:off + n],
                                ((0, 0), (0, nb - n), (0, 0)))
                first_tok, cache = prefill_extend(lm, chunk, jnp.int32(n),
                                                  cache, cfg)
                off += n
                # reclaim pad slots: the next append/decode overwrites them
                cache = KVCache(cache.k, cache.v, jnp.int32(L + off))
        # reclaim prefill pads; the caller decodes in place from here
        cache = KVCache(cache.k, cache.v, jnp.int32(total_e))
        return ids, total_e, first_tok, cache, CH, max_new

    def encode_video(self, frames: np.ndarray) -> jnp.ndarray:
        """[T, H, W, 3] uint8 -> [T*tokens_per_frame, D] spliceable tokens.

        Multi-chunk videos encode in ONE dispatch (lax.map over chunks,
        encode_video_fused): per-call dispatch is ~25 ms on remote backends
        and the 64-frame eval encode used to pay it per chunk."""
        T = frames.shape[0]
        B = self.batch_frames
        if T > B:
            pad = (-T) % B
            padded = frames if pad == 0 else np.concatenate(
                [frames, np.zeros((pad, *frames.shape[1:]), frames.dtype)])
            feat = encode_video_fused(self.params, jnp.asarray(padded),
                                      self.cfg, B)[:T]
        else:
            chunk = frames
            if T < B:
                chunk = np.concatenate(
                    [frames, np.zeros((B - T, *frames.shape[1:]),
                                      frames.dtype)])
            feat = encode_video_chunk(self.params, jnp.asarray(chunk),
                                      self.cfg)[:T]
        if self.cfg.mm_newline_position == "grid":
            return add_token_per_grid(feat, self.params["image_newline"],
                                      self.cfg.pooled_side)
        if self.cfg.mm_newline_position == "frame":
            return add_token_per_frame(feat, self.params["image_newline"])
        return feat.reshape(-1, feat.shape[-1])   # no_token / one_token flat

    def splice_embeddings(self, input_ids: list, video_tokens: jnp.ndarray,
                          audio_tokens: jnp.ndarray | None = None):
        """Replace the IMAGE_TOKEN_INDEX slot with video tokens
        (llava_arch.py:360-430 simplified to the single-video case);
        AUDIO_TOKEN_INDEX slots splice ``audio_tokens`` the same way."""
        ids = np.asarray(input_ids)
        lm = self.params["lm"]
        blocks = {IMAGE_TOKEN_INDEX: video_tokens}
        if audio_tokens is not None:
            blocks[AUDIO_TOKEN_INDEX] = audio_tokens
        elif (ids == AUDIO_TOKEN_INDEX).any():
            # never let the sentinel reach the embedding table (negative ids
            # would silently wrap to a random vocab row)
            raise ValueError("prompt contains <audio> but no audio tokens "
                             "were provided (pass audio= to generate)")
        sentinel = np.isin(ids, list(blocks))
        if not sentinel.any():
            if int(video_tokens.shape[0]) > 0:
                # custom prompt without <image>: refuse rather than silently
                # generating with no video context (the audio path already
                # raises for its missing sentinel)
                raise ValueError("video tokens were provided but the prompt "
                                 "has no <image> sentinel to splice them at")
            return embed_tokens(lm, jnp.asarray(ids))[None]
        parts, start = [], 0
        ref_dtype = lm["embedding"].dtype
        for p in np.where(sentinel)[0]:
            if p > start:
                parts.append(embed_tokens(lm, jnp.asarray(ids[start:int(p)])))
            parts.append(blocks[int(ids[p])])
            start = int(p) + 1
        if start < len(ids):
            parts.append(embed_tokens(lm, jnp.asarray(ids[start:])))
        emb = jnp.concatenate([x.astype(ref_dtype) for x in parts], axis=0)
        return emb[None]                                          # [1, S, D]

    @property
    def supports_audio(self) -> bool:
        """True when an AudioTower + audio projector are attached — the
        eval harness then feeds audio-visual tasks' audio tracks to
        generate(audio=...) (eval/harness.py)."""
        return (self.audio_tower is not None
                and "audio_projector" in self.params)

    def encode_audio_tokens(self, audio: np.ndarray) -> jnp.ndarray:
        """[T] 16 kHz waveform -> [S, hidden] LM-space audio tokens: tower
        features through the audio projector (single ``linear`` à la
        Qwen2-Audio's multi_modal_projector, or mlp2x_gelu ``fc1``/``fc2``
        like mm_projector — both layouts load via
        :func:`models.audio.audio_llm_from_torch`)."""
        if self.audio_tower is None or "audio_projector" not in self.params:
            raise ValueError(
                "audio input needs an AudioTower (models/audio.py) and "
                "params['audio_projector'] from an audio-LLM checkpoint")
        feats = jnp.asarray(self.audio_tower.encode(audio))
        s = max(int(self.audio_pool_stride), 1)
        if s > 1:
            n = (feats.shape[0] // s) * s
            feats = feats[:n].reshape(n // s, s, -1).mean(axis=1)
        pj = self.params["audio_projector"]
        if "linear" in pj:
            out = feats @ pj["linear"]["kernel"] + pj["linear"]["bias"]
            return out.astype(pj["linear"]["kernel"].dtype)
        h = feats @ pj["fc1"]["kernel"] + pj["fc1"]["bias"]
        h = jax.nn.gelu(h, approximate=False)
        return h @ pj["fc2"]["kernel"] + pj["fc2"]["bias"]

    def attach_audio_from_torch(self, model_or_sd, audio_cfg=None,
                                dtype=jnp.float32) -> "LLaVAVideoModel":
        """Attach the audio stack from an audio-LLM torch checkpoint
        (Qwen2-Audio layout — see :func:`models.audio.audio_llm_from_torch`):
        sets ``self.audio_tower`` and ``params['audio_projector']`` so
        ``generate(audio=...)`` and the audio-visual benchmarks' harness
        routing (eval/harness.py) light up.  Returns self for chaining."""
        from .audio import audio_llm_from_torch
        # the embedding table stays in the compute dtype under int8
        # weight-only quantization, so it names the projector dtype
        # directly (the first tree leaf only happens to today)
        proj_dtype = self.params["lm"]["embedding"].dtype
        tower, proj = audio_llm_from_torch(
            model_or_sd, audio_cfg, dtype=dtype, proj_dtype=proj_dtype)
        hidden = self.cfg.lm.hidden_size
        out_dim = (proj["linear"]["kernel"] if "linear" in proj
                   else proj["fc2"]["kernel"]).shape[-1]
        if out_dim != hidden:
            raise ValueError(
                f"audio projector output dim {out_dim} != LM hidden "
                f"{hidden} — wrong checkpoint for this backbone")
        self.audio_tower = tower
        self.params["audio_projector"] = proj
        return self

    def _prepare_generate(self, frames, question, max_new_tokens, prompt,
                          audio):
        """Shared front half of generate/generate_stream: prompt assembly,
        optional audio-token splice, tokenize + media splice, and the
        max_context headroom clamp.  Returns (embeds [1,S,D], input_ids,
        clamped max_new)."""
        if self.encode is None or self.decode is None:
            raise ValueError("needs encode/decode tokenizer callables")
        max_new = self.max_new_tokens if max_new_tokens is None \
            else max_new_tokens
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        prompt = prompt if prompt is not None else self._prompt(question)
        audio_tokens = None
        if audio is not None:
            if DEFAULT_AUDIO_TOKEN not in prompt:
                prompt = prompt.replace(
                    DEFAULT_IMAGE_TOKEN,
                    DEFAULT_IMAGE_TOKEN + "\n" + DEFAULT_AUDIO_TOKEN, 1)
            if DEFAULT_AUDIO_TOKEN not in prompt:
                # custom prompt without any media sentinel: refuse rather
                # than silently dropping the audio
                raise ValueError("audio= given but the prompt has no "
                                 "<audio> (or <image> to auto-insert after)")
            audio_tokens = self.encode_audio_tokens(audio)
        input_ids = tokenize_with_image(prompt, self.encode,
                                        self.bos_token_id)
        if frames is None or len(frames) == 0:
            # text-only path (LLM-judge LocalBackboneProvider grades with no
            # video): the <image> slot splices to zero tokens
            video_tokens = jnp.zeros((0, self.cfg.lm.hidden_size),
                                     jnp.bfloat16)
        else:
            video_tokens = self.encode_video(frames)
        embeds = self.splice_embeddings(input_ids, video_tokens, audio_tokens)
        # decode writes past max_context would be silently clamped by
        # dynamic_update_slice onto the last cache slot (corrupting the
        # tail) — refuse a full prompt, truncate the generation budget
        headroom = self.cfg.max_context - embeds.shape[1]
        if headroom < 1:
            raise ValueError(
                f"prompt is {embeds.shape[1]} tokens but max_context="
                f"{self.cfg.max_context}: no cache slot left to generate "
                "into (fewer frames, or raise max_context)")
        return embeds, input_ids, min(max_new, headroom)

    def prepare_engine_request(self, frames, question: str,
                               max_new_tokens: int | None = None) -> dict:
        """Submit-kwargs for the continuous batching engine
        (serve/continuous.py): the prompt-assembly half of generate() with
        the decode half handed to the engine.  Standard 1-D rope — no rope
        tables needed.  ``prefix_len`` marks the question-independent
        shareable prefix (bos + system + spliced video block, i.e.
        everything through the <image> splice) for the engine's prefix
        cache — identical for every question on the same video + frame
        selection, so the serve layer can key it by (video, mtime,
        frames)."""
        embeds, ids, max_new = self._prepare_generate(
            frames, question, max_new_tokens, None, None)
        out = {"embeds": embeds, "max_new_tokens": max_new}
        ids = list(ids)
        if IMAGE_TOKEN_INDEX in ids:
            sent = ids.index(IMAGE_TOKEN_INDEX)
            n_vid = int(embeds.shape[1]) - (len(ids) - 1)
            plen = sent + n_vid          # expand(sent + 1) == sent + n_vid
            if 0 < plen < int(embeds.shape[1]):
                out["prefix_len"] = plen
        return out

    def generate_stream(self, frames: np.ndarray, question: str,
                        max_new_tokens: int | None = None,
                        prompt: str | None = None,
                        audio: np.ndarray | None = None, chunk: int = 8,
                        temperature: float = 0.0, top_p: float = 1.0,
                        seed: int | None = None):
        """Streaming generate: yields TEXT DELTAS whose concatenation equals
        ``generate(...)``'s output token-for-token (greedy_decode_stream is
        chunk-exact vs the fused loop; sample_decode_stream vs sample_decode
        at equal seed — ``temperature > 0`` routes there, same surface as
        :meth:`generate`).  Detokenization is prefix-based — each yield
        decodes the full emitted prefix and emits the new suffix, so BPE
        merges across chunk boundaries render correctly.  Time-to-first-text
        drops from prefill+full-decode to prefill+one chunk."""
        from .qwen2 import (greedy_decode_stream, sample_decode_stream,
                            stream_detokenize)
        embeds, _, max_new = self._prepare_generate(
            frames, question, max_new_tokens, prompt, audio)
        S = embeds.shape[1]
        valid = jnp.ones((1, S), bool)
        n_chunks = -(-max_new // chunk)
        # NOT clamped to max_context: the final chunk may run a few steps
        # past max_new (trimmed host-side); those throwaway steps still
        # need real cache slots so they can't alias onto emitted ones
        cache = KVCache.create(self.cfg.lm, 1, S + n_chunks * chunk,
                               embeds.dtype)
        if temperature and temperature > 0:
            blocks = sample_decode_stream(
                self.params["lm"], embeds, valid, cache, self.cfg.lm,
                max_new, jax.random.PRNGKey(_sampling_seed(seed)),
                float(temperature), float(top_p), chunk=chunk)
        else:
            blocks = greedy_decode_stream(self.params["lm"], embeds, valid,
                                          cache, self.cfg.lm, max_new,
                                          chunk=chunk)
        yield from stream_detokenize(blocks, self.decode,
                                     self.cfg.lm.eos_token_id)

    def generate(self, frames: np.ndarray, question: str,
                 max_new_tokens: int | None = None, prompt: str | None = None,
                 audio: np.ndarray | None = None, temperature: float = 0.0,
                 top_p: float = 1.0, seed: int | None = None) -> str:
        """Full reference generate path (llava_qwen.py:178-197 +
        tspo_trainer.py:527-534): greedy at the default temperature 0;
        ``temperature > 0`` routes to nucleus sampling (qwen2.sample_decode)
        the way the reference adapter maps temperature to do_sample
        (llava_vid.py:515-516) — every video benchmark pins 0, so greedy
        stays the production path.  ``audio`` (16 kHz waveform) splices
        AudioTower tokens at the <audio> sentinel — inserted after the
        <image> line when the default prompt is used."""
        embeds, input_ids, max_new = self._prepare_generate(
            frames, question, max_new_tokens, prompt, audio)
        S = embeds.shape[1]
        valid = jnp.ones((1, S), bool)
        if temperature and temperature > 0:
            from .qwen2 import sample_decode
            max_len = min(self.cfg.max_context, S + max_new + 8)
            cache = KVCache.create(self.cfg.lm, 1, max_len, embeds.dtype)
            toks, n = sample_decode(
                self.params["lm"], embeds, valid, cache, self.cfg.lm,
                max_new, jax.random.PRNGKey(_sampling_seed(seed)),
                float(temperature), float(top_p))
            toks = np.asarray(toks)[: int(n)]
            eos = self.cfg.lm.eos_token_id
            return self.decode(toks[toks != eos].tolist())
        # clamp the draft to the remaining cache headroom: the speculative
        # verify block needs S + max_new + d slots; at zero residual
        # headroom fall back to plain greedy
        d = min(self.draft_len, self.cfg.max_context - S - max_new)
        if self.speculative and d >= 1:
            from .qwen2 import build_spec_lookup, greedy_decode_speculative
            lookup, lvalid = build_spec_lookup(
                t for t in input_ids if t >= 0)
            max_len = min(self.cfg.max_context, S + max_new + d + 10)
            cache = KVCache.create(self.cfg.lm, 1, max_len, embeds.dtype)
            toks, n, _ = greedy_decode_speculative(
                self.params["lm"], embeds, valid, cache, self.cfg.lm,
                max_new, lookup, lvalid, draft_len=d)
        else:
            max_len = min(self.cfg.max_context, S + max_new + 8)
            cache = KVCache.create(self.cfg.lm, 1, max_len, embeds.dtype)
            toks, n = greedy_decode(self.params["lm"], embeds, valid, cache,
                                    self.cfg.lm, max_new)
        toks = np.asarray(toks)[: int(n)]
        eos = self.cfg.lm.eos_token_id
        toks = toks[toks != eos]
        return self.decode(toks.tolist())

    def generate_batch(self, frames_list, question: str,
                       max_new_tokens: int | None = None) -> list:
        """Batched greedy generation over G frame subsets of equal size —
        the TSPO rollout (tspo_trainer.py:508-537 loops generate() G times;
        one batched decode amortizes the weight reads that dominate).  The
        equal-prompt case of generate_batch_multi (the ragged path
        degenerates to no padding)."""
        return self.generate_batch_multi(frames_list,
                                         [question] * len(frames_list),
                                         max_new_tokens=max_new_tokens)

    def generate_batch_multi(self, frames_list, questions,
                             max_new_tokens: int | None = None) -> list:
        """Batched greedy generation with PER-ITEM questions and frame sets
        (ragged prompts): embeds right-pad to the longest row, per-row valid
        lengths drive the decode rope/mask (greedy_decode ragged support).
        This is the cross-sample G x B rollout batching of the multi-chip
        trainer (cfg.cross_batch_rollouts) and mixed-question serving."""
        if self.encode is None or self.decode is None:
            raise ValueError("needs encode/decode tokenizer callables")
        max_new = self.max_new_tokens if max_new_tokens is None \
            else max_new_tokens
        if max_new < 1:
            raise ValueError(f"max_new_tokens must be >= 1, got {max_new}")
        rows = []
        for frames, question in zip(frames_list, questions):
            prompt = self._prompt(question)
            input_ids = tokenize_with_image(prompt, self.encode,
                                            self.bos_token_id)
            rows.append(self.splice_embeddings(
                input_ids, self.encode_video(frames))[0])     # [S_i, D]
        S = max(int(r.shape[0]) for r in rows)
        B = len(rows)
        embeds = jnp.stack([
            jnp.pad(r, ((0, S - r.shape[0]), (0, 0))) for r in rows])
        valid = np.zeros((B, S), bool)
        for b, r in enumerate(rows):
            valid[b, : r.shape[0]] = True
        headroom = self.cfg.max_context - S
        if headroom < 1:
            raise ValueError(
                f"longest prompt is {S} tokens but max_context="
                f"{self.cfg.max_context}: no cache slot left to generate "
                "into (fewer frames, or raise max_context)")
        max_new = min(max_new, headroom)
        max_len = min(self.cfg.max_context, S + max_new + 8)
        cache = KVCache.create(self.cfg.lm, B, max_len, embeds.dtype)
        toks, _ = greedy_decode(self.params["lm"], embeds,
                                jnp.asarray(valid), cache, self.cfg.lm,
                                max_new)
        toks = np.asarray(toks).reshape(B, -1)
        eos = self.cfg.lm.eos_token_id
        return [self.decode(row[row != eos].tolist()) for row in toks]

    def _continuation_log_softmax(self, frames, question: str,
                                  continuation: str,
                                  prompt: str | None = None):
        """Teacher-forced single forward over prompt+continuation: returns
        (cont_ids, log_softmax rows at the continuation positions
        [n_cont, V]) — the shared core of :meth:`loglikelihood` and
        :meth:`continuation_logprobs`."""
        from .qwen2 import lm_logits, qwen2_forward
        prompt = prompt if prompt is not None else self._prompt(question)
        prompt_ids = tokenize_with_image(prompt, self.encode, self.bos_token_id)
        cont_ids = list(self.encode(continuation))
        if frames is None or len(frames) == 0:
            video_tokens = jnp.zeros((0, self.cfg.lm.hidden_size),
                                     self.params["lm"]["embedding"].dtype)
        else:
            video_tokens = self.encode_video(frames)
        embeds = self.splice_embeddings(prompt_ids + cont_ids, video_tokens)

        S = embeds.shape[1]
        n_cont = len(cont_ids)
        cache = KVCache.create(self.cfg.lm, 1, S, embeds.dtype)
        hidden, _ = qwen2_forward(self.params["lm"], embeds, cache,
                                  jnp.arange(S), jnp.ones((1, S), bool),
                                  self.cfg.lm)
        logits = lm_logits(self.params["lm"], hidden[0, -n_cont - 1:-1],
                           self.cfg.lm)                       # [n_cont, V]
        return cont_ids, jax.nn.log_softmax(logits, axis=-1)

    def render_chat_prompt(self, turns) -> str:
        """The exact prompt :meth:`generate_multi_round` renders for
        ``turns`` — in the form :meth:`continuation_logprobs`'s ``prompt``
        param expects (the full conversation-template prompt), so served
        chat logprobs score against precisely what generated the answer."""
        from .conversation import build_prompt_multi
        return build_prompt_multi(turns, self.conv_template)

    def loglikelihood(self, frames: np.ndarray, question: str,
                      continuation: str, prompt: str | None = None):
        """(logprob, is_greedy) of ``continuation`` given the video prompt —
        the lmms-eval ``loglikelihood`` request type (api/model.py:20-82,
        llava_vid_tspo.py:385-445)."""
        cont_ids, lp = self._continuation_log_softmax(frames, question,
                                                      continuation, prompt)
        targets = jnp.asarray(cont_ids)
        token_lp = lp[jnp.arange(len(cont_ids)), targets]
        greedy = jnp.argmax(lp, axis=-1) == targets
        return float(token_lp.sum()), bool(jnp.all(greedy))

    def continuation_logprobs(self, frames, question: str,
                              continuation: str,
                              prompt: str | None = None, top_k: int = 0):
        """Per-token log-probabilities of ``continuation`` after the
        prompt — the OpenAI ``logprobs`` payload for chat completions
        (one teacher-forced forward).  Returns (cont_ids [n],
        token_logprobs [n], top_ids [n, top_k], top_logprobs [n, top_k])
        as host arrays; top_* are empty at ``top_k=0``."""
        cont_ids, lp = self._continuation_log_softmax(frames, question,
                                                      continuation, prompt)
        n = len(cont_ids)
        token_lp = np.asarray(lp[jnp.arange(n), jnp.asarray(cont_ids)],
                              np.float64)
        if top_k > 0:
            top_lps, top_ids = jax.lax.top_k(lp, top_k)
            return (cont_ids, token_lp, np.asarray(top_ids),
                    np.asarray(top_lps, np.float64))
        return (cont_ids, token_lp, np.zeros((n, 0), np.int32),
                np.zeros((n, 0), np.float64))

    # -- checkpoint interop -------------------------------------------------

    def quantize_lm(self) -> "LLaVAVideoModel":
        """Weight-only int8 for the Qwen2 decoder (decode is weight-bandwidth
        bound; see models/qwen2.py::quantize_qwen2_params)."""
        from .qwen2 import quantize_qwen2_params
        self.params = {**self.params,
                       "lm": quantize_qwen2_params(self.params["lm"])}
        return self

    def quantize_vision(self) -> "LLaVAVideoModel":
        """int8 SigLIP tower (siglip.quantize_siglip_params)."""
        from .siglip import quantize_siglip_params
        self.params = {**self.params,
                       "vision": quantize_siglip_params(self.params["vision"])}
        return self

    @classmethod
    def from_torch_checkpoint(cls, model_or_sd, cfg: LLaVAVideoConfig,
                              dtype=jnp.bfloat16, **kw) -> "LLaVAVideoModel":
        """Port a LlavaQwenForCausalLM checkpoint (llava_qwen.py layout):
        LM under ``model.``, tower under ``model.vision_tower.vision_tower.``,
        projector ``model.mm_projector.{0,2}``, plus ``model.image_newline``.
        The TSPO selector weights (``multiModal_align.*``) are ignored here —
        load them via models/selector.py."""
        sd = state_dict_of(model_or_sd)
        lm_sd = {k: v for k, v in sd.items()
                 if k.startswith("model.") and ".vision_tower." not in k
                 and ".mm_projector." not in k and k != "model.image_newline"}
        lm_sd["lm_head.weight"] = sd["lm_head.weight"]
        vt = "model.vision_tower.vision_tower.vision_model."
        vision_sd = {k[len("model.vision_tower.vision_tower."):]: v
                     for k, v in sd.items() if k.startswith(vt)}
        params = {
            "lm": qwen2_params_from_torch(lm_sd, cfg.lm, dtype),
            "vision": siglip_params_from_torch(vision_sd, cfg.vision, dtype),
            "projector": {
                "fc1": {"kernel": jnp.asarray(sd["model.mm_projector.0.weight"].T, dtype),
                        "bias": jnp.asarray(sd["model.mm_projector.0.bias"], dtype)},
                "fc2": {"kernel": jnp.asarray(sd["model.mm_projector.2.weight"].T, dtype),
                        "bias": jnp.asarray(sd["model.mm_projector.2.bias"], dtype)},
            },
            "image_newline": jnp.asarray(sd["model.image_newline"], dtype),
        }
        return cls(params=params, cfg=cfg, **kw)

    @classmethod
    def random_init(cls, seed: int, cfg: LLaVAVideoConfig, dtype=jnp.bfloat16,
                    **kw) -> "LLaVAVideoModel":
        k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
        W, D = cfg.vision.width, cfg.lm.hidden_size
        params = {
            "lm": init_qwen2_params(k1, cfg.lm, dtype),
            "vision": init_siglip_params(k2, cfg.vision, dtype),
            "projector": {
                "fc1": {"kernel": jax.random.normal(k3, (W, D), dtype) * 0.02,
                        "bias": jnp.zeros(D, dtype)},
                "fc2": {"kernel": jax.random.normal(k4, (D, D), dtype) * 0.02,
                        "bias": jnp.zeros(D, dtype)},
            },
            "image_newline": jnp.zeros(D, dtype),
        }
        return cls(params=params, cfg=cfg, **kw)


class ConversationState:
    """Prefix-KV reuse across conversation rounds (generate_multi_round).

    Round i+1's rendered prompt string extends round i's prompt + answer
    (chat templates append turns), so nearly every token of the new prompt
    already has K/V in the cache; only the separator + new-turn tokens need
    a forward pass, and the video encodes once per conversation.  The
    reference-shaped stateless path re-encodes the video and re-prefills the
    full ~12k-token history every round.

    Invariants: cache slots [0, covered) are hole-free real tokens whose
    sentinel-level token ids are ``ids`` (the <image> sentinel expands to
    n_video embed slots).  Reuse is the longest common token prefix —
    divergence anywhere (edited history, BPE seams) degrades gracefully to
    partial or zero reuse, never to wrong output.

    One state belongs to ONE (video, conversation): the video encodes on
    first use and is reused for every later round — start a fresh state per
    video (the eval harness makes one per doc).
    """

    def __init__(self, headroom: int = 2048):
        self.ids: list[int] = []
        self.covered = 0               # embed-level tokens in cache
        self.cache: KVCache | None = None
        self.video_tokens = None       # encoded once per conversation
        self.headroom = int(headroom)

    def reset(self):
        """Drop the cache (capacity overflow): the next round re-prefills
        fully into a larger cache.  Video tokens stay."""
        self.ids, self.covered, self.cache = [], 0, None


def llava_video_param_shardings(params, mesh):
    """TP shardings: Qwen2 rules for the LM, Megatron column/row rules for
    the SigLIP tower (its layer structure matches the CLIP tower, so the same
    spec function applies); projector/newline replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import clip_param_shardings
    repl = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()),
        {k: v for k, v in params.items() if k not in ("lm", "vision")})
    return {"lm": qwen2_param_shardings(params["lm"], mesh),
            "vision": clip_param_shardings(params["vision"], mesh), **repl}
