"""Minimal production scoring service.

The reference ships gradio/sglang serving only in vendored-unused LLaVA code
(SURVEY C44); TSPO itself has no serving story.  This is a deliberately
dependency-free (stdlib http.server) JSON service holding the scorer (and
optionally a backbone) hot on the chip:

  POST /v1/score   {"video_path": ..., "question": ..., "sample_num": 64,
                    "method": "topk"}    -> {"frame_indices": [...], ...}
  POST /v1/answer  {same + "max_new_tokens"} -> {"answer": ..., ...}
  GET  /healthz                          -> {"ok": true}

Device work serializes behind a lock (single chip); decode runs outside the
lock so concurrent requests overlap host IO with device compute.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ..video.reader import load_video


@dataclass
class ScoringService:
    scorer: object
    backbone: object | None = None
    max_candidates: int = 50000
    default_sample_num: int = 64
    default_window: int = 12
    # micro-batching for /v1/answer: concurrent requests arriving within
    # ``batch_window_s`` decode as ONE ragged-prompt batch through
    # backbone.generate_batch_multi (measured 2.065 vs 2.216 s/question at
    # B=2, bench_phase2_roofline).  0 disables (strictly serial decode).
    batch_window_s: float = 0.0
    max_batch: int = 4
    # LRU of per-video image features (float32, keyed by (path, mtime)):
    # interactive QA asks many questions of ONE video, and decode + the
    # vision tower are ~98% of scoring cost (docs/KERNELS.md attribution) —
    # warm questions run only text tower + cosine + selector.  Counted in
    # videos; ~150 MB host RAM per 50k-frame video.  0 disables (every
    # request uses the fused single-dispatch program).
    video_feature_cache: int = 2
    # continuous batching (serve/continuous.py): >0 enables a slot-based
    # decode engine for /v1/answer and chat completions — requests join and
    # leave an always-running batched decode at chunk boundaries instead of
    # forming static window batches.  Mutually exclusive with batch_window_s
    # in effect (the engine path wins when both are set).
    continuous_slots: int = 0
    continuous_chunk: int = 8
    continuous_max_prompt: int = 13312     # 64-frame LLaVA prompt + text
    continuous_decode_slots: int = 512
    # >0: engine admissions arriving while rows decode prefill in pieces of
    # this many tokens interleaved with decode chunks (bounded stalls)
    continuous_prefill_chunk: int = 0
    # optional jax.sharding.Mesh with a 'model' axis: the engine decodes
    # tensor-parallel over it (token-identical to unsharded; see
    # continuous.py).  Shard the backbone's own params up-front too
    # (llava_video_param_shardings / qwen25vl_param_shardings) so the solo
    # and vision paths run on the same mesh — cli/serve.py --tp does both.
    mesh: object | None = None
    # chat sessions: /v1/answer with "session_id" keeps a per-session
    # conversation (turn history + prefix-KV ConversationState) so
    # follow-up questions about the same video prefill only the new turn.
    # LRU-capped in sessions; each holds one conversation KV cache
    # (~0.9 GB at the 7B/64-frame geometry).
    max_sessions: int = 4
    # >0: cross-request video prefix-KV cache (vLLM automatic-prefix-caching
    # analog) for INDEPENDENT greedy /v1/answer requests: the shared
    # system+video prompt prefix's KV is kept per (video, mtime, selected
    # frames) and each request extension-prefills only its question text —
    # the ConversationState divergence path drops the previous question/
    # answer tokens, so requests stay history-free.  Warm same-video
    # questions skip the ~12.2k-token video prefill (chip-measured 1.84 ->
    # 0.66 s/round for the same mechanics, docs/KERNELS.md).  Hits require
    # an identical frame selection (selection is question-conditioned, so
    # only questions that pick the same frames share a prefix — the frame
    # indices are part of the key, never a false share).  Counted in videos
    # (~0.9 GB KV each at 7B/64-frame).  With the continuous engine on,
    # the pool lives INSIDE the engine (continuous.py prefix_slots — warm
    # admissions skip the video prefill while other tenants keep
    # decoding); engine off, a solo ConversationState pool serves the same
    # role.
    prefix_cache: int = 0

    def __post_init__(self):
        self._device_lock = threading.Lock()
        self._engine = None
        if self.continuous_slots > 0:
            if self.backbone is None:
                raise ValueError("--continuous needs a backbone")
            if not hasattr(self.backbone, "prepare_engine_request"):
                raise ValueError(
                    f"backbone {type(self.backbone).__name__} does not "
                    "support the continuous engine (needs "
                    "prepare_engine_request)")
            from .continuous import ContinuousEngine
            self._engine = ContinuousEngine(
                self.backbone.params["lm"], self.backbone.cfg.lm,
                slots=self.continuous_slots, chunk=self.continuous_chunk,
                max_prompt=self.continuous_max_prompt,
                decode_slots=self.continuous_decode_slots,
                prefill_chunk=self.continuous_prefill_chunk,
                dtype=self.backbone.params["lm"]["embedding"].dtype,
                device_lock=self._device_lock, mesh=self.mesh,
                prefix_slots=self.prefix_cache)
        self._batch_lock = threading.Lock()
        self._pending = []          # [(event, payload dict, result dict)]
        self._feat_cache = {}       # (path, mtime) -> img_feat float32 [T, P]
        self._feat_order = []       # LRU order, most recent last
        self._feat_lock = threading.Lock()   # ThreadingHTTPServer: one
        # mutator at a time for the LRU bookkeeping (reads of the stored
        # arrays are safe — entries are immutable once inserted)
        self._sessions = {}          # session_id -> dict (LRU, _feat_lock)
        self._session_order = []
        self._session_seen = set()   # ids ever created (eviction signal)
        self._prefix_states = {}     # (path, mtime, frames) -> entry (LRU)
        self._prefix_order = []
        self.stats = {"requests": 0, "frames_scored": 0, "batched": 0,
                      "feature_cache_hits": 0, "engine": 0,
                      "engine_fallback": 0, "session_rounds": 0,
                      "prefix_hits": 0}

    def warmup(self, hw=(480, 640)):
        """Compile the scoring programs before serving traffic (first-call
        latency is compile-dominated).  Warms whichever path requests will
        actually take: the feature-LRU path (encode chunks + the fused
        question program) when the cache is on, the fused video program
        otherwise."""
        frames = np.zeros((self.scorer.batch_frames, *hw, 3), np.uint8)
        with self._device_lock:
            if self._cache_usable():
                img = np.asarray(self.scorer.encode_frame_features(frames),
                                 np.float32)
                self.scorer.score_features_fused(
                    img, "warmup", sample_num=min(16, len(frames)))
            elif hasattr(self.scorer, "score_video_fused"):
                self.scorer.score_video_fused(frames, "warmup",
                                              sample_num=min(16, len(frames)))
            else:
                self.scorer(frames, "warmup", sample_num=min(16, len(frames)))
        if self._engine is not None:
            # compile the engine's chunk program (shared by every request)
            # and one prompt-bucket prefill before traffic arrives
            import jax.numpy as jnp
            dim = self.backbone.cfg.lm.hidden_size
            S = min(self._engine.bucket, self._engine.S_max)
            dummy = jnp.zeros((1, S, dim), self._engine.dtype)
            self._engine.submit(
                dummy, max_new_tokens=self._engine.chunk).result(timeout=None)
        return self

    def _cache_usable(self) -> bool:
        return (self.video_feature_cache > 0
                and hasattr(self.scorer, "encode_frame_features")
                and hasattr(self.scorer, "score_features_fused"))

    def _decode(self, video_path: str):
        frames, _, _ = load_video(video_path, max_frames_num=self.max_candidates,
                                  fps=1, min_frames_num=0)
        if frames.sum() == 0:
            raise IOError(f"could not decode {video_path}")
        return frames

    def _video_features(self, video_path: str, frames=None):
        """(img_feat float32 [T, P], candidate_schedule, cache_hit,
        cold_frames_or_None) through the LRU.  Cold videos decode via the
        schedule gather (ONE container probe; the frames come back to the
        caller so nothing decodes twice) + vision-encode under the device
        lock; features are stored float32 so warm and cold scoring see
        identical inputs — the same semantics as the phase-1 cache."""
        key = (video_path, os.path.getmtime(video_path))
        with self._feat_lock:
            if key in self._feat_cache:
                self._feat_order.remove(key)
                self._feat_order.append(key)
                self.stats["feature_cache_hits"] += 1
                img, sched = self._feat_cache[key]
                return img, sched, True, None
        from ..eval.precompute import candidate_schedule
        sched = np.asarray(candidate_schedule(video_path,
                                              self.max_candidates))
        if frames is None:
            from ..video.reader import load_video_indices
            frames = load_video_indices(video_path, sched)
            if frames.shape[0] != len(sched) or                     (len(frames) and frames.sum() == 0):
                frames = self._decode(video_path)   # tolerant fallback
        if len(frames) != len(sched):
            sched = None    # misaligned decode: warm answers re-decode fully
        with self._device_lock:
            img = np.asarray(self.scorer.encode_frame_features(frames),
                             np.float32)
        with self._feat_lock:
            if key not in self._feat_cache:   # concurrent cold misses race
                self._feat_cache[key] = (img, sched)
                self._feat_order.append(key)
            while len(self._feat_order) > self.video_feature_cache:
                self._feat_cache.pop(self._feat_order.pop(0), None)
        return img, sched, False, frames

    def score(self, *, video_path: str, question: str, sample_num: int | None = None,
              method: str = "topk", window_size: int | None = None,
              return_scores: bool = False) -> dict:
        t0 = time.perf_counter()
        sample_num = sample_num or self.default_sample_num
        if self._cache_usable():
            img, _sched, _hit, _frames = self._video_features(video_path)
            with self._device_lock:
                # one dispatch: text tower + cosine + selector + top-k
                idx, logits = self.scorer.score_features_fused(
                    img, question, sample_num=sample_num,
                    window_size=window_size or self.default_window,
                    method=method)
            n_frames = len(img)
        else:
            frames = self._decode(video_path)      # outside the device lock
            with self._device_lock:
                if method == "topk" and hasattr(self.scorer,
                                                "score_video_fused"):
                    idx, logits = self.scorer.score_video_fused(
                        frames, question, sample_num=sample_num,
                        window_size=window_size or self.default_window)
                else:
                    idx, logits = self.scorer(
                        frames, question, sample_num=sample_num,
                        window_size=window_size or self.default_window,
                        method=method)
            n_frames = len(frames)
        with self._feat_lock:
            self.stats["requests"] += 1
            self.stats["frames_scored"] += n_frames
        out = {"frame_indices": [int(i) for i in idx],
               "num_candidates": int(n_frames),
               "latency_s": round(time.perf_counter() - t0, 4)}
        if return_scores:
            out["scores"] = [float(x) for x in np.asarray(logits)]
        return out

    @staticmethod
    def _chat_prompt(messages: list) -> str:
        """Join system + user turns the way the chatml template renders
        them (system prompt then user content) — shared by the plain and
        streaming chat endpoints so prompt assembly can't diverge."""
        system = "\n".join(str(m.get("content", "")) for m in messages
                           if m.get("role") == "system")
        user = "\n".join(str(m.get("content", "")) for m in messages
                         if m.get("role") != "system")
        return (system + "\n\n" + user).strip() if system else user

    def _require_sampled_stream(self):
        """Raise unless the backbone's generate_stream explicitly takes
        ``temperature`` — a **kwargs sink would swallow the sampling params
        and stream greedy, the silent-degradation class this codebase
        rejects (advisor round-4 finding)."""
        if not self._accepts_temperature("generate_stream"):
            raise ValueError("sampled streaming unsupported on this "
                             "backbone: set temperature=0 or stream=false")

    def _accepts_temperature(self, method: str) -> bool:
        """True when the backbone's ``method`` explicitly accepts
        ``temperature`` (signature probe — a **kwargs sink doesn't count:
        it would swallow the sampling params and run greedy)."""
        import inspect
        fn = getattr(self.backbone, method, None)
        return fn is not None and \
            "temperature" in inspect.signature(fn).parameters

    @staticmethod
    def _render_turns(turns: list) -> str:
        """Role-labeled flatten of _chat_turns output for paths that must
        go through the single-prompt generate (e.g. sampled decode, which
        has no multi-round variant): past rounds render as
        ``User:/Assistant:`` blocks so the model sees the dialog
        structure, ending with the open user turn."""
        parts = []
        for q, a in turns:
            if a is None:
                parts.append(q)
            else:
                parts.append(f"User: {q}\nAssistant: {a}")
        return "\n\n".join(parts)

    @staticmethod
    def _chat_turns(messages: list):
        """OpenAI messages -> multi-round turns [(q, a), ..., (q, None)],
        or None when the history carries no assistant turn (the
        single-turn fast path — prompt assembly stays _chat_prompt's).
        Assistant turns close the current user group (consecutive
        same-role contents join with newlines, like _chat_prompt); the
        system prompt prepends to the first user turn, which is where the
        chatml template renders leading context."""
        if not any(m.get("role") == "assistant" for m in messages):
            return None
        system, turns, cur_q = [], [], []
        for m in messages:
            role, content = m.get("role"), str(m.get("content", ""))
            if role == "system":
                system.append(content)
            elif role == "assistant":
                turns.append(("\n".join(cur_q), content))
                cur_q = []
            else:
                cur_q.append(content)
        turns.append(("\n".join(cur_q), None))
        if system:
            q0, a0 = turns[0]
            turns[0] = (("\n".join(system) + "\n\n" + q0).strip(), a0)
        return turns

    def _generate_text(self, prompt: str, kwargs: dict) -> str:
        """Text-only generate — through the continuous engine when enabled
        (judge traffic batches with everything else), else device-locked
        solo with the TypeError fallback for adapters that don't take
        max_new_tokens."""
        if self._engine is not None:
            text = self._engine_answer(None, prompt,
                                       kwargs.get("max_new_tokens"))
            if text is not None:
                return text
        with self._device_lock:
            try:
                return self.backbone.generate(None, prompt, **kwargs)
            except TypeError:
                return self.backbone.generate(None, prompt)

    def _locked_stream(self, it):
        """Drive a generate_stream iterator holding the device lock only
        across next() — i.e. device work — never across the SSE socket
        write between yields: a slow-reading client must not block
        /v1/score on an idle chip."""
        it = iter(it)
        while True:
            with self._device_lock:
                try:
                    delta = next(it)
                except StopIteration:
                    return
            yield delta

    def chat_completion(self, *, messages: list, model: str = "local",
                        max_tokens: int | None = None,
                        temperature: float = 0.0, top_p: float = 1.0,
                        seed: int | None = None, n: int = 1,
                        logprobs: bool = False,
                        top_logprobs: int | None = None,
                        stop=None, **_ignored) -> dict:
        """OpenAI-compatible chat completion on the loaded backbone's
        text-only generate path — the zero-egress replacement for the
        reference's sglang judge launcher
        (lmms-eval/lmms_eval/llm_judge/launcher/): third-party harnesses
        point API_TYPE=openai / OPENAI_API_URL at this server and judge
        with the local model.  ``n > 1`` returns n sampled choices (judge
        self-consistency / best-of-n); with the engine on, all n decode as
        co-resident batch rows off ONE prefill-prompt assembly.
        ``logprobs`` (+ ``top_logprobs`` <= 20) attaches OpenAI-format
        per-token log-probabilities, computed by rescoring each returned
        choice through one teacher-forced forward against the EXACT prompt
        that generated it (backbone.continuation_logprobs)."""
        if self.backbone is None:
            raise ValueError("no backbone loaded")
        n = int(n)
        if n < 1:
            raise ValueError("n must be >= 1")
        if n > 1 and not (temperature and float(temperature) > 0):
            raise ValueError("n > 1 needs temperature > 0 (greedy choices "
                             "would be identical)")
        top_lp = 0
        if top_logprobs is not None:
            if not logprobs:
                raise ValueError("top_logprobs requires logprobs=true")
            top_lp = int(top_logprobs)
            if not (0 <= top_lp <= 20):
                raise ValueError("top_logprobs must be in [0, 20]")
        if logprobs and not hasattr(self.backbone, "continuation_logprobs"):
            # loud, never silently omitted (codebase rule)
            raise ValueError(f"backbone {type(self.backbone).__name__} "
                             "does not support logprobs "
                             "(needs continuation_logprobs)")
        self._apply_stop("", stop)       # validate BEFORE paying decode
        kwargs = {"max_new_tokens": max_tokens} if max_tokens else {}
        texts, lp_turns, lp_prompt = None, None, None
        if temperature and float(temperature) > 0:
            # OpenAI sampling params -> the backbone's sample_decode path
            seeds = self._choice_seeds(None if seed is None else int(seed),
                                       n)
            turns = self._chat_turns(messages)
            if turns is not None and self._accepts_temperature(
                    "generate_multi_round"):
                # history rides the REAL conversation template (stateless:
                # sampled rounds do a full prefill, no prefix-KV)
                texts, lp_turns = [], turns
                for s in seeds:
                    kw = {**kwargs, "temperature": float(temperature),
                          "top_p": float(top_p), "seed": s}
                    with self._device_lock:
                        texts.append(self.backbone.generate_multi_round(
                            None, turns, **kw))
            else:
                # fallback for backbones with sampled generate but no
                # sampled multi_round: role-labeled flatten keeps the
                # dialog structure
                lp_prompt = (self._render_turns(turns)
                             if turns is not None
                             else self._chat_prompt(messages))
                if n > 1:
                    texts = self._sampled_answers_n(
                        None, lp_prompt, max_tokens, temperature, top_p,
                        None if seed is None else int(seed), n)
                else:
                    kwargs.update(temperature=float(temperature),
                                  top_p=float(top_p),
                                  seed=None if seed is None else int(seed))
                    texts = [self._generate_text_sampled(lp_prompt, kwargs)]
        else:
            turns = self._chat_turns(messages)
            if turns is not None and hasattr(self.backbone,
                                             "generate_multi_round"):
                # history with assistant turns: ride the conversation
                # template (role structure reaches the model) instead of
                # flattening the dialog into one user blob
                lp_turns = turns
                with self._device_lock:
                    texts = [self.backbone.generate_multi_round(None, turns,
                                                                **kwargs)]
            else:
                lp_prompt = self._chat_prompt(messages)
                texts = [self._generate_text(lp_prompt, kwargs)]
        texts = [self._apply_stop(t, stop) for t in texts]
        lp_payloads = None
        if logprobs:
            lp_payloads = [self._chat_logprobs(lp_turns, lp_prompt, t,
                                               top_lp) for t in texts]
        return self._chat_completion_finish(
            texts if n > 1 else texts[0], model, lp_payloads)

    def _chat_logprobs(self, turns, prompt, text: str, top_k: int) -> dict:
        """OpenAI logprobs payload for one choice: rescore the returned
        text against the prompt that generated it — the conversation
        template render when ``turns`` drove the generation
        (backbone.render_chat_prompt), the flattened prompt otherwise."""
        bb = self.backbone
        with self._device_lock:
            if turns is not None:
                cont_ids, token_lp, top_ids, top_lps =                     bb.continuation_logprobs(
                        None, "", text,
                        prompt=bb.render_chat_prompt(turns), top_k=top_k)
            else:
                cont_ids, token_lp, top_ids, top_lps =                     bb.continuation_logprobs(None, prompt, text,
                                             top_k=top_k)
        content = []
        for i, (tid, lp) in enumerate(zip(cont_ids, token_lp)):
            entry = {"token": bb.decode([int(tid)]),
                     "logprob": round(float(lp), 6)}
            if top_k:
                entry["top_logprobs"] = [
                    {"token": bb.decode([int(t)]),
                     "logprob": round(float(l), 6)}
                    for t, l in zip(top_ids[i], top_lps[i])]
            content.append(entry)
        return {"content": content}

    def _generate_text_sampled(self, prompt: str, kwargs: dict) -> str:
        """Text generate with sampling kwargs: the engine's per-row
        sampling when on (sampled judge traffic batches with everything
        else), else solo device-locked.  No TypeError fallback — silently
        answering a temperature>0 request greedily is the
        silent-degradation class this codebase rejects; backbones without
        sampling raise and the client gets a named 4xx/5xx."""
        if self._engine is not None:
            sampling = {k: kwargs[k] for k in
                        ("temperature", "top_p", "seed") if k in kwargs}
            text = self._engine_answer(None, prompt,
                                       kwargs.get("max_new_tokens"),
                                       sampling=sampling)
            if text is not None:
                return text
        with self._device_lock:
            return self.backbone.generate(None, prompt, **kwargs)

    def _chat_completion_finish(self, text: str | list, model: str,
                                logprobs_list: list | None = None) -> dict:
        texts = text if isinstance(text, list) else [text]
        with self._feat_lock:
            self.stats["requests"] += 1
            rid = self.stats["requests"]
        choices = []
        for i, t in enumerate(texts):
            c = {"index": i,
                 "message": {"role": "assistant", "content": t},
                 "finish_reason": "stop"}
            if logprobs_list is not None:
                c["logprobs"] = logprobs_list[i]
            choices.append(c)
        return {
            "id": f"chatcmpl-{rid}",
            "object": "chat.completion",
            "created": int(time.time()),
            "model": model,
            "choices": choices,
            "usage": {"prompt_tokens": 0, "completion_tokens": 0,
                      "total_tokens": 0},
        }

    def chat_completion_stream(self, *, messages: list,
                               model: str = "local",
                               max_tokens: int | None = None,
                               temperature: float = 0.0,
                               top_p: float = 1.0,
                               seed: int | None = None,
                               n: int = 1, logprobs: bool = False,
                               stop=None, **_ignored):
        """SSE variant of chat_completion ("stream": true): yields
        OpenAI-format chat.completion.chunk dicts, one per decoded text
        delta, then a finish_reason chunk.  Backed by the backbone's
        generate_stream (chunked device decode, token-exact vs generate) —
        backbones without one degrade to a single whole-answer chunk, which
        is still valid SSE to any OpenAI client."""
        if self.backbone is None:
            raise ValueError("no backbone loaded")
        if int(n) > 1:
            raise ValueError("streaming does not support n > 1 — drop "
                             "stream or n (non-streaming requests return "
                             "n choices)")
        if logprobs:
            raise ValueError("streaming does not support logprobs — drop "
                             "stream or logprobs")
        if stop is not None:
            raise ValueError("streaming does not support stop sequences — "
                             "drop stream or stop")
        kwargs = {"max_new_tokens": max_tokens} if max_tokens else {}
        sampled = bool(temperature and float(temperature) > 0)
        sampled_mr = False
        if sampled:
            # sampled streaming rides sample_decode_stream via the
            # backbone's generate_multi_round_stream (histories — the real
            # conversation template, stateless full prefill) or
            # generate_stream; backbones without an explicit temperature
            # parameter fail loud BEFORE headers go out, never silently
            # greedy (advisor round-4 finding)
            turns = self._chat_turns(messages)
            sampled_mr = turns is not None and self._accepts_temperature(
                "generate_multi_round_stream")
            if not sampled_mr and self._engine is None:
                self._require_sampled_stream()
            kwargs.update(temperature=float(temperature),
                          top_p=float(top_p),
                          seed=None if seed is None else int(seed))
            prompt = (self._render_turns(turns) if turns is not None
                      else self._chat_prompt(messages))
        else:
            prompt = self._chat_prompt(messages)
        with self._feat_lock:
            self.stats["requests"] += 1
            cid = f"chatcmpl-{self.stats['requests']}"

        def chunk(delta: dict, finish=None) -> dict:
            return {"id": cid, "object": "chat.completion.chunk",
                    "created": int(time.time()), "model": model,
                    "choices": [{"index": 0, "delta": delta,
                                 "finish_reason": finish}]}

        stream = getattr(self.backbone, "generate_stream", None)
        yield chunk({"role": "assistant"})
        if sampled:
            # histories stream through the sampled multi-round template
            # when the backbone has one; otherwise the role-rendered
            # prompt rides the engine's per-row sampling (batches with
            # greedy traffic) or the solo sampled generate_stream
            if sampled_mr:
                it = self._locked_stream(
                    self.backbone.generate_multi_round_stream(None, turns,
                                                              **kwargs))
            else:
                sampling = {k: kwargs[k] for k in
                            ("temperature", "top_p", "seed") if k in kwargs}
                it = (self._engine_answer_stream(None, prompt,
                                                 kwargs.get("max_new_tokens"),
                                                 sampling=sampling)
                      if self._engine is not None else None)
                if it is None:
                    # engine off/overflow/dead: loud if the backbone can't
                    # stream sampled (mid-stream error event on the
                    # overflow edge), never silently greedy
                    self._require_sampled_stream()
                    it = self._locked_stream(stream(None, prompt, **kwargs))
            for delta in it:
                yield chunk({"content": delta})
            yield chunk({}, finish="stop")
            return
        turns = self._chat_turns(messages)
        if turns is not None and hasattr(self.backbone,
                                         "generate_multi_round_stream"):
            # history with assistant turns: the conversation template
            # streams (same role-structure routing as chat_completion)
            for delta in self._locked_stream(
                    self.backbone.generate_multi_round_stream(
                        None, turns, **kwargs)):
                yield chunk({"content": delta})
            yield chunk({}, finish="stop")
            return
        deltas = (self._engine_answer_stream(
                      None, prompt, kwargs.get("max_new_tokens"))
                  if self._engine is not None else None)
        if deltas is not None:
            for delta in deltas:
                yield chunk({"content": delta})
        elif stream is None:
            text = self._generate_text(prompt, kwargs)
            if text:
                yield chunk({"content": text})
        else:
            for delta in self._locked_stream(stream(None, prompt, **kwargs)):
                yield chunk({"content": delta})
        yield chunk({}, finish="stop")

    def _generate_one(self, sel_frames, question,
                      max_new_tokens: int | None) -> str:
        kwargs = {}
        if max_new_tokens:
            kwargs["max_new_tokens"] = max_new_tokens
        try:
            return self.backbone.generate(sel_frames, question, **kwargs)
        except TypeError:          # adapters without max_new_tokens kwarg
            return self.backbone.generate(sel_frames, question)

    def _answer_batched(self, sel_frames, question,
                        max_new_tokens: int | None) -> str:
        """Micro-batch: enqueue; the first enqueuer leads — waits the batch
        window, then decodes pending requests as ragged batches.  Requests
        are grouped by their max_new_tokens so per-request caps are honored;
        a failed decode routes the error to EVERY request in its group
        (events always fire — followers must never block forever)."""
        ev = threading.Event()
        slot = {"frames": sel_frames, "q": question,
                "max_new": max_new_tokens, "out": None, "err": None}
        with self._batch_lock:
            self._pending.append((ev, slot))
            leader = len(self._pending) == 1
        if leader:
            time.sleep(self.batch_window_s)
            while True:
                with self._batch_lock:
                    if not self._pending:
                        break
                    # same-cap group so each request's token budget holds
                    cap = self._pending[0][1]["max_new"]
                    batch = [p for p in self._pending
                             if p[1]["max_new"] == cap][: self.max_batch]
                    taken = {id(p) for p in batch}
                    self._pending = [p for p in self._pending
                                     if id(p) not in taken]
                try:
                    with self._device_lock:
                        if len(batch) == 1 and getattr(
                                self.backbone, "speculative", False):
                            # a lone request gains nothing from the ragged
                            # batch path; the B=1 generate() route keeps
                            # prompt-lookup speculation engaged
                            outs = [self._generate_one(
                                batch[0][1]["frames"], batch[0][1]["q"], cap)]
                        else:
                            outs = self.backbone.generate_batch_multi(
                                [s["frames"] for _, s in batch],
                                [s["q"] for _, s in batch],
                                max_new_tokens=cap)
                    if len(batch) > 1:
                        self.stats["batched"] += len(batch)
                    for (e, s), out in zip(batch, outs):
                        s["out"] = out
                        e.set()
                except Exception as exc:  # noqa: BLE001 — deliver to waiters
                    for e, s in batch:
                        s["err"] = exc
                        e.set()
        ev.wait()
        if slot["err"] is not None:
            raise slot["err"]
        return slot["out"]

    # -- continuous batching path (serve/continuous.py) ---------------------

    def _engine_usable(self) -> bool:
        """False once the engine worker died or stopped — requests then
        fall back to the solo decode path instead of 500ing forever (the
        chip and the non-engine generate path still work)."""
        return (self._engine is not None and self._engine._dead is None
                and not self._engine._stop)

    def _engine_prepare(self, frames, question, max_new):
        """Prompt assembly for an engine submit (vision encode + splice —
        device work, locked).  Returns the submit kwargs (with 'embeds'),
        or None when the request can't ride the engine (prompt too long,
        engine dead) — counted as an engine_fallback."""
        if not self._engine_usable():
            with self._feat_lock:
                self.stats["engine_fallback"] += 1
            return None
        # cheap pre-check before paying the vision encode: backbones that
        # expose tokens_per_frame let us bound the prompt without running
        # the tower (the post-prepare check below stays as the exact guard)
        tpf = getattr(self.backbone.cfg, "tokens_per_frame", None)
        if tpf and frames is not None and len(frames) and \
                self.backbone.encode is not None:
            est = (len(frames) * (tpf + 16)
                   + len(self.backbone.encode(question)) + 128)
            if est > self._engine.S_max:
                with self._feat_lock:
                    self.stats["engine_fallback"] += 1
                return None
        with self._device_lock:
            kw = self.backbone.prepare_engine_request(frames, question,
                                                      max_new)
        if kw["embeds"].shape[1] > self._engine.S_max:
            with self._feat_lock:
                self.stats["engine_fallback"] += 1
            return None
        return kw

    def _engine_submit(self, frames, question, max_new, stream_cb=None,
                       sampling: dict | None = None, prefix_key=None):
        """Submit one request to the continuous engine.  Returns the
        EngineRequest, or None when the request can't ride the engine
        (prompt too long, engine dead) — the caller then falls back to the
        solo decode path.  ``sampling`` ({temperature, top_p, seed}) rides
        the engine's per-row sampling (continuous.py) so sampled requests
        batch with greedy traffic.  ``prefix_key`` opts this greedy
        request into the engine's prefix cache (warm same-key admissions
        skip the video prefill) when the backbone reported a shareable
        ``prefix_len``."""
        kw = self._engine_prepare(frames, question, max_new)
        if kw is None:
            return None
        embeds = kw.pop("embeds")
        if prefix_key is not None and kw.get("prefix_len"):
            kw["prefix_key"] = prefix_key
        try:
            return self._engine.submit(embeds, stream_cb=stream_cb,
                                       **(sampling or {}), **kw)
        except RuntimeError:         # engine died between check and submit
            with self._feat_lock:
                self.stats["engine_fallback"] += 1
            return None

    def _engine_submit_n(self, frames, question, max_new, sampling_list):
        """Submit ``len(sampling_list)`` sampled choices of ONE prompt to
        the engine — the vision encode / prompt splice runs once and every
        choice reuses the same embeds: the whole run lands in one atomic
        enqueue and decodes off ONE shared B=1 prefill (continuous.py
        _admit_shared).  Measured NOT worth routing warm videos through
        per-choice prefix hits instead: n serialized hit admissions cost
        more than one shared prefill on this dispatch-latency-bound box
        (3.36 vs 1.93 s at n=4/5.9k — bench_shared_admission round-5
        note); single sampled requests DO ride prefix hits (their
        alternative is a full prefill).  Returns a list of
        EngineRequests, or None when the prompt can't ride the engine."""
        kw = self._engine_prepare(frames, question, max_new)
        if kw is None:
            return None
        embeds = kw.pop("embeds")
        kw.pop("prefix_len", None)
        try:
            return self._engine.submit_group(
                embeds, [{**kw, **sampling} for sampling in sampling_list])
        except RuntimeError:         # engine died between check and submit
            with self._feat_lock:
                self.stats["engine_fallback"] += 1
            return None

    @staticmethod
    def _apply_stop(text: str, stop) -> str:
        """OpenAI ``stop`` semantics: truncate at the FIRST occurrence of
        any stop sequence (the sequence itself is not included).  ``stop``
        is a string or a list of up to 4 strings."""
        if stop is None:
            return text
        seqs = [stop] if isinstance(stop, str) else list(stop)
        if len(seqs) > 4:
            raise ValueError("stop accepts at most 4 sequences")
        cut = len(text)
        for s in seqs:
            if not isinstance(s, str) or not s:
                raise ValueError("stop sequences must be non-empty strings")
            i = text.find(s)
            if i >= 0:
                cut = min(cut, i)
        return text[:cut]

    @staticmethod
    def _choice_seeds(seed, n: int) -> list:
        """Per-choice seeds for n>1 sampling: an explicit request seed
        derives choice i's seed as seed+i (deterministic reruns, distinct
        draws per choice); no seed means every choice draws fresh."""
        return [None] * n if seed is None else [int(seed) + i
                                                for i in range(n)]

    def _sampled_answers_n(self, frames, question, max_new, temperature,
                           top_p, seed, n: int, prefix_key=None
                           ) -> list[str]:
        """n independent sampled completions of ONE prompt.  Engine on:
        n > 1 choices submit together off ONE shared prefill
        (continuous.py _admit_shared); a single sampled choice rides the
        engine's prefix cache when ``prefix_key`` is given (warm video:
        suffix-only prefill + sampled first-token draw).  Engine off or
        prompt overflow: n solo sample_decode passes."""
        samplings = [{"temperature": float(temperature),
                      "top_p": float(top_p), "seed": s}
                     for s in self._choice_seeds(seed, n)]
        if self._engine is not None and n == 1:
            text = self._engine_answer(frames, question, max_new,
                                       sampling=samplings[0],
                                       prefix_key=prefix_key)
            # on overflow/dead the n-submit path would just re-prepare and
            # overflow again — fall straight through to solo decode
            return [text] if text is not None else [
                self._solo_sampled_one(frames, question, max_new,
                                       samplings[0])]
        if self._engine is not None:
            reqs = self._engine_submit_n(frames, question, max_new,
                                         samplings)
            if reqs is not None:
                try:
                    toks = [r.result() for r in reqs]
                except Exception:
                    if not self._engine_usable():
                        with self._feat_lock:
                            self.stats["engine_fallback"] += 1
                        toks = None      # engine died mid-flight: solo
                    else:
                        raise
                if toks is not None:
                    with self._feat_lock:
                        self.stats["engine"] += len(toks)
                    return [self.backbone.decode(t) for t in toks]
        return [self._solo_sampled_one(frames, question, max_new, s)
                for s in samplings]

    def _solo_sampled_one(self, frames, question, max_new,
                          sampling: dict) -> str:
        kw = dict(sampling)
        if max_new:
            kw["max_new_tokens"] = max_new
        with self._device_lock:
            return self.backbone.generate(frames, question, **kw)

    def _engine_answer(self, frames, question, max_new,
                       sampling: dict | None = None,
                       prefix_key=None) -> str | None:
        req = self._engine_submit(frames, question, max_new,
                                  sampling=sampling, prefix_key=prefix_key)
        if req is None:
            return None
        try:
            toks = req.result()
        except Exception:
            if not self._engine_usable():
                # the engine died with this request in flight — the solo
                # path still works; fall back instead of surfacing a 500
                with self._feat_lock:
                    self.stats["engine_fallback"] += 1
                return None
            raise
        with self._feat_lock:
            self.stats["engine"] += 1
        return self.backbone.decode(toks)

    def _engine_answer_stream(self, frames, question, max_new,
                              sampling: dict | None = None,
                              prefix_key=None):
        """Text-delta generator through the engine, or None on prompt
        overflow.  Chunk-boundary token pieces bridge through a queue into
        the shared prefix-detokenizer (same U+FFFD holdback as
        generate_stream); EOS never appears in engine pieces, so the block
        stream simply ends at request completion."""
        import queue as _queue
        q: _queue.Queue = _queue.Queue()
        req = self._engine_submit(frames, question, max_new,
                                  stream_cb=q.put, sampling=sampling,
                                  prefix_key=prefix_key)
        if req is None:
            return None
        from ..models.qwen2 import stream_detokenize

        def blocks():
            while True:
                try:
                    piece = q.get(timeout=0.05)
                except _queue.Empty:
                    if req.finished and q.empty():
                        return
                    continue
                yield np.asarray(piece, np.int32)[None]

        def gen():
            eos = self.backbone.cfg.lm.eos_token_id
            yield from stream_detokenize(blocks(), self.backbone.decode, eos)
            if req.error is not None:
                raise req.error
            with self._feat_lock:
                self.stats["engine"] += 1

        return gen()

    def _select_frames(self, video_path: str, question: str, sample_num,
                       method: str, window_size):
        """Selection half of /v1/answer: returns (sel_frames, idx,
        n_candidates)."""
        sample_num = sample_num or self.default_sample_num
        if self._cache_usable():
            # score from the feature LRU, then decode ONLY the selected
            # frames (seek-gather): warm answers skip both the vision tower
            # and the full 1-fps decode; cold answers reuse the frames the
            # feature pass already decoded
            img, sched, _hit, cold_frames = self._video_features(video_path)
            with self._device_lock:
                idx, _ = self.scorer.score_features_fused(
                    img, question, sample_num=sample_num,
                    window_size=window_size or self.default_window,
                    method=method)
            idx = np.asarray(idx)
            if cold_frames is not None:
                sel = cold_frames[idx]
            elif sched is not None and len(sched) == len(img):
                from ..video.reader import load_video_indices
                sel = load_video_indices(video_path, np.asarray(sched)[idx])
            else:
                sel = self._decode(video_path)[idx]
            return sel, idx, len(img)
        frames = self._decode(video_path)
        with self._device_lock:
            idx, _ = self.scorer(frames, question, sample_num=sample_num,
                                 window_size=window_size or
                                 self.default_window, method=method)
        return frames[np.asarray(idx)], np.asarray(idx), len(frames)

    def _session_checkout(self, session_id: str, video_path: str):
        """Fetch-or-create the session under the LRU lock; returns
        (sess, restarted).  A previously-known id that is gone means the
        session was evicted (LRU) or rebound to a new video — surfaced as
        ``restarted`` so clients know prior context was lost, never
        silently."""
        restarted = False
        with self._feat_lock:
            sess = self._sessions.get(session_id)
            if sess is not None and sess["video_path"] != video_path:
                sess = None                      # new video = new session
            if sess is None:
                restarted = session_id in self._session_seen
                sess = {"video_path": video_path, "turns": [],
                        "state": self.backbone.new_conversation_state(),
                        "frame_indices": None, "num_candidates": 0,
                        "lock": threading.Lock()}
                self._sessions[session_id] = sess
                self._session_seen.add(session_id)
                if len(self._session_seen) > 4096:   # bounded tombstones
                    self._session_seen.clear()
                if session_id in self._session_order:
                    self._session_order.remove(session_id)
            else:
                self._session_order.remove(session_id)
            self._session_order.append(session_id)
            while len(self._session_order) > self.max_sessions:
                self._sessions.pop(self._session_order.pop(0), None)
        return sess, restarted

    def _drop_session(self, session_id: str) -> None:
        with self._feat_lock:
            self._sessions.pop(session_id, None)
            if session_id in self._session_order:
                self._session_order.remove(session_id)

    # -- cross-request video prefix-KV cache (vLLM APC analog) --------------

    def _prefix_usable(self) -> bool:
        return (self.prefix_cache > 0
                and hasattr(self.backbone, "new_conversation_state")
                and hasattr(self.backbone, "generate_multi_round"))

    @staticmethod
    def _prefix_cache_key(video_path: str, idx):
        """(video, mtime, selected frames): the frame indices are part of
        the key — a different selection is a different video splice, so
        its prefix KV cannot be shared."""
        try:
            mtime = os.path.getmtime(video_path)
        except OSError:
            mtime = 0.0
        return (video_path, mtime, tuple(int(i) for i in idx))

    def _prefix_checkout(self, video_path: str, idx):
        """Get-or-create the solo-path prefix entry, LRU-capped at
        ``prefix_cache`` videos."""
        key = self._prefix_cache_key(video_path, idx)
        with self._feat_lock:
            entry = self._prefix_states.get(key)
            hit = entry is not None
            if hit:
                self._prefix_order.remove(key)
                self.stats["prefix_hits"] += 1
            else:
                entry = {"state": self.backbone.new_conversation_state(),
                         "lock": threading.Lock()}
                self._prefix_states[key] = entry
                while len(self._prefix_states) > self.prefix_cache:
                    old = self._prefix_order.pop(0)
                    del self._prefix_states[old]
            self._prefix_order.append(key)
        return entry

    def _prefix_answer(self, video_path: str, sel, idx, question: str,
                       max_new) -> str:
        """One INDEPENDENT greedy answer through the video's shared
        prefix-KV: a single-turn conversation against the cached state.
        The ConversationState divergence path reuses the common
        system+video prompt prefix (the expensive ~12.2k-token prefill)
        and truncates away the previous request's question/answer tokens,
        so history never leaks between requests — warm questions prefill
        only their own text (models/llava_video.py::_multi_round_prefill)."""
        entry = self._prefix_checkout(video_path, idx)
        with entry["lock"]:           # same-video requests serialize
            with self._device_lock:
                return self.backbone.generate_multi_round(
                    sel, [(question, None)], max_new_tokens=max_new,
                    state=entry["state"])

    def _prefix_answer_stream(self, video_path: str, sel, idx,
                              question: str, max_new):
        """Streaming :meth:`_prefix_answer`: text deltas through the
        video's shared prefix-KV.  The state commits only once the stream
        is fully consumed (generate_multi_round_stream's contract), so a
        client disconnect mid-answer leaves it checked-out/reset for a
        clean full re-prefill — never a half-written cache."""
        entry = self._prefix_checkout(video_path, idx)

        def gen():
            with entry["lock"]:       # same-video requests serialize
                it = self.backbone.generate_multi_round_stream(
                    sel, [(question, None)], max_new_tokens=max_new,
                    state=entry["state"])
                yield from self._locked_stream(it)
        return gen()

    def _answer_session(self, *, session_id: str, video_path: str,
                        question: str, sample_num, method, window_size,
                        max_new_tokens, t0) -> dict:
        """Follow-up-aware /v1/answer: a session is one conversation over
        one video — turn history rides the chat template, the video encodes
        once, and each follow-up round prefills only the new turn through
        the ConversationState prefix-KV (models/llava_video.py).  Frames
        are selected ONCE per session, conditioned on the FIRST question
        (the conversation sees one fixed video splice, matching
        generate_multi_round semantics)."""
        sess, restarted = self._session_checkout(session_id, video_path)
        with sess["lock"]:        # concurrent rounds on one session serialize
            frames = None
            if sess["frame_indices"] is None:    # first round: select once
                frames, idx, n_frames = self._select_frames(
                    video_path, question, sample_num, method, window_size)
            try:
                with self._device_lock:
                    answer = self.backbone.generate_multi_round(
                        frames, [*sess["turns"], (question, None)],
                        max_new_tokens=max_new_tokens, state=sess["state"])
            except Exception:
                if not sess["turns"]:
                    # a failed FIRST round must not strand a session whose
                    # video never made it into the state (a retry would
                    # silently answer without the video) — drop it entirely
                    self._drop_session(session_id)
                raise
            # commit only after success
            if frames is not None:
                sess["frame_indices"] = [int(i) for i in idx]
                sess["num_candidates"] = int(n_frames)
                with self._feat_lock:
                    self.stats["frames_scored"] += n_frames
            sess["turns"].append((question, answer))
            n_round = len(sess["turns"])
        with self._feat_lock:
            self.stats["requests"] += 1
            self.stats["session_rounds"] += 1
        out = {"answer": answer,
               "frame_indices": sess["frame_indices"],
               "num_candidates": sess["num_candidates"],
               "session_id": session_id, "round": n_round,
               "latency_s": round(time.perf_counter() - t0, 4)}
        if restarted:
            out["restarted"] = True       # prior context was evicted/rebound
        return out

    def _answer_session_stream(self, *, session_id: str, video_path: str,
                               question: str, sample_num, method,
                               window_size, max_new_tokens, t0):
        """Streaming :meth:`_answer_session`: same session semantics (one
        conversation per video, frames selected once on the first
        question, prefix-KV round reuse) as SSE events — ``frames`` first,
        one ``delta`` per text piece, then ``done`` with the round number.
        Turn history and conversation state commit only after the stream
        is fully consumed (generate_multi_round_stream's contract), so a
        client disconnect mid-answer leaves the session exactly as it was
        before the round.  The device lock wraps only device work
        (_locked_stream), never the SSE socket writes."""
        sess, restarted = self._session_checkout(session_id, video_path)
        with sess["lock"]:    # concurrent rounds on one session serialize
            frames = None
            if sess["frame_indices"] is None:    # first round: select once
                frames, idx, n_frames = self._select_frames(
                    video_path, question, sample_num, method, window_size)
                ev = {"event": "frames",
                      "frame_indices": [int(i) for i in idx],
                      "num_candidates": int(n_frames)}
            else:
                ev = {"event": "frames",
                      "frame_indices": sess["frame_indices"],
                      "num_candidates": sess["num_candidates"]}
            ev["session_id"] = session_id
            if restarted:
                ev["restarted"] = True   # prior context was evicted/rebound
            yield ev
            pieces = []
            try:
                for delta in self._locked_stream(
                        self.backbone.generate_multi_round_stream(
                            frames, [*sess["turns"], (question, None)],
                            max_new_tokens=max_new_tokens,
                            state=sess["state"])):
                    pieces.append(delta)
                    yield {"delta": delta}
            except Exception:
                if not sess["turns"]:
                    # same contract as the non-stream path: a failed FIRST
                    # round drops the session so a retry re-selects frames
                    self._drop_session(session_id)
                raise
            # commit only after the full answer streamed
            if frames is not None:
                sess["frame_indices"] = [int(i) for i in idx]
                sess["num_candidates"] = int(n_frames)
                with self._feat_lock:
                    self.stats["frames_scored"] += n_frames
            sess["turns"].append((question, "".join(pieces)))
            n_round = len(sess["turns"])
        with self._feat_lock:
            self.stats["requests"] += 1
            self.stats["session_rounds"] += 1
        yield {"event": "done", "session_id": session_id, "round": n_round,
               "latency_s": round(time.perf_counter() - t0, 4)}

    def answer(self, *, video_path: str, question: str, sample_num=None,
               method: str = "topk", window_size=None,
               max_new_tokens: int | None = None,
               session_id: str | None = None,
               temperature: float = 0.0, top_p: float = 1.0,
               seed: int | None = None, n: int = 1,
               logprobs: bool = False, stop=None) -> dict:
        if self.backbone is None:
            raise ValueError("no backbone loaded")
        t0 = time.perf_counter()
        n = int(n)
        if n < 1:
            raise ValueError("n must be >= 1")
        if n > 1 and not (temperature and float(temperature) > 0):
            raise ValueError("n > 1 needs temperature > 0 (greedy choices "
                             "would be identical)")
        self._apply_stop("", stop)       # validate BEFORE paying decode
        if logprobs:
            if session_id is not None:
                raise ValueError("logprobs are not supported on chat "
                                 "sessions — drop session_id or logprobs")
            if not hasattr(self.backbone, "continuation_logprobs"):
                raise ValueError(
                    f"backbone {type(self.backbone).__name__} does not "
                    "support logprobs (needs continuation_logprobs)")
        if temperature and float(temperature) > 0:
            if session_id is not None:
                raise ValueError("sampling (temperature > 0) is not "
                                 "supported on chat sessions yet — drop "
                                 "session_id or temperature")
            sel, idx, n_frames = self._select_frames(video_path, question,
                                                     sample_num, method,
                                                     window_size)
            # sampled requests ride the engine's per-row sampling when it's
            # on (all n choices batch together with one vision encode,
            # continuous.py), else the backbone's solo sample_decode —
            # never the greedy batcher, and no greedy fallback: a greedy
            # answer to a sampled request is the silent-degradation class
            # this codebase rejects
            answers = self._sampled_answers_n(
                sel, question, max_new_tokens, temperature, top_p,
                None if seed is None else int(seed), n,
                prefix_key=(self._prefix_cache_key(video_path, idx)
                            if self.prefix_cache > 0 else None))
            answers = [self._apply_stop(a, stop) for a in answers]
            with self._feat_lock:
                self.stats["requests"] += 1
                self.stats["frames_scored"] += n_frames
            resp = {"answer": answers[0],
                    "frame_indices": [int(i) for i in idx],
                    "num_candidates": int(n_frames),
                    "latency_s": round(time.perf_counter() - t0, 4)}
            if n > 1:
                # self-consistency / best-of-n: all choices, same order as
                # the derived per-choice seeds (seed+i)
                resp["answers"] = answers
            if logprobs:
                # per-answer total logprob under the VISION prompt (one
                # teacher-forced forward each): the confidence signal for
                # weighted self-consistency voting
                resp["logprobs"] = [self._answer_logprob(sel, question, a)
                                    for a in answers]
            return resp
        if session_id is not None:
            if stop is not None:
                # a truncated answer would desync the committed turn
                # history/prefix KV from what the client saw
                raise ValueError("stop sequences are not supported on chat "
                                 "sessions — drop session_id or stop")
            if not hasattr(self.backbone, "new_conversation_state"):
                raise ValueError("session_id needs a backbone with "
                                 "conversation support (llava_video / qwen2_5_vl)")
            return self._answer_session(
                session_id=str(session_id), video_path=video_path,
                question=question, sample_num=sample_num, method=method,
                window_size=window_size, max_new_tokens=max_new_tokens,
                t0=t0)
        sel, idx, n_frames = self._select_frames(video_path, question,
                                                 sample_num, method,
                                                 window_size)
        answer = None
        if self._engine is not None:
            # with --prefix-cache the engine runs its own prefix pool
            # (warm same-key admissions skip the video prefill while other
            # tenants keep decoding — throughput AND latency)
            answer = self._engine_answer(
                sel, question, max_new_tokens,
                prefix_key=(self._prefix_cache_key(video_path, idx)
                            if self.prefix_cache > 0 else None))
        if answer is None and self._prefix_usable():
            # engine off (or overflow/dead): the solo-path prefix cache
            # still skips the warm video prefill
            answer = self._prefix_answer(video_path, sel, idx, question,
                                         max_new_tokens)
        if answer is None and self.batch_window_s > 0 and \
                hasattr(self.backbone, "generate_batch_multi"):
            answer = self._answer_batched(sel, question, max_new_tokens)
        elif answer is None:
            with self._device_lock:
                answer = self._generate_one(sel, question, max_new_tokens)
        with self._feat_lock:
            self.stats["requests"] += 1
            self.stats["frames_scored"] += n_frames
        answer = self._apply_stop(answer, stop)
        resp = {"answer": answer,
                "frame_indices": [int(i) for i in idx],
                "num_candidates": int(n_frames),
                "latency_s": round(time.perf_counter() - t0, 4)}
        if logprobs:
            resp["logprobs"] = [self._answer_logprob(sel, question, answer)]
        return resp

    def _answer_logprob(self, sel, question: str, text: str) -> dict:
        """Total + per-token logprob of one answer under the full vision
        prompt (one teacher-forced forward) — the confidence signal
        /v1/answer exposes for weighted self-consistency voting."""
        with self._device_lock:
            cont_ids, token_lp, _, _ = self.backbone.continuation_logprobs(
                sel, question, text)
        return {"total": round(float(np.sum(token_lp)), 6),
                "tokens": [{"token": self.backbone.decode([int(t)]),
                            "logprob": round(float(lp), 6)}
                           for t, lp in zip(cont_ids, token_lp)]}

    def answer_stream(self, *, video_path: str, question: str,
                      sample_num=None, method: str = "topk",
                      window_size=None, max_new_tokens: int | None = None,
                      session_id: str | None = None,
                      temperature: float = 0.0, top_p: float = 1.0,
                      seed: int | None = None, n: int = 1,
                      logprobs: bool = False, stop=None, **_ignored):
        """SSE variant of /v1/answer ("stream": true): a ``frames`` event
        with the selected indices as soon as phase-1 lands, then one
        ``delta`` event per decoded text piece (backbone generate_stream;
        whole-answer fallback otherwise), then a ``done`` event with stats.
        The device lock wraps only device work, never socket writes.

        With ``session_id`` the stream is a conversation round
        (_answer_session_stream): frames ride the session's one-time
        selection and follow-up rounds prefill only the new turn."""
        if self.backbone is None:
            raise ValueError("no backbone loaded")
        if int(n) > 1:
            raise ValueError("streaming does not support n > 1 — drop "
                             "stream or n (non-streaming requests return "
                             "n choices)")
        if logprobs:
            raise ValueError("streaming does not support logprobs — drop "
                             "stream or logprobs")
        if stop is not None:
            raise ValueError("streaming does not support stop sequences — "
                             "drop stream or stop")
        sampled = bool(temperature and float(temperature) > 0)
        if sampled:
            if session_id is not None:
                # multi_round's prefix-KV decode has no sampling variant
                raise ValueError("sampled streaming has no conversation "
                                 "mode: drop session_id or set "
                                 "temperature=0")
            if self._engine is None:
                # without the engine's per-row sampling, the backbone must
                # stream sampled itself — loud, never silently greedy
                self._require_sampled_stream()
        t0 = time.perf_counter()
        if session_id is not None:
            if not (hasattr(self.backbone, "new_conversation_state") and
                    hasattr(self.backbone, "generate_multi_round_stream")):
                # loud, not silently non-conversational (codebase rule)
                raise ValueError("session_id needs a backbone with "
                                 "conversation support (llava_video / qwen2_5_vl)")
            yield from self._answer_session_stream(
                session_id=str(session_id), video_path=video_path,
                question=question, sample_num=sample_num, method=method,
                window_size=window_size, max_new_tokens=max_new_tokens,
                t0=t0)
            return
        sel, idx, n_frames = self._select_frames(video_path, question,
                                                 sample_num, method,
                                                 window_size)
        yield {"event": "frames",
               "frame_indices": [int(i) for i in idx],
               "num_candidates": int(n_frames)}
        kwargs = {"max_new_tokens": max_new_tokens} if max_new_tokens else {}
        stream = getattr(self.backbone, "generate_stream", None)
        if sampled:
            sampling = {"temperature": float(temperature),
                        "top_p": float(top_p),
                        "seed": None if seed is None else int(seed)}
            # engine per-row sampling when on (batches with greedy
            # traffic); solo sampled generate_stream otherwise
            deltas = (self._engine_answer_stream(
                          sel, question, max_new_tokens, sampling=sampling,
                          prefix_key=(self._prefix_cache_key(video_path,
                                                             idx)
                                      if self.prefix_cache > 0 else None))
                      if self._engine is not None else None)
            if deltas is None:
                # engine off/overflow/dead: the solo path must stream
                # sampled itself (raises mid-stream as an error event on
                # the overflow edge — loud, never silently greedy)
                self._require_sampled_stream()
                kwargs.update(sampling)
                deltas = self._locked_stream(stream(sel, question,
                                                    **kwargs))
            for delta in deltas:
                yield {"delta": delta}
            with self._feat_lock:
                self.stats["requests"] += 1
                self.stats["frames_scored"] += n_frames
            yield {"event": "done",
                   "latency_s": round(time.perf_counter() - t0, 4)}
            return
        deltas = None
        if self._engine is not None:
            # engine prefix pool when --prefix-cache is on (non-stream
            # precedence mirrored)
            deltas = self._engine_answer_stream(
                sel, question, max_new_tokens,
                prefix_key=(self._prefix_cache_key(video_path, idx)
                            if self.prefix_cache > 0 else None))
        if deltas is None and self._prefix_usable() and \
                hasattr(self.backbone, "generate_multi_round_stream"):
            # engine off (or overflow/dead): solo-path prefix cache
            deltas = self._prefix_answer_stream(video_path, sel, idx,
                                                question, max_new_tokens)
        if deltas is not None:
            for delta in deltas:          # paths lock device work internally
                yield {"delta": delta}
        elif stream is None:
            with self._device_lock:
                text = self._generate_one(sel, question, max_new_tokens)
            if text:
                yield {"delta": text}
        else:
            for delta in self._locked_stream(stream(sel, question, **kwargs)):
                yield {"delta": delta}
        with self._feat_lock:
            self.stats["requests"] += 1
            self.stats["frames_scored"] += n_frames
        yield {"event": "done",
               "latency_s": round(time.perf_counter() - t0, 4)}


def make_handler(service: ScoringService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_sse(self, chunks) -> None:
            """OpenAI-style SSE: one `data: {json}` event per chunk, then
            `data: [DONE]`.  The caller primes the generator BEFORE this is
            called so pre-stream errors (no backbone, bad args) still get a
            normal json error response; mid-stream failures become an
            error event since headers are already on the wire.  Never
            raises: a client disconnect (BrokenPipe on a closed tab) ends
            the stream silently — re-raising would make do_POST start a
            second HTTP response on the half-sent connection."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            try:
                try:
                    for c in chunks:
                        self.wfile.write(b"data: " + json.dumps(c).encode()
                                         + b"\n\n")
                        self.wfile.flush()
                except OSError:
                    return        # client gone: nothing to report, no one
                                  # left to report it to
                except Exception as e:  # noqa: BLE001 — headers on the wire
                    self.wfile.write(b"data: "
                                     + json.dumps({"error": str(e)}).encode()
                                     + b"\n\n")
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()
            except OSError:
                return            # disconnect while writing the tail

        def do_GET(self):
            if self.path == "/healthz":
                payload = {"ok": True, **service.stats}
                if service._engine is not None:
                    payload["continuous"] = {**service._engine.stats,
                                             "active": service._engine.n_active}
                self._send(200, payload)
            elif self.path in ("/", "/index.html"):
                from .webui import serve_index
                serve_index(self)       # browser demo page (webui.py, C44)
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/v1/score":
                    self._send(200, service.score(**req))
                elif self.path == "/v1/answer":
                    # pop unconditionally: an explicit "stream": false must
                    # not leak into answer(), which has no **_ignored
                    if req.pop("stream", None):
                        import itertools
                        gen = service.answer_stream(**req)
                        first = next(gen)       # errors -> json 400/500
                        self._send_sse(itertools.chain([first], gen))
                    else:
                        self._send(200, service.answer(**req))
                elif self.path == "/v1/chat/completions":
                    if req.pop("stream", None):
                        import itertools
                        gen = service.chat_completion_stream(**req)
                        first = next(gen)       # errors -> json 400/500
                        self._send_sse(itertools.chain([first], gen))
                    else:
                        self._send(200, service.chat_completion(**req))
                else:
                    self._send(404, {"error": "not found"})
            except (TypeError, ValueError, KeyError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:
                self._send(500, {"error": str(e)})

    return Handler


def create_server(service: ScoringService, host: str = "0.0.0.0",
                  port: int = 8000) -> ThreadingHTTPServer:
    return ThreadingHTTPServer((host, port), make_handler(service))
