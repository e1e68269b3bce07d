"""Continuous batching engine for the serving path (TPU-native, vLLM-style).

The reference has no serving engine of its own — its serving surface is the
vendored LLaVA-NeXT gradio/sglang stack (llava/serve/*, C44) which batches
nothing across requests.  tspo-serve's existing micro-batcher
(server.py::_answer_batched) already beats that by grouping requests that
arrive within a window into one ragged ``generate_batch_multi`` call — but a
static batch has two structural costs: every member waits for the slowest
row to finish (stragglers hold the batch), and a request that arrives one
tick after the window closes waits a full batch turn.

This engine removes both with slot-based *continuous* batching:

- Decode runs forever in fused ``chunk``-step device blocks over a fixed
  ``slots``-row KV cache (static shapes — XLA compiles exactly two programs:
  one prefill per prompt bucket, one chunk step).
- At every chunk boundary finished rows (EOS or budget) retire immediately
  and queued requests are admitted into free slots: a new request waits at
  most one chunk (+ its own prefill), not a batch turn.
- Each row decodes into its OWN packed region of its cache row via per-row
  scatter writes, so slots recycle indefinitely — there is no global
  cache-depletion horizon.

Cache layout per row (row = slot b of the [L, slots, T, KV, hd] cache):

    [0 .. S_max)       prompt region — the admission prefill copies the
                       row's bucketed prefill KV here; pads masked by
                       ``prompt_valid[b]``.
    [S_max .. T)       decode region — step ``i`` of the CURRENT tenant
                       writes at slot ``S_max + i``; the mask admits only
                       slots ``<= own_step[b]`` so a previous tenant's
                       leftovers are never attended.

Exactness: a request's tokens are bit-identical to a solo
``greedy_decode`` run with the same cache geometry — the per-step math is
the same dense-attention decode body, masked positions contribute exact
zeros (the -1e30 bias underflows to 0.0 through exp), and the nonzero
K/V slots land at the same indices.  Pinned by tests/test_continuous.py.

Per-request sampling: ``submit(temperature=..., top_p=..., seed=...)``
samples THAT row with its own PRNG-key chain while co-resident rows keep
their own params (greedy rows stay bit-exact) — the same property vLLM's
per-request SamplingParams provide.  A sampled tenant reproduces a solo
``sample_decode`` at the same seed bit-for-bit (one key split per emitted
token, same order).  The whole sampling computation sits behind a
``lax.cond`` on "any live row sampled", so greedy-only traffic pays only
a predicate.

Scope: decoder-only continuous batching (prefill runs unchunked at
admission, briefly pausing decode — the standard non-chunked-prefill
engine design).  Requires ``cfg.sliding_window is None`` (Qwen2/Llama3;
the Mistral logical-window bookkeeping is not wired here).
"""
from __future__ import annotations

import threading
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.qwen2 import (KVCache, Qwen2Config, _apply_rope, _attention,
                            _linear, _rms_norm, _rope, decode_prefill,
                            embed_tokens, lm_logits, prefill_extend,
                            prefill_extend_sampled, qwen2_forward,
                            sample_token)

__all__ = ["ContinuousEngine", "EngineRequest"]


# ---------------------------------------------------------------------------
# Device programs
# ---------------------------------------------------------------------------


def _slotted_forward(params, emb, k, v, write_pos, attn_valid, cos, sin, cfg):
    """One decode step over all slots with PER-ROW KV write positions.

    emb [B, 1, D]; k/v [L, B, T, KV, hd]; write_pos [B] int32 (absolute cache
    slot for this step's K/V, one per row); attn_valid [B, T] bool; cos/sin
    [B, 1, hd].  Mirrors qwen2_forward's dense decode path except the
    ``dynamic_update_slice`` at a shared scalar position becomes a batched
    scatter at ``write_pos`` — the one change continuous batching needs.

    MAINTENANCE NOTE: this intentionally forks qwen2_forward's block body
    (its validity model — per-row progress masks instead of a global cache
    length — doesn't fit the shared signature).  Divergence is guarded by
    the bit-exactness tests in tests/test_continuous.py, which compare
    every engine output against greedy_decode (i.e. against qwen2_forward);
    a semantic change to the solo path that this fork misses fails those
    tests, not production.
    """
    B = emb.shape[0]
    H, KV, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    rows = jnp.arange(B)
    # finite sentinel, not -inf: fully-masked rows must not NaN (qwen2.py)
    mask_bias = jnp.where(attn_valid, 0.0, -1e30).astype(
        jnp.float32)[:, None, None, :]                       # [B, 1, 1, T]

    def block(h, xs):
        lp, k_l, v_l = xs                                    # [B, T, KV, hd]
        x = _rms_norm(h, lp["ln1"], cfg.rms_eps)
        q = _linear(lp["q"], x).reshape(B, 1, H, hd)
        kn = _linear(lp["k"], x).reshape(B, 1, KV, hd)
        vn = _linear(lp["v"], x).reshape(B, 1, KV, hd)
        q = _apply_rope(q, cos, sin)
        kn = _apply_rope(kn, cos, sin)
        k_l = k_l.at[rows, write_pos].set(kn[:, 0].astype(k_l.dtype))
        v_l = v_l.at[rows, write_pos].set(vn[:, 0].astype(v_l.dtype))
        ctx = _attention(q, k_l, v_l, mask_bias).reshape(B, 1, -1)
        h = h + _linear(lp["o"], ctx)
        x = _rms_norm(h, lp["ln2"], cfg.rms_eps)
        gate = jax.nn.silu(_linear(lp["gate"], x))
        up = _linear(lp["up"], x)
        h = h + _linear(lp["down"], gate * up)
        return h, (k_l, v_l)

    h, (k, v) = jax.lax.scan(block, emb, (params["layers"], k, v))
    h = _rms_norm(h, params["final_ln"], cfg.rms_eps)
    return h, k, v


def _row_sample(logits, keys, temp, top_p):
    """Per-row sampled next tokens + advanced keys: each row splits ITS OWN
    key once and draws via :func:`sample_token` on its [1, V] logits —
    vmapped, this reproduces the solo B=1 ``sample_decode`` arithmetic
    row-for-row, so an engine tenant's sampled tokens are bit-identical to
    a solo sampled decode with the same seed (pinned by
    tests/test_continuous.py)."""
    pairs = jax.vmap(jax.random.split)(keys)                  # [B, 2, 2]
    new_keys, subs = pairs[:, 0], pairs[:, 1]
    sampled = jax.vmap(
        lambda lg, sub, t, p: sample_token(lg[None], sub, t, p)[0]
    )(logits, subs, temp, top_p)
    return sampled, new_keys


@partial(jax.jit, static_argnames=("cfg", "chunk"), donate_argnums=(2, 3))
def decode_chunk_slots(params, tok, k, v, own_step, pos0, prompt_valid,
                       done, keys, temp, top_p, cfg: Qwen2Config,
                       chunk: int, eos):
    """``chunk`` decode steps over the slot cache — greedy per row, except
    rows with ``temp > 0`` which sample (nucleus top-p) with their own PRNG
    key chain: per-request sampling params inside one continuous batch.

    tok [B] int32 (pending token per row — emitted first, as in
    greedy_decode); own_step [B] (decode steps already taken by the row's
    current tenant); pos0 [B] (tenant's decode rope start — its valid prompt
    length, or the mrope delta); prompt_valid [B, S_max]; done [B];
    keys [B, 2] uint32 per-row PRNG keys; temp / top_p [B] f32.
    Returns (out [B, chunk], next_tok, k, v, own_step+chunk, done, keys).

    Step-for-step the greedy_decode body: rows already ``done`` keep
    emitting ``eos``; their garbage steps write at the clamped last decode
    slot and are never surfaced (the host frees the slot and the next
    tenant's mask excludes every slot past its own progress).  The whole
    sampling computation (vocab argsort + categorical) sits behind a
    ``lax.cond`` on "any row sampled", so greedy-only traffic — the
    benchmark path — pays only a predicate.
    """
    B = tok.shape[0]
    T = k.shape[2]
    S_max = prompt_valid.shape[1]
    D = T - S_max
    dec_idx = jnp.arange(D)[None, :]                          # [1, D]
    scale = cfg.rope_scaling_factor
    any_sampled = jnp.any(temp > 0)

    def body(j, state):
        tok, k, v, own, out, done, keys = state
        out = out.at[:, j].set(jnp.where(done, eos, tok))
        done = done | (tok == eos)
        emb = embed_tokens(params, tok)[:, None, :].astype(k.dtype)
        pos = (pos0 + own)[:, None]                           # [B, 1]
        rp = pos if scale == 1.0 else pos / scale             # HF linear rope
        cos, sin = _rope(rp, cfg.head_dim, cfg.rope_theta)    # [B, 1, hd]
        write_pos = S_max + jnp.minimum(own, D - 1)
        av = jnp.concatenate([prompt_valid, dec_idx <= own[:, None]], axis=1)
        h, k, v = _slotted_forward(params, emb, k, v, write_pos, av,
                                   cos, sin, cfg)
        logits = lm_logits(params, h[:, -1], cfg)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        def with_sampling(args):
            logits, keys = args
            sampled, new_keys = _row_sample(logits, keys, temp, top_p)
            return jnp.where(temp > 0, sampled, greedy), new_keys

        nxt, keys = jax.lax.cond(any_sampled, with_sampling,
                                 lambda args: (greedy, args[1]),
                                 (logits, keys))
        return nxt, k, v, own + 1, out, done, keys

    out = jnp.full((B, chunk), eos, jnp.int32)
    tok, k, v, own_step, out, done, keys = jax.lax.fori_loop(
        0, chunk, body, (tok, k, v, own_step, out, done, keys))
    return out, tok, k, v, own_step, done, keys


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill_mixed(params, prompt_embeds, prompt_valid, cache: KVCache,
                  cfg: Qwen2Config, keys, temp, top_p,
                  prompt_rope_cos_sin: tuple | None = None,
                  decode_pos_start=None):
    """qwen2.decode_prefill with a per-row sampled-or-greedy first token —
    the engine admission prefill for batches mixing greedy and sampled
    tenants.  Same key-split order as sample_prefill (one split before the
    first token), so a sampled tenant's whole chain matches solo
    ``sample_decode``.  Returns (first_tok [B], cache, pos0 [B], keys)."""
    B, S, _ = prompt_embeds.shape
    T = cache.k.shape[2]
    n_prompt = jnp.sum(prompt_valid.astype(jnp.int32), axis=1)
    pos0 = n_prompt if decode_pos_start is None else \
        jnp.broadcast_to(jnp.asarray(decode_pos_start), (B,))
    attn_valid = jnp.zeros((B, T), bool).at[:, :S].set(prompt_valid)
    hidden, cache = qwen2_forward(params, prompt_embeds, cache,
                                  jnp.arange(S), attn_valid, cfg,
                                  rope_cos_sin=prompt_rope_cos_sin)
    last_h = hidden[jnp.arange(B), n_prompt - 1]
    logits = lm_logits(params, last_h, cfg)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    sampled, new_keys = _row_sample(logits, keys, temp, top_p)
    first = jnp.where(temp > 0, sampled, greedy)
    return first, cache, pos0, new_keys


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def prefill_shared(params, prompt_embeds, prompt_valid, cache: KVCache,
                   cfg: Qwen2Config):
    """One B=1 prefill serving MANY tenants of the SAME prompt (the n>1
    multi-choice admission): returns the greedy first token AND the
    last-position logits so each tenant can draw its own sampled first
    token from them (same key-split order as sample_prefill), plus the
    row cache the caller broadcasts into every tenant's slot."""
    B, S, _ = prompt_embeds.shape
    T = cache.k.shape[2]
    n_prompt = jnp.sum(prompt_valid.astype(jnp.int32), axis=1)
    attn_valid = jnp.zeros((B, T), bool).at[:, :S].set(prompt_valid)
    hidden, cache = qwen2_forward(params, prompt_embeds, cache,
                                  jnp.arange(S), attn_valid, cfg)
    last_h = hidden[jnp.arange(B), n_prompt - 1]
    logits = lm_logits(params, last_h, cfg)                   # [1, V]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return greedy, logits, cache, n_prompt


@jax.jit
def _shared_first_tokens(logits, keys, temp, top_p, greedy):
    """Per-tenant first tokens off ONE logits row: sampled tenants split
    their own key and draw (bit-exact vs sample_prefill's draw), greedy
    tenants take the argmax."""
    n = keys.shape[0]
    sampled, new_keys = _row_sample(
        jnp.broadcast_to(logits, (n, logits.shape[-1])), keys, temp, top_p)
    return jnp.where(temp > 0, sampled,
                     jnp.broadcast_to(greedy, (n,))), new_keys


@jax.jit
def _import_prefix(k, v, pk, pv):
    """Write a stored prefix's KV ([L, 1, Pb, KV, hd], Pb = 256-padded
    stored length) into the front of a fresh admission row cache.  Garbage
    in [P, Pb) is invisible downstream: suffix prefill masks keys past
    ``cache.length + valid_len`` and the inserted row's prompt mask
    excludes everything past the prompt's real length."""
    Pb = pk.shape[2]
    return (k.at[:, :, :Pb].set(pk.astype(k.dtype)),
            v.at[:, :, :Pb].set(pv.astype(v.dtype)))


@jax.jit
def _insert_rows(k, v, row_k, row_v, slots):
    """Copy a batched admission prefill's KV ([L, kB, Sb, KV, hd]) into the
    engine-cache rows given by ``slots`` [kB] — ONE scatter per admission
    group (a per-row loop would copy the multi-GB cache once per row).
    Not donated: a failed admission must not strand the live cache."""
    Sb = row_k.shape[2]
    k = k.at[:, slots, :Sb].set(row_k.astype(k.dtype))
    v = v.at[:, slots, :Sb].set(row_v.astype(v.dtype))
    return k, v


# ---------------------------------------------------------------------------
# Host-side engine
# ---------------------------------------------------------------------------


class EngineRequest:
    """Handle returned by :meth:`ContinuousEngine.submit`.

    ``result(timeout)`` blocks for the final token list (EOS-trimmed).
    ``stream_cb(fresh_tokens: list[int])`` fires at every chunk boundary
    with that chunk's new tokens (already budget/EOS-trimmed) — deliverable
    straight into the SSE path.
    """

    def __init__(self, embeds, valid, max_new, rope_cos_sin, pos0_override,
                 stream_cb, temperature=0.0, top_p=1.0, seed=None,
                 prefix_key=None, prefix_len=0):
        self.prefix_key = prefix_key
        self.prefix_len = int(prefix_len)
        self.embeds = embeds            # [1, S, D] (unpadded)
        self.valid = valid              # [S] bool
        self.max_new = int(max_new)
        self.rope_cos_sin = rope_cos_sin
        self.pos0_override = pos0_override
        self.stream_cb = stream_cb
        self.temperature = float(temperature)
        self.top_p = float(top_p)
        if self.temperature > 0 and seed is None:
            # fresh draw per unseeded sampled request (do_sample semantics)
            import os
            seed = int.from_bytes(os.urandom(4), "little")
        self.key = (np.asarray(jax.random.PRNGKey(int(seed)), np.uint32)
                    if self.temperature > 0 else np.zeros(2, np.uint32))
        self.tokens: list[int] = []
        self.error: Exception | None = None
        self.finished_at: float | None = None   # time.perf_counter() stamp
        self._event = threading.Event()

    def _finish(self, error: Exception | None = None):
        if error is not None and self.error is None:
            self.error = error
        if self.finished_at is None:
            import time
            self.finished_at = time.perf_counter()
        self._event.set()

    @property
    def finished(self) -> bool:
        return self._event.is_set()

    def result(self, timeout: float | None = None) -> list[int]:
        if not self._event.wait(timeout):
            raise TimeoutError("engine request still running")
        if self.error is not None:
            raise self.error
        return self.tokens


class ContinuousEngine:
    """Slot-based continuous batching over a qwen2-core decoder.

    Parameters
    ----------
    lm_params / cfg : the decoder (``model.params["lm"]`` / ``model.cfg.lm``;
        int8-quantized params work unchanged — _linear dispatches).
    slots : concurrent decode rows (HBM: slots x T x 2 x KV x hd x 2B x L).
    chunk : decode steps per device dispatch; retirement/admission latency
        quantum.  Production hosts pay ~1-2 ms per boundary, this dev box's
        tunneled backend ~70 ms (docs/KERNELS.md streaming section).
    max_prompt : prompt-region size S_max (longest admissible prompt).
    decode_slots : decode-region size (max tokens one tenant may generate).
    prompt_bucket : admission prompts right-pad to multiples of this so a
        handful of prefill programs serve every length.
    device_lock : optional lock shared with other device users (the serve
        scorer) — held across each device call, released between chunks.
    mesh : optional ``jax.sharding.Mesh`` with a ``'model'`` axis — the
        engine then runs tensor-parallel: params get the Megatron specs
        (:func:`~tspo_tpu.models.qwen2.qwen2_param_shardings`) and the slot
        KV cache shards on the kv-head axis (replicated when the axis size
        doesn't divide ``num_kv_heads``); XLA inserts the TP collectives
        inside the same jitted prefill/decode programs.  Token outputs are
        bit-identical to the unsharded engine (pinned by
        tests/test_continuous.py).
    prefix_slots : >0 enables ENGINE-LEVEL prefix caching (vLLM automatic
        prefix caching): ``submit(prefix_key=..., prefix_len=P)`` marks the
        prompt's first P embeds as a shareable prefix.  A miss prefills
        normally and stores the row's first-P KV under the key (LRU of
        ``prefix_slots`` entries); a hit imports that KV into a fresh row
        and prefills ONLY the suffix (the question text) in
        ``prefill_extend`` pieces between decode chunks — a warm admission
        skips the ~12k-token video prefill even while other tenants are
        decoding.  Greedy, contiguous-validity prompts only (loudly
        rejected otherwise); mrope prompts work — the stored KV carries
        its rotations, suffix pieces slice the request's own rope tables
        at the resume offset, and pos0_override threads the decode delta.
        The caller owns key semantics: one key MUST always denote one
        exact embeds prefix AND rope-table prefix (the serve layer keys by
        video + mtime + frame selection, which pins both).  Token-exact vs
        an uncached admission (pinned by tests/test_continuous.py).
    """

    def __init__(self, lm_params, cfg: Qwen2Config, *, slots: int = 4,
                 chunk: int = 8, max_prompt: int = 1024,
                 decode_slots: int = 128, prompt_bucket: int = 256,
                 dtype=jnp.bfloat16, eos_token_id: int | None = None,
                 device_lock: threading.Lock | None = None,
                 prefill_chunk: int = 0, mesh=None, prefix_slots: int = 0,
                 max_group_tokens: int = 32768):
        if cfg.sliding_window is not None:
            raise ValueError("ContinuousEngine supports sliding_window=None "
                             "configs (Qwen2/Llama3); got a windowed config")
        if decode_slots < chunk:
            raise ValueError(f"decode_slots ({decode_slots}) must be >= "
                             f"chunk ({chunk})")
        # (any prefill_chunk tiles: _setup_pending pads the prompt to a
        # whole number of chunks, Wb = ceil(Sb/W)*W)
        self.params = lm_params
        self.cfg = cfg
        self.slots = int(slots)
        self.chunk = int(chunk)
        self.S_max = int(max_prompt)
        self.D = int(decode_slots)
        self.bucket = int(prompt_bucket)
        # >0: a SOLO admission arriving while rows are decoding prefills in
        # ``prefill_chunk``-token pieces interleaved with decode chunks, so
        # active requests stall at most one piece (not a whole 12k-token
        # prefill).  Groups and idle-engine admissions stay unchunked (the
        # batched/uninterrupted prefill is cheaper when nothing is waiting).
        self.prefill_chunk = int(prefill_chunk)
        self._pending: dict | None = None
        self.dtype = dtype
        self.eos = int(cfg.eos_token_id if eos_token_id is None
                       else eos_token_id)
        self._device_lock = device_lock or threading.Lock()

        self.mesh = mesh
        self._kv_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..models.qwen2 import qwen2_param_shardings
            # no-op for params already placed with these specs (a backbone
            # sharded up-front shares the buffers)
            self.params = jax.device_put(
                self.params, qwen2_param_shardings(self.params, mesh))
            model_n = int(mesh.shape.get("model", 1))
            kv_spec = (P(None, None, None, "model", None)
                       if model_n > 1 and cfg.num_kv_heads % model_n == 0
                       else P())
            self._kv_sharding = NamedSharding(mesh, kv_spec)

        T = self.S_max + self.D
        shape = (cfg.num_layers, self.slots, T, cfg.num_kv_heads,
                 cfg.head_dim)
        self._k = self._place_kv(jnp.zeros(shape, dtype))
        self._v = self._place_kv(jnp.zeros(shape, dtype))
        self._tok = np.full(self.slots, self.eos, np.int32)
        self._pos0 = np.zeros(self.slots, np.int32)
        self._own = np.zeros(self.slots, np.int32)
        self._done = np.ones(self.slots, bool)
        self._pv = np.zeros((self.slots, self.S_max), bool)
        # per-row sampling state: temp 0 = greedy; keys advance one split
        # per decode step on the device (returned by decode_chunk_slots)
        self._temp = np.zeros(self.slots, np.float32)
        self._topp = np.ones(self.slots, np.float32)
        self._keys = np.zeros((self.slots, 2), np.uint32)
        self._req: list[EngineRequest | None] = [None] * self.slots

        # ragged-group prefill cap in PADDED tokens (rows x bucket): a
        # B=4 group of ~12k-token prompts OOMs a 16 GB chip mid-prefill
        # (measured — bench_shared_admission), so oversize groups split
        # into sub-batches.  Identical-prompt runs are exempt: they
        # prefill B=1 (_admit_shared) whatever their count.
        self.max_group_tokens = int(max_group_tokens)
        self.prefix_slots = int(prefix_slots)
        self._prefix_pool: dict = {}   # key -> {"k", "v", "len"} (LRU)
        self._prefix_lru: list = []

        self._queue: deque[EngineRequest] = deque()
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = False
        self._dead: Exception | None = None
        self.stats = {"completed": 0, "chunks": 0, "admitted": 0,
                      "admit_batches": 0, "chunked_admissions": 0,
                      "peak_active": 0, "prefix_hits": 0,
                      "prefix_stores": 0, "shared_admissions": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="tspo-continuous-engine")
        self._thread.start()

    def _place_kv(self, arr):
        """Pin a KV buffer's sharding (kv-head axis on 'model') when the
        engine runs on a mesh; identity otherwise."""
        return (arr if self._kv_sharding is None
                else jax.device_put(arr, self._kv_sharding))

    def _row_cache(self, batch: int, length: int) -> KVCache:
        """Admission-prefill row cache, on the engine's mesh when TP."""
        row = KVCache.create(self.cfg, batch, length, self.dtype)
        if self._kv_sharding is None:
            return row
        return KVCache(k=self._place_kv(row.k), v=self._place_kv(row.v),
                       length=row.length)

    # -- public API ---------------------------------------------------------

    def submit(self, embeds, valid=None, *, max_new_tokens: int,
               rope_cos_sin=None, decode_pos_start=None,
               stream_cb=None, temperature: float = 0.0,
               top_p: float = 1.0, seed: int | None = None,
               prefix_key=None, prefix_len: int = 0) -> EngineRequest:
        """Queue one request.  ``embeds`` [1, S, D] (or [S, D]); ``valid``
        [S] bool (default all-valid); ``rope_cos_sin``/``decode_pos_start``
        thread the Qwen2.5-VL mrope prompt tables through the admission
        prefill.  ``temperature > 0`` samples THIS row (nucleus ``top_p``,
        per-request ``seed`` chain — bit-exact vs a solo sample_decode at
        the same seed) while co-resident rows keep their own params.
        ``prefix_key``/``prefix_len`` enable prefix caching for the
        prompt's first ``prefix_len`` embeds (class docstring).
        Returns immediately with an :class:`EngineRequest`."""
        e = jnp.asarray(embeds)
        if e.ndim == 2:
            e = e[None]
        S = int(e.shape[1])
        if S > self.S_max:
            raise ValueError(f"prompt is {S} tokens but the engine's "
                             f"max_prompt is {self.S_max}")
        if max_new_tokens < 1:
            raise ValueError("max_new_tokens must be >= 1")
        v = np.ones(S, bool) if valid is None else np.asarray(valid, bool)
        if prefix_key is not None:
            if self.prefix_slots <= 0:
                raise ValueError("engine built with prefix_slots=0: drop "
                                 "prefix_key or enable prefix caching")
            nv = int(v.sum())
            if not (0 < int(prefix_len) < nv):
                raise ValueError(f"prefix_len must be in (0, {nv}), got "
                                 f"{prefix_len}")
            if not bool(v[:nv].all()):
                raise ValueError("prefix caching needs contiguous validity")
        req = EngineRequest(e, v, min(int(max_new_tokens), self.D),
                            rope_cos_sin, decode_pos_start, stream_cb,
                            temperature=temperature, top_p=top_p, seed=seed,
                            prefix_key=prefix_key, prefix_len=prefix_len)
        self._enqueue([req])
        return req

    def submit_group(self, embeds, kwargs_list) -> "list[EngineRequest]":
        """Queue several requests of ONE prompt atomically (the n>1
        multi-choice path): all of them land in the queue in one lock
        acquisition, so an admission pass sees the whole run and serves it
        off a single shared prefill (_admit_shared) instead of racing the
        worker request-by-request.  ``kwargs_list``: per-choice submit
        kwargs (sans embeds/valid)."""
        e = jnp.asarray(embeds)
        if e.ndim == 2:
            e = e[None]
        S = int(e.shape[1])
        if S > self.S_max:
            raise ValueError(f"prompt is {S} tokens but the engine's "
                             f"max_prompt is {self.S_max}")
        v = np.ones(S, bool)
        reqs = []
        for kw in kwargs_list:
            mx = kw.get("max_new_tokens")
            if mx is None or mx < 1:
                raise ValueError("max_new_tokens must be >= 1")
            reqs.append(EngineRequest(
                e, v, min(int(mx), self.D), None, None,
                kw.get("stream_cb"),
                temperature=kw.get("temperature", 0.0),
                top_p=kw.get("top_p", 1.0), seed=kw.get("seed")))
        self._enqueue(reqs)
        return reqs

    def _enqueue(self, reqs) -> None:
        with self._lock:
            if self._dead is not None:
                raise RuntimeError("engine is dead") from self._dead
            if self._stop:
                raise RuntimeError("engine is shut down")
            self._queue.extend(reqs)
        self._wake.set()

    def shutdown(self, timeout: float = 10.0):
        self._stop = True
        self._wake.set()
        self._thread.join(timeout)
        # nothing will run these now — fail them rather than hang waiters
        err = RuntimeError("engine shut down")
        with self._lock:
            pending = list(self._queue)
            self._queue.clear()
        for req in pending + [r for r in self._req if r is not None]:
            req._finish(error=err)
        self._req = [None] * self.slots

    @property
    def n_active(self) -> int:
        return sum(r is not None for r in self._req)

    # -- worker loop ----------------------------------------------------------

    def _loop(self):
        try:
            while not self._stop:
                if self._pending is not None:
                    try:
                        self._prefill_step()
                    except Exception as exc:  # noqa: BLE001 — that request
                        p, self._pending = self._pending, None
                        p["req"]._finish(error=exc)
                else:
                    self._admit()
                if self.n_active:
                    self._step_chunk()
                elif self._pending is None:
                    self._wake.wait(timeout=0.1)
                    self._wake.clear()
        except Exception as exc:  # noqa: BLE001 — deliver, don't hang waiters
            with self._lock:
                self._dead = exc
        finally:
            # graceful stop or crash: fail whatever is still queued/active
            # so no waiter hangs (incl. a request caught mid-admission)
            err = self._dead or RuntimeError("engine shut down")
            with self._lock:
                pending = list(self._queue)
                self._queue.clear()
            if self._pending is not None:
                pending.append(self._pending["req"])
                self._pending = None
            for req in pending + [r for r in self._req if r is not None]:
                req._finish(error=err)
            self._req = [None] * self.slots

    def _admit(self):
        while True:
            with self._lock:
                if not self._queue:
                    return
                free = [b for b, r in enumerate(self._req) if r is None]
                if not free:
                    return
                # batched admission: standard-rope requests prefill together
                # as ONE ragged decode_prefill (prefill is GEMM-bound, so a
                # B=k pass costs far less than k solo passes — the window
                # micro-batcher's advantage, kept here).  Per-row mrope
                # tables admit solo (their rope tables are per-row).
                group, solo, g_sb = [], None, 0
                while self._queue and len(group) < len(free):
                    head = self._queue[0]
                    if head.prefix_key is not None:
                        # prefix-cached requests admit solo: a hit's cache
                        # import + suffix-only prefill, and a miss's
                        # post-prefill store, are per-row operations
                        if not group:
                            solo = self._queue.popleft()
                        break
                    if head.rope_cos_sin is None and \
                            head.pos0_override is None:
                        hb = min(self.S_max,
                                 -(-int(head.embeds.shape[1])
                                   // self.bucket) * self.bucket)
                        shared_run = (
                            group and head.embeds is group[0].embeds
                            and all(r.embeds is group[0].embeds
                                    for r in group))
                        if group and not shared_run and \
                                (len(group) + 1) * max(g_sb, hb) \
                                > self.max_group_tokens:
                            break       # ragged group would OOM: sub-batch
                        g_sb = max(g_sb, hb)
                        group.append(self._queue.popleft())
                    elif not group:
                        solo = self._queue.popleft()
                        break
                    else:
                        break           # flush the group first
            targets = free[: len(group)] if group else free[:1]
            reqs = group if group else ([solo] if solo else [])
            if not reqs:
                return
            try:
                pre = None
                if len(reqs) == 1 and reqs[0].prefix_key is not None:
                    pre = self._prefix_pool.get(reqs[0].prefix_key)
                    if pre is not None and pre["len"] != reqs[0].prefix_len:
                        pre = None      # geometry changed: miss + re-store
                if pre is not None and \
                        self._setup_pending(targets[0], reqs[0], prefix=pre):
                    self.stats["prefix_hits"] += 1
                    self._prefix_lru.remove(reqs[0].prefix_key)
                    self._prefix_lru.append(reqs[0].prefix_key)
                    return          # suffix prefills between decode chunks
                if (len(reqs) == 1 and self.prefill_chunk > 0
                        and self.n_active > 0
                        and self._setup_pending(targets[0], reqs[0])):
                    return          # prefills piecewise between decode chunks
                # shared-prompt run: the n>1 multi-choice path submits the
                # SAME embeds object n times — prefill once, broadcast the
                # KV row, draw per-tenant first tokens (n x prefill -> 1)
                k = 1
                while k < len(reqs) and reqs[k].embeds is reqs[0].embeds \
                        and np.array_equal(reqs[k].valid, reqs[0].valid):
                    k += 1
                if k >= 2:
                    self._admit_shared(targets[:k], reqs[:k])
                    if k < len(reqs):
                        self._admit_group(targets[k:len(reqs)], reqs[k:])
                else:
                    self._admit_group(targets[: len(reqs)], reqs)
            except Exception as exc:  # noqa: BLE001 — bad request(s) only
                for r in reqs:
                    r._finish(error=exc)
                continue
            self.stats["admitted"] += len(reqs)
            self.stats["peak_active"] = max(self.stats["peak_active"],
                                            self.n_active)

    def _setup_pending(self, b: int, req: EngineRequest,
                       prefix: dict | None = None) -> bool:
        """Stage a chunked admission for slot ``b``: the prompt prefills in
        ``prefill_chunk``-token pieces between decode chunks (_prefill_step)
        so active rows stall at most one piece.  Returns False when the
        request can't chunk (non-contiguous validity) — the caller admits
        it unchunked instead.

        With ``prefix`` (a pool entry, PREFIX HIT): the entry's KV imports
        into the fresh row cache, ``cache.length`` starts at the prefix
        length P, and pieces prefill only [P, nv) — the suffix.  Positions
        continue from ``cache.length`` inside prefill_extend, so no new
        compiled programs appear per P (the capacity Wb = Sb + W is
        P-independent; imported pad garbage in [P, Pb) is masked by
        start+valid attention and later by the row's prompt mask)."""
        if req.temperature > 0 and prefix is None:
            # plain chunked admission's last piece draws greedily; cold
            # sampled requests admit unchunked (prefill_mixed draws their
            # first token).  Prefix HITS take the pending path even when
            # sampled: the final suffix piece draws via
            # prefill_extend_sampled (same key-split order as the solo
            # chain).
            return False
        S = int(req.embeds.shape[1])
        nv = int(np.asarray(req.valid).sum())
        if not bool(np.asarray(req.valid)[:nv].all()):
            return False            # non-prefix validity: unchunked path
        Sb = min(self.S_max, -(-S // self.bucket) * self.bucket)
        if prefix is None:
            W = min(self.prefill_chunk, Sb)
            Wb = -(-Sb // W) * W    # row capacity: pad writes never clamp
            cache, off0 = self._row_cache(1, Wb), 0
        else:
            P = prefix["len"]
            W = min(self.prefill_chunk if self.prefill_chunk > 0 else 256,
                    Sb)
            # P-independent capacity covering BOTH overhangs: the last
            # suffix piece's pad reach (<= nv + W) and the imported entry's
            # 256-granule pad (Pb <= P + 255 < Sb + 256).  Clamped writes
            # would silently corrupt prefix KV — same hazard as the
            # conversation path's EXT_PAD note.
            Wb = Sb + max(W, 256)
            cache = self._row_cache(1, Wb)
            with self._device_lock:
                k2, v2 = _import_prefix(cache.k, cache.v,
                                        prefix["k"], prefix["v"])
            cache, off0 = KVCache(k2, v2, jnp.int32(P)), P
        emb = jnp.pad(req.embeds.astype(self.dtype),
                      ((0, 0), (0, Wb - S), (0, 0)))
        rope = req.rope_cos_sin
        if rope is not None:
            cos, sin = rope
            rope = (jnp.pad(cos, ((0, Wb - S), (0, 0))),
                    jnp.pad(sin, ((0, Wb - S), (0, 0))))
        self._pending = {
            "req": req, "slot": b, "emb": emb, "rope": rope,
            "valid_n": nv, "off": off0, "W": W, "Sb": Sb,
            "cache": cache, "tok": None, "prefix_hit": prefix is not None,
        }
        return True

    def _store_prefix(self, req: EngineRequest, k, v):
        """Store a completed miss-admission's first-``prefix_len`` KV under
        its key (LRU, ``prefix_slots`` entries).  ``k``/``v`` are the row's
        prefilled cache buffers ([L, 1, C, KV, hd], hole-free through the
        prompt).  Stored padded to a 256 multiple so the import program
        count stays bounded; the pad granule past P is masked everywhere
        it could be read."""
        if self.prefix_slots <= 0 or req.prefix_key is None:
            return
        P = req.prefix_len
        Pb = -(-P // 256) * 256
        C = int(k.shape[2])
        n = min(Pb, C)
        with self._device_lock:      # slice/pad are device work
            pk, pv = k[:, :1, :n], v[:, :1, :n]
            if Pb > C:
                pad = ((0, 0), (0, 0), (0, Pb - C), (0, 0), (0, 0))
                pk, pv = jnp.pad(pk, pad), jnp.pad(pv, pad)
        key = req.prefix_key
        if key in self._prefix_pool:
            self._prefix_lru.remove(key)
        self._prefix_pool[key] = {"k": pk, "v": pv, "len": P}
        self._prefix_lru.append(key)
        while len(self._prefix_pool) > self.prefix_slots:
            old = self._prefix_lru.pop(0)
            del self._prefix_pool[old]
        self.stats["prefix_stores"] += 1

    def _prefill_step(self):
        """One admission-prefill piece; finalizes the admission (row insert
        + host state) when the last real token has been prefilled."""
        p = self._pending
        req = p["req"]
        W, off = p["W"], p["off"]
        chunk = jax.lax.slice_in_dim(p["emb"], off, off + W, axis=1)
        real = min(W, p["valid_n"] - off)
        last_piece = off + W >= p["valid_n"]
        rope = p["rope"]
        if rope is not None:
            rope = (jax.lax.slice_in_dim(rope[0], off, off + W, axis=0),
                    jax.lax.slice_in_dim(rope[1], off, off + W, axis=0))
        with self._device_lock:
            if last_piece and req.temperature > 0:
                # sampled prefix-cache hit: draw the first token with the
                # solo chain's key-split order (prefill_extend_sampled)
                tok, cache, new_key = prefill_extend_sampled(
                    self.params, chunk, jnp.int32(real), p["cache"],
                    self.cfg, jnp.asarray(req.key), req.temperature,
                    req.top_p, rope_cos_sin=rope)
                p["key"] = np.asarray(new_key, np.uint32)
            else:
                tok, cache = prefill_extend(self.params, chunk,
                                            jnp.int32(real), p["cache"],
                                            self.cfg, rope_cos_sin=rope)
        p["cache"] = cache
        p["tok"] = tok
        p["off"] = off + W
        if p["off"] < p["valid_n"]:
            return
        # finalize
        req, b, Sb = p["req"], p["slot"], p["Sb"]
        with self._device_lock:
            self._k, self._v = _insert_rows(
                self._k, self._v,
                p["cache"].k[:, :, :Sb], p["cache"].v[:, :, :Sb],
                jnp.asarray([b], jnp.int32))
            first = int(np.asarray(p["tok"])[0])
        self._tok[b] = first
        self._pos0[b] = (p["valid_n"] if req.pos0_override is None
                         else int(req.pos0_override))
        self._own[b] = 0
        self._done[b] = False
        self._pv[b] = False
        self._pv[b, :p["valid_n"]] = True
        # per-request sampling state: greedy chunked admissions zero out;
        # a sampled prefix hit carries its advanced key chain forward
        self._temp[b] = req.temperature
        self._topp[b] = req.top_p
        self._keys[b] = p.get("key", np.zeros(2, np.uint32))
        self._req[b] = req
        if not p["prefix_hit"]:     # a hit's values are already pooled
            self._store_prefix(req, p["cache"].k, p["cache"].v)
        self._pending = None
        self.stats["admitted"] += 1
        self.stats["chunked_admissions"] += 1
        self.stats["peak_active"] = max(self.stats["peak_active"],
                                        self.n_active)

    def _admit_shared(self, slots: list[int], reqs: list[EngineRequest]):
        """Admit ``reqs`` (identical prompts — the n>1 multi-choice path)
        off ONE B=1 prefill: the row KV broadcasts into every slot and each
        tenant draws its own first token from the shared last-position
        logits (sampled tenants bit-exact vs their solo chains; greedy
        tenants take the argmax).  Cost: one prefill + n tiny draws instead
        of an n-row ragged prefill of the same tokens."""
        r0 = reqs[0]
        S = int(r0.embeds.shape[1])
        Sb = min(self.S_max, -(-S // self.bucket) * self.bucket)
        emb = jnp.pad(r0.embeds.astype(self.dtype),
                      ((0, 0), (0, Sb - S), (0, 0)))
        valid = np.zeros((1, Sb), bool)
        valid[0, :S] = r0.valid
        g_keys = np.stack([r.key for r in reqs])
        g_temp = np.asarray([r.temperature for r in reqs], np.float32)
        g_topp = np.asarray([r.top_p for r in reqs], np.float32)
        self.stats["admit_batches"] += 1
        self.stats["shared_admissions"] += 1
        with self._device_lock:
            row = self._row_cache(1, Sb)
            greedy, logits, row, pos0 = prefill_shared(
                self.params, emb, jnp.asarray(valid), row, self.cfg)
            firsts, keys = _shared_first_tokens(
                logits, jnp.asarray(g_keys), jnp.asarray(g_temp),
                jnp.asarray(g_topp), greedy)
            self._k, self._v = _insert_rows(
                self._k, self._v, row.k, row.v,
                jnp.asarray(slots, jnp.int32))     # [L,1,..] broadcasts
            firsts = np.asarray(firsts)
            keys = np.asarray(keys)
            p0 = int(np.asarray(pos0)[0])
        for i, (b, req) in enumerate(zip(slots, reqs)):
            self._tok[b] = int(firsts[i])
            self._pos0[b] = p0
            self._own[b] = 0
            self._done[b] = False
            self._pv[b] = False
            self._pv[b, :Sb] = valid[0]
            self._temp[b] = g_temp[i]
            self._topp[b] = g_topp[i]
            self._keys[b] = keys[i]
            self._req[b] = req

    def _admit_group(self, slots: list[int], reqs: list[EngineRequest]):
        """Prefill ``reqs`` as one ragged batch (right-padded to the group's
        largest prompt bucket) and insert each row into its slot.  A 1-long
        group is the solo path; mrope requests always arrive 1-long with
        their rope tables threaded through."""
        k = len(reqs)
        Sb = 0
        for r in reqs:
            S = int(r.embeds.shape[1])
            Sb = max(Sb, min(self.S_max, -(-S // self.bucket) * self.bucket))
        embs, valids = [], np.zeros((k, Sb), bool)
        for i, r in enumerate(reqs):
            S = int(r.embeds.shape[1])
            embs.append(jnp.pad(r.embeds.astype(self.dtype),
                                ((0, 0), (0, Sb - S), (0, 0))))
            valids[i, :S] = r.valid
        emb = jnp.concatenate(embs, axis=0)
        rope = reqs[0].rope_cos_sin if k == 1 else None
        if rope is not None and Sb != int(reqs[0].embeds.shape[1]):
            S = int(reqs[0].embeds.shape[1])
            cos, sin = rope
            rope = (jnp.pad(cos, ((0, Sb - S), (0, 0))),
                    jnp.pad(sin, ((0, Sb - S), (0, 0))))
        pos_override = reqs[0].pos0_override if k == 1 else None
        self.stats["admit_batches"] += 1
        g_keys = np.stack([r.key for r in reqs])
        g_temp = np.asarray([r.temperature for r in reqs], np.float32)
        g_topp = np.asarray([r.top_p for r in reqs], np.float32)
        with self._device_lock:
            row = self._row_cache(k, Sb)
            if (g_temp > 0).any():
                first_tok, row, pos0, keys = prefill_mixed(
                    self.params, emb, jnp.asarray(valids), row, self.cfg,
                    jnp.asarray(g_keys), jnp.asarray(g_temp),
                    jnp.asarray(g_topp), prompt_rope_cos_sin=rope,
                    decode_pos_start=pos_override)
                g_keys = np.array(keys)
            else:               # greedy-only group: the plain prefill
                first_tok, row, pos0 = decode_prefill(
                    self.params, emb, jnp.asarray(valids), row, self.cfg,
                    prompt_rope_cos_sin=rope, decode_pos_start=pos_override)
            self._k, self._v = _insert_rows(
                self._k, self._v, row.k, row.v,
                jnp.asarray(slots, jnp.int32))
            first = np.asarray(first_tok)
            p0 = np.asarray(pos0)
        if k == 1:                  # prefix-cached requests admit solo
            self._store_prefix(reqs[0], row.k, row.v)
        for i, (b, req) in enumerate(zip(slots, reqs)):
            self._tok[b] = int(first[i])
            self._pos0[b] = int(p0[i])
            self._own[b] = 0
            self._done[b] = False
            self._pv[b] = False
            self._pv[b, :Sb] = valids[i]
            self._temp[b] = g_temp[i]
            self._topp[b] = g_topp[i]
            self._keys[b] = g_keys[i]
            self._req[b] = req

    def _step_chunk(self):
        with self._device_lock:
            out, tok, self._k, self._v, own, done, keys = decode_chunk_slots(
                self.params, jnp.asarray(self._tok), self._k, self._v,
                jnp.asarray(self._own), jnp.asarray(self._pos0),
                jnp.asarray(self._pv), jnp.asarray(self._done),
                jnp.asarray(self._keys), jnp.asarray(self._temp),
                jnp.asarray(self._topp), self.cfg, self.chunk,
                jnp.int32(self.eos))
            out = np.asarray(out)                              # [B, chunk]
            # np.array (copy): asarray views of jax buffers are read-only,
            # and _admit_one/_step_chunk write into these host mirrors
            self._tok = np.array(tok)
            self._done = np.array(done)
            self._keys = np.array(keys)
        self._own = self._own + self.chunk
        self.stats["chunks"] += 1
        for b, req in enumerate(self._req):
            if req is None:
                continue
            piece = out[b, : req.max_new - len(req.tokens)].tolist()
            finished = False
            if self.eos in piece:
                piece = piece[: piece.index(self.eos)]
                finished = True
            req.tokens.extend(piece)
            if piece and req.stream_cb is not None:
                try:
                    req.stream_cb(piece)
                except Exception:  # noqa: BLE001 — a client must not kill us
                    pass
            if finished or len(req.tokens) >= req.max_new:
                self._req[b] = None
                self._done[b] = True
                # freed rows go greedy so a retired sampled tenant doesn't
                # keep the whole batch on the (pricier) sampling branch
                self._temp[b] = 0.0
                self.stats["completed"] += 1
                req._finish()
