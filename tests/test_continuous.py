"""Continuous batching engine (serve/continuous.py): token-exactness vs solo
``greedy_decode`` under staggered admission, slot reuse, per-request budgets,
streaming callbacks, and mrope pos0 overrides.

The exactness construction matches cache geometry between the two paths
(solo prompt right-padded to the engine's S_max, solo cache sized
S_max + decode_slots) so the compiled attention programs are shape-identical
and masked slots contribute exact zeros — the engine is then bit-exact, not
approximately equal (continuous.py module docstring).
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspo_tpu.models.qwen2 import (KVCache, Qwen2Config, embed_tokens,
                                   greedy_decode, init_qwen2_params)
from tspo_tpu.serve.continuous import ContinuousEngine

CFG = Qwen2Config.tiny()          # eos_token_id = 511
EOS = CFG.eos_token_id
S_MAX = 32
D_SLOTS = 24


@pytest.fixture(scope="module")
def params():
    return init_qwen2_params(jax.random.PRNGKey(7), CFG, jnp.float32)


def _embeds(params, ids):
    return embed_tokens(params, jnp.asarray(ids))[None]      # [1, S, D]


def _solo(params, ids, max_new, decode_pos_start=None):
    """Reference decode with engine-matched cache geometry."""
    S = len(ids)
    emb = jnp.pad(_embeds(params, ids), ((0, 0), (0, S_MAX - S), (0, 0)))
    valid = jnp.zeros((1, S_MAX), bool).at[:, :S].set(True)
    cache = KVCache.create(CFG, 1, S_MAX + D_SLOTS, jnp.float32)
    toks, n = greedy_decode(params, emb, valid, cache, CFG, max_new,
                            decode_pos_start=decode_pos_start)
    toks = np.asarray(toks).tolist()
    return toks[: toks.index(EOS)] if EOS in toks else toks


def _engine(params, slots=2, chunk=3, **kw):
    return ContinuousEngine(params, CFG, slots=slots, chunk=chunk,
                            max_prompt=S_MAX, decode_slots=D_SLOTS,
                            prompt_bucket=S_MAX, dtype=jnp.float32, **kw)


def test_staggered_slot_reuse_matches_solo(params):
    """Six requests with ragged prompts and per-request budgets through a
    2-slot engine: requests 3-6 are admitted mid-flight into recycled slots
    at different global decode steps, and every output must equal its solo
    greedy_decode."""
    rng = np.random.default_rng(0)
    reqs = []
    lock = threading.Lock()            # engine holds it across device calls
    eng = _engine(params, device_lock=lock)
    try:
        with lock:                     # park the engine until all 6 queued
            for i in range(6):
                ids = rng.integers(0, CFG.vocab_size - 1,
                                   size=rng.integers(4, S_MAX)).tolist()
                max_new = int(rng.integers(3, D_SLOTS))
                want = _solo(params, ids, max_new)
                h = eng.submit(_embeds(params, ids), max_new_tokens=max_new)
                reqs.append((ids, max_new, want, h))
        for i, (ids, max_new, want, h) in enumerate(reqs):
            got = h.result(timeout=120)
            assert got == want, f"request {i} diverged"
        assert eng.stats["completed"] == 6
        assert eng.stats["peak_active"] == 2
    finally:
        eng.shutdown()


def test_stream_callback_concatenates_to_result(params):
    rng = np.random.default_rng(1)
    ids = rng.integers(0, CFG.vocab_size - 1, size=9).tolist()
    pieces: list = []
    eng = _engine(params, slots=1, chunk=4)
    try:
        h = eng.submit(_embeds(params, ids), max_new_tokens=10,
                       stream_cb=lambda p: pieces.append(list(p)))
        got = h.result(timeout=120)
    finally:
        eng.shutdown()
    assert [t for p in pieces for t in p] == got == _solo(params, ids, 10)


def test_pos0_override_matches_solo(params):
    """decode_pos_start (the Qwen2.5-VL mrope delta) threads through
    admission prefill and the chunk loop's rope positions."""
    ids = list(range(5, 12))
    eng = _engine(params, slots=1)
    try:
        h = eng.submit(_embeds(params, ids), max_new_tokens=6,
                       decode_pos_start=17)
        got = h.result(timeout=120)
    finally:
        eng.shutdown()
    assert got == _solo(params, ids, 6, decode_pos_start=17)


def test_concurrent_submitters(params):
    """Thread-per-request submission (the HTTP handler pattern): all results
    exact, no deadlock."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(0, CFG.vocab_size - 1,
                            size=rng.integers(4, 20)).tolist()
               for _ in range(5)]
    wants = [_solo(params, ids, 8) for ids in prompts]
    eng = _engine(params, slots=2, chunk=2)
    got = [None] * len(prompts)

    def run(i):
        h = eng.submit(_embeds(params, prompts[i]), max_new_tokens=8)
        got[i] = h.result(timeout=120)

    try:
        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
    finally:
        eng.shutdown()
    assert got == wants


def test_rejects_oversize_prompt_and_windowed_cfg(params):
    eng = _engine(params, slots=1)
    try:
        with pytest.raises(ValueError, match="max_prompt"):
            eng.submit(jnp.zeros((1, S_MAX + 1, CFG.hidden_size)),
                       max_new_tokens=4)
    finally:
        eng.shutdown()
    import dataclasses
    windowed = dataclasses.replace(CFG, sliding_window=8)
    with pytest.raises(ValueError, match="sliding_window"):
        ContinuousEngine(params, windowed, max_prompt=S_MAX)


def test_bad_request_fails_alone(params):
    """An admission failure (e.g. NaN-free guard via a shape error) reaches
    only its own request; the engine keeps serving others."""
    eng = _engine(params, slots=1)
    try:
        bad = eng.submit(jnp.zeros((1, 4, CFG.hidden_size + 1)),   # wrong D
                         max_new_tokens=4)
        with pytest.raises(Exception):
            bad.result(timeout=120)
        ids = list(range(6))
        ok = eng.submit(_embeds(params, ids), max_new_tokens=5)
        assert ok.result(timeout=120) == _solo(params, ids, 5)
    finally:
        eng.shutdown()


# ---------------------------------------------------------------------------
# Backbone + ScoringService integration
# ---------------------------------------------------------------------------


def _tiny_llava():
    from tspo_tpu.models.llava_video import LLaVAVideoConfig, LLaVAVideoModel
    cfg = LLaVAVideoConfig.tiny()
    enc = lambda s: [ord(c) % cfg.lm.vocab_size for c in s]        # noqa: E731
    dec = lambda toks: " ".join(str(t) for t in toks)              # noqa: E731
    return LLaVAVideoModel.random_init(0, cfg, dtype=jnp.float32,
                                       encode=enc, decode=dec,
                                       batch_frames=4, max_new_tokens=6)


def _tiny_service(backbone, **kw):
    from tspo_tpu.configs import CLIPConfig, SelectorConfig
    from tspo_tpu.models.tspo_model import build_random_scorer
    from tspo_tpu.serve.server import ScoringService
    clip_cfg = CLIPConfig.tiny()

    def tok(problem):
        ids = np.full((1, 8), 3, np.int32)
        ids[0, -1] = clip_cfg.text.eos_token_id
        return ids, np.ones((1, 8), np.int32)

    scorer = build_random_scorer(
        seed=0, clip_cfg=clip_cfg,
        selector_cfg=SelectorConfig(dim=clip_cfg.text.projection_dim,
                                    num_heads=4),
        dtype=jnp.float32, tokenize=tok, batch_frames=32,
        frame_buckets=(64, 128))
    return ScoringService(scorer=scorer, backbone=backbone,
                          max_candidates=128, **kw)


@pytest.fixture(scope="module")
def tiny_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path_factory.mktemp("contvid") / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(60):
        w.write(np.full((48, 48, 3), (i * 8) % 255, np.uint8))
    w.release()
    return path


def test_service_engine_answer_matches_generate(tiny_video):
    """/v1/answer through the continuous engine returns exactly what the
    solo generate() path returns, and the engine stats record it."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=2, continuous_chunk=4,
                        continuous_max_prompt=256,
                        continuous_decode_slots=16)
    try:
        out = svc.answer(video_path=tiny_video, question="what?",
                         sample_num=4, max_new_tokens=6)
        sel_idx = np.asarray(out["frame_indices"])
        from tspo_tpu.video.reader import load_video
        frames, _, _ = load_video(tiny_video, max_frames_num=128, fps=1,
                                  min_frames_num=0)
        want = bb.generate(frames[sel_idx], "what?", max_new_tokens=6)
        assert out["answer"] == want
        assert svc.stats["engine"] == 1
    finally:
        svc._engine.shutdown()


def test_service_engine_stream_concatenates(tiny_video):
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=2, continuous_chunk=4,
                        continuous_max_prompt=256,
                        continuous_decode_slots=16)
    try:
        events = list(svc.answer_stream(video_path=tiny_video,
                                        question="what?", sample_num=4,
                                        max_new_tokens=6))
        text = "".join(e["delta"] for e in events if "delta" in e)
        plain = svc.answer(video_path=tiny_video, question="what?",
                           sample_num=4, max_new_tokens=6)
        assert text == plain["answer"]
        assert events[0]["event"] == "frames"
        assert events[-1]["event"] == "done"
    finally:
        svc._engine.shutdown()


def test_service_engine_prompt_overflow_falls_back(tiny_video):
    """Prompts longer than the engine's prompt region fall back to the solo
    decode path instead of failing."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=1, continuous_chunk=2,
                        continuous_max_prompt=8,     # everything overflows
                        continuous_decode_slots=8)
    try:
        out = svc.answer(video_path=tiny_video, question="what?",
                         sample_num=4, max_new_tokens=4)
        assert out["answer"]
        assert svc.stats["engine"] == 0
        assert svc.stats["engine_fallback"] == 1
    finally:
        svc._engine.shutdown()


def test_service_sessions_reuse_conversation(tiny_video):
    """/v1/answer with session_id: follow-up rounds ride the conversation
    state (video encoded once, turn history in the template) and answer
    exactly like the stateless multi-round path."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, max_sessions=2)
    counts = {"n": 0}
    orig = bb.encode_video
    bb.encode_video = \
        lambda f: (counts.__setitem__("n", counts["n"] + 1) or orig(f))
    try:
        r1 = svc.answer(video_path=tiny_video, question="What?",
                        sample_num=4, max_new_tokens=3, session_id="s1")
        r2 = svc.answer(video_path=tiny_video, question="And then?",
                        sample_num=4, max_new_tokens=3, session_id="s1")
        assert (r1["round"], r2["round"]) == (1, 2)
        assert r2["frame_indices"] == r1["frame_indices"]
        n_session_encodes = counts["n"]
        from tspo_tpu.video.reader import load_video
        cands, _, _ = load_video(tiny_video, max_frames_num=128, fps=1,
                                 min_frames_num=0)
        frames = cands[np.asarray(r1["frame_indices"])]
        a1 = bb.generate_multi_round(frames, [("What?", None)],
                                     max_new_tokens=3)
        a2 = bb.generate_multi_round(frames, [("What?", a1),
                                              ("And then?", None)],
                                     max_new_tokens=3)
        assert (r1["answer"], r2["answer"]) == (a1, a2)
        assert n_session_encodes == 1      # whole session: one vision pass
        assert svc.stats["session_rounds"] == 2
    finally:
        del bb.encode_video


def test_service_session_eviction_and_new_video(tiny_video):
    """LRU eviction (max_sessions=1) restarts an evicted session at round
    1 AND marks the response restarted=True so clients know the context
    was lost (never silently)."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, max_sessions=1)
    r1 = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                    max_new_tokens=3, session_id="a")
    svc.answer(video_path=tiny_video, question="What?", sample_num=4,
               max_new_tokens=3, session_id="b")     # evicts "a"
    r3 = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                    max_new_tokens=3, session_id="a")
    assert r1["round"] == 1 and r3["round"] == 1
    assert "restarted" not in r1
    assert r3["restarted"] is True
    assert r3["answer"] == r1["answer"]


def test_service_session_failed_first_round_drops_session(tiny_video):
    """A failed FIRST round must drop the session: a retry re-selects and
    re-encodes the video instead of silently answering without it
    (round-4 review finding)."""
    bb = _tiny_llava()
    svc = _tiny_service(bb)
    calls = {"n": 0}
    orig = bb.generate_multi_round

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient device error")
        return orig(*a, **kw)

    bb.generate_multi_round = flaky
    try:
        with pytest.raises(RuntimeError, match="transient"):
            svc.answer(video_path=tiny_video, question="What?",
                       sample_num=4, max_new_tokens=3, session_id="s")
        assert "s" not in svc._sessions
        r = svc.answer(video_path=tiny_video, question="What?",
                       sample_num=4, max_new_tokens=3, session_id="s")
    finally:
        del bb.generate_multi_round
    assert r["round"] == 1 and r["answer"]
    # the retry's conversation really carries the video
    assert svc._sessions["s"]["state"].video_tokens.shape[0] > 0


def test_service_engine_death_falls_back_to_solo(tiny_video):
    """A dead engine must not 500 every later request: answers fall back
    to the solo decode path (round-4 review finding)."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=2, continuous_chunk=4,
                        continuous_max_prompt=256,
                        continuous_decode_slots=16)
    try:
        ok = svc.answer(video_path=tiny_video, question="What?",
                        sample_num=4, max_new_tokens=3)
        assert svc.stats["engine"] == 1
        svc._engine.shutdown()               # simulate engine death
        r = svc.answer(video_path=tiny_video, question="What?",
                       sample_num=4, max_new_tokens=3)
        assert r["answer"] == ok["answer"]
        assert svc.stats["engine"] == 1      # second answer went solo
        assert svc.stats["engine_fallback"] >= 1
    finally:
        svc._engine.shutdown()


def test_qwen25vl_engine_matches_generate():
    """The mrope backbone's prepare_engine_request (rope tables + decode
    delta) produces engine outputs equal to its solo generate()."""
    from tspo_tpu.models.qwen25vl import Qwen25VLConfig, Qwen25VLModel
    cfg = Qwen25VLConfig.tiny()
    enc = lambda s: [ord(c) % cfg.lm.vocab_size for c in s]        # noqa: E731
    dec = lambda toks: " ".join(str(t) for t in toks)              # noqa: E731
    model = Qwen25VLModel.random_init(0, cfg, dtype=jnp.float32,
                                      encode=enc, decode=dec)
    frames = np.random.default_rng(3).integers(
        0, 256, (4, 56, 56, 3), dtype=np.uint8)
    want = model.generate(frames, "what?", max_new_tokens=6)
    kw = model.prepare_engine_request(frames, "what?", max_new_tokens=6)
    eng = ContinuousEngine(model.params["lm"], cfg.lm, slots=1, chunk=3,
                           max_prompt=256, decode_slots=16,
                           prompt_bucket=64, dtype=jnp.float32)
    try:
        h = eng.submit(kw.pop("embeds"), **kw)
        got = dec([t for t in h.result(timeout=120)
                   if t != cfg.lm.eos_token_id])
    finally:
        eng.shutdown()
    assert got == want


def test_chunked_admission_matches_solo(params):
    """prefill_chunk > 0: a solo admission arriving while rows decode
    prefills in pieces interleaved with decode chunks.  Outputs stay
    solo-exact, and at least one admission actually took the chunked path
    (slot frees mid-flight -> solo admission with active rows)."""
    rng = np.random.default_rng(5)
    reqs = []
    lock = threading.Lock()
    eng = _engine(params, slots=2, chunk=3, device_lock=lock,
                  prefill_chunk=16)
    try:
        with lock:
            for i in range(6):
                ids = rng.integers(0, CFG.vocab_size - 1,
                                   size=rng.integers(18, S_MAX)).tolist()
                max_new = int(rng.integers(6, 16))
                want = _solo(params, ids, max_new)
                h = eng.submit(_embeds(params, ids), max_new_tokens=max_new)
                reqs.append((want, h))
        for i, (want, h) in enumerate(reqs):
            assert h.result(timeout=120) == want, f"request {i} diverged"
        assert eng.stats["admitted"] == 6
        assert eng.stats["chunked_admissions"] >= 1
    finally:
        eng.shutdown()


def test_batched_admission_groups_and_stays_exact(params):
    """Queued standard-rope requests prefill as ONE ragged batch (the
    window micro-batcher's prefill amortization, kept under continuous
    batching) — white-box: park the worker on the device lock, queue three
    requests, and check they admitted in one decode_prefill group with
    solo-exact outputs."""
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, CFG.vocab_size - 1,
                            size=rng.integers(4, S_MAX)).tolist()
               for _ in range(3)]
    wants = [_solo(params, ids, 6) for ids in prompts]
    lock = threading.Lock()
    eng = _engine(params, slots=3, chunk=3, device_lock=lock)
    try:
        with lock:
            hs = [eng.submit(_embeds(params, ids), max_new_tokens=6)
                  for ids in prompts]
            time.sleep(0.2)        # worker parks inside the first admission
        assert [h.result(timeout=120) for h in hs] == wants
        assert eng.stats["admitted"] == 3
        assert eng.stats["admit_batches"] <= 2   # >=1 multi-row group formed
    finally:
        eng.shutdown()


def test_idle_engine_accepts_late_work(params):
    eng = _engine(params, slots=1)
    try:
        time.sleep(0.3)                        # let the loop go idle
        ids = list(range(3, 10))
        h = eng.submit(_embeds(params, ids), max_new_tokens=4)
        assert h.result(timeout=120) == _solo(params, ids, 4)
    finally:
        eng.shutdown()


def test_shutdown_fails_waiters_and_rejects_submits(params):
    """shutdown() must error out still-pending requests (not hang their
    waiters) and later submits must raise."""
    lock = threading.Lock()
    eng = _engine(params, slots=1, device_lock=lock)
    with lock:                                 # park the worker
        h = eng.submit(_embeds(params, list(range(6))), max_new_tokens=4)
        h2 = eng.submit(_embeds(params, list(range(8))), max_new_tokens=4)
        eng.shutdown(timeout=0.2)              # worker still parked
    with pytest.raises(RuntimeError):
        h2.result(timeout=30)
    try:        # h was mid-admission: must resolve either way, never hang
        h.result(timeout=30)
    except RuntimeError:
        pass
    with pytest.raises(RuntimeError, match="shut down|dead"):
        eng.submit(_embeds(params, list(range(4))), max_new_tokens=2)


def test_service_session_stream_rounds(tiny_video):
    """Streaming chat sessions: /v1/answer(stream) with session_id yields
    frames -> deltas -> done per round, the joined deltas match the
    stateless multi-round answers exactly, follow-up rounds keep the
    round-1 frame selection, and the video encodes once for the whole
    conversation."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, max_sessions=2)
    counts = {"n": 0}
    orig = bb.encode_video
    bb.encode_video = \
        lambda f: (counts.__setitem__("n", counts["n"] + 1) or orig(f))
    try:
        ev1 = list(svc.answer_stream(video_path=tiny_video,
                                     question="What?", sample_num=4,
                                     max_new_tokens=3, session_id="s1"))
        ev2 = list(svc.answer_stream(video_path=tiny_video,
                                     question="And then?", sample_num=4,
                                     max_new_tokens=3, session_id="s1"))
        n_session_encodes = counts["n"]
        for ev in (ev1, ev2):
            assert ev[0]["event"] == "frames" and ev[0]["session_id"] == "s1"
            assert ev[-1]["event"] == "done"
        assert (ev1[-1]["round"], ev2[-1]["round"]) == (1, 2)
        assert ev2[0]["frame_indices"] == ev1[0]["frame_indices"]
        a1 = "".join(e["delta"] for e in ev1 if "delta" in e)
        a2 = "".join(e["delta"] for e in ev2 if "delta" in e)
        from tspo_tpu.video.reader import load_video
        cands, _, _ = load_video(tiny_video, max_frames_num=128, fps=1,
                                 min_frames_num=0)
        frames = cands[np.asarray(ev1[0]["frame_indices"])]
        w1 = bb.generate_multi_round(frames, [("What?", None)],
                                     max_new_tokens=3)
        w2 = bb.generate_multi_round(frames, [("What?", w1),
                                              ("And then?", None)],
                                     max_new_tokens=3)
        assert (a1, a2) == (w1, w2)
        assert n_session_encodes == 1      # whole session: one vision pass
        assert svc.stats["session_rounds"] == 2
    finally:
        del bb.encode_video


def test_service_session_stream_disconnect_preserves_session(tiny_video):
    """A client disconnect mid-stream (generator closed after a delta)
    must leave the session exactly as before the round: the turn is not
    recorded, and re-asking completes as the SAME round with the same
    answer the uninterrupted stream would have given."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, max_sessions=2)
    ev1 = list(svc.answer_stream(video_path=tiny_video, question="What?",
                                 sample_num=4, max_new_tokens=3,
                                 session_id="d1"))
    it = svc.answer_stream(video_path=tiny_video, question="And then?",
                           sample_num=4, max_new_tokens=3, session_id="d1")
    assert next(it)["event"] == "frames"
    for e in it:
        if "delta" in e:
            break                      # one delta landed, then the tab dies
    it.close()
    sess = svc._sessions["d1"]
    assert len(sess["turns"]) == 1     # round 2 was never committed
    ev2 = list(svc.answer_stream(video_path=tiny_video,
                                 question="And then?", sample_num=4,
                                 max_new_tokens=3, session_id="d1"))
    assert ev2[-1]["round"] == 2
    a2 = "".join(e["delta"] for e in ev2 if "delta" in e)
    from tspo_tpu.video.reader import load_video
    cands, _, _ = load_video(tiny_video, max_frames_num=128, fps=1,
                             min_frames_num=0)
    frames = cands[np.asarray(ev1[0]["frame_indices"])]
    w1 = "".join(e["delta"] for e in ev1 if "delta" in e)
    w2 = bb.generate_multi_round(frames, [("What?", w1),
                                          ("And then?", None)],
                                 max_new_tokens=3)
    assert a2 == w2


def _solo_sampled(params, ids, max_new, seed, temperature, top_p):
    """Reference sampled decode with engine-matched cache geometry."""
    from tspo_tpu.models.qwen2 import sample_decode
    S = len(ids)
    emb = jnp.pad(_embeds(params, ids), ((0, 0), (0, S_MAX - S), (0, 0)))
    valid = jnp.zeros((1, S_MAX), bool).at[:, :S].set(True)
    cache = KVCache.create(CFG, 1, S_MAX + D_SLOTS, jnp.float32)
    toks, n = sample_decode(params, emb, valid, cache, CFG, max_new,
                            jax.random.PRNGKey(seed), float(temperature),
                            float(top_p))
    toks = np.asarray(toks).tolist()
    return toks[: toks.index(EOS)] if EOS in toks else toks


def test_mixed_sampled_batch_matches_solo(params):
    """Per-request sampling inside one continuous batch: a sampled tenant's
    tokens are bit-exact vs a solo sample_decode at the same seed, the
    co-resident GREEDY tenant stays bit-exact vs solo greedy_decode, an
    equal-seed rerun reproduces, and unseeded sampled requests differ."""
    rng = np.random.default_rng(3)
    ids_g = rng.integers(0, CFG.vocab_size - 1, size=9).tolist()
    ids_s = rng.integers(0, CFG.vocab_size - 1, size=7).tolist()
    want_g = _solo(params, ids_g, 10)
    want_s = _solo_sampled(params, ids_s, 10, seed=5, temperature=2.0,
                           top_p=0.9)
    lock = threading.Lock()
    eng = _engine(params, device_lock=lock)
    try:
        with lock:              # both admit as ONE mixed prefill group
            hg = eng.submit(_embeds(params, ids_g), max_new_tokens=10)
            hs = eng.submit(_embeds(params, ids_s), max_new_tokens=10,
                            temperature=2.0, top_p=0.9, seed=5)
        assert hg.result(timeout=120) == want_g
        assert hs.result(timeout=120) == want_s
        # equal-seed rerun reproduces; unseeded draws differ (vocab 512,
        # 10 draws at temp 2: collision probability negligible)
        h2 = eng.submit(_embeds(params, ids_s), max_new_tokens=10,
                        temperature=2.0, top_p=0.9, seed=5)
        assert h2.result(timeout=120) == want_s
        u1 = eng.submit(_embeds(params, ids_s), max_new_tokens=10,
                        temperature=2.0).result(timeout=120)
        u2 = eng.submit(_embeds(params, ids_s), max_new_tokens=10,
                        temperature=2.0).result(timeout=120)
        assert u1 != u2
    finally:
        eng.shutdown()


def test_sampled_tenant_joins_running_decode(params):
    """A sampled request admitted mid-flight (slot recycling, unchunked
    admission) still reproduces its solo sample_decode chain, and the
    already-running greedy tenant is unperturbed."""
    rng = np.random.default_rng(4)
    ids_g = rng.integers(0, CFG.vocab_size - 1, size=12).tolist()
    ids_s = rng.integers(0, CFG.vocab_size - 1, size=6).tolist()
    want_g = _solo(params, ids_g, D_SLOTS - 1)
    want_s = _solo_sampled(params, ids_s, 8, seed=11, temperature=3.0,
                           top_p=0.8)
    eng = _engine(params)
    try:
        hg = eng.submit(_embeds(params, ids_g),
                        max_new_tokens=D_SLOTS - 1)
        time.sleep(0.3)         # let greedy decode get going
        hs = eng.submit(_embeds(params, ids_s), max_new_tokens=8,
                        temperature=3.0, top_p=0.8, seed=11)
        assert hs.result(timeout=120) == want_s
        assert hg.result(timeout=120) == want_g
    finally:
        eng.shutdown()


def test_service_sampled_rides_engine(tiny_video):
    """temperature>0 on /v1/answer with the engine on: the request rides
    the engine's per-row sampling (stats prove it), equal seeds reproduce,
    and the sampled SSE stream joins to the same answer."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=2, continuous_chunk=4,
                        continuous_max_prompt=256,
                        continuous_decode_slots=16)
    try:
        a = svc.answer(video_path=tiny_video, question="what?",
                       sample_num=4, max_new_tokens=6,
                       temperature=2.0, seed=9)
        b = svc.answer(video_path=tiny_video, question="what?",
                       sample_num=4, max_new_tokens=6,
                       temperature=2.0, seed=9)
        assert a["answer"] == b["answer"]
        assert svc.stats["engine"] == 2         # both rode the engine
        events = list(svc.answer_stream(video_path=tiny_video,
                                        question="what?", sample_num=4,
                                        max_new_tokens=6,
                                        temperature=2.0, seed=9))
        text = "".join(e["delta"] for e in events if "delta" in e)
        assert text == a["answer"]
        assert svc.stats["engine"] == 3
        # sampled chat completions batch through the engine too
        out = svc.chat_completion(
            messages=[{"role": "user", "content": "hi"}],
            temperature=2.0, seed=9, max_tokens=6)
        assert out["choices"][0]["message"]["content"]
        assert svc.stats["engine"] == 4
    finally:
        svc._engine.shutdown()


def test_prefill_mixed_matches_solo_prefills(params):
    """The mixed admission prefill (one greedy + one sampled row in ONE
    batch) reproduces decode_prefill's greedy first token and
    sample_prefill's sampled first token + advanced key, row for row."""
    from tspo_tpu.serve.continuous import prefill_mixed
    from tspo_tpu.models.qwen2 import decode_prefill, sample_prefill
    rng = np.random.default_rng(6)
    ids = rng.integers(0, CFG.vocab_size - 1, size=(2, 10))
    emb = embed_tokens(params, jnp.asarray(ids)).astype(jnp.float32)
    valid = jnp.ones((2, 10), bool)
    key_s = jax.random.PRNGKey(13)
    keys = jnp.stack([jnp.zeros(2, jnp.uint32), key_s])
    temp = jnp.asarray([0.0, 2.0], jnp.float32)
    topp = jnp.asarray([1.0, 0.9], jnp.float32)
    first, _, pos0, new_keys = prefill_mixed(
        params, emb, valid, KVCache.create(CFG, 2, 16, jnp.float32), CFG,
        keys, temp, topp)
    want_g, _, _ = decode_prefill(
        params, emb[:1], valid[:1], KVCache.create(CFG, 1, 16, jnp.float32),
        CFG)
    want_s, _, _, want_key = sample_prefill(
        params, emb[1:], valid[1:], KVCache.create(CFG, 1, 16, jnp.float32),
        CFG, key_s, 2.0, 0.9)
    assert int(first[0]) == int(np.asarray(want_g)[0])
    assert int(first[1]) == int(np.asarray(want_s)[0])
    np.testing.assert_array_equal(np.asarray(new_keys[1]),
                                  np.asarray(want_key))


# ---------------------------------------------------------------------------
# Tensor-parallel engine (mesh=)
# ---------------------------------------------------------------------------


def test_tp_engine_matches_unsharded(params):
    """The engine on a model-axis mesh (Megatron-TP params + kv-head-sharded
    slot cache) emits bit-identical tokens: staggered greedy tenants AND a
    sampled tenant each reproduce their solo UNSHARDED chains — the
    multi-chip serving path (XLA inserts the TP collectives inside the same
    jitted prefill/decode programs)."""
    from tspo_tpu.parallel import create_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(data=4, model=2)
    rng = np.random.default_rng(9)
    ids1 = rng.integers(0, CFG.vocab_size - 1, size=10).tolist()
    ids2 = rng.integers(0, CFG.vocab_size - 1, size=5).tolist()
    ids3 = rng.integers(0, CFG.vocab_size - 1, size=7).tolist()
    want1 = _solo(params, ids1, 12)
    want2 = _solo(params, ids2, 8)
    want3 = _solo_sampled(params, ids3, 8, seed=2, temperature=2.0,
                          top_p=0.9)
    eng = _engine(params, mesh=mesh)
    try:
        assert eng._kv_sharding is not None   # kv_heads=2 % model=2 == 0
        h1 = eng.submit(_embeds(params, ids1), max_new_tokens=12)
        time.sleep(0.3)        # h2/h3 join/queue against a running decode
        h2 = eng.submit(_embeds(params, ids2), max_new_tokens=8)
        h3 = eng.submit(_embeds(params, ids3), max_new_tokens=8,
                        temperature=2.0, top_p=0.9, seed=2)
        assert h1.result(timeout=300) == want1
        assert h2.result(timeout=300) == want2
        assert h3.result(timeout=300) == want3
    finally:
        eng.shutdown()


def test_tp_engine_chunked_admission(params):
    """Chunked admission prefill (prefill_extend pieces between decode
    chunks) stays exact on the mesh too — same 6-request construction as
    test_chunked_admission_matches_solo (slots free mid-flight, so solo
    admissions with active rows deterministically take the chunked path)."""
    from tspo_tpu.parallel import create_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(data=4, model=2)
    rng = np.random.default_rng(5)
    reqs = []
    lock = threading.Lock()
    eng = _engine(params, slots=2, chunk=3, device_lock=lock,
                  prefill_chunk=16, mesh=mesh)
    try:
        with lock:
            for i in range(6):
                ids = rng.integers(0, CFG.vocab_size - 1,
                                   size=rng.integers(18, S_MAX)).tolist()
                max_new = int(rng.integers(6, 16))
                want = _solo(params, ids, max_new)
                h = eng.submit(_embeds(params, ids), max_new_tokens=max_new)
                reqs.append((want, h))
        for i, (want, h) in enumerate(reqs):
            assert h.result(timeout=300) == want, f"request {i} diverged"
        assert eng.stats["admitted"] == 6
        assert eng.stats["chunked_admissions"] >= 1
    finally:
        eng.shutdown()


def test_service_tp_engine_matches_unsharded(tiny_video):
    """ScoringService(mesh=...): /v1/answer through the TP engine (backbone
    params sharded with the full-model specs, engine KV on the mesh) returns
    exactly the unsharded service's answer."""
    from tspo_tpu.models.llava_video import llava_video_param_shardings
    from tspo_tpu.parallel import create_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    kw = dict(continuous_slots=2, continuous_chunk=4,
              continuous_max_prompt=256, continuous_decode_slots=16)
    bb = _tiny_llava()
    svc = _tiny_service(bb, **kw)
    try:
        want = svc.answer(video_path=tiny_video, question="what?",
                          sample_num=4, max_new_tokens=6)["answer"]
    finally:
        svc._engine.shutdown()
    mesh = create_mesh(data=4, model=2)
    bb_tp = _tiny_llava()
    bb_tp.params = jax.device_put(
        bb_tp.params, llava_video_param_shardings(bb_tp.params, mesh))
    svc_tp = _tiny_service(bb_tp, mesh=mesh, **kw)
    try:
        got = svc_tp.answer(video_path=tiny_video, question="what?",
                            sample_num=4, max_new_tokens=6)["answer"]
        assert svc_tp.stats["engine"] == 1     # rode the TP engine
    finally:
        svc_tp._engine.shutdown()
    assert got == want


def test_answer_n_choices_engine_exact(tiny_video):
    """/v1/answer with n>1: all n choices ride the engine off ONE prompt
    assembly; with an explicit seed, choice i is bit-exact vs a solo
    sampled generate at seed+i (the documented derivation), and an equal
    request reproduces.  n>1 at temperature 0 is rejected loudly."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=4, continuous_chunk=4,
                        continuous_max_prompt=512,
                        continuous_decode_slots=16)
    try:
        r = svc.answer(video_path=tiny_video, question="what?",
                       sample_num=4, max_new_tokens=6, temperature=2.0,
                       top_p=0.9, seed=40, n=3)
        assert r["answer"] == r["answers"][0] and len(r["answers"]) == 3
        assert svc.stats["engine"] == 3
        # per-choice determinism: solo sampled generate at seed+i matches
        sel, _, _ = svc._select_frames(tiny_video, "what?", 4, "topk", None)
        for i, ans in enumerate(r["answers"]):
            with svc._device_lock:
                want = bb.generate(sel, "what?", max_new_tokens=6,
                                   temperature=2.0, top_p=0.9, seed=40 + i)
            assert ans == want, f"choice {i} diverged from solo seed+{i}"
        # n>1 needs sampling
        with pytest.raises(ValueError):
            svc.answer(video_path=tiny_video, question="what?",
                       sample_num=4, n=2)
    finally:
        svc._engine.shutdown()


def test_answer_n_choices_solo_fallback(tiny_video):
    """n>1 without the engine: n solo sampled decodes, same per-choice
    seed derivation."""
    bb = _tiny_llava()
    svc = _tiny_service(bb)
    r = svc.answer(video_path=tiny_video, question="what?", sample_num=4,
                   max_new_tokens=6, temperature=2.0, top_p=0.9, seed=7,
                   n=2)
    assert len(r["answers"]) == 2
    sel, _, _ = svc._select_frames(tiny_video, "what?", 4, "topk", None)
    for i, ans in enumerate(r["answers"]):
        want = bb.generate(sel, "what?", max_new_tokens=6, temperature=2.0,
                           top_p=0.9, seed=7 + i)
        assert ans == want


def test_chat_completion_n_choices(tiny_video):
    """OpenAI n>1 on /v1/chat/completions: n indexed sampled choices;
    unseeded choices draw fresh (distinct at temp 3); streaming with n>1
    is rejected before headers."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=4, continuous_chunk=4,
                        continuous_max_prompt=512,
                        continuous_decode_slots=16)
    try:
        out = svc.chat_completion(
            messages=[{"role": "user", "content": "hello"}],
            temperature=3.0, max_tokens=8, n=3)
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        texts = [c["message"]["content"] for c in out["choices"]]
        assert len(set(texts)) > 1          # fresh unseeded draws
        with pytest.raises(ValueError):
            list(svc.chat_completion_stream(
                messages=[{"role": "user", "content": "hi"}],
                temperature=1.0, n=2))
        with pytest.raises(ValueError):
            svc.chat_completion(
                messages=[{"role": "user", "content": "hi"}], n=2)
    finally:
        svc._engine.shutdown()


# ---------------------------------------------------------------------------
# Cross-request video prefix-KV cache (vLLM APC analog)
# ---------------------------------------------------------------------------


def test_prefix_cache_matches_stateless_and_hits(tiny_video):
    """Independent questions on one video through the prefix cache: every
    answer is token-exact vs the stateless generate path, the second
    same-selection request is a prefix HIT, and history from request 1
    never leaks into request 2 (the divergence path truncates it)."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, prefix_cache=2)
    r1 = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                    max_new_tokens=5)
    r2 = svc.answer(video_path=tiny_video, question="And then what?",
                    sample_num=4, max_new_tokens=5)
    assert svc.stats["prefix_hits"] == (1 if r1["frame_indices"] ==
                                        r2["frame_indices"] else 0)
    # token-exact vs stateless: same question through a no-cache service
    bb2 = _tiny_llava()
    svc2 = _tiny_service(bb2)
    w1 = svc2.answer(video_path=tiny_video, question="What?", sample_num=4,
                     max_new_tokens=5)
    w2 = svc2.answer(video_path=tiny_video, question="And then what?",
                     sample_num=4, max_new_tokens=5)
    assert r1["answer"] == w1["answer"]
    assert r2["answer"] == w2["answer"]


def test_prefix_cache_key_and_eviction(tiny_video):
    """Different frame selections are different keys (no false sharing);
    the LRU evicts beyond capacity."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, prefix_cache=1)
    svc.answer(video_path=tiny_video, question="q", sample_num=4,
               max_new_tokens=3)
    # different sample_num -> different selection -> different key, and
    # capacity 1 evicts the first entry
    svc.answer(video_path=tiny_video, question="q", sample_num=2,
               max_new_tokens=3)
    assert svc.stats["prefix_hits"] == 0
    assert len(svc._prefix_states) == 1
    # the original selection was evicted: asking again is a miss
    svc.answer(video_path=tiny_video, question="q", sample_num=4,
               max_new_tokens=3)
    assert svc.stats["prefix_hits"] == 0


def test_prefix_cache_sampled_and_sessions_bypass(tiny_video):
    """temperature>0 and session requests never touch the prefix cache
    (sampling has no prefix-KV variant; sessions keep their own states)."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, prefix_cache=2)
    svc.answer(video_path=tiny_video, question="q", sample_num=4,
               max_new_tokens=3, temperature=1.5, seed=1)
    assert len(svc._prefix_states) == 0
    svc.answer(video_path=tiny_video, question="q", sample_num=4,
               max_new_tokens=3, session_id="s1")
    assert len(svc._prefix_states) == 0


def test_prefix_cache_stream_matches_plain(tiny_video):
    """Streaming /v1/answer through the prefix cache: deltas concatenate to
    the non-stream prefix-cached answer, warm streams are prefix HITS, and
    an abandoned stream leaves the state clean (next request full-prefills
    and still answers exactly)."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, prefix_cache=2)
    want = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                      max_new_tokens=5)["answer"]
    events = list(svc.answer_stream(video_path=tiny_video, question="What?",
                                    sample_num=4, max_new_tokens=5))
    text = "".join(e["delta"] for e in events if "delta" in e)
    assert text == want
    assert svc.stats["prefix_hits"] == 1
    # abandon a stream mid-answer: state must recover cleanly
    g = svc.answer_stream(video_path=tiny_video, question="Other question?",
                          sample_num=4, max_new_tokens=5)
    next(g)                       # frames event
    g.close()
    r = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                   max_new_tokens=5)
    assert r["answer"] == want


# ---------------------------------------------------------------------------
# Engine-level prefix caching (vLLM APC)
# ---------------------------------------------------------------------------


def test_engine_prefix_miss_and_hit_exact(params):
    """Prefix pool: a miss prefills fully and stores the first-P KV; a hit
    imports it and prefills only the suffix.  Both are token-exact vs solo
    greedy_decode."""
    rng = np.random.default_rng(11)
    pre = rng.integers(0, CFG.vocab_size - 1, size=14).tolist()
    ids_a = pre + rng.integers(0, CFG.vocab_size - 1, size=6).tolist()
    ids_b = pre + rng.integers(0, CFG.vocab_size - 1, size=9).tolist()
    want_a = _solo(params, ids_a, 8)
    want_b = _solo(params, ids_b, 8)
    eng = _engine(params, prefix_slots=2)
    try:
        ha = eng.submit(_embeds(params, ids_a), max_new_tokens=8,
                        prefix_key="vid1", prefix_len=14)
        assert ha.result(timeout=120) == want_a
        assert eng.stats["prefix_stores"] == 1
        hb = eng.submit(_embeds(params, ids_b), max_new_tokens=8,
                        prefix_key="vid1", prefix_len=14)
        assert hb.result(timeout=120) == want_b
        assert eng.stats["prefix_hits"] == 1
    finally:
        eng.shutdown()


def test_engine_prefix_hit_joins_running_decode(params):
    """A prefix hit admitted while another tenant decodes: the suffix
    prefills between decode chunks, both rows stay exact, and the running
    tenant is unperturbed."""
    rng = np.random.default_rng(12)
    pre = rng.integers(0, CFG.vocab_size - 1, size=12).tolist()
    ids_long = rng.integers(0, CFG.vocab_size - 1, size=10).tolist()
    ids_hit = pre + rng.integers(0, CFG.vocab_size - 1, size=7).tolist()
    want_long = _solo(params, ids_long, D_SLOTS - 1)
    want_pre = _solo(params, pre + [5], 6)
    want_hit = _solo(params, ids_hit, 6)
    eng = _engine(params, prefix_slots=1)
    try:
        # warm the pool while idle
        h0 = eng.submit(_embeds(params, pre + [5]), max_new_tokens=6,
                        prefix_key="v", prefix_len=12)
        assert h0.result(timeout=120) == want_pre
        hl = eng.submit(_embeds(params, ids_long),
                        max_new_tokens=D_SLOTS - 1)
        time.sleep(0.3)             # hit arrives mid-decode
        hh = eng.submit(_embeds(params, ids_hit), max_new_tokens=6,
                        prefix_key="v", prefix_len=12)
        assert hh.result(timeout=120) == want_hit
        assert hl.result(timeout=120) == want_long
        assert eng.stats["prefix_hits"] == 1
    finally:
        eng.shutdown()


def test_engine_prefix_len_mismatch_and_eviction(params):
    """A prefix_len differing from the stored entry is a miss (re-stored);
    the LRU evicts beyond prefix_slots; invalid submits are rejected."""
    rng = np.random.default_rng(13)
    ids = rng.integers(0, CFG.vocab_size - 1, size=20).tolist()
    want = _solo(params, ids, 6)
    eng = _engine(params, prefix_slots=1)
    try:
        eng.submit(_embeds(params, ids), max_new_tokens=6,
                   prefix_key="a", prefix_len=10).result(timeout=120)
        # same key, different len: miss + overwrite
        h = eng.submit(_embeds(params, ids), max_new_tokens=6,
                       prefix_key="a", prefix_len=12)
        assert h.result(timeout=120) == want
        assert eng.stats["prefix_hits"] == 0
        assert eng.stats["prefix_stores"] == 2
        assert eng._prefix_pool["a"]["len"] == 12
        # capacity 1: a second key evicts the first
        eng.submit(_embeds(params, ids), max_new_tokens=6,
                   prefix_key="b", prefix_len=10).result(timeout=120)
        assert list(eng._prefix_pool) == ["b"]
        # invalid: bad len, disabled engine (sampled + mrope prefix
        # requests are SUPPORTED — see the sampled/mrope hit tests)
        with pytest.raises(ValueError, match="prefix_len"):
            eng.submit(_embeds(params, ids), max_new_tokens=4,
                       prefix_key="x", prefix_len=len(ids))
    finally:
        eng.shutdown()
    eng2 = _engine(params)
    try:
        with pytest.raises(ValueError, match="prefix_slots"):
            eng2.submit(_embeds(params, ids), max_new_tokens=4,
                        prefix_key="x", prefix_len=5)
    finally:
        eng2.shutdown()


def test_service_engine_prefix_cache(tiny_video):
    """--prefix-cache + --continuous: the pool lives inside the engine —
    the second same-selection question is an engine prefix HIT, answers
    are exact vs the engine-only service, and streaming rides it too."""
    kw = dict(continuous_slots=2, continuous_chunk=4,
              continuous_max_prompt=512, continuous_decode_slots=16)
    bb_ref = _tiny_llava()
    svc_ref = _tiny_service(bb_ref, **kw)
    try:
        w1 = svc_ref.answer(video_path=tiny_video, question="What?",
                            sample_num=4, max_new_tokens=5)["answer"]
        w2 = svc_ref.answer(video_path=tiny_video, question="And then?",
                            sample_num=4, max_new_tokens=5)["answer"]
    finally:
        svc_ref._engine.shutdown()
    bb = _tiny_llava()
    svc = _tiny_service(bb, prefix_cache=2, **kw)
    try:
        r1 = svc.answer(video_path=tiny_video, question="What?",
                        sample_num=4, max_new_tokens=5)
        r2 = svc.answer(video_path=tiny_video, question="And then?",
                        sample_num=4, max_new_tokens=5)
        assert r1["answer"] == w1 and r2["answer"] == w2
        assert svc._engine.stats["prefix_stores"] >= 1
        same_sel = r1["frame_indices"] == r2["frame_indices"]
        assert svc._engine.stats["prefix_hits"] == (1 if same_sel else 0)
        assert len(svc._prefix_states) == 0      # solo pool untouched
        # streaming hit
        events = list(svc.answer_stream(video_path=tiny_video,
                                        question="What?", sample_num=4,
                                        max_new_tokens=5))
        text = "".join(e["delta"] for e in events if "delta" in e)
        assert text == w1
        assert svc._engine.stats["prefix_hits"] >= 1
    finally:
        svc._engine.shutdown()


def test_qwen25vl_sessions_and_prefix_cache(tiny_video):
    """The qwen2_5_vl backbone now supports conversation state: /v1/answer
    chat sessions and the solo prefix cache both work on it — session
    round 2 rides prefix-KV, and independent prefix-cached questions are
    exact vs the stateless service."""
    from tspo_tpu.models.qwen25vl import Qwen25VLConfig, Qwen25VLModel

    def mk():
        cfg = Qwen25VLConfig.tiny()
        return Qwen25VLModel.random_init(
            0, cfg, dtype=jnp.float32,
            encode=lambda s: [ord(c) % cfg.lm.vocab_size for c in s],
            decode=lambda toks: " ".join(str(t) for t in toks),
            max_new_tokens=5)

    svc_ref = _tiny_service(mk())
    w1 = svc_ref.answer(video_path=tiny_video, question="What?",
                        sample_num=4, max_new_tokens=4)["answer"]
    w2 = svc_ref.answer(video_path=tiny_video, question="And then?",
                        sample_num=4, max_new_tokens=4)["answer"]
    # prefix cache
    svc = _tiny_service(mk(), prefix_cache=2)
    r1 = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                    max_new_tokens=4)
    r2 = svc.answer(video_path=tiny_video, question="And then?",
                    sample_num=4, max_new_tokens=4)
    assert r1["answer"] == w1 and r2["answer"] == w2
    # chat session: two rounds, second rides the conversation state
    svc_s = _tiny_service(mk())
    s1 = svc_s.answer(video_path=tiny_video, question="What?", sample_num=4,
                      max_new_tokens=4, session_id="q")
    s2 = svc_s.answer(video_path=tiny_video, question="And then?",
                      sample_num=4, max_new_tokens=4, session_id="q")
    assert s1["round"] == 1 and s2["round"] == 2
    # exactness of stateful rounds vs stateless is pinned per-backbone in
    # test_qwen25vl; here pin that the service accepts conversations on
    # this backbone and produces non-empty answers
    assert isinstance(s2["answer"], str) and s2["answer"]


def test_qwen25vl_engine_prefix_cache_exact():
    """Engine prefix caching on the mrope backbone: the stored video-block
    KV (rotations baked in) transfers to a second question; both answers
    equal solo generate()."""
    from tspo_tpu.models.qwen25vl import Qwen25VLConfig, Qwen25VLModel
    cfg = Qwen25VLConfig.tiny()
    enc = lambda s: [ord(c) % cfg.lm.vocab_size for c in s]        # noqa: E731
    dec = lambda toks: " ".join(str(t) for t in toks)              # noqa: E731
    model = Qwen25VLModel.random_init(0, cfg, dtype=jnp.float32,
                                      encode=enc, decode=dec)
    frames = np.random.default_rng(3).integers(
        0, 256, (4, 56, 56, 3), dtype=np.uint8)
    eng = ContinuousEngine(model.params["lm"], cfg.lm, slots=1, chunk=3,
                           max_prompt=256, decode_slots=16,
                           prompt_bucket=64, dtype=jnp.float32,
                           prefix_slots=1)
    try:
        for i, q in enumerate(["what?", "how many objects are there?"]):
            want = model.generate(frames, q, max_new_tokens=6)
            kw = model.prepare_engine_request(frames, q, max_new_tokens=6)
            assert kw.get("prefix_len"), "mrope prefix_len missing"
            h = eng.submit(kw.pop("embeds"), prefix_key="v", **kw)
            got = dec([t for t in h.result(timeout=120)
                       if t != cfg.lm.eos_token_id])
            assert got == want, f"question {i} diverged"
        assert eng.stats["prefix_stores"] == 1
        assert eng.stats["prefix_hits"] == 1
    finally:
        eng.shutdown()


def test_tp_engine_prefix_cache_compose(params):
    """Prefix pool + TP mesh compose: a warm hit on the sharded engine is
    bit-exact vs solo unsharded decode."""
    from tspo_tpu.parallel import create_mesh
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh(data=4, model=2)
    rng = np.random.default_rng(21)
    pre = rng.integers(0, CFG.vocab_size - 1, size=12).tolist()
    ids_a = pre + rng.integers(0, CFG.vocab_size - 1, size=5).tolist()
    ids_b = pre + rng.integers(0, CFG.vocab_size - 1, size=8).tolist()
    want_a, want_b = _solo(params, ids_a, 6), _solo(params, ids_b, 6)
    eng = _engine(params, mesh=mesh, prefix_slots=1)
    try:
        ha = eng.submit(_embeds(params, ids_a), max_new_tokens=6,
                        prefix_key="v", prefix_len=12)
        assert ha.result(timeout=300) == want_a
        hb = eng.submit(_embeds(params, ids_b), max_new_tokens=6,
                        prefix_key="v", prefix_len=12)
        assert hb.result(timeout=300) == want_b
        assert eng.stats["prefix_hits"] == 1
    finally:
        eng.shutdown()


def test_shared_prompt_admission_exact(params):
    """n tenants of the SAME embeds object admit off ONE B=1 prefill
    (shared_admissions): greedy tenant == solo greedy, sampled tenants ==
    their solo sample_decode chains, seeds distinct."""
    rng = np.random.default_rng(30)
    ids = rng.integers(0, CFG.vocab_size - 1, size=11).tolist()
    emb = _embeds(params, ids)
    want_g = _solo(params, ids, 8)
    want_s5 = _solo_sampled(params, ids, 8, seed=5, temperature=2.0,
                            top_p=0.9)
    want_s6 = _solo_sampled(params, ids, 8, seed=6, temperature=2.0,
                            top_p=0.9)
    lock = threading.Lock()
    eng = _engine(params, slots=4, device_lock=lock)
    try:
        with lock:
            # decoy parks the worker inside its own admission at the
            # device lock, so the shared run queues as one pass
            decoy = eng.submit(_embeds(params, [1, 2, 3]),
                               max_new_tokens=2)
            time.sleep(0.2)
            hg = eng.submit(emb, max_new_tokens=8)
            h5 = eng.submit(emb, max_new_tokens=8, temperature=2.0,
                            top_p=0.9, seed=5)
            h6 = eng.submit(emb, max_new_tokens=8, temperature=2.0,
                            top_p=0.9, seed=6)
        decoy.result(timeout=120)
        assert hg.result(timeout=120) == want_g
        assert h5.result(timeout=120) == want_s5
        assert h6.result(timeout=120) == want_s6
        assert eng.stats["shared_admissions"] == 1
        assert eng.stats["admit_batches"] == 2    # decoy + the shared run
    finally:
        eng.shutdown()


def test_shared_run_splits_from_mixed_group(params):
    """A queue mixing a shared run with a DIFFERENT prompt: the run admits
    shared, the rest admits as a normal ragged group, all exact."""
    rng = np.random.default_rng(31)
    ids_a = rng.integers(0, CFG.vocab_size - 1, size=9).tolist()
    ids_b = rng.integers(0, CFG.vocab_size - 1, size=14).tolist()
    emb_a = _embeds(params, ids_a)
    want_a = _solo(params, ids_a, 6)
    want_a5 = _solo_sampled(params, ids_a, 6, seed=7, temperature=2.0,
                            top_p=1.0)
    want_b = _solo(params, ids_b, 6)
    lock = threading.Lock()
    eng = _engine(params, slots=4, device_lock=lock)
    try:
        with lock:
            decoy = eng.submit(_embeds(params, [1, 2, 3]),
                               max_new_tokens=2)
            time.sleep(0.2)    # worker parks inside the decoy admission
            ha = eng.submit(emb_a, max_new_tokens=6)
            h5 = eng.submit(emb_a, max_new_tokens=6, temperature=2.0,
                            seed=7)
            hb = eng.submit(_embeds(params, ids_b), max_new_tokens=6)
        decoy.result(timeout=120)
        assert ha.result(timeout=120) == want_a
        assert h5.result(timeout=120) == want_a5
        assert hb.result(timeout=120) == want_b
        assert eng.stats["shared_admissions"] == 1
        assert eng.stats["admitted"] == 4
    finally:
        eng.shutdown()


def test_service_n_choices_shared_prefill(tiny_video):
    """/v1/answer n=3: all choices ride ONE shared prefill (the engine's
    shared_admissions) and per-seed exactness still holds."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, continuous_slots=4, continuous_chunk=4,
                        continuous_max_prompt=512,
                        continuous_decode_slots=16)
    try:
        r = svc.answer(video_path=tiny_video, question="what?",
                       sample_num=4, max_new_tokens=6, temperature=2.0,
                       top_p=0.9, seed=40, n=3)
        assert len(r["answers"]) == 3
        assert svc._engine.stats["shared_admissions"] >= 1
        sel, _, _ = svc._select_frames(tiny_video, "what?", 4, "topk", None)
        for i, ans in enumerate(r["answers"]):
            with svc._device_lock:
                want = bb.generate(sel, "what?", max_new_tokens=6,
                                   temperature=2.0, top_p=0.9, seed=40 + i)
            assert ans == want, f"choice {i} diverged"
    finally:
        svc._engine.shutdown()


def test_group_token_cap_splits_ragged_groups(params):
    """max_group_tokens: an oversize ragged group splits into sub-batches
    (a B=4 group of ~12k prompts OOMs a 16 GB chip mid-prefill — measured,
    bench_shared_admission) while identical-prompt runs stay exempt; all
    outputs remain exact."""
    rng = np.random.default_rng(40)
    prompts = [rng.integers(0, CFG.vocab_size - 1, size=20).tolist()
               for _ in range(4)]
    wants = [_solo(params, ids, 5) for ids in prompts]
    lock = threading.Lock()
    # bucket = S_MAX = 32 padded tokens per row; cap 64 -> max 2 rows/group
    eng = _engine(params, slots=4, device_lock=lock,
                  max_group_tokens=2 * S_MAX)
    try:
        with lock:
            decoy = eng.submit(_embeds(params, [1, 2, 3]),
                               max_new_tokens=2)
            time.sleep(0.2)
            hs = [eng.submit(_embeds(params, ids), max_new_tokens=5)
                  for ids in prompts]
        decoy.result(timeout=120)
        for h, want in zip(hs, wants):
            assert h.result(timeout=120) == want
        # 4 rows at cap 2/group: at least 3 admission batches (decoy + 2)
        assert eng.stats["admit_batches"] >= 3
        # identical-prompt runs are exempt from the cap
        emb = _embeds(params, prompts[0])
        want_s = [_solo_sampled(params, prompts[0], 5, seed=50 + i,
                                temperature=2.0, top_p=1.0)
                  for i in range(4)]
        reqs = eng.submit_group(
            emb, [{"max_new_tokens": 5, "temperature": 2.0,
                   "seed": 50 + i} for i in range(4)])
        for r, want in zip(reqs, want_s):
            assert r.result(timeout=120) == want
        assert eng.stats["shared_admissions"] == 1
    finally:
        eng.shutdown()


def test_engine_prefix_hit_sampled_exact(params):
    """Sampled prefix-cache hits: a greedy miss stores the video-prefix
    KV, then a SAMPLED request on the same key prefills only its suffix
    and draws its first token with the solo chain's key-split order —
    bit-exact vs solo sample_decode at the same seed, reruns reproduce."""
    rng = np.random.default_rng(50)
    pre = rng.integers(0, CFG.vocab_size - 1, size=14).tolist()
    ids_g = pre + rng.integers(0, CFG.vocab_size - 1, size=5).tolist()
    ids_s = pre + rng.integers(0, CFG.vocab_size - 1, size=8).tolist()
    want_g = _solo(params, ids_g, 6)
    want_s = _solo_sampled(params, ids_s, 8, seed=9, temperature=2.0,
                           top_p=0.9)
    eng = _engine(params, prefix_slots=1)
    try:
        hg = eng.submit(_embeds(params, ids_g), max_new_tokens=6,
                        prefix_key="v", prefix_len=14)
        assert hg.result(timeout=120) == want_g
        for _ in range(2):         # hit + equal-seed rerun
            hs = eng.submit(_embeds(params, ids_s), max_new_tokens=8,
                            temperature=2.0, top_p=0.9, seed=9,
                            prefix_key="v", prefix_len=14)
            assert hs.result(timeout=120) == want_s
        assert eng.stats["prefix_hits"] == 2
        # sampled MISS also stores (prefill KV is sampling-independent)
        eng2 = _engine(params, prefix_slots=1)
        try:
            h1 = eng2.submit(_embeds(params, ids_s), max_new_tokens=8,
                             temperature=2.0, top_p=0.9, seed=9,
                             prefix_key="v2", prefix_len=14)
            assert h1.result(timeout=120) == want_s
            assert eng2.stats["prefix_stores"] == 1
            h2 = eng2.submit(_embeds(params, ids_g), max_new_tokens=6,
                             prefix_key="v2", prefix_len=14)
            assert h2.result(timeout=120) == want_g
            assert eng2.stats["prefix_hits"] == 1
        finally:
            eng2.shutdown()
    finally:
        eng.shutdown()


def test_service_sampled_prefix_hit(tiny_video):
    """Warm video + sampled /v1/answer (n=1): the request rides the
    engine's prefix pool (suffix prefill + sampled draw) and equals the
    solo sampled generate at the same seed."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, prefix_cache=2, continuous_slots=2,
                        continuous_chunk=4, continuous_max_prompt=512,
                        continuous_decode_slots=16)
    try:
        svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                   max_new_tokens=5)                  # greedy miss + store
        r = svc.answer(video_path=tiny_video, question="What?",
                       sample_num=4, max_new_tokens=5, temperature=2.0,
                       top_p=0.9, seed=3)
        assert svc._engine.stats["prefix_hits"] >= 1
        sel, _, _ = svc._select_frames(tiny_video, "What?", 4, "topk", None)
        with svc._device_lock:
            want = bb.generate(sel, "What?", max_new_tokens=5,
                               temperature=2.0, top_p=0.9, seed=3)
        assert r["answer"] == want
    finally:
        svc._engine.shutdown()


def test_warm_n_choices_use_shared_admission(tiny_video):
    """n>1 always routes through shared admission, warm video or not —
    measured better than n serialized prefix-hit admissions
    (bench_shared_admission round-5 note).  Per-seed exactness holds and
    the prefix pool still serves single requests."""
    bb = _tiny_llava()
    svc = _tiny_service(bb, prefix_cache=2, continuous_slots=4,
                        continuous_chunk=4, continuous_max_prompt=512,
                        continuous_decode_slots=16)
    try:
        svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                   max_new_tokens=5)                  # greedy miss + store
        r = svc.answer(video_path=tiny_video, question="What?",
                       sample_num=4, max_new_tokens=5, temperature=2.0,
                       top_p=0.9, seed=60, n=3)
        assert len(r["answers"]) == 3
        assert svc._engine.stats["shared_admissions"] == 1
        sel, _, _ = svc._select_frames(tiny_video, "What?", 4, "topk", None)
        for i, ans in enumerate(r["answers"]):
            with svc._device_lock:
                want = bb.generate(sel, "What?", max_new_tokens=5,
                                   temperature=2.0, top_p=0.9, seed=60 + i)
            assert ans == want, f"choice {i} diverged"
        # a single sampled follow-up still rides the prefix pool
        hits0 = svc._engine.stats["prefix_hits"]
        svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                   max_new_tokens=5, temperature=2.0, seed=70)
        assert svc._engine.stats["prefix_hits"] == hits0 + 1
    finally:
        svc._engine.shutdown()


def test_chat_completion_logprobs(tiny_video):
    """OpenAI logprobs on chat completions: per-token entries sum to the
    model's own loglikelihood of the answer, top_logprobs rank and contain
    the chosen token when it's the argmax, and the guards fire (streaming,
    top_logprobs without logprobs, out-of-range k)."""
    bb = _tiny_llava()
    svc = _tiny_service(bb)
    out = svc.chat_completion(
        messages=[{"role": "user", "content": "hello there"}],
        max_tokens=5, logprobs=True, top_logprobs=3)
    ch = out["choices"][0]
    text = ch["message"]["content"]
    content = ch["logprobs"]["content"]
    assert len(content) == len(bb.encode(text))
    total = sum(e["logprob"] for e in content)
    prompt = svc._chat_prompt([{"role": "user", "content": "hello there"}])
    want_ll, want_greedy = bb.loglikelihood(None, prompt, text)
    assert abs(total - want_ll) < 1e-3
    for e in content:
        tops = e["top_logprobs"]
        assert len(tops) == 3
        assert tops[0]["logprob"] >= tops[-1]["logprob"]
        # greedy decode: every chosen token is the argmax -> rank-1 top
        if want_greedy:
            assert abs(tops[0]["logprob"] - e["logprob"]) < 1e-6
    # sampled + seeded reproduces including logprobs
    s1 = svc.chat_completion(messages=[{"role": "user", "content": "hi"}],
                             max_tokens=4, temperature=2.0, seed=8,
                             logprobs=True)
    s2 = svc.chat_completion(messages=[{"role": "user", "content": "hi"}],
                             max_tokens=4, temperature=2.0, seed=8,
                             logprobs=True)
    assert s1["choices"][0]["logprobs"] == s2["choices"][0]["logprobs"]
    # guards
    with pytest.raises(ValueError, match="requires logprobs"):
        svc.chat_completion(messages=[{"role": "user", "content": "x"}],
                            top_logprobs=2)
    with pytest.raises(ValueError, match="0, 20"):
        svc.chat_completion(messages=[{"role": "user", "content": "x"}],
                            logprobs=True, top_logprobs=21)
    with pytest.raises(ValueError, match="logprobs"):
        list(svc.chat_completion_stream(
            messages=[{"role": "user", "content": "x"}], logprobs=True))


def test_chat_completion_logprobs_history_template(tiny_video):
    """Chat HISTORY logprobs score against the conversation-template
    render (the exact prompt that generated the answer): the total equals
    loglikelihood over render_chat_prompt, and greedy answers are rank-1
    at every position."""
    bb = _tiny_llava()
    svc = _tiny_service(bb)
    msgs = [{"role": "user", "content": "first"},
            {"role": "assistant", "content": "one"},
            {"role": "user", "content": "second"}]
    out = svc.chat_completion(messages=msgs, max_tokens=4, logprobs=True,
                              top_logprobs=1)
    ch = out["choices"][0]
    text = ch["message"]["content"]
    turns = svc._chat_turns(msgs)
    want_ll, _ = bb.loglikelihood(
        None, "", text, prompt=bb.render_chat_prompt(turns))
    total = sum(e["logprob"] for e in ch["logprobs"]["content"])
    assert abs(total - want_ll) < 1e-3
    # (argmax-everywhere can't be asserted with the stub tokenizer: its
    # decode/encode doesn't round-trip token ids; real BPE does)
    assert all(e["top_logprobs"][0]["logprob"] >= e["logprob"] - 1e-6
               for e in ch["logprobs"]["content"])


def test_answer_logprobs(tiny_video):
    """/v1/answer logprobs: the per-answer total equals the backbone's own
    loglikelihood under the full vision prompt, n>1 returns one entry per
    choice, and streaming/session guards fire."""
    bb = _tiny_llava()
    svc = _tiny_service(bb)
    r = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                   max_new_tokens=5, logprobs=True)
    assert len(r["logprobs"]) == 1
    sel, _, _ = svc._select_frames(tiny_video, "What?", 4, "topk", None)
    want_ll, _ = bb.loglikelihood(sel, "What?", r["answer"])
    assert abs(r["logprobs"][0]["total"] - want_ll) < 1e-3
    assert len(r["logprobs"][0]["tokens"]) == len(bb.encode(r["answer"]))
    rs = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                    max_new_tokens=5, temperature=2.0, seed=4, n=2,
                    logprobs=True)
    assert len(rs["logprobs"]) == 2
    for ans, lp in zip(rs["answers"], rs["logprobs"]):
        w, _ = bb.loglikelihood(sel, "What?", ans)
        assert abs(lp["total"] - w) < 1e-3
    with pytest.raises(ValueError, match="logprobs"):
        list(svc.answer_stream(video_path=tiny_video, question="q",
                               sample_num=4, logprobs=True))
    with pytest.raises(ValueError, match="session"):
        svc.answer(video_path=tiny_video, question="q", sample_num=4,
                   session_id="s", logprobs=True)


def test_stop_sequences(tiny_video):
    """OpenAI stop semantics: the answer truncates at the FIRST occurrence
    of any stop sequence (sequence excluded), on /v1/answer and chat
    completions; invalid stop lists and streaming/session combos are
    rejected loudly."""
    bb = _tiny_llava()
    svc = _tiny_service(bb)
    full = svc.answer(video_path=tiny_video, question="What?",
                      sample_num=4, max_new_tokens=5)["answer"]
    assert " " in full                       # stub decode joins with spaces
    head = full.split(" ")[0]
    r = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                   max_new_tokens=5, stop=" ")
    assert r["answer"] == head
    r2 = svc.answer(video_path=tiny_video, question="What?", sample_num=4,
                    max_new_tokens=5, stop=["zzz", " " + full.split(" ")[1]])
    assert r2["answer"] == head
    out = svc.chat_completion(messages=[{"role": "user", "content": "hi"}],
                              max_tokens=5, stop=" ")
    assert " " not in out["choices"][0]["message"]["content"]
    with pytest.raises(ValueError, match="at most 4"):
        svc.answer(video_path=tiny_video, question="q", sample_num=4,
                   stop=["a", "b", "c", "d", "e"])
    with pytest.raises(ValueError, match="non-empty"):
        svc.answer(video_path=tiny_video, question="q", sample_num=4,
                   stop=[""])
    with pytest.raises(ValueError, match="stop"):
        list(svc.answer_stream(video_path=tiny_video, question="q",
                               sample_num=4, stop=" "))
    with pytest.raises(ValueError, match="stop"):
        svc.answer(video_path=tiny_video, question="q", sample_num=4,
                   session_id="s", stop=" ")
    with pytest.raises(ValueError, match="stop"):
        list(svc.chat_completion_stream(
            messages=[{"role": "user", "content": "x"}], stop=" "))
