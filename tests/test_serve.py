"""Scoring-service tests: live HTTP round trips against a tiny scorer."""

import json
import threading
import urllib.request

import numpy as np
import jax.numpy as jnp
import pytest

from tspo_tpu.configs import CLIPConfig, SelectorConfig
from tspo_tpu.models.tspo_model import build_random_scorer
from tspo_tpu.serve.server import ScoringService, create_server

cv2 = pytest.importorskip("cv2")

CLIP_CFG = CLIPConfig.tiny()
SEL_CFG = SelectorConfig(dim=CLIP_CFG.text.projection_dim, num_heads=4)


def _tokenize(problem: str):
    ids = np.full((1, 8), 3, np.int32)
    ids[0, -1] = CLIP_CFG.text.eos_token_id
    return ids, np.ones((1, 8), np.int32)


class StubBackbone:
    def generate(self, frames, question, max_new_tokens=None):
        return "A"


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    path = str(root / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(120):
        w.write(np.full((48, 48, 3), (i * 4) % 255, np.uint8))
    w.release()
    scorer = build_random_scorer(seed=0, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG,
                                 dtype=jnp.float32, tokenize=_tokenize,
                                 batch_frames=32, frame_buckets=(64, 128))
    service = ScoringService(scorer=scorer, backbone=StubBackbone(),
                             max_candidates=256)
    srv = create_server(service, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", path
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(url, data=json.dumps(payload).encode(),
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    base, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
        assert json.loads(r.read())["ok"] is True


def test_score_endpoint(server):
    base, video = server
    status, out = _post(base + "/v1/score",
                        {"video_path": video, "question": "what?",
                         "sample_num": 8, "return_scores": True})
    assert status == 200
    assert len(out["frame_indices"]) == 8
    assert out["frame_indices"] == sorted(out["frame_indices"])
    assert out["num_candidates"] == 60  # 120 frames at 2fps -> 60 candidates
    assert len(out["scores"]) == 60


def test_answer_endpoint(server):
    base, video = server
    status, out = _post(base + "/v1/answer",
                        {"video_path": video, "question": "what?",
                         "sample_num": 8})
    assert status == 200
    assert out["answer"] == "A"
    assert len(out["frame_indices"]) == 8


def test_openai_chat_completions_endpoint(server):
    """The sglang-launcher replacement: /v1/chat/completions speaks the
    OpenAI chat schema against the loaded backbone's text-only generate."""
    base, _ = server
    status, out = _post(base + "/v1/chat/completions", {
        "model": "local-judge",
        "messages": [{"role": "system", "content": "You are a judge."},
                     {"role": "user", "content": "Score this answer: 1/0"}],
        "max_tokens": 8,
        "temperature": 0.0,           # ignored extras must not 400
    })
    assert status == 200
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"] == {"role": "assistant",
                                            "content": "A"}
    assert out["choices"][0]["finish_reason"] == "stop"
    assert out["model"] == "local-judge"


def test_bad_request(server):
    base, _ = server
    try:
        _post(base + "/v1/score", {"question": "no video"})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_missing_video_is_handled(server):
    base, _ = server
    try:
        _post(base + "/v1/score", {"video_path": "/nope.mp4", "question": "?"})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 500


def test_warmup(server):
    # warmup compiles without touching request stats semantics
    from tspo_tpu.serve.server import ScoringService
    scorer = build_random_scorer(seed=1, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG,
                                 dtype=jnp.float32, tokenize=_tokenize,
                                 batch_frames=16, frame_buckets=(64,))
    svc = ScoringService(scorer=scorer).warmup(hw=(48, 48))
    assert svc.stats["requests"] == 0


def test_answer_microbatching(tmp_path_factory):
    """Concurrent /v1/answer requests inside the batch window decode as ONE
    ragged generate_batch_multi call; answers route back per request."""
    import threading as th
    from tspo_tpu.serve.server import ScoringService

    root = tmp_path_factory.mktemp("mb")
    path = str(root / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(60):
        w.write(np.full((48, 48, 3), (i * 8) % 255, np.uint8))
    w.release()

    class MultiBackbone:
        def __init__(self):
            self.multi_calls = 0
            self.single_calls = 0

        def generate(self, frames, q, max_new_tokens=None):
            self.single_calls += 1
            return "S:" + q

        def generate_batch_multi(self, frame_sets, qs, max_new_tokens=None):
            self.multi_calls += 1
            return ["M:" + q for q in qs]

    scorer = build_random_scorer(seed=0, clip_cfg=CLIP_CFG,
                                 selector_cfg=SEL_CFG, dtype=jnp.float32,
                                 tokenize=_tokenize, batch_frames=32,
                                 frame_buckets=(64, 128))
    # generous window: each request runs device-locked scoring BEFORE it
    # enqueues, and under full-suite CPU load that serializes past a short
    # window (flaky no-batch runs otherwise)
    svc = ScoringService(scorer=scorer, backbone=MultiBackbone(),
                         max_candidates=128, batch_window_s=4.0, max_batch=4)

    results = {}

    def ask(q):
        results[q] = svc.answer(video_path=path, question=q, sample_num=8)

    threads = [th.Thread(target=ask, args=(f"q{i}",)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results["q0"]["answer"] == "M:q0"
    assert results["q2"]["answer"] == "M:q2"
    assert svc.backbone.single_calls == 0
    assert svc.stats["batched"] >= 2      # at least one true batch formed


def test_microbatch_leader_failure_releases_followers(tmp_path_factory):
    """A decode exception must reach EVERY request in the batch instead of
    deadlocking followers (round-3 review finding)."""
    import threading as th
    from tspo_tpu.serve.server import ScoringService

    root = tmp_path_factory.mktemp("mbfail")
    path = str(root / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(40):
        w.write(np.full((48, 48, 3), (i * 8) % 255, np.uint8))
    w.release()

    class FailingBackbone:
        def generate(self, frames, q, max_new_tokens=None):
            return "S"

        def generate_batch_multi(self, frame_sets, qs, max_new_tokens=None):
            raise RuntimeError("HBM OOM")

    scorer = build_random_scorer(seed=0, clip_cfg=CLIP_CFG,
                                 selector_cfg=SEL_CFG, dtype=jnp.float32,
                                 tokenize=_tokenize, batch_frames=32,
                                 frame_buckets=(64, 128))
    svc = ScoringService(scorer=scorer, backbone=FailingBackbone(),
                         max_candidates=128, batch_window_s=0.4, max_batch=4)

    errors = {}

    def ask(q):
        try:
            svc.answer(video_path=path, question=q, sample_num=8)
            errors[q] = None
        except RuntimeError as e:
            errors[q] = str(e)

    threads = [th.Thread(target=ask, args=(f"q{i}",)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not any(t.is_alive() for t in threads), "a follower deadlocked"
    assert all(errors[f"q{i}"] == "HBM OOM" for i in range(3))


def test_microbatch_groups_by_max_new_tokens(tmp_path_factory):
    """Per-request max_new_tokens caps are honored: mixed caps split into
    separate decode groups (round-3 review finding)."""
    import threading as th
    from tspo_tpu.serve.server import ScoringService

    root = tmp_path_factory.mktemp("mbgroup")
    path = str(root / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(40):
        w.write(np.full((48, 48, 3), (i * 8) % 255, np.uint8))
    w.release()

    class RecordingBackbone:
        def __init__(self):
            self.calls = []

        def generate(self, frames, q, max_new_tokens=None):
            return "S"

        def generate_batch_multi(self, frame_sets, qs, max_new_tokens=None):
            self.calls.append((sorted(qs), max_new_tokens))
            return [f"cap={max_new_tokens}" for _ in qs]

    scorer = build_random_scorer(seed=0, clip_cfg=CLIP_CFG,
                                 selector_cfg=SEL_CFG, dtype=jnp.float32,
                                 tokenize=_tokenize, batch_frames=32,
                                 frame_buckets=(64, 128))
    svc = ScoringService(scorer=scorer, backbone=RecordingBackbone(),
                         max_candidates=128, batch_window_s=0.5, max_batch=4)

    results = {}

    def ask(q, cap):
        results[q] = svc.answer(video_path=path, question=q, sample_num=8,
                                max_new_tokens=cap)

    specs = [("a", 8), ("b", 64), ("c", 8)]
    threads = [th.Thread(target=ask, args=s) for s in specs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert results["a"]["answer"] == "cap=8"
    assert results["b"]["answer"] == "cap=64"
    assert results["c"]["answer"] == "cap=8"
    # every decode call is cap-homogeneous (batch formation count is
    # timing-dependent on a loaded host; correctness is the per-answer caps)
    caps = sorted(c for _, c in svc.backbone.calls)
    assert set(caps) == {8, 64} and len(caps) >= 2


def test_web_ui_index(server):
    base, _ = server
    with urllib.request.urlopen(base + "/", timeout=30) as r:
        body = r.read().decode()
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
    # the page drives the real endpoints
    assert "/v1/" in body and "healthz" in body and "TSPO" in body


def test_video_feature_cache(tmp_path):
    """Second question on the same video skips the vision tower (LRU hit)
    and selects the same frames as the cache-off fused path."""
    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(120):
        w.write(np.full((48, 48, 3), (i * 4) % 255, np.uint8))
    w.release()

    def make(cache):
        scorer = build_random_scorer(
            seed=0, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG,
            dtype=jnp.float32, tokenize=_tokenize, batch_frames=32,
            frame_buckets=(64, 128))
        return ScoringService(scorer=scorer, max_candidates=256,
                              video_feature_cache=cache)

    svc = make(2)
    encodes = []
    orig = svc.scorer.encode_frame_features
    svc.scorer.encode_frame_features = \
        lambda f: (encodes.append(len(f)) or orig(f))
    r1 = svc.score(video_path=path, question="q one", sample_num=8)
    r2 = svc.score(video_path=path, question="q two", sample_num=8)
    assert len(encodes) == 1
    assert svc.stats["feature_cache_hits"] == 1
    off = make(0).score(video_path=path, question="q one", sample_num=8)
    assert r1["frame_indices"] == off["frame_indices"]
    assert r2["num_candidates"] == r1["num_candidates"]
    # LRU evicts: two other videos push the first out
    for i in range(2):
        p2 = str(tmp_path / f"o{i}.mp4")
        w = cv2.VideoWriter(p2, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
        for j in range(40):
            w.write(np.full((48, 48, 3), j, np.uint8))
        w.release()
        svc.score(video_path=p2, question="q", sample_num=8)
    assert len(svc._feat_cache) == 2
    svc.score(video_path=path, question="q three", sample_num=8)
    # 1 initial + one per other video + 1 re-encode after eviction
    assert len(encodes) == 4


def test_warm_answer_skips_full_decode(tmp_path):
    """Second /v1/answer on the same video gathers only the selected frames
    (no full 1-fps decode) and returns the same answer + indices."""
    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(120):
        w.write(np.full((48, 48, 3), (i * 4) % 255, np.uint8))
    w.release()
    scorer = build_random_scorer(
        seed=0, clip_cfg=CLIP_CFG, selector_cfg=SEL_CFG, dtype=jnp.float32,
        tokenize=_tokenize, batch_frames=32, frame_buckets=(64, 128))
    svc = ScoringService(scorer=scorer, backbone=StubBackbone(),
                         max_candidates=256, video_feature_cache=2)
    decodes = []
    orig = svc._decode
    svc._decode = lambda p: (decodes.append(p) or orig(p))
    r1 = svc.answer(video_path=path, question="q", sample_num=8)
    n_cold = len(decodes)
    r2 = svc.answer(video_path=path, question="q", sample_num=8)
    assert len(decodes) == n_cold  # warm: no additional full decode
    assert r1["frame_indices"] == r2["frame_indices"]
    assert r1["answer"] == r2["answer"] == "A"
    assert r2["num_candidates"] == r1["num_candidates"]


def test_microbatch_lone_request_uses_speculative_path(tmp_path_factory):
    """With a speculative backbone, a size-1 micro-batch routes through
    generate() (prompt-lookup speculation engaged) instead of the ragged
    batch path."""
    from tspo_tpu.serve.server import ScoringService

    root = tmp_path_factory.mktemp("mbs")
    path = str(root / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(60):
        w.write(np.full((48, 48, 3), (i * 8) % 255, np.uint8))
    w.release()

    class SpecBackbone:
        speculative = True

        def __init__(self):
            self.single_calls = 0
            self.multi_calls = 0

        def generate(self, frames, q, max_new_tokens=None):
            self.single_calls += 1
            return "S:" + q

        def generate_batch_multi(self, frame_sets, qs, max_new_tokens=None):
            self.multi_calls += 1
            return ["M:" + q for q in qs]

    scorer = build_random_scorer(seed=0, clip_cfg=CLIP_CFG,
                                 selector_cfg=SEL_CFG, dtype=jnp.float32,
                                 tokenize=_tokenize, batch_frames=32,
                                 frame_buckets=(64, 128))
    svc = ScoringService(scorer=scorer, backbone=SpecBackbone(),
                         max_candidates=128, batch_window_s=0.05, max_batch=4)
    out = svc.answer(video_path=path, question="solo", sample_num=8)
    assert out["answer"] == "S:solo"
    assert svc.backbone.single_calls == 1
    assert svc.backbone.multi_calls == 0


def _post_sse(url: str, payload: dict):
    req = urllib.request.Request(
        url, json.dumps(payload).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        ctype = resp.headers.get("Content-Type")
        events = []
        for line in resp.read().decode().splitlines():
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    return ctype, events


def test_chat_completions_sse_stream(server):
    """"stream": true yields OpenAI chat.completion.chunk SSE events whose
    joined deltas equal the non-streaming content, ending with [DONE]."""
    base, _ = server
    ctype, events = _post_sse(base + "/v1/chat/completions", {
        "model": "local-judge", "stream": True,
        "messages": [{"role": "user", "content": "Score: 1/0"}],
    })
    assert ctype.startswith("text/event-stream")
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[0]["choices"][0]["delta"] == {"role": "assistant"}
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    assert text == "A"          # == the non-streaming answer


def test_chat_completions_sse_with_generate_stream(tmp_path):
    """A backbone exposing generate_stream gets one SSE chunk PER DELTA."""

    class StreamingBackbone(StubBackbone):
        def generate_stream(self, frames, question, max_new_tokens=None,
                            **kw):
            yield "The answer"
            yield " is"
            yield " A."

    scorer = build_random_scorer(seed=0, clip_cfg=CLIP_CFG,
                                 selector_cfg=SEL_CFG, dtype=jnp.float32,
                                 tokenize=_tokenize, batch_frames=32,
                                 frame_buckets=(64,))
    svc = ScoringService(scorer=scorer, backbone=StreamingBackbone())
    srv = create_server(svc, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ctype, events = _post_sse(
            f"http://127.0.0.1:{srv.server_address[1]}/v1/chat/completions",
            {"stream": True,
             "messages": [{"role": "user", "content": "Q?"}]})
        chunks = [json.loads(e) for e in events[:-1]]
        deltas = [c["choices"][0]["delta"].get("content", "")
                  for c in chunks]
        assert deltas.count("The answer") == 1     # one chunk per delta
        assert "".join(deltas) == "The answer is A."
        assert events[-1] == "[DONE]"
    finally:
        srv.shutdown()


def test_answer_sse_stream(server):
    """/v1/answer with "stream": true: a frames event with the selected
    indices first, then delta events joining to the non-streaming answer,
    then done with latency — ending in [DONE]."""
    base, video = server
    _, events = _post_sse(base + "/v1/answer",
                          {"video_path": video, "question": "what?",
                           "sample_num": 8, "stream": True})
    assert events[-1] == "[DONE]"
    msgs = [json.loads(e) for e in events[:-1]]
    assert msgs[0].get("event") == "frames"
    assert len(msgs[0]["frame_indices"]) == 8
    assert msgs[-1].get("event") == "done" and "latency_s" in msgs[-1]
    text = "".join(m.get("delta", "") for m in msgs)
    assert text == "A"           # == the non-streaming answer


def test_explicit_stream_false_is_not_an_error(server):
    """An explicit "stream": false (the OpenAI convention) must take the
    plain-json branch on BOTH endpoints — answer() has no **_ignored, so a
    leaked stream key used to 400 (review finding)."""
    base, video = server
    status, out = _post(base + "/v1/answer",
                        {"video_path": video, "question": "what?",
                         "sample_num": 8, "stream": False})
    assert status == 200
    assert out["answer"] == "A"
    status, out = _post(base + "/v1/chat/completions", {
        "stream": False,
        "messages": [{"role": "user", "content": "Q?"}]})
    assert status == 200
    assert out["object"] == "chat.completion"


def test_sampling_params_reach_backbone():
    """temperature/top_p/seed pass through chat_completion and answer() to
    the backbone's sampled generate path, bypassing engine/batcher."""
    from tspo_tpu.serve.server import ScoringService

    class SamplingRecorder:
        def __init__(self):
            self.calls = []

        def generate(self, frames, question, max_new_tokens=None,
                     temperature=0.0, top_p=1.0, seed=None):
            self.calls.append({"temperature": temperature, "top_p": top_p,
                               "seed": seed, "max_new": max_new_tokens})
            return f"sampled@{temperature}"

    rec = SamplingRecorder()
    svc = ScoringService(scorer=None, backbone=rec)
    out = svc.chat_completion(
        messages=[{"role": "user", "content": "hi"}],
        temperature=0.7, top_p=0.9, seed=3)
    assert out["choices"][0]["message"]["content"] == "sampled@0.7"
    assert rec.calls[-1] == {"temperature": 0.7, "top_p": 0.9, "seed": 3,
                             "max_new": None}

    # /v1/answer passthrough (selection stubbed out: sampling is decode-side)
    svc._select_frames = lambda *a, **k: (np.zeros((2, 8, 8, 3), np.uint8),
                                          [0, 1], 2)
    out = svc.answer(video_path="v.mp4", question="q?", temperature=1.2,
                     top_p=0.5, seed=11, max_new_tokens=7)
    assert out["answer"] == "sampled@1.2"
    assert rec.calls[-1] == {"temperature": 1.2, "top_p": 0.5, "seed": 11,
                             "max_new": 7}
    # sampled chat sessions are refused loudly, not silently greedy
    with pytest.raises(ValueError, match="temperature"):
        svc.answer(video_path="v.mp4", question="q?", temperature=0.5,
                   session_id="s1")


def test_sampling_never_silently_greedy(server):
    """A temperature>0 request against a backbone WITHOUT sampling support
    errors out instead of answering greedily (silent-degradation guard)."""
    base, _ = server
    try:
        _post(base + "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "temperature": 0.7})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code in (400, 500)


def test_streaming_rejects_sampling_without_support(server):
    """"stream": true + temperature>0 against a backbone whose
    generate_stream can't sample (the stub has none at all) must 400
    loudly on BOTH endpoints — silently streaming a greedy answer for a
    sampled request is the silent-degradation class the non-streaming
    paths reject (advisor round-4 finding).  Backbones WITH sampled
    streaming ride sample_decode_stream instead
    (test_sampled_streaming_end_to_end)."""
    base, video = server
    for url, payload in [
        (base + "/v1/answer",
         {"video_path": video, "question": "q", "sample_num": 8,
          "stream": True, "temperature": 0.7}),
        (base + "/v1/chat/completions",
         {"messages": [{"role": "user", "content": "hi"}],
          "stream": True, "temperature": 0.7, "top_p": 0.9}),
    ]:
        try:
            _post(url, payload)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "temperature" in json.loads(e.read())["error"]


def test_sampled_chat_history_keeps_roles():
    """temperature>0 with assistant turns in the history must NOT flatten
    the dialog role-less: past rounds render as User:/Assistant: blocks
    (the sampled path bypasses generate_multi_round)."""
    from tspo_tpu.serve.server import ScoringService

    class PromptRecorder:
        prompts: list = []

        def generate(self, frames, question, max_new_tokens=None,
                     temperature=0.0, top_p=1.0, seed=None):
            self.prompts.append(question)
            return "ok"

    rec = PromptRecorder()
    svc = ScoringService(scorer=None, backbone=rec)
    out = svc.chat_completion(
        messages=[{"role": "user", "content": "first q"},
                  {"role": "assistant", "content": "first a"},
                  {"role": "user", "content": "second q"}],
        temperature=0.8)
    assert out["choices"][0]["message"]["content"] == "ok"
    prompt = rec.prompts[-1]
    assert "User: first q" in prompt
    assert "Assistant: first a" in prompt
    assert prompt.rstrip().endswith("second q")


def test_sampled_streaming_end_to_end(tmp_path_factory):
    """temperature>0 + stream:true rides the backbone's sampled
    generate_stream (solo, engine bypassed) on BOTH endpoints; a **kwargs
    sink does NOT count as support (signature probe).  Chat histories keep
    role labels on the sampled stream path."""
    root = tmp_path_factory.mktemp("sampled_stream")
    path = str(root / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 48))
    for i in range(60):
        w.write(np.full((48, 48, 3), (i * 4) % 255, np.uint8))
    w.release()

    class SampledStreamBackbone(StubBackbone):
        prompts: list = []

        def generate_stream(self, frames, question, max_new_tokens=None,
                            temperature=0.0, top_p=1.0, seed=None):
            self.prompts.append(question)
            yield f"t={temperature}"
            yield f" p={top_p}"
            yield f" s={seed}"

    scorer = build_random_scorer(seed=0, clip_cfg=CLIP_CFG,
                                 selector_cfg=SEL_CFG, dtype=jnp.float32,
                                 tokenize=_tokenize, batch_frames=32,
                                 frame_buckets=(64,))
    svc = ScoringService(scorer=scorer, backbone=SampledStreamBackbone())
    srv = create_server(svc, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        _, events = _post_sse(base + "/v1/answer",
                              {"video_path": path, "question": "q?",
                               "sample_num": 8, "stream": True,
                               "temperature": 0.8, "top_p": 0.9, "seed": 5})
        msgs = [json.loads(e) for e in events[:-1]]
        assert msgs[0].get("event") == "frames"
        text = "".join(m.get("delta", "") for m in msgs)
        assert text == "t=0.8 p=0.9 s=5"
        assert msgs[-1].get("event") == "done"

        _, events = _post_sse(base + "/v1/chat/completions", {
            "stream": True, "temperature": 0.6,
            "messages": [{"role": "user", "content": "q1"},
                         {"role": "assistant", "content": "a1"},
                         {"role": "user", "content": "q2"}]})
        chunks = [json.loads(e) for e in events[:-1]]
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert text.startswith("t=0.6")
        assert "User: q1" in svc.backbone.prompts[-1]     # roles rendered
        assert "Assistant: a1" in svc.backbone.prompts[-1]
    finally:
        srv.shutdown()

    # a **kwargs-sink generate_stream is NOT sampled-streaming support
    class KwargsSink(StubBackbone):
        def generate_stream(self, frames, question, max_new_tokens=None,
                            **kw):
            yield "greedy"

    svc2 = ScoringService(scorer=None, backbone=KwargsSink())
    with pytest.raises(ValueError, match="temperature"):
        next(svc2.chat_completion_stream(
            messages=[{"role": "user", "content": "hi"}], temperature=0.5))


def test_sampled_chat_rides_multi_round_template():
    """A backbone whose generate_multi_round(_stream) accepts temperature
    gets sampled conversation histories as TURNS (the real template), not
    a flattened prompt — plain and streaming."""
    from tspo_tpu.serve.server import ScoringService

    class MRBackbone(StubBackbone):
        def __init__(self):
            self.mr_calls = []

        def generate(self, frames, question, max_new_tokens=None,
                     temperature=0.0, top_p=1.0, seed=None):
            return "flat"

        def generate_stream(self, frames, question, max_new_tokens=None,
                            temperature=0.0, top_p=1.0, seed=None):
            yield "flat-stream"

        def generate_multi_round(self, frames, turns, max_new_tokens=None,
                                 temperature=0.0, top_p=1.0, seed=None,
                                 state=None):
            self.mr_calls.append(("plain", turns, temperature))
            return "mr"

        def generate_multi_round_stream(self, frames, turns,
                                        max_new_tokens=None,
                                        temperature=0.0, top_p=1.0,
                                        seed=None, state=None, chunk=8):
            self.mr_calls.append(("stream", turns, temperature))
            yield "mr-stream"

    svc = ScoringService(scorer=None, backbone=MRBackbone())
    msgs = [{"role": "user", "content": "q1"},
            {"role": "assistant", "content": "a1"},
            {"role": "user", "content": "q2"}]
    out = svc.chat_completion(messages=msgs, temperature=0.7, seed=2)
    assert out["choices"][0]["message"]["content"] == "mr"
    kind, turns, temp = svc.backbone.mr_calls[-1]
    assert kind == "plain" and temp == 0.7
    assert turns == [("q1", "a1"), ("q2", None)]

    chunks = list(svc.chat_completion_stream(messages=msgs, temperature=0.7))
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks)
    assert text == "mr-stream"
    assert svc.backbone.mr_calls[-1][0] == "stream"
