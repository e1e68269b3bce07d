"""LLM-judge subsystem (SURVEY.md C35): prompt building, parsing, providers,
factory — including a live loopback HTTP server exercising the
OpenAI-compatible wire path end to end."""

import http.server
import json
import threading

import pytest

from tspo_tpu.eval.llm_judge import (
    DummyJudgeProvider,
    JudgeConfig,
    LocalBackboneProvider,
    OpenAICompatProvider,
    build_binary_prompt,
    build_comparative_prompt,
    build_correctness_prompt,
    create_provider,
    parse_binary,
    parse_comparative,
    parse_json_blob,
    parse_score,
    register_provider,
    JudgeProvider,
)


def test_binary_prompt_formats():
    p = build_binary_prompt("Q?", "blue", "I think blue", "0/1")
    assert "output 1 for fully correct" in p
    assert "Q?" in p and "blue" in p and "I think blue" in p
    p2 = build_binary_prompt("Q?", "blue", "red", "yes/no")
    assert "output Yes for fully correct" in p2
    # custom prompt takes over entirely, with both pred and prediction keys
    p3 = build_binary_prompt("Q?", "a", "b", custom_prompt="{question}|{pred}")
    assert p3 == "Q?|b"


def test_correctness_prompt():
    p = build_correctness_prompt("1+1?", "2", "two", "yes/no")
    assert 'Return only "Yes"' in p and "two" in p


def test_comparative_prompt_context_section():
    p = build_comparative_prompt("Q", "r1", "r2", context="ctx",
                                 score_range=(1, 10))
    assert "[Context]\nctx" in p and "scores from 1 to 10" in p
    p2 = build_comparative_prompt("Q", "r1", "r2")
    assert "[Context]" not in p2


def test_parse_binary():
    assert parse_binary("1") == 1
    assert parse_binary("Score: 1") == 1
    assert parse_binary("0") == 0
    # reference quirk preserved: any '1' substring counts (utils.py:57-60)
    assert parse_binary("10") == 1
    assert parse_binary("yes", "yes/no") == 1
    assert parse_binary("Yes, correct.", "yes/no") == 1
    assert parse_binary("no", "yes/no") == 0


def test_parse_score_and_comparative():
    assert parse_score("I give it 7.5/10", (1, 10)) == 7.5
    assert parse_score("garbage", (1, 10)) == 1.0
    assert parse_score("99", (1, 10)) == 10.0          # clamped
    assert parse_comparative("8 6\nExplanation") == (8.0, 6.0)
    assert parse_comparative("8, 6") == (8.0, 6.0)
    assert parse_comparative("no scores") == (-1.0, -1.0)


def test_parse_json_blob():
    assert parse_json_blob('text {"a": 1} tail') == {"a": 1}
    assert parse_json_blob("nothing") == {}


def test_dummy_provider_binary():
    judge = DummyJudgeProvider(JudgeConfig(model_name="dummy"))
    res = judge.evaluate_binary("Q?", "blue", "blue")
    assert res.success and res.parsed == 1 and res.model_used == "dummy"


def test_local_backbone_provider():
    class EchoBackbone:
        def generate(self, frames, prompt):
            return "Yes" if "blue" in prompt else "No"

    judge = LocalBackboneProvider(EchoBackbone(),
                                  JudgeConfig(model_name="local",
                                              output_format="yes/no"))
    assert judge.evaluate_binary("Q?", "blue", "blue").parsed == 1
    assert judge.evaluate_binary("Q?", "red", "green").parsed == 0


def test_rubric_parsing():
    class RubricBackbone:
        def generate(self, frames, prompt):
            return 'Here: {"clarity": 2, "accuracy": 1}'

    judge = LocalBackboneProvider(RubricBackbone())
    res = judge.evaluate_with_rubric("Q", "pred", {"clarity": "1-3"})
    assert res.parsed == {"clarity": 2, "accuracy": 1}


class _ChatHandler(http.server.BaseHTTPRequestHandler):
    fail_first = {"n": 0}

    def do_POST(self):
        assert self.path.endswith("/chat/completions")
        n = int(self.headers["Content-Length"])
        req = json.loads(self.rfile.read(n))
        if _ChatHandler.fail_first["n"] > 0:
            _ChatHandler.fail_first["n"] -= 1
            self.send_response(500)
            self.end_headers()
            return
        pred = req["messages"][-1]["content"]
        content = "1" if "CORRECT" in pred else "0"
        body = json.dumps({"choices": [{"message": {"content": content}}],
                           "model": req["model"]}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def chat_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _ChatHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


def test_openai_compat_provider_end_to_end(chat_server):
    judge = OpenAICompatProvider(JudgeConfig(model_name="judge-model"),
                                 base_url=chat_server, api_key="k")
    assert judge.is_available()
    res = judge.evaluate_binary("Q?", "x", "CORRECT answer")
    assert res.success and res.parsed == 1
    res0 = judge.evaluate_binary("Q?", "x", "wrong")
    assert res0.parsed == 0


def test_openai_compat_retries_then_succeeds(chat_server):
    _ChatHandler.fail_first["n"] = 2
    judge = OpenAICompatProvider(
        JudgeConfig(model_name="m", num_retries=5, retry_delay=0.0),
        base_url=chat_server, api_key="k")
    res = judge.evaluate_binary("Q?", "x", "CORRECT")
    assert res.success and res.parsed == 1


def test_openai_compat_exhausted_retries_reports_failure():
    judge = OpenAICompatProvider(
        JudgeConfig(model_name="m", num_retries=2, retry_delay=0.0),
        base_url="http://127.0.0.1:1/v1", api_key="k")
    res = judge.evaluate_binary("Q?", "x", "y")
    assert not res.success and res.parsed == 0 and res.error


def test_judge_many_bounded_fanout(chat_server):
    judge = OpenAICompatProvider(JudgeConfig(model_name="m", max_concurrent=4),
                                 base_url=chat_server, api_key="k")
    jobs = [
        (lambda p, i=i: p.evaluate_binary(f"Q{i}", "x",
                                          "CORRECT" if i % 2 == 0 else "no"))
        for i in range(8)
    ]
    out = judge.judge_many(jobs)
    assert [r.parsed for r in out] == [1, 0] * 4


def test_factory_and_registration():
    assert isinstance(create_provider("dummy"), DummyJudgeProvider)
    with pytest.raises(ValueError):
        create_provider("nope")

    class Custom(JudgeProvider):
        def complete(self, messages):
            return "1"

    register_provider("custom", Custom)
    assert isinstance(create_provider("custom"), Custom)
    with pytest.raises(ValueError):
        register_provider("bad", int)
