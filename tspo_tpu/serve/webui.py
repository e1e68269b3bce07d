"""Browser demo page for the scoring/QA service — the serving-UI capability
the reference gets from gradio (`llava/serve/gradio_web_server.py`, C44).

Gradio is not in this image and pulls a heavy dependency tree; this is a
single static page (no build step, no external assets — works with zero
egress) served by the same ThreadingHTTPServer at ``GET /``, talking to the
existing JSON API (`/v1/score`, `/v1/answer`, `/healthz`).  The page submits
a server-side video path + question, renders the answer, the selected frame
indices and latency, and polls service health."""

from __future__ import annotations

INDEX_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>TSPO-TPU demo</title>
<style>
  body { font-family: system-ui, sans-serif; max-width: 720px;
         margin: 2rem auto; padding: 0 1rem; color: #1a1a1a; }
  h1 { font-size: 1.3rem; }
  label { display: block; margin-top: .8rem; font-weight: 600; }
  input, textarea, select { width: 100%; padding: .45rem;
         font: inherit; box-sizing: border-box; }
  button { margin-top: 1rem; padding: .5rem 1.4rem; font: inherit;
         cursor: pointer; }
  pre { background: #f4f4f4; padding: .8rem; overflow-x: auto;
        white-space: pre-wrap; }
  #health { float: right; font-size: .85rem; color: #666; }
  .answer { font-size: 1.1rem; background: #eef6ee; padding: .8rem;
        margin-top: 1rem; border-left: 4px solid #4a4; }
</style>
</head>
<body>
<span id="health">checking...</span>
<h1>TSPO temporal-agent demo</h1>
<p>Scores 1-fps candidate frames against the question with the temporal
agent, then answers from the selected keyframes.</p>
<label>Video path (on the server)</label>
<input id="video" placeholder="/data/videos/example.mp4">
<label>Question</label>
<textarea id="question" rows="2"
 placeholder="What happens after the man opens the door?"></textarea>
<label>Mode</label>
<select id="mode">
  <option value="answer">answer (selection + backbone QA)</option>
  <option value="score">score (frame selection only)</option>
</select>
<label>Frame budget</label>
<input id="sample_num" type="number" value="64" min="1" max="512">
<label>Temperature (0 = greedy; sampled answers draw fresh each run)</label>
<input id="temperature" type="number" value="0" min="0" max="2" step="0.1">
<label style="font-weight:400">
  <input id="chat" type="checkbox" style="width:auto"> keep conversation
  (follow-up questions reuse the video + context via a server session)
</label>
<button id="go">Run</button>
<button id="reset" style="display:none">New conversation</button>
<div id="transcript"></div>
<div id="out"></div>
<script>
async function health() {
  try {
    const r = await fetch('/healthz');
    const j = await r.json();
    document.getElementById('health').textContent =
      j.ok ? `healthy · ${j.requests ?? 0} requests` : 'unhealthy';
  } catch (e) {
    document.getElementById('health').textContent = 'unreachable';
  }
}
health(); setInterval(health, 5000);

let sessionId = null;
const resetBtn = document.getElementById('reset');
const chatBox = document.getElementById('chat');
chatBox.onchange = () => {
  resetBtn.style.display = chatBox.checked ? '' : 'none';
};
resetBtn.onclick = () => {
  sessionId = null;
  document.getElementById('transcript').replaceChildren();
};

document.getElementById('go').onclick = async () => {
  const out = document.getElementById('out');
  // build nodes with textContent — model output and error strings are
  // untrusted and must never reach innerHTML
  const show = (nodes) => { out.replaceChildren(...nodes); };
  const pre = (text) => {
    const el = document.createElement('pre');
    el.textContent = text;
    return el;
  };
  show([pre('running…')]);
  const mode = document.getElementById('mode').value;
  const body = {
    video_path: document.getElementById('video').value,
    question: document.getElementById('question').value,
    sample_num: parseInt(document.getElementById('sample_num').value),
  };
  // sampling rides /v1/answer (engine per-row sampling or solo sampled
  // stream); conversation rounds are prefix-KV greedy — the server
  // rejects that combination, so the UI just omits temperature there
  const temp = parseFloat(document.getElementById('temperature').value);
  if (mode === 'answer' && !chatBox.checked && temp > 0)
    body.temperature = temp;
  // shared SSE pump: POST, then dispatch each `data:` json to onMsg
  const sse = async (payload, onMsg) => {
    const r = await fetch('/v1/answer', {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({...payload, stream: true})});
    if (!r.ok) { const j = await r.json();
                 show([pre('error: ' + j.error)]); return false; }
    const reader = r.body.getReader();
    const dec = new TextDecoder();
    let buf = '';
    for (;;) {
      const {value, done} = await reader.read();
      if (done) break;
      buf += dec.decode(value, {stream: true});
      let i;
      while ((i = buf.indexOf('\\n\\n')) >= 0) {
        const line = buf.slice(0, i); buf = buf.slice(i + 2);
        if (!line.startsWith('data: ') || line === 'data: [DONE]') continue;
        onMsg(JSON.parse(line.slice(6)));
      }
    }
    return true;
  };
  try {
    if (mode === 'answer' && chatBox.checked) {
      // conversation: /v1/answer SSE with a session_id — the answer
      // streams into the transcript as it decodes; turns accumulate
      sessionId = sessionId ||
        'web-' + Math.random().toString(36).slice(2);
      const t = document.getElementById('transcript');
      const q = pre('Q: ' + body.question);
      const a = document.createElement('div');
      a.className = 'answer';
      const meta = pre('');
      show([meta]);
      let appended = false;
      const ok = await sse({...body, session_id: sessionId}, (m) => {
        if (m.delta !== undefined) {
          if (!appended) { t.append(q, a); appended = true; }
          a.textContent += m.delta;
        } else if (m.event === 'done') {
          q.textContent = 'Q' + m.round + ': ' + body.question;
          meta.textContent += 'round ' + m.round + ' · ' +
            m.latency_s + 's\\n';
        } else if (m.event === 'frames') {
          if (m.restarted) meta.textContent +=
            'note: previous context was evicted — conversation restarted\\n';
          meta.textContent += 'frames [' +
            m.frame_indices.slice(0, 8).join(', ') +
            (m.frame_indices.length > 8 ? ', …]' : ']') + '\\n';
        } else if (m.error !== undefined) {
          meta.textContent += 'error: ' + m.error + '\\n';
        }
      });
      if (ok) document.getElementById('question').value = '';
      return;
    }
    if (mode === 'answer') {        // stream: text appears as it decodes
      const div = document.createElement('div');
      div.className = 'answer';
      const meta = pre('');
      show([div, meta]);
      await sse(body, (m) => {
        if (m.delta !== undefined) div.textContent += m.delta;
        else meta.textContent += JSON.stringify(m) + '\\n';
      });
      return;
    }
    const r = await fetch('/v1/' + mode, {
      method: 'POST', headers: {'Content-Type': 'application/json'},
      body: JSON.stringify(body)});
    const j = await r.json();
    if (!r.ok) { show([pre('error: ' + j.error)]); return; }
    const nodes = [];
    if (j.answer !== undefined) {
      const div = document.createElement('div');
      div.className = 'answer';
      div.textContent = j.answer;
      nodes.push(div);
    }
    nodes.push(pre(JSON.stringify(j, null, 2)));
    show(nodes);
  } catch (e) { show([pre('request failed: ' + e)]); }
};
</script>
</body>
</html>
"""


def serve_index(handler) -> None:
    """Write the demo page on a BaseHTTPRequestHandler."""
    body = INDEX_HTML.encode()
    handler.send_response(200)
    handler.send_header("Content-Type", "text/html; charset=utf-8")
    handler.send_header("Content-Length", str(len(body)))
    handler.end_headers()
    handler.wfile.write(body)
