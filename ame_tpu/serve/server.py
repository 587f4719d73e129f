"""HTTP serving layer satisfying the reference web client's implied contract
(templates/index.html — SURVEY.md C19, §3.5):

    POST /generate-upload-url {filename, contentType}
        -> {"url": <signed upload url>, "gcs_uri": <opaque input id>}
    PUT  <signed upload url>           (raw file body)
    POST /start-processing {gcs_uri, settings}
        -> {"processed_filename": ..., "image_filename": ...}
    GET  /status?audio_filename=..&image_filename=..
        -> {"status": "processing"} | {"status": "done",
            "download_url": ..., "art_url": ...} | {"status": "error", ...}
    GET  /download/<name>, /art/<name>, /  (web UI)

Implementation: Python stdlib ThreadingHTTPServer; local-disk object store
standing in for GCS signed URLs; one background worker thread drains a job
queue (jobs run the same ``process_audio`` orchestration as the desktop
path, so the serving tier inherits the degrade-and-continue error policy).
Jobs are asynchronous exactly like the implied App Engine backend — the
client polls /status (index.html:291-334 behavior).
"""

from __future__ import annotations

import json
import logging
import os
import queue
import tempfile
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

log = logging.getLogger("ame_tpu.serve")


class JobStore:
    """Job/state registry + on-disk blobs.

    Jobs persist to ``jobs.json`` in the workdir (the manifest pattern of
    parallel/fleet): a restarted server reloads job states, and jobs that
    were mid-flight when the process died are REQUEUED (their uploads are
    still on disk) — the serving tier's checkpoint/resume story
    (SURVEY.md §5.4, where the reference has none)."""

    def __init__(self, workdir: str):
        self.workdir = workdir
        self.uploads = os.path.join(workdir, "uploads")
        self.outputs = os.path.join(workdir, "outputs")
        os.makedirs(self.uploads, exist_ok=True)
        os.makedirs(self.outputs, exist_ok=True)
        self.lock = threading.Lock()
        self.jobs: dict[str, dict] = {}   # output name -> state
        self.queue: "queue.Queue[tuple[str, dict]]" = queue.Queue()
        self._jobs_path = os.path.join(workdir, "jobs.json")
        self._load_jobs()

    def _load_jobs(self) -> None:
        if not os.path.exists(self._jobs_path):
            return
        try:
            with open(self._jobs_path) as f:
                self.jobs = json.load(f)
        except Exception:
            log.exception("could not load persisted jobs; starting fresh")
            return
        for name, state in self.jobs.items():
            if state.get("status") == "processing":
                settings = state.get("settings")
                if settings and os.path.exists(
                        settings.get("input_file", "")):
                    log.info("requeueing interrupted job %s", name)
                    state["messages"] = state.get("messages", [])
                    self.queue.put((name, settings))
                else:
                    state["status"] = "error"
                    state["error"] = "interrupted; input lost"

    def persist(self) -> None:
        tmp = self._jobs_path + ".tmp"
        with self.lock:
            snapshot = json.dumps(self.jobs, default=str, indent=1)
        with open(tmp, "w") as f:
            f.write(snapshot)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._jobs_path)

    def new_upload(self, filename: str) -> tuple[str, str]:
        blob_id = f"{uuid.uuid4().hex}_{os.path.basename(filename)}"
        return f"/upload/{blob_id}", f"local://{blob_id}"

    def upload_path(self, blob_id: str) -> str:
        return os.path.join(self.uploads, os.path.basename(blob_id))

    def output_path(self, name: str) -> str:
        return os.path.join(self.outputs, os.path.basename(name))


def _worker_loop(store: JobStore):
    from ame_tpu.api import process_audio

    while True:
        job_name, settings = store.queue.get()
        state = store.jobs[job_name]

        def status_cb(msg):
            state["messages"].append(msg)
            if msg.startswith("Error:"):
                state["status"] = "error"
                state["error"] = msg

        def progress_cb(cur, total):
            state["progress"] = [cur, total]

        def art_cb(path):
            if path:
                state["art_file"] = path

        def tag_cb(msg):
            state["tag"] = msg

        try:
            process_audio(settings, status_cb, progress_cb, art_cb, tag_cb)
            if state["status"] != "error":
                state["status"] = "done"
        except Exception as e:  # pragma: no cover — process_audio catches
            log.exception("job failed")
            state["status"] = "error"
            state["error"] = str(e)
        finally:
            store.persist()
            store.queue.task_done()


class Handler(BaseHTTPRequestHandler):
    store: JobStore = None  # set by run_server
    protocol_version = "HTTP/1.1"

    # -- helpers ------------------------------------------------------------
    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(length) if length else b""

    def log_message(self, fmt, *args):
        log.info("%s %s", self.address_string(), fmt % args)

    # -- routes ---------------------------------------------------------------
    def do_POST(self):
        path = urlparse(self.path).path
        if path == "/generate-upload-url":
            try:
                req = json.loads(self._read_body() or b"{}")
                filename = req.get("filename") or "upload.wav"
                url, uri = self.store.new_upload(filename)
                self._json(200, {"url": url, "gcs_uri": uri})
            except Exception as e:
                self._json(400, {"error": str(e)})
        elif path == "/start-processing":
            try:
                req = json.loads(self._read_body() or b"{}")
                uri = req.get("gcs_uri", "")
                settings = dict(req.get("settings") or {})
                blob_id = uri.split("://", 1)[-1]
                input_path = self.store.upload_path(blob_id)
                if not os.path.exists(input_path):
                    self._json(404, {"error": f"no upload for {uri}"})
                    return
                stem = os.path.splitext(os.path.basename(blob_id))[0]
                out_name = f"{stem}_mastered.wav"
                art_name = f"{stem}_mastered_art.png"
                settings["input_file"] = input_path
                settings["output_file"] = self.store.output_path(out_name)
                with self.store.lock:
                    self.store.jobs[out_name] = {
                        "status": "processing", "messages": [],
                        "progress": [0, 1], "tag": "", "art_file": None,
                        "settings": settings,
                    }
                self.store.persist()
                self.store.queue.put((out_name, settings))
                self._json(200, {"processed_filename": out_name,
                                 "image_filename": art_name})
            except Exception as e:
                log.exception("start-processing failed")
                self._json(400, {"error": str(e)})
        else:
            self._json(404, {"error": "not found"})

    def do_PUT(self):
        path = urlparse(self.path).path
        if path.startswith("/upload/"):
            blob_id = path[len("/upload/"):]
            data = self._read_body()
            with open(self.store.upload_path(blob_id), "wb") as f:
                f.write(data)
            self._json(200, {"ok": True, "bytes": len(data)})
        else:
            self._json(404, {"error": "not found"})

    def do_GET(self):
        parsed = urlparse(self.path)
        path = parsed.path
        if path == "/status":
            q = parse_qs(parsed.query)
            name = (q.get("audio_filename") or [""])[0]
            job = self.store.jobs.get(os.path.basename(name))
            if job is None:
                self._json(404, {"status": "error",
                                 "error": "unknown job"})
                return
            if job["status"] == "done":
                resp = {"status": "done",
                        "download_url": f"/download/{os.path.basename(name)}",
                        "progress": job["progress"],
                        "tag": job.get("tag", "")}
                if job.get("art_file"):
                    resp["art_url"] = (
                        f"/art/{os.path.basename(job['art_file'])}")
                self._json(200, resp)
            elif job["status"] == "error":
                self._json(200, {"status": "error",
                                 "error": job.get("error", "unknown")})
            else:
                self._json(200, {"status": "processing",
                                 "progress": job["progress"]})
        elif path.startswith("/download/") or path.startswith("/art/"):
            name = os.path.basename(path)
            fp = self.store.output_path(name)
            if not os.path.exists(fp):
                self._json(404, {"error": "not found"})
                return
            ctype = ("audio/wav" if name.endswith(".wav") else
                     "audio/mpeg" if name.endswith(".mp3") else
                     "image/png" if name.endswith(".png") else
                     "application/octet-stream")
            with open(fp, "rb") as f:
                data = f.read()
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        elif path in ("/", "/index.html"):
            page = _web_ui().encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(page)))
            self.end_headers()
            self.wfile.write(page)
        elif path == "/healthz":
            self._json(200, {"ok": True})
        else:
            self._json(404, {"error": "not found"})


def _web_ui() -> str:
    """Minimal single-page client speaking the same endpoint contract as the
    reference's web UI (own markup — the flow is upload-url -> PUT ->
    start-processing -> poll status, index.html:249-334)."""
    return """<!doctype html>
<html><head><meta charset="utf-8"><title>ame_tpu mastering</title>
<style>
 body{font-family:system-ui;margin:2rem auto;max-width:640px;color:#ddd;background:#191b1f}
 fieldset{border:1px solid #333;margin-bottom:1rem} label{display:block;margin:.4rem 0}
 input[type=range]{width:260px;vertical-align:middle}
 #log{white-space:pre-wrap;background:#111;padding:.6rem;font-size:.8rem;min-height:6rem}
 button{padding:.5rem 1.2rem}
</style></head><body>
<h1>ame_tpu mastering service</h1>
<fieldset><legend>Track</legend><input type="file" id="file"></fieldset>
<fieldset><legend>Settings</legend>
 <label>Bass (dB) <input type="range" id="bass_boost" min="-6" max="6" step="0.5" value="0"></label>
 <label>Mid cut (dB) <input type="range" id="mid_cut" min="0" max="6" step="0.5" value="0"></label>
 <label>Presence (dB) <input type="range" id="presence_boost" min="-6" max="6" step="0.5" value="0"></label>
 <label>Treble (dB) <input type="range" id="treble_boost" min="-6" max="6" step="0.5" value="0"></label>
 <label>Analog character (%) <input type="range" id="analog_character" min="0" max="100" step="1" value="0"></label>
 <label>Stereo width <input type="range" id="width" min="0" max="2" step="0.1" value="1"></label>
 <label>Target LUFS <input type="range" id="lufs" min="-20" max="-6" step="0.5" value="-14"></label>
</fieldset>
<button id="go">Master it</button>
<h3>Log</h3><div id="log"></div>
<p id="result"></p>
<script>
const log = m => document.getElementById('log').textContent += m + "\\n";
document.getElementById('go').onclick = async () => {
  const f = document.getElementById('file').files[0];
  if (!f) { log('pick a file first'); return; }
  const settings = {};
  for (const id of ['bass_boost','mid_cut','presence_boost','treble_boost',
                    'analog_character','width','lufs'])
    settings[id] = parseFloat(document.getElementById(id).value);
  log('requesting upload URL…');
  let r = await fetch('/generate-upload-url', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body: JSON.stringify({filename: f.name, contentType: f.type})});
  const {url, gcs_uri} = await r.json();
  log('uploading…');
  await fetch(url, {method:'PUT', body: f});
  log('starting job…');
  r = await fetch('/start-processing', {method:'POST',
    headers:{'Content-Type':'application/json'},
    body: JSON.stringify({gcs_uri, settings})});
  const {processed_filename, image_filename} = await r.json();
  let failures = 0;
  const poll = async () => {
    try {
      const s = await (await fetch(`/status?audio_filename=${processed_filename}&image_filename=${image_filename}`)).json();
      if (s.status === 'done') {
        log('done');
        document.getElementById('result').innerHTML =
          `<a href="${s.download_url}">download master</a>` +
          (s.art_url ? ` · <a href="${s.art_url}">cover art</a>` : '');
        return;
      }
      if (s.status === 'error') { log('error: ' + s.error); return; }
      log(`processing ${s.progress[0]}/${s.progress[1]}…`);
    } catch (e) {
      if (++failures > 5) { log('giving up'); return; }
    }
    setTimeout(poll, 2000);
  };
  poll();
};
</script></body></html>"""


def make_server(host: str = "127.0.0.1", port: int = 8080,
                workdir: str | None = None):
    """Build (server, store) without blocking — used by tests."""
    workdir = workdir or tempfile.mkdtemp(prefix="ame_tpu_serve_")
    store = JobStore(workdir)
    worker = threading.Thread(target=_worker_loop, args=(store,), daemon=True)
    worker.start()
    handler = type("BoundHandler", (Handler,), {"store": store})
    server = ThreadingHTTPServer((host, port), handler)
    return server, store


def run_server(host: str = "127.0.0.1", port: int = 8080,
               workdir: str | None = None):
    server, store = make_server(host, port, workdir)
    log.info("serving on http://%s:%d (workdir %s)", host, port,
             store.workdir)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
