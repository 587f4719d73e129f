"""Serving-layer tests: the reference web client's endpoint contract
(SURVEY.md §3.5) against a live in-process server."""

import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from ame_tpu.io.wav import write_wav
from ame_tpu.serve.server import make_server
from tests.conftest import make_test_signal


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("serve"))
    srv, store = make_server(host="127.0.0.1", port=0, workdir=workdir)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base
    srv.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(base + path, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    return json.loads(urllib.request.urlopen(req).read())


def _get(base, path):
    return json.loads(urllib.request.urlopen(base + path).read())


def test_full_flow(server, tmp_path):
    x = make_test_signal("noise", 4096, 44100) * 0.2
    p = str(tmp_path / "in.wav")
    write_wav(p, x, 44100)

    r = _post(server, "/generate-upload-url",
              {"filename": "in.wav", "contentType": "audio/wav"})
    assert r["url"].startswith("/upload/")
    assert r["gcs_uri"].startswith("local://")

    with open(p, "rb") as f:
        req = urllib.request.Request(server + r["url"], f.read(),
                                     method="PUT")
        put_resp = json.loads(urllib.request.urlopen(req).read())
    assert put_resp["ok"]

    r2 = _post(server, "/start-processing",
               {"gcs_uri": r["gcs_uri"],
                "settings": {"bass_boost": 1.0, "lufs": None,
                             "create_mp3": False}})
    assert r2["processed_filename"].endswith("_mastered.wav")

    deadline = time.time() + 240
    st = {"status": "processing"}
    while time.time() < deadline and st["status"] == "processing":
        st = _get(server, f"/status?audio_filename="
                          f"{r2['processed_filename']}"
                          f"&image_filename={r2['image_filename']}")
        time.sleep(0.5)
    assert st["status"] == "done", st
    blob = urllib.request.urlopen(server + st["download_url"]).read()
    assert blob[:4] == b"RIFF"


def _rss_bytes():
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096


def test_large_upload_streams_to_disk(server):
    """A 120 MB PUT must not be slurped into RAM: the handler streams 1 MiB
    chunks to the blob file, so process RSS grows far less than the body."""
    r = _post(server, "/generate-upload-url", {"filename": "big.bin"})
    size = 120 * 1024 * 1024

    class Body:
        def __init__(self, n):
            self.left = n
            self.chunk = b"\x5a" * (1 << 20)

        def read(self, n=-1):
            if self.left <= 0:
                return b""
            take = min(len(self.chunk), self.left if n < 0 else n)
            self.left -= take
            return self.chunk[:take]

    rss0 = _rss_bytes()
    req = urllib.request.Request(server + r["url"], Body(size), method="PUT")
    req.add_header("Content-Length", str(size))
    resp = json.loads(urllib.request.urlopen(req).read())
    rss1 = _rss_bytes()
    assert resp == {"ok": True, "bytes": size}
    # slurping would add >=120 MB on the server side (same process here)
    assert rss1 - rss0 < 60 * 1024 * 1024


def test_oversize_upload_rejected(tmp_path_factory):
    workdir = str(tmp_path_factory.mktemp("serve_cap"))
    srv, store = make_server(host="127.0.0.1", port=0, workdir=workdir)
    store.max_upload_bytes = 1024
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        r = _post(base, "/generate-upload-url", {"filename": "big.bin"})
        req = urllib.request.Request(base + r["url"], b"x" * 4096,
                                     method="PUT")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 413
        # nothing written for the rejected blob
        import os
        blob = r["url"].rsplit("/", 1)[-1]
        assert not os.path.exists(store.upload_path(blob))
    finally:
        srv.shutdown()


def test_status_unknown_job(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/status?audio_filename=bogus.wav")
    assert e.value.code == 404


def test_start_without_upload(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/start-processing",
              {"gcs_uri": "local://missing.wav", "settings": {}})
    assert e.value.code == 404


def test_web_ui_served(server):
    html = urllib.request.urlopen(server + "/").read()
    assert b"generate-upload-url" in html
    assert b"start-processing" in html


def test_healthz(server):
    h = _get(server, "/healthz")
    assert h["ok"] is True
    assert "queue_depth" in h


def test_web_ui_reference_parity(server):
    """The served page must expose the reference UI's full control set
    (templates/index.html:188-202 sliders incl. multiband, :39-42 art
    prompt + auto toggle, MP3 toggle, progress bar, art rendering)."""
    html = urllib.request.urlopen(server + "/").read().decode()
    for control in ("bass_boost", "mid_cut", "presence_boost",
                    "treble_boost", "analog_character", "width", "lufs",
                    "low_thresh", "low_ratio", "mid_thresh", "mid_ratio",
                    "high_thresh", "high_ratio", "multiband",
                    "art_prompt", "auto_generate_prompt", "create_mp3"):
        assert f'id="{control}"' in html, control
    assert "<progress" in html
    assert 'id="art"' in html and "art_url" in html
    # poll-failure budget parity (index.html:293-331): the client must
    # tolerate 5 CONSECUTIVE /status failures — counting non-ok responses
    # as failures and resetting the count on each successful poll.
    assert "failures = 0;  // reset on a successful poll" in html
    assert "++failures >= 5" in html
    assert "if (!r.ok) throw" in html


def _run_job(base, tmp_path, name, settings, n=4096):
    x = make_test_signal("noise", n, 44100) * 0.2
    p = str(tmp_path / name)
    write_wav(p, x, 44100)
    r = _post(base, "/generate-upload-url",
              {"filename": name, "contentType": "audio/wav"})
    with open(p, "rb") as f:
        req = urllib.request.Request(base + r["url"], f.read(),
                                     method="PUT")
        urllib.request.urlopen(req).read()
    r2 = _post(base, "/start-processing",
               {"gcs_uri": r["gcs_uri"], "settings": settings})
    return r2["processed_filename"], r2["image_filename"]


def _wait_done(base, audio, image, deadline_s=240):
    deadline = time.time() + deadline_s
    st = {"status": "processing"}
    while time.time() < deadline and st["status"] == "processing":
        st = _get(base, f"/status?audio_filename={audio}"
                        f"&image_filename={image}")
        time.sleep(0.3)
    return st


def test_multiband_and_art_settings_reach_graph(tmp_path):
    """Multiband + art-prompt settings POSTed over HTTP must actually
    drive the job: they are recorded on the job, and the multiband master
    differs audibly from a plain one for the same input."""
    from ame_tpu.serve.server import make_server
    from ame_tpu.io.wav import read_wav

    srv, store = make_server(host="127.0.0.1", port=0,
                             workdir=str(tmp_path / "srv"), workers=2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        mb = {"multiband": True, "low_thresh": -35.0, "low_ratio": 8.0,
              "mid_thresh": -30.0, "mid_ratio": 6.0,
              "high_thresh": -30.0, "high_ratio": 8.0,
              "mode": "compat", "lufs": None, "create_mp3": False,
              "art_prompt": "a serene mountain at dusk",
              "auto_generate_prompt": False}
        a1, i1 = _run_job(base, tmp_path, "one.wav", mb)
        a2, i2 = _run_job(base, tmp_path, "one.wav",
                          {"lufs": None, "mode": "compat",
                           "create_mp3": False})
        st1 = _wait_done(base, a1, i1)
        st2 = _wait_done(base, a2, i2)
        assert st1["status"] == "done", st1
        assert st2["status"] == "done", st2
        job = store.job_snapshot(a1)
        assert job["settings"]["multiband"] is True
        assert job["settings"]["low_ratio"] == 8.0
        assert job["settings"]["art_prompt"] == "a serene mountain at dusk"
        y1, _ = read_wav(store.output_path(a1))
        y2, _ = read_wav(store.output_path(a2))
        assert np.abs(y1 - y2).max() > 1e-4  # compressor engaged
    finally:
        srv.shutdown()


def test_concurrent_jobs_and_status_hammer(tmp_path):
    """Two jobs run on the worker pool while reader threads hammer /status
    and /healthz — no torn state, no exceptions, both jobs finish."""
    from ame_tpu.serve.server import make_server

    srv, store = make_server(host="127.0.0.1", port=0,
                             workdir=str(tmp_path / "srv2"), workers=2)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        jobs = [_run_job(base, tmp_path, f"j{i}.wav",
                         {"lufs": None, "create_mp3": False}, n=16384)
                for i in range(2)]
        errors = []
        stop = threading.Event()

        def hammer():
            while not stop.is_set():
                try:
                    for a, i in jobs:
                        st = _get(base, f"/status?audio_filename={a}"
                                        f"&image_filename={i}")
                        assert st["status"] in ("processing", "done",
                                                "error"), st
                        assert isinstance(st.get("progress", [0, 1]), list)
                    _get(base, "/healthz")
                except Exception as e:  # pragma: no cover
                    errors.append(e)
                    return

        readers = [threading.Thread(target=hammer) for _ in range(4)]
        for t in readers:
            t.start()
        sts = [_wait_done(base, a, i) for a, i in jobs]
        stop.set()
        for t in readers:
            t.join(timeout=10)
        assert not errors, errors
        assert all(s["status"] == "done" for s in sts), sts
    finally:
        srv.shutdown()


def test_job_persistence_and_requeue(tmp_path):
    """Jobs survive a server restart: done stays done; a job that was
    mid-flight (processing) gets requeued and completes."""
    from ame_tpu.serve.server import JobStore, _worker_loop
    import threading as th

    workdir = str(tmp_path / "srv")
    store = JobStore(workdir)
    # a finished job
    store.jobs["done_mastered.wav"] = {"status": "done", "messages": [],
                                       "progress": [5, 5], "tag": "",
                                       "art_file": None}
    # an interrupted job whose input still exists
    x = make_test_signal("noise", 4096, 44100) * 0.2
    up = store.upload_path("abc_in.wav")
    write_wav(up, x, 44100)
    out = store.output_path("in_mastered.wav")
    store.jobs["in_mastered.wav"] = {
        "status": "processing", "messages": [], "progress": [1, 5],
        "tag": "", "art_file": None,
        "settings": {"input_file": up, "output_file": out,
                     "lufs": None, "create_mp3": False}}
    # an interrupted job whose input is GONE
    store.jobs["lost_mastered.wav"] = {
        "status": "processing", "messages": [], "progress": [1, 5],
        "tag": "", "art_file": None,
        "settings": {"input_file": str(tmp_path / "gone.wav"),
                     "output_file": "x"}}
    store.persist()

    # "restart"
    store2 = JobStore(workdir)
    assert store2.jobs["done_mastered.wav"]["status"] == "done"
    assert store2.jobs["lost_mastered.wav"]["status"] == "error"
    assert store2.queue.qsize() == 1  # the recoverable job requeued
    th.Thread(target=_worker_loop, args=(store2,), daemon=True).start()
    deadline = time.time() + 240
    while (time.time() < deadline
           and store2.jobs["in_mastered.wav"]["status"] == "processing"):
        time.sleep(0.3)
    assert store2.jobs["in_mastered.wav"]["status"] == "done"
    import os
    assert os.path.exists(out)


def test_gc_expired_jobs_and_orphan_uploads(tmp_path):
    """TTL GC removes finished jobs + their blobs and orphaned uploads,
    but never queued/processing jobs or fresh files."""
    import os
    from ame_tpu.serve.server import JobStore

    store = JobStore(str(tmp_path), ttl_s=100.0)
    now = time.time()

    def blob(path, content=b"x"):
        with open(path, "wb") as f:
            f.write(content)
        return path

    old_in = blob(os.path.join(store.uploads, "old_in.wav"))
    old_out = blob(store.output_path("old_mastered.wav"))
    old_mp3 = blob(store.output_path("old_mastered.mp3"))
    store.create_job("old_mastered.wav", {
        "status": "done", "created": now - 1000,
        "settings": {"input_file": old_in}})
    live_in = blob(os.path.join(store.uploads, "live_in.wav"))
    live_out = blob(store.output_path("live_mastered.wav"))
    store.create_job("live_mastered.wav", {
        "status": "processing", "created": now - 1000,
        "settings": {"input_file": live_in}})
    fresh_out = blob(store.output_path("fresh_mastered.wav"))
    store.create_job("fresh_mastered.wav", {
        "status": "done", "created": now,
        "settings": {"input_file": ""}})
    orphan = blob(os.path.join(store.uploads, "orphan.wav"))
    os.utime(orphan, (now - 1000, now - 1000))

    assert store.gc_expired(now=now) == 1
    assert store.job_status("old_mastered.wav") is None
    assert not os.path.exists(old_out) and not os.path.exists(old_mp3)
    assert not os.path.exists(old_in)
    assert not os.path.exists(orphan)
    # processing job (even past TTL) and fresh job survive with blobs
    assert store.job_status("live_mastered.wav") == "processing"
    assert os.path.exists(live_out) and os.path.exists(live_in)
    assert store.job_status("fresh_mastered.wav") == "done"
    assert os.path.exists(fresh_out)
    # persisted manifest reflects the GC
    store2 = JobStore(str(tmp_path), ttl_s=100.0)
    assert "old_mastered.wav" not in store2.jobs

    # an expired job whose input is shared with a surviving job must not
    # delete that input
    shared = blob(os.path.join(store.uploads, "shared.wav"))
    store.create_job("a_mastered.wav", {
        "status": "done", "created": now - 1000,
        "settings": {"input_file": shared}})
    store.create_job("b_mastered.wav", {
        "status": "processing", "created": now,
        "settings": {"input_file": shared}})
    assert store.gc_expired(now=now) == 1
    assert os.path.exists(shared)


def test_resolve_input_local_and_gs_fallback(tmp_path):
    import os
    from ame_tpu.serve.server import JobStore

    store = JobStore(str(tmp_path))
    url, uri = store.new_upload("track.wav")
    assert url.startswith("/upload/") and uri.startswith("local://")
    blob_id = uri.split("://", 1)[-1]
    with open(store.upload_path(blob_id), "wb") as f:
        f.write(b"data")
    assert store.resolve_input(uri) == store.upload_path(blob_id)
    # unknown local upload -> None; gs:// without a GCS backend -> None
    assert store.resolve_input("local://missing.wav") is None
    assert store.resolve_input("gs://bucket/uploads/x.wav") is None


def test_gcs_backend_paths_with_stub(tmp_path):
    """resolve_input gs:// fetch, upload-url delegation, and TTL GC bucket
    deletion — exercised through a stub backend (the real GCSBlobBackend
    is a thin wrapper over google-cloud-storage)."""
    import os
    from ame_tpu.serve.server import JobStore

    class StubGCS:
        def __init__(self):
            self.objects = {}
            self.deleted = []

        def new_upload(self, filename):
            uri = f"gs://bkt/uploads/{filename}"
            self.objects[uri] = b"pcm"
            return f"https://signed/{filename}", uri

        def fetch_to(self, uri, dest):
            if uri not in self.objects:
                raise FileNotFoundError(uri)
            with open(dest, "wb") as f:
                f.write(self.objects[uri])
            return True

        def delete(self, uri):
            self.deleted.append(uri)
            self.objects.pop(uri, None)

    store = JobStore(str(tmp_path), ttl_s=100.0)
    store.gcs = StubGCS()

    url, uri = store.new_upload("track.wav")
    assert url.startswith("https://signed/") and uri.startswith("gs://")
    local = store.resolve_input(uri)
    assert local and os.path.exists(local)
    assert store.resolve_input("gs://bkt/uploads/missing.wav") is None

    now = time.time()
    store.create_job("track_mastered.wav", {
        "status": "done", "created": now - 1000,
        "settings": {"input_file": local, "gcs_uri": uri}})
    assert store.gc_expired(now=now) == 1
    assert store.gcs.deleted == [uri]
    assert not os.path.exists(local)


def test_measure_endpoint(server, tmp_path):
    """POST /measure returns the loudnorm pass-1 JSON analog for an
    uploaded blob."""
    x = make_test_signal("noise", 44100 * 4, 44100) * 0.1
    p = str(tmp_path / "m.wav")
    write_wav(p, x, 44100)
    r = _post(server, "/generate-upload-url", {"filename": "m.wav"})
    with open(p, "rb") as f:
        req = urllib.request.Request(server + r["url"], f.read(),
                                     method="PUT")
        urllib.request.urlopen(req).read()
    stats = _post(server, "/measure", {"gcs_uri": r["gcs_uri"]})
    for k in ("input_i", "input_tp", "input_lra", "input_thresh",
              "output_i", "target_offset"):
        assert k in stats, k
    assert -40 < stats["input_i"] < 0
    assert stats["sample_rate"] == 44100
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/measure", {"gcs_uri": "local://nope.wav"})
    assert e.value.code == 404


def test_multi_device_worker_pool(tmp_path, monkeypatch):
    """The serve tier is a multi-chip scheduler: with an 8-device pool the
    default worker count widens to one per device, workers round-robin the
    devices, and concurrent jobs land on DISTINCT chips (recorded on the
    job). AME_TPU_SERVE_DEVICES caps the pool."""
    import jax

    from ame_tpu.serve import server as S

    assert len(jax.local_devices()) == 8  # conftest virtual CPU mesh

    monkeypatch.setenv("AME_TPU_SERVE_DEVICES", "3")
    assert [str(d) for d in S._serve_devices()] == \
        [str(d) for d in jax.local_devices()[:3]]
    monkeypatch.delenv("AME_TPU_SERVE_DEVICES")
    assert len(S._serve_devices()) == 8

    srv, store = S.make_server(host="127.0.0.1", port=0,
                               workdir=str(tmp_path / "srvdev"))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        jobs = [_run_job(base, tmp_path, f"d{i}.wav",
                         {"lufs": None, "create_mp3": False}, n=8192)
                for i in range(4)]
        sts = [_wait_done(base, a, i) for a, i in jobs]
        assert all(s["status"] == "done" for s in sts), sts
        devs = {store.job_snapshot(a).get("device") for a, _ in jobs}
        assert None not in devs, devs           # every job was pinned
        assert len(devs) >= 2, devs             # spread across the pool
    finally:
        srv.shutdown()


def test_shard_time_job(server, tmp_path):
    """A job with settings.shard_time runs the sequence-parallel chain
    over the virtual mesh inside a serve worker."""
    x = make_test_signal("noise", 4096 * 8, 44100) * 0.2
    p = str(tmp_path / "sp.wav")
    write_wav(p, x, 44100)

    r = _post(server, "/generate-upload-url",
              {"filename": "sp.wav", "contentType": "audio/wav"})
    with open(p, "rb") as f:
        req = urllib.request.Request(server + r["url"], f.read(),
                                     method="PUT")
        urllib.request.urlopen(req).read()
    r2 = _post(server, "/start-processing",
               {"gcs_uri": r["gcs_uri"],
                "settings": {"bass_boost": 1.5, "lufs": None,
                             "shard_time": True, "create_mp3": False}})
    deadline = time.time() + 240
    st = {"status": "processing"}
    while time.time() < deadline and st["status"] == "processing":
        st = _get(server, f"/status?audio_filename="
                          f"{r2['processed_filename']}"
                          f"&image_filename={r2['image_filename']}")
        time.sleep(0.5)
    assert st["status"] == "done", st
    blob = urllib.request.urlopen(server + st["download_url"]).read()
    assert blob[:4] == b"RIFF"


def test_metrics_endpoint(server):
    m = _get(server, "/metrics")
    assert "jobs_by_status" in m and "queue_depth" in m
    assert isinstance(m["jobs_by_status"], dict)
    assert m.get("host_rss_mb") is None or m["host_rss_mb"] > 0


def test_auth_and_quota_abuse_controls(tmp_path, monkeypatch):
    """AME_TPU_SERVE_TOKEN gates mutating endpoints (401 without it) and
    AME_TPU_SERVE_QUOTA caps in-flight jobs per client (429 beyond it).
    Both are OFF by default — every other test in this file runs without
    them and must keep passing."""
    monkeypatch.setenv("AME_TPU_SERVE_TOKEN", "s3cret")
    monkeypatch.setenv("AME_TPU_SERVE_QUOTA", "1")
    srv, store = make_server(host="127.0.0.1", port=0,
                             workdir=str(tmp_path / "serve"), workers=1)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # unauthenticated POST -> 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, "/generate-upload-url", {"filename": "x.wav"})
        assert ei.value.code == 401
        # wrong token -> 401
        req = urllib.request.Request(
            base + "/generate-upload-url",
            json.dumps({"filename": "x.wav"}).encode(),
            {"Content-Type": "application/json",
             "Authorization": "Bearer wrong"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 401

        def post_auth(path, payload):
            req = urllib.request.Request(
                base + path, json.dumps(payload).encode(),
                {"Content-Type": "application/json",
                 "Authorization": "Bearer s3cret"})
            return json.loads(urllib.request.urlopen(req).read())

        # correct token -> upload URL issued
        r = post_auth("/generate-upload-url",
                      {"filename": "in.wav", "contentType": "audio/wav"})
        assert "url" in r and "gcs_uri" in r

        # unauthenticated PUT -> 401
        put = urllib.request.Request(base + r["url"], b"data", method="PUT")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(put)
        assert ei.value.code == 401

        # authenticated PUT of a real wav
        x = make_test_signal("noise", 4096, 44100) * 0.2
        p = str(tmp_path / "in.wav")
        write_wav(p, x, 44100)
        with open(p, "rb") as f:
            put = urllib.request.Request(
                base + r["url"], f.read(), method="PUT",
                headers={"Authorization": "Bearer s3cret"})
            urllib.request.urlopen(put).read()

        # quota: one fake in-flight job already attributed to this client
        store.create_job("other_mastered.wav", {
            "status": "processing", "messages": [], "progress": [0, 1],
            "tag": "", "art_file": None, "settings": {},
            "created": time.time(), "client": "127.0.0.1"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            post_auth("/start-processing",
                      {"gcs_uri": r["gcs_uri"],
                       "settings": {"lufs": None, "create_mp3": False}})
        assert ei.value.code == 429
        # job finishes -> quota frees
        store.update_job("other_mastered.wav", status="done")
        r2 = post_auth("/start-processing",
                       {"gcs_uri": r["gcs_uri"],
                        "settings": {"lufs": None, "create_mp3": False}})
        assert "processed_filename" in r2
        # reads stay open without a token
        st = _get(base, f"/status?audio_filename="
                        f"{r2['processed_filename']}"
                        f"&image_filename={r2['image_filename']}")
        assert st["status"] in ("processing", "done")
    finally:
        srv.shutdown()


# -- concurrency load (VERDICT r4 item 8) ---------------------------------------

def test_quota_reservation_is_atomic(tmp_path):
    """Two simultaneous /start-processing requests from one client must not
    both pass a quota of 1: the check and the job registration happen
    under ONE lock hold (JobStore.create_job_within_quota). This fails on
    the naive check-then-create shape."""
    from ame_tpu.serve.server import JobStore
    store = JobStore(str(tmp_path / "q"), ttl_s=3600)
    n, quota = 16, 2
    barrier = threading.Barrier(n)
    results = [None] * n

    def go(i):
        barrier.wait()
        results[i] = store.create_job_within_quota(
            f"j{i}_mastered.wav",
            {"status": "processing", "client": "c", "messages": []},
            "c", quota)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert sum(bool(r) for r in results) == quota
    assert store.active_jobs_for("c") == quota
    # a second client is unaffected by the first's quota
    assert store.create_job_within_quota(
        "other_mastered.wav", {"status": "processing", "client": "d"},
        "d", quota)


def test_concurrent_load(tmp_path_factory, tmp_path):
    """N clients drive upload -> start -> poll -> download simultaneously
    with the quota ACTIVE (set exactly to N, so accounting runs on every
    request but rejects none). Fails on a lost job (any non-done state), a
    double assignment (a job's message log would carry two worker
    passes), or a persist race (jobs.json unparseable / missing jobs)."""
    import os
    workdir = str(tmp_path_factory.mktemp("serve_load"))
    srv, store = make_server(host="127.0.0.1", port=0, workdir=workdir,
                             workers=3)
    store.client_quota = 8   # all test threads share 127.0.0.1
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    n = 8
    results = [None] * n
    barrier = threading.Barrier(n)

    def client(i):
        try:
            x = make_test_signal("noise", 4096, 44100) * 0.2
            p = str(tmp_path / f"in_{i}.wav")
            write_wav(p, x, 44100)
            barrier.wait(timeout=60)
            r = _post(base, "/generate-upload-url",
                      {"filename": f"load{i}.wav"})
            with open(p, "rb") as f:
                req = urllib.request.Request(base + r["url"], f.read(),
                                             method="PUT")
                urllib.request.urlopen(req).read()
            r2 = _post(base, "/start-processing",
                       {"gcs_uri": r["gcs_uri"],
                        "settings": {"bass_boost": 1.0, "lufs": None,
                                     "create_mp3": False}})
            name = r2["processed_filename"]
            deadline = time.time() + 300
            st = {"status": "processing"}
            while time.time() < deadline and st["status"] == "processing":
                st = _get(base, f"/status?audio_filename={name}"
                                f"&image_filename={r2['image_filename']}")
                time.sleep(0.25)
            assert st["status"] == "done", (i, st)
            blob = urllib.request.urlopen(base + st["download_url"]).read()
            assert blob[:4] == b"RIFF"
            results[i] = name
        except Exception as e:  # noqa: BLE001 — surfaced via results
            results[i] = e

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(360)
        failures = [r for r in results if not isinstance(r, str)]
        assert not failures, failures
        assert len(set(results)) == n   # uuid blob ids -> unique job names

        # no lost jobs, no double assignment: every job is done and its
        # message log holds exactly ONE worker pass (one terminal status)
        for name in results:
            snap = store.job_snapshot(name)
            assert snap["status"] == "done", snap
            msgs = snap.get("messages", [])
            terminal = [m for m in msgs
                        if m.startswith(("Success:", "Error:", "Failed:"))]
            assert len(terminal) == 1, (name, msgs)
            # worker pinning: each job records the device it ran on
            assert snap.get("device"), snap

        # persist-race check: the on-disk manifest is parseable and
        # carries every job in its final state
        with open(os.path.join(workdir, "jobs.json")) as f:
            persisted = json.load(f)
        for name in results:
            assert persisted[name]["status"] == "done"
    finally:
        srv.shutdown()
