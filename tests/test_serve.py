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
    assert _get(server, "/healthz") == {"ok": True}


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
