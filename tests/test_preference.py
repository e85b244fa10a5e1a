"""Listening-test harness (reference: dac-vae/audiotools/preference.py):
Samples walker, completion filtering, CSV results, HTTP app."""
import csv
import threading
import urllib.parse
import urllib.request
import wave

import numpy as np

from minimax_speech_tpu.utils.preference import (PreferenceApp, Samples,
                                                 save_result)


def _corpus(tmp_path, conditions=("ref", "a", "b"), n=3):
    for c in conditions:
        d = tmp_path / c
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            with wave.open(str(d / f"s{i}.wav"), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(np.zeros(800, np.int16).tobytes())
    return tmp_path


def test_samples_walk_filter_order(tmp_path):
    _corpus(tmp_path)
    s = Samples(str(tmp_path), seed=0)
    assert len(s) == 3 and s.conditions() == ["a", "b", "ref"]
    files = s.get_next_sample("ref", ["a", "b"], seed=1)
    assert s.order[0] == "ref" and sorted(s.order[1:]) == ["a", "b"]
    assert [f.parent.stem for f in files] == s.order

    # user resumes: completed samples are filtered out
    save = tmp_path / "r.csv"
    save_result({"user": "u1", "sample": files[0].name, "a": 80, "b": 20},
                str(save))
    s2 = Samples(str(tmp_path), seed=0)
    s2.filter_completed("u1", str(save))
    assert files[0].name not in s2.names and len(s2.names) == 2
    s3 = Samples(str(tmp_path), seed=0)
    s3.filter_completed("other-user", str(save))
    assert len(s3.names) == 3

    # exhaustion returns None
    s4 = Samples(str(tmp_path), n_samples=1)
    assert s4.get_next_sample(None, ["a"]) is not None
    assert s4.get_next_sample(None, ["a"]) is None


def test_save_result_header_once(tmp_path):
    p = tmp_path / "r.csv"
    save_result({"user": "u", "sample": "x.wav", "a": 1}, str(p))
    save_result({"user": "u", "sample": "y.wav", "a": 2}, str(p))
    rows = list(csv.DictReader(p.open()))
    assert [r["sample"] for r in rows] == ["x.wav", "y.wav"]


def test_http_app_serves_and_records(tmp_path):
    _corpus(tmp_path / "c")
    save = tmp_path / "results.csv"
    app = PreferenceApp(str(tmp_path / "c"), str(save), mode="mushra",
                        reference="ref", seed=0)
    srv = app.make_server(port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        page = urllib.request.urlopen(base + "/?user=tester",
                                      timeout=10).read().decode()
        assert "Reference" in page and "score_1" in page and \
            "score_2" in page
        # audio endpoint only serves corpus files
        src = page.split('src="/audio?f=')[1].split('"')[0]
        audio = urllib.request.urlopen(base + "/audio?f=" + src,
                                       timeout=10).read()
        assert len(audio) > 100
        try:
            urllib.request.urlopen(base + "/audio?f=/etc/passwd",
                                   timeout=10)
            assert False, "path traversal allowed"
        except urllib.error.HTTPError as e:
            assert e.code == 403
        # submit a rating
        sample = page.split('name="sample" value="')[1].split('"')[0]
        order = page.split('name="order" value="')[1].split('"')[0]
        order = order.replace("&quot;", '"')
        data = urllib.parse.urlencode({
            "user": "tester", "sample": sample, "order": order,
            "score_1": "77", "score_2": "33"}).encode()
        resp = urllib.request.urlopen(base + "/rate", data=data, timeout=10)
        assert resp.status == 200  # redirect followed to next page
        rows = list(csv.DictReader(save.open()))
        assert rows and rows[0]["user"] == "tester"
        scored = {k: v for k, v in rows[0].items()
                  if k in ("a", "b") and v}
        assert sorted(scored.values()) == ["33", "77"]
    finally:
        srv.shutdown()
