"""HTTP mask-editor UI: drive the full session over the wire.

Reference: manual_editor.py:383-1316 (Gradio); ours is the stdlib HTTP
single-page app (pipeline/editor_ui.py). The test is a headless browser
stand-in: it fetches the page/state and performs every verb via POST /op,
then asserts the blocking launch_editor returns the edited detections."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from regen3d_tpu.pipeline.detection import BoundingBox, DetectionResult
from regen3d_tpu.pipeline.editor_ui import launch_editor
from regen3d_tpu.pipeline.interactive import EditSession


def _req(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    if body is None:
        with urllib.request.urlopen(url, timeout=10) as r:
            return r.status, r.read()
    data = json.dumps(body).encode()
    rq = urllib.request.Request(url, data=data,
                                headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(rq, timeout=10) as r:
        return r.status, r.read()


def _free_port():
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


class TestEditorHTTP:
    def test_full_session(self):
        img = np.full((48, 64, 3), 200, np.uint8)
        m = np.zeros((48, 64), bool)
        m[10:30, 10:30] = True
        session = EditSession(img, initial=[DetectionResult(
            score=0.9, label="chair", box=BoundingBox(10, 10, 30, 30),
            mask=m)])
        port = _free_port()
        started = threading.Event()
        holder = {}

        def serve():
            holder["result"] = launch_editor(session, port=port,
                                             _started=started)

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        assert started.wait(10)

        # page + image + state
        st, body = _req(port, "/")
        assert st == 200 and b"Mask editor" in body
        st, png = _req(port, "/image.png")
        assert st == 200 and png[:4] == b"\x89PNG"
        st, body = _req(port, "/state")
        state = json.loads(body)
        assert state["width"] == 64 and state["height"] == 48
        assert len(state["masks"]) == 1
        assert state["masks"][0]["label"] == "chair"

        # verbs: grow mask 0, add a box mask, relabel it, merge, resolve
        _req(port, "/op", {"op": "add_point", "idx": 0, "x": 32, "y": 20,
                           "positive": True})
        _req(port, "/op", {"op": "new_from_box", "label": "table",
                           "x0": 40, "y0": 30, "x1": 60, "y1": 45})
        _req(port, "/op", {"op": "relabel", "idx": 1, "label": "desk"})
        st, body = _req(port, "/state")
        state = json.loads(body)
        assert [m["label"] for m in state["masks"]] == ["chair", "desk"]
        _req(port, "/op", {"op": "resolve_overlaps"})

        # unknown op → 400 (surfaced, not crashed)
        try:
            _req(port, "/op", {"op": "nope"})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # finish unblocks launch_editor with the edited detections
        st, body = _req(port, "/op", {"op": "finish"})
        assert json.loads(body)["done"] is True
        t.join(timeout=10)
        assert not t.is_alive()
        result = holder["result"]
        assert {d.label for d in result} == {"chair", "desk"}
        chair = next(d for d in result if d.label == "chair")
        assert chair.mask[20, 32], "positive point did not grow the mask"

    def test_delete_and_merge(self):
        img = np.zeros((32, 32, 3), np.uint8)
        a = np.zeros((32, 32), bool)
        a[2:10, 2:10] = True
        b = np.zeros((32, 32), bool)
        b[20:30, 20:30] = True
        c = np.zeros((32, 32), bool)
        c[12:18, 12:18] = True
        session = EditSession(img, initial=[
            DetectionResult(1.0, "a", BoundingBox(2, 2, 10, 10), a),
            DetectionResult(1.0, "b", BoundingBox(20, 20, 30, 30), b),
            DetectionResult(1.0, "c", BoundingBox(12, 12, 18, 18), c)])
        port = _free_port()
        started = threading.Event()
        holder = {}
        t = threading.Thread(
            target=lambda: holder.update(result=launch_editor(
                session, port=port, _started=started)), daemon=True)
        t.start()
        assert started.wait(10)
        _req(port, "/op", {"op": "merge", "i": 0, "j": 2})   # a |= c
        _req(port, "/op", {"op": "delete", "idx": 1})        # drop b
        _req(port, "/op", {"op": "finish"})
        t.join(timeout=10)
        result = holder["result"]
        assert len(result) == 1 and result[0].label == "a"
        assert result[0].mask[15, 15] and result[0].mask[5, 5]
