"""Micro-batching serving layer (infer/server.py)."""

import base64
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from haff_tpu.infer.server import MicroBatcher, make_handler


def fake_predict(images, prompts):
    # echoes per-request identity; slow enough that concurrent
    # submissions coalesce into one batch
    time.sleep(0.05)
    out = []
    for img, p in zip(images, prompts):
        ml = np.full(img.shape[:2], float(img[0, 0, 0]) / 255.0)
        out.append((f"ans:{p}", ml, ml * 0.5, np.array([1, 0, 0, 0.0])))
    return out


def test_submit_after_close_raises():
    b = MicroBatcher(fake_predict, batch_size=2, max_wait_ms=5)
    b.close()
    with pytest.raises(RuntimeError, match="shutting down"):
        b.submit(np.zeros((4, 4, 3), np.uint8), "late")


def test_microbatcher_coalesces_and_fans_out():
    b = MicroBatcher(fake_predict, batch_size=4, max_wait_ms=80)
    results = {}

    def worker(i):
        img = np.full((8, 8, 3), i * 10, np.uint8)
        results[i] = b.submit(img, f"p{i}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()
    # every request got ITS OWN result back
    for i in range(6):
        text, ml, mr, tax = results[i]
        assert text == f"ans:p{i}"
        assert ml.shape == (8, 8)
        np.testing.assert_allclose(ml[0, 0], i * 10 / 255.0)
    # and the 6 requests ran in fewer than 6 batches (coalescing worked)
    assert sum(b.batch_sizes) == 6
    assert len(b.batch_sizes) <= 3, b.batch_sizes
    assert max(b.batch_sizes) >= 2


def test_microbatcher_pads_partial_batches():
    seen = []

    def spy(images, prompts):
        seen.append(len(images))
        return fake_predict(images, prompts)

    b = MicroBatcher(spy, batch_size=4, max_wait_ms=5)
    img = np.zeros((4, 4, 3), np.uint8)
    b.submit(img, "solo")
    b.close()
    # the dispatched batch is padded up to the bucket size
    assert seen == [4]


def test_microbatcher_propagates_errors():
    def boom(images, prompts):
        raise RuntimeError("backend down")

    b = MicroBatcher(boom, batch_size=2, max_wait_ms=5)
    with pytest.raises(RuntimeError, match="backend down"):
        b.submit(np.zeros((4, 4, 3), np.uint8), "x")
    b.close()


def test_http_roundtrip():
    import cv2
    from http.server import ThreadingHTTPServer

    b = MicroBatcher(fake_predict, batch_size=2, max_wait_ms=5)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(b))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            assert json.loads(r.read())["ok"] is True

        img = np.full((10, 12, 3), 200, np.uint8)
        ok, buf = cv2.imencode(".png", img)
        assert ok
        payload = json.dumps({
            "image": base64.b64encode(buf.tobytes()).decode(),
            "prompt": "open the drawer",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            out = json.loads(r.read())
        assert out["answer"] == "ans:open the drawer"
        assert len(out["taxonomy"]) == 4
        mask = cv2.imdecode(
            np.frombuffer(base64.b64decode(out["mask_left"]), np.uint8),
            cv2.IMREAD_GRAYSCALE)
        assert mask.shape == (10, 12)
        # logits 200/255 -> sigmoid 0.687 > 0.5 everywhere
        assert (mask == 255).all()
        # taxonomy [1,0,0,0] = left-only: the right mask is gated off
        # (reference inference.py:278-313 protocol)
        mask_r = cv2.imdecode(
            np.frombuffer(base64.b64decode(out["mask_right"]), np.uint8),
            cv2.IMREAD_GRAYSCALE)
        assert (mask_r == 0).all()

        # bad request -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"{}",
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        b.close()


def test_predictor_batch_matches_single():
    """predict_batch on the real tiny model returns per-request results
    identical to sequential single calls (the server's correctness
    contract)."""
    from haff_tpu.infer.predictor import Predictor

    pred = Predictor(model_preset="tiny", precision="fp32",
                     max_new_tokens=4, max_text_len=448)
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(24, 30, 3) * 255).astype(np.uint8) for _ in range(2)]
    prompts = ["open the drawer", "grab the cup"]
    batched = pred.predict_batch(imgs, prompts)
    for i in range(2):
        text, ml, mr, tax = pred(imgs[i], prompts[i])
        bt, bml, bmr, btax = batched[i]
        assert bt == text
        np.testing.assert_allclose(bml, ml, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(bmr, mr, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(btax, tax, rtol=2e-2, atol=2e-2)
