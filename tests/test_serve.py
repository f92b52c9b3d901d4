"""HTTP serving endpoint (cognitive_aim_tpu/serve.py): healthz, single
predict through the micro-batcher (mixed instructions in one device call),
and the batched-paths endpoint."""

import base64
import json
import threading
import urllib.request

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from cognitive_aim_tpu.api import CognitiveAimInference
    from cognitive_aim_tpu.nn.dinov2 import DinoV2Config
    from cognitive_aim_tpu.serve import serve

    tmp = tmp_path_factory.mktemp("serve")
    cfg = {"dataset": {"image_size": 56}, "exif_config": {"num_cameras": 3},
           "focal_config": {"num_iterations": 2}}
    cfg_path = str(tmp / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    vit = DinoV2Config(hidden_size=64, num_layers=2, num_heads=4,
                       pretrain_image_size=56, patch_size=14)
    engine = CognitiveAimInference(
        cfg_path, None, noise_mode="zeros", save_images=False, vit_cfg=vit,
    )
    httpd, batcher = serve(engine, port=0, max_batch=4, max_delay_ms=20,
                           data_root=tmp)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}", tmp, engine
    httpd.shutdown()
    batcher.stop()


def _post(url, obj, timeout=120):
    req = urllib.request.Request(
        url, json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _jpeg_bytes(tmp, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (80, 60, 3), np.uint8))
    p = tmp / f"img{seed}.jpg"
    img.save(p)
    return p.read_bytes(), str(p)


def test_healthz(server):
    base, _, _ = server
    with urllib.request.urlopen(base + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["image_size"] == 56
    assert h["max_batch"] == 4


def test_predict_b64_and_concurrent_batching(server):
    base, tmp, _ = server
    raw, _ = _jpeg_bytes(tmp, 1)
    b64 = base64.b64encode(raw).decode()
    out = _post(base + "/predict", {"image_b64": b64,
                                    "instruction": "center"})
    assert out["depth"] > 0 and 0 <= out["confidence"] <= 1

    # concurrent mixed-instruction requests ride one micro-batch
    results = {}

    def call(name):
        results[name] = _post(
            base + "/predict", {"image_b64": b64, "instruction": name}
        )

    threads = [threading.Thread(target=call, args=(n,))
               for n in ("left", "right", "top")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert set(results) == {"left", "right", "top"}
    assert all(r["depth"] > 0 for r in results.values())


def test_dispatcher_hits_warmup_cache(server):
    """The startup warmup must compile the EXACT signature the dispatcher
    uses — a silent recompile on the first real batch cost ~70 s through
    the TPU relay until the warmup avals were pinned (np arrays, strong
    dtypes). Guard: after real requests, the jitted guided forward still
    has exactly one cache entry."""
    base, tmp, engine = server
    raw, _ = _jpeg_bytes(tmp, 9)
    b64 = base64.b64encode(raw).decode()
    _post(base + "/predict", {"image_b64": b64, "instruction": "bottom"})
    assert engine._guided._cache_size() == 1, "guided forward recompiled"


def test_predict_batch_paths(server):
    base, tmp, _ = server
    _, p1 = _jpeg_bytes(tmp, 2)
    _, p2 = _jpeg_bytes(tmp, 3)
    out = _post(base + "/predict_batch",
                {"paths": [p1, p2], "instruction": "center",
                 "batch_size": 2})
    assert len(out["results"]) == 2
    for d, c in out["results"]:
        assert d > 0 and 0 <= c <= 1


def test_predict_batch_ignores_client_batch_size(server):
    """The device batch size is a server decision: a hostile sequence of
    client batch_size values must trigger ZERO new compiles of the uint8
    guided graph — every request rides the warmed max_batch shape
    (serve.py pins batch_size=server.max_batch)."""
    base, tmp, engine = server
    paths = [_jpeg_bytes(tmp, 20 + i)[1] for i in range(3)]
    # first call establishes the one u8-graph shape (lazy-built in
    # predict_paths_batched)
    _post(base + "/predict_batch", {"paths": paths, "instruction": "center"})
    n0 = engine._guided_u8._cache_size()
    assert n0 == 1
    for hostile in (1, 2, 3, 7, 64):
        out = _post(base + "/predict_batch",
                    {"paths": paths[: max(1, hostile % 4)],
                     "instruction": "left", "batch_size": hostile})
        assert all(d > 0 for d, _ in out["results"])
    assert engine._guided_u8._cache_size() == n0, (
        "client batch_size reached the compile cache")


def test_path_outside_data_root_rejected(server):
    """Server-local file reads are gated to the configured data root —
    anything else is a 400, not a file-existence oracle."""
    base, _, _ = server
    req = urllib.request.Request(
        base + "/predict", json.dumps({"path": "/etc/passwd"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_bad_request(server):
    base, _, _ = server
    req = urllib.request.Request(
        base + "/predict", json.dumps({}).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())
