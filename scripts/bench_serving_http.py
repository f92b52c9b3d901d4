"""End-to-end HTTP serving throughput (cognitive_aim_tpu/serve.py) on the
live device: spin the server in-process, fire concurrent /predict requests
(base64 JPEGs, mixed instructions), and report sustained req/s.

On this 1-core container the ceiling is host-side (PIL decode + HTTP), not
the TPU — see docs/PERF.md serving section; the point of this bench is
that the micro-batcher actually coalesces concurrent requests into
fixed-shape device batches end-to-end.

    python scripts/bench_serving_http.py [--n 96] [--threads 16]
        [--size 224] [--policy int8] [--token-filter 2:0.25]
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--policy", type=str, default="int8")
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--token-filter", type=str, default="")
    args = ap.parse_args()

    import numpy as np
    import yaml
    from PIL import Image

    from cognitive_aim_tpu.api import CognitiveAimInference
    from cognitive_aim_tpu.models.guidance import INSTRUCTIONS
    from cognitive_aim_tpu.serve import serve

    cfg_path = "/tmp/bench_serve_cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"dataset": {"image_size": args.size}}, f)
    engine = CognitiveAimInference(
        cfg_path, None, policy=args.policy, attn_impl="pallas_packed",
        noise_mode="zeros", save_images=False,
        token_filter=args.token_filter,
    )
    t0 = time.perf_counter()
    httpd, batcher = serve(engine, port=0, max_batch=args.max_batch,
                           max_delay_ms=8)
    print(f"warmup (compile) {time.perf_counter() - t0:.1f}s", flush=True)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    rng = np.random.RandomState(0)
    bufs = []
    for i in range(8):
        im = Image.fromarray(
            rng.randint(0, 255, (args.size, args.size, 3), np.uint8))
        b = io.BytesIO()
        im.save(b, format="JPEG")
        bufs.append(base64.b64encode(b.getvalue()).decode())

    url = f"http://127.0.0.1:{port}/predict"
    done = []
    lock = threading.Lock()

    def worker(i):
        payload = json.dumps({
            "image_b64": bufs[i % len(bufs)],
            "instruction": INSTRUCTIONS[i % len(INSTRUCTIONS)],
        }).encode()
        req = urllib.request.Request(
            url, payload, headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=300) as r:
                out = json.loads(r.read())
        except urllib.error.HTTPError as e:
            raise RuntimeError(f"HTTP {e.code}: {e.read()!r}") from e
        assert out["depth"] > 0
        with lock:
            done.append(i)

    # warm one request through (first host-side paths)
    worker(0)
    done.clear()

    t0 = time.perf_counter()
    idx = iter(range(args.n))

    def drain():
        while True:
            try:
                i = next(idx)
            except StopIteration:
                return
            worker(i)

    threads = [threading.Thread(target=drain) for _ in range(args.threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    print(f"{len(done)} requests in {dt:.2f}s = {len(done) / dt:.1f} req/s "
          f"({args.threads} client threads, max_batch={args.max_batch}, "
          f"policy={args.policy}, tf={args.token_filter or 'off'})")
    httpd.shutdown()
    batcher.stop()


if __name__ == "__main__":
    main()
