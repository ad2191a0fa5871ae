#!/usr/bin/env python
"""HTTP generation service over an AOT serving artifact.

The network-facing member of the serving trio (cli/export_serving.py writes
the artifact, cli/serve_generate.py batch-writes JPEGs, this serves
requests): a stdlib-only HTTP daemon that loads one StableHLO artifact and
answers generation requests. Like serve_generate it needs no model-building
code — jax + numpy + PIL and the artifact directory are the whole host —
which replaces the reference's load-checkpoint-and-rebuild-the-module
serving path (generate.py:45-139) with a compiler-level contract.

Endpoints:
  GET  /healthz    {"status": "ok", "batch_size": B, "num_users": N,
                    "warm": bool, "requests": n}
  POST /generate   body {"user_id": 1-based int, "num_images": int,
                         "seed": optional int}
                   -> {"user_id": u, "images": [base64 JPEG q95, ...],
                       "latency_s": t}

The artifact's program has a fixed batch size; requests are tiled into full
batches and surplus images dropped. Device execution is serialized by a
lock (one compiled program, many HTTP threads). At startup the program is
run once so the first request never pays the compile.

Usage:
  python cli/serve_http.py --artifact serving_artifact [--port 8000]
"""

import argparse
import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from _common import REPO  # noqa: E402  (sys.path + platform override only)


class GenerationService:
    """Owns the loaded artifact; thread-safe single-program execution."""

    def __init__(self, artifact: str, seed: int = 0):
        import jax
        import numpy as np

        from vqgan_tpu.serving import load_cfg_sampler

        meta = json.loads((Path(artifact) / "meta.json").read_text())
        cfg = meta.get("config", {})
        self.batch = int(cfg.get("batch_size")
                         or meta["arg_shapes"][-1][0])
        self.num_users = int(cfg.get("num_users", 31))
        self._sample = load_cfg_sampler(artifact)
        self._key = jax.random.PRNGKey(seed)
        self._jax, self._np = jax, np
        self._lock = threading.Lock()
        self.requests = 0
        self.warm = False

    def warmup(self):
        self.generate(user_id=1, num_images=1, seed=0)
        self.warm = True

    def generate(self, user_id: int, num_images: int, seed=None):
        """Returns a list of uint8 [H,W,3] arrays; device calls serialized."""
        jax, np = self._jax, self._np
        if not 1 <= user_id <= self.num_users:
            raise ValueError(
                f"user_id must be in [1, {self.num_users}], got {user_id}")
        if num_images < 1:
            raise ValueError("num_images must be >= 1")
        classes = np.full((self.batch,), user_id - 1, np.int32)
        out = []
        with self._lock:
            self.requests += 1
            if seed is not None:
                key = jax.random.PRNGKey(int(seed))
            else:
                key, self._key = jax.random.split(self._key)
            while len(out) < num_images:
                key, sub = jax.random.split(key)
                imgs = np.asarray(self._sample(sub, classes))
                take = min(self.batch, num_images - len(out))
                for i in range(take):
                    out.append(np.clip(imgs[i] * 255.0, 0, 255)
                               .astype(np.uint8))
        return out


def _jpeg_b64(arr) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(svc: GenerationService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # one-line access log
            print(f"{self.address_string()} {fmt % args}", flush=True)

        def _reply(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {"status": "ok", "batch_size": svc.batch,
                              "num_users": svc.num_users, "warm": svc.warm,
                              "requests": svc.requests})

        def do_POST(self):
            if self.path != "/generate":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                user_id = int(req["user_id"])
                num_images = int(req.get("num_images", 1))
                seed = req.get("seed")
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": f"bad request: {e}"})
            try:
                t0 = time.perf_counter()
                imgs = svc.generate(user_id, num_images, seed)
                dt = time.perf_counter() - t0
            except ValueError as e:
                return self._reply(400, {"error": str(e)})
            self._reply(200, {"user_id": user_id,
                              "images": [_jpeg_b64(a) for a in imgs],
                              "latency_s": round(dt, 4)})

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True,
                    help="serving directory from cli/export_serving.py")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_warmup", action="store_true")
    args = ap.parse_args()

    svc = GenerationService(args.artifact, seed=args.seed)
    if not args.no_warmup:
        t0 = time.perf_counter()
        svc.warmup()
        print(f"warmup done in {time.perf_counter() - t0:.1f}s", flush=True)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(svc))
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(batch {svc.batch}, {svc.num_users} users)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
