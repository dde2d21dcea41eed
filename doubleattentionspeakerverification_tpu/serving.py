"""Embedding serving: micro-batched inference + a dependency-free HTTP server.

The reference has no serving story (inference = one-shot script,
``scripts/getEmbeddingExample.py``). For TPU serving the economics are
different: a single forward costs the same for 1 or 8 utterances, so
concurrent requests should share padded batches. This module provides

- :class:`MicroBatcher` — collects concurrent embed requests for up to
  ``max_wait_ms``, pads them into length-bucketed fixed-shape batches
  (static shapes -> a handful of XLA compilations, same trick as the EER
  extractor), runs ONE forward per bucket and fans results back out;
- :func:`make_server` / :func:`serve_forever` — a stdlib-only
  ``ThreadingHTTPServer``:

    GET  /health            -> {"status": "ok", ...counters}
    POST /embed             -> body: RIFF/WAVE bytes; {"embedding": [...]}
    POST /score             -> {"a": [emb], "b": [emb]} -> {"score": cos}

CLI: ``python -m doubleattentionspeakerverification_tpu.cli.serve``.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Sequence

import numpy as np

from .api import SpeakerEmbeddingModel
from .data.wav import decode_wav_bytes
from .evaluation.eer import cosine_scores
from .evaluation.embeddings import bucket_for

SERVE_BUCKETS = (100, 200, 350, 500, 750, 1000, 1500, 2000, 3000, 4000, 6000, 8000)


class _Pending:
    __slots__ = ("feats", "event", "result", "error")

    def __init__(self, feats: np.ndarray):
        self.feats = feats
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    """Batch concurrent embedding requests into fixed-shape forwards.

    Every forward uses the full ``max_batch`` rows (unused rows are padding),
    so exactly one XLA program per length bucket ever compiles; at TPU speeds
    the waste is microseconds while the win is sharing one dispatch across
    requests that arrive within ``max_wait_ms`` of each other.
    """

    def __init__(
        self,
        model: SpeakerEmbeddingModel,
        max_batch: int = 8,
        max_wait_ms: float = 5.0,
        buckets: Sequence[int] = SERVE_BUCKETS,
        embed_timeout_s: float = 600.0,
    ):
        self.model = model
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1000.0
        self.buckets = tuple(buckets)
        # default generous: the FIRST request per length bucket waits out an
        # XLA compile (~2 min on TPU), and requests queued behind it wait too
        self.embed_timeout_s = embed_timeout_s
        self._q: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._stats = {"requests": 0, "forwards": 0, "batched": 0}
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------- client
    def embed(self, feats: np.ndarray, timeout: Optional[float] = None) -> np.ndarray:
        """(T, F) normalized features -> (emb,). Thread-safe, blocking."""
        p = _Pending(np.asarray(feats, np.float32))
        self._q.put(p)
        if not p.event.wait(self.embed_timeout_s if timeout is None else timeout):
            raise TimeoutError("embedding request timed out")
        if p.error is not None:
            raise p.error
        return p.result

    def close(self) -> None:
        self._q.put(None)
        self._worker.join(timeout=5)

    def stats(self) -> dict:
        return dict(self._stats)

    def warmup(self, frame_lengths: Sequence[int]) -> None:
        """Pre-compile the forward for the buckets covering these lengths,
        so the first real request never waits out an XLA compile."""
        for t in sorted({bucket_for(t, self.buckets) for t in frame_lengths}):
            feat_dim = self.model.cfg.model.feature_size
            self.embed(np.zeros((t, feat_dim), np.float32))
        # warmup traffic shouldn't pollute the /health counters
        self._stats.update(requests=0, forwards=0, batched=0)

    # ------------------------------------------------------------- worker
    def _run(self) -> None:
        while True:
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.max_wait_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._flush(batch)
                    return
                batch.append(nxt)
            self._flush(batch)

    def _flush(self, batch) -> None:
        self._stats["requests"] += len(batch)
        self._stats["batched"] += len(batch) > 1
        by_bucket = {}
        for p in batch:
            by_bucket.setdefault(bucket_for(p.feats.shape[0], self.buckets), []).append(p)
        for bucket, items in sorted(by_bucket.items()):
            for i in range(0, len(items), self.max_batch):
                chunk = items[i : i + self.max_batch]
                try:
                    feat_dim = chunk[0].feats.shape[1]
                    x = np.zeros((self.max_batch, bucket, feat_dim), np.float32)
                    lengths = np.ones((self.max_batch,), np.int32)  # pad rows: 1 frame
                    for j, p in enumerate(chunk):
                        x[j, : p.feats.shape[0]] = p.feats
                        lengths[j] = p.feats.shape[0]
                    emb = self.model.embed_features(x, lengths)
                    self._stats["forwards"] += 1
                    for j, p in enumerate(chunk):
                        p.result = np.asarray(emb[j])
                except BaseException as e:  # deliver instead of killing the worker
                    for p in chunk:
                        p.error = e
                finally:
                    for p in chunk:
                        p.event.set()


def make_server(
    model: SpeakerEmbeddingModel,
    host: str = "127.0.0.1",
    port: int = 0,
    max_batch: int = 8,
    max_wait_ms: float = 5.0,
    embed_timeout_s: float = 600.0,
) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; ``.server_address`` has the port."""
    batcher = MicroBatcher(model, max_batch=max_batch, max_wait_ms=max_wait_ms,
                           embed_timeout_s=embed_timeout_s)
    t0 = time.time()

    # Feature extraction for uploads: native host kernel when built (no XLA
    # dispatch per distinct utterance length), numpy fallback otherwise.
    from .utils.native import host_logmel_extractor

    extractors = {}

    def extract(wave: np.ndarray, cfg) -> np.ndarray:
        if cfg not in extractors:
            extractors[cfg] = host_logmel_extractor(cfg, model.normalization)
        return extractors[cfg](wave.astype(np.float32))

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet; metrics live in /health
            pass

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] == "/health":
                self._json(200, {
                    "status": "ok",
                    "model": model.cfg.derived_model_name(),
                    "uptime_s": round(time.time() - t0, 1),
                    **batcher.stats(),
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                path = self.path.split("?")[0]
                if path == "/embed":
                    wave, sr = decode_wav_bytes(body)
                    cfg = model.cfg.features
                    if sr != cfg.sample_rate:
                        from .config import FeatureConfig

                        cfg = FeatureConfig(sample_rate=sr)
                    feats = extract(wave, cfg)
                    emb = batcher.embed(feats)
                    self._json(200, {
                        "embedding": [float(v) for v in emb],
                        "frames": int(feats.shape[0]),
                    })
                elif path == "/score":
                    req = json.loads(body)
                    a = np.asarray(req["a"], np.float32)
                    b = np.asarray(req["b"], np.float32)
                    self._json(200, {"score": float(cosine_scores(a[None], b[None])[0])})
                else:
                    self._json(404, {"error": f"unknown path {path}"})
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # for tests / clean shutdown
    return server


def serve_forever(server: ThreadingHTTPServer) -> None:
    try:
        server.serve_forever()
    finally:
        server.batcher.close()
