"""Minimal production inference server: checkpoint → HTTP top-k endpoint.

No reference counterpart (the reference has no inference entry at all); this
completes hvt's deployment story: the same config surface and weight
resolution as batch inference (hvt/downstream/predict.py), wrapped in a
stdlib ThreadingHTTPServer — zero extra dependencies.

Endpoints:
* ``GET /healthz`` → ``{"status": "ok", "model": ..., "classes": N}``
* ``POST /predict`` (body: a JPEG/PNG image; optional ``?topk=K``) →
  ``{"classes": [...], "class_ids": [...], "probs": [...]}``; multitask
  models add ``tier_ids`` when the server runs with hierarchical decoding.

Design notes (TPU semantics): the forward is one jit-compiled executable at
a fixed batch shape, so no request ever retraces. Concurrent requests
**micro-batch**: server threads decode/resize in parallel, enqueue their
crop, and a single batcher thread coalesces up to ``batch`` waiting
requests (2 ms grace window) into one device dispatch — under-full batches
pad with zero rows, which are free.
"""

from __future__ import annotations

import io
import json
import queue as queue_lib
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from hvt import config as config_lib
from hvt import parallel
from hvt.data import DevicePrep
from hvt.data import native as native_lib
from hvt.data import transforms as T
from hvt.models import build_model


class InferenceEngine:
    """Owns the compiled forward; thread-safe predict_image()."""

    def __init__(self, config: config_lib.Config, *, batch: int = 1,
                 use_ema: bool = True, hierarchical: bool = False,
                 topk: int = 5, quantize: "str | None" = None,
                 calibrate: int = 0):
        import jax
        import jax.numpy as jnp

        from hvt.data import build_loader
        from hvt.downstream import predict as predict_lib

        self.config = config
        self.model_name = config.model.name
        self.native_artifact = False  # live-model engine
        self.batch = max(1, batch)

        loader, info = build_loader(config, is_train=False)
        self.classes = list(getattr(loader.dataset, "classes", ()))
        self.num_classes = info.num_classes
        data_cfg = config.eval_dataset
        self.transform = T.EvalTransform(
            crop_size=data_cfg.crop_size, resize_size=data_cfg.resize_size
        )

        model = build_model(config, info.num_classes)
        mesh = parallel.divisor_mesh(self.batch)
        parallel.set_kernel_mesh(mesh)
        prep = DevicePrep.from_config(data_cfg, config.precision)

        crop = data_cfg.crop_size
        variables = jax.jit(
            lambda: model.init(
                jax.random.key(config.seed),
                prep.normalize(jnp.zeros((2, crop, crop, 3), jnp.uint8)),
                train=False,
            ),
            out_shardings=parallel.replicated(mesh),
        )()
        params, batch_stats = predict_lib._resolve_weights(
            config, variables, use_ema
        )
        self._params = jax.device_put(params, parallel.replicated(mesh))
        self._batch_stats = jax.device_put(
            batch_stats, parallel.replicated(mesh)
        )

        lookups = (
            predict_lib.taxonomy_lookups(self.classes, info.num_classes)
            if hierarchical
            else None
        )
        self.hierarchical = hierarchical

        if calibrate and quantize != "int8":
            raise ValueError("calibrate requires quantize='int8'")
        act_scales = (
            predict_lib.live_act_scales(
                model, prep, self._params, self._batch_stats, loader, calibrate
            )
            if calibrate
            else None
        )

        k = min(topk, info.fine_grained_num_classes)
        self._steps = [
            (self.batch,
             predict_lib.build_topk_step(model, prep, lookups, k,
                                         quantize=quantize,
                                         act_scales=act_scales))
        ]
        self._k = k
        self._crop = crop
        self._warm_and_start()

    @classmethod
    def from_artifact(cls, path, *, batch: int = 0, topk: int = 5,
                      hierarchical: bool = False) -> "InferenceEngine":
        """Serve a StableHLO artifact (hvt/tools/export_serving.py).

        The artifact owns normalize + forward with the weights baked in as
        constants; this engine adds only image decode, top-k /
        hierarchical decoding, and request micro-batching — no model code,
        flax modules, or checkpoint plumbing run at serving time.

        ``batch=0`` (auto) adopts the artifact's shape: a pinned export's
        batch, all of a bucket artifact's buckets, or 1 for a symbolic
        export. Batch-bucket artifacts (``--batch N1,N2,...``) dispatch
        each coalesced request group at the smallest bucket that fits —
        single requests pay a batch-N1 forward, bursts ride the largest
        bucket; an explicit ``batch`` must then name a bucket and caps
        coalescing there.
        """
        from hvt.downstream import predict as predict_lib
        from hvt.tools import export_serving

        import jax

        buckets, manifest = export_serving.load_all(path)
        backend = jax.default_backend()
        lowered_for = set(manifest.get("platforms", ()))
        tpu_like = {"tpu", "axon"}
        if lowered_for and backend not in lowered_for and not (
            backend in tpu_like and lowered_for & tpu_like
        ):
            kind = "native (Mosaic kernels embedded)" if manifest.get(
                "native") else "StableHLO"
            raise ValueError(
                f"this {kind} artifact was lowered for platforms "
                f"{sorted(lowered_for)} but the running backend is "
                f"{backend!r}; re-export with --platforms {backend} "
                f"(portable artifacts can list several)"
            )
        self = cls.__new__(cls)
        self.config = None
        self.model_name = manifest["model"]
        if 0 in buckets:  # symbolic batch: one export serves any shape
            self.batch = max(1, batch)
            sizes = [self.batch]
        elif len(buckets) == 1:
            (pinned,) = buckets
            if batch and batch != pinned:
                raise ValueError(
                    f"artifact batch is pinned to {pinned}; serve with "
                    f"batch={pinned} (or re-export with --batch 0 for a "
                    f"symbolic batch dimension)"
                )
            self.batch = pinned
            sizes = [pinned]
        else:
            sizes = sorted(buckets)
            if batch:  # explicit cap must name a bucket
                if batch not in buckets:
                    raise ValueError(
                        f"batch={batch} is not one of the artifact's "
                        f"buckets {sizes}; pick a bucket or re-export"
                    )
                sizes = [s for s in sizes if s <= batch]
            self.batch = sizes[-1]
        multitask = manifest["multitask"]
        self.native_artifact = bool(manifest.get("native", False))
        self.num_classes = (
            tuple(manifest["num_classes"]) if multitask
            else manifest["num_classes"]
        )
        self.classes = list(manifest["classes"])
        pre = manifest["preprocessing"]
        self.transform = T.EvalTransform(
            crop_size=pre["crop_size"], resize_size=pre["resize_size"]
        )
        lookups = (
            predict_lib.taxonomy_lookups(self.classes, self.num_classes)
            if hierarchical
            else None
        )
        self.hierarchical = hierarchical
        fine = self.num_classes[-1] if multitask else self.num_classes
        k = min(topk, fine)
        # No live weights: the batcher passes these through to a step that
        # ignores them (see build_topk_step_from_exported).
        self._params = None
        self._batch_stats = {}
        exp_of = (lambda s: buckets[0]) if 0 in buckets else (lambda s: buckets[s])
        self._steps = [
            (s, predict_lib.build_topk_step_from_exported(exp_of(s), lookups, k))
            for s in sizes
        ]
        self._k = k
        self._crop = pre["crop_size"]
        self._warm_and_start()
        return self

    def _warm_and_start(self) -> None:
        # Warm every bucket's executable so no request pays a compile.
        # Host fetch, not block_until_ready — the latter returns before
        # device completion on the axon runtime (see CLAUDE.md).
        for size, step in self._steps:
            dummy = np.zeros((size, self._crop, self._crop, 3), np.uint8)
            np.asarray(step(self._params, self._batch_stats, dummy)[0])

        # Request micro-batching: concurrent requests coalesce into one
        # fixed-shape device step (up to `batch` rows per dispatch). Server
        # threads decode/resize concurrently and block on their slot's
        # event; a single batcher thread owns the device.
        self._queue: queue_lib.Queue = queue_lib.Queue()
        self._closed = False
        # Serving observability (GET /stats): dispatch counters owned by
        # the single batcher thread; the request counter is bumped under
        # _stats_lock by server threads.
        self._stats_lock = threading.Lock()
        self._stats = {
            "requests": 0, "errors": 0, "dispatches": 0, "rows": 0,
            "step_ms_sum": 0.0,
        }
        self._batcher = threading.Thread(target=self._batch_loop, daemon=True)
        self._batcher.start()

    def stats(self) -> dict:
        """Snapshot of serving counters: request/dispatch totals, mean batch
        occupancy (rows per dispatch ÷ compiled batch), mean device-step
        wall time."""
        with self._stats_lock:
            s = dict(self._stats)
        d = max(1, s["dispatches"])
        return {
            "model": self.model_name,
            "batch": self.batch,
            "requests": s["requests"],
            "errors": s["errors"],
            "dispatches": s["dispatches"],
            "mean_rows_per_dispatch": round(s["rows"] / d, 2),
            "mean_occupancy": round(s["rows"] / (d * self.batch), 3),
            "mean_step_ms": round(s["step_ms_sum"] / d, 2),
        }

    # -- batching -----------------------------------------------------------

    def _batch_loop(self):
        while True:
            first = self._queue.get()
            if first is None:  # close() sentinel
                return
            pendings = [first]
            # Coalesce whatever is already waiting (small grace window so a
            # concurrent burst shares one dispatch) up to the batch shape.
            closing = False
            while len(pendings) < self.batch:
                try:
                    item = self._queue.get(timeout=0.002)
                except queue_lib.Empty:
                    break
                if item is None:  # sentinel raced a burst: finish, then exit
                    closing = True
                    break
                pendings.append(item)
            # Smallest bucket that fits this group (single-bucket engines
            # have exactly one entry, preserving the fixed-shape contract).
            size, step = next(
                (s, f) for s, f in self._steps if s >= len(pendings)
            )
            images = np.zeros((size, self._crop, self._crop, 3), np.uint8)
            for row, p in enumerate(pendings):
                images[row] = p["arr"]
            t0 = time.perf_counter()
            try:
                top_i, top_p, tiers, n_allowed = step(
                    self._params, self._batch_stats, images
                )
                out = (
                    np.asarray(top_i), np.asarray(top_p),
                    None if tiers is None else np.asarray(tiers),
                    None if n_allowed is None else np.asarray(n_allowed),
                )
                for row, p in enumerate(pendings):
                    p["result"] = (row, out)
            except Exception as e:  # surfaced to every waiting request
                for p in pendings:
                    p["error"] = e
            finally:
                step_ms = (time.perf_counter() - t0) * 1e3
                with self._stats_lock:
                    self._stats["dispatches"] += 1
                    self._stats["rows"] += len(pendings)
                    self._stats["step_ms_sum"] += step_ms
                    self._stats["errors"] += sum(
                        "error" in p for p in pendings
                    )
                for p in pendings:
                    p["event"].set()
            if closing:
                return

    def close(self) -> None:
        """Retire the batcher thread (idempotent); in-flight requests
        complete, requests that race the shutdown fail cleanly."""
        self._closed = True
        if self._batcher.is_alive():
            self._queue.put(None)
            self._batcher.join(timeout=10)
        # Fail anything enqueued after the batcher consumed the sentinel.
        while True:
            try:
                p = self._queue.get_nowait()
            except queue_lib.Empty:
                return
            if p is not None:
                p["error"] = RuntimeError("InferenceEngine is closed")
                with self._stats_lock:
                    self._stats["errors"] += 1
                p["event"].set()

    def predict_image(self, data: bytes, topk: Optional[int] = None) -> dict:
        """One image (encoded bytes) → top-k record.

        Decode runs in the calling (server) thread: JPEGs go through the
        native GIL-free core when available (hvt/data/native.py decode_eval
        — the loader's eval law; concurrent requests decode in parallel),
        anything else through PIL."""
        from hvt.downstream import predict as predict_lib

        if topk is not None and topk <= 0:
            raise ValueError(f"topk must be positive, got {topk}")
        if self._closed:
            raise RuntimeError("InferenceEngine is closed")
        with self._stats_lock:  # every attempt counts, decode failures too
            self._stats["requests"] += 1
        try:
            arr = native_lib.decode_eval(
                data, resize_size=self.transform.resize_size,
                out_size=self.transform.crop_size,
            )
            if arr is None:  # non-JPEG bytes or no native core → PIL
                from PIL import Image

                with Image.open(io.BytesIO(data)) as img:
                    arr = self.transform(img.convert("RGB"),
                                         np.random.default_rng(0))
        except Exception:
            with self._stats_lock:
                self._stats["errors"] += 1
            raise
        pending = {"arr": arr, "event": threading.Event()}
        self._queue.put(pending)
        # Bounded wait: a request that races close() past the drain above
        # would otherwise block forever on a dead batcher.
        while not pending["event"].wait(timeout=0.5):
            if self._closed and not self._batcher.is_alive():
                raise RuntimeError("InferenceEngine is closed")
        if "error" in pending:
            raise RuntimeError(f"inference failed: {pending['error']}")
        row, (top_i, top_p, tiers, n_allowed) = pending["result"]
        k = self._k if topk is None else min(topk, self._k)
        return predict_lib.topk_record(
            self.classes, row, top_i, top_p, tiers, n_allowed, k
        )


def make_server(engine: InferenceEngine, host: str = "127.0.0.1",
                port: int = 0, pool_threads: int = 16) -> ThreadingHTTPServer:
    """→ a ready (unstarted) HTTP server; port 0 picks a free port.

    Connections are handled on a fixed worker pool rather than
    thread-per-request: stdlib ``ThreadingHTTPServer`` spawns (and tears
    down) one thread per connection, which measured a 1.2 s p99 tail under
    a 16-client burst on a 1-core host (thread churn — serve_bench,
    BENCH.md "serving latency"). The pool bounds concurrency at
    ``pool_threads`` and reuses threads."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "model": engine.model_name,
                    "classes": (
                        list(engine.num_classes)
                        if isinstance(engine.num_classes, tuple)
                        else engine.num_classes
                    ),
                    "hierarchical": engine.hierarchical,
                    "native_artifact": engine.native_artifact,
                })
            elif path == "/stats":
                self._send(200, engine.stats())
            else:
                self._send(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/predict":
                self._send(404, {"error": f"unknown path {self.path!r}"})
                return
            topk = None
            for part in query.split("&"):
                if part.startswith("topk="):
                    try:
                        topk = int(part[5:])
                    except ValueError:
                        self._send(400, {"error": f"bad topk {part[5:]!r}"})
                        return
                    if topk <= 0:
                        self._send(
                            400, {"error": f"topk must be positive, got {topk}"}
                        )
                        return
            length = int(self.headers.get("Content-Length") or 0)
            if length <= 0:
                self._send(400, {"error": "empty body (expected image bytes)"})
                return
            data = self.rfile.read(length)
            try:
                rec = engine.predict_image(data, topk=topk)
            except Exception as e:  # bad image etc. → client error, not 500
                self._send(400, {"error": f"cannot decode image: {e}"})
                return
            self._send(200, rec)

    class PooledHTTPServer(ThreadingHTTPServer):
        daemon_threads = True

        def __init__(self, *a, **kw):
            from concurrent.futures import ThreadPoolExecutor

            super().__init__(*a, **kw)
            self._pool = ThreadPoolExecutor(
                max_workers=pool_threads, thread_name_prefix="hvt-serve"
            )

        # socketserver.ThreadingMixIn's process_request spawns a new thread
        # per connection; route through the pool instead.
        def process_request(self, request, client_address):
            self._pool.submit(
                self.process_request_thread, request, client_address
            )

        def server_close(self):
            super().server_close()
            self._pool.shutdown(wait=False)

    return PooledHTTPServer((host, port), Handler)


def serve(config: config_lib.Config, *, host: str = "127.0.0.1",
          port: int = 8000, **engine_kwargs) -> None:
    engine = InferenceEngine(config, **engine_kwargs)
    _serve_forever(engine, host, port, config.run_name)


def serve_artifact(path: str, *, host: str = "127.0.0.1", port: int = 8000,
                   **engine_kwargs) -> None:
    """Serve a StableHLO export (hvt/tools/export_serving.py) directly:
    no config tree, dataset, or checkpoint needed at serving time."""
    engine = InferenceEngine.from_artifact(path, **engine_kwargs)
    _serve_forever(engine, host, port, f"artifact:{path}")


def _serve_forever(engine: InferenceEngine, host: str, port: int,
                   label: str) -> None:
    server = make_server(engine, host, port)
    print(f"[{label}] serving {engine.model_name} on "
          f"http://{host}:{server.server_address[1]} "
          f"(POST /predict, GET /healthz)")
    try:
        server.serve_forever()
    finally:  # Ctrl-C / shutdown(): retire the batcher cleanly
        engine.close()
