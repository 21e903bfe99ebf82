"""Serving latency/throughput benchmark for the inference engine.

No reference counterpart (the reference has no serving path) — this closes
the deployment measurement loop next to bench.py's throughput numbers:
N concurrent clients drive the engine's request/micro-batching path and the
tool reports end-to-end per-request latency percentiles plus aggregate
throughput as ONE JSON line. By default clients call
``InferenceEngine.predict_image`` directly (the engine + batcher + compiled
step, no socket noise); ``--http`` routes every request through the real
stdlib HTTP server instead.

Usage (config mode — weights resolve as in serve.py, random init without a
``load_path``, which is latency-faithful):

    python -m hvt.tools.serve_bench --machine m.yaml --exp e.yaml \
        [--clients 8] [--requests 25] [--batch 0] [--http]

Artifact mode (StableHLO export, incl. batch buckets / int8):

    python -m hvt.tools.serve_bench --artifact artifact_dir/ [--clients 8]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time

import numpy as np


def _jpeg_bytes(side: int = 320, seed: int = 0) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(
        rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
    ).save(buf, format="JPEG")
    return buf.getvalue()


def run_bench(engine, *, clients: int, requests: int,
              http: bool = False) -> dict:
    """Drive `engine` with `clients` threads x `requests` each; return the
    latency/throughput record. Per-request latency includes decode, the
    batcher queue, the compiled step, and top-k decode (and the HTTP
    round-trip with http=True)."""
    payload = _jpeg_bytes()
    server = None
    if http:
        import urllib.request

        from hvt.downstream import serve as serve_lib

        server = serve_lib.make_server(engine, port=0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        url = (
            f"http://127.0.0.1:{server.server_address[1]}/predict"
        )

        def one():
            req = urllib.request.Request(url, data=payload, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                json.loads(r.read())
    else:
        def one():
            engine.predict_image(payload)

    one()  # warm the full path once per mode (buckets pre-warmed by engine)

    latencies_ms: list[float] = []
    failures: list[str] = []
    lock = threading.Lock()
    start_barrier = threading.Barrier(clients + 1)

    def client():
        mine = []
        fails = []
        start_barrier.wait()
        for _ in range(requests):
            t0 = time.perf_counter()
            try:
                one()
            except Exception as e:  # count it, keep the client alive
                fails.append(f"{type(e).__name__}: {e}")
                continue
            mine.append((time.perf_counter() - t0) * 1e3)
        with lock:
            latencies_ms.extend(mine)
            failures.extend(fails)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    start_barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    if server is not None:
        server.shutdown()
        server.server_close()  # release the socket + worker pool

    if not latencies_ms:
        raise RuntimeError(
            f"every request failed ({len(failures)}); first: "
            f"{failures[0] if failures else 'n/a'}"
        )
    lat = np.asarray(latencies_ms)
    return {
        "metric": "serving_latency",
        "model": engine.model_name,
        "mode": "http" if http else "engine",
        "clients": clients,
        "requests_per_client": requests,
        "batch": engine.batch,
        "failed_requests": len(failures),
        "throughput_rps": round(len(lat) / elapsed, 2),
        "latency_ms": {
            "p50": round(float(np.percentile(lat, 50)), 2),
            "p90": round(float(np.percentile(lat, 90)), 2),
            "p99": round(float(np.percentile(lat, 99)), 2),
            "mean": round(float(lat.mean()), 2),
            "max": round(float(lat.max()), 2),
        },
    }


def main(argv=None) -> dict:
    from hvt import config as config_lib
    from hvt.downstream import serve as serve_lib

    parser = argparse.ArgumentParser(description=__doc__)
    artifact_mode = any(
        a == "--artifact" or a.startswith("--artifact=")
        for a in (argv if argv is not None else sys.argv[1:])
    )
    if artifact_mode:
        parser.add_argument("--artifact", required=True)
    else:
        config_lib.add_exp_args(parser)
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--requests", type=int, default=25)
    parser.add_argument("--batch", type=int, default=0)
    parser.add_argument("--topk", type=int, default=5)
    parser.add_argument("--http", action="store_true",
                        help="measure through the real HTTP server")
    args = parser.parse_args(argv)
    from hvt.utils import compile_cache

    compile_cache.enable()  # repeat benchmark runs skip the engine compile
    if artifact_mode:
        engine = serve_lib.InferenceEngine.from_artifact(
            args.artifact, batch=args.batch, topk=args.topk
        )
    else:
        config = config_lib.load(machine=args.machine, exps=args.exp)
        engine = serve_lib.InferenceEngine(
            config, batch=max(1, args.batch), topk=args.topk
        )
    try:
        record = run_bench(
            engine, clients=args.clients, requests=args.requests,
            http=args.http,
        )
    finally:
        engine.close()
    print(json.dumps(record))
    return record


if __name__ == "__main__":
    main()
