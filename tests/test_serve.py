"""HTTP inference server (hvt/downstream/serve.py)."""

import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

from hvt import config as C
from hvt.downstream import serve as serve_lib

NAMES = [
    "00001_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_badius",
    "00002_animalia_chordata_aves_accipitriformes_accipitridae_accipiter_cooperii",
    "00003_animalia_chordata_aves_accipitriformes_pandionidae_pandion_haliaetus",
]


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve-ds")
    rng = np.random.default_rng(0)
    for split, k in [("train", 2), ("val", 2)]:
        for name in NAMES:
            d = root / split / name
            d.mkdir(parents=True)
            for i in range(k):
                Image.fromarray(
                    rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
                ).save(d / f"{i}.jpg")

    cfg = C.loads(
        {
            "run_name": "serve-test",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"datasets": {"fix": str(root)},
                        "save_root": str(tmp_path_factory.mktemp("serve-runs"))},
            "eval_dataset": {"path": "fix", "crop_size": 32, "resize_size": 34,
                             "global_batch_size": 4},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    engine = serve_lib.InferenceEngine(cfg, topk=3)
    server = serve_lib.make_server(engine, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, root
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, data):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(served):
    base, _ = served
    status, body = _get(f"{base}/healthz")
    assert status == 200
    assert body["status"] == "ok"
    assert body["model"] == "resnet_micro"
    assert body["classes"] == 3


def test_predict_roundtrip(served):
    base, root = served
    jpg = next((root / "val" / NAMES[0]).glob("*.jpg")).read_bytes()
    status, rec = _post(f"{base}/predict", jpg)
    assert status == 200
    assert len(rec["class_ids"]) == 3
    assert rec["classes"][0] in NAMES
    assert rec["probs"] == sorted(rec["probs"], reverse=True)
    assert 0.0 < sum(rec["probs"]) <= 1.0 + 1e-6

    # topk query param limits the response
    status, rec2 = _post(f"{base}/predict?topk=1", jpg)
    assert status == 200
    assert len(rec2["class_ids"]) == 1
    assert rec2["class_ids"][0] == rec["class_ids"][0]

    # arbitrary image sizes are resized server-side
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (77, 50, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    status, rec3 = _post(f"{base}/predict", buf.getvalue())
    assert status == 200 and len(rec3["class_ids"]) == 3


def test_bad_requests(served):
    base, _ = served
    status, body = _post(f"{base}/predict", b"this is not an image")
    assert status == 400 and "cannot decode" in body["error"]
    status, body = _post(f"{base}/predict", b"")
    assert status == 400
    status, body = _post(f"{base}/nope", b"x")
    assert status == 404
    # Non-positive topk must 400, not slice negatively / return empty 200s.
    jpg = next((served[1] / "val" / NAMES[0]).glob("*.jpg")).read_bytes()
    for bad in ("0", "-1", "-5"):
        status, body = _post(f"{base}/predict?topk={bad}", jpg)
        assert status == 400 and "positive" in body["error"], bad


def test_engine_close_semantics(tmp_path):
    """close() retires the batcher without stranding callers: in-flight
    requests finish or fail cleanly, later requests raise instead of
    hanging, and close() is idempotent."""
    from concurrent.futures import ThreadPoolExecutor

    cfg = C.loads(
        {
            "run_name": "serve-close",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    engine = serve_lib.InferenceEngine(cfg, topk=2, batch=4)
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (36, 36, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    blob = buf.getvalue()

    def call(_):
        try:
            return engine.predict_image(blob)
        except RuntimeError as e:
            return e

    # Warm the compiled step outside the timed window: the first predict
    # pays the XLA compile, which on this 1-core host can exceed a race
    # timeout under load (observed once as a transient failure).
    assert isinstance(engine.predict_image(blob), dict)

    # A burst racing close(): every caller returns (result or clean error)
    # within the pool timeout — nobody hangs on a dead batcher.
    with ThreadPoolExecutor(8) as pool:
        futures = [pool.submit(call, i) for i in range(8)]
        engine.close()
        results = [f.result(timeout=120) for f in futures]
    for r in results:
        assert isinstance(r, (dict, RuntimeError))

    with pytest.raises((RuntimeError, ValueError)):
        engine.predict_image(blob)
    engine.close()  # idempotent

    with pytest.raises(ValueError, match="positive"):
        engine.predict_image(blob, topk=0)


def test_hierarchical_engine(tmp_path):
    """Multitask model + hierarchical decode: responses carry tier_ids and
    the top-k stays within the predicted parent's branch."""
    from hvt import hierarchy as hierarchy_lib
    from hvt.data import build_loader

    cfg = C.loads(
        {
            "run_name": "serve-hier",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "hierarchy": {"variant": "multitask",
                          "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 6,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    engine = serve_lib.InferenceEngine(cfg, topk=4, hierarchical=True)
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (36, 36, 3), dtype=np.uint8)
    ).save(buf, format="JPEG")
    rec = engine.predict_image(buf.getvalue())
    assert len(rec["tier_ids"]) == 7
    loader, _ = build_loader(cfg, is_train=False)
    lookups = hierarchy_lib.parent_lookup_from_classes(loader.dataset.classes)
    parent = rec["tier_ids"][-2]
    for cid in rec["class_ids"]:
        assert lookups[-1][cid] == parent


def test_concurrent_requests_microbatch_correctly(tmp_path):
    """Concurrent requests coalesce into shared device dispatches and every
    caller gets the result for *its* image (no row mix-ups)."""
    from concurrent.futures import ThreadPoolExecutor

    cfg = C.loads(
        {
            "run_name": "serve-mb",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 5,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    engine = serve_lib.InferenceEngine(cfg, topk=3, batch=4)

    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(8):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
        ).save(buf, format="PNG")  # lossless: identical pixels both runs
        blobs.append(buf.getvalue())

    sequential = [engine.predict_image(b) for b in blobs]
    with ThreadPoolExecutor(8) as pool:
        concurrent = list(pool.map(engine.predict_image, blobs))
    assert concurrent == sequential


@pytest.mark.slow
def test_serve_cli_entry(tmp_path):
    """serve.py boots from the CLI, answers /healthz and /predict, and shuts
    down cleanly on SIGTERM."""
    import pathlib
    import signal
    import socket
    import subprocess
    import sys
    import time

    root = tmp_path / "ds"
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for name in NAMES:
            d = root / split / name
            d.mkdir(parents=True)
            Image.fromarray(
                rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
            ).save(d / "0.jpg")
    (tmp_path / "machine.yaml").write_text(
        f"machine:\n  datasets:\n    fix: {root}\n  save_root: {tmp_path}/runs\n"
    )
    (tmp_path / "exp.yaml").write_text(
        "run_name: serve-cli\n"
        "model: {name: resnet_micro}\n"
        "eval_dataset: {path: fix, crop_size: 32, resize_size: 34,\n"
        "  global_batch_size: 4}\n"
        "loader: {num_workers: 1, prefetch_batches: 1}\n"
    )

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    repo = pathlib.Path(__file__).parents[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(repo))
    proc = subprocess.Popen(
        [sys.executable, "serve.py",
         "--machine", str(tmp_path / "machine.yaml"),
         "--exp", str(tmp_path / "exp.yaml"),
         "--port", str(port), "--topk", "2"],
        cwd=str(repo), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 120
        status = None
        while time.time() < deadline:
            try:
                status, body = _get(f"http://127.0.0.1:{port}/healthz")
                break
            except OSError:
                if proc.poll() is not None:
                    pytest.fail(proc.stdout.read()[-3000:])
                time.sleep(0.5)
        assert status == 200, "server never came up"
        jpg = next((root / "val" / NAMES[0]).glob("*.jpg")).read_bytes()
        status, rec = _post(f"http://127.0.0.1:{port}/predict", jpg)
        assert status == 200 and len(rec["class_ids"]) == 2
    finally:
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=30)


def test_hierarchical_engine_rejects_bad_class_names(tmp_path, monkeypatch):
    """The engine shares predict's taxonomy validation: non-taxonomy class
    names fail fast with a clear error instead of building garbage lookups
    (the drift the round-3 review caught)."""
    import dataclasses

    import hvt.data as data_lib

    cfg = C.loads(
        {
            "run_name": "serve-badnames",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "hierarchy": {"variant": "multitask",
                          "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 4,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 8,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )

    real_build_loader = data_lib.build_loader

    def renamed_loader(config, is_train):
        loader, info = real_build_loader(config, is_train=is_train)
        loader.dataset = dataclasses.replace(
            loader.dataset, classes=[f"plain-{i}" for i in range(4)]
        )
        return loader, info

    monkeypatch.setattr(data_lib, "build_loader", renamed_loader)
    with pytest.raises(ValueError, match="taxonomy-formatted"):
        serve_lib.InferenceEngine(cfg, hierarchical=True)


def test_bucket_engine_concurrent_requests(tmp_path):
    """16 threads hammer a bucket-artifact engine: every request succeeds
    and decodes to a valid record — shakes races in the smallest-fit
    bucket dispatch (single batcher thread, per-request events)."""
    import io
    import threading

    import numpy as np
    from PIL import Image

    from hvt import config as C
    from hvt.downstream import serve as serve_lib
    from hvt.tools import export_serving

    cfg = C.loads({
        "run_name": "bucket-stress",
        "seed": 0,
        "model": {"name": "resnet_micro", "args": {"dtype": "float32"}},
        "machine": {"save_root": str(tmp_path)},
        "precision": {"compute_dtype": "float32"},
        "eval_dataset": {"source": "synthetic", "synthetic_num_classes": 4,
                         "synthetic_num_samples": 8, "crop_size": 32,
                         "global_batch_size": 8},
        "loader": {"num_workers": 1, "prefetch_batches": 1},
    })
    art = export_serving.export_artifact(
        cfg, tmp_path / "art", batch=[1, 4], platforms=("cpu",)
    )
    engine = serve_lib.InferenceEngine.from_artifact(art, topk=2)
    rng = np.random.default_rng(0)
    payloads = []
    for _ in range(4):
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(buf, format="PNG")
        payloads.append(buf.getvalue())

    results: list = [None] * 16
    def hit(i):
        results[i] = engine.predict_image(payloads[i % 4], topk=2)

    try:
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None for r in results)
        for r in results:
            assert len(r["class_ids"]) == 2
            assert all(0 <= p <= 1 for p in r["probs"])
        # identical payloads must decode identically regardless of which
        # bucket dispatched them
        for i in range(4, 16):
            assert results[i]["class_ids"] == results[i % 4]["class_ids"]
    finally:
        engine.close()


def test_stats_endpoint(served):
    """GET /stats reports request/dispatch counters and batch occupancy;
    decode failures count as errors (the engine is shared module-scoped, so
    assertions are deltas)."""
    base, root = served
    _, before = _get(f"{base}/stats")
    img = next((root / "val").rglob("*.jpg"))
    for _ in range(3):
        _post(f"{base}/predict", img.read_bytes())
    status, rec = _get(f"{base}/stats")
    assert status == 200
    assert rec["requests"] >= before["requests"] + 3
    assert rec["errors"] == before["errors"]  # good requests add none
    assert rec["dispatches"] >= 1
    assert 0 < rec["mean_occupancy"] <= 1
    assert rec["mean_step_ms"] > 0

    # A corrupt payload is a counted error and a counted request.
    _post(f"{base}/predict", b"not an image")
    _, after = _get(f"{base}/stats")
    assert after["errors"] == rec["errors"] + 1
    assert after["requests"] == rec["requests"] + 1


def test_serve_bench_tool(served):
    """hvt.tools.serve_bench drives an engine and reports finite latency
    percentiles + throughput (run_bench on a live engine, 2x2 requests)."""
    from hvt.tools import serve_bench

    base, root = served
    # Reuse the served fixture's engine via a fresh tiny engine to avoid
    # cross-talk with the HTTP fixture: build one directly.
    cfg = C.loads(
        {
            "run_name": "serve-bench-test",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "machine": {"datasets": {"fix": str(root)},
                        "save_root": "/tmp/hvt-serve-bench-test"},
            "eval_dataset": {"path": "fix", "crop_size": 32,
                             "resize_size": 34, "global_batch_size": 4},
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    engine = serve_lib.InferenceEngine(cfg, topk=3, batch=2)
    try:
        rec = serve_bench.run_bench(engine, clients=2, requests=2)
    finally:
        engine.close()
    assert rec["throughput_rps"] > 0
    assert rec["latency_ms"]["p50"] > 0
    assert rec["latency_ms"]["p99"] >= rec["latency_ms"]["p50"]
    assert rec["clients"] == 2 and rec["batch"] == 2

def test_int8_multitask_hierarchical_bucket_artifact(tmp_path):
    """The full flagship serving story composed end-to-end (round-3 verdict
    #7): calibrated int8 artifact x multitask head x hierarchical decode x
    batch buckets. Mirrors the reference's constrained top-down predict
    path (reference hierarchy.py:538-597) served from a quantized
    StableHLO artifact with bucket dispatch."""
    from concurrent.futures import ThreadPoolExecutor

    from hvt import hierarchy as hierarchy_lib
    from hvt.data import build_loader
    from hvt.tools import export_serving

    cfg = C.loads(
        {
            "run_name": "serve-int8-hier",
            "seed": 0,
            "model": {"name": "resnet_micro"},
            "hierarchy": {"variant": "multitask",
                          "multitask_coeffs": [1, 1, 1, 1, 1, 1, 1]},
            "machine": {"save_root": str(tmp_path)},
            "eval_dataset": {
                "source": "synthetic", "synthetic_num_classes": 6,
                "synthetic_num_samples": 8, "crop_size": 32,
                "global_batch_size": 4,
            },
            "loader": {"num_workers": 1, "prefetch_batches": 1},
        }
    )
    art = export_serving.export_artifact(
        cfg, str(tmp_path / "art"), batch=[2, 4], platforms=("cpu",),
        quantize="int8", calibrate=4,
    )
    engine = serve_lib.InferenceEngine.from_artifact(
        str(art), hierarchical=True, topk=3
    )
    try:
        assert [s for s, _ in engine._steps] == [2, 4]  # both buckets live

        rng = np.random.default_rng(0)
        payloads = []
        for i in range(5):
            buf = io.BytesIO()
            Image.fromarray(
                rng.integers(0, 256, (36, 36, 3), dtype=np.uint8)
            ).save(buf, format="JPEG")
            payloads.append(buf.getvalue())
        with ThreadPoolExecutor(5) as pool:
            recs = list(pool.map(engine.predict_image, payloads))

        loader, _ = build_loader(cfg, is_train=False)
        lookups = hierarchy_lib.parent_lookup_from_classes(
            loader.dataset.classes
        )
        for rec in recs:
            # hierarchical decode: 7 tiers, top-k confined to the
            # predicted parent's branch
            assert len(rec["tier_ids"]) == 7
            parent = rec["tier_ids"][-2]
            for cid in rec["class_ids"]:
                assert lookups[-1][cid] == parent
        s = engine.stats()
        assert s["requests"] == 5 and s["errors"] == 0
        assert s["dispatches"] >= 1
    finally:
        engine.close()
