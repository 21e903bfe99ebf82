"""Diagnostics tools: profile_summary parsing helpers, loader_bench smoke."""

import json
import pathlib
import subprocess
import sys

from hvt.tools import profile_summary as ps


def test_family_groups_fusion_names():
    assert ps.family("%fusion.123") == "fusion"
    assert ps.family("fusion") == "fusion"
    assert ps.family("convert_reduce_fusion.8") == "convert_reduce_fusion"
    assert ps.family("copy-start.930 = (f32[64]{0}) copy-start(...)") == "copy-start"
    assert ps.family("%loop_convolution_fusion.5") == "loop_convolution_fusion"


def test_hlo_bytes_sums_all_shapes():
    name = ("%fusion.2 = (f32[256]{0}, bf16[8,4,2]{2,1,0}) "
            "fusion(bf16[100,10]{1,0} %x, pred[7]{0} %m)")
    # 256*4 + 64*2 + 1000*2 + 7*1
    assert ps.hlo_bytes(name) == 256 * 4 + 64 * 2 + 1000 * 2 + 7
    assert ps.hlo_bytes("u32[]{:S(2)}") == 4  # scalar
    assert ps.hlo_bytes("no shapes here") == 0


def test_loader_bench_smoke(tmp_path):
    """End-to-end: fixture synthesis + both decode paths, one JSON line each."""
    out = subprocess.run(
        [sys.executable, "-m", "hvt.tools.loader_bench",
         "--batches", "1", "--batch-size", "8"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": "."},
        cwd=str(pathlib.Path(__file__).parents[1]),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.strip().splitlines()]
    paths = {r.get("path") or r.get("skipped") for r in rows}
    assert any(r.get("path") == "pil" and r["images"] == 8 for r in rows), rows
    assert "native" in paths or any("skipped" in r for r in rows)


def test_residuals_audit_tool():
    """The saved-residual audit finds flax BN's f32 saves and confirms the
    bn_custom flavor eliminates them (the BENCH.md round-3 dtype audit)."""
    from hvt.tools import residuals as RZ

    plain = RZ.audit_model("resnet_micro", batch=4, crop=32, num_classes=10)
    f32 = sum(r.nbytes for r in plain if r.dtype == "f32")
    assert f32 > 0
    assert any("normalization" in r.where for r in plain)

    custom = RZ.audit_model(
        "resnet_micro", batch=4, crop=32, num_classes=10,
        model_args={"bn_custom": True},
    )
    f32_custom = sum(r.nbytes for r in custom if r.dtype == "f32")
    assert f32_custom < f32 / 10  # full-size f32 saves gone

    text = RZ.summarize(plain, 4)
    assert "MB/image" in text and "largest tensors" in text


def test_run_summary_parses_runlogger_output(tmp_path):
    """run_summary digests a real RunLogger stream (config dump + jsonl)."""
    from hvt.tools import run_summary as RS
    from hvt.utils.logging import RunLogger

    logger = RunLogger(tmp_path, "sumrun")
    logger.log_config("model:\n  name: resnet_micro\n")  # non-JSON lines
    logger.log(1, {"loss": 4.0, "acc@1": 0.1}, prefix="train")
    logger.log(2, {"loss": 2.5, "acc@1": 0.4}, prefix="train")
    logger.log(2, {"acc@1": 0.3}, prefix="eval")
    logger.close()

    records = RS.parse_records(tmp_path / "logs" / "log0.txt")
    summary = RS.summarize(records)
    assert summary["steps"] == 2 and summary["records"] == 3
    m = summary["metrics"]
    assert m["train/loss"] == {"first": 4.0, "last": 2.5, "best": 2.5, "n": 2}
    assert m["train/acc@1"]["best"] == 0.4  # higher-is-better for accuracy
    assert m["eval/acc@1"]["n"] == 1
    text = RS.format_summary(summary, "x")
    assert "train/loss" in text and "best" in text

    # CLI over the run dir
    import pathlib
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "hvt.tools.run_summary", str(tmp_path), "--json"],
        capture_output=True, text=True, timeout=120,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAX_PLATFORMS": "cpu", "PYTHONPATH": "."},
        cwd=str(pathlib.Path(__file__).parents[1]),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert json.loads(out.stdout.strip())["steps"] == 2


def test_kernel_routing_matches_model_defaults():
    """The routing report pins the production tables after the round-4
    scoped-VMEM raise (BENCH.md "Stage-4 routing re-verdict"): ALL FOUR
    SwinV2-T stages fuse; swinv2_large's stage 4 (C=1536) still exceeds
    the budget and routes XLA under fallback_xla (default), packed
    without it."""
    from hvt.tools import kernel_routing as KR

    rows = KR.stage_table("swinv2_tiny", 224)
    assert [r["attn"] for r in rows] == ["fused-half"] * 4
    assert [r["mlp"] for r in rows] == ["fused-half"] * 4
    assert rows[3]["c"] == 768 and rows[3]["attn_fits_vmem"]

    large = KR.stage_table("swinv2_large", 224)
    assert [r["attn"] for r in large] == ["fused-half"] * 3 + ["xla"]
    assert large[3]["c"] == 1536 and not large[3]["attn_fits_vmem"]
    # Round 5: the big-C MLP streams its hidden dim in chunks instead of
    # falling back (VERDICT r4 item 5); the knob reverts to round-4 xla.
    assert large[3]["mlp"].startswith("fused-chunked-")
    assert KR.stage_table("swinv2_large", 224,
                          fuse_mlp_chunked=False)[3]["mlp"] == "xla"

    legacy = KR.stage_table("swinv2_large", 224, fallback_xla=False)
    assert legacy[3]["attn"] == "packed-pallas"

    off = KR.stage_table("swinv2_tiny", 224, fuse=False)
    assert all(r["attn"] == "packed-pallas" and r["mlp"] == "xla" for r in off)

    # The flags must mirror the live module's routing inputs: the table's
    # fits_vmem verdicts are computed with the same function the model calls.
    from hvt.models import swinv2
    m = swinv2.swinv2_tiny(10)
    assert m.fuse_attn_train and m.fallback_xla  # defaults the table assumes


def test_train_input_bench_smoke_cpu(tmp_path):
    """train_input_bench (round 5, VERDICT r4 item 4) runs end-to-end on a
    tiny fixture: all three rates positive, predictions bracket sanely.
    On the CPU backend device work IS host work, so combined ~ serial —
    the overlap claim itself is chip-only (BENCH.md)."""
    from hvt.tools import train_input_bench as T

    root = T.make_fixture(str(tmp_path / "ds"), 16, (64, 48))
    row = T.measure(root, batch=8, steps=3, workers=1, image=32,
                    model_name="resnet_micro", classes=4)
    assert row["host_only_img_s"] > 0
    assert row["device_only_img_s"] > 0
    assert row["combined_img_s"] > 0
    assert row["predicted_serial_img_s"] <= row["predicted_overlap_img_s"]


def test_roofline_probes_smoke_cpu():
    """The roofline device probes run on any backend (CPU here): they
    return positive, finite rates with the documented fields."""
    from hvt.tools import roofline

    mm = roofline.matmul_tflops(128, chain=2, repeats=1)
    assert mm["tflops"] > 0 and mm["probe"].endswith("128")
    bw = roofline.hbm_bandwidth_gbs(mb=1, chain=2, repeats=1)
    assert bw["gbs"] > 0
    cp = roofline.hbm_copy_gbs(mb=1, chain=2, repeats=1)
    assert cp["gbs"] > 0


def test_doctor_cpu_backend():
    """The doctor's checks pass on the CPU backend: the device probe runs
    in a subprocess (so a wedged accelerator tunnel can only ever surface
    as a timeout, never a hang) and the native/cache checks report."""
    from hvt.tools import doctor

    report = doctor.run(platform="cpu", timeout=300.0)
    dev = report["checks"]["device"]
    assert dev["status"] == "ok", dev
    assert dev["platform"] == "cpu" and dev["n_devices"] >= 1
    assert report["checks"]["versions"]["status"] == "ok"
    assert report["checks"]["compile_cache"]["status"] in ("ok", "warn")
    assert report["status"] != "FAIL"


def test_doctor_wedged_tunnel_times_out_not_hangs():
    """A hung backend init must become a bounded FAIL: with an impossible
    probe budget the check reports 'no response', exit path non-zero."""
    from hvt.tools import doctor

    dev = doctor.check_device(platform="cpu", timeout=0.05)
    assert dev["status"] == "FAIL"
    assert "no response" in dev["detail"]
    report = {"status": "FAIL", "checks": {"device": dev}}
    assert report["status"] == "FAIL"
