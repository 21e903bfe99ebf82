"""Diagnostics tools: profile_summary parsing helpers, loader_bench smoke."""

import json
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
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(line) for line in out.stdout.strip().splitlines()]
    paths = {r.get("path") or r.get("skipped") for r in rows}
    assert any(r.get("path") == "pil" and r["images"] == 8 for r in rows), rows
    assert "native" in paths or any("skipped" in r for r in rows)
