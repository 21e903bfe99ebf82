"""The HLO traffic-audit parser (hvt/tools/traffic_audit.py) on a hand-built
entry computation whose per-op HBM traffic is known exactly.

The real tool compiles the bench R50 step on the TPU backend (chip-only;
BENCH.md "traffic audit" records its output); CI pins the parsing rules the
numbers rest on: memory-space-aware writes, operand reads resolved through
the symbol table, DMA start/done pairing, view ops free.
"""

from hvt.tools.traffic_audit import (
    _hbm_bytes_of_spec,
    _split_elements,
    audit_hlo,
    semantic_bucket,
    shape_bytes,
)

HLO = """\
HloModule jit_step

%fused_computation.1 { internal }

ENTRY %main.1 (p0: bf16[8,4,4,16]) -> (bf16[8,4,4,16]) {
  %p0 = bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %w = bf16[16,16]{1,0:T(8,128)(2,1)} parameter(1)
  %fusion.1 = (f32[16]{0:T(256)S(1)}, bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)}) fusion(%p0, %w), kind=kOutput, calls=%fused_computation.1, metadata={op_name="jit(step)/jvp(ResNet)/stage1_block0/conv1/Conv_0/conv_general_dilated"}
  %gte.0 = f32[16]{0:T(256)S(1)} get-tuple-element(%fusion.1), index=0
  %gte.1 = bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)} get-tuple-element(%fusion.1), index=1
  %copy-start.1 = (f32[16]{0:T(256)S(1)}, f32[16]{0:T(256)}, u32[]{:S(2)}) copy-start(%gte.0)
  %copy-done.1 = f32[16]{0:T(256)S(1)} copy-done(%copy-start.1)
  %slice-start.1 = ((bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)}), bf16[8,2,4,16]{3,0,2,1:T(8,128)(2,1)S(1)}, s32[]{:S(2)}) async-start(%gte.1), calls=%async_computation
  %slice-done.1 = bf16[8,2,4,16]{3,0,2,1:T(8,128)(2,1)S(1)} async-done(%slice-start.1)
  %fusion.2 = bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)} fusion(%gte.1, %slice-done.1), kind=kLoop, calls=%fused_computation.1, metadata={op_name="jit(step)/transpose(jvp(ResNet))/stage1_block0/conv1/Conv_0/conv_general_dilated"}
  ROOT %tuple.9 = (bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)}) tuple(%fusion.2)
}
"""

ACT = 8 * 4 * 4 * 16 * 2  # bf16[8,4,4,16]
W = 16 * 16 * 2
STATS = 16 * 4  # f32[16]


def test_split_elements_handles_dims_and_aliased_groups():
    spec = ("((bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)}), "
            "bf16[8,2,4,16]{3,0,2,1:T(8,128)(2,1)S(1)}, s32[]{:S(2)})")
    elems = _split_elements(spec)
    assert len(elems) == 3
    assert [a for _, a in elems] == [1, 0, 0]
    # commas inside dims must not split elements
    assert shape_bytes(elems[1][0]) == ACT // 2


def test_space_marker_prices_vmem_as_zero():
    assert _hbm_bytes_of_spec("f32[16]{0:T(256)S(1)}") == 0
    assert _hbm_bytes_of_spec("bf16[8,4,4,16]{3,0,2,1:T(8,128)(2,1)}") == ACT


def test_audit_known_program():
    audit = audit_hlo(HLO)
    ops = audit["ops"]
    # fusion.1: reads p0 + w (HBM), writes the bf16 activation; the f32
    # stats element lands in VMEM (S(1)) and costs nothing.
    assert ops["%fusion.1"][1] == ACT + W + ACT
    # copy-start: VMEM-dest prefetch of HBM f32[16] — one HBM pass.
    assert ops["%copy-start.1"][1] == STATS
    # slice-start: reads the dest-sized slice from the HBM source, writes
    # to VMEM (free).
    assert ops["%slice-start.1"][1] == ACT // 2
    # fusion.2: reads gte.1 (HBM activation) + slice-done (VMEM, free),
    # writes its output.
    assert ops["%fusion.2"][1] == ACT + ACT
    # views and -done halves carry no traffic
    for free in ("%p0", "%gte.0", "%gte.1", "%copy-done.1", "%slice-done.1",
                 "%tuple.9"):
        assert free not in ops
    assert audit["whiles"] == 0


def test_semantic_buckets():
    fwd = "jit(step)/jvp(ResNet)/stage1_block0/conv1/Conv_0/conv_general_dilated"
    bwd = "jit(step)/transpose(jvp(ResNet))/stage1_block0/conv1/Conv_0/conv_general_dilated"
    assert semantic_bucket("%fusion.1", fwd) == "conv forward"
    assert semantic_bucket("%fusion.2", bwd) == "conv backward"
    assert semantic_bucket("%copy-start.1", "") == "spill/prefetch DMA"
    assert semantic_bucket("%fusion.9", "jit(step)/add") == "optimizer/loss/other"
