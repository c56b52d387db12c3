"""FLOPs/bytes roofline model for the render frame and the train step.

Answers "is N FPS good?" in hardware terms (VERDICT r3 missing #2): for each
pipeline stage we model the arithmetic (FLOPs), the HBM traffic (bytes), and
the stage-specific throughput ceilings measured on this chip (variadic sort
ns/element/column, per-chunk kernel floor — PERF.md "Measured TPU facts"),
then report measured time against the binding ceiling.

Peak numbers (one TPU v5e / v5 lite chip, public spec):
  - MXU: 197 TFLOP/s bf16. The compositor pins Precision.HIGHEST (f32 via
    bf16x3 passes, ~1/4 throughput) -> ~49 TFLOP/s usable for its dots.
  - VPU: 8 sublanes x 128 lanes x 4 ALUs at ~1.5 GHz ~= 6 TFLOP/s f32
    (no public spec; derived from the MXU clock implied by 197e12 /
    (2*4*128*128) = 1.5 GHz. Treat as +-2x.)
  - HBM: 819 GB/s.
Measured machine ceilings (PERF.md):
  - variadic sort: ~0.6 ns/element/column in-pipeline;
  - Pallas chunk dispatch floor: ~1 us per chunk walked (VPU pass count
    bound for [g=128, px=256] f32 working sets);
  - row gather: 3-13 ns/row depending on locality.

The model is intentionally coarse (counts dominant terms only); its job is
to rank stages by headroom and to expose which resource binds each stage,
not to predict times to the percent.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

MXU_BF16 = 197e12        # FLOP/s
MXU_F32 = MXU_BF16 / 4   # Precision.HIGHEST dots
VPU_F32 = 6e12           # FLOP/s (estimate, see module doc)
HBM_BW = 819e9           # B/s
SORT_NS_PER_ELEM_COL = 0.6
CHUNK_FLOOR_NS = 1000.0  # per Pallas chunk walked
GATHER_NS_PER_ROW = 3.0  # best-case (locality-friendly) row gather
GATHER_NS_GRID = 1.0     # bilinear grid tap (small planes stay cache/VMEM
                         # resident — the 3 ns HBM-row figure over-bounds
                         # them: measured deform 5.3 ms vs 4.8M taps)


@dataclass
class StageModel:
    name: str
    mxu_flops: float = 0.0   # f32-precision MXU dot FLOPs
    vpu_flops: float = 0.0   # elementwise/ladder FLOPs
    hbm_bytes: float = 0.0
    sort_elem_cols: float = 0.0   # sorted elements x columns
    chunks: float = 0.0           # Pallas chunks walked
    gather_rows: float = 0.0
    notes: str = ""

    def bound_s(self) -> Tuple[float, str]:
        """Lower-bound stage time and the binding resource."""
        candidates = {
            "mxu": self.mxu_flops / MXU_F32,
            "vpu": self.vpu_flops / VPU_F32,
            "hbm": self.hbm_bytes / HBM_BW,
            "sort": self.sort_elem_cols * SORT_NS_PER_ELEM_COL * 1e-9,
            "chunk-floor": self.chunks * CHUNK_FLOOR_NS * 1e-9,
            "gather": self.gather_rows * GATHER_NS_PER_ROW * 1e-9,
        }
        res = max(candidates, key=candidates.get)
        return candidates[res], res


def deform_flops(n: int, *, out_dim: int = 16, n_scales: int = 2,
                 net_width: int = 128, defor_depth: int = 0,
                 lang_dim: int = 3, sh_coeffs: int = 48,
                 grid_cached: bool = True) -> StageModel:
    """Fine-stage deformation at trajectory-render time (spatial-plane
    products cached; per-frame work = 3 time-plane bilinear gathers per
    scale + the trunk/head MLPs). Reference counterpart:
    /root/reference/scene/deformation.py:103-182."""
    feat = out_dim * n_scales
    # time planes: 3 planes x n_scales, 4 bilinear taps x out_dim channels
    # (grid taps, not HBM rows: scaled by GATHER_NS_GRID/GATHER_NS_PER_ROW)
    gather_rows = (n * 3 * n_scales * 4
                   * (GATHER_NS_GRID / GATHER_NS_PER_ROW))
    vpu = n * 3 * n_scales * out_dim * 8          # bilerp + product fold
    # trunk: feat->width (+hidden depth), heads: width->(3+3+4+1+sh+lang)
    head_out = 3 + 3 + 4 + 1 + sh_coeffs + lang_dim
    mxu = 2.0 * n * (feat * net_width
                     + defor_depth * net_width * net_width
                     + net_width * (net_width + head_out))
    bytes_ = n * 4.0 * (3 + 3 + 4 + 1 + sh_coeffs + lang_dim) * 2  # rw state
    return StageModel("deform", mxu_flops=mxu, vpu_flops=vpu,
                      hbm_bytes=bytes_, gather_rows=gather_rows,
                      notes="time-plane gathers + head MLPs")


def preprocess_model(n: int, sh_coeffs: int = 48) -> StageModel:
    """Scalarized [C, N] projection/covariance/SH stage (render/raster.py
    preprocess): ~500 VPU FLOPs per Gaussian, bandwidth ~n x 300 B."""
    return StageModel(
        "preprocess", vpu_flops=n * 500.0,
        hbm_bytes=n * 4.0 * (14 + sh_coeffs + 16),
        notes="VPU FMA chains; no matmuls")


def build_model(emitted_slots: float, budget: int, sort_cols: int,
                n: int) -> StageModel:
    """Narrow stream build: emission (VPU) + one global sort + the budgeted
    row gather from the rank-ordered table."""
    return StageModel(
        "build+sort", vpu_flops=emitted_slots * 40.0,
        sort_elem_cols=emitted_slots * sort_cols,
        gather_rows=budget + n,   # budget row gather + table permutation
        hbm_bytes=(emitted_slots * 4.0 * sort_cols * 2   # sort rw
                   + budget * 64.0 * 2 + n * 64.0 * 2),
        notes=f"{sort_cols}-col sort of {emitted_slots / 1e6:.2f}M slots")


def composite_model(chunks_walked: float, g: int, px: int,
                    c_feat: int) -> StageModel:
    """Stream compositor: per chunk one [8,g]x[8,px] power dot + one
    [c_feat,g]x[g,px] contribution dot (MXU, f32-precision) + the cumprod
    ladder and masking (~(3*log2(g)+25) VPU passes over [g,px])."""
    import math
    ladder = 3 * math.log2(g) + 25
    return StageModel(
        "composite", chunks=chunks_walked,
        mxu_flops=chunks_walked * (2.0 * 8 * g * px + 2.0 * c_feat * g * px),
        vpu_flops=chunks_walked * ladder * g * px,
        hbm_bytes=chunks_walked * g * 16 * 4.0,
        notes=f"{chunks_walked / 1e3:.1f}k chunks @ g={g}")


def frame_report(stages: List[StageModel],
                 measured_ms: Dict[str, float] | None = None,
                 frame_ms: float | None = None) -> Dict:
    """Assemble the roofline report. `measured_ms` maps stage name ->
    measured time (optional, from scripts/profile_stream.py); `frame_ms` is
    the end-to-end frame time. Returns a JSON-friendly dict including `mfu`
    (total modeled FLOPs / frame time / bf16 peak) and per-stage bound
    ratios."""
    rows = []
    tot_flops = 0.0
    for s in stages:
        bound_s, res = s.bound_s()
        row = {"stage": s.name, "bound_ms": round(bound_s * 1e3, 3),
               "bound_by": res, "notes": s.notes,
               "mxu_gflops": round(s.mxu_flops / 1e9, 2),
               "vpu_gflops": round(s.vpu_flops / 1e9, 2),
               "hbm_mb": round(s.hbm_bytes / 1e6, 1)}
        if measured_ms and s.name in measured_ms:
            m = measured_ms[s.name]
            row["measured_ms"] = round(m, 2)
            row["x_from_roofline"] = round(m / max(bound_s * 1e3, 1e-9), 1)
        tot_flops += s.mxu_flops + s.vpu_flops
        rows.append(row)
    rep = {"stages": rows, "total_gflops": round(tot_flops / 1e9, 2)}
    if frame_ms:
        rep["frame_ms"] = round(frame_ms, 2)
        rep["achieved_tflops"] = round(tot_flops / (frame_ms * 1e-3) / 1e12,
                                       3)
        rep["mfu_vs_bf16_peak"] = round(
            tot_flops / (frame_ms * 1e-3) / MXU_BF16, 5)
    return rep


def train_step_model(n: int, chunks_walked: float, g: int, px: int,
                     c_feat: int, batch: int = 1) -> List[StageModel]:
    """Train step = fwd deform/preprocess/composite + analytic-VJP backward
    (the backward kernel recomputes the forward sweep: ~2x composite work)
    + Adam update over the parameter set."""
    comp = composite_model(chunks_walked, g, px, c_feat)
    bwd = composite_model(chunks_walked, g, px, c_feat)
    bwd.name = "composite-bwd"
    bwd.mxu_flops *= 2.0
    bwd.vpu_flops *= 2.2
    bwd.hbm_bytes *= 3.0   # reads rows + writes d_rows
    adam = StageModel("adam+scatter", vpu_flops=n * 62 * 10.0,
                      hbm_bytes=n * 62 * 4.0 * 4,
                      notes="param + 2 moments rw")
    return [deform_flops(n, grid_cached=False), preprocess_model(n),
            comp, bwd, adam]
