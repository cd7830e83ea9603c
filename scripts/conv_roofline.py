#!/usr/bin/env python
"""Per-op roofline table from an op_profile JSON (VERDICT r2 item 3).

For every convolution fusion in docs/bench/op_profile_<mode>.json, parse the
operand/result shapes out of the HLO long_name, compute analytic FLOPs and
minimum HBM bytes, and report each op's achieved TFLOP/s against the tighter
of the compute roof (v5e bf16 peak) and its memory roof — i.e. how far each
kernel is from speed-of-light, attributable by layer (tf_op) and source line.

Usage: python scripts/conv_roofline.py [docs/bench/op_profile_fwd.json]
Writes: <input>_roofline.json + a printed table.
Reference cost anchor: count_flops.py:69-277.
"""
import json
import math
import re
import sys

V5E_BF16_PEAK = 197e12      # FLOP/s (bf16; 394 is int8)
V5E_HBM_BW = 819e9          # B/s

SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|pred)\[([0-9,]*)\]")


def parse_shapes(long_name):
    """All typed shapes mentioned in the HLO text, in order."""
    out = []
    for m in SHAPE_RE.finditer(long_name):
        dtype, dims = m.group(1), m.group(2)
        shape = tuple(int(x) for x in dims.split(",")) if dims else ()
        out.append((dtype, shape))
    return out


def nbytes(dtype, shape):
    size = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1}[dtype]
    return size * math.prod(shape) if shape else size


def conv_cost(shapes):
    """(flops, bytes) for a conv fusion given its HLO shapes.

    Heuristic: the weight operand is the 4-d shape with two small leading
    (spatial kernel) dims. The output is the largest NHWC activation whose
    CHANNEL (last) dim matches either kernel channel axis — in backward
    (transpose) convs the kernel's I/O roles swap, so the reduction depth is
    whichever kernel channel axis the output channel count does NOT match.
    FLOPs = 2 * output_elems * kh * kw * Cin.
    """
    weight = None
    for dtype, s in shapes:
        # HWIO kernels: square odd spatial dims (1x1 / 3x3 / ...), never a
        # batch-leading activation
        if (len(s) == 4 and s[0] == s[1] and s[0] in (1, 3, 5, 7, 9, 11, 13)
                and s[2] >= 6 and s[3] >= 6):
            if weight is None or math.prod(s) > math.prod(weight[1]):
                weight = (dtype, s)
    if weight is None:
        return None, None
    kh, kw, wa, wb = weight[1]
    # output: largest 4-d activation whose last (channel) dim matches a
    # kernel channel axis
    out = None
    for dtype, s in shapes:
        if len(s) == 4 and s != weight[1] and s[-1] in (wa, wb):
            if out is None or math.prod(s) > math.prod(out[1]):
                out = (dtype, s)
    if out is None:
        return None, None
    cout = out[1][-1]
    cin = wa if cout == wb else wb
    out_elems = math.prod(out[1])
    flops = 2.0 * out_elems * kh * kw * cin
    # min bytes: read input activation (approx out_elems * cin/cout scaled),
    # read weights, write output
    in_elems = out_elems // cout * cin
    bts = (in_elems * 2 + nbytes(*weight) + nbytes(*out))
    return flops, bts


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "docs/bench/op_profile_fwd.json"
    prof = json.load(open(path))
    rows = []
    for op in prof.get("all_ops", prof.get("top_ops", [])):
        if op.get("hlo_category") != "convolution fusion":
            continue
        flops, bts = conv_cost(parse_shapes(op.get("long_name", "")))
        if flops is None:
            rows.append(dict(name=op["name"], us=op["us_per_iter"],
                             tf_op=op.get("tf_op", ""), unparsed=True))
            continue
        t = op["us_per_iter"] * 1e-6
        achieved = flops / t
        if achieved > 1.1 * V5E_BF16_PEAK:
            # impossible rate -> the truncated HLO text parsed wrong
            rows.append(dict(name=op["name"], us=op["us_per_iter"],
                             tf_op=op.get("tf_op", ""), unparsed=True))
            continue
        compute_roof_s = flops / V5E_BF16_PEAK
        mem_roof_s = bts / V5E_HBM_BW
        roof_s = max(compute_roof_s, mem_roof_s)
        rows.append(dict(
            name=op["name"], tf_op=op.get("tf_op", "")[:80],
            us=round(op["us_per_iter"], 1),
            gflops=round(flops / 1e9, 1),
            achieved_tflops=round(achieved / 1e12, 1),
            pct_bf16_peak=round(100 * achieved / V5E_BF16_PEAK, 1),
            bound="mem" if mem_roof_s > compute_roof_s else "compute",
            pct_of_roof=round(100 * roof_s / t, 1),
        ))
    rows.sort(key=lambda r: -r["us"])
    parsed = [r for r in rows if not r.get("unparsed")]
    tot_us = sum(r["us"] for r in parsed)
    tot_fl = sum(r["gflops"] for r in parsed)
    summary = dict(
        source=path,
        conv_us_per_iter=round(tot_us, 1),
        conv_gflops=round(tot_fl, 1),
        conv_mean_pct_bf16_peak=round(100 * (tot_fl * 1e9) /
                                      (tot_us * 1e-6) / V5E_BF16_PEAK, 1),
        note=("pct_of_roof = tighter of compute/memory roofline vs measured; "
              "<100 means the kernel leaves that fraction on the table"),
        ops=rows,
    )
    out = path.replace(".json", "_roofline.json")
    json.dump(summary, open(out, "w"), indent=1)
    print(f"{'us':>8} {'GFLOP':>8} {'%peak':>6} {'%roof':>6}  bound  tf_op")
    for r in rows[:25]:
        if r.get("unparsed"):
            print(f"{r['us']:8.1f} {'?':>8} {'?':>6} {'?':>6}  ?      {r['tf_op'][:70]}")
        else:
            print(f"{r['us']:8.1f} {r['gflops']:8.1f} {r['pct_bf16_peak']:6.1f} "
                  f"{r['pct_of_roof']:6.1f}  {r['bound']:7s}{r['tf_op'][:70]}")
    print(f"\nconv total: {tot_us/1e3:.1f} ms/iter, {tot_fl/1e3:.2f} TFLOP, "
          f"mean {summary['conv_mean_pct_bf16_peak']}% of bf16 peak")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
