"""Analytic per-component roofline for the SD-1.5 CFG step (VERDICT r4
item 3): map every ms of the measured 54.2 ms step to a floor-justified
line. The device trace is unavailable through the tunnel (jax.profiler
captures host events only — scripts/profile_unet.py), so the roofline is
built analytically: exact FLOP counts enumerated from the UNet build plan,
attainable rates from the chip ceilings this repo has MEASURED in
isolation (scripts/perf_conv*.py, perf_attn*.py, perf_ff.py), compared
against the marginal ablation budget (scripts/perf_budget.py).

Run: python scripts/roofline.py   (host-only, no TPU needed)
"""
import jax

from complex_prompt_diffusion_tpu import models as M
from complex_prompt_diffusion_tpu.models.unet import build_plan

cfg = M.UNetConfig.sd15()
B = 8           # CFG megabatch at bench batch 4
HW0 = 64        # 512px latent grid
KV = 77
CTX = 768

fl = {"attn_self": 0, "attn_cross": 0, "ff": 0, "proj": 0,
      "conv3": 0, "upconv": 0, "conv1": 0, "emb": 0}

ib, mid, ob = build_plan(cfg)


def res_flops(cin, cout, hw, mode):
    hw_out = hw * 2 if mode == "up" else (hw // 2 if mode == "down" else hw)
    c3 = 2 * 9 * hw * hw * cin * cout + 2 * 9 * hw_out * hw_out * cout * cout
    c1 = 2 * hw * hw * cin * cout if cin != cout else 0
    emb = 2 * 4 * cfg.model_channels * cout  # per-sample time-emb linear
    return c3, c1, emb


def attn_flops(ch, heads, dh, depth, hw):
    S = hw * hw
    proj = 2 * 2 * S * ch * ch  # proj_in + proj_out (1x1 as matmul)
    per_block = 0
    self_mm = 0
    cross_mm = 0
    ff = 0
    for _ in range(depth):
        proj += 2 * S * ch * (3 * ch)          # fused qkv
        proj += 2 * S * ch * ch                # self out-proj
        self_mm += 2 * 2 * S * S * ch          # scores + att@V
        proj += 2 * S * ch * ch                # cross q
        proj += 2 * 2 * KV * CTX * ch          # cross k, v (hoisted, tiny)
        cross_mm += 2 * 2 * S * KV * ch
        proj += 2 * S * ch * ch                # cross out-proj
        ff += 2 * S * ch * (8 * ch) + 2 * S * (4 * ch) * ch  # GEGLU
    return self_mm, cross_mm, ff, proj + per_block


def walk(blocks, hw):
    for block in blocks:
        for d in block:
            kind = d[0]
            if kind == "conv_in":
                fl["conv3"] += 2 * 9 * hw * hw * cfg.in_channels * cfg.model_channels
            elif kind == "res":
                c3, c1, emb = res_flops(d[1], d[2], hw, "none")
                fl["conv3"] += c3
                fl["conv1"] += c1
                fl["emb"] += emb
            elif kind == "attn":
                s, c, f, p = attn_flops(d[1], d[2], d[3], d[4], hw)
                fl["attn_self"] += s
                fl["attn_cross"] += c
                fl["ff"] += f
                fl["proj"] += p
            elif kind == "down":
                fl["conv3"] += 2 * 9 * (hw // 2) ** 2 * d[1] * d[1]
                hw //= 2
            elif kind == "up":
                # shipped subpixel form: 2.25x fewer FLOPs than dense
                fl["upconv"] += 2 * 9 * (hw * 2) ** 2 * d[1] * d[1] / 2.25
                hw *= 2
    return hw


hw = walk(ib, HW0)
hw = walk([mid], hw)
walk(ob, hw)
fl["conv3"] += 2 * 9 * HW0 * HW0 * cfg.model_channels * cfg.out_channels  # conv_out

for k in fl:
    fl[k] *= B

total_tf = sum(fl.values()) / 1e12
print(f"total: {total_tf:.3f} TF per CFG step (batch {B})  "
      f"[0.68 TF/img x2 sanity: {0.68 * B:.2f}]")

# measured attainable rates (TF/s) from this repo's isolation probes:
RATES = {
    "attn_self": 90.0,    # one-pass transposed kernel, d=40 lane-padded
                          # (perf_attn9/12: the d=40 head pads 40->128 on
                          # the lane dim; ~46% practical of bf16 peak)
    "attn_cross": 60.0,   # XLA fused softmax at kv=77 (perf_cross.py)
    "ff": 132.0,          # GEGLU matmuls (perf_ff.py: ~67% practical peak)
    "proj": 132.0,        # 1x1 projections = square matmuls
    "conv3": 110.0,       # XLA conv at UNet shapes (perf_conv.py: 55-60%)
    "upconv": 110.0,
    "conv1": 110.0,
    "emb": 132.0,
}
# marginal ablation budget, ms/step (scripts/perf_budget.py round-3 refresh)
MEASURED = {"attention": 16.73, "ff": 10.15, "conv3": 9.83, "upconv": 1.48,
            "gn": 1.56, "conv1": 1.27, "ln": 0.65, "non-unet": 0.69,
            "residual": 11.8}

print(f"{'class':12s} {'TF/step':>8s} {'SOL ms':>7s} {'attain ms':>9s}")
att_total = 0.0
for k, v in fl.items():
    sol = v / 197e12 * 1e3
    att = v / (RATES[k] * 1e12) * 1e3
    att_total += att
    print(f"{k:12s} {v / 1e12:8.3f} {sol:7.2f} {att:9.2f}")
print(f"{'sum':12s} {total_tf:8.3f} {total_tf / 197 * 1e3:7.2f} "
      f"{att_total:9.2f}")
print()
print("measured marginal budget sum:",
      sum(MEASURED.values()), "ms (incl. 11.8 fusion-overlap residual)")
print("attainable-at-measured-kernel-rates:", round(att_total, 1),
      "ms + bandwidth-bound GN/LN/softmax epilogues")
