"""Measure the reference-equivalent training throughput (the denominator for
bench.py's vs_baseline).

The upstream repo published no throughput numbers and TF1+2018-GPU cannot be
rerun here, so per SURVEY.md section 6 we measure a faithful CPU rerun: the
same dilated-residual segmenter + feature critic + alternating D/G Adam
update, implemented in torch (the graph-mode-free stand-in for the TF1
reference), fp32, CPU — the reference's own framework lineage, not our JAX
stack.  Prints slices/sec; the value is recorded in BASELINE.md and bench.py.

Usage: python scripts/measure_reference_baseline.py [--iters 5] [--batch 8]
"""

import argparse
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

torch.manual_seed(0)


class ResBlock(nn.Module):
    def __init__(self, cin, cout, stride=1, dilation=1):
        super().__init__()
        pad = dilation
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, pad, dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, pad, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.proj = None
        if stride != 1 or cin != cout:
            self.proj = nn.Sequential(nn.Conv2d(cin, cout, 1, stride, bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        h = F.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        sc = self.proj(x) if self.proj else x
        return F.relu(h + sc)


def stage(cin, cout, n, stride=1, dilation=1):
    layers = [ResBlock(cin, cout, stride, dilation)]
    layers += [ResBlock(cout, cout, 1, dilation) for _ in range(n - 1)]
    return nn.Sequential(*layers)


class Segmenter(nn.Module):
    """Reference backbone: 16->512, x8 stride, dilated tail, 5-class head."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(nn.Conv2d(3, 16, 3, 1, 1, bias=False),
                                  nn.BatchNorm2d(16), nn.ReLU())
        self.rm1 = stage(16, 32, 2, stride=2)
        self.rm2 = stage(32, 64, 2, stride=2)
        self.rm3 = stage(64, 128, 2, stride=2)
        self.rm4 = stage(128, 256, 2, dilation=2)
        self.rm5 = stage(256, 512, 2, dilation=2)
        self.rm6 = stage(512, 512, 2, dilation=4)
        self.head = nn.Conv2d(512, 5, 1)

    def forward(self, x):
        h = self.stem(x)
        h = self.rm1(h)
        h = self.rm2(h)
        h = self.rm3(h)
        f4 = self.rm4(h)
        f6 = self.rm6(self.rm5(f4))
        return self.head(f6), (f4, f6)


class Critic(nn.Module):
    def __init__(self):
        super().__init__()
        self.c4 = nn.Conv2d(256, 64, 1)
        self.c6 = nn.Conv2d(512, 64, 1)
        chans = [128, 64, 128, 256, 512]
        convs = []
        for i in range(4):
            convs += [nn.Conv2d(chans[i], chans[i + 1], 4,
                                2 if i < 3 else 1, 1),
                      nn.LeakyReLU(0.2)]
        self.stack = nn.Sequential(*convs, nn.Conv2d(512, 1, 1))

    def forward(self, feats):
        f4, f6 = feats
        h = torch.cat([F.leaky_relu(self.c4(f4), 0.2),
                       F.leaky_relu(self.c6(f6), 0.2)], 1)
        return self.stack(h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    seg_src = Segmenter().eval()
    seg_tgt = Segmenter()  # DAM trainable; simplest faithful cost model:
    # full forward both paths, grads on early stages + critic only
    critic = Critic()
    for p in seg_src.parameters():
        p.requires_grad_(False)
    dam_params = (list(seg_tgt.stem.parameters()) +
                  list(seg_tgt.rm1.parameters()) +
                  list(seg_tgt.rm2.parameters()) +
                  list(seg_tgt.rm3.parameters()))
    for name, p in seg_tgt.named_parameters():
        p.requires_grad_(any(p is q for q in dam_params))
    opt_g = torch.optim.Adam([p for p in dam_params], lr=1e-4)
    opt_d = torch.optim.Adam(critic.parameters(), lr=1e-4)
    bce = nn.BCEWithLogitsLoss()

    x_src = torch.randn(args.batch, 3, 256, 256)
    x_tgt = torch.randn(args.batch, 3, 256, 256)

    def step():
        with torch.no_grad():
            _, f_src = seg_src(x_src)
        # D step
        _, f_tgt = seg_tgt(x_tgt)
        d_real = critic(f_src)
        d_fake = critic(tuple(f.detach() for f in f_tgt))
        d_loss = bce(d_real, torch.ones_like(d_real)) + \
            bce(d_fake, torch.zeros_like(d_fake))
        opt_d.zero_grad()
        d_loss.backward()
        opt_d.step()
        # G step
        _, f_tgt = seg_tgt(x_tgt)
        g_out = critic(f_tgt)
        g_loss = bce(g_out, torch.ones_like(g_out))
        opt_g.zero_grad()
        g_loss.backward()
        opt_g.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.iters):
        step()
    dt = time.perf_counter() - t0
    sps = args.iters * args.batch / dt
    print(f"reference-equivalent (torch-cpu) adaptation step: "
          f"{sps:.3f} slices/s  ({dt / args.iters:.2f} s/step, "
          f"batch {args.batch})")
    # artifact of record: bench.py reads this as its vs_baseline denominator
    # (re-run this script on new hardware and the headline ratio follows)
    import json
    import os
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "reference_baseline.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"slices_per_sec": round(sps, 4),
                   "sec_per_step": round(dt / args.iters, 4),
                   "batch": args.batch, "iters": args.iters,
                   "impl": "torch-cpu reference-equivalent "
                           "(scripts/measure_reference_baseline.py)"}, f,
                  indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
