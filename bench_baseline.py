"""Measure the PyTorch-CPU reference throughput for the bench baseline.

The reference repo publishes no numbers (BASELINE.md), so the baseline is
self-measured: a plain-torch reimplementation of the AVMnistMixerMultiLoss
hot loop (M2-Mixer-B geometry: `/root/reference/cfg/avmnist/
avmnist_m2-mixer_B.yml`, forward math of `/root/reference/modules/mixer.py`
and `/root/reference/models/avmnist.py:236-312`), timed as full training
steps (forward + 3 CE losses + backward + Adam) on CPU at batch 32.

Both a 1-thread and an all-cores run are recorded (the honest comparison
point is the all-cores number; bench.py reports vs_baseline against it and
vs_baseline_1t against the single-thread run). Results are cached in
BASELINE_MEASURED.json for bench.py.

Run once: python bench_baseline.py
"""

import json
import time

import torch
from torch import nn


class FF(nn.Module):
    def __init__(self, dim, hidden, out=None):
        super().__init__()
        self.a = nn.Linear(dim, hidden)
        self.b = nn.Linear(hidden, out or dim)

    def forward(self, x):
        return self.b(torch.nn.functional.gelu(self.a(x)))


class Block(nn.Module):
    def __init__(self, hidden, n_tok, token_dim, channel_dim):
        super().__init__()
        self.n1 = nn.LayerNorm(hidden)
        self.tok = FF(n_tok, token_dim)
        self.n2 = nn.LayerNorm(hidden)
        self.ch = FF(hidden, channel_dim)

    def forward(self, x):
        x = x + self.tok(self.n1(x).transpose(1, 2)).transpose(1, 2)
        return x + self.ch(self.n2(x))


class Mixer(nn.Module):
    def __init__(self, in_ch, hidden, patch, img, n_blocks, token_dim, channel_dim):
        super().__init__()
        self.embed = nn.Conv2d(in_ch, hidden, patch, patch)
        n_tok = (img // patch) ** 2
        self.blocks = nn.Sequential(*[Block(hidden, n_tok, token_dim, channel_dim) for _ in range(n_blocks)])
        self.norm = nn.LayerNorm(hidden)

    def forward(self, x):
        x = self.embed(x).flatten(2).transpose(1, 2)
        return self.norm(self.blocks(x))


class M2MixerB(nn.Module):
    def __init__(self):
        super().__init__()
        h, t, c = 128, 32, 3072
        self.img = Mixer(1, h, 14, 28, 4, t, c)
        self.aud = Mixer(1, h, 56, 112, 4, t, c)
        self.fuse_blocks = nn.Sequential(*[Block(h, 8, t, 3078) for _ in range(2)])
        self.fuse_norm = nn.LayerNorm(h)
        self.head_i = nn.Linear(h, 10)
        self.head_a = nn.Linear(h, 10)
        self.head_f = nn.Linear(h, 10)

    def forward(self, image, audio):
        ti = self.img(image)
        ta = self.aud(audio)
        tf = self.fuse_norm(self.fuse_blocks(torch.cat([ti, ta], dim=1)))
        return self.head_i(ti.mean(1)), self.head_a(ta.mean(1)), self.head_f(tf.mean(1))


def measure(batch=32, steps=30, warmup=5):
    torch.manual_seed(0)
    model = M2MixerB()
    opt = torch.optim.Adam(model.parameters(), lr=1e-2)
    ce = nn.CrossEntropyLoss()
    image = torch.rand(batch, 1, 28, 28)
    audio = torch.rand(batch, 1, 112, 112)
    label = torch.randint(0, 10, (batch,))

    def step():
        opt.zero_grad()
        li, la, lf = model(image, audio)
        w = 1.0 / 3
        loss = (w * ce(lf, label) + w * ce(li, label) + w * ce(la, label)) * 3
        loss.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return steps * batch / dt


def main(batch=32, steps=30):
    all_threads = torch.get_num_threads()
    sps_all = measure(batch, steps)
    torch.set_num_threads(1)
    sps_1t = measure(batch, steps)
    out = {
        # legacy key kept = the HONEST (all-cores) baseline
        "torch_cpu_samples_per_sec": sps_all,
        "torch_cpu_samples_per_sec_all_threads": sps_all,
        "torch_cpu_samples_per_sec_1t": sps_1t,
        "batch_size": batch,
        "steps": steps,
        "config": "avmnist_m2-mixer_B",
        "threads": all_threads,
    }
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
