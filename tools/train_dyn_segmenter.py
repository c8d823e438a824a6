"""Train the tiny dynamic-object segmenter (VERDICT r4 #8).

The reference wires a Mask-RCNN through cv::dnn (DynamicExtractor.cc) —
an appearance-based segmenter for known dynamic classes (people, cars).
No pretrained weights ship in either repo; this trains the synthetic
analogue: a 3-layer conv net that segments the STRIPED texture family
used for dynamic objects in the synthetic worlds (static landmarks are
ring/wedge disks — a distinct appearance class, as person/car is to
building).  ~1.3k parameters, exported to data/dyn_segmenter.npz;
inference is plain numpy (core stays framework-free, like the native/
fallbacks).

    python tools/train_dyn_segmenter.py          # writes data/dyn_segmenter.npz
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch
import torch.nn as nn

from swarmmap_tpu.core.dynamic import stripe_texture
from swarmmap_tpu.utils import datasets


def make_batch(rng, samples, n=16, hw=(120, 160)):
    """Random crops of rendered (frame, ground-truth dyn mask) pairs —
    the EXACT distribution the deployed segmenter sees: striped flock
    patches (with their corner disks) over ring/wedge landmark fields."""
    imgs = np.zeros((n, 1) + hw, np.float32)
    labels = np.zeros((n, 1) + hw, np.float32)
    for i in range(n):
        base, mask = samples[rng.randint(len(samples))]
        y0 = rng.randint(0, base.shape[0] - hw[0])
        x0 = rng.randint(0, base.shape[1] - hw[1])
        imgs[i, 0] = base[y0:y0 + hw[0], x0:x0 + hw[1]] / 255.0
        labels[i, 0] = mask[y0:y0 + hw[0], x0:x0 + hw[1]]
    return torch.from_numpy(imgs), torch.from_numpy(labels)


def render_pool(seeds=(0, 1, 2), frames_per=8):
    samples = []
    for seed in seeds:
        w = datasets.make_world(n_points=350, n_frames=frames_per,
                                hw=(240, 320), seed=seed, motion="arc",
                                n_dynamic=60)
        for i in range(frames_per):
            img, mask = datasets.render_frame(w, i, return_dyn_mask=True)
            samples.append((img.astype(np.float32),
                            mask.astype(np.float32)))
    return samples


def main():
    rng = np.random.RandomState(0)
    samples = render_pool()

    net = nn.Sequential(
        nn.Conv2d(1, 8, 5, padding=2), nn.ReLU(),
        nn.Conv2d(8, 8, 5, padding=2), nn.ReLU(),
        nn.Conv2d(8, 1, 3, padding=1),
    )
    opt = torch.optim.Adam(net.parameters(), lr=3e-3)
    loss_fn = nn.BCEWithLogitsLoss()
    for step in range(400):
        x, y = make_batch(rng, samples)
        opt.zero_grad()
        out = net(x)
        loss = loss_fn(out, y)
        loss.backward()
        opt.step()
        if step % 50 == 0:
            with torch.no_grad():
                acc = (((out > 0) == (y > 0.5)).float().mean())
            print(f"step {step}: loss {loss.item():.4f} acc {acc:.3f}",
                  flush=True)

    # export: conv weights [Cout,Cin,kh,kw] + biases
    state = {}
    idx = 0
    for layer in net:
        if isinstance(layer, nn.Conv2d):
            state[f"w{idx}"] = layer.weight.detach().numpy()
            state[f"b{idx}"] = layer.bias.detach().numpy()
            idx += 1
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "swarmmap_tpu", "data",
        "dyn_segmenter.npz")
    np.savez_compressed(out_path, **state)
    print("saved", out_path,
          f"({sum(v.size for v in state.values())} params)")

    # sanity: held-out composite
    from swarmmap_tpu.core.dynamic import load_segmenter
    seg = load_segmenter()
    x, y = make_batch(np.random.RandomState(99),
                      render_pool(seeds=(9,), frames_per=4), n=4)
    ious = []
    for i in range(4):
        m = seg((x[i, 0].numpy() * 255.0))
        gt = y[i, 0].numpy() > 0.5
        inter = (m & gt).sum()
        union = (m | gt).sum()
        ious.append(inter / max(union, 1))
    print("held-out IoU:", [round(float(v), 3) for v in ious])


if __name__ == "__main__":
    main()
