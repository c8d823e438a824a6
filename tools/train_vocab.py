"""Train the shipped ORB vocabulary on rendered synthetic-world imagery.

The reference uses a ~1M-word ORBvoc trained offline on real imagery
(DBoW2 TemplatedVocabulary; loaded at System.cc:65-71).  This container
ships no vocabulary file and no datasets, so we train on REAL ORB
descriptors extracted from many rendered synthetic worlds — unlike
random bit-vectors, these have the BRIEF bit correlations that make
vocabulary discrimination non-trivial.

Output: swarmmap_tpu/data/vocab-synth-k10L4.npz (10^4 words, k=10, L=4),
picked up by ops.vocab.default_vocabulary().

Usage: python tools/train_vocab.py [--worlds 24] [--frames 12]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from swarmmap_tpu.ops import extractor
from swarmmap_tpu.ops.vocab import Vocabulary
from swarmmap_tpu.utils import datasets


def collect_descriptors(n_worlds: int, frames_per_world: int,
                        hw=(240, 320), n_features=400) -> np.ndarray:
    import jax.numpy as jnp

    out = []
    for w in range(n_worlds):
        seq = datasets.synthesize_sequence(
            n_frames=frames_per_world, hw=hw, seed=w, agent=w % 3,
            n_points=600,
        )
        for i in range(frames_per_world):
            img = seq.read(i)
            feats = extractor.extract_orb(
                jnp.asarray(img), n_features=n_features, n_levels=4, scale=1.2
            )
            desc = np.asarray(feats.desc)
            valid = np.asarray(feats.valid)
            out.append(desc[valid])
        print(f"world {w + 1}/{n_worlds}: {sum(len(x) for x in out)} descriptors",
              flush=True)
    return np.concatenate(out, 0).astype(np.uint32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=24)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1]
        / "swarmmap_tpu" / "data" / "vocab-synth-k10L4.npz"
    ))
    args = ap.parse_args()

    t0 = time.time()
    descs = collect_descriptors(args.worlds, args.frames)
    print(f"collected {len(descs)} descriptors in {time.time() - t0:.0f}s")
    t0 = time.time()
    voc = Vocabulary.train(descs, k=args.k, L=args.L, seed=7, iters=6)
    print(f"trained k={args.k} L={args.L} ({voc.n_words} words) "
          f"in {time.time() - t0:.0f}s")
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    voc.save(args.out)
    # quick self-check: words must spread over many leaves
    words, _ = voc.transform_np(descs[:20000])
    used = len(np.unique(words))
    print(f"saved {args.out}; {used} distinct words over 20k sample")


if __name__ == "__main__":
    main()
