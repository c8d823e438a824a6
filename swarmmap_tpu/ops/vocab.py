"""Bag-of-binary-words vocabulary (DBoW2-equivalent, TPU-first).

Reference spec: vendored DBoW2 TemplatedVocabulary
(/root/reference/code/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h) — a
k-ary tree over 256-bit descriptors; transform() maps a descriptor to a
leaf word plus a grouping node at (L - levelsup); frames are scored with
normalized L1.

TPU formulation: the tree is flattened into per-level dense center arrays
so transform() is L batched gather + popcount-argmin steps over the whole
keypoint set at once — no pointer chasing.  Training (hierarchical
k-medians with majority-bit centers) runs host-side in numpy; it is an
offline step, exactly like the reference's pre-trained ORBvoc.bin.
"""
from __future__ import annotations

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def _np_popcount_rows(x: np.ndarray) -> np.ndarray:
    """[..,8] u32 -> [..] bit count."""
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _np_hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """[Na,8] x [Nb,8] -> [Na,Nb]."""
    return _np_popcount_rows(np.bitwise_xor(a[:, None, :], b[None, :, :]))


def _majority_center(descs: np.ndarray) -> np.ndarray:
    """Bitwise-majority 'mean' of binary descriptors (k-medians center)."""
    bits = np.unpackbits(descs.view(np.uint8), axis=-1)  # [N,256]
    maj = (bits.sum(0) * 2 >= len(descs)).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


@dataclasses.dataclass
class Vocabulary:
    k: int
    L: int
    centers: list[np.ndarray]          # level l: [k^l, k, 8] u32 child centers
    valid: list[np.ndarray]            # level l: [k^l, k] bool
    word_weights: np.ndarray           # [k^L] f32 (idf)
    node_level: int = 2                # FeatureVector grouping level

    @property
    def n_words(self) -> int:
        return self.k**self.L

    # -- training ----------------------------------------------------------
    @classmethod
    def train(
        cls,
        descriptors: np.ndarray,
        k: int = 10,
        L: int = 3,
        seed: int = 0,
        iters: int = 6,
        node_level: int | None = None,
    ) -> "Vocabulary":
        rng = np.random.RandomState(seed)
        descriptors = np.unique(descriptors, axis=0)
        centers = [np.zeros((k**l, k, 8), np.uint32) for l in range(L)]
        valid = [np.zeros((k**l, k), bool) for l in range(L)]

        def cluster(node: int, level: int, members: np.ndarray) -> None:
            if level == L:
                return
            n = len(members)
            if n == 0:
                return
            kk = min(k, n)
            sel = rng.choice(n, size=kk, replace=False)
            cents = members[sel].copy()
            for _ in range(iters):
                d = _np_hamming(members, cents)
                assign = d.argmin(1)
                for c in range(kk):
                    grp = members[assign == c]
                    if len(grp):
                        cents[c] = _majority_center(grp)
            d = _np_hamming(members, cents)
            assign = d.argmin(1)
            centers[level][node, :kk] = cents
            valid[level][node, :kk] = True
            for c in range(kk):
                cluster(node * k + c, level + 1, members[assign == c])

        cluster(0, 0, descriptors.astype(np.uint32))

        voc = cls(
            k=k, L=L, centers=centers, valid=valid,
            word_weights=np.ones(k**L, np.float32),
            node_level=node_level if node_level is not None else max(L - 2, 1),
        )
        # idf weights from the training set
        words, _ = voc.transform_np(descriptors)
        df = np.bincount(words, minlength=k**L).astype(np.float32)
        voc.word_weights = np.log(len(descriptors) / (1.0 + df)).astype(np.float32)
        voc.word_weights = np.maximum(voc.word_weights, 1e-3)
        return voc

    # -- transform ---------------------------------------------------------
    def transform_np(self, desc: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Host transform: [N,8]u32 -> (word_id [N], node_id [N])."""
        node = np.zeros(len(desc), np.int64)
        node_at = np.zeros(len(desc), np.int64)
        for l in range(self.L):
            cents = self.centers[l][node]          # [N,k,8]
            ok = self.valid[l][node]               # [N,k]
            d = _np_popcount_rows(np.bitwise_xor(cents, desc[:, None, :]))
            d = np.where(ok, d, 1 << 20)
            child = d.argmin(1)
            node = node * self.k + child
            if l + 1 == self.node_level:
                node_at = node.copy()
        return node, node_at

    def transform(self, desc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Device transform (same math, batched gathers)."""
        from .hamming import popcount_u32

        cents = [jnp.asarray(c) for c in self.centers]
        oks = [jnp.asarray(v) for v in self.valid]
        n = desc.shape[0]
        node = jnp.zeros((n,), jnp.int32)
        node_at = jnp.zeros((n,), jnp.int32)
        for l in range(self.L):
            c = cents[l][node]                     # [N,k,8]
            ok = oks[l][node]
            d = popcount_u32(jnp.bitwise_xor(c, desc[:, None, :])).sum(-1)
            d = jnp.where(ok, d, 1 << 20)
            child = jnp.argmin(d, axis=1).astype(jnp.int32)
            node = node * self.k + child
            if l + 1 == self.node_level:
                node_at = node
        return node, node_at

    # -- scoring -----------------------------------------------------------
    def bow_vector(self, words: np.ndarray, valid: np.ndarray | None = None) -> dict[int, float]:
        """Sparse normalized BoW vector {word: weight} (DBoW2 L1 norm)."""
        if valid is not None:
            words = words[valid]
        bow: dict[int, float] = {}
        for w in words:
            bow[int(w)] = bow.get(int(w), 0.0) + float(self.word_weights[int(w)])
        norm = sum(abs(v) for v in bow.values()) or 1.0
        return {w: v / norm for w, v in bow.items()}

    @staticmethod
    def score(a: dict[int, float], b: dict[int, float]) -> float:
        """DBoW2 L1 score in [0,1]: 1 - 0.5*|va/|va| - vb/|vb||_1,
        accumulated over shared words only."""
        s = 0.0
        if len(a) > len(b):
            a, b = b, a
        for w, va in a.items():
            vb = b.get(w)
            if vb is not None:
                s += abs(va) + abs(vb) - abs(va - vb)
        return 0.5 * s

    # -- persistence -------------------------------------------------------
    def save(self, path: str | Path) -> None:
        arrs = {"k": self.k, "L": self.L, "node_level": self.node_level,
                "word_weights": self.word_weights}
        for l in range(self.L):
            arrs[f"centers_{l}"] = self.centers[l]
            arrs[f"valid_{l}"] = self.valid[l]
        np.savez_compressed(path, **arrs)

    @classmethod
    def load(cls, path: str | Path) -> "Vocabulary":
        z = np.load(path)
        k, L = int(z["k"]), int(z["L"])
        return cls(
            k=k, L=L,
            centers=[z[f"centers_{l}"] for l in range(L)],
            valid=[z[f"valid_{l}"] for l in range(L)],
            word_weights=z["word_weights"],
            node_level=int(z["node_level"]),
        )


_default_vocab: Vocabulary | None = None


def default_vocabulary() -> Vocabulary:
    """Deterministic built-in vocabulary trained on random descriptors.

    Stands in for ORBvoc.bin when no trained vocabulary is supplied
    (this environment ships no vocabulary file); random binary vectors
    give a balanced tree that works for word-gated matching, while real
    deployments should train on dataset descriptors."""
    global _default_vocab
    if _default_vocab is None:
        rng = np.random.RandomState(1234)
        descs = rng.randint(0, 2**32, size=(4000, 8), dtype=np.uint32)
        _default_vocab = Vocabulary.train(descs, k=8, L=3, seed=7)
    return _default_vocab
