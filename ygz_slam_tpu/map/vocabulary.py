"""Vectorized binary-descriptor vocabulary (DBoW3 replacement).

The reference vendors DBoW3 (~6 kLoC C++) and uses an ORB vocabulary
for BoW vectors + match acceleration (Frame::ComputeBoW,
src/Basic/Frame.cpp:190-201; Matcher::SearchByBoW :196-292;
SearchForTriangulation :86-193).  Its vocab file is a missing large
blob, so the reference cannot even run that path as shipped.

Here the vocabulary is a k-ary tree over 256-bit ORB descriptors kept
as dense tensors: every tree level is a [n_nodes, 8] uint32 array and
a descriptor descends by batched Hamming argmin — transform of N
descriptors is `depth` XOR+popcount sweeps, no pointer chasing.
Training is hierarchical k-medians with bitwise-majority centroids,
also fully batched.  Scores are tf-idf weighted L1 (the BoW score
DBoW3 defaults to).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import hamming


class Vocabulary(NamedTuple):
    """k-ary tree: level l has k^(l+1) nodes, children of node i at
    level l+1 are rows [i*k, (i+1)*k)."""

    nodes: tuple[jnp.ndarray, ...]  # per level: [k^(l+1), 8] uint32
    weights: jnp.ndarray            # [n_words] idf weights
    k: int
    depth: int

    @property
    def n_words(self) -> int:
        return self.nodes[-1].shape[0]


def _unpack_bits_np(desc: np.ndarray) -> np.ndarray:
    """[N, 8] uint32 -> [N, 256] uint8 bits."""
    bits = np.zeros((desc.shape[0], 256), np.uint8)
    for w in range(8):
        for b in range(32):
            bits[:, 32 * w + b] = (desc[:, w] >> b) & 1
    return bits


def _pack_bits_np(bits: np.ndarray) -> np.ndarray:
    out = np.zeros((bits.shape[0], 8), np.uint32)
    for w in range(8):
        for b in range(32):
            out[:, w] |= bits[:, 32 * w + b].astype(np.uint32) << b
    return out


def _bits_of(desc: np.ndarray) -> np.ndarray:
    """[N, 8] uint32 -> [N, 256] uint8 bits via byte view (fast path
    for real-scale offline training; bit order differs from
    _unpack_bits_np but is self-consistent within a call)."""
    by = desc.astype("<u4").view(np.uint8)          # [N, 32]
    return np.unpackbits(by, axis=1, bitorder="little")


def _pack_bits_fast(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits, axis=1, bitorder="little").view("<u4")


def _kmedians_binary(desc: np.ndarray, k: int, iters: int, rng,
                     bits: np.ndarray | None = None) -> np.ndarray:
    """Binary k-medians: Hamming assignment + bitwise-majority update.
    Returns [k, 8] uint32 centroids (host-side; training is offline).
    Pure numpy: a jax dispatch per tiny group would dominate the
    deep-vocabulary training (thousands of small groups)."""
    n = desc.shape[0]
    if n == 0:
        return np.zeros((k, 8), np.uint32)
    if bits is None:
        bits = _bits_of(desc)
    centroids = desc[rng.choice(n, size=min(k, n), replace=False)]
    if centroids.shape[0] < k:
        centroids = np.concatenate(
            [centroids, np.tile(centroids[:1], (k - centroids.shape[0], 1))]
        )
    cent_bits = _bits_of(centroids)
    for _ in range(iters):
        # Hamming via popcount on XOR of packed bytes (memory-light).
        dist = np.zeros((n, k), np.int32)
        bya = desc.astype("<u4").view(np.uint8)
        byb = centroids.astype("<u4").view(np.uint8)
        for c in range(k):
            dist[:, c] = np.bitwise_count(
                bya ^ byb[c][None, :]).sum(1, dtype=np.int32)
        assign = dist.argmin(axis=1)
        for c in range(k):
            sel = assign == c
            if not sel.any():
                centroids[c] = desc[rng.integers(n)]
            else:
                maj = (bits[sel].mean(axis=0) >= 0.5).astype(np.uint8)
                centroids[c] = _pack_bits_fast(maj[None])[0]
    return centroids.astype(np.uint32)


def train(
    descriptors: np.ndarray | jnp.ndarray,
    k: int = 8,
    depth: int = 3,
    iters: int = 6,
    seed: int = 0,
) -> Vocabulary:
    """Build a k^depth-word vocabulary from training descriptors
    (offline, host-side — DBoW3's create())."""
    rng = np.random.default_rng(seed)
    desc = np.asarray(descriptors, np.uint32)
    levels: list[np.ndarray] = []
    # Level 0: k clusters of everything.
    groups = [desc]
    for level in range(depth):
        n_nodes = k ** (level + 1)
        nodes = np.zeros((n_nodes, 8), np.uint32)
        next_groups: list[np.ndarray] = []
        for gi, g in enumerate(groups):
            cents = _kmedians_binary(g, k, iters, rng)
            nodes[gi * k : (gi + 1) * k] = cents
            if level < depth - 1:
                if len(g):
                    bya = g.astype("<u4").view(np.uint8)
                    byb = cents.astype("<u4").view(np.uint8)
                    dist = np.stack([
                        np.bitwise_count(bya ^ byb[c][None, :]).sum(
                            1, dtype=np.int32)
                        for c in range(k)
                    ], axis=1)
                    assign = dist.argmin(axis=1)
                else:
                    assign = np.zeros(0, int)
                for c in range(k):
                    next_groups.append(g[assign == c] if len(g) else g)
        levels.append(nodes)
        groups = next_groups
    # idf weights from the training set's word histogram.
    vocab = Vocabulary(
        nodes=tuple(jnp.asarray(l) for l in levels),
        weights=jnp.ones(k ** depth, jnp.float32),
        k=k,
        depth=depth,
    )
    words, _ = transform(vocab, jnp.asarray(desc), jnp.ones(len(desc), bool))
    counts = np.bincount(np.asarray(words), minlength=k ** depth) + 1
    idf = np.log(len(desc) / counts).clip(min=0.0).astype(np.float32)
    return vocab._replace(weights=jnp.asarray(idf))


def state_dict(vocab: Vocabulary) -> dict:
    """Serializable arrays for a vocabulary (DBoW3 persists its vocab
    as ORBvoc.bin; here it embeds in the map npz or a standalone
    file)."""
    d = {f"nodes_{i}": np.asarray(n) for i, n in enumerate(vocab.nodes)}
    d["weights"] = np.asarray(vocab.weights)
    d["meta"] = np.asarray([vocab.k, vocab.depth], np.int32)
    return d


def from_state_dict(d, prefix: str = "") -> Vocabulary:
    k, depth = (int(x) for x in d[prefix + "meta"])
    nodes = tuple(
        jnp.asarray(d[f"{prefix}nodes_{i}"]) for i in range(depth)
    )
    return Vocabulary(
        nodes=nodes, weights=jnp.asarray(d[prefix + "weights"]),
        k=k, depth=depth,
    )


def save(vocab: Vocabulary, path: str) -> None:
    np.savez_compressed(path, **state_dict(vocab))


def load(path: str) -> Vocabulary:
    with np.load(path) as data:
        return from_state_dict(dict(data))


def transform(
    vocab: Vocabulary, desc: jnp.ndarray, mask: jnp.ndarray,
    node_level: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Descriptors [N, 8] -> (word ids [N], gating node ids [N]).

    The gating node id is the reference's "feature vector" grouping
    used to accelerate SearchByBoW — features sharing the node are
    matching candidates.  `node_level` 0 keeps the k coarse clusters
    (ORB-SLAM groups at a level a few steps below the root; finer
    levels over-fragment small vocabularies and starve the matcher).
    Jittable: `depth` Hamming argmin sweeps against dense node tables.
    """
    k = vocab.k
    node = jnp.zeros(desc.shape[0], jnp.int32)
    mid = jnp.zeros(desc.shape[0], jnp.int32)
    for level, nodes in enumerate(vocab.nodes):
        base = node * k
        cand_rows = base[:, None] + jnp.arange(k)[None, :]  # [N, k]
        cands = nodes[cand_rows]                            # [N, k, 8]
        d = jnp.sum(
            hamming.popcount_u32(cands ^ desc[:, None, :]), axis=-1
        )
        node = base + jnp.argmin(d, axis=1).astype(jnp.int32)
        if level == min(node_level, vocab.depth - 1):
            mid = node
    word = jnp.where(mask, node, -1)
    return word, jnp.where(mask, mid, -1)


def bow_vector(
    vocab: Vocabulary, words: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """tf-idf-weighted, L1-normalized dense BoW vector [n_words]."""
    w = jnp.clip(words, 0, vocab.n_words - 1)
    counts = jnp.zeros(vocab.n_words, jnp.float32).at[w].add(
        mask.astype(jnp.float32)
    )
    v = counts * vocab.weights
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def score_l1(va: jnp.ndarray, vb: jnp.ndarray) -> jnp.ndarray:
    """DBoW3 L1 score in [0, 1]: 1 - 0.5 * ||va - vb||_1 (vectors are
    L1-normalized).  Broadcasts: [.., W] x [.., W] -> [..]."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(va - vb), axis=-1)


def match_by_nodes(
    desc_a, node_a, mask_a, desc_b, node_b, mask_b,
    max_dist: int = 50, ratio: float = 0.9,
):
    """SearchByBoW equivalent: nearest-neighbour Hamming matching
    restricted to descriptor pairs sharing a vocabulary node
    (Matcher.cpp:196-292), as one masked distance matrix."""
    BIG = jnp.int32(1 << 14)
    d = hamming.distance_matrix(desc_a, desc_b)
    same_node = (node_a[:, None] == node_b[None, :]) & (node_a[:, None] >= 0)
    d = jnp.where(same_node & mask_b[None, :], d, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    ok = (
        mask_a
        & (best <= max_dist)
        & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    )
    return jnp.where(ok, best_idx, -1).astype(jnp.int32), ok
