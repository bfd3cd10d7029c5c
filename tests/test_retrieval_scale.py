"""Relocalization retrieval quality at archive scale (VERDICT r3 #4).

docs/vocabulary.md measured that BoW-only ranking puts the true twin
at mean rank ~39 in a 200-keyframe archive — geometric verification of
the top few BoW candidates then almost never sees it.  The round-4
redesign ranks candidates by brute-force descriptor match count
(ops.hamming.archive_match_scores; free on the VPU at this scale,
DBoW3's inverted index is a CPU workaround the TPU does not need).

Protocol: the _exp_vocab_scale.py twin-retrieval setup — A distinct
"keyframe" views across many rendered worlds, each queried with a
perturbed re-render (pose noise + exposure offset).  Gate: the true
twin must land inside the top `reloc_top_c` (=10, the geometrically
verified set) for >=80% of queries at archive size 200.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ygz_slam_tpu.geometry import PinholeCamera, se3
from ygz_slam_tpu.ops import fast, orb, hamming
from ygz_slam_tpu.utils.synthetic import PlaneScene, BoxScene, loop_trajectory

pytestmark = pytest.mark.slow  # renders + describes 400 views

CAM = PinholeCamera.create(320.0, 320.0, 160.0, 120.0)
SHAPE = (240, 320)
A = 200
TOP_C = 10  # VOOptions.reloc_top_c default


def _describe(img):
    c = fast.detect(img, 20.0, cell=12, max_corners=256)
    _, d = orb.compute(img, c.xy)
    return np.asarray(d), np.asarray(c.mask)


def _build_pairs():
    pairs = []
    rng = np.random.default_rng(0)
    for ti in range(20):
        scene = PlaneScene(CAM, plane_z=3.0, seed=5000 + ti)
        for j in range(6):
            xi = rng.normal(0, 0.15, 6).astype(np.float32)
            T = se3.exp(jnp.asarray(xi))
            dxi = rng.normal(0, 0.02, 6).astype(np.float32)
            Tq = se3.exp(jnp.asarray(dxi)).compose(T)
            pairs.append((scene.render(T, SHAPE),
                          jnp.clip(scene.render(Tq, SHAPE) * 1.05 + 2.0,
                                   0, 255)))
    for ri in range(4):
        scene = BoxScene(CAM, seed=6000 + ri)
        traj = loop_trajectory(20, radius=2.9, seed=ri)
        for T in traj:
            dxi = rng.normal(0, 0.02, 6).astype(np.float32)
            Tq = se3.exp(jnp.asarray(dxi)).compose(T)
            pairs.append((scene.render(T, SHAPE),
                          jnp.clip(scene.render(Tq, SHAPE) * 0.95 + 3.0,
                                   0, 255)))
    return pairs[:A]


def test_match_count_retrieval_recall_at_topc():
    pairs = _build_pairs()
    base_d, base_m, q_d, q_m = [], [], [], []
    for b, q in pairs:
        d, m = _describe(b)
        base_d.append(d); base_m.append(m)
        d, m = _describe(q)
        q_d.append(d); q_m.append(m)
    arc_desc = jnp.asarray(np.stack(base_d))          # [A, F, 8]
    arc_valid = jnp.asarray(np.stack(base_m))         # [A, F]
    ranks = []
    import jax
    score_fn = jax.jit(lambda qd, qm: hamming.archive_match_scores(
        qd, qm, arc_desc, arc_valid
    ))
    for i in range(A):
        s = np.asarray(score_fn(jnp.asarray(q_d[i]), jnp.asarray(q_m[i])))
        # rank of the true twin (1 = best; ties count against us)
        ranks.append(int((s >= s[i]).sum()))
    ranks = np.asarray(ranks)
    recall_topc = float((ranks <= TOP_C).mean())
    recall_1 = float((ranks <= 1).mean())
    print(f"A={A}: recall@1={recall_1:.3f} recall@{TOP_C}={recall_topc:.3f}"
          f" mean-rank={ranks.mean():.2f}")
    # BoW L1 measured 0.30 recall@1 / mean rank 39 here; the
    # match-count score must put the twin in the verified set nearly
    # always for archive-scale relocalization to work.
    assert recall_topc >= 0.8, (recall_topc, ranks.mean())


def test_prefilter_regime_recall_beyond_1024_rows():
    """A > 1024: _archive_retrieval_scores switches to a BoW top-1024
    prefilter before brute-force match-count scoring
    (models/relocalization.py).  Gate: the prefilter must not drop the
    true twin — recall@TOP_C stays >= 0.8 with 1,400 archive rows.

    Distractor rows are built by shuffling REAL descriptors across
    frames (realistic word statistics, no coherent view), so the BoW
    prefilter faces plausible decoys rather than uniform noise."""
    import jax
    from types import SimpleNamespace
    from ygz_slam_tpu.map import vocabulary as voc
    from ygz_slam_tpu.models.visual_odometry import _shared_vocabulary
    from ygz_slam_tpu.models.relocalization import (
        _archive_retrieval_scores,
    )

    vocab = _shared_vocabulary()
    pairs = _build_pairs()
    base_d, base_m, q_d, q_m = [], [], [], []
    for b, q in pairs:
        d, m = _describe(b)
        base_d.append(d); base_m.append(m)
        d, m = _describe(q)
        q_d.append(d); q_m.append(m)
    F = base_d[0].shape[0]
    real_d = np.stack(base_d)                      # [A, F, 8]
    real_m = np.stack(base_m)
    # Decoys: sample each row's descriptors from the pooled REAL
    # descriptor set (valid ones), uniformly with replacement.
    pool = real_d[real_m]                          # [n_valid, 8]
    rng = np.random.default_rng(7)
    N_DECOY = 1200
    dec_idx = rng.integers(0, len(pool), size=(N_DECOY, F))
    dec_d = pool[dec_idx]
    dec_m = np.ones((N_DECOY, F), bool)
    arc_desc = np.concatenate([real_d, dec_d])     # [A_tot, F, 8]
    arc_mask = np.concatenate([real_m, dec_m])
    A_tot = arc_desc.shape[0]
    assert A_tot > 1024
    # BoW vectors for every archive row (prefilter input).
    bow_fn = jax.jit(lambda d, v: voc.bow_vector(
        vocab, voc.transform(vocab, d, v)[0], v
    ))
    bows = np.stack([
        np.asarray(bow_fn(jnp.asarray(arc_desc[i]),
                          jnp.asarray(arc_mask[i])))
        for i in range(A_tot)
    ])
    arc = SimpleNamespace(
        bow=jnp.asarray(bows),
        desc=jnp.asarray(arc_desc.astype(np.uint32)),
        feat_valid=jnp.asarray(arc_mask),
        pt_ok=jnp.asarray(arc_mask),
    )
    row_mask = jnp.ones(A_tot, bool)
    score_fn = jax.jit(lambda qd, qm: _archive_retrieval_scores(
        vocab, qd, qm, arc, row_mask
    ))
    ranks = []
    for i in range(A):
        s = np.asarray(score_fn(jnp.asarray(q_d[i].astype(np.uint32)),
                                jnp.asarray(q_m[i])))
        ranks.append(int((s >= s[i]).sum()))
    ranks = np.asarray(ranks)
    recall_topc = float((ranks <= TOP_C).mean())
    recall_1 = float((ranks <= 1).mean())
    print(f"A={A_tot} (prefilter regime): recall@1={recall_1:.3f} "
          f"recall@{TOP_C}={recall_topc:.3f} mean-rank={ranks.mean():.2f}")
    assert recall_topc >= 0.8, (recall_topc, ranks.mean())
