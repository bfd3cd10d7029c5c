"""Pure-NumPy SE(3) helpers over params7 (wxyz quaternion + t).

Host-side bookkeeping (trajectory anchoring, archive pose updates,
dataset ground-truth handling) composes poses at frame rate; doing it
with the JAX SE3 type would issue a device dispatch per op — over the
axon TPU tunnel that is ~ms each.  These mirror geometry/se3.py's
conventions exactly (T_cw as quat(wxyz)+t acting by x' = R x + t).
"""
from __future__ import annotations

import numpy as np


def params7_to_Rt(p: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[..., 7] -> (R [..., 3, 3], t [..., 3]); batched."""
    p = np.asarray(p, np.float64)
    q = p[..., :4]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], axis=-1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], axis=-1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    return R, p[..., 4:7]


def Rt_to_params7(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """(R [..., 3, 3], t [..., 3]) -> [..., 7]; batched (Shepperd)."""
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four branch candidates, pick per-element the numerically safest.
    qw = np.sqrt(np.maximum(1.0 + tr, 0.0)) / 2.0
    qx = np.sqrt(np.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qy = np.sqrt(np.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qz = np.sqrt(np.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    qx = np.copysign(qx, R[..., 2, 1] - R[..., 1, 2])
    qy = np.copysign(qy, R[..., 0, 2] - R[..., 2, 0])
    qz = np.copysign(qz, R[..., 1, 0] - R[..., 0, 1])
    q = np.stack([qw, qx, qy, qz], axis=-1)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return np.concatenate([q, t], axis=-1).astype(np.float64)


def compose7(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """params7 of A @ B (apply B first); batched."""
    Ra, ta = params7_to_Rt(a)
    Rb, tb = params7_to_Rt(b)
    R = Ra @ Rb
    t = np.einsum("...ij,...j->...i", Ra, tb) + ta
    return Rt_to_params7(R, t)


def inverse7(a: np.ndarray) -> np.ndarray:
    """params7 of A^-1; batched."""
    R, t = params7_to_Rt(a)
    Rt = np.swapaxes(R, -1, -2)
    return Rt_to_params7(Rt, -np.einsum("...ij,...j->...i", Rt, t))


def relative7(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """params7 of A @ B^-1 (the pose of A relative to B); batched."""
    return compose7(a, inverse7(b))
