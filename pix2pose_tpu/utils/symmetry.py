"""Continuous-symmetry pose canonicalization.

Reference ``get_sympose`` (``tools/2_2_render_pix2pose_training.py:26-52``):
for an object with a continuous symmetry axis, zero the euler angle around
that axis (extrinsic decomposition with the symmetry axes first) so all
training poses share one canonical azimuth; if the transformed symmetry
axis is near-parallel to the camera z-axis, lock in-plane rotation
augmentation.
"""

from __future__ import annotations

import numpy as np


def canonicalize_sym_pose(rot: np.ndarray, sym_axis) -> tuple[np.ndarray,
                                                              bool]:
    """Args:
      rot: (3, 3) cam_R_m2c.
      sym_axis: length-3 0/1 vector marking continuous-symmetry axes
        (models_info ``symmetries_continuous[0]['axis']``), or None.

    Returns:
      (canonicalized rotation, rotation_lock).
    """
    sym_axis = np.asarray(sym_axis if sym_axis is not None else [0, 0, 0],
                          np.float64)
    if sym_axis.sum() <= 0:
        return rot, False
    from scipy.spatial.transform import Rotation

    axes = "xyz"
    order = "".join(a for i, a in enumerate(axes) if sym_axis[i] == 1) + \
        "".join(a for i, a in enumerate(axes) if sym_axis[i] == 0)
    keep = [0.0 if sym_axis["xyz".index(c)] == 1 else 1.0 for c in order]
    # extrinsic (static-frame) euler == lowercase order in scipy, matching
    # transforms3d's 's' prefix used by the reference
    ang = Rotation.from_matrix(rot).as_euler(order)
    ang = ang * np.asarray(keep)
    rot_c = Rotation.from_euler(order, ang).as_matrix()
    sym_tr = rot_c @ sym_axis
    lock = bool(abs(float(sym_tr @ np.array([0.0, 0.0, 1.0]))) > 0.8)
    return rot_c.astype(rot.dtype if hasattr(rot, "dtype")
                        else np.float32), lock
