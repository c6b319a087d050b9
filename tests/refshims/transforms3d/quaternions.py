"""Shim for transforms3d.quaternions (the two functions the reference's
localize.py imports).  Implemented on scipy per the upstream docs:
quaternions are (w, x, y, z); quat2mat accepts non-unit quaternions;
mat2quat returns the representative with w >= 0.
"""

import numpy as np
from scipy.spatial.transform import Rotation


def quat2mat(q):
    w, x, y, z = np.asarray(q, np.float64)
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def mat2quat(M):
    x, y, z, w = Rotation.from_matrix(np.asarray(M, np.float64)).as_quat()
    q = np.array([w, x, y, z])
    return q if q[0] >= 0 else -q
