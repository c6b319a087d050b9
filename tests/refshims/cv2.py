"""cv2 stub: lets reference modules that ``import cv2`` at module level
load in this environment (opencv is not installed).

Only the names the RANSAC cross-validation path touches at import time
exist; any actual call raises so a test silently depending on OpenCV
fails loudly instead of drifting. The production reference's
``essential_cv2`` minimal solver (cv_geometry.py:836-859) therefore
cannot run here — the cross-validation uses the reference's own
pure-torch ``fundamental``/``essential`` solvers instead.
"""

LMEDS = 4
RANSAC = 8
USAC_MAGSAC = 38


def _unavailable(*_a, **_k):
    raise RuntimeError("cv2 is not installed in this environment "
                       "(tests/refshims/cv2.py stub)")


findEssentialMat = _unavailable
findFundamentalMat = _unavailable
recoverPose = _unavailable
solvePnPRansac = _unavailable
triangulatePoints = _unavailable
