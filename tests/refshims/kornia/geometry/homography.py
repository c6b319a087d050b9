"""kornia.geometry.homography shim: import-time names only — the
RANSAC cross-validation never runs the homography model types."""


def _unavailable(*_a, **_k):
    raise NotImplementedError(
        "homography model types are not exercised by the parity tests")


line_segment_transfer_error_one_way = _unavailable
oneway_transfer_error = _unavailable
sample_is_valid_for_homography = _unavailable
