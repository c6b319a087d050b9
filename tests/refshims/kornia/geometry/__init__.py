from kornia.geometry import conversions, subpix  # noqa: F401
from kornia.geometry import epipolar, homography, solvers  # noqa: F401
from kornia.geometry.epipolar import (  # noqa: F401
    symmetrical_epipolar_distance,
)
from kornia.geometry.homography import (  # noqa: F401
    line_segment_transfer_error_one_way,
    oneway_transfer_error,
    sample_is_valid_for_homography,
)


def _unavailable(*_a, **_k):
    raise NotImplementedError(
        "homography/fundamental polishers are not shimmed "
        "(prior_ransac runs with max_lo_iters=0)")


find_fundamental = _unavailable
find_homography_dlt = _unavailable
find_homography_dlt_iterated = _unavailable
find_homography_lines_dlt = _unavailable
find_homography_lines_dlt_iterated = _unavailable
